"""Synthetic fixture drawing for tests.

Like the reference test suite, fixtures are drawn with the library's own
rasterizer (``filled_circle_points``), making the pixel geometry part of the
tested contract.
"""

from __future__ import annotations

import numpy as np

from magnify_tpu.core import DataArray
from magnify_tpu.utils import filled_circle_points


def draw_beads(shape, positions, diameters=20, values=1000) -> np.ndarray:
    positions = np.atleast_2d(np.asarray(positions))
    n = len(positions)
    diameters = np.broadcast_to(np.asarray(diameters), (n,))
    values = np.broadcast_to(np.asarray(values), (n,))
    img = np.zeros(shape, dtype=np.uint16)
    for (row, col), d, v in zip(positions, diameters, values):
        pts = filled_circle_points(int(d) // 2) + np.array([row, col])
        ok = ((pts[:, 0] >= 0) & (pts[:, 0] < shape[0])
              & (pts[:, 1] >= 0) & (pts[:, 1] < shape[1]))
        img[pts[ok, 0], pts[ok, 1]] = v
    return img


def bead_image(shape, positions, diameters=20, values=1000) -> DataArray:
    return DataArray(draw_beads(shape, positions, diameters, values),
                     dims=("y", "x"))


def draw_chip(grid, button_diameter=20, row_dist=100, col_dist=100,
              value=1000, blanks=()) -> np.ndarray:
    """Button grid at (i+1)*row_dist, (j+1)*col_dist positions."""
    rows, cols = grid
    img = np.zeros(((rows + 1) * row_dist, (cols + 1) * col_dist), np.uint16)
    blank_set = set(blanks)
    pts = filled_circle_points(button_diameter // 2)
    for i in range(rows):
        for j in range(cols):
            if (i, j) in blank_set:
                continue
            img[pts[:, 0] + (i + 1) * row_dist,
                pts[:, 1] + (j + 1) * col_dist] = value
    return img


def chip_image(grid, **kwargs) -> DataArray:
    return DataArray(draw_chip(grid, **kwargs), dims=("y", "x"))


# Realistic MRBLEs panel: 4 lanthanides over a 24-code (4 x 3 x 2 ratio
# level) lattice — the reference workload scale (identify.py:50-234 is
# built for tens of codes; real panels run 24-48). Shared by
# tests/test_identify.py and bench.py so the benchmark stays correlated
# with the decode-accuracy test.
PANEL_LNS = ["eu", "dy", "sm", "tm"]
PANEL_SPECTRA = np.array([
    [1.0, 0.2, 0.1, 0.05, 0.02],   # eu
    [0.1, 1.0, 0.3, 0.0, 0.05],    # dy
    [0.0, 0.1, 0.9, 0.4, 0.1],     # sm
    [0.05, 0.0, 0.2, 0.9, 0.3],    # tm
])
PANEL_CODES = {
    f"code_{d}{s}{t}": (1.5 * d, 2.0 * s, 2.5 * t)
    for d in range(4) for s in range(3) for t in range(2)
}


def panel_spectra_csv(channels):
    """Spectra CSV (one row per lanthanide) over the given channel names."""
    import io

    rows = ["name," + ",".join(channels)]
    rows += [n + "," + ",".join(str(v) for v in s)
             for n, s in zip(PANEL_LNS, PANEL_SPECTRA)]
    return io.StringIO("\n".join(rows))


def panel_codes_csv():
    """Code-book CSV: reference lanthanide ratio pinned at 1.0."""
    import io

    rows = ["name,eu,dy,sm,tm"]
    rows += [f"{n},1.0,{d},{s},{t}" for n, (d, s, t) in PANEL_CODES.items()]
    return io.StringIO("\n".join(rows))


def panel_codes_grid(n_dy: int, n_sm: int, n_tm: int):
    """Arbitrary-size code lattice over the three decode dims, with the
    same level spacings as PANEL_CODES; returns (codes_dict, codes_csv).
    Real MRBLEs panels run 24-48 codes — tests pin decode accuracy at
    both ends of that range."""
    import io

    codes = {f"code_{d}{s}{t}": (1.5 * d, 2.0 * s, 2.5 * t)
             for d in range(n_dy) for s in range(n_sm) for t in range(n_tm)}
    rows = ["name,eu,dy,sm,tm"]
    rows += [f"{n},1.0,{d},{s},{t}" for n, (d, s, t) in codes.items()]
    return codes, io.StringIO("\n".join(rows))
