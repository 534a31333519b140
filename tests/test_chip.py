"""Chip pipeline behavior: grid detection, blanks, timesteps, channels."""

import numpy as np
import pytest

import magnify_tpu as mg
from magnify_tpu.core import DataArray
from tests.synth import chip_image, draw_chip

R = 10  # button radius for diameter-20 fixtures


def run_chip(data, grid, num_iter=5000, **kw):
    kw.setdefault("min_button_diameter", 16)
    kw.setdefault("max_button_diameter", 32)
    kw.setdefault("overlap", 0)
    kw.setdefault("row_dist", 100)
    kw.setdefault("col_dist", 100)
    xp = mg.microfluidic_chip(data=data, shape=grid, num_iter=num_iter, **kw)
    assert isinstance(xp, mg.Dataset)
    return xp.unstack().transpose("mark_row", "mark_col", ...)


def grid_positions_ok(xp, grid, row_dist=100, col_dist=100, tol=0.1, t=None):
    for i in range(grid[0]):
        for j in range(grid[1]):
            sel_x = xp.x[i, j] if t is None else xp.x[i, j, t]
            sel_y = xp.y[i, j] if t is None else xp.y[i, j, t]
            x = sel_x.squeeze().values.item()
            y = sel_y.squeeze().values.item()
            ex, ey = (j + 1) * col_dist, (i + 1) * row_dist
            assert (1 - tol) * ex < x < (1 + tol) * ex, (i, j, x, ex)
            assert (1 - tol) * ey < y < (1 + tol) * ey, (i, j, y, ey)


def test_minimal_1x1(num_iter=100):
    xp = run_chip(chip_image((1, 1)), (1, 1), num_iter=num_iter)
    assert xp.roi.sizes["mark_row"] == 1
    assert xp.roi.sizes["mark_col"] == 1
    r = np.sqrt(xp.fg.sum().values.item() / np.pi)
    assert 0.95 * R < r < 1.05 * R
    assert 95 < xp.x.squeeze().values.item() < 105


def test_float_input():
    data = chip_image((1, 1)).astype(np.float32)
    xp = run_chip(data, (1, 1), num_iter=100)
    assert xp.roi.sizes["mark_row"] == 1
    r = np.sqrt(xp.fg.sum().values.item() / np.pi)
    assert 0.9 * R < r < 1.1 * R


def test_10x10_grid():
    xp = run_chip(chip_image((10, 10)), (10, 10), num_iter=10000)
    assert xp.roi.sizes["mark_row"] == 10
    assert xp.roi.sizes["mark_col"] == 10
    radii = np.sqrt(xp.fg.sum(["roi_x", "roi_y"]).to_numpy() / np.pi)
    assert radii.min() > 0.9 * R
    assert radii.max() < 1.1 * R
    assert 95 < xp.x[0, 0].values.item() < 105
    assert 95 < xp.y[0, 0].values.item() < 105
    assert 395 < xp.x[4, 3].values.item() < 405
    assert 495 < xp.y[4, 3].values.item() < 505


@pytest.mark.parametrize("grid", [(3, 5), (5, 3)])
def test_rectangular_grids(grid):
    xp = run_chip(chip_image(grid), grid)
    assert xp.roi.sizes["mark_row"] == grid[0]
    assert xp.roi.sizes["mark_col"] == grid[1]
    grid_positions_ok(xp, grid)


def test_large_buttons():
    data = chip_image((4, 4), button_diameter=40, row_dist=150, col_dist=150)
    xp = run_chip(
        data, (4, 4), min_button_diameter=30, max_button_diameter=50,
        chamber_diameter=100, row_dist=150, col_dist=150,
    )
    radii = np.sqrt(xp.fg.sum(["roi_x", "roi_y"]).to_numpy() / np.pi)
    assert radii.min() > 0.85 * 20
    assert radii.max() < 1.15 * 20


def test_anisotropic_spacing():
    data = chip_image((4, 4), row_dist=80, col_dist=120)
    xp = run_chip(data, (4, 4), row_dist=80, col_dist=120)
    row_gap = xp.y[1, 0].values.item() - xp.y[0, 0].values.item()
    col_gap = xp.x[0, 1].values.item() - xp.x[0, 0].values.item()
    assert 70 < row_gap < 90
    assert 110 < col_gap < 130


def test_2x2_positions():
    xp = run_chip(chip_image((2, 2)), (2, 2), num_iter=1000)
    grid_positions_ok(xp, (2, 2))


def test_blanks_leave_grid_intact():
    blanks = [(0, 0), (1, 2), (2, 1), (3, 3)]
    xp = run_chip(chip_image((4, 4), blanks=blanks), (4, 4))
    assert xp.roi.sizes["mark_row"] == 4
    assert xp.roi.sizes["mark_col"] == 4
    areas = xp.fg.sum(["roi_x", "roi_y"]).to_numpy()
    assert (areas > 100).sum() >= 12


def test_output_schema():
    xp = mg.microfluidic_chip(
        data=chip_image((2, 2)), shape=(2, 2), min_button_diameter=16,
        max_button_diameter=32, overlap=0, row_dist=100, col_dist=100,
        num_iter=1000,
    )
    assert "mark_row" in xp.dims
    assert "mark_col" in xp.dims
    for coord in ("x", "y", "fg", "bg", "tag"):
        assert coord in xp.coords
    assert "roi" in xp.data_vars
    assert "roi_x" in xp.dims and "roi_y" in xp.dims


def test_unstack_gives_row_col():
    xp = mg.microfluidic_chip(
        data=chip_image((2, 2)), shape=(2, 2), min_button_diameter=16,
        max_button_diameter=32, overlap=0, row_dist=100, col_dist=100,
        num_iter=1000,
    ).unstack()
    assert "mark_row" in xp.dims and "mark_col" in xp.dims


def test_chip_type_presets():
    with pytest.raises(ValueError, match="Invalid chip type"):
        mg.microfluidic_chip_pipe(chip_type="bogus")
    pipe = mg.microfluidic_chip_pipe(chip_type="minichip")
    assert pipe is not None


# -- timesteps ---------------------------------------------------------------

def stack_times(imgs):
    return DataArray(np.stack(imgs), dims=("time", "y", "x"),
                     coords={"time": list(range(len(imgs)))})


def test_multiple_timesteps_consistent():
    img = draw_chip((3, 3))
    xp = run_chip(stack_times([img] * 3), (3, 3))
    assert xp.sizes["time"] == 3
    for t in range(3):
        grid_positions_ok(xp, (3, 3), t=t)
    radii = np.sqrt(xp.fg.sum(dim=["roi_x", "roi_y"]).values / np.pi)
    assert radii.min() > 0.8 * R and radii.max() < 1.2 * R


def test_single_search_timestep_copies():
    img = draw_chip((3, 3))
    xp = run_chip(stack_times([img] * 4), (3, 3), search_timestep=0)
    x0, y0 = xp.x[:, :, 0].values, xp.y[:, :, 0].values
    for t in range(1, 4):
        np.testing.assert_array_almost_equal(x0, xp.x[:, :, t].values)
        np.testing.assert_array_almost_equal(y0, xp.y[:, :, t].values)
    grid_positions_ok(xp, (3, 3), t=0)


def test_multiple_search_timesteps():
    img = draw_chip((3, 3))
    xp = run_chip(stack_times([img] * 5), (3, 3), search_timestep=[0, 2])
    assert xp.sizes["time"] == 5
    for t in (0, 2):
        grid_positions_ok(xp, (3, 3), t=t)


def _shifted(img, dy, dx):
    out = np.zeros_like(img)
    out[dy:, dx:] = img[:-dy, :-dx]
    return out


def test_refinding_follows_moving_buttons():
    img0 = draw_chip((2, 2))
    img1 = _shifted(img0, 10, 10)
    xp = run_chip(stack_times([img0, img1]), (2, 2), search_timestep=[0, 1])
    grid_positions_ok(xp, (2, 2), t=0)
    for i in range(2):
        for j in range(2):
            assert (0.85 * ((j + 1) * 100 + 10)
                    < xp.x[i, j, 1].values.item()
                    < 1.15 * ((j + 1) * 100 + 10))
            assert (0.85 * ((i + 1) * 100 + 10)
                    < xp.y[i, j, 1].values.item()
                    < 1.15 * ((i + 1) * 100 + 10))
    assert np.abs(xp.x[:, :, 1].values - xp.x[:, :, 0].values).mean() > 5
    assert np.abs(xp.y[:, :, 1].values - xp.y[:, :, 0].values).mean() > 5


def test_unsearched_timestep_keeps_stale_positions():
    img0 = draw_chip((2, 2))
    img1 = _shifted(img0, 15, 15)
    xp = run_chip(stack_times([img0, img1]), (2, 2), search_timestep=0)
    np.testing.assert_array_almost_equal(xp.x[:, :, 0].values,
                                         xp.x[:, :, 1].values)
    np.testing.assert_array_almost_equal(xp.y[:, :, 0].values,
                                         xp.y[:, :, 1].values)
    grid_positions_ok(xp, (2, 2), t=0)


# -- channels ----------------------------------------------------------------

def test_multichannel_search_one():
    img = draw_chip((3, 3))
    data = DataArray(np.stack([img, img]), dims=("channel", "y", "x"),
                     coords={"channel": ["bf", "gfp"]})
    xp = run_chip(data, (3, 3), search_channel="bf")
    assert "bf" in xp.channel.values and "gfp" in xp.channel.values
    grid_positions_ok(xp, (3, 3))


def test_multichannel_empty_other_channel():
    img = draw_chip((3, 3))
    data = DataArray(np.stack([img, np.zeros_like(img)]),
                     dims=("channel", "y", "x"),
                     coords={"channel": ["bf", "gfp"]})
    xp = run_chip(data, (3, 3), search_channel="bf")
    grid_positions_ok(xp, (3, 3))
    radii = np.sqrt(xp.fg.sum(dim=["roi_x", "roi_y"]).values / np.pi)
    assert radii.min() > 0.8 * R and radii.max() < 1.2 * R


def test_multichannel_multitimestep():
    img = draw_chip((2, 2))
    data = DataArray(
        np.stack([[img] * 3, [img] * 3]),
        dims=("channel", "time", "y", "x"),
        coords={"channel": ["bf", "gfp"], "time": [0, 1, 2]},
    )
    xp = run_chip(data, (2, 2), search_channel="bf")
    assert xp.sizes["time"] == 3
    assert xp.sizes["channel"] == 2
    for t in range(3):
        grid_positions_ok(xp, (2, 2), t=t)


def test_chip_dense_detector_matches_ransac():
    """The fused dense chamber refinement agrees with the ransac path."""
    data = chip_image((3, 3))
    a = run_chip(data, (3, 3), detector="ransac")
    b = run_chip(chip_image((3, 3)), (3, 3), detector="dense", num_iter=100)
    np.testing.assert_allclose(a.x.squeeze().values, b.x.squeeze().values,
                               atol=1.5)
    np.testing.assert_allclose(a.y.squeeze().values, b.y.squeeze().values,
                               atol=1.5)
    areas_a = a.fg.sum(["roi_x", "roi_y"]).values
    areas_b = b.fg.sum(["roi_x", "roi_y"]).values
    np.testing.assert_allclose(areas_a, areas_b, rtol=0.25)
    grid_positions_ok(b, (3, 3))


@pytest.mark.parametrize("detector", ["ransac", "dense"])
def test_known_chamber_offsets_use_fixed_labeling(monkeypatch, detector):
    """With top_chamber/left_chamber given, clustering uses the fixed
    interval geometry (reference find.py:680-695) instead of the offset
    sweep — in both detector modes (the dense mode runs the labeling on
    device inside the fused timestep)."""
    monkeypatch.setenv("MAGNIFY_TPU_DETECTOR", detector)
    import magnify_tpu as mg
    from magnify_tpu.core import DataArray
    from magnify_tpu.utils import filled_circle_points

    grid = (3, 3)
    img = np.zeros((400, 400), np.uint16)
    pts = filled_circle_points(10)
    for i in range(grid[0]):
        for j in range(grid[1]):
            img[pts[:, 0] + (i + 1) * 100, pts[:, 1] + (j + 1) * 100] = 1000

    xp = mg.microfluidic_chip(
        data=DataArray(img, dims=("y", "x")), shape=grid,
        min_button_diameter=16, max_button_diameter=32, overlap=0,
        row_dist=100, col_dist=100, chamber_diameter=60,
        top_chamber=70, left_chamber=70, num_iter=2000,
    )
    assert xp.sizes["mark_row"] == xp.sizes["mark_col"] == 3
    xs = np.sort(np.round(np.ravel(xp.x.values)).astype(int).reshape(3, 3)[0])
    ys = np.sort(np.round(np.ravel(
        xp.y.values)).astype(int).reshape(3, 3)[:, 0])
    np.testing.assert_allclose(xs, [100, 200, 300], atol=2)
    np.testing.assert_allclose(ys, [100, 200, 300], atol=2)


@pytest.mark.parametrize("detector", ["ransac", "dense"])
@pytest.mark.parametrize("grid", [(1, 2), (2, 1), (1, 3)])
def test_single_row_or_column_grids(monkeypatch, detector, grid):
    """Single-row/column chips: no per-cluster slope is estimable on the
    singleton axis, so the grid lines fall back to axis-aligned (the
    upstream reference crashes on these shapes — find.py:708 returns a
    bare scalar intercept and nanmedian of all-NaN slopes poisons the
    intersection)."""
    monkeypatch.setenv("MAGNIFY_TPU_DETECTOR", detector)
    import magnify_tpu as mg
    from magnify_tpu.core import DataArray
    from magnify_tpu.utils import filled_circle_points

    rows, cols = grid
    img = np.zeros(((rows + 1) * 100, (cols + 1) * 100), np.uint16)
    pts = filled_circle_points(10)
    for i in range(rows):
        for j in range(cols):
            img[pts[:, 0] + (i + 1) * 100, pts[:, 1] + (j + 1) * 100] = 1000

    xp = mg.microfluidic_chip(
        data=DataArray(img, dims=("y", "x")), shape=grid,
        min_button_diameter=16, max_button_diameter=32, overlap=0,
        row_dist=100, col_dist=100, num_iter=20000,
    )
    assert xp.sizes["mark_row"] == rows and xp.sizes["mark_col"] == cols
    xs = np.sort(np.unique(np.round(np.ravel(xp.x.values)).astype(int)))
    ys = np.sort(np.unique(np.round(np.ravel(xp.y.values)).astype(int)))
    np.testing.assert_allclose(xs, (np.arange(cols) + 1) * 100, atol=2)
    np.testing.assert_allclose(ys, (np.arange(rows) + 1) * 100, atol=2)


def test_fused_timestep_ships_only_u8_search_planes(monkeypatch):
    """The fused chip path's only host->device payload is the uint8-
    normalized SEARCH planes (1 B/px), never the full multi-channel raw
    stack (the round-3 path uploaded all C channels at native dtype while
    the device program read only the searched ones)."""
    monkeypatch.setenv("MAGNIFY_TPU_DETECTOR", "dense")
    from magnify_tpu.components import find as find_mod

    img = draw_chip((3, 3))
    data = DataArray(
        np.stack([img, np.zeros_like(img), np.zeros_like(img)]),
        dims=("channel", "y", "x"),
        coords={"channel": ["bf", "gfp", "cy5"]},
    )

    seen = []
    real = find_mod._chip_fused_packed

    def spy(planes, *args, **kwargs):
        seen.append((planes.shape, planes.dtype))
        return real(planes, *args, **kwargs)

    monkeypatch.setattr(find_mod, "_chip_fused_packed", spy)
    xp = run_chip(data, (3, 3), search_channel="bf")
    assert seen, "fused path not taken"
    shape, dtype = seen[0]
    assert shape[0] == 1, "non-search channels crossed the link"
    assert dtype == np.uint8
    grid_positions_ok(xp, (3, 3))
    # ROI crops of the non-uploaded channels still come from the raw stack.
    assert xp.roi.sizes["channel"] == 3
    assert xp.roi.sel(channel="gfp").values.sum() == 0


def test_dim_chamber_recovered_under_outlier_compression():
    """A saturated speck compresses the global u8 range so a dim button
    quantizes to level 0 — invisible to detection AND to refinement if
    chamber crops were taken from u8 planes. The upload-precision policy
    (ops.detect.choose_upload_precision) escalates the fused path to u16,
    so per-chamber re-normalization recovers the raw crop contrast exactly
    like the reference's to_uint8(raw roi) (reference find.py:339-355);
    the dim button's circle is then refined at its true radius. With u8
    forced, the dim chamber falls back to the unrefined grid center at
    max_button_radius — pinning that the escalation is what fixes it."""
    from magnify_tpu.components.find import last_chip_timings

    img = draw_chip((3, 3), value=3000).astype(np.uint16)
    # One DIM button: full local contrast, but < 1 u8 level of the global
    # range once the speck saturates it.
    from magnify_tpu.utils import filled_circle_points

    img[filled_circle_points(R)[:, 0] + 200,
        filled_circle_points(R)[:, 1] + 200] = 150
    img[2:5, 2:5] = 65535  # tiny saturated speck, far from any chamber

    xp = run_chip(DataArray(img, dims=("y", "x")), (3, 3),
                  detector="dense", num_iter=100)
    assert last_chip_timings["upload_precision"] == "u16"
    grid_positions_ok(xp, (3, 3))
    for i, j in [(1, 1), (0, 0), (2, 2)]:
        r_fg = np.sqrt(xp.fg[i, j].values.sum() / np.pi)
        assert abs(r_fg - R) < 0.15 * R, (i, j, r_fg)

    # Forced u8: the dim chamber's crop is all zeros, refinement fails,
    # and fg falls back to the grid center at max_button_radius (16).
    import os

    os.environ["MAGNIFY_TPU_UPLOAD_PRECISION"] = "u8"
    try:
        xp8 = run_chip(DataArray(img, dims=("y", "x")), (3, 3),
                       detector="dense", num_iter=100)
    finally:
        del os.environ["MAGNIFY_TPU_UPLOAD_PRECISION"]
    assert last_chip_timings["upload_precision"] == "u8"
    r_fg8 = np.sqrt(xp8.fg[1, 1].values.sum() / np.pi)
    assert abs(r_fg8 - 16) < 2, r_fg8  # unrefined fallback radius
    for i, j in [(0, 0), (2, 2)]:  # bright chambers refine fine either way
        r_fg8 = np.sqrt(xp8.fg[i, j].values.sum() / np.pi)
        assert abs(r_fg8 - R) < 0.15 * R, (i, j, r_fg8)
