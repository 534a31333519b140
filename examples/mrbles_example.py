"""End-to-end MRBLEs walkthrough on synthetic data.

Mirrors the reference's examples/mrbles.ipynb flow: build a multi-channel
bead field, write it as an OME-TIFF, run the mrbles pipeline (detection +
spectral decoding), and plot the decoded clusters.

Run:  python examples/mrbles_example.py [outdir]
"""

import io
import os
import sys
import tempfile

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import magnify_tpu as mg
from magnify_tpu.io.tiff import write_tiff
from magnify_tpu.utils import filled_circle_points

LNS = ["eu", "dy", "sm"]
CHANNELS = ["435", "474", "536", "620"]
SPECTRA = np.array([
    [1.0, 0.2, 0.1, 0.9],
    [0.1, 1.0, 0.3, 0.0],
    [0.0, 0.1, 0.9, 0.1],
])
CODES = {"code_a": (0.0, 0.0), "code_b": (1.0, 0.0),
         "code_c": (0.0, 1.0), "code_d": (1.0, 1.0)}


def spectra_csv():
    rows = ["name," + ",".join(CHANNELS)]
    rows += [f"{n}," + ",".join(map(str, s)) for n, s in zip(LNS, SPECTRA)]
    return io.StringIO("\n".join(rows))


def codes_csv():
    rows = ["name,eu,dy,sm"]
    rows += [f"{n},1.0,{d},{s}" for n, (d, s) in CODES.items()]
    return io.StringIO("\n".join(rows))


def make_field(shape=(768, 768), n_per_code=12, seed=0):
    rng = np.random.default_rng(seed)
    planes = np.zeros((len(CHANNELS), 1) + shape, np.float32)
    centers = []
    truth = []
    disk = filled_circle_points(10)
    for name, (dy_r, sm_r) in CODES.items():
        placed = 0
        while placed < n_per_code:
            pos = rng.integers(40, shape[0] - 40, 2)
            if any((abs(pos[0] - c[0]) < 30 and abs(pos[1] - c[1]) < 30)
                   for c in centers):
                continue
            centers.append(pos)
            truth.append(name)
            eu = rng.uniform(80, 120)
            vols = np.array([eu, dy_r * eu, sm_r * eu])
            intensity = vols @ SPECTRA
            pts = disk + pos
            for ci in range(len(CHANNELS)):
                planes[ci, 0, pts[:, 0], pts[:, 1]] = intensity[ci]
            placed += 1
    planes += rng.normal(2.0, 0.3, planes.shape).astype(np.float32)
    return planes.astype(np.float32), truth


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    os.makedirs(outdir, exist_ok=True)
    planes, truth = make_field()

    # Write each channel as its own OME-TIFF, the layout the path grammar
    # expects.
    for ci, ch in enumerate(CHANNELS):
        os.makedirs(os.path.join(outdir, ch), exist_ok=True)
        write_tiff(os.path.join(outdir, ch, "field.ome.tif"),
                   planes[ci, 0].astype(np.uint16), ome=False)

    xp = mg.mrbles(
        data=os.path.join(outdir, "(channel)/field.ome.tif"),
        spectra=spectra_csv(),
        codes=codes_csv(),
        overlap=0,
        min_bead_diameter=14,
        max_bead_diameter=26,
        num_iter=200000,
        search_channel="620",
    )
    print(f"found {xp.roi.sizes['mark']} beads "
          f"(expected {len(truth)})")
    tags, counts = np.unique(xp.tag.values, return_counts=True)
    print("decoded:", dict(zip(tags.tolist(), counts.tolist())))

    # netCDF4 (the reference's save format) — xarray/netCDF4 can open it.
    out_path = os.path.join(outdir, "mrbles_result.nc")
    mg.save(out_path, xp)
    assert mg.load(out_path).roi.sizes["mark"] == xp.roi.sizes["mark"]
    print("saved dataset to", out_path)

    try:
        import matplotlib

        matplotlib.use("Agg")
        from magnify_tpu import plot as mp

        fig = mp.mrbles_clusters(xp, show=False)
        fig.savefig(os.path.join(outdir, "clusters.png"), dpi=120)
        print("wrote", os.path.join(outdir, "clusters.png"))
    except Exception as e:  # plotting is optional
        print("plotting skipped:", e)


if __name__ == "__main__":
    main()
