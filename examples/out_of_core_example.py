"""Out-of-core processing of a stack far larger than resident memory.

Writes a multi-timestep TIFF series to disk, opens it through the lazy
reader (one chunk per page — nothing loads until used), runs bead
detection + per-timestep quantification, and shows that peak RSS stays
bounded by roughly one plane while the whole stack streams through:
detection uploads ONE host-normalized uint8 search plane, ROI crops
stream per (channel, time) plane with background prefetch, and only
per-marker summaries stay in memory.

For the measured large-scale runs (10.7 GB / 21.5 GB with asserted RSS
bounds) see scripts/measure_out_of_core.py and BASELINE.md.

Run:  python examples/out_of_core_example.py [outdir]
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import magnify_tpu as mg
from magnify_tpu.io.tiff import write_tiff
from magnify_tpu.utils import filled_circle_points

SHAPE = (1024, 1024)
N_TIME = 8


def rss_mb():
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) // 1024
    return -1


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(0)

    disk = filled_circle_points(9)
    centers = [(80 + 120 * i, 80 + 120 * j)
               for i in range(8) for j in range(8)]
    for t in range(N_TIME):
        img = rng.normal(120, 6, SHAPE)
        for pos in centers:
            pts = disk + np.asarray(pos)
            # Intensity decays over time; quantify picks the trend up.
            img[pts[:, 0], pts[:, 1]] = 1000 * (1 - 0.08 * t)
        # The (time) specifier parses acquisition timestamps (default
        # format %Y%m%d-%H%M%S); one file per 5-minute frame here.
        stamp = f"20260101-{t * 5 // 60:02d}{t * 5 % 60:02d}00"
        write_tiff(os.path.join(outdir, f"t{stamp}.tif"),
                   img.astype(np.uint16))

    print(f"wrote {N_TIME} x {SHAPE} planes "
          f"({N_TIME * SHAPE[0] * SHAPE[1] * 2 / 1e6:.0f} MB) to {outdir}")
    print(f"RSS before: {rss_mb()} MB")

    # The (time) specifier maps each file to a timestep; pages stay on disk
    # until a component touches them.
    xp = mg.beads(
        data=os.path.join(outdir, "t(time).tif"),
        min_bead_diameter=14, max_bead_diameter=22, overlap=0,
        num_iter=1_000_000, min_roundness=0.5,
    )
    xp = mg.quantify(xp)

    print(f"RSS after detection + quantify: {rss_mb()} MB")
    print(f"marks: {xp.roi.sizes['mark']} (expected {len(centers)})")
    # Single-channel input: intensity comes back as (mark, time).
    trend = xp.intensity.values.mean(axis=0)
    print("mean intensity by timestep:",
          np.array2string(trend, precision=0, separator=", "))
    assert xp.roi.sizes["mark"] == len(centers)
    assert (np.diff(trend) < 0).all(), "decay trend should be monotone"


if __name__ == "__main__":
    main()
