"""End-to-end beads walkthrough on synthetic data.

Builds a noisy bead field, writes it as a TIFF, runs the beads pipeline
through the path-pattern reader (detection + fg/bg segmentation + ROI
extraction), quantifies per-bead intensities, and saves the dataset.

Run:  python examples/beads_example.py [outdir]
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import magnify_tpu as mg
from magnify_tpu.io.tiff import write_tiff
from magnify_tpu.utils import filled_circle_points

SHAPE = (768, 768)
N_BEADS = 40


def build_field(rng):
    img = rng.normal(120, 6, SHAPE)
    disk = filled_circle_points(9)
    centers = []
    while len(centers) < N_BEADS:
        pos = rng.integers(30, SHAPE[0] - 30, 2)
        if any(abs(pos[0] - c[0]) < 30 and abs(pos[1] - c[1]) < 30
               for c in centers):
            continue
        centers.append(pos)
        pts = disk + pos
        img[pts[:, 0], pts[:, 1]] = rng.uniform(900, 1100)
    return img.astype(np.uint16), centers


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(0)
    img, centers = build_field(rng)
    write_tiff(os.path.join(outdir, "egfp.tif"), img)

    # The reader's path-specifier grammar picks the channel from the name.
    xp = mg.beads(
        data=os.path.join(outdir, "(channel).tif"),
        min_bead_diameter=14,
        max_bead_diameter=22,
        overlap=0,
        min_roundness=0.4,
    )
    n = xp.roi.sizes["mark"]
    print(f"found {n} beads (expected {len(centers)})")

    # Per-bead foreground/background medians -> contrast.
    fg = np.where(xp.fg.values[:, None], xp.roi.values, np.nan)
    bg = np.where(xp.bg.values[:, None], xp.roi.values, np.nan)
    contrast = (np.nanmedian(fg, axis=(-2, -1))
                - np.nanmedian(bg, axis=(-2, -1))).squeeze()
    print(f"median fg-bg contrast: {np.median(contrast):.0f} counts")

    out = os.path.join(outdir, "beads_result.nc")
    mg.save(out, xp)
    print(f"saved dataset to {out}")


if __name__ == "__main__":
    main()
