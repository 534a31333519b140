"""Detection-set identity gate for the int8 score-conv path.

Runs the three bench pipelines (beads / mrbles / chip — the
marginal-detection-sensitive noisy fixtures) end to end and prints counts
plus a sha256 of the detected GEOMETRY (positions + radii + tags; scores
are excluded — quantization legitimately moves them at the ~0.3% level).
Run once per mode and diff the JSON:

    MAGNIFY_TPU_SCORE_QUANT=bf16 python scripts/score_quant_gate.py
    MAGNIFY_TPU_SCORE_QUANT=int8 python scripts/score_quant_gate.py

Identical output = the quantized conv changes no detection on any fixture
(the same evidence standard the k<=7 harmonic default shipped under).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import bench  # noqa: E402


def sha(*arrays) -> str:
    h = hashlib.sha256()
    for a in arrays:
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()[:16]


def main():
    out = {"mode": os.environ.get("MAGNIFY_TPU_SCORE_QUANT", "(default)")}

    data, n_true = bench.make_workload()
    xp = bench.run_pipeline(data)
    out["beads_found"] = int(xp.roi.sizes["mark"])
    out["beads_true"] = n_true
    out["beads_sha"] = sha(np.sort(xp.x.values), np.sort(xp.y.values))

    data, _ = bench.make_mrbles_workload()
    xp = bench.run_mrbles(data)
    n_outlier = int(np.sum(xp.tag.values == "outlier"))
    out["mrbles_found"] = int(xp.roi.sizes["mark"])
    out["mrbles_coded"] = out["mrbles_found"] - n_outlier
    order = np.lexsort((xp.x.values, xp.y.values))
    out["mrbles_sha"] = sha(xp.x.values[order], xp.y.values[order],
                            xp.tag.values[order].astype("U16"))

    import magnify_tpu as mg
    from magnify_tpu.core import DataArray
    from magnify_tpu.utils import filled_circle_points

    grid = (8, 8)
    img = np.zeros(((grid[0] + 1) * 100, (grid[1] + 1) * 100), np.uint16)
    pts = filled_circle_points(10)
    for i in range(grid[0]):
        for j in range(grid[1]):
            img[pts[:, 0] + (i + 1) * 100, pts[:, 1] + (j + 1) * 100] = 1000
    xp = mg.microfluidic_chip(
        data=DataArray(img, dims=("y", "x")), shape=grid,
        min_button_diameter=16, max_button_diameter=32, overlap=0,
        row_dist=100, col_dist=100, num_iter=bench.NUM_ITER)
    out["chip_buttons"] = int(xp.sizes["mark_row"] * xp.sizes["mark_col"])
    out["chip_sha"] = sha(xp.x.values, xp.y.values,
                          xp.fg.values.astype(np.uint8))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
