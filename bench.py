"""End-to-end benchmark: the mrbles-style bead pipeline in Mpix/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}

Workload (BASELINE.json config 1/2): a noisy 1024x1024 uint16 frame with a
dense bead field, processed end to end through ``mg.beads`` — standardize,
flat-field, stitch, detection (RANSAC budget = the reference default 5e6),
fg/bg segmentation, ROI extraction, and spill — exactly what a user calls.

``vs_baseline``: the reference implementation cannot execute in this
environment (numba/xarray absent), so the anchor is this framework's own
pipeline on the host CPU backend (JAX CPU), measured by
scripts/measure_cpu_anchor.py and recorded below. The reference's numba
kernels and this CPU path do equivalent work per proposal, making this a
conservative stand-in for the "CPU reference" (see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

# Measured by scripts/measure_cpu_anchor.py on this host (JAX CPU backend,
# same workload, steady state): 3.56 s/frame, 110/110 beads, 2026-08-16.
# See BASELINE.md for the measurement log.
CPU_ANCHOR_MPIX_S = 0.294

NUM_ITER = 5_000_000
SHAPE = (1024, 1024)
N_RUNS = 5


def make_workload(seed: int = 0):
    from magnify_tpu.core import DataArray
    from magnify_tpu.utils import filled_circle_points

    rng = np.random.default_rng(seed)
    img = rng.normal(100, 5, SHAPE).astype(np.uint16)
    positions = [(r * 97 + 60, c * 83 + 50) for r in range(10)
                 for c in range(11)]
    for pos in positions:
        pts = filled_circle_points(10) + np.array(pos)
        img[pts[:, 0], pts[:, 1]] = 1000
    return DataArray(img, dims=("y", "x")), len(positions)


def run_pipeline(data):
    import magnify_tpu as mg

    return mg.beads(
        data=data,
        min_bead_diameter=16,
        max_bead_diameter=24,
        overlap=0,
        num_iter=NUM_ITER,
        min_roundness=0.3,
    )


def measure_stream(data, n_planes: int = 16) -> dict:
    """Streaming 4D-stack detection throughput (BASELINE.json config 5):
    a (time x channel) plane stack batch-detected on device."""
    from magnify_tpu.ops.detect import find_circles_stack

    stack = np.broadcast_to(data.values, (n_planes,) + data.values.shape)
    stack = np.ascontiguousarray(stack)
    out = find_circles_stack(stack, 0.1, 0.9, 8, 12, 0.3, 8)  # warmup
    t0 = time.perf_counter()
    out = find_circles_stack(stack, 0.1, 0.9, 8, 12, 0.3, 8)
    dt = time.perf_counter() - t0
    mpix = n_planes * SHAPE[0] * SHAPE[1] / 1e6
    return {
        "stream_mpix_per_s": round(mpix / dt, 3),
        "stream_planes": n_planes,
        "stream_found_per_plane": int(len(out[0][0])),
    }


def measure_chip() -> dict:
    """Chip-pipeline throughput (BASELINE.json config 4)."""
    import magnify_tpu as mg
    from magnify_tpu.core import DataArray
    from magnify_tpu.utils import filled_circle_points

    grid = (8, 8)
    img = np.zeros(((grid[0] + 1) * 100, (grid[1] + 1) * 100), np.uint16)
    pts = filled_circle_points(10)
    for i in range(grid[0]):
        for j in range(grid[1]):
            img[pts[:, 0] + (i + 1) * 100, pts[:, 1] + (j + 1) * 100] = 1000
    data = DataArray(img, dims=("y", "x"))
    kw = dict(shape=grid, min_button_diameter=16, max_button_diameter=32,
              overlap=0, row_dist=100, col_dist=100, num_iter=NUM_ITER)
    mg.microfluidic_chip(data=data, **kw)  # warmup
    t0 = time.perf_counter()
    xp = mg.microfluidic_chip(data=data, **kw)
    dt = time.perf_counter() - t0
    mpix = img.size / 1e6
    return {"chip_mpix_per_s": round(mpix / dt, 3),
            "chip_buttons_found": int(xp.sizes["mark_row"]
                                      * xp.sizes["mark_col"])}


def measure_stitch() -> dict:
    """Stitch throughput (BASELINE.json config 3): 4x4 tile grid with
    overlap cropping, through the image pipeline."""
    import magnify_tpu as mg
    from magnify_tpu.core import DataArray

    rng = np.random.default_rng(1)
    tiles = (rng.random((1, 1, 4, 4, 512, 512)) * 999).astype(np.uint16)
    data = DataArray(tiles, dims=("channel", "time", "row", "col", "y", "x"))
    mg.image(data, overlap=102)  # warmup
    t0 = time.perf_counter()
    xp = mg.image(data, overlap=102)
    dt = time.perf_counter() - t0
    return {"stitch_mpix_per_s": round(tiles.size / 1e6 / dt, 1),
            "stitched_shape": list(xp.image.shape)}


def main():
    data, n_true = make_workload()

    # Warmup: compile everything once (cached across runs by the persistent
    # compilation cache).
    xp = run_pipeline(data)
    found = xp.roi.sizes["mark"]

    # Per-run timing with the median reported: the dev environment reaches
    # the TPU through a relay whose transfer throughput fluctuates 2-3x
    # between runs, and the median is robust to those spikes.
    per_run = []
    for i in range(N_RUNS):
        t0 = time.perf_counter()
        xp = run_pipeline(data)
        per_run.append(time.perf_counter() - t0)
    sec_frame = float(np.median(per_run))

    mpix = SHAPE[0] * SHAPE[1] / 1e6
    value = mpix / sec_frame
    result = {
        "metric": "beads_pipeline_e2e_throughput",
        "value": round(value, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(value / CPU_ANCHOR_MPIX_S, 2),
        "detail": {
            "beads_found": int(found),
            "beads_true": int(n_true),
            "num_iter": NUM_ITER,
            "runs": N_RUNS,
            "seconds_per_frame": round(sec_frame, 3),
            "per_run_s": [round(t, 3) for t in per_run],
            "beads_per_s": round(found / sec_frame, 1),
        },
    }
    for name, fn in [("stream", lambda: measure_stream(data)),
                     ("chip", measure_chip), ("stitch", measure_stitch)]:
        try:  # the headline metric must still print if an extra fails
            result["detail"].update(fn())
        except Exception as e:
            result["detail"][f"{name}_error"] = str(e)[:200]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
