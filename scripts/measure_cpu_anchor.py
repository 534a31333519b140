"""Measure the CPU-backend anchor for bench.py's vs_baseline.

Runs the identical bead-pipeline workload on the JAX CPU backend and prints
its Mpix/s; record the value as CPU_ANCHOR_MPIX_S in bench.py. The upstream
reference itself cannot run here (numba/xarray are not installed), so this
CPU path is the stand-in anchor — documented in BASELINE.md.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    result = {}

    if which in ("all", "beads"):
        data, n_true = bench.make_workload()
        xp = bench.run_pipeline(data)  # warmup/compile
        found = xp.roi.sizes["mark"]
        runs = 2
        t0 = time.perf_counter()
        c0 = time.process_time()
        for _ in range(runs):
            bench.run_pipeline(data)
        elapsed = time.perf_counter() - t0
        cpu_s = time.process_time() - c0
        mpix = bench.SHAPE[0] * bench.SHAPE[1] / 1e6
        n_cores = os.cpu_count() or 1
        result.update({
            "cpu_anchor_mpix_per_s": round(mpix * runs / elapsed, 4),
            "seconds_per_frame": round(elapsed / runs, 2),
            "beads_found": int(found),
            "beads_true": n_true,
            # Anchor-integrity record: how parallel is the stand-in?
            # (The reference's numba prange uses every core; if this
            # stand-in ran single-core, every vs_anchor multiplier would
            # be inflated by the host's core count.)
            "anchor_cores": n_cores,
            "anchor_cores_used": round(cpu_s / elapsed, 2),
            "anchor_utilization_pct": round(
                100.0 * cpu_s / (elapsed * n_cores), 1),
        })

        # Threaded throughput anchor: independent frames processed by
        # concurrent host threads (XLA releases the GIL inside compiled
        # computations). This bounds what an all-core reference could do
        # at equal per-frame work — the HARDEST anchor variant; bench.py's
        # vs_anchor constants must cite whichever is larger.
        import concurrent.futures

        n_threads = min(n_cores, 8)
        datasets = [bench.make_workload(seed=s)[0] for s in range(n_threads)]
        with concurrent.futures.ThreadPoolExecutor(n_threads) as pool:
            list(pool.map(bench.run_pipeline, datasets))  # warm per-thread
            t0 = time.perf_counter()
            c0 = time.process_time()
            list(pool.map(bench.run_pipeline, datasets))
            elapsed_t = time.perf_counter() - t0
            cpu_t = time.process_time() - c0
        result.update({
            "cpu_anchor_threaded_mpix_per_s": round(
                mpix * n_threads / elapsed_t, 4),
            "threaded_frames": n_threads,
            "threaded_cores_used": round(cpu_t / elapsed_t, 2),
        })

    if which in ("all", "mrbles"):
        mrbles = bench.measure_mrbles(n_runs=2)
        result["cpu_anchor_mrbles_mpix_per_s"] = mrbles["mrbles_mpix_per_s"]
        result.update({k: v for k, v in mrbles.items()
                       if k != "mrbles_mpix_per_s"})

    if which in ("all", "chip"):
        chip = bench.measure_chip()
        result["cpu_anchor_chip_mpix_per_s"] = chip["chip_mpix_per_s"]
        result["chip_buttons_found"] = chip["chip_buttons_found"]

    print(json.dumps(result))


if __name__ == "__main__":
    main()
