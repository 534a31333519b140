"""Chained (dispatch-floor-free) per-stage device timing at 1024^2.

The queued-dispatch harness has a ~2-6 ms PER-DISPATCH floor on axon
(a trivial x.sum() measures the same as any sub-floor stage), so true
stage costs are measured by chaining the stage REPS times inside ONE
jitted program via lax.scan — the stage output perturbs the next
iteration's input so XLA cannot CSE the iterations — and reporting
(t(REPS) - t(1)) / (REPS - 1). See CLAUDE.md / BASELINE.md.

Run on the TPU host (never alongside the pytest suite):
    python scripts/chain_time.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from magnify_tpu.ops import edge as edge_ops  # noqa: E402
from magnify_tpu.ops import nms as nms_ops  # noqa: E402
from magnify_tpu.ops.detect import (  # noqa: E402
    _stage_dense_packed,
    normalize_planes_u8,
)
from magnify_tpu.ops.score import score_maps_folded  # noqa: E402

H = W = int(os.environ.get("CHAIN_SIZE", "1024"))
MIN_R, MAX_R = 8, 12
REPS = int(os.environ.get("CHAIN_REPS", "32"))


def fixture_plane():
    rng = np.random.default_rng(0)
    img = rng.normal(100, 5, (H, W)).astype(np.uint16)
    from magnify_tpu.utils import filled_circle_points

    for pos in [(r * 97 + 60, c * 83 + 50) for r in range(10)
                for c in range(11)]:
        pts = filled_circle_points(10) + np.array(pos)
        img[pts[:, 0], pts[:, 1]] = 1000
    return jnp.asarray(normalize_planes_u8(img[None])[0].astype(np.float32))


def time_chained(make_run, *args, reps=REPS, n=6):
    """make_run(reps) -> jitted fn(*args) -> scalar; returns ms/rep."""
    run_r, run_1 = make_run(reps), make_run(1)
    np.asarray(run_r(*args))  # warm (compile)
    np.asarray(run_1(*args))
    ts = {}
    for label, fn in (("r", run_r), ("1", run_1)):
        best = np.inf
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        ts[label] = best
    return (ts["r"] - ts["1"]) / (reps - 1) * 1000


def main():
    plane = fixture_plane()
    out = {"reps": REPS}

    # --- full packed dense frame -----------------------------------------
    kw = dict(min_radius=MIN_R, max_radius=MAX_R, cap=2048, nms_cap=2048,
              min_dist=8, pull_cap=511, normalized=True)

    def full_frame(reps):
        @jax.jit
        def run(p):
            def body(carry, _):
                packed, _full = _stage_dense_packed(
                    carry, 0.1, 0.9, 0.3, **kw)
                return carry + packed[1, 3] * 1e-20, packed[1, 3]
            _, outs = jax.lax.scan(body, p, None, length=reps)
            return outs.sum()
        return run

    out["full_frame_ms"] = round(time_chained(full_frame, plane), 3)

    # --- edge stack (blur -> Scharr -> quantiles -> Canny) ----------------
    def edge_stack(reps):
        @jax.jit
        def run(p):
            def body(carry, _):
                edges, _dx, _dy, ga = edge_ops.edge_pipeline(
                    carry, 0.1, 0.9, normalized=True)
                s = edges.sum().astype(jnp.float32) + ga[0, 0]
                return carry + s * 1e-20, s
            _, outs = jax.lax.scan(body, p, None, length=reps)
            return outs.sum()
        return run

    out["edge_stack_ms"] = round(time_chained(edge_stack, plane), 3)

    # --- quantiles only ----------------------------------------------------
    blurred = edge_ops.gaussian_blur5_u8(plane)
    dx, dy = jax.jit(edge_ops.scharr)(blurred)
    grad = jnp.sqrt(dx * dx + dy * dy)

    def quantiles(reps):
        @jax.jit
        def run(g):
            def body(carry, _):
                lo, hi = edge_ops.histogram_quantiles(
                    carry, jnp.asarray([0.1, 0.9], jnp.float32))
                return carry + lo * 1e-20, lo + hi
            _, outs = jax.lax.scan(body, g, None, length=reps)
            return outs.sum()
        return run

    out["quantiles_ms"] = round(time_chained(quantiles, grad), 3)

    # --- Canny NMS + hysteresis (thresholds fixed) -------------------------
    lo_t, hi_t = jax.jit(edge_ops.histogram_quantiles)(
        grad, jnp.asarray([0.1, 0.9], jnp.float32))

    def canny_only(reps):
        @jax.jit
        def run(dx0, dy0):
            def body(carry, _):
                cdx, cdy = carry
                edges = edge_ops.canny(cdx, cdy, lo_t, hi_t)
                s = edges.sum().astype(jnp.float32)
                return (cdx + s * 1e-20, cdy), s
            _, outs = jax.lax.scan(body, (dx0, dy0), None, length=reps)
            return outs.sum()
        return run

    out["canny_ms"] = round(time_chained(canny_only, dx, dy), 3)

    # --- folded score maps (production form: features from grads) ----------
    edges_d, dx_d, dy_d, _ga_d = jax.jit(functools.partial(
        edge_ops.edge_pipeline, normalized=True))(plane, 0.1, 0.9)
    pad = 2 * MAX_R
    egp = jnp.pad(edges_d, pad)
    dxp = jnp.pad(dx_d, pad)
    dyp = jnp.pad(dy_d, pad)

    def maps(reps):
        @jax.jit
        def run(e, gx, gy):
            def body(carry, _):
                ce, cx, cy = carry
                folded, _s = score_maps_folded(
                    None, ce, min_radius=MIN_R, max_radius=MAX_R,
                    grads=(cx, cy))
                s = folded[0, 0, 0]
                return (ce, cx + s * 1e-20, cy), s
            _, outs = jax.lax.scan(body, (e, gx, gy), None, length=reps)
            return outs.sum()
        return run

    out["score_maps_ms"] = round(time_chained(maps, egp, dxp, dyp), 3)

    # --- frame minus NMS (min_dist=0 skips NMS) ----------------------------
    kw0 = dict(kw, min_dist=0)

    def no_nms(reps):
        @jax.jit
        def run(p):
            def body(carry, _):
                packed, _full = _stage_dense_packed(
                    carry, 0.1, 0.9, 0.3, **kw0)
                return carry + packed[1, 3] * 1e-20, packed[1, 3]
            _, outs = jax.lax.scan(body, p, None, length=reps)
            return outs.sum()
        return run

    out["frame_no_nms_ms"] = round(time_chained(no_nms, plane), 3)
    out["nms_pack_ms"] = round(out["full_frame_ms"] - out["frame_no_nms_ms"],
                               3)
    out["compact_sort_ms"] = round(
        out["frame_no_nms_ms"] - out["edge_stack_ms"] - out["score_maps_ms"],
        3)
    out["mpix_per_s"] = round(H * W / out["full_frame_ms"] / 1e3, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()


# NMS-only chained timing (import and call from a REPL if needed).
def nms_only_ms(circles, valid, reps=REPS):
    def make(r):
        @jax.jit
        def run(c):
            def body(carry, _):
                acc = nms_ops.parallel_greedy_nms(
                    carry, valid, min_dist=8, height=H, width=W,
                    max_radius=MAX_R)
                s = acc.sum().astype(jnp.int32)
                return carry + (s * 0), s
            _, outs = jax.lax.scan(body, c, None, length=r)
            return outs.sum()
        return run
    return time_chained(make, circles, reps=reps)
