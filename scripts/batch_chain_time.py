"""Chained per-plane device time of the BATCHED dense program (B planes
per dispatch) vs the single-plane chained number — isolates vmap overhead
from the dispatch floor.

    python scripts/batch_chain_time.py            # B=16, 1024^2
    BATCH_B=4 python scripts/batch_chain_time.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from magnify_tpu.ops.detect import (  # noqa: E402
    _stage_dense_batch_packed,
    normalize_planes_u8,
)

H = W = int(os.environ.get("CHAIN_SIZE", "1024"))
B = int(os.environ.get("BATCH_B", "16"))
REPS = int(os.environ.get("CHAIN_REPS", "8"))


def fixture_stack():
    rng = np.random.default_rng(0)
    img = rng.normal(100, 5, (H, W)).astype(np.uint16)
    from magnify_tpu.utils import filled_circle_points

    for pos in [(r * 97 + 60, c * 83 + 50) for r in range(10)
                for c in range(11)]:
        pts = filled_circle_points(10) + np.array(pos)
        img[pts[:, 0], pts[:, 1]] = 1000
    stack = np.stack([np.roll(img, 3 * b, axis=1) for b in range(B)])
    return jnp.asarray(normalize_planes_u8(stack).astype(np.float32))


def _time(make, stack):
    run_r, run_1 = make(REPS), make(1)
    np.asarray(run_r(stack))
    np.asarray(run_1(stack))
    ts = {}
    for label, fn in (("r", run_r), ("1", run_1)):
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(stack))
            best = min(best, time.perf_counter() - t0)
        ts[label] = best
    return (ts["r"] - ts["1"]) / (REPS - 1) * 1000


def main():
    stack = fixture_stack()
    kw = dict(min_radius=8, max_radius=12, cap=2048, nms_cap=2048,
              min_dist=8, pull_cap=511, normalized=True)

    def full(kwa):
        def make(reps):
            @jax.jit
            def run(p):
                def body(carry, _):
                    packed, _full = _stage_dense_batch_packed(
                        carry, 0.1, 0.9, 0.3, **kwa)
                    return carry + packed[0, 1, 3] * 1e-20, packed[0, 1, 3]
                _, outs = jax.lax.scan(body, p, None, length=reps)
                return outs.sum()
            return run
        return make

    out = {"B": B, "reps": REPS}
    per_dispatch = _time(full(kw), stack)
    out["full_ms_per_plane"] = round(per_dispatch / B, 3)
    out["mpix_per_s"] = round(B * H * W / per_dispatch / 1e3, 1)

    if os.environ.get("BATCH_STAGES"):
        from magnify_tpu.ops import edge as edge_ops
        from magnify_tpu.ops.score import score_maps_folded

        def edge_stack(reps):
            @jax.jit
            def run(p):
                def body(carry, _):
                    edges, _dx, _dy, ga = jax.vmap(
                        lambda im: edge_ops.edge_pipeline(
                            im, 0.1, 0.9, normalized=True))(carry)
                    s = edges.sum().astype(jnp.float32) + ga[0, 0, 0]
                    return carry + s * 1e-20, s
                _, outs = jax.lax.scan(body, p, None, length=reps)
                return outs.sum()
            return run

        out["edge_ms_per_plane"] = round(_time(edge_stack, stack) / B, 3)

        eg, dxb, dyb, _ = jax.jit(jax.vmap(
            lambda im: edge_ops.edge_pipeline(im, 0.1, 0.9,
                                              normalized=True)))(stack)
        pad = 2 * 12
        egp = jnp.pad(eg, ((0, 0), (pad, pad), (pad, pad)))
        dxp = jnp.pad(dxb, ((0, 0), (pad, pad), (pad, pad)))
        dyp = jnp.pad(dyb, ((0, 0), (pad, pad), (pad, pad)))

        def maps(reps):
            @jax.jit
            def run(e, gx, gy):
                def body(carry, _):
                    ce, cx, cy = carry
                    # Leading-batch form: ONE conv at N=B (the production
                    # batched program's formulation).
                    folded, _s = score_maps_folded(
                        None, ce, min_radius=8, max_radius=12,
                        grads=(cx, cy))
                    s = folded[0, 0, 0, 0]
                    return (ce, cx + s * 1e-20, cy), s
                _, outs = jax.lax.scan(body, (e, gx, gy), None, length=reps)
                return outs.sum()
            return run

        def maps_time(make):
            run_r, run_1 = make(REPS), make(1)
            np.asarray(run_r(egp, dxp, dyp))
            np.asarray(run_1(egp, dxp, dyp))
            ts = {}
            for label, fn in (("r", run_r), ("1", run_1)):
                best = np.inf
                for _ in range(5):
                    t0 = time.perf_counter()
                    np.asarray(fn(egp, dxp, dyp))
                    best = min(best, time.perf_counter() - t0)
                ts[label] = best
            return (ts["r"] - ts["1"]) / (REPS - 1) * 1000

        out["maps_ms_per_plane"] = round(maps_time(maps) / B, 3)

        kw0 = dict(kw, min_dist=0)
        out["no_nms_ms_per_plane"] = round(_time(full(kw0), stack) / B, 3)
        out["nms_ms_per_plane"] = round(
            out["full_ms_per_plane"] - out["no_nms_ms_per_plane"], 3)
        out["compact_ms_per_plane"] = round(
            out["no_nms_ms_per_plane"] - out["edge_ms_per_plane"]
            - out["maps_ms_per_plane"], 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
