"""Prefix-chained bisection of _stage_ransac_packed (find in-frame costs).

Chains PREFIXES of the fused ransac program (round-3 methodology: stage
costs measured in isolation can differ from their in-frame cost when XLA
inserts relayouts between stages). Each prefix re-runs everything from the
edge stack; differences between consecutive prefixes are the true in-frame
stage costs.

Run on the TPU host: python scripts/ransac_prefix_time.py
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

from magnify_tpu.ops import edge as edge_ops  # noqa: E402
from magnify_tpu.ops.detect import (  # noqa: E402
    _score_uniques,
    normalize_planes_u8,
    ranked_survivor_sources,
)
from magnify_tpu.ops.nms import parallel_greedy_nms  # noqa: E402
from magnify_tpu.ops.ransac import candidate_circles  # noqa: E402
from magnify_tpu.ops.score import dedupe_circles  # noqa: E402

H = W = 1024
MIN_R, MAX_R = 8, 12
NUM_ITER = 5_000_000
GRID = 20
UCAP = 1 << 20
NCAP = 2048
REPS = 8


def fixture_plane():
    rng = np.random.default_rng(0)
    img = rng.normal(100, 5, (H, W)).astype(np.uint16)
    from magnify_tpu.utils import filled_circle_points

    for pos in [(r * 97 + 60, c * 83 + 50) for r in range(10)
                for c in range(11)]:
        pts = filled_circle_points(10) + np.array(pos)
        img[pts[:, 0], pts[:, 1]] = 1000
    return jnp.asarray(normalize_planes_u8(img[None])[0].astype(np.float32))


def prefix(image, key, upto: str):
    edges, dx, dy, ga = edge_ops.edge_pipeline(image, 0.1, 0.9,
                                               normalized=True)
    if upto == "edges":
        return edges.sum().astype(jnp.float32)
    cands, any_edges = candidate_circles(edges, grid_length=GRID,
                                         num_iter=NUM_ITER, key=key)
    if upto == "proposals":
        return cands[0][0] + cands[2][-1]
    valid = jnp.full((NUM_ITER,), True) & any_edges
    uniq, uvalid, n_unique = dedupe_circles(
        cands, valid, height=H, width=W, min_radius=MIN_R, max_radius=MAX_R,
        cap=UCAP)
    if upto == "dedupe":
        return n_unique.astype(jnp.float32) + uniq[0, 0]
    scores = _score_uniques(ga, edges, uniq, uvalid, min_radius=MIN_R,
                            max_radius=MAX_R, use_conv=True, grads=(dx, dy))
    if upto == "score":
        return scores.max()
    keep = scores >= 0.3
    sc = jnp.where(keep, scores, -jnp.inf)
    src, n_keep = ranked_survivor_sources(keep.reshape(-1, 1024), NCAP)
    targets = jnp.arange(1, NCAP + 1, dtype=n_keep.dtype)
    sel = jnp.where(targets <= n_keep, sc[src], -jnp.inf)
    neg, sel_idx = jax.lax.sort((-sel, src), num_keys=2)
    circles = uniq[sel_idx]
    acc = parallel_greedy_nms(circles, jnp.isfinite(-neg), min_dist=8,
                              height=H, width=W, max_radius=MAX_R)
    return acc.sum().astype(jnp.float32) + circles[0, 0]


def time_chained(make_run, *args, reps=REPS, n=4):
    run_r, run_1 = make_run(reps), make_run(1)
    np.asarray(run_r(*args))
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
    key = jax.random.PRNGKey(7)
    out = {"reps": REPS}
    prev = 0.0
    for upto in ("edges", "proposals", "dedupe", "score", "full"):
        def make(reps, upto=upto):
            @jax.jit
            def run(p, k):
                def body(carry, i):
                    s = prefix(carry, jax.random.fold_in(k, i), upto)
                    return carry + s * 1e-20, s
                _, outs = jax.lax.scan(body, p, jnp.arange(reps))
                return outs.sum()
            return run

        ms = time_chained(make, plane, key)
        out[upto] = {"prefix_ms": round(ms, 2),
                     "stage_ms": round(ms - prev, 2)}
        prev = ms
        print(upto, out[upto], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
