"""Chained per-stage device timing of the RANSAC parity mode at 1024^2.

Where do the ~454 ms (BENCH_r03 ``ransac_detect_ms``) of the fused
5e6-iteration RANSAC program go? Same floor-free methodology as
chain_time.py: each stage is chained REPS times inside one jitted
program via lax.scan with a key/carry perturbation so XLA cannot CSE
the iterations, reporting (t(REPS) - t(1)) / (REPS - 1).

Run on the TPU host (never alongside the pytest suite):
    python scripts/ransac_time.py
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
    _stage_ransac_packed,
    normalize_planes_u8,
)
from magnify_tpu.ops.nms import parallel_greedy_nms  # noqa: E402
from magnify_tpu.ops.ransac import candidate_circles  # noqa: E402
from magnify_tpu.ops.score import dedupe_circles  # noqa: E402

H = W = 1024
MIN_R, MAX_R = 8, 12
NUM_ITER = 5_000_000
GRID = 20
UNIQUE_CAP = 1 << 20
NMS_CAP = 2048
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


def time_chained(make_run, *args, reps=REPS, n=4):
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
    key = jax.random.PRNGKey(7)
    out = {"reps": REPS, "num_iter": NUM_ITER, "unique_cap": UNIQUE_CAP}

    kw = dict(grid_length=GRID, num_iter=NUM_ITER, min_radius=MIN_R,
              max_radius=MAX_R, unique_cap=UNIQUE_CAP, nms_cap=NMS_CAP,
              min_dist=8, pull_cap=511, use_conv=True, normalized=True)

    # --- full fused ransac frame -----------------------------------------
    def full_frame(reps):
        @jax.jit
        def run(p, k):
            def body(carry, i):
                packed, _full = _stage_ransac_packed(
                    carry, 0.1, 0.9, 0.3, jax.random.fold_in(k, i), **kw)
                return carry + packed[1, 3] * 1e-20, packed[1, 3]
            _, outs = jax.lax.scan(body, p, jnp.arange(reps))
            return outs.sum()
        return run

    out["full_frame_ms"] = round(time_chained(full_frame, plane, key), 2)

    # --- proposals only ----------------------------------------------------
    edges, dx, dy, ga = jax.jit(
        lambda p: edge_ops.edge_pipeline(p, 0.1, 0.9, normalized=True)
    )(plane)

    def proposals(reps):
        @jax.jit
        def run(e, k):
            def body(carry, i):
                cands, any_e = candidate_circles(
                    e, grid_length=GRID, num_iter=NUM_ITER,
                    key=jax.random.fold_in(k, i))
                s = cands[0][0] + cands[2][-1] + any_e
                return carry + s * 1e-20, s
            _, outs = jax.lax.scan(body, e.sum().astype(jnp.float32),
                                   jnp.arange(reps))
            return outs.sum()
        return run

    out["proposals_ms"] = round(time_chained(proposals, edges, key), 2)

    # --- dedupe only ---------------------------------------------------------
    cands, _ = jax.jit(lambda e, k: candidate_circles(
        e, grid_length=GRID, num_iter=NUM_ITER, key=k))(edges, key)
    valid = jnp.ones((NUM_ITER,), bool)

    def dedupe(reps):
        @jax.jit
        def run(cr, cc, crad):
            def body(carry, _):
                uniq, uvalid, n_unique = dedupe_circles(
                    (carry, cc, crad), valid, height=H, width=W,
                    min_radius=MIN_R, max_radius=MAX_R, cap=UNIQUE_CAP)
                return carry + n_unique.astype(jnp.float32) * 1e-20, n_unique
            _, outs = jax.lax.scan(body, cr, None, length=reps)
            return outs.sum()
        return run

    out["dedupe_ms"] = round(time_chained(dedupe, *cands), 2)

    # --- score uniques (conv + gather over UNIQUE_CAP rows) ----------------
    uniq, uvalid, n_unique = jax.jit(
        lambda c: dedupe_circles(c, valid, height=H, width=W,
                                 min_radius=MIN_R, max_radius=MAX_R,
                                 cap=UNIQUE_CAP))(tuple(cands))
    out["n_unique"] = int(n_unique)

    from magnify_tpu.ops.detect import _score_uniques

    def score(reps):
        @jax.jit
        def run(u):
            def body(carry, _):
                s = _score_uniques(ga, edges, carry, uvalid,
                                   min_radius=MIN_R, max_radius=MAX_R,
                                   use_conv=True, grads=(dx, dy))
                m = s.max()
                return carry + (m * 0).astype(carry.dtype), m
            _, outs = jax.lax.scan(body, u, None, length=reps)
            return outs.sum()
        return run

    out["score_ms"] = round(time_chained(score, uniq), 2)

    # --- survivor compaction + sort + NMS (the tail of the fused program) --
    from magnify_tpu.ops.detect import ranked_survivor_sources

    scores0 = jax.jit(lambda u: _score_uniques(
        ga, edges, u, uvalid, min_radius=MIN_R, max_radius=MAX_R,
        use_conv=True, grads=(dx, dy)))(uniq)

    def tail(reps):
        @jax.jit
        def run(s0):
            def body(carry, _):
                keep = carry >= 0.3
                sc = jnp.where(keep, carry, -jnp.inf)
                src, n_keep = ranked_survivor_sources(
                    keep.reshape(-1, 1024), NMS_CAP)
                targets = jnp.arange(1, NMS_CAP + 1, dtype=n_keep.dtype)
                sel = jnp.where(targets <= n_keep, sc[src], -jnp.inf)
                neg, sel_idx = jax.lax.sort((-sel, src), num_keys=2)
                circles = uniq[sel_idx]
                acc = parallel_greedy_nms(circles, jnp.isfinite(-neg),
                                          min_dist=8, height=H, width=W,
                                          max_radius=MAX_R)
                t = acc.sum().astype(jnp.float32)
                return carry + t * 1e-20, t
            _, outs = jax.lax.scan(body, s0, None, length=reps)
            return outs.sum()
        return run

    out["tail_ms"] = round(time_chained(tail, scores0), 2)
    out["edge_stack_ms"] = "see chain_time.py"
    out["accounted_ms"] = round(out["proposals_ms"] + out["dedupe_ms"]
                                + out["score_ms"] + out["tail_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
