"""Sub-stage split of candidate_circles + dedupe at 5e6 iters (item 10 digs).

ransac_time.py measured proposals=172ms / dedupe=85ms with ~120ms of the
385ms frame unaccounted — the CSR build (cumsum + 1M-element scatter) is
loop-invariant in that harness and XLA hoists it out of the scan. Here
every chained iteration perturbs the edge mask (one pixel toggles), so the
CSR build re-runs per iteration.

Run on the TPU host: python scripts/ransac_substage_time.py
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
from magnify_tpu.ops.detect import normalize_planes_u8  # noqa: E402
from magnify_tpu.ops.ransac import _cell_major_perm  # noqa: E402

H = W = 1024
GRID = 20
NUM_ITER = 5_000_000
REPS = 8


def fixture_edges():
    rng = np.random.default_rng(0)
    img = rng.normal(100, 5, (H, W)).astype(np.uint16)
    from magnify_tpu.utils import filled_circle_points

    for pos in [(r * 97 + 60, c * 83 + 50) for r in range(10)
                for c in range(11)]:
        pts = filled_circle_points(10) + np.array(pos)
        img[pts[:, 0], pts[:, 1]] = 1000
    plane = jnp.asarray(normalize_planes_u8(img[None])[0].astype(np.float32))
    edges, *_ = jax.jit(functools.partial(
        edge_ops.edge_pipeline, normalized=True))(plane, 0.1, 0.9)
    return edges


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


def csr_build(edges):
    """The CSR-order build from candidate_circles (ransac.py:60-81)."""
    h, w = edges.shape
    flat = edges.reshape(-1).astype(jnp.int32)
    perm = jnp.asarray(_cell_major_perm(h, w, GRID))
    e_cm = flat[perm]
    slot = jnp.cumsum(e_cm) - 1
    order = jnp.zeros((h * w,), jnp.int32).at[
        jnp.where(e_cm > 0, slot, h * w)
    ].set(perm, mode="drop")
    return order, flat.sum()


def csr_build_sorted(edges):
    """Scatter-free alternative: one stable u32 key sort.

    Key = (not edge) * 2^20 + cell-major position: edge pixels sort to the
    front in cell-major order — exactly the ``order`` array's live prefix.
    """
    h, w = edges.shape
    flat = edges.reshape(-1)
    perm = jnp.asarray(_cell_major_perm(h, w, GRID))
    e_cm = flat[perm]
    key = jnp.where(e_cm, jnp.uint32(0), jnp.uint32(1 << 21)) + jnp.arange(
        h * w, dtype=jnp.uint32)
    _, order = jax.lax.sort((key, perm), num_keys=1)
    return order, flat.astype(jnp.int32).sum()


def main():
    edges0 = fixture_edges()
    out = {"reps": REPS, "num_iter": NUM_ITER}

    def perturb(e, i):
        # toggle one pixel so the CSR build is iteration-dependent
        return e.at[i % H, (7 * i) % W].set(True)

    def chain(stage_fn):
        def make(reps):
            @jax.jit
            def run(e):
                def body(carry, i):
                    ei = perturb(carry, i)
                    order, total = stage_fn(ei)
                    s = order[0] + order[-1] + total
                    return carry, s
                _, outs = jax.lax.scan(body, e, jnp.arange(reps))
                return outs.sum()
            return run
        return make

    out["csr_scatter_ms"] = round(time_chained(chain(csr_build), edges0), 2)
    out["csr_sorted_ms"] = round(
        time_chained(chain(csr_build_sorted), edges0), 2)

    # Exactness: live prefix of both orders must be identical.
    o1, t1 = jax.jit(csr_build)(edges0)
    o2, t2 = jax.jit(csr_build_sorted)(edges0)
    n = int(t1)
    assert int(t2) == n
    same = bool((np.asarray(o1[:n]) == np.asarray(o2[:n])).all())
    out["orders_identical"] = same
    out["n_edges"] = n

    # Sampling gathers + circumcircle arithmetic with a PRE-BUILT order
    # (the part ransac_time.py's proposals_ms actually measured is RNG +
    # these gathers + algebra; here split further).
    k = jax.random.PRNGKey(0)
    order = o1
    flat = edges0.reshape(-1).astype(jnp.int32)
    total = flat.sum()
    n_grid_cols = -(-W // GRID)
    gh = -(-H // GRID) * GRID
    gw = -(-W // GRID) * GRID
    padded = jnp.pad(flat.reshape(H, W), ((0, gh - H), (0, gw - W)))
    counts = padded.reshape(gh // GRID, GRID, gw // GRID, GRID).sum((1, 3))
    counts_flat = jnp.maximum(counts.reshape(-1), 1)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts.reshape(-1))[:-1]])

    def rng_only(reps):
        @jax.jit
        def run(key):
            def body(carry, i):
                kk = jax.random.fold_in(key, i)
                k0, k1, k2 = jax.random.split(kk, 3)
                u0 = jax.random.randint(k0, (NUM_ITER,), 0,
                                        jnp.maximum(total, 1))
                u1 = jax.random.randint(k1, (NUM_ITER,), 0,
                                        jnp.iinfo(jnp.int32).max)
                u2 = jax.random.randint(k2, (NUM_ITER,), 0,
                                        jnp.iinfo(jnp.int32).max)
                s = u0[0] + u1[1] + u2[2] + u0[-1]
                return carry, s
            _, outs = jax.lax.scan(body, jnp.int32(0), jnp.arange(reps))
            return outs.sum()
        return run

    out["rng_ms"] = round(time_chained(rng_only, k), 2)

    def gathers(reps):
        @jax.jit
        def run(key):
            def body(carry, i):
                kk = jax.random.fold_in(key, i)
                k0, k1, k2 = jax.random.split(kk, 3)
                u0 = jax.random.randint(k0, (NUM_ITER,), 0,
                                        jnp.maximum(total, 1))
                u1 = jax.random.randint(k1, (NUM_ITER,), 0,
                                        jnp.iinfo(jnp.int32).max)
                u2 = jax.random.randint(k2, (NUM_ITER,), 0,
                                        jnp.iinfo(jnp.int32).max)
                p0_flat = order[u0]
                p0r = p0_flat // W
                p0c = p0_flat % W
                c0 = (p0r // GRID) * n_grid_cols + p0c // GRID
                j1 = starts[c0] + u1 % counts_flat[c0]
                j2 = starts[c0] + u2 % counts_flat[c0]
                p1 = order[j1]
                p2 = order[j2]
                s = p1[0] + p2[1] + p0_flat[-1]
                return carry, s
            _, outs = jax.lax.scan(body, jnp.int32(0), jnp.arange(reps))
            return outs.sum()
        return run

    out["rng_gathers_ms"] = round(time_chained(gathers, k), 2)

    def mod_only(reps):
        @jax.jit
        def run(key):
            def body(carry, i):
                kk = jax.random.fold_in(key, i)
                k1, k2 = jax.random.split(kk, 2)
                u1 = jax.random.randint(k1, (NUM_ITER,), 0,
                                        jnp.iinfo(jnp.int32).max)
                u2 = jax.random.randint(k2, (NUM_ITER,), 0,
                                        jnp.iinfo(jnp.int32).max)
                c0 = u1 % counts_flat.shape[0]
                m1 = u1 % counts_flat[c0]
                m2 = u2 % counts_flat[c0]
                s = m1[0] + m2[1]
                return carry, s
            _, outs = jax.lax.scan(body, jnp.int32(0), jnp.arange(reps))
            return outs.sum()
        return run

    out["rng_mod_ms"] = round(time_chained(mod_only, k), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
