"""How fast can 5e6 random gathers from a 1M-entry table go on v5e?

The RANSAC proposals stage is ~170 ms of order-table gathers (3x 5e6
elements from a (1M,) int32 array — ~88M elements/s, i.e. XLA's 1-D
dynamic-gather lowering is serialized). Candidates measured here:

  flat      — plain x[idx] on the (1M,) table (the baseline).
  rows      — table reshaped (8192, 128); gather whole 128-lane rows by
              idx // 128, then select the lane with a one-hot multiply +
              row-sum (pure VPU traffic, no per-element addressing).
  rows_dot  — same row gather, lane select via bf16 dot (MXU).
  flat16    — plain gather from an int16 view (probe: is it
              element-count-bound or byte-bound?).
  sorted    — plain gather with ASCENDING indices (probe: does access
              locality matter? if yes, a stratified-sorted RANSAC
              sampler gets it for free).
  small     — plain gather from a 4K-entry table (probe: table-size
              dependence; the starts/counts LUT is 2.7K entries).

Run on the TPU host: python scripts/gather_experiments.py
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

N_TABLE = 1 << 20
N_IDX = 5_000_000
REPS = 8


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
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 20, N_TABLE, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, N_TABLE, N_IDX, dtype=np.int32))
    table2 = table.reshape(-1, 128)
    out = {"n_table": N_TABLE, "n_idx": N_IDX, "reps": REPS}

    def chain(fn):
        # The indices must be data-dependent per iteration or XLA hoists
        # the gather out of the scan (an `s & 0` carry constant-folds).
        # XOR-ing bit 0 with the previous iteration's result keeps the
        # distribution (and sortedness, modulo adjacent swaps) intact.
        def make(reps):
            @jax.jit
            def run(ix):
                def body(prev, _):
                    v = fn(ix ^ (prev & 1))
                    s = v[0] + v[-1]
                    return s, s
                _, outs = jax.lax.scan(body, jnp.int32(0), None,
                                       length=reps)
                return outs.sum()
            return run
        return make

    def flat(ix):
        return table[ix]

    def rows(ix):
        r = table2[ix >> 7]  # (N, 128) row gather
        lane = ix & 127
        onehot = (jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
                  == lane[:, None])
        return jnp.sum(jnp.where(onehot, r, 0), axis=1)

    def rows_dot(ix):
        r = table2[ix >> 7].astype(jnp.bfloat16)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
                  == (ix & 127)[:, None]).astype(jnp.bfloat16)
        # bf16 mantissa can't hold 2^20 ids; this variant only measures the
        # select cost, exactness would need a hi/lo split.
        return jax.lax.dot_general(
            r[:, None, :], onehot[:, None, :],
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, 0].astype(jnp.int32)

    table16 = table.astype(jnp.int16)

    def flat16(ix):
        return table16[ix].astype(jnp.int32)

    idx_sorted = jnp.sort(idx)

    table_small = table[: 1 << 12]

    def small(ix):
        return table_small[ix & 0xFFF]

    def rows_w(width):
        tw = table.reshape(-1, width)
        shift = width.bit_length() - 1

        def f(ix):
            r = tw[ix >> shift]
            onehot = (jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
                      == (ix & (width - 1))[:, None])
            return jnp.sum(jnp.where(onehot, r, 0), axis=1)
        return f

    cases = [("flat", flat, idx), ("rows", rows, idx),
             ("rows_dot", rows_dot, idx), ("flat16", flat16, idx),
             ("sorted", flat, idx_sorted), ("small", small, idx)]
    cases += [(f"rows{w}", rows_w(w), idx) for w in (8, 16, 32, 256, 512)]
    for name, fn, arg in cases:
        ms = time_chained(chain(fn), arg)
        out[name + "_ms"] = round(ms, 2)
        print(name, out[name + "_ms"], flush=True)

    # exactness of the rows formulation
    a = np.asarray(jax.jit(flat)(idx[:100000]))
    b = np.asarray(jax.jit(rows)(idx[:100000]))
    out["rows_exact"] = bool((a == b).all())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
