"""Presence-scatter floor experiments (RANSAC dedupe, round-5 task 4).

The bitmask dedupe's remaining floor is the 5e6-candidate presence
scatter (~41 ms in-frame, BASELINE.md round-4 profile). This measures
every plausible alternative formulation of "mark 5e6 random keys in a
~5.5M raster" with the chained (dispatch-floor-free) harness to either
find a faster one or establish the floor empirically:

  set_bool     current: bool raster .at[key].set(True)
  max_u8/i32   dtype variants (.at[key].max(1))
  add_i32      counting variant (.at[key].add(1))
  split4       4 independent scatters over N/4 slices, OR-merged
               (tests whether XLA overlaps independent scatter streams)
  small_table  same N into a 2^16 raster (re-checks table-size
               independence at this shape)
  sort5e6      jnp.sort of the 5e6 keys alone (the cheapest sort-based
               dedupe would pay this before any segment pass)

Run on the TPU host: python scripts/scatter_experiments.py
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

N = 5_000_000
KEY_SPACE = (1024 + 25) * (1024 + 25) * 5  # the 1024^2 r8..12 raster
NB = -(-KEY_SPACE // 128)
REPS = int(os.environ.get("CHAIN_REPS", "16"))


def time_chained(make_run, *args, reps=REPS, n=6):
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


def chain(stage):
    """stage(keys int32 (N,)) -> scalar; chained so the scalar perturbs
    the next iteration's keys (no CSE)."""
    def make(reps):
        @jax.jit
        def run(keys):
            def body(carry, _):
                k = (keys + carry) % KEY_SPACE
                return stage(k).astype(jnp.int32), None

            out, _ = jax.lax.scan(body, jnp.int32(0), None, length=reps)
            return out

        return run

    return make


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, KEY_SPACE, N).astype(np.int32))
    out = {"n": N, "key_space": KEY_SPACE, "reps": REPS}

    def set_bool(k):
        live = jnp.zeros((NB * 128,), jnp.bool_).at[k].set(True, mode="drop")
        return live[0].astype(jnp.int32) + live[-1]

    def max_u8(k):
        live = jnp.zeros((NB * 128,), jnp.uint8).at[k].max(
            jnp.uint8(1), mode="drop")
        return live[0].astype(jnp.int32) + live[-1]

    def max_i32(k):
        live = jnp.zeros((NB * 128,), jnp.int32).at[k].max(1, mode="drop")
        return live[0] + live[-1]

    def add_i32(k):
        live = jnp.zeros((NB * 128,), jnp.int32).at[k].add(1, mode="drop")
        return live[0] + live[-1]

    def split4(k):
        acc = jnp.zeros((NB * 128,), jnp.bool_)
        outs = []
        for s in range(4):
            outs.append(jnp.zeros((NB * 128,), jnp.bool_).at[
                k[s::4]].set(True, mode="drop"))
        for o in outs:
            acc = acc | o
        return acc[0].astype(jnp.int32) + acc[-1]

    def small_table(k):
        live = jnp.zeros((1 << 16,), jnp.bool_).at[
            k & 0xFFFF].set(True, mode="drop")
        return live[0].astype(jnp.int32) + live[-1]

    def sort5e6(k):
        s = jnp.sort(k)
        return s[0] + s[-1]

    for name, fn in (("set_bool", set_bool), ("max_u8", max_u8),
                     ("max_i32", max_i32), ("add_i32", add_i32),
                     ("split4", split4), ("small_table", small_table),
                     ("sort5e6", sort5e6)):
        out[name + "_ms"] = round(time_chained(chain(fn), keys), 2)
        print(f"{name}: {out[name + '_ms']} ms", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
