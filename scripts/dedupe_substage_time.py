"""Sub-stage bisection of dedupe_circles at 5e6 candidates (1024^2).

Prefix-chained like ransac_prefix_time.py: each prefix recomputes from the
candidate vectors (threaded through the scan carry so nothing hoists), and
consecutive differences are in-frame stage costs.

Run on the TPU host: python scripts/dedupe_substage_time.py
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

from magnify_tpu.ops.ransac import _gather_rows, _pad128  # noqa: E402

H = W = 1024
MIN_R, MAX_R = 8, 12
N = 5_000_000
CAP = 1 << 20
REPS = 8


def prefix(rowf, colf, radf, upto: str):
    row = jnp.round(rowf).astype(jnp.int32)
    col = jnp.round(colf).astype(jnp.int32)
    rad = jnp.round(radf).astype(jnp.int32)
    ok = (rad >= MIN_R) & (rad <= MAX_R)
    ok &= (row + rad >= 0) & (col + rad >= 0)
    ok &= (row - rad < H) & (col - rad < W)
    kh = H + 2 * MAX_R + 1
    kw = W + 2 * MAX_R + 1
    kr = MAX_R - MIN_R + 1
    key_space = kh * kw * kr
    key = ((row + MAX_R) * kw + (col + MAX_R)) * kr + (rad - MIN_R)
    if upto == "filters":
        return key[0] + key[-1] + ok.sum()
    nb = -(-key_space // 128)
    live = jnp.zeros((nb * 128,), jnp.bool_).at[
        jnp.where(ok, key, nb * 128)
    ].set(True, mode="drop")
    if upto == "scatter":
        return live[0].astype(jnp.int32) + live[-1]
    blocks = live.reshape(nb, 128)
    bsum = blocks.sum(axis=1, dtype=jnp.int32)
    csum = jnp.cumsum(bsum)
    n_unique = csum[-1]
    bstart = csum - bsum
    if upto == "counts":
        return n_unique + bstart[0]
    blk = jnp.zeros((CAP,), jnp.int32).at[bstart].max(
        jnp.arange(nb, dtype=jnp.int32), mode="drop")
    blk = jax.lax.associative_scan(jnp.maximum, blk)
    if upto == "blk":
        return blk[0] + blk[-1] + n_unique
    bstart_pad = jnp.pad(bstart, (0, _pad128(nb) - nb))
    q = jnp.arange(CAP, dtype=jnp.int32) - _gather_rows(bstart_pad, blk)
    if upto == "qgather":
        return q[0] + q[-1] + n_unique
    if upto == "scatter32":
        live32 = jnp.zeros((nb * 128,), jnp.int32).at[
            jnp.where(ok, key, nb * 128)
        ].set(1, mode="drop")
        return live32[0] + live32[-1]
    if upto == "fullw":
        # 32-bit word granularity: pack the raster into uint32 bitmask
        # words, rank per word, then per output slot gather ONE word row
        # and binary-search the q-th set bit via popcount.
        nw = nb * 4
        lanes = jax.lax.broadcasted_iota(jnp.uint32, (nb, 128), 1)
        bits = jnp.where(blocks, jnp.uint32(1) << (lanes & 31),
                         jnp.uint32(0))
        g = bits.reshape(nb, 4, 32).sum(axis=2, dtype=jnp.uint32)
        words = g.reshape(nw)
        wsum = jax.lax.population_count(words).astype(jnp.int32)
        wcsum = jnp.cumsum(wsum)
        n_unique2 = wcsum[-1]
        wstart = wcsum - wsum
        wid = jnp.zeros((CAP,), jnp.int32).at[wstart].max(
            jnp.arange(nw, dtype=jnp.int32), mode="drop")
        wid = jax.lax.associative_scan(jnp.maximum, wid)
        wstart_pad = jnp.pad(wstart, (0, _pad128(nw) - nw))
        qq = jnp.arange(CAP, dtype=jnp.int32) - _gather_rows(wstart_pad, wid)
        words_pad = jnp.pad(words, (0, _pad128(nw) - nw))
        w = _gather_rows(words_pad.astype(jnp.int32), wid).astype(jnp.uint32)
        pos = jnp.zeros((CAP,), jnp.int32)
        for b in (16, 8, 4, 2, 1):
            mask = (jnp.uint32(1) << (pos + b).astype(jnp.uint32)) - 1
            c = jax.lax.population_count(w & mask).astype(jnp.int32)
            pos = jnp.where(c <= qq, pos + b, pos)
        out_key = wid * 32 + pos
        return out_key[0] + out_key[-1] + n_unique2
    if upto == "full32":
        blocks32 = blocks.astype(jnp.int32)
        rows_live = blocks32[blk]
        pref = jnp.cumsum(rows_live, axis=1) - 1
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, rows_live.shape, 1)
        lane = jnp.sum(
            jnp.where((rows_live > 0) & (pref == q[:, None]), lane_iota, 0),
            axis=1)
        out_key = blk * 128 + lane
        return out_key[0] + out_key[-1] + n_unique
    rows_live = blocks[blk]
    pref = jnp.cumsum(rows_live.astype(jnp.int32), axis=1) - 1
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, rows_live.shape, 1)
    lane = jnp.sum(
        jnp.where(rows_live & (pref == q[:, None]), lane_iota, 0), axis=1)
    out_key = blk * 128 + lane
    return out_key[0] + out_key[-1] + n_unique


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
    rowf = jnp.asarray(rng.uniform(-20, H + 20, N).astype(np.float32))
    colf = jnp.asarray(rng.uniform(-20, W + 20, N).astype(np.float32))
    radf = jnp.asarray(rng.uniform(MIN_R - 1, MAX_R + 1, N).astype(np.float32))
    out = {"reps": REPS, "n": N, "cap": CAP}
    prev = 0.0
    for upto in ("filters", "scatter", "scatter32", "counts", "blk",
                 "qgather", "full", "full32", "fullw"):
        def make(reps, upto=upto):
            @jax.jit
            def run(r, c, rr):
                def body(carry, _):
                    s = prefix(carry, c, rr, upto)
                    return carry + s.astype(jnp.float32) * 1e-20, s
                _, outs = jax.lax.scan(body, r, None, length=reps)
                return outs.sum()
            return run

        ms = time_chained(make, rowf, colf, radf)
        out[upto] = {"prefix_ms": round(ms, 2),
                     "stage_ms": round(ms - prev, 2)}
        prev = ms
        print(upto, out[upto], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
