"""Does XLA's TPU conv hit the 2x int8 MXU path at the score-conv shape?

Measures the exact folded score-conv shape (1024^2 plane, s2d=16,
8 harmonic channels, 5 radii) in bf16 vs int8(+int32 accum), chained via
lax.scan to dodge the dispatch floor (see scripts/chain_time.py).

Run on the TPU host, never alongside the pytest suite:
    python scripts/conv_int8_experiments.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 32

# 1024^2 plane, pad 2*12=24 -> 1072, s2d=16 -> 67x67 quads.
HQ = WQ = 67
C_IN = 8 * 256
C_OUT = 5 * 256
NQ = 3


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


def conv_bf16(reps):
    w = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.01, (C_OUT, C_IN, NQ, NQ)),
        jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(carry, _):
            out = jax.lax.conv_general_dilated(
                carry[None], w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32)
            s = out.sum()
            return carry + (s * 1e-20).astype(carry.dtype), s
        _, outs = jax.lax.scan(body, x, None, length=reps)
        return outs.sum()
    return run


def conv_int8(reps):
    w = jnp.asarray(
        np.random.default_rng(0).integers(-127, 128, (C_OUT, C_IN, NQ, NQ)),
        jnp.int8)

    @jax.jit
    def run(x):
        def body(carry, _):
            out = jax.lax.conv_general_dilated(
                carry[None], w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.int32)
            s = out.sum()
            return carry ^ (s & 1).astype(jnp.int8), s
        _, outs = jax.lax.scan(body, x, None, length=reps)
        return outs.sum()
    return run


def conv_int8_dequant(reps):
    """int8 conv + the per-channel dequant epilogue the real path needs."""
    w = jnp.asarray(
        np.random.default_rng(0).integers(-127, 128, (C_OUT, C_IN, NQ, NQ)),
        jnp.int8)
    scale = jnp.asarray(
        np.random.default_rng(1).uniform(1e-5, 1e-4, (C_OUT, 1, 1)),
        jnp.float32)

    @jax.jit
    def run(x):
        def body(carry, _):
            out = jax.lax.conv_general_dilated(
                carry[None], w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.int32)
            f = out[0].astype(jnp.float32) * scale
            s = f.sum()
            return carry ^ (s > 0).astype(jnp.int8), s
        _, outs = jax.lax.scan(body, x, None, length=reps)
        return outs.sum()
    return run


def main():
    out = {"shape": f"(1,{C_IN},{HQ},{WQ}) x ({C_OUT},{C_IN},{NQ},{NQ})"}
    gflop = 2 * HQ * WQ * C_IN * NQ * NQ * C_OUT / 1e9
    out["gflop"] = round(gflop, 1)

    xf = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (C_IN, HQ, WQ)), jnp.bfloat16)
    ms = time_chained(conv_bf16, xf)
    out["bf16_ms"] = round(ms, 3)
    out["bf16_tflops"] = round(gflop / ms, 1)

    xi = jnp.asarray(
        np.random.default_rng(2).integers(-127, 128, (C_IN, HQ, WQ)),
        jnp.int8)
    ms = time_chained(conv_int8, xi)
    out["int8_ms"] = round(ms, 3)
    out["int8_tops"] = round(gflop / ms, 1)

    ms = time_chained(conv_int8_dequant, xi)
    out["int8_dequant_ms"] = round(ms, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
