"""Score-conv utilization experiments at 1024^2 (VERDICT r3 item 6).

The folded score conv measures ~1.8 ms chained at ~59% MXU (211 GFLOP at
s2d=16, nq=3: bf16 peak would be ~1.08 ms). Variants tried here, all
exactness-checked against the production `score_maps_folded` output:

  base     — production NCHW conv_general_dilated (the baseline).
  pad8     — fold output q-dims padded up to multiples of 8.
  nhwc     — NHWC dimension numbers (TPU's native conv layout).
  matmul   — nq^2 shifted-slice matmuls accumulated in f32
             (dot_general per tap; no im2col materialization).

Run on the TPU host (never alongside the pytest suite):
    python scripts/conv_experiments.py
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
from magnify_tpu.ops import score as score_mod  # noqa: E402
from magnify_tpu.ops.detect import normalize_planes_u8  # noqa: E402
from magnify_tpu.ops.score import (  # noqa: E402
    _alignment_features,
    _s2d_ring_kernel,
    _space_to_depth,
    score_maps_folded,
)

H = W = 1024
MIN_R, MAX_R = 8, 12
S2D = 16
REPS = 32


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


def folded_variant(gap, egp, kind: str):
    """One score_maps_folded twin with the experimental conv formulation."""
    feats = _alignment_features(gap, egp)
    c, hp, wp = feats.shape
    s = S2D
    hpad = (-hp) % s
    wpad = (-wp) % s
    x = jnp.pad(feats, ((0, 0), (0, hpad), (0, wpad)))
    x = _space_to_depth(x, s)[None]  # (1, C*s*s, Hq, Wq)
    w2, q0 = _s2d_ring_kernel(MIN_R, MAX_R, s)
    w2 = jnp.asarray(w2, jnp.bfloat16)
    nq = w2.shape[-1]

    if kind == "base":
        out = jax.lax.conv_general_dilated(
            x, w2, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        return out[0]

    if kind == "pad8":
        _, cq, hq, wq = x.shape
        hq8 = -(-hq // 8) * 8
        wq8 = -(-wq // 8) * 8
        xp_ = jnp.pad(x, ((0, 0), (0, 0), (0, hq8 - hq), (0, wq8 - wq)))
        out = jax.lax.conv_general_dilated(
            xp_, w2, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        return out[0, :, :hq, :wq]

    if kind == "nhwc":
        xh = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        wh = jnp.transpose(w2, (2, 3, 1, 0))  # HWIO
        out = jax.lax.conv_general_dilated(
            xh, wh, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.transpose(out[0], (2, 0, 1))

    if kind == "matmul":
        # out[co, y, x] = sum_{dy,dx,ci} W[co, ci, dy, dx] *
        #                 X[ci, y+dy-q0, x+dx-q0]
        _, cq, hq, wq = x.shape
        co = w2.shape[0]
        xpad = jnp.pad(x[0], ((0, 0), (q0, q0), (q0, q0)))
        acc = jnp.zeros((hq * wq, co), jnp.float32)
        for dy in range(nq):
            for dx in range(nq):
                xs = jax.lax.dynamic_slice(xpad, (0, dy, dx), (cq, hq, wq))
                xm = xs.reshape(cq, hq * wq).T  # (HW, Cin) bf16
                wm = w2[:, :, dy, dx].T  # (Cin, Cout) bf16
                acc = acc + jax.lax.dot_general(
                    xm, wm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return acc.T.reshape(co, hq, wq)

    raise ValueError(kind)


def main():
    plane = fixture_plane()
    edges, dx, dy, ga = jax.jit(functools.partial(
        edge_ops.edge_pipeline, normalized=True))(plane, 0.1, 0.9)
    pad = 2 * MAX_R
    gap = jnp.pad(ga, pad)
    egp = jnp.pad(edges, pad)

    ref = np.asarray(jax.jit(
        lambda g, e: score_maps_folded(g, e, min_radius=MIN_R,
                                       max_radius=MAX_R, s2d=S2D)[0]
    )(gap, egp))

    out = {"reps": REPS}
    for kind in ("base", "pad8", "nhwc", "matmul"):
        got = np.asarray(jax.jit(
            functools.partial(folded_variant, kind=kind))(gap, egp))
        err = float(np.max(np.abs(got - ref)))
        bitsame = bool((got == ref).all())

        def maps(reps, kind=kind):
            @jax.jit
            def run(g, e):
                def body(carry, _):
                    cg, ce = carry
                    folded = folded_variant(cg, ce, kind)
                    s0 = folded[0, 0, 0]
                    return (cg + s0 * 1e-20, ce), s0
                _, outs = jax.lax.scan(body, (g, e), None, length=reps)
                return outs.sum()
            return run

        ms = time_chained(maps, gap, egp)
        out[kind] = {"ms": round(ms, 3), "max_abs_err": err,
                     "bit_identical": bitsame}
        print(kind, out[kind], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
