"""vmapped vs native-batched folded score maps at B planes (chained).

The batched dense program pays ~0.57 ms/plane more in the maps stage under
jax.vmap than the single-plane program does; this isolates whether a
native leading-batch formulation (features built at (B, C, Hp, Wp), fold
with a leading dim, ONE conv at N=B) recovers it.

    python scripts/batch_maps_experiment.py
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
from magnify_tpu.ops.detect import normalize_planes_u8  # noqa: E402
from magnify_tpu.ops.score import (  # noqa: E402
    _alignment_features,
    _s2d_ring_kernel_q8,
    score_maps_folded,
)

H = W = int(os.environ.get("CHAIN_SIZE", "1024"))
B = int(os.environ.get("BATCH_B", "16"))
REPS = int(os.environ.get("CHAIN_REPS", "8"))
MIN_R, MAX_R = 8, 12


def fixture():
    rng = np.random.default_rng(0)
    img = rng.normal(100, 5, (H, W)).astype(np.uint16)
    from magnify_tpu.utils import filled_circle_points

    for pos in [(r * 97 + 60, c * 83 + 50) for r in range(10)
                for c in range(11)]:
        pts = filled_circle_points(10) + np.array(pos)
        img[pts[:, 0], pts[:, 1]] = 1000
    stack = np.stack([np.roll(img, 3 * b, axis=1) for b in range(B)])
    planes = jnp.asarray(normalize_planes_u8(stack).astype(np.float32))
    eg, dx, dy, _ = jax.jit(jax.vmap(
        lambda im: edge_ops.edge_pipeline(im, 0.1, 0.9,
                                          normalized=True)))(planes)
    pad = 2 * MAX_R
    p3 = ((0, 0), (pad, pad), (pad, pad))
    return jnp.pad(eg, p3), jnp.pad(dx, p3), jnp.pad(dy, p3)


def native_batched_folded(e, gx, gy, s2d=16):
    """(B, Hp, Wp) -> (B, n_r*s*s, Hq, Wq) folded int8 score maps with a
    LEADING batch dim throughout (one conv at N=B)."""
    feats = _alignment_features(None, e, grads=(gx, gy), qdtype="int8")
    # vmapped _alignment_features stacks (C, B, Hp, Wp); native call on
    # (B, ...) inputs gives (C, B, Hp, Wp) too — move batch out front.
    c, b, hp, wp = feats.shape
    feats = feats.transpose(1, 0, 2, 3)
    s = s2d
    hpad = (-hp) % s
    wpad = (-wp) % s
    x = jnp.pad(feats, ((0, 0), (0, 0), (0, hpad), (0, wpad)))
    hq, wq = (hp + hpad) // s, (wp + wpad) // s
    x = x.reshape(b, c, hq, s, wq, s)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, c * s * s, hq, wq)
    qw, scale, _q0 = _s2d_ring_kernel_q8(MIN_R, MAX_R, s)
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(qw), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.int32,
    )
    dq = jnp.asarray(scale / (127.0 * 127.0))[None, :, None, None]
    return out.astype(jnp.float32) * dq


def time_chained(make, args):
    run_r, run_1 = make(REPS), make(1)
    np.asarray(run_r(*args))
    np.asarray(run_1(*args))
    ts = {}
    for label, fn in (("r", run_r), ("1", run_1)):
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        ts[label] = best
    return (ts["r"] - ts["1"]) / (REPS - 1) * 1000


def main():
    egp, dxp, dyp = fixture()

    def vmapped(reps):
        @jax.jit
        def run(e, gx, gy):
            def body(carry, _):
                ce, cx, cy = carry
                folded, _s = jax.vmap(
                    lambda e1, x1, y1: score_maps_folded(
                        None, e1, min_radius=MIN_R, max_radius=MAX_R,
                        grads=(x1, y1)))(ce, cx, cy)
                s = folded[0, 0, 0, 0]
                return (ce, cx + s * 1e-20, cy), s
            _, outs = jax.lax.scan(body, (e, gx, gy), None, length=reps)
            return outs.sum()
        return run

    def native(reps):
        @jax.jit
        def run(e, gx, gy):
            def body(carry, _):
                ce, cx, cy = carry
                folded = native_batched_folded(ce, cx, cy)
                s = folded[0, 0, 0, 0]
                return (ce, cx + s * 1e-20, cy), s
            _, outs = jax.lax.scan(body, (e, gx, gy), None, length=reps)
            return outs.sum()
        return run

    out = {"B": B}
    out["vmapped_ms_per_plane"] = round(
        time_chained(vmapped, (egp, dxp, dyp)) / B, 3)
    out["native_ms_per_plane"] = round(
        time_chained(native, (egp, dxp, dyp)) / B, 3)

    # Exactness: int8 features + int32 accumulation are exact, so the two
    # must be byte-equal.
    want, _ = jax.jit(jax.vmap(
        lambda e1, x1, y1: score_maps_folded(
            None, e1, min_radius=MIN_R, max_radius=MAX_R,
            grads=(x1, y1))))(egp, dxp, dyp)
    got = jax.jit(native_batched_folded)(egp, dxp, dyp)
    out["byte_equal"] = bool(
        (np.asarray(want) == np.asarray(got)).all())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
