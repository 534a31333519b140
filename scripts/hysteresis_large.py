"""Re-measure tiled-Pallas vs XLA hysteresis routing on > VMEM planes.

The routing default (ops/pallas_kernels.pallas_preferred) keeps XLA's
fused dilate fixpoint for planes > 1M px based on a round-3 measurement
(tiled 49-56 ms vs XLA 36 ms at 4096^2 on a long-chain torture mask).
The separable 3-tap max rewrite cut the per-sweep cost ~3x, so the
decision needs re-measuring.

Masks: the round-3 torture geometry — a weak serpentine chain spanning
the plane seeded at one end (worst case: propagation must cross every
block), plus a realistic noisy-edge mask from the bench fixture scaled up.

Run on the TPU host (never alongside the pytest suite):
    python scripts/hysteresis_large.py [H W]
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
from magnify_tpu.ops.pallas_kernels import (  # noqa: E402
    _hysteresis_tiled_call,
    _tile_rows_for_width,
)

H = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
W = int(sys.argv[2]) if len(sys.argv) > 2 else 4096


def serpentine_mask():
    """Weak serpentine chain across the whole plane, strong seed at start."""
    weak = np.zeros((H, W), np.int32)
    for i in range(0, H, 8):
        row = i
        if (i // 8) % 2 == 0:
            weak[row, 2:W - 2] = 1
        else:
            weak[row, 2] = 1
        if row + 8 < H:
            weak[row:row + 9, 2 if (i // 8) % 2 == 1 else W - 3] = 1
    strong = np.zeros((H, W), np.int32)
    strong[0, 2] = 1
    weak |= strong
    return strong, weak


def noisy_mask():
    rng = np.random.default_rng(0)
    img = rng.normal(100, 5, (H, W)).astype(np.float32)
    from magnify_tpu.utils import filled_circle_points

    for pos in [(r * 97 + 60, c * 83 + 50) for r in range(H // 100)
                for c in range(W // 90)]:
        pts = filled_circle_points(10) + np.array(pos)
        img[pts[:, 0], pts[:, 1]] = 1000
    u8 = edge_ops.normalize_to_u8(jnp.asarray(img))
    blurred = edge_ops.gaussian_blur5_u8(u8)
    dx, dy = jax.jit(edge_ops.scharr)(blurred)
    grad = jnp.sqrt(dx * dx + dy * dy)
    lo, hi = jax.jit(edge_ops.histogram_quantiles)(
        grad, jnp.asarray([0.1, 0.9], jnp.float32))
    strong, weak = jax.jit(edge_ops.canny_nms)(dx, dy, lo, hi)
    return (np.asarray(strong).astype(np.int32),
            np.asarray(weak).astype(np.int32))


@jax.jit
def xla_fixpoint(strong, weak):
    def cond(state):
        return state[1]

    def body(state):
        cur, _ = state
        grown = edge_ops.dilate8(cur) & weak | cur
        return grown, jnp.any(grown != cur)

    edges, _ = jax.lax.while_loop(cond, body,
                                  (strong.astype(bool), jnp.asarray(True)))
    return edges


def run_tiled(strong, weak):
    tr = _tile_rows_for_width(-(-W // 128) * 128)
    return _hysteresis_tiled_call(strong, weak, tr, False) > 0


def best_of(fn, *args, n=4):
    np.asarray(fn(*args))  # warm
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def main():
    out = {"shape": [H, W]}
    for name, (strong, weak) in (("serpentine", serpentine_mask()),
                                 ("noisy", noisy_mask())):
        s = jnp.asarray(strong)
        w = jnp.asarray(weak)
        a = np.asarray(xla_fixpoint(s, w))
        b = np.asarray(run_tiled(s, w))
        assert (a == b).all(), f"parity failure on {name}"
        out[name] = {
            "xla_ms": round(best_of(xla_fixpoint, s, w), 1),
            "tiled_ms": round(best_of(run_tiled, s, w), 1),
            "edge_px": int(a.sum()),
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
