"""Batched (vmapped) edge-stack sub-stage times per plane vs single-plane.

The batched dense program's edge stage measures 0.74 ms/plane vs 0.52
single-plane (scripts/batch_chain_time.py BATCH_STAGES); this isolates
which sub-stage (blur+Scharr, quantile thresholds, Canny NMS+hysteresis)
pays the vmap tax.

    python scripts/batch_edge_stages.py
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

H = W = int(os.environ.get("CHAIN_SIZE", "1024"))
B = int(os.environ.get("BATCH_B", "16"))
REPS = int(os.environ.get("CHAIN_REPS", "8"))


def fixture_stack(b):
    rng = np.random.default_rng(0)
    img = rng.normal(100, 5, (H, W)).astype(np.uint16)
    from magnify_tpu.utils import filled_circle_points

    for pos in [(r * 97 + 60, c * 83 + 50) for r in range(10)
                for c in range(11)]:
        pts = filled_circle_points(10) + np.array(pos)
        img[pts[:, 0], pts[:, 1]] = 1000
    stack = np.stack([np.roll(img, 3 * k, axis=1) for k in range(b)])
    return jnp.asarray(normalize_planes_u8(stack).astype(np.float32))


def _time(make, args):
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


def chained(stage_fn, batched):
    """Chain stage_fn REPS times; carry threads a scalar back into input."""
    def make(reps):
        @jax.jit
        def run(p):
            def body(carry, _):
                s = stage_fn(carry)
                return carry + s * 1e-20, s
            _, outs = jax.lax.scan(body, p, None, length=reps)
            return outs.sum()
        return run
    return make


def main():
    out = {"B": B, "reps": REPS}
    stack = fixture_stack(B)
    plane = stack[0]

    def blur_scharr_one(im):
        u8 = im.astype(jnp.uint8)
        bl = edge_ops.gaussian_blur5_u8(u8)
        dx, dy = edge_ops.scharr(bl)
        return dx.sum() + dy.sum()

    def quant_one(im):
        u8 = im.astype(jnp.uint8)
        bl = edge_ops.gaussian_blur5_u8(u8)
        dx, dy = edge_ops.scharr(bl)
        mag = jnp.sqrt(dx * dx + dy * dy)
        lo, hi = edge_ops.histogram_quantiles(mag, (0.1, 0.9))
        return lo + hi

    def canny_one(im):
        u8 = im.astype(jnp.uint8)
        bl = edge_ops.gaussian_blur5_u8(u8)
        dx, dy = edge_ops.scharr(bl)
        mag = jnp.sqrt(dx * dx + dy * dy)
        lo, hi = edge_ops.histogram_quantiles(mag, (0.1, 0.9))
        e = edge_ops.canny(dx, dy, lo, hi)
        return e.sum().astype(jnp.float32)

    for name, fn in (("blur_scharr", blur_scharr_one),
                     ("quantiles", quant_one),
                     ("canny_full", canny_one)):
        vm = _time(chained(lambda p, f=fn: jax.vmap(f)(p).sum(), True),
                   (stack,))
        sg = _time(chained(lambda p, f=fn: f(p), False), (plane,))
        out[f"{name}_vmap_ms_per_plane"] = round(vm / B, 3)
        out[f"{name}_single_ms"] = round(sg, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
