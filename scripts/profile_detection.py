"""Per-stage device profile of the 1024^2 dense detection dispatch.

Times each sub-program of ops.detect._stage_dense_packed separately with
queued dispatches (relay round trip amortized), so the top bins of the
~13 ms frame are visible: edge stack (blur/Scharr/quantile/Canny),
MXU score maps, survivor compaction + sort, NMS, packing.

Run on the TPU host:  python scripts/profile_detection.py [s2d]

NOTE: each row here pays the ~2-6 ms per-dispatch floor (see CLAUDE.md);
for floor-free per-stage times use scripts/chain_time.py, which chains
each stage inside one jit via lax.scan.
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
from magnify_tpu.ops.detect import (  # noqa: E402
    _stage_dense_packed,
    normalize_planes_u8,
)
from magnify_tpu.ops.score import score_maps  # noqa: E402

H = W = 1024
MIN_R, MAX_R = 8, 12


def bench(fn, n=16):
    out = fn()
    jax.tree.map(lambda x: x.block_until_ready(), out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    np.asarray(jax.tree.leaves(outs[-1])[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n * 1000


def main():
    s2d = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.default_rng(0)
    img = rng.normal(100, 5, (H, W)).astype(np.uint16)
    from magnify_tpu.utils import filled_circle_points

    for pos in [(r * 97 + 60, c * 83 + 50) for r in range(10)
                for c in range(11)]:
        pts = filled_circle_points(10) + np.array(pos)
        img[pts[:, 0], pts[:, 1]] = 1000
    plane = jnp.asarray(normalize_planes_u8(img[None])[0])

    timings = {}

    # Every sub-program reduces its result to a scalar ON DEVICE: pulling a
    # full plane through the relay costs ~30-60 ms/MB, which would swamp the
    # few-ms stage times being measured (the packed full program only pulls
    # ~8 KB, so per-stage numbers must match that transfer profile).

    @jax.jit
    def edges_only(im):
        return edge_ops.edge_pipeline(im, 0.1, 0.9, normalized=True)[0].sum()

    timings["edge_stack_ms"] = round(bench(lambda: edges_only(plane)), 2)

    @jax.jit
    def blur_scharr(im):
        blurred = edge_ops.gaussian_blur5_u8(im.astype(jnp.float32))
        dx, dy = edge_ops.scharr(blurred)
        return (dx + dy).sum()

    timings["blur_scharr_ms"] = round(bench(lambda: blur_scharr(plane)), 2)

    @jax.jit
    def quantiles(im):
        blurred = edge_ops.gaussian_blur5_u8(im.astype(jnp.float32))
        dx, dy = edge_ops.scharr(blurred)
        grad = jnp.sqrt(dx * dx + dy * dy)
        return edge_ops.histogram_quantiles(
            grad, jnp.asarray([0.1, 0.9], jnp.float32)).sum()

    timings["thru_quantiles_ms"] = round(bench(lambda: quantiles(plane)), 2)

    edges_d, _, _, ga_d = jax.jit(
        functools.partial(edge_ops.edge_pipeline, normalized=True)
    )(plane, 0.1, 0.9)
    pad = 2 * MAX_R
    gap = jnp.pad(ga_d, pad)
    egp = jnp.pad(edges_d, pad)

    @functools.partial(jax.jit, static_argnames=("s",))
    def maps_only(ga, eg, s):
        return score_maps(ga, eg, min_radius=MIN_R, max_radius=MAX_R,
                          s2d=s).sum()

    for s in (1, 4, 8, 16):
        try:
            timings[f"score_maps_s2d{s}_ms"] = round(
                bench(lambda: maps_only(gap, egp, s)), 2)
        except Exception as e:  # noqa: BLE001
            timings[f"score_maps_s2d{s}_ms"] = str(e)[:80]

    kw = dict(min_radius=MIN_R, max_radius=MAX_R, cap=2048, nms_cap=2048,
              min_dist=8, pull_cap=511, normalized=True)
    timings["full_packed_ms"] = round(
        bench(lambda: _stage_dense_packed(plane, 0.1, 0.9, 0.3, **kw)), 2)

    kw0 = dict(kw, min_dist=0)
    timings["packed_no_nms_ms"] = round(
        bench(lambda: _stage_dense_packed(plane, 0.1, 0.9, 0.3, **kw0)), 2)

    print(json.dumps({"s2d_default": s2d, **timings}))


if __name__ == "__main__":
    main()
