"""Device-mesh sharding for the detection pipeline.

The hot path (normalize -> blur -> Scharr -> quantile -> Canny -> RANSAC
scoring) is re-expressed over a 2-D mesh:

* ``batch`` axis: data parallelism over (time x channel) image planes.
* ``space`` axis: the stitched image plane is sharded by rows — the imaging
  analog of sequence parallelism. 5x5/3x3 stencils exchange halo rows with
  ``ppermute`` over ICI; the global gradient-quantile histogram and Canny
  hysteresis convergence flags ride ``psum``.

Everything is ``shard_map`` over a ``jax.sharding.Mesh``, so the same program
runs on one chip (trivial mesh) or a pod slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from magnify_tpu.ops import edge as edge_ops

__all__ = ["make_mesh", "sharded_detect_step", "sharded_edge_pipeline"]

HALO = 4  # rows each side: 2 (5-tap blur) + 1 (Scharr) + 1 (Canny NMS)


def make_mesh(batch: int | None = None, space: int | None = None,
              devices=None) -> Mesh:
    """Build a (batch, space) mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if batch is None and space is None:
        # Favor spatial sharding: stencils scale better than batch on one
        # large frame, and batch under-utilizes when B < n.
        space = n
        batch = 1
    elif batch is None:
        batch = n // space
    elif space is None:
        space = n // batch
    if batch * space != n:
        raise ValueError(f"batch*space must equal device count ({n}).")
    return Mesh(devices.reshape(batch, space), ("batch", "space"))


def _exchange_halo(local, halo: int, axis_name: str):
    """Send boundary rows to row-neighbors along ``axis_name``."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    top_rows = local[:halo]
    bottom_rows = local[-halo:]
    # From the previous shard: its bottom rows; from the next: its top rows.
    from_prev = jax.lax.ppermute(
        bottom_rows, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_next = jax.lax.ppermute(
        top_rows, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    # Zero-fill at the global image boundary (matching single-chip padding).
    from_prev = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
    from_next = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([from_prev, local, from_next], axis=0)


def _local_edge_stack(img_with_halo, halo: int):
    """Blur + Scharr on a halo-padded shard; returns local-rows results."""
    blurred = edge_ops.gaussian_blur5_u8(img_with_halo)
    dx, dy = edge_ops.scharr(blurred)
    return dx[halo:-halo], dy[halo:-halo]


def _global_histogram_quantile(grad, qs, axis_names, bins=1 << 16):
    """Exact-ish quantiles of the full (sharded) gradient image via a
    psum'd histogram."""
    lo = jax.lax.pmin(jnp.min(grad), axis_names[0])
    hi = jax.lax.pmax(jnp.max(grad), axis_names[0])
    for ax in axis_names[1:]:
        lo = jax.lax.pmin(lo, ax)
        hi = jax.lax.pmax(hi, ax)
    span = jnp.maximum(hi - lo, 1e-30)
    idx = jnp.clip(((grad.reshape(-1) - lo) * (bins / span)).astype(jnp.int32),
                   0, bins - 1)
    hist = jnp.zeros((bins,), jnp.int32).at[idx].add(1)
    for ax in axis_names:
        hist = jax.lax.psum(hist, ax)
    cdf = jnp.cumsum(hist).astype(jnp.float32)
    n = cdf[-1]
    out = []
    for q in qs:
        rank = q * (n - 1)
        b = jnp.searchsorted(cdf, rank, side="right")
        out.append(lo + (b.astype(jnp.float32) + 0.5) * (span / bins))
    return out


def _sharded_edges_one_plane(img, low_q, high_q):
    """Edge pipeline for one row-sharded plane (runs inside shard_map)."""
    # Normalization needs the global min/max.
    lo = jax.lax.pmin(jnp.min(img), "space")
    hi = jax.lax.pmax(jnp.max(img), "space")
    u8 = jnp.trunc(jnp.where(hi > lo, 255.0 * (img - lo) / (hi - lo),
                             img - lo))

    padded = _exchange_halo(u8, HALO, "space")
    dx, dy = _local_edge_stack(padded, HALO)
    grad = jnp.sqrt(dx * dx + dy * dy)
    low_t, high_t = _global_histogram_quantile(grad, [low_q, high_q],
                                               ["space"])

    # Canny NMS needs one halo row of dx/dy/magnitude.
    dxp = _exchange_halo(dx, 1, "space")
    dyp = _exchange_halo(dy, 1, "space")
    strong_weak = edge_ops.canny_nms(dxp, dyp, low_t, high_t)
    strong = strong_weak[0][1:-1]
    weak = strong_weak[1][1:-1]

    # Distributed hysteresis: local dilate-and-mask to fixpoint, then halo
    # exchange; repeat until no shard changes (psum'd flag).
    def cond(state):
        cur, changed = state
        return changed

    def body(state):
        cur, _ = state
        padded_cur = _exchange_halo(cur, 1, "space")
        grown = edge_ops.dilate8(padded_cur)[1:-1] & weak | cur
        changed = jax.lax.psum(jnp.any(grown != cur).astype(jnp.int32),
                               "space") > 0
        return grown, changed

    # The convergence flag is psum'd over "space" but still varies across
    # "batch" shards; mark the initial carry accordingly.
    changed0 = jax.lax.pcast(jnp.asarray(True), "batch", to="varying")
    edges, _ = jax.lax.while_loop(cond, body, (strong, changed0))
    grad_angles = jnp.arctan2(dy, dx)
    return edges, grad_angles


def sharded_edge_pipeline(images, mesh: Mesh, low_q: float, high_q: float):
    """Edge detection for a batch of planes over a (batch, space) mesh.

    images: (B, H, W) with B divisible by the batch axis and H by the space
    axis. Returns (edges bool (B, H, W), grad_angles (B, H, W)) with the same
    sharding.
    """
    spec = P("batch", "space", None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, P(), P()),
        out_specs=(spec, spec),
    )
    def run(imgs, lo, hi):
        def one(img):
            return _sharded_edges_one_plane(img, lo[0], hi[0])

        return jax.vmap(one)(imgs)

    return run(images, jnp.asarray([low_q], jnp.float32),
               jnp.asarray([high_q], jnp.float32))


def sharded_detect_step(images, mesh: Mesh, low_q: float = 0.1,
                        high_q: float = 0.9):
    """One full sharded processing step over a plane batch.

    The framework's "training step" equivalent: flat-field normalize, run
    the sharded edge stack, and reduce per-plane edge statistics (count and
    gradient-energy) — the quantities the detection stages consume. Returns
    a dict of per-plane scalars, fully sharded along ``batch``.
    """
    edges, grad_angles = sharded_edge_pipeline(images, mesh, low_q, high_q)

    spec = P("batch", "space", None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec),
        out_specs=(P("batch"), P("batch")),
    )
    def reduce_stats(e, ga):
        count = jax.lax.psum(e.sum(axis=(1, 2)), "space")
        energy = jax.lax.psum(
            jnp.where(e, jnp.abs(ga), 0.0).sum(axis=(1, 2)), "space"
        )
        return count, energy

    count, energy = reduce_stats(edges, grad_angles)
    return {"edges": edges, "edge_count": count, "edge_energy": energy}
