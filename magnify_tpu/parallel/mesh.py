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


def _sharded_best_circle(edges, grad_angles, min_radius, max_radius,
                         min_roundness):
    """Per-plane best circle from row-sharded score maps (inside shard_map).

    Each shard convolves its rows (with a 2R-row halo so rings crossing the
    shard boundary score correctly), takes its local argmax, and a pmax over
    ``space`` picks the global winner — the sharded analog of the dense
    detector's argmax path.
    """
    from magnify_tpu.ops.score import score_maps

    halo = 2 * max_radius
    ga = _exchange_halo(grad_angles, halo, "space")
    eg = _exchange_halo(edges, halo, "space")
    # Pad columns only (rows already extended by the halo exchange).
    ga = jnp.pad(ga, ((0, 0), (halo, halo)))
    eg = jnp.pad(eg, ((0, 0), (halo, halo)))
    maps = score_maps(ga, eg, min_radius=min_radius, max_radius=max_radius,
                      s2d=1)
    # Keep only centers whose row belongs to this shard.
    maps = maps[:, halo:-halo, :]

    local_rows = edges.shape[0]
    shard = jax.lax.axis_index("space")
    n_r, lh, wp = maps.shape
    rows_local = jax.lax.broadcasted_iota(jnp.int32, maps.shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, maps.shape, 2) - halo
    rads = jax.lax.broadcasted_iota(jnp.int32, maps.shape, 0) + min_radius
    rows_global = rows_local + shard * local_rows
    total_rows = local_rows * jax.lax.axis_size("space")
    ok = (rows_global + rads >= 0) & (cols + rads >= 0)
    ok &= (rows_global - rads < total_rows) & (cols - rads < edges.shape[1])
    masked = jnp.where(ok & (maps >= min_roundness), maps, -jnp.inf)

    flat = masked.reshape(-1)
    best = jnp.argmax(flat)
    best_score = flat[best]
    r_idx = best // (lh * wp)
    rem = best % (lh * wp)
    circle = jnp.stack([
        rem // wp + shard * local_rows,
        rem % wp - halo,
        r_idx + min_radius,
    ])
    # Global winner across shards: pmax on score, then broadcast the
    # winning shard's circle.
    global_best = jax.lax.pmax(best_score, "space")
    is_winner = (best_score == global_best) & jnp.isfinite(global_best)
    circle = jax.lax.pmax(
        jnp.where(is_winner, circle, -jnp.ones_like(circle)), "space"
    )
    return circle, global_best


def sharded_detect_step(images, mesh: Mesh, low_q: float = 0.1,
                        high_q: float = 0.9, min_radius: int = 4,
                        max_radius: int = 8, min_roundness: float = 0.2):
    """One full sharded processing step over a plane batch.

    The framework's flagship multi-chip step: the sharded edge stack (halo
    stencils + psum quantiles + collective hysteresis), sharded MXU score
    maps, per-plane global-best circle via cross-shard pmax, and psum'd edge
    statistics. Everything shards over (batch, space); per-plane summaries
    come back replicated along ``space``.
    """
    edges, grad_angles = sharded_edge_pipeline(images, mesh, low_q, high_q)

    spec = P("batch", "space", None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec),
        out_specs=(P("batch"), P("batch"), P("batch"), P("batch")),
    )
    def reduce_stats(e, ga):
        count = jax.lax.psum(e.sum(axis=(1, 2)), "space")
        energy = jax.lax.psum(
            jnp.where(e, jnp.abs(ga), 0.0).sum(axis=(1, 2)), "space"
        )

        def one(e1, ga1):
            return _sharded_best_circle(e1, ga1, min_radius, max_radius,
                                        min_roundness)

        circles, scores = jax.vmap(one)(e, ga)
        return count, energy, circles, scores

    count, energy, circles, scores = reduce_stats(edges, grad_angles)
    return {"edges": edges, "edge_count": count, "edge_energy": energy,
            "best_circle": circles, "best_score": scores}
