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

__all__ = [
    "active_mesh",
    "make_mesh",
    "sharded_detect_step",
    "sharded_edge_pipeline",
    "sharded_find_circles",
    "sharded_find_circles_batch",
    "sharded_find_circles_batch_packed",
    "sharded_ransac_find_circles",
    "use_mesh",
]

HALO = 4  # rows each side: 2 (5-tap blur) + 1 (Scharr) + 1 (Canny NMS)

# The mesh components consult (set with use_mesh). When a mesh with more
# than one device is active, find_circles routes detection through the
# sharded dense path, so BeadFinder/ButtonFinder scale across chips without
# any API change.
_ACTIVE_MESH: Mesh | None = None


class use_mesh:
    """Context manager activating a device mesh for pipeline components.

    with mg.parallel.use_mesh(mesh):
        xp = mg.beads(data=...)   # detection shards over the mesh
    """

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self._prev: Mesh | None = None

    def __enter__(self):
        global _ACTIVE_MESH
        self._prev = _ACTIVE_MESH
        _ACTIVE_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _ACTIVE_MESH
        _ACTIVE_MESH = self._prev
        return False


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH


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


def _exchange_halo(local, halo: int, axis_name: str, boundary: str = "zero"):
    """Send boundary rows to row-neighbors along ``axis_name``.

    ``boundary`` picks the fill at the global image edge: "zero" matches
    the single-chip zero padding used by Canny NMS / hysteresis / scoring;
    "reflect" matches OpenCV's BORDER_REFLECT_101 used by the blur and
    Scharr stencils (row -k := row k), so boundary shards reproduce the
    single-chip stencil values bit-for-bit.
    """
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
    if boundary == "reflect":
        fill_prev = local[halo:0:-1]       # rows halo..1 (REFLECT_101)
        fill_next = local[-2:-halo - 2:-1]  # rows L-2..L-halo-1
    else:
        fill_prev = jnp.zeros_like(from_prev)
        fill_next = jnp.zeros_like(from_next)
    from_prev = jnp.where(idx == 0, fill_prev, from_prev)
    from_next = jnp.where(idx == n - 1, fill_next, from_next)
    return jnp.concatenate([from_prev, local, from_next], axis=0)


def _sharded_edges_one_plane(img, low_q, high_q, valid_h: int,
                             normalized: bool = False):
    """Edge pipeline for one row-sharded plane (runs inside shard_map).

    Bit-identical to the single-chip :func:`magnify_tpu.ops.edge.edge_pipeline`
    on the first ``valid_h`` global rows: stencils exchange real halo rows
    (REFLECT_101 fill at the global boundary, exactly OpenCV's border mode),
    thresholds come from the exact collective histogram-narrowing quantile,
    and rows past ``valid_h`` (mesh padding) are masked out of every global
    statistic and of the edge map.

    ``normalized=True`` skips the collective min/max normalization: the
    caller already holds uint8-valued data (host-normalized with the exact
    twin :func:`magnify_tpu.ops.detect.normalize_planes_u8`, so only 1
    byte/pixel crossed the host->device link).
    """
    local = img.shape[0]
    shard = jax.lax.axis_index("space")
    rows_g = shard * local + jnp.arange(local)
    rowmask = rows_g < valid_h
    live = jnp.broadcast_to(rowmask[:, None], img.shape)

    if normalized:
        u8 = img
    else:
        # Normalization needs the global min/max over valid pixels.
        lo = jax.lax.pmin(jnp.min(jnp.where(live, img, jnp.inf)), "space")
        peak = jax.lax.pmax(jnp.max(jnp.where(live, img - lo, -jnp.inf)),
                            "space")
        shifted = img - lo
        u8 = jnp.trunc(jnp.where(peak > 0, 255.0 * shifted / peak, shifted))

    # Blur with 2 real halo rows, then Scharr on 1 real halo row of the
    # *blurred* values — reflecting each stage's own output at the global
    # boundary, exactly like the single-chip reflect-pad of that stage.
    u8p = _exchange_halo(u8, 2, "space", boundary="reflect")
    blurred = edge_ops.gaussian_blur5_u8(u8p)[2:-2]
    blurredp = _exchange_halo(blurred, 1, "space", boundary="reflect")
    dxp_full, dyp_full = edge_ops.scharr(blurredp)
    dx, dy = dxp_full[1:-1], dyp_full[1:-1]

    grad = jnp.sqrt(dx * dx + dy * dy)
    low_t, high_t = edge_ops.histogram_quantiles(
        grad, jnp.stack([low_q, high_q]), axis_names=("space",), mask=live)

    # Rows past valid_h must present the single-chip zero border to Canny
    # NMS and scoring.
    dx = jnp.where(live, dx, 0.0)
    dy = jnp.where(live, dy, 0.0)

    # Canny NMS needs one halo row of dx/dy/magnitude (zero at boundary,
    # matching the single-chip zero-padded neighborhood).
    dxp = _exchange_halo(dx, 1, "space")
    dyp = _exchange_halo(dy, 1, "space")
    strong_weak = edge_ops.canny_nms(dxp, dyp, low_t, high_t)
    strong = strong_weak[0][1:-1]
    weak = strong_weak[1][1:-1]

    # Distributed hysteresis: local dilate-and-mask to fixpoint, then halo
    # exchange; repeat until no shard changes. The convergence flag psums
    # over BOTH mesh axes: every loop iteration issues collective permutes,
    # and XLA's rendezvous spans the whole mesh — if batch rows iterated
    # different counts (planes converge at different speeds) the collectives
    # would deadlock. Extra iterations on already-converged planes are
    # idempotent (grown == cur at fixpoint), so results are unchanged.
    def cond(state):
        cur, changed = state
        return changed

    def body(state):
        cur, _ = state
        padded_cur = _exchange_halo(cur, 1, "space")
        grown = edge_ops.dilate8(padded_cur)[1:-1] & weak | cur
        delta = jnp.any(grown != cur).astype(jnp.int32)
        delta = jax.lax.psum(jax.lax.psum(delta, "space"), "batch")
        return grown, delta > 0

    edges, _ = jax.lax.while_loop(cond, body, (strong, jnp.asarray(True)))
    # Raw gradients travel instead of angles: the score features are
    # rational in (dx, dy) (score._cs2_from_grads), matching the single-chip
    # dense path bit-for-bit while skipping the full-plane arctan2; callers
    # needing true angles (diagnostics) compute them locally.
    return edges, dx, dy


def sharded_edge_pipeline(images, mesh: Mesh, low_q: float, high_q: float,
                          valid_h: int | None = None,
                          normalized: bool = False):
    """Edge detection for a batch of planes over a (batch, space) mesh.

    images: (B, H, W) with B divisible by the batch axis and H by the space
    axis (arbitrary sizes: pad the batch/rows and pass the true height as
    ``valid_h`` — :func:`sharded_find_circles_batch` does this). Returns
    (edges bool (B, H, W), dx (B, H, W), dy (B, H, W)) with the same
    sharding (``arctan2(dy, dx)`` recovers the gradient angles).
    ``normalized`` marks host-prenormalized uint8-valued planes.
    """
    h = images.shape[1]
    valid = int(valid_h) if valid_h is not None else h
    spec = P("batch", "space", None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, P(), P()),
        out_specs=(spec, spec, spec),
    )
    def run(imgs, lo, hi):
        def one(img):
            return _sharded_edges_one_plane(img, lo[0], hi[0], valid,
                                            normalized)

        return jax.vmap(one)(imgs)

    return run(images, jnp.asarray([low_q], jnp.float32),
               jnp.asarray([high_q], jnp.float32))


def _sharded_best_circle(edges, dx, dy, min_radius, max_radius,
                         min_roundness):
    """Per-plane best circle from row-sharded score maps (inside shard_map).

    Each shard convolves its rows (with a 2R-row halo so rings crossing the
    shard boundary score correctly), takes its local argmax, and a pmax over
    ``space`` picks the global winner — the sharded analog of the dense
    detector's argmax path.
    """
    from magnify_tpu.ops.score import score_maps

    halo = 2 * max_radius
    dxh = _exchange_halo(dx, halo, "space")
    dyh = _exchange_halo(dy, halo, "space")
    eg = _exchange_halo(edges, halo, "space")
    # Pad columns only (rows already extended by the halo exchange).
    dxh = jnp.pad(dxh, ((0, 0), (halo, halo)))
    dyh = jnp.pad(dyh, ((0, 0), (halo, halo)))
    eg = jnp.pad(eg, ((0, 0), (halo, halo)))
    maps = score_maps(None, eg, min_radius=min_radius, max_radius=max_radius,
                      s2d=1, grads=(dxh, dyh))
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
    edges, dx, dy = sharded_edge_pipeline(images, mesh, low_q, high_q)

    spec = P("batch", "space", None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(P("batch"), P("batch"), P("batch"), P("batch")),
    )
    def reduce_stats(e, gx, gy):
        count = jax.lax.psum(e.sum(axis=(1, 2)), "space")
        # The |angle| energy diagnostic still wants true angles — computed
        # here, on edge pixels' gradients only.
        energy = jax.lax.psum(
            jnp.where(e, jnp.abs(jnp.arctan2(gy, gx)), 0.0).sum(axis=(1, 2)),
            "space",
        )

        def one(e1, gx1, gy1):
            return _sharded_best_circle(e1, gx1, gy1, min_radius, max_radius,
                                        min_roundness)

        circles, scores = jax.vmap(one)(e, gx, gy)
        return count, energy, circles, scores

    count, energy, circles, scores = reduce_stats(edges, dx, dy)
    return {"edges": edges, "edge_count": count, "edge_energy": energy,
            "best_circle": circles, "best_score": scores}


# ---------------------------------------------------------------------------
# Full multi-marker dense detection over the mesh
# ---------------------------------------------------------------------------

def _sharded_dense_plane(edges, dx, dy, min_roundness, *, valid_h,
                         width, min_radius, max_radius, cap):
    """Dense detection for one row-sharded plane (inside shard_map).

    The sharded formulation of ops.detect._dense_candidates: each shard
    scores its rows (halo-exchanged so rings crossing shard boundaries see
    real data), applies the reference bound filters in global coordinates,
    takes a local top-k, and an all_gather + lexicographic merge reproduces
    the single-chip score-sorted survivor list exactly (ties broken by the
    single-chip flat map index, like lax.top_k).
    """
    from magnify_tpu.ops.score import score_maps

    halo = 2 * max_radius  # == the single-chip scoring pad
    local = edges.shape[0]
    shard = jax.lax.axis_index("space")
    n_sp = jax.lax.axis_size("space")

    dxh = _exchange_halo(dx, halo, "space")
    dyh = _exchange_halo(dy, halo, "space")
    eg = _exchange_halo(edges, halo, "space")
    dxh = jnp.pad(dxh, ((0, 0), (halo, halo)))
    dyh = jnp.pad(dyh, ((0, 0), (halo, halo)))
    eg = jnp.pad(eg, ((0, 0), (halo, halo)))
    # Resolve the s2d fold from the GLOBAL padded-plane shape — the same
    # resolution the single-chip _dense_candidates makes — so every shard
    # runs the identical conv kernel. Resolving from the (smaller) shard
    # slab could pick a different fold whose different accumulation
    # grouping breaks the bit-identical-scores contract in the last ulp.
    from magnify_tpu.ops.score import _resolve_s2d

    s2d = _resolve_s2d(None, (valid_h + 2 * halo, width + 2 * halo))
    maps = score_maps(None, eg, min_radius=min_radius, max_radius=max_radius,
                      s2d=s2d, grads=(dxh, dyh))
    n_r, lh, wp = maps.shape  # lh = local + 2*halo, wp = width + 2*halo

    rows_g = (jax.lax.broadcasted_iota(jnp.int32, maps.shape, 1) - halo
              + shard * local)
    cols = jax.lax.broadcasted_iota(jnp.int32, maps.shape, 2) - halo
    rads = jax.lax.broadcasted_iota(jnp.int32, maps.shape, 0) + min_radius

    # Ownership: each map row belongs to exactly one shard (its local rows;
    # the first/last shard also own the out-of-image halo rows, which the
    # single-chip padded map covers).
    start = shard * local
    own = (rows_g >= start) & (rows_g < start + local)
    own |= (shard == 0) & (rows_g < 0)
    own |= (shard == n_sp - 1) & (rows_g >= n_sp * local)

    # Reference bound filters (utils.py:155-166) in global coordinates.
    keep = own & (rows_g + rads >= 0) & (cols + rads >= 0)
    keep &= (rows_g - rads < valid_h) & (cols - rads < width)
    keep &= maps >= min_roundness

    # Sort-free survivor extraction (same trick as the single-chip
    # ops.detect._dense_candidates): whenever the global retry bound holds,
    # each shard's survivor count is <= cap, so ranking with the
    # hierarchical binary search + a small (-score, index) sort returns
    # exactly the local top_k set in the same order, ~10x cheaper than
    # top_k over the score volume.
    from magnify_tpu.ops.detect import ranked_survivor_sources

    src, n_local = ranked_survivor_sources(keep, cap)
    tgt = jnp.arange(1, cap + 1, dtype=n_local.dtype)
    sel = jnp.where(tgt <= n_local, maps.reshape(-1)[src], -jnp.inf)
    neg, top_lin = jax.lax.sort((-sel, src), num_keys=2)
    top_scores = -neg

    # Decode local flat indices and re-encode as the single-chip padded map
    # index — the exact tie-break key lax.top_k would use on one chip.
    r_idx = top_lin // (lh * wp)
    rem = top_lin % (lh * wp)
    row_g = rem // wp - halo + shard * local
    col_p = rem % wp
    hp_single = valid_h + 2 * halo
    lin_single = (r_idx * hp_single + (row_g + halo)) * wp + col_p

    gathered_scores = jax.lax.all_gather(top_scores, "space", tiled=True)
    gathered_lin = jax.lax.all_gather(lin_single, "space", tiled=True)
    gathered_row = jax.lax.all_gather(row_g, "space", tiled=True)
    gathered_col = jax.lax.all_gather(col_p - halo, "space", tiled=True)
    gathered_rad = jax.lax.all_gather(r_idx + min_radius, "space",
                                      tiled=True)

    neg, _lin, row, col, rad = jax.lax.sort(
        (-gathered_scores, gathered_lin, gathered_row, gathered_col,
         gathered_rad),
        num_keys=2,
    )
    circles = jnp.stack([row[:cap], col[:cap], rad[:cap]], axis=1)
    scores = -neg[:cap]
    n_keep = jax.lax.psum(n_local, "space")
    return circles, scores, n_keep


def sharded_find_circles_batch(images, mesh: Mesh, low_q: float,
                               high_q: float, min_roundness: float, *,
                               min_radius: int, max_radius: int,
                               min_dist: int, cap: int,
                               normalized: bool = False):
    """Full dense detection for a plane batch over a (batch, space) mesh.

    Accepts arbitrary (B, H, W): the batch is padded to the batch axis and
    rows are reflect-padded (REFLECT_101, matching the single-chip border
    mode) to the space axis; padded rows are masked out of every statistic.
    Returns (circles (B, cap, 3), scores (B, cap), accepted (B, cap),
    n_keep (B,)) — each plane's score-sorted NMS-filtered survivors,
    replicated along ``space`` and equal to the single-chip
    ops.detect._stage_dense_full output.

    With ``normalized=True`` the input is host-prenormalized uint8 planes
    (:func:`magnify_tpu.ops.detect.normalize_planes_u8`): the raw bytes
    ship over the link (1 B/px, 4x less than float32) and the cast to
    float32 happens on device.
    """
    from magnify_tpu.ops.nms import parallel_greedy_nms

    b, h, w = images.shape
    n_batch = mesh.shape["batch"]
    n_space = mesh.shape["space"]

    pad_h = (-h) % n_space
    if pad_h and pad_h < HALO:
        # The stencil halo must stay inside host-padded rows so boundary
        # reflection happens at the true image edge, not the padded one.
        pad_h += ((HALO - pad_h + n_space - 1) // n_space) * n_space
    local = (h + pad_h) // n_space
    if local < max(2 * max_radius, HALO):
        raise ValueError(
            f"image rows per shard ({local}) must cover the scoring halo "
            f"({2 * max_radius}); use fewer 'space' shards for this image."
        )
    if pad_h >= h:
        raise ValueError(
            f"cannot reflect-pad {h} rows by {pad_h}; use fewer 'space' "
            "shards for this image."
        )
    pad_b = (-b) % n_batch

    # Ship the caller's dtype (uint8 when normalized) and cast on device.
    imgs = jnp.asarray(images).astype(jnp.float32)
    if pad_h:
        imgs = jnp.concatenate([imgs, imgs[:, -2:-2 - pad_h:-1, :]], axis=1)
    if pad_b:
        # Fill with existing planes cyclically (pad_b may exceed b).
        imgs = jnp.concatenate(
            [imgs, imgs[np.arange(pad_b) % b]], axis=0
        )

    edges, dx, dy = sharded_edge_pipeline(imgs, mesh, low_q, high_q,
                                          valid_h=h, normalized=normalized)

    spec = P("batch", "space", None)

    # check_vma=False: the merged candidate lists are replicated along
    # "space" by construction (every shard all_gathers and sorts the same
    # data), which the static varying-axes checker cannot infer.
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec, P()),
        out_specs=(P("batch"), P("batch"), P("batch")), check_vma=False,
    )
    def detect(e, gx, gy, thr):
        def one(e1, gx1, gy1):
            return _sharded_dense_plane(
                e1, gx1, gy1, thr[0], valid_h=h, width=w,
                min_radius=min_radius, max_radius=max_radius, cap=cap,
            )

        return jax.vmap(one)(e, gx, gy)

    circles, scores, n_keep = detect(
        edges, dx, dy, jnp.asarray([min_roundness], jnp.float32)
    )

    if min_dist > 0:
        accepted = jax.vmap(
            lambda c, s: parallel_greedy_nms(
                c, jnp.isfinite(s), min_dist=min_dist, height=h, width=w,
                max_radius=max_radius,
            )
        )(circles, scores)
    else:
        accepted = jnp.isfinite(scores)
    return circles[:b], scores[:b], accepted[:b], n_keep[:b]


from magnify_tpu.ops.detect import unpack_count  # noqa: E402


@functools.partial(jax.jit, static_argnames=("pull_cap",))
def _pack_accepted_batch(circles, scores, accepted, n_keep, *, pull_cap):
    """Compact each plane's accepted circles to the front and pack counts +
    (row, col, radius, score) rows into ONE (B, pull_cap + 1, 4) float32
    block — vmaps the one shared packing implementation
    (ops.detect._pack_accepted) so the host makes a single small pull
    instead of pulling circles/scores/accepted/n_keep separately (each pull
    costs a full link round trip)."""
    from magnify_tpu.ops.detect import _pack_accepted

    return jax.vmap(
        functools.partial(_pack_accepted, pull_cap=pull_cap)
    )(circles, scores, accepted, n_keep)


def sharded_find_circles_batch_packed(
        images_u8, mesh: Mesh, low_q: float, high_q: float,
        min_roundness: float, *, min_radius: int, max_radius: int,
        min_dist: int, cap: int, pull_cap: int = 511):
    """Minimum-traffic mesh detection for a host-normalized uint8 stack.

    The mesh twin of the single-chip packed path
    (ops.detect._stage_dense_packed): 1 B/px up the link, detection sharded
    over (batch, space), and ONE small packed pull back. Returns (packed
    (B, pull_cap + 1, 4), full (B, cap, 4)) device arrays; packed[b, 0] =
    (n_accepted, n_keep, 0, 0), rows follow in score order.
    """
    circles, scores, accepted, n_keep = sharded_find_circles_batch(
        images_u8, mesh, low_q, high_q, min_roundness,
        min_radius=min_radius, max_radius=max_radius, min_dist=min_dist,
        cap=cap, normalized=True,
    )
    return _pack_accepted_batch(circles, scores, accepted, n_keep,
                                pull_cap=pull_cap)


# ---------------------------------------------------------------------------
# Mesh-sharded RANSAC (reference-faithful sampling split across chips)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _ransac_mesh_program(mesh: Mesh, h: int, w: int, *, grid_length: int,
                         num_iter: int, min_radius: int, max_radius: int,
                         unique_cap: int, nms_cap: int, min_dist: int,
                         pull_cap: int, use_conv: bool, normalized: bool):
    """Build (and cache per static config) the sharded RANSAC program.

    Parallelization: the ``num_iter`` Monte-Carlo iterations — the hot
    axis (reference utils.py:295-344's ``prange``) — split across ALL mesh
    devices. Each chip runs the (cheap) edge stack replicated, draws the
    SAME counter-based random streams and takes a disjoint slice
    (ops.ransac._candidate_circles_impl), builds presence bitmask words
    over its slice's rounded triples, and an all_gather + bitwise-OR
    merges them: set union is exactly OR on the presence raster, so the
    merged words — and everything downstream (compaction order, scores,
    sort, NMS) — are byte-identical to the single-chip
    ops.detect._stage_ransac_packed by construction. The replicated tail
    (compact + score + sort + NMS) is ~15% of the single-chip frame; the
    sharded bins (proposal gathers + presence scatter, ~100 of 124 ms at
    5e6 iters on v5e) scale with device count.
    """
    from magnify_tpu.ops import detect as ops_detect
    from magnify_tpu.ops.edge import edge_pipeline
    from magnify_tpu.ops.ransac import _candidate_circles_impl
    from magnify_tpu.ops.score import _presence_words, _round_filter, \
        compact_from_words

    n_dev = mesh.size
    chunk = -(-num_iter // n_dev)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P()), check_vma=False,
    )
    def run(img, lo, hi, thr, key):
        dev = (jax.lax.axis_index("batch") * jax.lax.axis_size("space")
               + jax.lax.axis_index("space"))
        # Clamp the slice start so the tail device stays in bounds; the
        # ownership mask below un-counts the overlap rows (they belong to
        # the previous device's range), keeping the union an exact
        # partition of iterations 0..num_iter.
        start = jnp.minimum(dev * chunk, num_iter - chunk)
        edges, dx, dy, grad_angles = edge_pipeline(
            img, lo[0], hi[0], normalized=normalized)
        cands, any_edges = _candidate_circles_impl(
            edges, grid_length, num_iter, key, start, chunk)
        gi = start + jnp.arange(chunk, dtype=jnp.int32)
        own = (gi >= dev * chunk) & (gi < jnp.minimum(
            (dev + 1) * chunk, num_iter))
        row, col, rad, ok = _round_filter(
            cands, own & any_edges, height=h, width=w,
            min_radius=min_radius, max_radius=max_radius)
        words = _presence_words(row, col, rad, ok, height=h, width=w,
                                min_radius=min_radius, max_radius=max_radius)
        # Union across the mesh: one all_gather of the packed bitmask
        # (key_space/32 uint32 words, ~3 MB at 1024^2) + an unrolled OR.
        gathered = jax.lax.all_gather(words, ("batch", "space"))
        merged = gathered[0]
        for d in range(1, n_dev):
            merged = merged | gathered[d]
        uniq, uvalid, n_unique = compact_from_words(
            merged, height=h, width=w, min_radius=min_radius,
            max_radius=max_radius, cap=unique_cap)
        return ops_detect.ransac_score_pack(
            edges, dx, dy, grad_angles, uniq, uvalid, n_unique, thr[0],
            min_radius=min_radius, max_radius=max_radius, nms_cap=nms_cap,
            min_dist=min_dist, pull_cap=pull_cap, use_conv=use_conv,
        )

    return jax.jit(run)


def sharded_ransac_find_circles(
    image,
    mesh: Mesh,
    low_edge_quantile: float,
    high_edge_quantile: float,
    *,
    grid_length: int,
    num_iter: int,
    min_radius: int,
    max_radius: int,
    min_roundness: float,
    min_dist: int,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Mesh-sharded RANSAC detection with the single-chip contract.

    Drop-in for the ransac branch of :func:`magnify_tpu.ops.detect.
    find_circles` when a multi-device mesh is active: same inputs, same
    (circles, scores) outputs — byte-identical to single-chip (the
    Monte-Carlo iterations shard; the candidate SET, not the RNG, is what
    detection depends on, and the set is preserved exactly). Falls back to
    caps grow-retry exactly like the single-chip path.
    """
    from magnify_tpu.ops import detect as ops_detect
    from magnify_tpu.ops.score import RASTER_KEY_LIMIT, raster_key_space

    h, w = image.shape
    key_space = raster_key_space(h, w, min_radius, max_radius)
    if key_space > RASTER_KEY_LIMIT:
        raise ValueError(
            "sharded RANSAC requires the raster dedupe (key space "
            f"{key_space} > {RASTER_KEY_LIMIT}); use the dense detector or "
            "a single chip for planes this large."
        )

    mesh_id = tuple(sorted(mesh.shape.items()))
    memo_key = ("ransac_mesh", h, w, int(min_radius), int(max_radius),
                mesh_id)
    keep_key = ("ransac_mesh_keep", h, w, int(min_radius), int(max_radius),
                mesh_id)
    ucap = ops_detect._cap_memo.get(memo_key, 4096)
    ncap = ops_detect._cap_memo.get(keep_key, 4096)
    pull_cap = 511
    img = jnp.asarray(np.ascontiguousarray(image)
                      if not isinstance(image, jax.Array) else image)
    lo = jnp.asarray([low_edge_quantile], jnp.float32)
    hi = jnp.asarray([high_edge_quantile], jnp.float32)
    thr = jnp.asarray([min_roundness], jnp.float32)
    key = jax.random.PRNGKey(seed)
    while True:
        run = _ransac_mesh_program(
            mesh, h, w, grid_length=int(grid_length),
            num_iter=int(num_iter), min_radius=int(min_radius),
            max_radius=int(max_radius), unique_cap=ucap, nms_cap=ncap,
            min_dist=int(min_dist), pull_cap=pull_cap,
            use_conv=ops_detect._use_conv_scorer(), normalized=False)
        packed_d, full_d = run(img, lo, hi, thr, key)
        packed = np.asarray(packed_d)  # the single transfer + sync
        n_acc = unpack_count(packed[0, 0])
        n_keep = unpack_count(packed[0, 1])
        n_unique = unpack_count(packed[0, 2])
        if n_unique > ucap:
            ucap = ops_detect._grow_cap(n_unique, ucap)
            continue
        if n_keep > ncap:
            ncap = ops_detect._grow_cap(n_keep, ncap)
            continue
        ops_detect._cap_memo[memo_key] = ucap
        ops_detect._cap_memo[keep_key] = ncap
        break
    rows = packed[1:1 + min(n_acc, pull_cap)]
    if n_acc > pull_cap:
        rows = np.concatenate([rows, np.asarray(full_d[pull_cap:n_acc])])
    return rows[:, :3].astype(np.int32), rows[:, 3].copy()


def sharded_find_circles(
    image,
    mesh: Mesh,
    low_edge_quantile: float,
    high_edge_quantile: float,
    min_radius: int,
    max_radius: int,
    min_roundness: float,
    min_dist: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Mesh-sharded find_circles with the single-chip contract.

    Drop-in for the dense branch of :func:`magnify_tpu.ops.detect.
    find_circles` when a multi-device mesh is active: same inputs, same
    (circles, scores) outputs, detection sharded over (batch, space).
    """
    from magnify_tpu.ops import detect as ops_detect

    h, w = image.shape[-2:]
    memo_key = ("mesh_frame", h, w, int(min_radius), int(max_radius),
                tuple(sorted(mesh.shape.items())))
    cap = ops_detect._cap_memo.get(memo_key, 4096)
    pull_cap = 511
    imgs = np.asarray(image)[None] if image.ndim == 2 else np.asarray(image)
    # Minimum traffic: 1 B/px up (exact host normalize twin), ONE packed
    # pull back — mirrors the single-chip packed frame path.
    planes_u8 = jax.device_put(ops_detect.normalize_planes_u8(imgs))
    while True:
        packed_d, full_d = sharded_find_circles_batch_packed(
            planes_u8, mesh, float(low_edge_quantile),
            float(high_edge_quantile), float(min_roundness),
            min_radius=int(min_radius), max_radius=int(max_radius),
            min_dist=int(min_dist), cap=cap, pull_cap=pull_cap,
        )
        packed = np.asarray(packed_d)  # the single pull
        worst = max(unpack_count(v)
                    for v in np.ascontiguousarray(packed[:, 0, 1]))
        if worst <= cap:
            ops_detect._cap_memo[memo_key] = cap
            break
        cap = ops_detect._grow_cap(worst, cap)
    n_acc = unpack_count(packed[0, 0, 0])
    rows = packed[0, 1:1 + min(n_acc, pull_cap)]
    if n_acc > pull_cap:
        rows = np.concatenate([rows, np.asarray(full_d[0, pull_cap:n_acc])])
    return rows[:, :3].astype(np.int32), rows[:, 3].copy()
