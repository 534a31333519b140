"""Marker finding: beads and chip buttons (the heaviest components).

TPU-first re-design of /root/reference/src/magnify/find.py:

* Detection (edges, RANSAC, scoring, NMS) runs as the fused device program in
  :mod:`magnify_tpu.ops.detect`.
* Bead ownership labels (reference ``utils.circle_labels``, find.py:561) are
  computed per-ROI from neighbor lists instead of painting a global label
  raster: a pixel's foreground/background status is a closed-form function
  of how many bead disks cover it. Masks and ROI crops are cheap host work
  (raster math + numpy slices) — only detection crosses the device link,
  as one packed dispatch and one small pull.
* The chip pipeline's per-chamber re-detection (find.py:324-402) runs as one
  vmapped program over all R x C chambers.
* Large roi/fg/bg outputs are disk-backed memmaps (the dask-allocation
  equivalent), so terabyte-scale stacks stay out-of-core.

Host-side geometry (1-D clustering, per-cluster regression, line
intersections) mirrors find.py:632-748 with the offset sweep vectorized via
prefix sums.
"""

from __future__ import annotations

import functools
import math
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import scipy.spatial

from magnify_tpu import utils
from magnify_tpu.core import Variable
from magnify_tpu.core.lazy import alloc_output
from magnify_tpu.core.registry import components
from magnify_tpu.ops import detect as ops_detect
from magnify_tpu.ops import geom as ops_geom


# Stacks above this many bytes are processed out-of-core (per-channel host
# reads + streamed ROI writes) instead of being materialized in RAM/HBM.
# Module-level so tests can lower it to exercise the out-of-core path.
MAX_RESIDENT_BYTES = 512 * 1024 * 1024

# Stage wall times of the most recent fused chip timestep (upload bytes,
# normalize/upload, dispatch+pull, host crops+masks). Observability only —
# bench.py publishes it so upload-traffic changes show up in the stage split.
last_chip_timings: dict = {}


def _progress(iterable, enabled):
    if not enabled:
        return iterable
    try:
        import tqdm

        return tqdm.tqdm(iterable)
    except ImportError:
        return iterable


def _channel_values(assay):
    if "channel" in assay.coords:
        return list(assay["channel"].values.tolist())
    return list(range(assay.sizes["channel"]))


def _channel_index(assay, channel):
    vals = _channel_values(assay)
    return vals.index(channel)


# ---------------------------------------------------------------------------
# Device helpers
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("roi_length", "max_radius", "chamber_radius",
                     "inner_radius"),
)
def _button_masks(y_rel, x_rel, radii, *, roi_length, max_radius,
                  chamber_radius, inner_radius):
    """fg = detected-button disk, bg = chamber annulus (find.py:383-397)."""
    def one(yr, xr, rad):
        fg = ops_geom.disk_mask((roi_length, roi_length), yr, xr, rad,
                                max_radius)
        bg = ops_geom.annulus_mask((roi_length, roi_length), yr, xr,
                                   chamber_radius, inner_radius,
                                   max(max_radius, int(chamber_radius)))
        return fg, bg

    return jax.vmap(one)(y_rel, x_rel, radii)


def _multi_channel_detect(planes, low_q, high_q, min_roundness, dedupe_dist,
                          *, min_radius, max_radius, cap, nms_cap, min_dist,
                          normalized):
    """Per-channel dense detection + NMS + cross-channel dedupe (circles
    within ``dedupe_dist`` of an earlier channel's circle drop, reference
    find.py:490-500 / find.py:224-227). Traced helper shared by the bead
    frame path and the fused chip step. Returns (circles (S*nms_cap, 3)
    int32, valid bool, worst per-channel keep count).

    Multi-channel frames run the channels through the BATCHED detector
    (one score conv at N=S — see ops.detect._dense_candidates_batch),
    bit-identical per channel to the single-plane program; S=1 keeps the
    single-plane form (vmap at B=1 only adds batching overhead)."""
    from magnify_tpu.ops.detect import (
        _stage_dense_full,
        _stage_dense_full_batch,
    )

    if planes.shape[0] > 1:
        c, s, acc, nk = _stage_dense_full_batch(
            planes, low_q, high_q, min_roundness,
            min_radius=min_radius, max_radius=max_radius, cap=cap,
            nms_cap=nms_cap, min_dist=min_dist, normalized=normalized,
        )
        blocks = [(c[ci], acc[ci]) for ci in range(planes.shape[0])]
        n_keep_worst = jnp.max(nk)
    else:
        blocks = []
        n_keeps = []
        for ci in range(planes.shape[0]):
            c, s, acc, nk = _stage_dense_full(
                planes[ci], low_q, high_q, min_roundness,
                min_radius=min_radius, max_radius=max_radius, cap=cap,
                nms_cap=nms_cap, min_dist=min_dist, normalized=normalized,
            )
            blocks.append((c, acc))
            n_keeps.append(nk)
        n_keep_worst = jnp.max(jnp.stack(n_keeps))

    circles, valid = _cross_channel_dedupe(blocks, dedupe_dist, nms_cap)
    return circles, valid, n_keep_worst


def _cross_channel_dedupe(blocks, dedupe_dist, nms_cap):
    """Sequential cross-channel dedupe (reference find.py:490-500 /
    224-227): a channel-k circle within ``dedupe_dist`` of a SURVIVING
    earlier-channel circle is dropped. Shared by the single-chip fused
    programs and the mesh finishers so both orderings stay identical.
    ``blocks``: per-channel (circles, valid) in search order. Returns the
    channel-major concatenation (circles (S*nms_cap, 3), valid)."""
    blocks = list(blocks)
    for k in range(1, len(blocks)):
        ck, vk = blocks[k]
        for j in range(k):
            cj, vj = blocks[j]
            d2 = ((ck[:, None, :2] - cj[None, :, :2]) ** 2).sum(-1)
            dup = jnp.any(vj[None, :] & (d2 <= dedupe_dist**2), axis=1)
            vk = vk & ~dup
        blocks[k] = (ck, vk)

    circles = jnp.concatenate([c[:nms_cap] for c, _ in blocks])
    valid = jnp.concatenate([v for _, v in blocks])
    return circles, valid


@functools.partial(
    jax.jit,
    static_argnames=("search_channels", "min_radius", "max_radius", "cap",
                     "nms_cap", "min_dist", "pull_cap", "normalized"),
)
def _bead_detect_packed(planes, low_q, high_q, min_roundness, dedupe_dist,
                        *, search_channels, min_radius, max_radius, cap,
                        nms_cap, min_dist, pull_cap, normalized=True):
    """Detection-only fused multi-channel step.

    The minimum-traffic single-frame path for BeadFinder (pre-normalized u8
    planes, 1 byte/pixel up the relay) and ButtonFinder's center search
    (raw planes): one dispatch through :func:`_multi_channel_detect` +
    compaction, and the result comes back as ONE small int32 array: row 0
    holds (live count, worst per-channel keep count, 0), rows 1..pull_cap
    the compacted circles. Masks and ROI crops are cheap host work
    (_bead_finalize_host), so nothing else crosses the link.
    """
    circles, valid, worst_keep = _multi_channel_detect(
        planes, low_q, high_q, min_roundness, dedupe_dist,
        min_radius=min_radius, max_radius=max_radius, cap=cap,
        nms_cap=nms_cap, min_dist=min_dist, normalized=normalized,
    )
    return _pack_beads(circles, valid, worst_keep, pull_cap)


def _pack_beads(circles, valid, worst_keep, pull_cap):
    """Compact live beads to the front (channel-major score order preserved)
    and pack [count header; rows] — shared by the single-chip fused program
    and the mesh finisher."""
    total = circles.shape[0]
    rank = jnp.cumsum(valid) - 1
    n = valid.sum()
    dest = jnp.where(valid, rank, total)
    beads = jnp.zeros((total, 3), jnp.int32).at[dest].set(circles,
                                                          mode="drop")
    packed = jnp.zeros((pull_cap + 1, 3), jnp.int32)
    packed = packed.at[0].set(jnp.stack([n, worst_keep, jnp.int32(0)]))
    # total (= channels * nms_cap) can undershoot pull_cap while the cap
    # memo is still growing — copy only the rows that exist.
    k = min(pull_cap, total)
    packed = packed.at[1:1 + k].set(beads[:k])
    return packed, beads


@functools.lru_cache(maxsize=64)
def _dedupe_pack_beads_mesh_fn(mesh, pull_cap):
    """Mesh finisher for the fused bead step (built once per mesh): takes
    the sharded detector's per-channel (circles (S, cap, 3), accepted
    (S, cap), n_keep (S,)) — replicated outputs bit-identical to
    _stage_dense_full per channel — and applies the SAME cross-channel
    dedupe + compaction as :func:`_bead_detect_packed`, so mesh and
    single-chip pulls are equal. Outputs are explicitly REPLICATED over
    the mesh: under a multi-controller job every host must be able to
    pull the packed block directly (np.asarray of a global array needs an
    addressable replica on every process)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())

    def run(circles, accepted, n_keep, dedupe_dist):
        blocks = [(circles[i], accepted[i])
                  for i in range(circles.shape[0])]
        flat, valid = _cross_channel_dedupe(blocks, dedupe_dist,
                                            circles.shape[1])
        return _pack_beads(flat.astype(jnp.int32), valid,
                           jnp.max(n_keep).astype(jnp.int32), pull_cap)

    return jax.jit(run, out_shardings=(rep, rep))


def _upload_search_planes(planes, mesh):
    """Place the host-normalized search planes on device.

    Single-controller: one plain upload (the mesh programs reshard as
    needed). Multi-controller (``jax.process_count() > 1``): each host
    uploads ONLY its own contiguous block of the channel axis
    (:func:`magnify_tpu.parallel.multihost.host_shard_keys`) and the
    global (S, H, W) array is assembled in place by
    :func:`make_global_stack` — ingest bandwidth scales with hosts and no
    image bytes cross DCN (docs/multihost.md; SURVEY §2.12). Requires the
    search-channel count to divide the host count evenly.
    """
    n_proc = jax.process_count()
    if mesh is not None and mesh.size > 1 and n_proc > 1:
        from magnify_tpu.parallel.multihost import (
            host_shard_keys,
            make_global_stack,
        )

        if planes.shape[0] % n_proc:
            raise ValueError(
                f"multi-controller mg.beads needs the search-channel count "
                f"({planes.shape[0]}) to be a multiple of the host count "
                f"({n_proc}) so each host ingests an equal plane block; "
                "pass an explicit search_channel list or run single-host."
            )
        mine = host_shard_keys(list(range(planes.shape[0])))
        return make_global_stack(planes[mine], mesh)
    return jnp.asarray(planes)


def _bead_detect_packed_mesh(planes_q, mesh, low_q, high_q, min_roundness,
                             dedupe_dist, *, min_radius, max_radius, cap,
                             min_dist, pull_cap, normalized=True):
    """Mesh twin of :func:`_bead_detect_packed`: detection sharded over
    (batch=channels, space=rows) via the proven-bit-identical
    sharded_find_circles_batch, then the shared dedupe+pack finisher.
    Same minimum-traffic contract: quantized planes up (u8 when
    ``normalized``, u16 + on-device normalize otherwise), one packed pull
    back."""
    from magnify_tpu.parallel.mesh import sharded_find_circles_batch

    circles, _scores, accepted, n_keep = sharded_find_circles_batch(
        planes_q, mesh, float(low_q), float(high_q), float(min_roundness),
        min_radius=min_radius, max_radius=max_radius, min_dist=min_dist,
        cap=cap, normalized=normalized,
    )
    return _dedupe_pack_beads_mesh_fn(mesh, int(pull_cap))(
        circles, accepted, n_keep, jnp.float32(dedupe_dist)
    )


# Budget for the (pairs, L, L) ownership temporaries; module-level so the
# chunk-boundary path is test-drivable (tests monkeypatch it small).
_PAIR_CHUNK_BYTES = 32 << 20


@jax.jit
def _stack_packed(*packed):
    """Stack per-frame packed pull blocks so one host sync covers a batch
    of frames (jit caches one tiny program per batch arity)."""
    return jnp.stack(packed)


def _bead_ownership_host(beads, h, w, roi_length, max_radius):
    """Host fg/bg ownership masks + ROI windows (numpy).

    The reference's painted ownership raster semantics (find.py:561-586):
    fg = pixels covered by this bead's disk only, bg = pixels covered by
    none; disks rasterized from the shared Bresenham extent LUT. At a few
    hundred beads this is microseconds of numpy — far cheaper than any
    device round trip. Returns (fg (n, L, L), bg, tops, lefts).
    """
    n = len(beads)
    L = roi_length
    lut = ops_geom.extent_lut(max_radius)
    tops = np.clip(beads[:, 0] - L // 2, 0, h - L)
    lefts = np.clip(beads[:, 1] - L // 2, 0, w - L)

    fg = np.zeros((n, L, L), bool)
    count = np.zeros((n, L, L), np.int16)
    if n == 0:
        return fg, count == 0, tops, lefts

    # Neighbor lists: beads whose disks can reach a window (Chebyshev
    # distance from bead center to window center <= L/2 + max_radius).
    tree = scipy.spatial.KDTree(beads[:, :2])
    win_centers = np.stack([tops + L // 2, lefts + L // 2], axis=1)
    neighbor_lists = tree.query_ball_point(
        win_centers, L / 2 + max_radius + 1, p=np.inf)

    # Vectorize over all (window, covering-bead) pairs: the per-pair
    # Python loop was ~5 ms/frame at 110 beads — the largest host cost
    # after the relay pull once masks and crops are batched.
    arange_l = np.arange(L)
    pairs_i = np.concatenate(
        [np.full(len(nb), i, np.int64) for i, nb in enumerate(neighbor_lists)]
    )
    pairs_j = np.concatenate(
        [np.asarray(nb, np.int64) for nb in neighbor_lists]
    )
    # Pair chunks bound the (P, L, L) temporaries to a recycled working
    # set (first-touch pages are the cost on VM hosts, see ops/reduce.py).
    chunk = max(1, _PAIR_CHUNK_BYTES // max(L * L, 1))
    for s in range(0, len(pairs_i), chunk):
        pi = pairs_i[s:s + chunk]
        pj = pairs_j[s:s + chunk]
        r = np.clip(beads[pj, 2].astype(np.int64), 0, max_radius)
        dr = np.abs(tops[pi, None] + arange_l[None, :] - beads[pj, 0][:, None])
        width = np.where(dr <= r[:, None],
                         lut[r[:, None], np.minimum(dr, max_radius)], -1)
        dc = np.abs(lefts[pi, None] + arange_l[None, :]
                    - beads[pj, 1][:, None])
        cover = dc[:, None, :] <= width[:, :, None]  # (P, L, L)
        # pairs_i ascends by construction, so each window's pairs form a
        # contiguous run: segmented reduceat + a unique-index add replaces
        # np.add.at (which is ~100x slower than a plain add).
        ui, starts = np.unique(pi, return_index=True)
        count[ui] += np.add.reduceat(cover.astype(np.int16), starts, axis=0)
        self_rows = pi == pj
        fg[pi[self_rows]] = cover[self_rows]

    fg &= count == 1
    return fg, count == 0, tops, lefts


def _bead_finalize_host(image, beads, roi_length, max_radius):
    """Host masks + ROI crops: ``image`` (C, T, H, W) numpy. Returns
    (fg (n, L, L), bg, rois (n, C, T, L, L), tops, lefts)."""
    h, w = image.shape[-2:]
    L = roi_length
    fg, bg, tops, lefts = _bead_ownership_host(beads, h, w, L, max_radius)
    rois = np.empty((len(beads),) + image.shape[:-2] + (L, L), image.dtype)
    for i in range(len(beads)):
        rois[i] = image[..., tops[i]:tops[i] + L, lefts[i]:lefts[i] + L]
    return fg, bg, rois, tops, lefts


def _refine_chambers(planes, xs, ys, low_q, high_q, min_roundness, *,
                     roi_length, min_radius, max_radius):
    """Traced per-chamber re-detection: crop every chamber and dense-detect
    the best circle per chamber across all search channels (device half of
    the reference's per-chamber loop, find.py:324-402). ``planes`` holds the
    search channels ONLY (S, H, W) — non-search channels never cross the
    link; their ROI crops are host slices. Returns an (n, 4) float32 block
    (row, col, radius, score)."""
    from magnify_tpu.ops.detect import _detect_rois_dense

    s, h, w = planes.shape
    L = roi_length
    tops = jnp.clip(jnp.round(ys).astype(jnp.int32) - L // 2, 0, h - L)
    lefts = jnp.clip(jnp.round(xs).astype(jnp.int32) - L // 2, 0, w - L)
    crops = ops_geom.extract_rois(planes, tops, lefts, L)  # (n, S, L, L)

    best_score = jnp.full(xs.shape, -jnp.inf)
    best_circle = jnp.zeros((xs.shape[0], 3), jnp.int32)
    for ci in range(s):
        circles, scores = _detect_rois_dense(
            crops[:, ci], low_q, high_q, min_roundness,
            min_radius=min_radius, max_radius=max_radius,
        )
        better = jnp.isfinite(scores) & (scores > best_score)
        best_score = jnp.where(better, scores, best_score)
        best_circle = jnp.where(better[:, None], circles, best_circle)

    return jnp.concatenate(
        [best_circle.astype(jnp.float32), best_score[:, None]], axis=1
    )


@functools.partial(
    jax.jit,
    static_argnames=("roi_length", "min_radius", "max_radius"),
)
def _chip_detect_dense(planes, xs, ys, low_q, high_q, min_roundness, *,
                       roi_length, min_radius, max_radius):
    """Jitted :func:`_refine_chambers` — one dispatch, one (n, 4) pull;
    cropping at refined centers and fg/bg rasterization are cheap host
    work. ``planes`` carries search channels only."""
    return _refine_chambers(
        planes, xs, ys, low_q, high_q, min_roundness,
        roi_length=roi_length, min_radius=min_radius, max_radius=max_radius,
    )


def _grid_stage(circles, valid, penalty, ppr, ppc, *, h, w, num_rows,
                num_cols, row_dist, col_dist, top_chamber, left_chamber,
                chamber_radius):
    """Traced grid geometry: 1-D cluster sweeps (or fixed labeling), robust
    per-cluster regression, and grid-line intersection (the device twins of
    reference find.py:632-748). Shared by the single-chip fused chip program
    and the mesh finisher."""
    from magnify_tpu.ops import gridfit

    ys = circles[:, 0].astype(jnp.float32)
    xs = circles[:, 1].astype(jnp.float32)
    n_centers = valid.sum()

    if top_chamber is None:
        row_labels = gridfit.cluster_1d_dev(
            ys, valid, total_length=h, num_clusters=num_rows,
            cluster_length=row_dist, ideal_num_points=ppr, penalty=penalty,
        )
    else:
        row_labels = gridfit.label_clusters_dev(
            ys, valid, offset=top_chamber, num_clusters=num_rows,
            cluster_length=2 * chamber_radius,
            cluster_gap=row_dist - 2 * chamber_radius,
        )
    if left_chamber is None:
        col_labels = gridfit.cluster_1d_dev(
            xs, valid, total_length=w, num_clusters=num_cols,
            cluster_length=col_dist, ideal_num_points=ppc, penalty=penalty,
        )
    else:
        col_labels = gridfit.label_clusters_dev(
            xs, valid, offset=left_chamber, num_clusters=num_cols,
            cluster_length=2 * chamber_radius,
            cluster_gap=col_dist - 2 * chamber_radius,
        )

    in_cluster = (row_labels >= 0) & (col_labels >= 0)
    row_labels = jnp.where(in_cluster, row_labels, -1)
    col_labels = jnp.where(in_cluster, col_labels, -1)
    row_slope, row_intercepts, row_counts = gridfit.regress_clusters_dev(
        xs, ys, row_labels, num_clusters=num_rows, ideal_num_points=ppr,
    )
    col_slope, col_intercepts, col_counts = gridfit.regress_clusters_dev(
        ys, xs, col_labels, num_clusters=num_cols, ideal_num_points=ppc,
    )
    mark_y = (row_slope * col_intercepts[None, :] + row_intercepts[:, None]
              ) / (1 - row_slope * col_slope)
    mark_x = mark_y * col_slope + col_intercepts[None, :]
    return (mark_x, mark_y, n_centers, row_slope, col_slope, row_counts,
            col_counts)


def _pack_chip(best, mark_x, mark_y, worst_keep, n_centers, row_counts,
               col_counts, row_slope, col_slope):
    """Pack the fused chip step's pull block (header / slopes / per-chamber
    rows) — shared by the single-chip program and the mesh finisher."""
    rows = jnp.concatenate(
        [best, mark_x.reshape(-1, 1), mark_y.reshape(-1, 1)], axis=1
    )
    # worst_keep is bit-stored (ops_detect.pack_count): a plain f32 cast
    # rounds above 2^24 and could mask a cap overflow on the host.
    header = jnp.stack([
        ops_detect.pack_count(worst_keep), n_centers.astype(jnp.float32),
        row_counts[0], row_counts[-1], col_counts[0], col_counts[-1],
    ])
    slopes = jnp.stack([row_slope, col_slope, 0.0, 0.0, 0.0, 0.0])
    return jnp.concatenate([header[None], slopes[None], rows], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("num_rows", "num_cols", "row_dist",
                     "col_dist", "top_chamber", "left_chamber",
                     "chamber_radius", "min_radius", "max_radius", "cap",
                     "min_dist", "roi_length", "normalized"),
)
def _chip_fused_packed(planes, low_q, high_q, high_q_roi, min_roundness,
                       penalty, ppr, ppc, *, num_rows, num_cols,
                       row_dist, col_dist, top_chamber, left_chamber,
                       chamber_radius, min_radius, max_radius, cap, min_dist,
                       roi_length, normalized=True):
    """The ENTIRE chip timestep as one device program.

    Fuses what the reference runs as a host-orchestrated chain
    (find.py:119-141 -> find_centers -> cluster_1d/label_clusters ->
    regress_clusters -> find_rois): multi-channel dense detection + NMS +
    cross-channel dedupe, the 1-D grid-offset sweeps, per-cluster robust
    regression, grid-line intersection, and per-chamber re-detection at the
    intersected centers — one dispatch, one small (2 + R*C, 6) float32
    pull. ``planes`` holds the SEARCH channels only, host-normalized to
    uint8 when ``normalized`` (1 byte/pixel up the link — the bead path's
    minimum-traffic trick); non-search channels never reach the device.
    Row 0 carries [worst_keep, n_centers, row edge-cluster counts,
    col edge-cluster counts] (for cap growth and the host-side sparse-edge
    warnings), row 1 [row_slope, col_slope, ...], rows 2.. per chamber
    [best_row, best_col, radius, score, mark_x, mark_y].
    """
    h, w = planes.shape[-2:]
    circles, valid, worst_keep = _multi_channel_detect(
        planes, low_q, high_q, min_roundness, jnp.float32(chamber_radius),
        min_radius=min_radius, max_radius=max_radius, cap=cap, nms_cap=cap,
        min_dist=min_dist, normalized=normalized,
    )
    (mark_x, mark_y, n_centers, row_slope, col_slope, row_counts,
     col_counts) = _grid_stage(
        circles, valid, penalty, ppr, ppc, h=h, w=w, num_rows=num_rows,
        num_cols=num_cols, row_dist=row_dist, col_dist=col_dist,
        top_chamber=top_chamber, left_chamber=left_chamber,
        chamber_radius=chamber_radius,
    )

    best = _refine_chambers(
        planes, mark_x.reshape(-1), mark_y.reshape(-1), low_q, high_q_roi,
        min_roundness, roi_length=roi_length,
        min_radius=min_radius, max_radius=max_radius,
    )  # (R*C, 4)

    return _pack_chip(best, mark_x, mark_y, worst_keep, n_centers,
                      row_counts, col_counts, row_slope, col_slope)


@functools.lru_cache(maxsize=64)
def _chip_mesh_finisher(mesh, n_search, num_rows, num_cols, row_dist,
                        col_dist, top_chamber, left_chamber, chamber_radius,
                        min_radius, max_radius, cap, roi_length):
    """Build (once per mesh/geometry) the jitted mesh finisher: cross-channel
    dedupe + grid stage on the replicated detector outputs, per-chamber
    re-detection SHARDED over every mesh device (chambers split across the
    flattened (batch, space) axes), and the packed pull block — the mesh
    composition of the round-3 fused chip timestep."""
    from jax.sharding import PartitionSpec as P

    n = num_rows * num_cols
    n_dev = mesh.size
    pad = (-n) % n_dev
    chamber_spec = P(("batch", "space"))

    # check_vma=False: xs/ys derive from all_gathered (replicated) detector
    # outputs, which the static varying-axes checker cannot infer.
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), chamber_spec, chamber_spec, P()),
        out_specs=chamber_spec, check_vma=False,
    )
    def refine(planes_rep, xs1, ys1, scalars):
        return _refine_chambers(
            planes_rep, xs1, ys1, scalars[0], scalars[1], scalars[2],
            roi_length=roi_length, min_radius=min_radius,
            max_radius=max_radius,
        )

    @jax.jit
    def run(planes_rep, circles, accepted, n_keep, low_q, high_q_roi,
            min_roundness, penalty, ppr, ppc):
        planes_rep = planes_rep.astype(jnp.float32)  # u8 in, cast on device
        h, w = planes_rep.shape[-2:]
        blocks = [(circles[i], accepted[i]) for i in range(n_search)]
        flat, valid = _cross_channel_dedupe(
            blocks, jnp.float32(chamber_radius), cap
        )
        (mark_x, mark_y, n_centers, row_slope, col_slope, row_counts,
         col_counts) = _grid_stage(
            flat, valid, penalty, ppr, ppc, h=h, w=w, num_rows=num_rows,
            num_cols=num_cols, row_dist=row_dist, col_dist=col_dist,
            top_chamber=top_chamber, left_chamber=left_chamber,
            chamber_radius=chamber_radius,
        )
        xs = mark_x.reshape(-1)
        ys = mark_y.reshape(-1)
        if pad:
            xs = jnp.concatenate([xs, jnp.broadcast_to(xs[:1], (pad,))])
            ys = jnp.concatenate([ys, jnp.broadcast_to(ys[:1], (pad,))])
        scalars = jnp.stack([low_q, high_q_roi, min_roundness])
        best = refine(planes_rep, xs, ys, scalars)[:n]
        return _pack_chip(best, mark_x, mark_y,
                          jnp.max(n_keep).astype(jnp.int32), n_centers,
                          row_counts, col_counts, row_slope, col_slope)

    return run


def _chip_fused_packed_mesh(planes_q, mesh, low_q, high_q, high_q_roi,
                            min_roundness, penalty, ppr, ppc, *, num_rows,
                            num_cols, row_dist, col_dist, top_chamber,
                            left_chamber, chamber_radius, min_radius,
                            max_radius, cap, min_dist, roi_length,
                            normalized=True):
    """Mesh twin of :func:`_chip_fused_packed`: multi-channel detection
    sharded over (batch=channels, space=rows), then the jitted finisher
    (dedupe + grid fit replicated, chamber refinement sharded over all
    devices). Same packed pull-block contract as the single-chip program.
    ``planes_q`` is the host-quantized search stack (u8 when ``normalized``,
    u16 otherwise — the device then normalizes per plane)."""
    from magnify_tpu.parallel.mesh import sharded_find_circles_batch

    # ONE upload: the detector and the finisher both read the same device
    # copy of the quantized planes (a second jnp.asarray of the host array
    # would ship the bytes over the link twice per timestep — and per
    # CLAUDE.md the relay client retains host RSS per uploaded byte).
    planes_dev = jnp.asarray(planes_q)
    circles, _scores, accepted, n_keep = sharded_find_circles_batch(
        planes_dev, mesh, float(low_q), float(high_q), float(min_roundness),
        min_radius=min_radius, max_radius=max_radius, min_dist=min_dist,
        cap=cap, normalized=normalized,
    )
    finisher = _chip_mesh_finisher(
        mesh, planes_q.shape[0], num_rows, num_cols, float(row_dist),
        float(col_dist), top_chamber, left_chamber, int(chamber_radius),
        int(min_radius), int(max_radius), int(cap), int(roi_length),
    )
    return finisher(
        planes_dev, circles, accepted,
        n_keep, jnp.float32(low_q), jnp.float32(high_q_roi),
        jnp.float32(min_roundness), jnp.float32(penalty),
        jnp.asarray(ppr), jnp.asarray(ppc),
    )


def _crop_rois_np(images, xs, ys, roi_length):
    """Host ROI crops at clamped windows (reference bounding_box semantics):
    images (..., H, W) numpy, returns (n, ..., L, L)."""
    h, w = images.shape[-2:]
    out = np.empty((len(xs),) + images.shape[:-2]
                   + (roi_length, roi_length), images.dtype)
    for i, (px, py) in enumerate(zip(xs, ys)):
        top, _, left, _ = utils.bounding_box(
            int(round(float(px))), int(round(float(py))), roi_length, w, h
        )
        out[i] = images[..., top:top + roi_length, left:left + roi_length]
    return out


def _extract_rois_host(images, xs, ys, roi_length):
    """Batched ROI crop. images (C, H, W) or (H, W), numpy or device;
    returns (numpy crops, tops, lefts, device crops)."""
    h, w = images.shape[-2:]
    tops = np.empty(len(xs), np.int32)
    lefts = np.empty(len(xs), np.int32)
    for i, (x, y) in enumerate(zip(xs, ys)):
        top, _, left, _ = utils.bounding_box(
            int(round(float(x))), int(round(float(y))), roi_length, w, h
        )
        tops[i], lefts[i] = top, left
    if len(xs) == 0:
        lead = images.shape[:-2]
        empty = np.empty((0,) + tuple(lead) + (roi_length, roi_length),
                         np.asarray(images).dtype if not isinstance(
                             images, jax.Array) else np.dtype(images.dtype))
        return empty, tops, lefts, None
    rois = ops_geom.extract_rois(jnp.asarray(images), jnp.asarray(tops),
                                 jnp.asarray(lefts), roi_length)
    return np.asarray(rois), tops, lefts, rois


# ---------------------------------------------------------------------------
# BeadFinder
# ---------------------------------------------------------------------------

class BeadFinder:
    """Find beads in a stitched image (reference find.py:445-629)."""

    def __init__(
        self,
        min_bead_diameter: int,
        max_bead_diameter: int,
        low_edge_quantile: float,
        high_edge_quantile: float,
        num_iter: int,
        min_roundness: float,
        roi_length: int | None,
        search_channel,
        interactive: bool,
        detector: str = "auto",
    ):
        if min_bead_diameter > max_bead_diameter:
            raise ValueError("min_bead_diameter must be <= max_bead_diameter.")
        self.min_bead_radius = math.floor(min_bead_diameter / 2)
        self.max_bead_radius = math.ceil(max_bead_diameter / 2)
        self.low_edge_quantile = low_edge_quantile
        self.high_edge_quantile = high_edge_quantile
        self.num_iter = num_iter
        self.min_roundness = min_roundness
        self.roi_length = roi_length if roi_length is not None else 2 * max_bead_diameter
        self.search_channels = utils.to_list(search_channel)
        self.detector = detector
        self.gui = None
        if interactive:
            from magnify_tpu.plot.vis import InteractiveUI

            self.gui = InteractiveUI()

    def __call__(self, assay):
        search_channels = self.search_channels or _channel_values(assay)

        # One host->device transfer for the whole (channel, time) stack when
        # it fits comfortably; detection and ROI work then slice the
        # device-resident copy. Oversized stacks fall back to per-channel
        # host reads (out-of-core path).
        img_var = assay["image"]
        stack_bytes = (np.prod(img_var.shape)
                       * np.dtype(img_var.dtype).itemsize)
        image_np = None
        if stack_bytes <= MAX_RESIDENT_BYTES:
            image_np = np.ascontiguousarray(assay.image.to_numpy())

        search_idxs = tuple(
            _channel_index(assay, c) if not isinstance(c, int) else c
            for c in search_channels
        )
        if (self.gui is None and image_np is not None
                and ops_detect.resolve_detector(self.detector) == "dense"):
            # Fused minimum-traffic path, on or off mesh: with a mesh
            # active the detection dispatch shards over (batch=channels,
            # space=rows) instead of falling back to the unfused loop.
            return self._fused_dense(assay, image_np, search_idxs)



        from magnify_tpu.parallel.mesh import active_mesh

        mesh = active_mesh()
        if (image_np is None and self.gui is None
                and ops_detect.resolve_detector(self.detector) == "dense"
                and mesh is not None and mesh.size > 1
                # Multi-controller host-sharded ingest needs equal
                # per-host channel blocks; otherwise fall through to the
                # working serial per-channel path instead of raising.
                and (jax.process_count() == 1
                     or len(search_channels) % jax.process_count() == 0)):
            # Out-of-core x multi-chip (round-4 verdict weak #3): the lazy
            # stack's search planes stream through host normalization one
            # at a time and feed the BATCHED mesh detector directly
            # ((batch=channels, space=rows) sharding, device cross-channel
            # dedupe) — identical marks to the in-memory fused path; the
            # ROI/mask tail below streams per plane as usual.
            planes = np.stack([
                ops_detect.normalize_planes_u8(
                    assay.image.isel(
                        time=0,
                        channel=(_channel_index(assay, c)
                                 if not isinstance(c, int) else c),
                    ).to_numpy()[None])[0]
                for c in search_channels
            ])
            beads = self._detect_beads_planes(planes).astype(float)
            planes = None
            return self._finish_streamed(assay, beads)

        beads = np.empty((0, 3))
        for channel in search_channels:
            ci = (_channel_index(assay, channel)
                  if not isinstance(channel, int) else channel)
            if image_np is not None:
                det_input = image_np[ci, 0]
            else:
                det_input = assay.image.isel(time=0, channel=ci).to_numpy()
            # Host-normalize to uint8 before the upload: normalize_to_u8 is
            # exactly idempotent, so detection is bit-identical while 1
            # byte/pixel crosses the link instead of 2-8 (large planes
            # through the dev relay are upload-bound).
            det_input = ops_detect.normalize_planes_u8(det_input[None])[0]
            found = ops_detect.find_circles(
                det_input,
                low_edge_quantile=self.low_edge_quantile,
                high_edge_quantile=self.high_edge_quantile,
                grid_length=20,
                num_iter=self.num_iter,
                min_radius=self.min_bead_radius,
                max_radius=self.max_bead_radius,
                min_dist=self.min_bead_radius,
                min_roundness=self.min_roundness,
                gui=self.gui,
                detector=self.detector,
            )[0]
            found = found.astype(float)
            if len(beads) > 0 and len(found) > 0:
                # Cross-channel dedupe (reference find.py:490-500).
                tree = scipy.spatial.KDTree(beads[:, :2])
                neighbors = tree.query_ball_point(found[:, :2],
                                                  2 * self.min_bead_radius)
                dup = np.array([len(nb) > 0 for nb in neighbors])
                found = found[~dup]
            beads = np.concatenate([beads, found])

        return self._finish_streamed(assay, beads, image_np)

    def _finish_streamed(self, assay, beads, image_np=None):
        """Common tail of the non-fused bead step: output allocation,
        ownership masks, and ROI fills — streaming one (channel, time)
        plane at a time when the stack is out-of-core (``image_np``
        None)."""
        num_beads = len(beads)
        sizes = assay.sizes
        n_ch, n_t = sizes["channel"], sizes["time"]
        L = self.roi_length

        roi = alloc_output("roi", (num_beads, n_ch, n_t, L, L),
                           assay["image"].dtype)
        fg = alloc_output("fg", (num_beads, n_t, L, L), bool)
        bg = alloc_output("bg", (num_beads, n_t, L, L), bool)

        assay["roi"] = Variable(("mark", "channel", "time", "roi_y", "roi_x"),
                                roi)
        assay = assay.assign_coords(
            fg=(("mark", "time", "roi_y", "roi_x"), fg),
            bg=(("mark", "time", "roi_y", "roi_x"), bg),
            x=(("mark", "time"),
               np.repeat(beads[:, 1:2], n_t, axis=1)),
            y=(("mark", "time"),
               np.repeat(beads[:, 0:1], n_t, axis=1)),
            valid=(("mark", "time"), np.ones((num_beads, n_t), bool)),
        )
        if num_beads == 0:
            return assay

        # fg/bg from ownership counting (beads assumed static across time,
        # matching find.py:564).
        ints = np.round(beads).astype(np.int32)
        h, w = sizes["im_y"], sizes["im_x"]

        # Ownership masks + ROI crops on host: pure raster math and slicing
        # (no device round trips). Out-of-core stacks stream ONE
        # (channel, time) plane at a time — peak RAM stays at a plane plus
        # the ROI memmap regardless of stack size — with the next plane's
        # read prefetched on a background thread (find.py:589-602).
        fg1, bg1, tops, lefts = _bead_ownership_host(
            ints, h, w, L, self.max_bead_radius
        )
        fg[:] = fg1[:, None]
        bg[:] = bg1[:, None]
        if image_np is not None:
            for ci in range(n_ch):
                image_c = image_np[ci]
                for i in range(num_beads):
                    roi[i, ci] = image_c[..., tops[i]:tops[i] + L,
                                         lefts[i]:lefts[i] + L]
        else:
            import concurrent.futures

            planes = [(ci, t) for ci in range(n_ch) for t in range(n_t)]

            def _load(idx):
                ci, t = idx
                return assay.image.isel(channel=ci, time=t).to_numpy()

            from magnify_tpu.core.lazy import evict_backing_pages

            with concurrent.futures.ThreadPoolExecutor(max_workers=1) as ex:
                pending = ex.submit(_load, planes[0])
                for k, (ci, t) in enumerate(planes):
                    plane = pending.result()
                    if k + 1 < len(planes):
                        pending = ex.submit(_load, planes[k + 1])
                    for i in range(num_beads):
                        roi[i, ci, t] = plane[tops[i]:tops[i] + L,
                                              lefts[i]:lefts[i] + L]
                    if k % 32 == 31:
                        # Flush+drop dirty crop pages of a spilled ROI store
                        # so peak RSS tracks the eviction interval, not the
                        # store size.
                        evict_backing_pages(roi)

        assay.cache(["roi", "fg", "bg"])
        return assay

    def _normalize_search_planes(self, image_np, search_idxs):
        """Host-normalized uint8 search planes (t=0) for the fused path.

        Exactly ops.edge.normalize_to_u8, precomputed on host so only one
        byte per pixel crosses the relay. u8 here IS the reference
        semantics bit-for-bit — its bead detection runs on
        to_uint8(raw plane) (find.py:466-489 via utils.find_circles) and
        nothing downstream re-reads raw pixels, so unlike the chip path
        (see choose_upload_precision) there is no precision to recover
        with a wider upload.
        """
        raw_planes = np.ascontiguousarray(image_np[list(search_idxs), 0])
        return ops_detect.normalize_planes_u8(raw_planes)

    def _memo_keys(self, planes_shape, mesh):
        memo_key = ("beads", planes_shape, self.min_bead_radius,
                    self.max_bead_radius)
        if mesh is not None and mesh.size > 1:
            memo_key += (tuple(sorted(mesh.shape.items())),)
        # One pull covers the live beads when the packed block is sized from
        # the last observed count (pow2-bucketed; overflow falls back to a
        # second small pull).
        return memo_key, memo_key + ("pull",)

    def _dispatch_detect(self, planes_dev, n_search, mesh, cap, pull_cap):
        """Enqueue the fused detection dispatch (no sync): one device
        program covering per-channel dense detect + NMS + cross-channel
        dedupe + compaction. Returns (packed device block, full bead rows)."""
        if mesh is not None and mesh.size > 1:
            return _bead_detect_packed_mesh(
                planes_dev, mesh, float(self.low_edge_quantile),
                float(self.high_edge_quantile),
                float(self.min_roundness), 2.0 * self.min_bead_radius,
                min_radius=self.min_bead_radius,
                max_radius=self.max_bead_radius, cap=cap,
                min_dist=self.min_bead_radius, pull_cap=pull_cap,
            )
        return _bead_detect_packed(
            planes_dev, float(self.low_edge_quantile),
            float(self.high_edge_quantile),
            float(self.min_roundness), 2.0 * self.min_bead_radius,
            search_channels=n_search,
            min_radius=self.min_bead_radius,
            max_radius=self.max_bead_radius, cap=cap, nms_cap=cap,
            min_dist=self.min_bead_radius, pull_cap=pull_cap,
        )

    def _collect_from_packed(self, packed, planes_dev, beads_full, n_search,
                             mesh, memo_key, pull_key, cap, pull_cap):
        """Interpret an already-pulled packed block and return the live
        (n, 3) int32 bead rows. On cap overflow, re-dispatch on the SAME
        device copy of the planes (a retry must not re-ship the stack: the
        relay client retains host RSS per uploaded byte, CLAUDE.md)."""
        while True:
            n, worst = int(packed[0, 0]), int(packed[0, 1])
            if worst <= cap:
                # Max-write: in a batched stream, a neighbor frame in the
                # same flush may have grown the memo after this entry was
                # dispatched with a stale cap — writing the stale value
                # back would re-shrink it and every later frame would pay
                # an overflow re-dispatch.
                if cap > ops_detect._cap_memo.get(memo_key, 0):
                    ops_detect._cap_memo[memo_key] = cap
                break
            cap = ops_detect._grow_cap(worst, cap)
            packed_d, beads_full = self._dispatch_detect(
                planes_dev, n_search, mesh, cap, pull_cap
            )
            packed = np.asarray(packed_d)

        beads_i = packed[1:1 + min(n, pull_cap)]
        if n > pull_cap:
            beads_i = np.concatenate(
                [beads_i, np.asarray(beads_full[pull_cap:n])]
            )
            grown_pull = min(
                ops_detect._pow2_at_least(n + 1, 512, 1 << 20) - 1,
                n_search * cap - 1,
            )
            if grown_pull > ops_detect._cap_memo.get(pull_key, 0):
                ops_detect._cap_memo[pull_key] = grown_pull
        return beads_i

    def _collect_detect(self, planes_dev, packed_d, beads_full, n_search,
                        mesh, memo_key, pull_key, cap, pull_cap):
        """Pull the packed detection block (the sync point) and return the
        live (n, 3) int32 bead rows."""
        return self._collect_from_packed(
            np.asarray(packed_d), planes_dev, beads_full, n_search, mesh,
            memo_key, pull_key, cap, pull_cap,
        )

    def _detect_beads_planes(self, planes):
        """Fused multi-channel bead detection on pre-normalized uint8
        search planes (S, H, W): one upload (host-sharded under a
        multi-controller job), one dispatch (mesh-sharded when a mesh is
        active), one packed pull. Returns the live (n, 3) int32 bead
        rows."""
        from magnify_tpu.parallel.mesh import active_mesh

        mesh = active_mesh()
        # Upload ONCE, outside the cap-growth retry loop: both the first
        # dispatch and any retry reuse this device copy. Multi-controller
        # jobs assemble the global stack from per-host plane blocks.
        planes_dev = _upload_search_planes(planes, mesh)
        memo_key, pull_key = self._memo_keys(planes.shape, mesh)
        cap = ops_detect._cap_memo.get(memo_key, 1024)
        pull_cap = ops_detect._cap_memo.get(pull_key, 511)
        packed_d, beads_full = self._dispatch_detect(
            planes_dev, planes.shape[0], mesh, cap, pull_cap
        )
        return self._collect_detect(
            planes_dev, packed_d, beads_full, planes.shape[0], mesh,
            memo_key, pull_key, cap, pull_cap,
        )

    def _fused_dense(self, assay, image_np, search_idxs):
        """Minimum-traffic single-frame bead step (dense detector).

        Host->device: one uint8 upload of the normalized search planes.
        Device: one dispatch (per-channel dense detect + NMS + cross-channel
        dedupe + compaction). Device->host: one small packed int32 pull.
        Masks, ROI crops, and memmap writes all happen on the host from the
        image copy already in RAM — the device does detection only.
        """
        planes = self._normalize_search_planes(image_np, search_idxs)
        beads_i = self._detect_beads_planes(planes)
        return self._assemble_fused(assay, image_np, beads_i)

    def _assemble_fused(self, assay, image_np, beads_i):
        """Host finalize of the fused bead step: ownership masks, ROI crops,
        output allocation, and coordinate assembly from the pulled bead
        rows (all numpy — no device round trips)."""
        sizes = assay.sizes
        n_ch, n_t = sizes["channel"], sizes["time"]
        L = self.roi_length
        n = len(beads_i)
        beads = beads_i.astype(float)

        fg1, bg1, rois, _tops, _lefts = _bead_finalize_host(
            image_np, beads_i, L, self.max_bead_radius
        )

        roi = alloc_output("roi", (n, n_ch, n_t, L, L), assay["image"].dtype)
        fg = alloc_output("fg", (n, n_t, L, L), bool)
        bg = alloc_output("bg", (n, n_t, L, L), bool)
        roi[:] = rois
        fg[:] = fg1[:, None]
        bg[:] = bg1[:, None]

        assay["roi"] = Variable(("mark", "channel", "time", "roi_y", "roi_x"),
                                roi)
        assay = assay.assign_coords(
            fg=(("mark", "time", "roi_y", "roi_x"), fg),
            bg=(("mark", "time", "roi_y", "roi_x"), bg),
            x=(("mark", "time"), np.repeat(beads[:, 1:2], n_t, axis=1)),
            y=(("mark", "time"), np.repeat(beads[:, 0:1], n_t, axis=1)),
            valid=(("mark", "time"), np.ones((n, n_t), bool)),
        )
        if n > 0:
            assay.cache(["roi", "fg", "bg"])
        return assay

    def _prepare_frame(self, assay, fused_ok):
        """Producer-thread half of one streamed frame: materialize the
        image, host-normalize the search planes, and start the async
        upload. Returns (assay, image_np, planes_dev, search_idxs);
        image_np/planes_dev are None when the frame must take the serial
        (non-fused) path."""
        if not fused_ok:
            return (assay, None, None, None)
        img_var = assay["image"]
        stack_bytes = (np.prod(img_var.shape)
                       * np.dtype(img_var.dtype).itemsize)
        if stack_bytes > MAX_RESIDENT_BYTES:
            return (assay, None, None, None)
        search_channels = self.search_channels or _channel_values(assay)
        search_idxs = tuple(
            _channel_index(assay, c) if not isinstance(c, int) else c
            for c in search_channels
        )
        image_np = np.ascontiguousarray(assay.image.to_numpy())
        planes = self._normalize_search_planes(image_np, search_idxs)
        from magnify_tpu.parallel.mesh import active_mesh

        mesh = active_mesh()
        if mesh is not None and mesh.size > 1:
            planes_dev = _upload_search_planes(planes, mesh)
        else:
            planes_dev = jax.device_put(planes)
        return (assay, image_np, planes_dev, search_idxs)

    def stream(self, inputs, *, reader, pre, post, depth: int = 2,
               pull_batch: int = 4):
        """Pipelined multi-frame bead pipeline (generator).

        Yields one finished Dataset per input frame — each bit-identical
        to running the single-frame pipeline on that frame alone — with
        the per-frame stages overlapped across consecutive frames:

        * host pre-stages (read/standardize/flatfield/stitch) + uint8
          normalize + async upload run up to ``depth`` frames ahead on a
          background thread (the DevicePrefetcher pattern);
        * the fused detection dispatch for frames k+1..k+depth is enqueued
          on the in-order device stream BEFORE frame k's packed pull, so
          the device computes ahead while the host blocks on the pull;
        * frame k's host mask/ROI assembly runs on its own worker thread,
          overlapping the device's work on frame k+1 and the upload of
          frame k+depth;
        * packed pulls are amortized: ``pull_batch`` consecutive frames'
          packed blocks are stacked by one tiny device op and pulled with
          ONE host sync, so the per-frame link cost is RTT/pull_batch
          (each pull round trip costs ~25-40 ms through the dev relay).

        Steady-state per-frame cost is max(upload, device, host work) plus
        one small pull, instead of their serial sum — the single-frame
        path through a relay pays ~2 round trips + the upload serially
        per frame (BASELINE.md "environment tax"). Frames that cannot
        take the fused path (interactive GUI, ransac detector, or an
        out-of-core stack) drain the pipeline and run the ordinary serial
        component path, preserving output order.

        Replaces: dask's lazy chunk scheduling across frames
        (/root/reference/src/magnify/reader.py:284-292, find.py:445-629 run
        frame-serially) with an explicitly double-buffered host->HBM
        pipeline.
        """
        import collections
        import threading

        from magnify_tpu.parallel.mesh import active_mesh

        depth = max(1, int(depth))
        pull_batch = max(1, int(pull_batch))
        mesh = active_mesh()
        fused_ok = (self.gui is None
                    and ops_detect.resolve_detector(self.detector)
                    == "dense")

        def produce_assays():
            for data in inputs:
                for assay in reader(data=data):
                    for _name, comp in pre:
                        assay = comp(assay)
                    yield assay

        queue: collections.deque = collections.deque()
        cv = threading.Condition()
        done = object()
        failure: list = []
        cancelled = threading.Event()

        def produce():
            try:
                for assay in produce_assays():
                    if cancelled.is_set():
                        return
                    item = self._prepare_frame(assay, fused_ok)
                    with cv:
                        while len(queue) > depth:
                            if cancelled.is_set():
                                return
                            cv.wait()
                        queue.append(item)
                        cv.notify_all()
            except BaseException as e:  # propagate to the consumer
                failure.append(e)
            finally:
                with cv:
                    queue.append(done)
                    cv.notify_all()

        def assemble(assay, image_np, beads_i):
            out = self._assemble_fused(assay, image_np, beads_i)
            for _name, comp in post:
                out = comp(out)
            return out

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        inflight: collections.deque = collections.deque()
        pending: collections.deque = collections.deque()
        import concurrent.futures

        # Assembly runs on its own worker so the main thread's steady-state
        # cost is just the packed pull: pull(k+1) starts while frame k's
        # masks/crops are still being built (one worker keeps yield order).
        assembler = concurrent.futures.ThreadPoolExecutor(max_workers=1)

        def flush(k):
            """Pull the oldest ``k`` in-flight frames with ONE host sync
            (a tiny jitted stack of their packed blocks when k > 1) and
            hand each frame's host assembly to the worker. Runs on the
            main thread — the cap memo is main-thread state.

            Packed blocks are (pull_cap + 1, 3), and pull_cap can change
            mid-stream (memo growth after an overflow, or heterogeneous
            frame shapes with different memo entries) — jnp.stack needs
            equal shapes, so the batch is stacked per run of equal shape
            (a transition costs one extra sync, then the stream re-settles
            on the grown cap)."""
            entries = [inflight.popleft() for _ in range(k)]
            packed_list = []
            run_start = 0
            for i in range(1, len(entries) + 1):
                if (i == len(entries)
                        or entries[i][4].shape != entries[run_start][4].shape):
                    run = entries[run_start:i]
                    if len(run) == 1:
                        packed_list.append(np.asarray(run[0][4]))
                    else:
                        packed_list.extend(np.asarray(
                            _stack_packed(*[e[4] for e in run])))
                    run_start = i
            for entry, packed in zip(entries, packed_list):
                (assay, image_np, planes_dev, search_idxs, _packed_d,
                 full_d, memo_key, pull_key, cap, pull_cap) = entry
                beads_i = self._collect_from_packed(
                    packed, planes_dev, full_d, len(search_idxs), mesh,
                    memo_key, pull_key, cap, pull_cap,
                )
                pending.append(
                    assembler.submit(assemble, assay, image_np, beads_i))

        try:
            while True:
                with cv:
                    while not queue:
                        cv.wait()
                    item = queue.popleft()
                    cv.notify_all()
                if item is done:
                    break
                assay, image_np, planes_dev, search_idxs = item
                if planes_dev is None:
                    # Serial frame: drain in-flight work first so outputs
                    # stay in input order, then run the ordinary path.
                    if inflight:
                        flush(len(inflight))
                    while pending:
                        yield pending.popleft().result()
                    out = self(assay)
                    for _name, comp in post:
                        out = comp(out)
                    yield out
                    continue
                memo_key, pull_key = self._memo_keys(
                    tuple(planes_dev.shape), mesh)
                cap = ops_detect._cap_memo.get(memo_key, 1024)
                pull_cap = ops_detect._cap_memo.get(pull_key, 511)
                packed_d, full_d = self._dispatch_detect(
                    planes_dev, len(search_idxs), mesh, cap, pull_cap,
                )
                inflight.append((assay, image_np, planes_dev, search_idxs,
                                 packed_d, full_d, memo_key, pull_key, cap,
                                 pull_cap))
                # Keep ``depth`` frames dispatched-ahead beyond the batch
                # being accumulated, so the device never drains while the
                # batched pull blocks.
                if len(inflight) >= pull_batch + depth:
                    flush(pull_batch)
                while len(pending) > 1:
                    yield pending.popleft().result()
            while inflight:
                flush(min(pull_batch, len(inflight)))
            while pending:
                yield pending.popleft().result()
            thread.join()
            if failure:
                raise failure[0]
        finally:
            # The consumer may abandon the generator mid-stream: release
            # the producer so it doesn't block forever holding buffers.
            cancelled.set()
            with cv:
                queue.clear()
                cv.notify_all()
            assembler.shutdown(wait=False)

    @components.register("find_beads")
    def make(
        min_bead_diameter: int,
        max_bead_diameter: int,
        low_edge_quantile: float,
        high_edge_quantile: float,
        num_iter: int,
        min_roundness: float,
        roi_length: int,
        search_channel,
        interactive: bool,
        detector: str = "auto",
    ):
        return BeadFinder(
            min_bead_diameter=min_bead_diameter,
            max_bead_diameter=max_bead_diameter,
            low_edge_quantile=low_edge_quantile,
            high_edge_quantile=high_edge_quantile,
            num_iter=num_iter,
            min_roundness=min_roundness,
            roi_length=roi_length,
            search_channel=search_channel,
            interactive=interactive,
            detector=detector,
        )


# ---------------------------------------------------------------------------
# ButtonFinder
# ---------------------------------------------------------------------------

class ButtonFinder:
    """Find chip buttons on a grid (reference find.py:13-442)."""

    def __init__(
        self,
        row_dist: float,
        col_dist: float,
        min_button_diameter: int,
        max_button_diameter: int,
        chamber_diameter: int,
        top_chamber,
        left_chamber,
        low_edge_quantile: float,
        high_edge_quantile: float,
        num_iter: int,
        min_roundness: float,
        cluster_penalty: float,
        roi_length: int | None,
        progress_bar: bool,
        search_timestep,
        search_channel,
        interactive: bool,
        detector: str = "auto",
    ):
        if min_button_diameter > max_button_diameter:
            raise ValueError("min_button_diameter must be <= max_button_diameter.")
        self.row_dist = row_dist
        self.col_dist = col_dist
        self.min_button_radius = math.floor(min_button_diameter / 2)
        self.max_button_radius = math.ceil(max_button_diameter / 2)
        self.chamber_radius = round(chamber_diameter / 2)
        self.top_chamber = top_chamber
        self.left_chamber = left_chamber
        self.low_edge_quantile = low_edge_quantile
        self.high_edge_quantile = high_edge_quantile
        self.num_iter = num_iter
        self.min_roundness = min_roundness
        self.cluster_penalty = cluster_penalty
        self.roi_length = (roi_length if roi_length is not None
                           else round(1.2 * chamber_diameter))
        self.progress_bar = progress_bar
        self.search_timesteps = sorted(utils.to_list(search_timestep))
        self.search_channels = utils.to_list(search_channel)
        self.detector = detector
        self.gui = None
        if interactive:
            from magnify_tpu.plot.vis import InteractiveUI

            self.gui = InteractiveUI()

    def __call__(self, assay):
        search_channels = self.search_channels or _channel_values(assay)
        num_rows, num_cols = assay["tag"].shape
        sizes = assay.sizes
        n_ch, n_t = sizes["channel"], sizes["time"]
        h, w = sizes["im_y"], sizes["im_x"]
        L = self.roi_length

        roi = alloc_output("roi", (num_rows, num_cols, n_ch, n_t, L, L),
                           assay["image"].dtype)
        fg = alloc_output("fg", (num_rows, num_cols, n_t, L, L), bool)
        bg = alloc_output("bg", (num_rows, num_cols, n_t, L, L), bool)
        x = np.zeros((num_rows, num_cols, n_t))
        y = np.zeros((num_rows, num_cols, n_t))
        valid = assay["valid"].transpose(
            "mark_row", "mark_col", "time").to_numpy().copy()
        tag = assay["tag"].to_numpy()

        search_idxs = [_channel_index(assay, c) for c in search_channels]
        # The whole timestep (detect -> cluster -> regress -> intersect ->
        # refine chambers) fuses into ONE dispatch when the dense detector
        # runs non-interactively; with a mesh active the same fusion shards
        # detection over (batch=channels, space=rows) and the chamber
        # refinement over all devices instead of falling back to the
        # unfused two-dispatch path.
        use_fused = (self.gui is None
                     and ops_detect.resolve_detector(self.detector)
                     == "dense")

        for t in _progress(self.search_timesteps, self.progress_bar):
            images = assay.image.isel(time=t).to_numpy()  # (channel, H, W)
            if use_fused:
                # Minimum-traffic: only host-normalized uint8 SEARCH planes
                # cross the link (inside _fused_timestep); ROI crops of the
                # other channels are host slices of the copy already in RAM.
                (roi[:, :, :, t], fg[:, :, t], bg[:, :, t], x[..., t],
                 y[..., t], valid[..., t]) = self._fused_timestep(
                    images, tag, valid[..., t], search_idxs,
                )
                continue
            # One transfer per searched timestep; detection/ROI slicing runs
            # on the device-resident stack.
            images_dev = jnp.asarray(np.ascontiguousarray(images))
            x[..., t], y[..., t] = self.find_centers(
                images_dev, search_idxs, assay, tag
            )
            (roi[:, :, :, t], fg[:, :, t], bg[:, :, t], x[..., t], y[..., t],
             valid[..., t]) = self.find_rois(
                images, images_dev, tag, x[..., t], y[..., t], valid[..., t],
                search_idxs,
            )

        # Non-searched timesteps copy positions and only need ROI crops —
        # pure host slicing: no device involvement, with the next plane's
        # (possibly lazy/memmapped) read prefetched on a background thread.
        import concurrent.futures

        copy_ts = [t for t in range(n_t) if t not in self.search_timesteps]
        if copy_ts:
            with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
                def _load(t):
                    return assay.image.isel(time=int(t)).to_numpy()

                pending = pool.submit(_load, copy_ts[0])
                for i, t in enumerate(_progress(copy_ts, self.progress_bar)):
                    images = pending.result()
                    if i + 1 < len(copy_ts):
                        pending = pool.submit(_load, copy_ts[i + 1])
                    copy_t = (self.search_timesteps[0]
                              if t < self.search_timesteps[0] else t - 1)
                    xs = x[..., copy_t].reshape(-1)
                    ys = y[..., copy_t].reshape(-1)
                    crops = _crop_rois_np(images, xs, ys, L)
                    roi[:, :, :, t] = crops.reshape(num_rows, num_cols, n_ch,
                                                    L, L)
                    fg[:, :, t] = fg[:, :, copy_t]
                    bg[:, :, t] = bg[:, :, copy_t]
                    x[..., t] = x[..., copy_t]
                    y[..., t] = y[..., copy_t]
                    valid[..., t] = valid[..., copy_t]

        assay["roi"] = Variable(
            ("mark_row", "mark_col", "channel", "time", "roi_y", "roi_x"), roi
        )
        assay = assay.assign_coords(
            fg=(("mark_row", "mark_col", "time", "roi_y", "roi_x"), fg),
            bg=(("mark_row", "mark_col", "time", "roi_y", "roi_x"), bg),
            x=(("mark_row", "mark_col", "time"), x),
            y=(("mark_row", "mark_col", "time"), y),
            valid=(("mark_row", "mark_col", "time"), valid),
        )
        assay = assay.stack(mark=("mark_row", "mark_col")).transpose("mark", ...)
        assay.cache(["roi", "fg", "bg"])
        return assay

    def _fused_timestep(self, images_np, tag, valid_t, search_idxs):
        """One-dispatch chip timestep: :func:`_chip_fused_packed` on device,
        then host-side crops at the refined centers plus fg/bg rasters.
        Replaces the find_centers + find_rois pair (two dispatches, two
        pulls, host geometry in between) with one dispatch and one small
        pull. Host->device traffic is ONE uint8 upload of the normalized
        search planes (1 B/px) — non-search channels stay on the host
        (the reference materializes and scans the full stack,
        find.py:119-141; only the searched channels inform detection,
        find.py:210-224/344-355)."""
        from magnify_tpu.ops import gridfit

        num_rows, num_cols = tag.shape
        L = self.roi_length
        h, w = images_np.shape[-2:]
        # Host-quantized search planes, precomputed so 1 B/px (u8, exactly
        # ops.edge.normalize_to_u8) or 2 B/px (u16, when rare outliers
        # compress the useful range — ops.detect.choose_upload_precision)
        # crosses the relay. Per-chamber re-detection re-normalizes each
        # crop; on already-uint8-scaled data (and the binary-valued suite
        # fixtures) u8 is bit-identical to refining on raw planes, and the
        # auto u16 escalation keeps crop re-normalization faithful when a
        # crop spans only a sliver of the global range (the reference
        # normalizes each ROI from raw data, utils.py:102-110).
        import time as _time

        t0 = _time.perf_counter()
        raw_planes = np.ascontiguousarray(images_np[list(search_idxs)])
        precision = ops_detect.choose_upload_precision(raw_planes)
        normalized = precision == "u8"
        planes_q = (ops_detect.normalize_planes_u8(raw_planes) if normalized
                    else ops_detect.normalize_planes_u16(raw_planes))
        from magnify_tpu.parallel.mesh import active_mesh

        mesh = active_mesh()
        on_mesh = mesh is not None and mesh.size > 1
        # One upload shared by every cap-growth retry (and by both the
        # detector and finisher inside the mesh twin).
        planes_dev = jnp.asarray(planes_q)
        t1 = _time.perf_counter()

        for name, chamber, total, count, dist in (
            ("rows", self.top_chamber, h, num_rows, self.row_dist),
            ("cols", self.left_chamber, w, num_cols, self.col_dist),
        ):
            if chamber is None and gridfit.num_offsets(
                    total, count, dist) <= 0:
                raise ValueError(
                    "cluster_1d: num_clusters * cluster_length exceeds "
                    "total_length."
                )

        ppr = (tag != "").sum(axis=1).astype(np.float32)
        ppc = (tag != "").sum(axis=0).astype(np.float32)
        high_q_roi = 1 - np.pi * self.min_button_radius / L**2

        memo_key = ("chip_fused", planes_q.shape, precision,
                    self.min_button_radius, self.max_button_radius)
        if on_mesh:
            memo_key += (tuple(sorted(mesh.shape.items())),)
        cap = ops_detect._cap_memo.get(memo_key, 1024)
        kw = dict(
            num_rows=num_rows,
            num_cols=num_cols, row_dist=float(self.row_dist),
            col_dist=float(self.col_dist), top_chamber=self.top_chamber,
            left_chamber=self.left_chamber,
            chamber_radius=int(self.chamber_radius),
            min_radius=self.min_button_radius,
            max_radius=self.max_button_radius,
            min_dist=int(self.chamber_radius), roi_length=L,
        )
        while True:
            if on_mesh:
                packed_d = _chip_fused_packed_mesh(
                    planes_dev, mesh, float(self.low_edge_quantile),
                    float(self.high_edge_quantile), float(high_q_roi),
                    float(self.min_roundness), float(self.cluster_penalty),
                    jnp.asarray(ppr), jnp.asarray(ppc), cap=cap,
                    normalized=normalized, **kw,
                )
            else:
                packed_d = _chip_fused_packed(
                    planes_dev, float(self.low_edge_quantile),
                    float(self.high_edge_quantile), float(high_q_roi),
                    float(self.min_roundness), float(self.cluster_penalty),
                    jnp.asarray(ppr), jnp.asarray(ppc), cap=cap,
                    normalized=normalized, **kw,
                )
            packed = np.asarray(packed_d)  # the single pull + sync
            worst = ops_detect.unpack_count(packed[0, 0])
            if worst <= cap:
                ops_detect._cap_memo[memo_key] = cap
                break
            cap = ops_detect._grow_cap(worst, cap)
        t2 = _time.perf_counter()

        # Host twins of the regress_clusters sparse-edge warnings.
        from magnify_tpu import diagnostics

        for cnt, ideal_arr, edge in (
            (packed[0, 2], ppr, 0), (packed[0, 3], ppr, num_rows - 1),
            (packed[0, 4], ppc, 0), (packed[0, 5], ppc, num_cols - 1),
        ):
            if cnt < 2 and ideal_arr[edge] >= 2:
                diagnostics.log.warning(
                    "edge cluster %d has %d point(s); the chip grid is "
                    "unlikely to be segmented correctly", edge, int(cnt),
                )

        rows = packed[2:]
        circle, score = rows[:, :3], rows[:, 3]
        mark_x = rows[:, 4]
        mark_y = rows[:, 5]
        # Match the device program's f32 rounding of the crop corners (the
        # detected circle coordinates are relative to them).
        with np.errstate(invalid="ignore"):
            tops = np.clip(np.round(mark_y).astype(np.int32) - L // 2, 0,
                           h - L)
            lefts = np.clip(np.round(mark_x).astype(np.int32) - L // 2, 0,
                            w - L)
            refined = np.isfinite(score) & (tag.reshape(-1) != "")
            new_y = np.where(refined, circle[:, 0] + tops, mark_y)
            new_x = np.where(refined, circle[:, 1] + lefts, mark_x)
            radius = np.where(refined, circle[:, 2],
                              self.max_button_radius).astype(int)

            tops2 = np.clip(np.round(new_y).astype(np.int32) - L // 2, 0,
                            h - L)
            lefts2 = np.clip(np.round(new_x).astype(np.int32) - L // 2, 0,
                             w - L)
        crops = np.stack([
            images_np[..., t:t + L, le:le + L]
            for t, le in zip(tops2, lefts2)
        ])
        with np.errstate(invalid="ignore"):
            y_rel = np.round(new_y).astype(np.int32) - tops2
            x_rel = np.round(new_x).astype(np.int32) - lefts2
        centers_rel = np.stack([y_rel, x_rel], axis=1)
        fg_h = utils.disk_masks((L, L), centers_rel, radius)
        bg_h = utils.annulus_masks((L, L), centers_rel,
                                   self.chamber_radius,
                                   self.max_button_radius)
        n_ch = images_np.shape[0]
        last_chip_timings.clear()
        last_chip_timings.update(
            upload_bytes=int(planes_q.nbytes),
            upload_precision=precision,
            normalize_upload_s=round(t1 - t0, 6),
            dispatch_pull_s=round(t2 - t1, 6),
            host_crops_masks_s=round(_time.perf_counter() - t2, 6),
        )
        return (
            crops.reshape(num_rows, num_cols, n_ch, L, L),
            fg_h.reshape(num_rows, num_cols, L, L),
            bg_h.reshape(num_rows, num_cols, L, L),
            new_x.astype(float).reshape(num_rows, num_cols),
            new_y.astype(float).reshape(num_rows, num_cols),
            valid_t,
        )

    def find_centers(self, images_dev, search_idxs, assay, tag):
        """Grid-constrained center estimation (reference find.py:205-306)."""
        min_button_dist = self.chamber_radius
        img_shape = images_dev.shape[-2:]
        from magnify_tpu.parallel.mesh import active_mesh

        on_mesh = active_mesh() is not None and active_mesh().size > 1
        if (self.gui is None and not on_mesh
                and ops_detect.resolve_detector(self.detector) == "dense"):
            # All search channels detected + deduped in one dispatch, one
            # small packed pull.
            planes = jnp.stack([images_dev[ci] for ci in search_idxs])
            memo_key = ("chip_centers", planes.shape,
                        self.min_button_radius, self.max_button_radius)
            cap = ops_detect._cap_memo.get(memo_key, 1024)
            pull_cap = 511
            while True:
                packed_d, full_d = _bead_detect_packed(
                    planes, float(self.low_edge_quantile),
                    float(self.high_edge_quantile),
                    float(self.min_roundness), float(min_button_dist),
                    search_channels=len(search_idxs),
                    min_radius=self.min_button_radius,
                    max_radius=self.max_button_radius, cap=cap, nms_cap=cap,
                    min_dist=int(min_button_dist), pull_cap=pull_cap,
                    normalized=False,
                )
                packed = np.asarray(packed_d)
                n, worst = int(packed[0, 0]), int(packed[0, 1])
                if worst > cap:
                    cap = ops_detect._grow_cap(worst, cap)
                    continue
                ops_detect._cap_memo[memo_key] = cap
                break
            rows = packed[1:1 + min(n, pull_cap)]
            if n > pull_cap:
                rows = np.concatenate([rows, np.asarray(full_d[pull_cap:n])])
            points = rows[:, :2].astype(float)
        else:
            points = np.empty((0, 2))
            for ci in search_idxs:
                found = ops_detect.find_circles(
                    images_dev[ci],
                    low_edge_quantile=self.low_edge_quantile,
                    high_edge_quantile=self.high_edge_quantile,
                    grid_length=20,
                    num_iter=self.num_iter,
                    min_radius=self.min_button_radius,
                    max_radius=self.max_button_radius,
                    min_dist=min_button_dist,
                    min_roundness=self.min_roundness,
                    gui=self.gui,
                    detector=self.detector,
                )[0][:, :2].astype(float)
                if len(points) > 0 and len(found) > 0:
                    dists = np.linalg.norm(points[None] - found[:, None],
                                           axis=2)
                    found = found[np.min(dists, axis=1) > min_button_dist]
                points = np.concatenate([points, found])

        xs, ys = points[:, 1], points[:, 0]
        points_per_row = (tag != "").sum(axis=1)
        points_per_col = (tag != "").sum(axis=0)
        num_rows, num_cols = tag.shape

        if self.top_chamber is None:
            row_labels = cluster_1d(
                ys, total_length=img_shape[0], num_clusters=num_rows,
                cluster_length=self.row_dist, ideal_num_points=points_per_row,
                penalty=self.cluster_penalty,
            )
        else:
            row_labels = label_clusters(
                ys, offset=self.top_chamber, num_clusters=num_rows,
                cluster_length=2 * self.chamber_radius,
                cluster_gap=self.row_dist - 2 * self.chamber_radius,
            )
        if self.left_chamber is None:
            col_labels = cluster_1d(
                xs, total_length=img_shape[1], num_clusters=num_cols,
                cluster_length=self.col_dist, ideal_num_points=points_per_col,
                penalty=self.cluster_penalty,
            )
        else:
            col_labels = label_clusters(
                xs, offset=self.left_chamber, num_clusters=num_cols,
                cluster_length=2 * self.chamber_radius,
                cluster_gap=self.col_dist - 2 * self.chamber_radius,
            )

        in_cluster = (row_labels >= 0) & (col_labels >= 0)
        xs, ys = xs[in_cluster], ys[in_cluster]
        col_labels = col_labels[in_cluster]
        row_labels = row_labels[in_cluster]

        row_slope, row_intercepts = regress_clusters(
            xs, ys, labels=row_labels, num_clusters=num_rows,
            ideal_num_points=points_per_row,
        )
        # Columns regress with axes swapped to avoid near-vertical slopes.
        col_slope, col_intercepts = regress_clusters(
            ys, xs, labels=col_labels, num_clusters=num_cols,
            ideal_num_points=points_per_col,
        )

        mark_y = (row_slope * col_intercepts[None] + row_intercepts[:, None]) / (
            1 - row_slope * col_slope
        )
        mark_x = mark_y * col_slope + col_intercepts[None]
        return mark_x, mark_y

    def find_rois(self, images_np, images, tag, x, y, valid,
                  search_channel_idxs):
        """Batched per-chamber refinement (reference find.py:308-402)."""
        num_rows, num_cols = tag.shape
        n = num_rows * num_cols
        n_ch = images.shape[0]
        L = self.roi_length
        h, w = images.shape[-2:]

        xs = x.reshape(-1)
        ys = y.reshape(-1)

        if ops_detect.resolve_detector(self.detector) == "dense":
            high_q = 1 - np.pi * self.min_button_radius / L**2
            planes = jnp.stack([images[ci] for ci in search_channel_idxs])
            best = np.asarray(_chip_detect_dense(
                planes, jnp.asarray(xs, jnp.float32),
                jnp.asarray(ys, jnp.float32),
                float(self.low_edge_quantile), float(high_q),
                float(self.min_roundness), roi_length=L,
                min_radius=self.min_button_radius,
                max_radius=self.max_button_radius,
            ))  # the one device pull: (n, 4) row/col/radius/score
            circle, score = best[:, :3], best[:, 3]
            # Match the device program's f32 rounding of the crop corners
            # (the detected circle coordinates are relative to them).
            ys32 = ys.astype(np.float32)
            xs32 = xs.astype(np.float32)
            tops = np.clip(np.round(ys32).astype(np.int32) - L // 2, 0, h - L)
            lefts = np.clip(np.round(xs32).astype(np.int32) - L // 2, 0,
                            w - L)
            refined = np.isfinite(score) & (tag.reshape(-1) != "")
            new_y = np.where(refined, circle[:, 0] + tops, ys)
            new_x = np.where(refined, circle[:, 1] + lefts, xs)
            radius = np.where(refined, circle[:, 2],
                              self.max_button_radius).astype(int)

            tops2 = np.clip(np.round(new_y).astype(np.int32) - L // 2, 0,
                            h - L)
            lefts2 = np.clip(np.round(new_x).astype(np.int32) - L // 2, 0,
                             w - L)
            crops = np.stack([
                images_np[..., t:t + L, le:le + L]
                for t, le in zip(tops2, lefts2)
            ])
            y_rel = np.round(new_y).astype(np.int32) - tops2
            x_rel = np.round(new_x).astype(np.int32) - lefts2
            centers_rel = np.stack([y_rel, x_rel], axis=1)
            fg_h = utils.disk_masks((L, L), centers_rel, radius)
            bg_h = utils.annulus_masks((L, L), centers_rel,
                                       self.chamber_radius,
                                       self.max_button_radius)
            return (
                crops.reshape(num_rows, num_cols, n_ch, L, L),
                fg_h.reshape(num_rows, num_cols, L, L),
                bg_h.reshape(num_rows, num_cols, L, L),
                new_x.astype(float).reshape(num_rows, num_cols),
                new_y.astype(float).reshape(num_rows, num_cols),
                valid,
            )
        crops, tops, lefts, crops_dev = _extract_rois_host(images, xs, ys, L)

        roi_iter = max(self.num_iter // n, 1)
        high_q = 1 - np.pi * self.min_button_radius / L**2

        best_score = np.full(n, -np.inf)
        best_circle = np.zeros((n, 3), np.int32)
        for ci in search_channel_idxs:
            circles, scores, found = ops_detect.detect_best_in_rois(
                crops_dev[:, ci] if crops_dev is not None else crops[:, ci],
                low_edge_quantile=self.low_edge_quantile,
                high_edge_quantile=high_q,
                grid_length=20,
                num_iter=roi_iter,
                min_radius=self.min_button_radius,
                max_radius=self.max_button_radius,
                min_roundness=self.min_roundness,
                detector=self.detector,
            )
            better = found & (scores > best_score)
            best_score = np.where(better, scores, best_score)
            best_circle = np.where(better[:, None], circles, best_circle)

        refined = np.isfinite(best_score) & (tag.reshape(-1) != "")
        new_y = np.where(refined, best_circle[:, 0] + tops, np.round(ys))
        new_x = np.where(refined, best_circle[:, 1] + lefts, np.round(xs))
        radius = np.where(refined, best_circle[:, 2], self.max_button_radius)
        out_x = np.where(refined, new_x.astype(float), xs)
        out_y = np.where(refined, new_y.astype(float), ys)

        # Re-crop at refined centers so the button is centered
        # (find.py:369-377).
        crops, tops, lefts, _ = _extract_rois_host(images, out_x, out_y, L)
        x_rel = np.round(out_x).astype(np.int32) - lefts
        y_rel = np.round(out_y).astype(np.int32) - tops

        fg_dev, bg_dev = _button_masks(
            jnp.asarray(y_rel), jnp.asarray(x_rel), jnp.asarray(radius),
            roi_length=L, max_radius=self.max_button_radius,
            chamber_radius=self.chamber_radius,
            inner_radius=self.max_button_radius,
        )

        return (
            crops.reshape(num_rows, num_cols, n_ch, L, L),
            np.asarray(fg_dev).reshape(num_rows, num_cols, L, L),
            np.asarray(bg_dev).reshape(num_rows, num_cols, L, L),
            out_x.reshape(num_rows, num_cols),
            out_y.reshape(num_rows, num_cols),
            valid,
        )

    @components.register("find_buttons")
    def make(
        row_dist: float,
        col_dist: float,
        min_button_diameter: int,
        max_button_diameter: int,
        chamber_diameter: int,
        top_chamber,
        left_chamber,
        low_edge_quantile: float,
        high_edge_quantile: float,
        num_iter: int,
        min_roundness: float,
        cluster_penalty: float,
        roi_length: int | None,
        progress_bar: bool,
        search_timestep,
        search_channel,
        interactive: bool,
        detector: str = "auto",
    ):
        return ButtonFinder(
            row_dist=row_dist,
            col_dist=col_dist,
            min_button_diameter=min_button_diameter,
            max_button_diameter=max_button_diameter,
            chamber_diameter=chamber_diameter,
            top_chamber=top_chamber,
            left_chamber=left_chamber,
            low_edge_quantile=low_edge_quantile,
            high_edge_quantile=high_edge_quantile,
            num_iter=num_iter,
            min_roundness=min_roundness,
            cluster_penalty=cluster_penalty,
            roi_length=roi_length,
            progress_bar=progress_bar,
            search_timestep=search_timestep,
            search_channel=search_channel,
            interactive=interactive,
            detector=detector,
        )


# ---------------------------------------------------------------------------
# 1-D clustering + regression (host geometry, reference find.py:632-748)
# ---------------------------------------------------------------------------

def cluster_1d(
    points: np.ndarray,
    total_length: int,
    num_clusters: int,
    cluster_length: float,
    ideal_num_points: np.ndarray,
    penalty: float,
) -> np.ndarray:
    """Exhaustive 1-D grid-offset sweep, vectorized over all offsets.

    Same cost model as the reference (find.py:632-677): per-cluster point
    variance scaled by sqrt(ideal count) plus a quadratic count-mismatch
    penalty; empty clusters cost the per-offset maximum. Labels outliers -1.
    The O(offsets x clusters) sweep is computed with prefix sums instead of
    a Python loop.
    """
    n_offsets = total_length - round(num_clusters * cluster_length)
    if n_offsets <= 0:
        raise ValueError(
            "cluster_1d: num_clusters * cluster_length exceeds total_length."
        )
    permutation = np.argsort(points)
    pts = points[permutation]
    ideal = np.asarray(ideal_num_points, dtype=float)

    offsets = np.arange(n_offsets)[:, None]
    edges = np.arange(num_clusters + 1) * cluster_length + offsets  # (O, C+1)
    centers = (edges[:, 1:] + edges[:, :-1]) / 2

    spans = np.searchsorted(pts, edges)  # (O, C+1)
    s, e = spans[:, :-1], spans[:, 1:]
    counts = e - s

    p1 = np.concatenate([[0.0], np.cumsum(pts)])
    p2 = np.concatenate([[0.0], np.cumsum(pts**2)])
    sum1 = p1[e] - p1[s]
    sum2 = p2[e] - p2[s]
    sq_dev = sum2 - 2 * centers * sum1 + counts * centers**2

    with np.errstate(invalid="ignore", divide="ignore"):
        var = np.where(counts > 0, sq_dev / np.maximum(counts, 1), 0.0)
    row_max = var.max(axis=1, keepdims=True)
    var = np.where(counts == 0, row_max, var)
    cost = var * np.sqrt(ideal) + penalty * (ideal - counts) ** 2
    totals = cost.sum(axis=1)
    best = int(np.argmin(totals))
    best_spans = spans[best]

    labels = -np.ones(len(pts), dtype=int)
    labels[best_spans[0]: best_spans[-1]] = np.repeat(
        np.arange(num_clusters), best_spans[1:] - best_spans[:-1]
    )
    return labels[np.argsort(permutation)]


def label_clusters(points, offset, num_clusters, cluster_length, cluster_gap):
    """Fixed-geometry cluster labeling when the chip boundary is known.

    Cluster ``i`` occupies the half-open interval
    ``[offset + i*(length+gap), offset + i*(length+gap) + length)``; points
    outside every interval get -1. Same geometry as reference
    find.py:680-695, computed directly per point (no sort needed).
    """
    points = np.asarray(points)
    pitch = cluster_length + cluster_gap
    starts = offset + np.arange(num_clusters) * pitch
    slot = np.searchsorted(starts, points, side="right") - 1
    clipped = np.clip(slot, 0, num_clusters - 1)
    inside = (slot >= 0) & (points < starts[clipped] + cluster_length)
    return np.where(inside, clipped, -1).astype(int)


def _linregress(x, y):
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    xm, ym = x.mean(), y.mean()
    denom = ((x - xm) ** 2).sum()
    if denom == 0:
        return np.nan, ym
    slope = ((x - xm) * (y - ym)).sum() / denom
    return slope, ym - slope * xm


def _grouped_slopes(x, y, labels, num_clusters):
    """Least-squares slope per label via grouped sums; NaN where a cluster
    has fewer than 2 points (or zero x-variance)."""
    ok = labels >= 0
    lbl, xs, ys = labels[ok], x[ok], y[ok]
    n = np.bincount(lbl, minlength=num_clusters).astype(float)
    sx = np.bincount(lbl, weights=xs, minlength=num_clusters)
    sy = np.bincount(lbl, weights=ys, minlength=num_clusters)
    sxx = np.bincount(lbl, weights=xs * xs, minlength=num_clusters)
    sxy = np.bincount(lbl, weights=xs * ys, minlength=num_clusters)
    denom = n * sxx - sx**2
    with np.errstate(invalid="ignore", divide="ignore"):
        slopes = np.where((n >= 2) & (denom != 0),
                          (n * sxy - sx * sy) / np.where(denom == 0, 1, denom),
                          np.nan)
    return slopes, n.astype(int)


def regress_clusters(
    x: np.ndarray,
    y: np.ndarray,
    labels: np.ndarray,
    num_clusters: int,
    ideal_num_points: np.ndarray,
) -> tuple:
    """Robust per-cluster line fits (reference find.py:698-748 semantics):
    median slope across per-cluster least-squares fits, per-cluster median
    intercepts under that shared slope, then a weighted blend with a global
    evenly-spaced-intercept trend to tolerate outliers and stitching
    offsets. Slopes are computed with grouped sums rather than a per-cluster
    Python loop."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    labels = np.asarray(labels)
    ideal = np.asarray(ideal_num_points)
    if num_clusters == 1:
        if len(x) == 1:
            return 0, y
        slope, intercept = _linregress(x, y)
        # Intercepts are per-cluster arrays everywhere else; a single-row
        # grid must intersect like any other (the reference returns a bare
        # scalar here and crashes on 1xN chips, reference find.py:708).
        return slope, np.atleast_1d(intercept)

    slopes, counts = _grouped_slopes(x, y, labels, num_clusters)
    for edge in (0, num_clusters - 1):
        if counts[edge] < 2 and ideal[edge] >= 2:
            from magnify_tpu import diagnostics

            diagnostics.log.warning(
                "edge cluster %d has %d point(s); the chip grid is unlikely "
                "to be segmented correctly", edge, counts[edge],
            )

    with np.errstate(invalid="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        slope = np.nanmedian(slopes)
    if np.isnan(slope):
        # Every cluster has <= 1 point (e.g. an Nx1 or 1xN grid): no slope
        # is estimable, so treat the grid lines as axis-aligned. (The
        # reference propagates NaN here and fails downstream.)
        slope = 0.0
    residuals = y - slope * x
    intercepts = np.full(num_clusters, np.nan)
    for i in np.flatnonzero(counts):
        intercepts[i] = np.median(residuals[labels == i])

    # Global trend: intercepts of a regular grid are evenly spaced in the
    # cluster index, so fit intercept ~ index over the observed clusters and
    # pull sparse clusters toward that lattice.
    observed = ~np.isnan(intercepts)
    lattice_m, lattice_b = _linregress(np.flatnonzero(observed),
                                       intercepts[observed])
    lattice = lattice_m * np.arange(num_clusters) + lattice_b
    with np.errstate(invalid="ignore", divide="ignore"):
        weight = np.minimum(counts, ideal) / np.where(ideal == 0, 1, ideal)
    use_local = observed & (ideal != 0)
    blended = np.where(
        use_local,
        weight * np.where(observed, intercepts, 0.0) + (1 - weight) * lattice,
        lattice,
    )
    return slope, blended
