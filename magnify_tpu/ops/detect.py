"""Fused on-device circle detection: the framework's flagship kernel path.

One jitted program replaces the reference's ``find_circles`` orchestration
(/root/reference/src/magnify/utils.py:102-222):

    normalize -> blur -> Scharr -> quantile thresholds -> Canny
    -> batched RANSAC proposals -> unique-triple dedupe -> perimeter
    alignment scoring -> roundness threshold -> score sort -> claimed-raster
    NMS

The host wrapper :func:`find_circles` feeds a numpy image in and compacted
numpy circles out; everything between the two transfers runs on device. The
vmapped variant :func:`detect_best_in_rois` batches the per-chamber
re-detection of the button pipeline (reference find.py:324-360) across all
R x C ROIs in a single program instead of a Python double loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import os

from magnify_tpu.ops.edge import edge_pipeline
from magnify_tpu.ops.nms import parallel_greedy_nms
from magnify_tpu.ops.ransac import candidate_circles
from magnify_tpu.ops.score import (
    dedupe_circles,
    gather_map_scores,
    score_circles,
    score_maps,
)

__all__ = ["find_circles", "detect_best_in_rois"]

DEFAULT_UNIQUE_CAP = 65536
DEFAULT_NMS_CAP = 16384


def _use_conv_scorer() -> bool:
    """Pick the scoring backend.

    The MXU ring-correlation scorer wins on TPU (dense convs, cost
    independent of candidate count); the perimeter-gather scorer is exact
    and cheaper on CPU for test-scale inputs. Override with
    MAGNIFY_TPU_SCORER=conv|gather.
    """
    mode = os.environ.get("MAGNIFY_TPU_SCORER", "auto")
    if mode == "conv":
        return True
    if mode == "gather":
        return False
    return jax.default_backend() == "tpu"


def resolve_detector(detector: str = "auto") -> str:
    """Pick the candidate-generation strategy.

    "ransac" mirrors the reference's Monte-Carlo proposal loop
    (utils.py:295-344). "dense" skips sampling entirely: the MXU score maps
    already evaluate every (center, radius) triple, so detection reduces to
    threshold -> compact -> sort -> NMS — the exhaustive (num_iter -> inf)
    limit of the RANSAC path, deterministic and cheaper on TPU. "auto"
    selects dense on TPU, ransac elsewhere. Override with
    MAGNIFY_TPU_DETECTOR.
    """
    mode = os.environ.get("MAGNIFY_TPU_DETECTOR", detector or "auto")
    if mode not in ("auto", "dense", "ransac"):
        raise ValueError(f"unknown detector {mode!r}")
    if mode == "auto":
        return "dense" if jax.default_backend() == "tpu" else "ransac"
    return mode


def _score_uniques(grad_angles, edges, uniq, uvalid, *, min_radius,
                   max_radius, use_conv, grads=None):
    """``grads=(dx, dy)`` lets the conv branch build its features without
    the angle transcendentals (score._cs2_from_grads); the gather branch
    (the exact reference scorer) always consumes the true angles."""
    pad = 2 * max_radius
    eg = jnp.pad(edges, pad)
    shifted = uniq.at[:, :2].add(pad)
    if use_conv:
        if grads is not None:
            maps = score_maps(None, eg, min_radius=min_radius,
                              max_radius=max_radius,
                              grads=(jnp.pad(grads[0], pad),
                                     jnp.pad(grads[1], pad)))
        else:
            maps = score_maps(jnp.pad(grad_angles, pad), eg,
                              min_radius=min_radius, max_radius=max_radius)
        return gather_map_scores(maps, shifted, uvalid,
                                 min_radius=min_radius)
    return score_circles(jnp.pad(grad_angles, pad), eg, shifted, uvalid,
                         max_radius=max_radius)


def pack_count(n):
    """Store an int32 count in a float32 packed-header slot EXACTLY.

    The packed pull blocks are float32 (circle rows mix coordinates and
    scores); a plain ``astype(float32)`` of a count rounds above 2^24,
    which could make the host's grow-retry check (``worst <= cap``)
    falsely accept a truncated survivor set on a pathologically dense
    plane. Bitcasting preserves all 32 bits; :func:`unpack_count` is the
    host twin.
    """
    return jax.lax.bitcast_convert_type(
        jnp.asarray(n, jnp.int32), jnp.float32)


def unpack_count(v) -> int:
    """Recover an int32 count bit-stored in a float32 header slot."""
    return int(np.asarray(v, np.float32).reshape(1).view(np.int32)[0])


def _pad_for_scoring(grad_angles, edges, max_radius):
    pad = 2 * max_radius
    ga = jnp.pad(grad_angles, pad)
    eg = jnp.pad(edges, pad)
    return ga, eg, pad


def ranked_survivor_sources(keep, cap: int):
    """First ``cap`` flat indices of True entries in ``keep`` (row-major),
    plus the total survivor count.

    Exactly ``searchsorted(cumsum(keep.ravel()), 1..cap)`` — but evaluated
    hierarchically (super-group totals -> row totals -> columns) with every
    rank search expressed as a ``sum(bounds < target)`` compare-reduce: a
    single multi-M-element 1-D cumsum plus gathers measures ~1.4x slower on
    v5e, and ``jnp.searchsorted`` itself lowers to a while loop of
    (cap,)-element gathers that cost ~10x the whole compare-sum form.

    ``keep``: bool, any shape with last dim = row width. Returns
    (src (cap,) int32 flat indices into keep.ravel(), n_keep int32).
    Entries past n_keep hold clipped garbage — callers mask by rank.
    """
    wp = keep.shape[-1]
    k2 = keep.reshape(-1, wp)
    n_rows = k2.shape[0]
    # Row totals via a plain reduce; the per-row cumsum the original form
    # materialized over the whole volume (log2(wp) lane passes + an int32
    # write) moves AFTER the row gather and runs over (cap, wp) only.
    row_tot = k2.sum(axis=1, dtype=jnp.int32)
    row_end = jnp.cumsum(row_tot)
    n_keep = row_end[-1]
    tgt = jnp.arange(1, cap + 1, dtype=row_end.dtype)

    # searchsorted(a, t, "left") == sum(a < t): XLA lowers searchsorted to
    # a while loop of (cap,)-element gathers, which dominate this whole
    # function on TPU (measured 0.46 of 0.49 ms at 1024^2); the compare-sum
    # form is pure VPU traffic (0.49 -> 0.05 ms). Two levels keep the
    # compare volume at cap*(n_rows/g + g) instead of cap*n_rows, so the
    # same code stays cheap on 4096^2+ planes (~10^6 rows).
    g = 256
    n_sup = -(-n_rows // g)
    rt_pad = jnp.pad(row_tot, (0, n_sup * g - n_rows)).reshape(n_sup, g)
    sup_end = jnp.cumsum(rt_pad.sum(axis=1))
    sup = jnp.clip((sup_end[None, :] < tgt[:, None]).sum(1, dtype=tgt.dtype),
                   0, n_sup - 1)
    sup_off = sup_end[sup] - rt_pad.sum(axis=1)[sup]
    rc_sup = jnp.cumsum(rt_pad[sup], axis=1)  # (cap, g) row gather
    ri = (rc_sup < (tgt - sup_off)[:, None]).sum(1, dtype=tgt.dtype)
    row = jnp.clip(sup * g + ri, 0, n_rows - 1)

    row_off = row_end[row] - row_tot[row]
    tloc = tgt - row_off
    rows = jnp.cumsum(k2[row].astype(jnp.int32), axis=1)
    col = (rows < tloc[:, None]).sum(1, dtype=tgt.dtype)
    col = jnp.clip(col, 0, wp - 1)
    return (row * wp + col).astype(jnp.int32), n_keep


@functools.partial(
    jax.jit,
    static_argnames=("grid_length", "num_iter", "min_radius", "max_radius"),
)
def _stage_candidates(image, low_q, high_q, key, *, grid_length, num_iter,
                      min_radius, max_radius):
    """Edges + RANSAC proposals + unique count (no compaction yet).

    Not called by the production path (find_circles runs the fused
    _stage_ransac_packed); kept as the driver's single-chip compile-check
    surface — ``__graft_entry__.entry`` builds its forward step from this
    and :func:`_stage_score`.
    """
    h, w = image.shape
    edges, _dx, _dy, grad_angles = edge_pipeline(image, low_q, high_q)
    cands, any_edges = candidate_circles(edges, grid_length=grid_length,
                                         num_iter=num_iter, key=key)
    valid = jnp.full((num_iter,), True) & any_edges
    _, _, n_unique = dedupe_circles(
        cands, valid, height=h, width=w, min_radius=min_radius,
        max_radius=max_radius, cap=1,
    )
    return edges, grad_angles, cands, valid, n_unique


@functools.partial(
    jax.jit,
    static_argnames=("min_radius", "max_radius", "unique_cap", "use_conv"),
)
def _stage_score(edges, grad_angles, cands, valid, min_roundness, *,
                 min_radius, max_radius, unique_cap, use_conv):
    """Dedupe-compact, score, roundness-filter, and sort by score."""
    h, w = edges.shape
    uniq, uvalid, _ = dedupe_circles(
        cands, valid, height=h, width=w, min_radius=min_radius,
        max_radius=max_radius, cap=unique_cap,
    )
    scores = _score_uniques(grad_angles, edges, uniq, uvalid,
                            min_radius=min_radius, max_radius=max_radius,
                            use_conv=use_conv)
    keep = scores >= min_roundness
    n_keep = keep.sum()
    scores = jnp.where(keep, scores, -jnp.inf)
    order = jnp.argsort(-scores)
    return uniq[order], scores[order], n_keep


@functools.partial(
    jax.jit,
    static_argnames=("grid_length", "num_iter", "min_radius", "max_radius",
                     "unique_cap", "nms_cap", "min_dist", "pull_cap",
                     "use_conv", "normalized"),
)
def _stage_ransac_packed(image, low_q, high_q, min_roundness, key, *,
                         grid_length, num_iter, min_radius, max_radius,
                         unique_cap, nms_cap, min_dist, pull_cap, use_conv,
                         normalized=False):
    """Reference-faithful RANSAC detection as ONE dispatch + ONE pull.

    The staged ransac path (candidates -> score -> NMS) pays a host sync
    per stage to size the next stage's buffers; this fused variant uses
    memoized caps instead (grow-retry like the dense path) so the whole
    sampling pipeline — edges, Monte-Carlo circumcircle proposals
    (utils.py:295-344 semantics), unique-triple dedupe, scoring, sort,
    NMS — runs as a single program with a packed (pull_cap + 1, 4) result:
    row 0 carries (n_accepted, n_keep, n_unique, 0).
    """
    image = image.astype(jnp.float32)
    h, w = image.shape
    edges, dx, dy, grad_angles = edge_pipeline(image, low_q, high_q,
                                               normalized=normalized)
    cands, any_edges = candidate_circles(edges, grid_length=grid_length,
                                         num_iter=num_iter, key=key)
    valid = jnp.full((num_iter,), True) & any_edges
    uniq, uvalid, n_unique = dedupe_circles(
        cands, valid, height=h, width=w, min_radius=min_radius,
        max_radius=max_radius, cap=unique_cap,
    )
    return ransac_score_pack(
        edges, dx, dy, grad_angles, uniq, uvalid, n_unique, min_roundness,
        min_radius=min_radius, max_radius=max_radius, nms_cap=nms_cap,
        min_dist=min_dist, pull_cap=pull_cap, use_conv=use_conv,
    )


def ransac_score_pack(edges, dx, dy, grad_angles, uniq, uvalid, n_unique,
                      min_roundness, *, min_radius, max_radius, nms_cap,
                      min_dist, pull_cap, use_conv):
    """Score deduped uniques, rank/sort survivors, NMS, and pack the result.

    The tail of :func:`_stage_ransac_packed`, shared with the mesh-sharded
    RANSAC path (parallel/mesh.sharded_ransac_packed) so both routes are
    the same program after the dedupe merge.
    """
    h, w = edges.shape
    scores = _score_uniques(grad_angles, edges, uniq, uvalid,
                            min_radius=min_radius, max_radius=max_radius,
                            use_conv=use_conv, grads=(dx, dy))
    keep = scores >= min_roundness
    scores = jnp.where(keep, scores, -jnp.inf)

    # Compact the <= nms_cap survivors BEFORE sorting/NMS instead of
    # argsorting all unique_cap rows and slicing: on noisy planes the
    # unique cap grows to ~1M triples while n_keep stays small, and an
    # argsort + greedy-NMS over the full cap measured ~2.6 s of a 3.0 s
    # frame on v5e. The (-score, unique-index) sort keys reproduce the
    # stable argsort's tie order exactly, so the result is bit-identical
    # whenever n_keep <= nms_cap — the only accepted outcome (the caller
    # checks row 0 and grows nms_cap otherwise, mirroring the reference's
    # uncapped keep-everything semantics).
    n_flat = keep.shape[0]
    rw = 1024
    while rw > 1 and n_flat % rw:
        rw //= 2
    src, n_keep = ranked_survivor_sources(keep.reshape(-1, rw), nms_cap)
    targets = jnp.arange(1, nms_cap + 1, dtype=n_keep.dtype)
    in_range = targets <= n_keep
    sel_scores = jnp.where(in_range, scores[src], -jnp.inf)
    neg, sel_idx = jax.lax.sort((-sel_scores, src), num_keys=2)
    s = -neg
    circles = uniq[sel_idx]
    if min_dist > 0:
        accepted = parallel_greedy_nms(circles, jnp.isfinite(s),
                                       min_dist=min_dist, height=h, width=w,
                                       max_radius=max_radius)
    else:
        accepted = jnp.isfinite(s)

    return _pack_accepted(circles, s, accepted, n_keep, pull_cap=pull_cap,
                          extra_counts=(n_unique,))


def checkify_enabled() -> bool:
    """Opt-in runtime guards (SURVEY §5 race/failure detection): with
    MAGNIFY_TPU_CHECKIFY=1, the detection program runs under
    jax.experimental.checkify float checks — NaNs produced in the
    edge/score math raise instead of silently corrupting detections.
    (Index checks stay off: the compaction scatters deliberately use
    out-of-range indices as drop sinks.) Off by default; the checks cost
    extra device work and can flag guarded where(...) divides on
    degenerate inputs."""
    return os.environ.get("MAGNIFY_TPU_CHECKIFY", "0") == "1"


@functools.lru_cache(maxsize=None)
def _checked_dense_packed(min_radius, max_radius, cap, nms_cap, min_dist,
                          pull_cap, normalized):
    from jax.experimental import checkify

    def run(image, low_q, high_q, min_roundness):
        return _stage_dense_packed.__wrapped__(
            image, low_q, high_q, min_roundness, min_radius=min_radius,
            max_radius=max_radius, cap=cap, nms_cap=nms_cap,
            min_dist=min_dist, pull_cap=pull_cap, normalized=normalized,
        )

    return jax.jit(checkify.checkify(run, errors=checkify.float_checks))


def _pow2_at_least(n: int, lo: int, hi: int) -> int:
    out = lo
    while out < n and out < hi:
        out *= 2
    return min(out, hi)


# Hard ceiling on compaction buffers: 16M (center, radius) survivors is a
# degenerate detection (e.g. min_roundness=0 on a large noisy plane), not a
# workload — refusing beats silently truncating or re-dispatching forever.
CAP_CEILING = 1 << 24

# Last adequate compaction cap per (purpose, *static shape params): frames of
# a run have similar candidate counts, so starting from the remembered cap
# avoids the grow-retry recompile (tens of seconds cold on TPU) after the
# first frame. Persisted next to the XLA compile cache so FRESH PROCESSES
# also start from the right cap — the grow-retry path compiles a program
# per candidate cap, and skipping the undersized first guess saves one
# compile + dispatch per workload on cold starts.


class _CapMemo(dict):
    """Write-through dict[tuple, int] persisted as a JSON sidecar."""

    def __init__(self):
        super().__init__()
        self._path = None
        if os.environ.get("MAGNIFY_TPU_DISABLE_CACHE"):
            return
        cache_dir = os.environ.get(
            "MAGNIFY_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "magnify_tpu",
                         "xla"),
        )
        self._path = os.path.join(cache_dir, "cap_memo.json")
        try:
            import ast
            import json

            with open(self._path) as fh:
                for key, val in json.load(fh).items():
                    super().__setitem__(ast.literal_eval(key), int(val))
        except Exception:
            pass

    def __setitem__(self, key, value):
        changed = self.get(key) != value
        super().__setitem__(key, value)
        if changed and self._path is not None:
            try:
                import ast
                import json

                # Merge entries written by concurrent processes since our
                # load so the rewrite is not last-writer-wins over the
                # whole dict. On conflict keep the LARGER value: caps (and
                # pull caps) only ever grow, so max() preserves whichever
                # process learned more — setdefault would discard a
                # concurrent process's growth and re-pay its grow-retry.
                try:
                    with open(self._path) as fh:
                        for k, v in json.load(fh).items():
                            kk = ast.literal_eval(k)
                            super().__setitem__(
                                kk, max(int(v), self.get(kk, 0)))
                except Exception:
                    pass
                os.makedirs(os.path.dirname(self._path), exist_ok=True)
                tmp = self._path + f".tmp{os.getpid()}"
                with open(tmp, "w") as fh:
                    json.dump({repr(k): v for k, v in self.items()}, fh)
                os.replace(tmp, self._path)
            except Exception:
                pass


_cap_memo: dict[tuple, int] = _CapMemo()


def _grow_cap(n_keep: int, cap: int) -> int:
    """Next pow2 buffer size covering ``n_keep``, erroring at the ceiling
    instead of retrying the identical program forever."""
    if cap >= CAP_CEILING:
        raise ValueError(
            f"detection produced {n_keep} candidates, exceeding the "
            f"{CAP_CEILING} compaction ceiling; raise min_roundness or the "
            "edge quantiles to reject more of the plane"
        )
    return _pow2_at_least(n_keep, 2 * cap, CAP_CEILING)


@functools.partial(
    jax.jit,
    static_argnames=("min_radius", "max_radius", "cap", "nms_cap",
                     "min_dist", "normalized"),
)
def _stage_dense_full(image, low_q, high_q, min_roundness, *, min_radius,
                      max_radius, cap, nms_cap, min_dist, normalized=False):
    """Single-dispatch dense detection: edges -> maps -> compact -> sort ->
    NMS. One program, one host sync — the default TPU path."""
    image = image.astype(jnp.float32)
    h, w = image.shape
    circles, scores, n_keep = _dense_candidates(
        image, low_q, high_q, min_roundness, min_radius=min_radius,
        max_radius=max_radius, cap=cap, normalized=normalized,
    )
    c = circles[:nms_cap]
    s = scores[:nms_cap]
    if min_dist > 0:
        accepted = parallel_greedy_nms(c, jnp.isfinite(s), min_dist=min_dist,
                                       height=h, width=w,
                                       max_radius=max_radius)
    else:
        accepted = jnp.isfinite(s)
    return c, s, accepted, n_keep


@functools.partial(
    jax.jit,
    static_argnames=("min_radius", "max_radius", "cap", "nms_cap",
                     "min_dist", "pull_cap", "normalized"),
)
def _stage_dense_packed(image, low_q, high_q, min_roundness, *, min_radius,
                        max_radius, cap, nms_cap, min_dist, pull_cap,
                        normalized=False):
    """Dense detection returning ONE small pullable array.

    Wraps :func:`_stage_dense_full`, compacts the NMS-accepted circles to
    the front (score order preserved), and packs counts + (row, col, radius,
    score) rows into a (pull_cap + 1, 4) float32 block — so the host makes a
    single small transfer instead of pulling circles/scores/accepted/n_keep
    separately (each transfer costs a full link round trip). The full
    compacted buffer is also returned device-resident for the rare
    n_accepted > pull_cap overflow."""
    circles, scores, accepted, n_keep = _stage_dense_full(
        image, low_q, high_q, min_roundness, min_radius=min_radius,
        max_radius=max_radius, cap=cap, nms_cap=nms_cap, min_dist=min_dist,
        normalized=normalized,
    )
    return _pack_accepted(circles, scores, accepted, n_keep,
                          pull_cap=pull_cap)


def _pack_accepted(circles, scores, accepted, n_keep, *, pull_cap,
                   extra_counts=()):
    """Compact NMS-accepted circles to the front (score order preserved) and
    pack [count header; (row, col, radius, score) rows] into a
    (pull_cap + 1, 4) float32 block. The ONE copy of the packing logic:
    shared by the single-plane and batched packed programs, the mesh twin
    (parallel/mesh._pack_accepted_batch vmaps it), and the RANSAC tail
    (:func:`ransac_score_pack`, which adds its unique count to the header
    via ``extra_counts``)."""
    total = circles.shape[0]
    rank = jnp.cumsum(accepted) - 1
    n_acc = accepted.sum()
    dest = jnp.where(accepted, rank, total)
    rows = jnp.concatenate(
        [circles.astype(jnp.float32), scores[:, None]], axis=1
    )
    compacted = jnp.zeros((total, 4), jnp.float32).at[dest].set(rows,
                                                                mode="drop")
    packed = jnp.zeros((pull_cap + 1, 4), jnp.float32)
    packed = (packed.at[0, 0].set(pack_count(n_acc))
              .at[0, 1].set(pack_count(n_keep)))
    for i, count in enumerate(extra_counts):
        packed = packed.at[0, 2 + i].set(pack_count(count))
    take = min(pull_cap, total)
    packed = packed.at[1:1 + take].set(compacted[:take])
    return packed, compacted


@functools.partial(
    jax.jit, static_argnames=("min_radius", "max_radius", "cap"),
)
def _stage_dense(image, low_q, high_q, min_roundness, *, min_radius,
                 max_radius, cap):
    return _dense_candidates(image, low_q, high_q, min_roundness,
                             min_radius=min_radius, max_radius=max_radius,
                             cap=cap)


def _folded_survivors(folded, s, *, hp, wp, h, w, pad, min_radius,
                      min_roundness, cap):
    """Threshold + rank + sort survivors of one plane's FOLDED score maps.

    Returns ``(neg_scores, cand_lin, n_keep)`` with ``cand_lin`` the
    UNFOLDED row-major flat index (the layout-independent sort key).
    Factored out of :func:`_dense_candidates` so the batched program can
    vmap this tail around a natively batched score conv.
    """
    _c, hq, wq = folded.shape
    ch = jax.lax.broadcasted_iota(jnp.int32, folded.shape, 0)
    ri = ch // (s * s)
    y = jax.lax.broadcasted_iota(jnp.int32, folded.shape, 1) * s \
        + (ch // s) % s
    x = jax.lax.broadcasted_iota(jnp.int32, folded.shape, 2) * s \
        + ch % s
    rows = y - pad
    cols = x - pad
    rads = ri + min_radius
    ok = (y < hp) & (x < wp)  # fold padding rows/cols carry garbage
    ok &= (rows + rads >= 0) & (cols + rads >= 0)
    ok &= (rows - rads < h) & (cols - rads < w)
    keep = ok & (folded >= min_roundness)

    # Rank-search in the conv output's NATIVE minor dim (wq-wide rows):
    # regrouping the flat mask into power-of-two rows reads as a free
    # reshape but crosses the 67-wide minor-dim boundary, so XLA must
    # materialize a physical relayout of the whole padded volume — and
    # the flat folded.reshape(-1)[src] gather forces a second one.
    # Prefix-chained measurement at 1024^2: the keep+rank step cost
    # 1.57 ms in-frame vs 0.12 ms isolated until both relayouts were
    # removed (minor-dim-preserving reshapes are views; the score read
    # becomes a row gather + one-hot column pick). Flat indices are
    # unchanged, so results are bit-identical.
    k2 = keep.reshape(-1, wq)
    src, n_keep = ranked_survivor_sources(k2, cap)
    targets = jnp.arange(1, cap + 1, dtype=n_keep.dtype)
    in_range = targets <= n_keep
    frows = folded.reshape(-1, wq)[src // wq]  # (cap, wq) row gather
    onehot = (src % wq)[:, None] == jnp.arange(wq)[None, :]
    sel_scores = jnp.where(in_range, jnp.where(onehot, frows, 0).sum(1),
                           -jnp.inf)
    # Folded flat index -> unfolded row-major index (the sort key the
    # unfolded path uses, keeping results identical across layouts).
    fch = src // (hq * wq)
    frem = src % (hq * wq)
    fy = (frem // wq) * s + (fch // s) % s
    fx = (frem % wq) * s + fch % s
    lin = ((fch // (s * s)) * hp + fy) * wp + fx
    neg, cand_lin = jax.lax.sort((-sel_scores, lin), num_keys=2)
    return neg, cand_lin, n_keep


def _candidates_from_lin(neg, cand_lin, n_keep, *, hp, wp, pad, min_radius):
    """Decode sorted (negated score, unfolded flat index) pairs into the
    (circles, scores, n_keep) contract of :func:`_dense_candidates`."""
    cand_scores = -neg
    r_idx = cand_lin // (hp * wp)
    rem = cand_lin % (hp * wp)
    circles = jnp.stack(
        [rem // wp - pad, rem % wp - pad, r_idx + min_radius], axis=1
    ).astype(jnp.int32)
    return circles, cand_scores, n_keep


def _dense_candidates(image, low_q, high_q, min_roundness, *, min_radius,
                      max_radius, cap, normalized=False):
    """Exhaustive detection: score every (center, radius), threshold, sort.

    One fused program: edge stack -> MXU ring-correlation score maps ->
    reference bound filters (utils.py:155-166) -> roundness threshold ->
    compaction into a static (cap, 3) buffer -> score sort. Returns
    (circles, scores, n_keep) with n_keep possibly exceeding cap (caller
    retries with a larger cap).
    """
    h, w = image.shape
    edges, dx, dy, _grad_angles = edge_pipeline(image, low_q, high_q,
                                                normalized=normalized)
    # Score features come straight from (dx, dy) — cos/sin(2a) are rational
    # in the gradients (score._cs2_from_grads), so the full-plane arctan2
    # (and its unused cos/sin) are dead code XLA eliminates from this
    # program (~0.5 ms of transcendentals at 1024^2 on v5e).
    dxp, eg, pad = _pad_for_scoring(dx, edges, max_radius)
    dyp = jnp.pad(dy, pad)
    hp, wp = eg.shape

    # Survivor compaction without a full top_k or scatter: the roundness
    # threshold already leaves n_keep (<= cap, else the caller regrows cap
    # and retries) survivors, so rank them with the hierarchical binary
    # search (ranked_survivor_sources) and sort just the <= cap selected
    # rows by (-score, index). The (-score, index) key is exactly
    # lax.top_k's order, and it is the same lexicographic key the
    # mesh-sharded merge uses, so single-chip and sharded results stay
    # bit-identical. ~10x cheaper than top_k over the full multi-radius
    # score volume on TPU. Scores gather straight from the maps: selected
    # positions are survivors by construction, and ranks past n_keep are
    # masked, so the keep-masked flat copy never materializes.
    #
    # When the s2d fold is active, everything below runs in the FOLDED
    # conv-output layout (score_maps_folded) — the 5-plane depth-to-space
    # unfold and its slice copies (~1.2 ms of the 1024^2 frame on v5e)
    # never materialize. The survivor SET is layout-independent whenever
    # n_keep <= cap (the only accepted outcome: the caller regrows and
    # retries otherwise), and the sort key below is the UNFOLDED row-major
    # index either way, so (circles, scores) are bit-identical to the
    # unfolded path.
    from magnify_tpu.ops.score import _resolve_s2d, score_maps_folded

    if _resolve_s2d(None, eg.shape) > 1:
        folded, s = score_maps_folded(None, eg, min_radius=min_radius,
                                      max_radius=max_radius,
                                      grads=(dxp, dyp))
        neg, cand_lin, n_keep = _folded_survivors(
            folded, s, hp=hp, wp=wp, h=h, w=w, pad=pad,
            min_radius=min_radius, min_roundness=min_roundness, cap=cap)
    else:
        maps = score_maps(None, eg, min_radius=min_radius,
                          max_radius=max_radius, grads=(dxp, dyp))
        rows = jax.lax.broadcasted_iota(jnp.int32, maps.shape, 1) - pad
        cols = jax.lax.broadcasted_iota(jnp.int32, maps.shape, 2) - pad
        rads = jax.lax.broadcasted_iota(jnp.int32, maps.shape, 0) \
            + min_radius
        ok = (rows + rads >= 0) & (cols + rads >= 0)
        ok &= (rows - rads < h) & (cols - rads < w)
        keep = ok & (maps >= min_roundness)

        src, n_keep = ranked_survivor_sources(keep, cap)
        targets = jnp.arange(1, cap + 1, dtype=n_keep.dtype)
        in_range = targets <= n_keep
        sel_scores = jnp.where(in_range, maps.reshape(-1)[src], -jnp.inf)
        neg, cand_lin = jax.lax.sort((-sel_scores, src), num_keys=2)

    return _candidates_from_lin(neg, cand_lin, n_keep, hp=hp, wp=wp,
                                pad=pad, min_radius=min_radius)


def find_circles(
    image: np.ndarray,
    low_edge_quantile: float,
    high_edge_quantile: float,
    grid_length: int,
    num_iter: int,
    min_radius: int,
    max_radius: int,
    min_roundness: float,
    min_dist: int,
    gui=None,
    seed: int = 0,
    detector: str = "auto",
) -> tuple[np.ndarray, np.ndarray]:
    """Detect circles in a single image.

    Same contract as the reference find_circles (utils.py:102-222): returns
    (circles, scores) with circles int32 rows of (row, col, radius) sorted by
    descending roundness score, already NMS-deduped when ``min_dist > 0``.

    Two candidate strategies (see :func:`resolve_detector`): "ransac"
    mirrors the reference's sampling; "dense" scores every (center, radius)
    triple via the MXU maps — exhaustive and deterministic. Both run as
    jitted stages with scalar host syncs sizing pow2-bucketed buffers.

    ``gui`` is accepted for interface parity; interactive tuning is provided
    by :mod:`magnify_tpu.plot.vis` outside the fused path.
    """
    if gui is not None:
        from magnify_tpu.plot.vis import interactive_find_circles

        return interactive_find_circles(
            image, gui,
            low_edge_quantile=low_edge_quantile,
            high_edge_quantile=high_edge_quantile,
            grid_length=grid_length, num_iter=num_iter, min_radius=min_radius,
            max_radius=max_radius, min_roundness=min_roundness,
            min_dist=min_dist, seed=seed,
        )

    # Defer the host->device upload until we know which path runs: the mesh
    # path wants the HOST array (it normalizes to uint8 before shipping), so
    # uploading first would cost a raw upload plus a full-plane pull-back.
    host_image = None if isinstance(image, jax.Array) \
        else np.ascontiguousarray(image)
    h, w = image.shape

    if resolve_detector(detector) == "dense":
        from magnify_tpu.parallel.mesh import active_mesh, sharded_find_circles

        mesh = active_mesh()
        if mesh is not None and mesh.size > 1:
            # Multi-chip: shard the dense detection over the active mesh
            # (row-sharded score maps, all_gather merge, replicated NMS).
            return sharded_find_circles(
                np.asarray(image) if host_image is None else host_image,
                mesh, low_edge_quantile,
                high_edge_quantile, min_radius=int(min_radius),
                max_radius=int(max_radius), min_roundness=float(min_roundness),
                min_dist=int(min_dist),
            )
        if host_image is not None:
            # Ship the raw dtype (often uint16: half the bytes) and cast on
            # device inside the jitted stages.
            image = jnp.asarray(host_image)
        memo_key = ("frame", h, w, int(min_radius), int(max_radius))
        cap = _cap_memo.get(memo_key, 4096)
        pull_cap = 511
        while True:
            if checkify_enabled():
                checked = _checked_dense_packed(
                    int(min_radius), int(max_radius), cap, cap,
                    int(min_dist), pull_cap, False,
                )
                err, (packed_d, full_d) = checked(
                    image, float(low_edge_quantile),
                    float(high_edge_quantile), float(min_roundness),
                )
                err.throw()
            else:
                packed_d, full_d = _stage_dense_packed(
                    image, float(low_edge_quantile),
                    float(high_edge_quantile), float(min_roundness),
                    min_radius=int(min_radius), max_radius=int(max_radius),
                    cap=cap, nms_cap=cap, min_dist=int(min_dist),
                    pull_cap=pull_cap,
                )
            packed = np.asarray(packed_d)  # the single transfer + sync
            n_acc = unpack_count(packed[0, 0])
            n_keep = unpack_count(packed[0, 1])
            if n_keep <= cap:
                _cap_memo[memo_key] = cap
                break
            cap = _grow_cap(n_keep, cap)
        rows = packed[1:1 + min(n_acc, pull_cap)]
        if n_acc > pull_cap:
            rows = np.concatenate([rows, np.asarray(full_d[pull_cap:n_acc])])
        return rows[:, :3].astype(np.int32), rows[:, 3].copy()

    else:
        # RANSAC mode gets the same first-class treatment as dense: one
        # dispatch (sampling through NMS fused, caps memoized with
        # grow-retry) and one packed pull, instead of per-stage host syncs.
        from magnify_tpu.parallel.mesh import (active_mesh,
                                               sharded_ransac_find_circles)
        from magnify_tpu.ops.score import RASTER_KEY_LIMIT, raster_key_space

        mesh = active_mesh()
        key_space = raster_key_space(h, w, int(min_radius), int(max_radius))
        if mesh is not None and mesh.size > 1 and key_space <= RASTER_KEY_LIMIT:
            # Multi-chip: the Monte-Carlo iterations shard across the mesh
            # (presence-bitmask OR merge); byte-identical to single-chip.
            return sharded_ransac_find_circles(
                np.asarray(image) if host_image is None else host_image,
                mesh, low_edge_quantile, high_edge_quantile,
                grid_length=int(grid_length), num_iter=int(num_iter),
                min_radius=int(min_radius), max_radius=int(max_radius),
                min_roundness=float(min_roundness), min_dist=int(min_dist),
                seed=int(seed),
            )
        if host_image is not None:
            image = jnp.asarray(host_image)
        key = jax.random.PRNGKey(seed)
        memo_key = ("ransac", h, w, int(min_radius), int(max_radius))
        keep_key = ("ransac_keep", h, w, int(min_radius), int(max_radius))
        ucap = _cap_memo.get(memo_key, 4096)
        # The survivor/NMS cap is memoized separately from the unique cap:
        # noisy planes need ~1M unique-triple capacity but only thousands
        # of above-roundness survivors, and sorting/NMS at the unique cap
        # measured ~2.6 s of a 3.0 s frame on v5e.
        ncap = _cap_memo.get(keep_key, 4096)
        pull_cap = 511
        while True:
            packed_d, full_d = _stage_ransac_packed(
                image, float(low_edge_quantile), float(high_edge_quantile),
                float(min_roundness), key, grid_length=int(grid_length),
                num_iter=int(num_iter), min_radius=int(min_radius),
                max_radius=int(max_radius), unique_cap=ucap, nms_cap=ncap,
                min_dist=int(min_dist), pull_cap=pull_cap,
                use_conv=_use_conv_scorer(),
            )
            packed = np.asarray(packed_d)  # the single transfer + sync
            n_acc = unpack_count(packed[0, 0])
            n_keep = unpack_count(packed[0, 1])
            n_unique = unpack_count(packed[0, 2])
            if n_unique > ucap:
                ucap = _grow_cap(n_unique, ucap)
                continue
            if n_keep > ncap:
                ncap = _grow_cap(n_keep, ncap)
                continue
            _cap_memo[memo_key] = ucap
            _cap_memo[keep_key] = ncap
            break
        rows = packed[1:1 + min(n_acc, pull_cap)]
        if n_acc > pull_cap:
            rows = np.concatenate([rows, np.asarray(full_d[pull_cap:n_acc])])
        return rows[:, :3].astype(np.int32), rows[:, 3].copy()


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_length", "num_iter", "min_radius", "max_radius", "unique_cap",
        "use_conv",
    ),
)
def _detect_rois(rois, low_q, high_q, min_roundness, keys, *, grid_length,
                 num_iter, min_radius, max_radius, unique_cap, use_conv):
    rois = rois.astype(jnp.float32)
    n, l, _ = rois.shape

    # 3x3x3 neighborhood for the deterministic local refinement step.
    nb = np.array([(dy, dx, dr) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                   for dr in (-1, 0, 1)], dtype=np.int32)
    neighborhood = jnp.asarray(nb)

    def one(roi, key):
        edges, dx, dy, grad_angles = edge_pipeline(roi, low_q, high_q)
        cands, any_edges = candidate_circles(edges, grid_length=grid_length,
                                             num_iter=num_iter, key=key)
        valid = jnp.full((num_iter,), True) & any_edges
        uniq, uvalid, _n = dedupe_circles(
            cands, valid, height=l, width=l, min_radius=min_radius,
            max_radius=max_radius, cap=unique_cap,
        )
        ga, eg, pad = _pad_for_scoring(grad_angles, edges, max_radius)
        shifted = uniq.at[:, :2].add(pad)
        if use_conv:
            # Gradient-derived features skip the angle transcendentals;
            # the unused ga (arctan2) is DCE'd from this trace.
            maps = score_maps(None, eg, min_radius=min_radius,
                              max_radius=max_radius,
                              grads=(jnp.pad(dx, pad), jnp.pad(dy, pad)))
            scores = gather_map_scores(maps, shifted, uvalid,
                                       min_radius=min_radius)
        else:
            maps = None
            scores = score_circles(ga, eg, shifted, uvalid,
                                   max_radius=max_radius)
        scores = jnp.where(scores >= min_roundness, scores, -jnp.inf)
        best = jnp.argmax(scores)
        best_circle = uniq[best]
        best_score = scores[best]

        # Deterministic hill-climb: with a small per-chamber sample budget
        # the RANSAC proposals may miss the exact optimum by a pixel; score
        # the 27 neighboring (row, col, radius) triples of the argmax under
        # the same objective and keep the max. Pure refinement — the
        # objective is unchanged, so tolerance-level behavior matches the
        # reference's argmax (find.py:356-359) with a denser sample set.
        cand_nb = best_circle[None, :] + neighborhood
        cand_nb = cand_nb.at[:, 2].set(
            jnp.clip(cand_nb[:, 2], min_radius, max_radius)
        )
        nb_ok = jnp.full((cand_nb.shape[0],), jnp.isfinite(best_score))
        nb_shifted = cand_nb.at[:, :2].add(pad)
        if use_conv:
            nb_scores = gather_map_scores(maps, nb_shifted, nb_ok,
                                          min_radius=min_radius)
        else:
            nb_scores = score_circles(ga, eg, nb_shifted, nb_ok,
                                      max_radius=max_radius)
        j = jnp.argmax(nb_scores)
        improved = nb_scores[j] > best_score
        best_circle = jnp.where(improved, cand_nb[j], best_circle)
        best_score = jnp.where(improved, nb_scores[j], best_score)
        return best_circle, best_score

    return jax.vmap(one)(rois, keys)


def _dense_candidates_batch(images, low_q, high_q, min_roundness, *,
                            min_radius, max_radius, cap, normalized=False):
    """Batched :func:`_dense_candidates` over (B, H, W) planes.

    The edge stack and the per-plane survivor tail run under ``jax.vmap``,
    but the folded score conv — the #1 bin — runs NATIVELY at N=B through
    the leading-batch form of :func:`score_maps_folded`: vmap's batched
    transposes and B separate N=1 convs measure 2.19 ms/plane at
    B=16/1024^2 on v5e vs 1.34 natively batched, byte-equal
    (scripts/batch_maps_experiment.py). Results are bit-identical to the
    vmapped single-plane program (int8 features + int32 accumulation make
    the maps exact; the tail is the same code under vmap).
    """
    from magnify_tpu.ops.score import _resolve_s2d, score_maps_folded

    _b, h, w = images.shape
    pad = 2 * max_radius
    hp, wp = h + 2 * pad, w + 2 * pad
    if _resolve_s2d(None, (hp, wp)) <= 1:
        # Small planes fold away: plain vmap of the single-plane program.
        return jax.vmap(lambda img: _dense_candidates(
            img.astype(jnp.float32), low_q, high_q, min_roundness,
            min_radius=min_radius, max_radius=max_radius, cap=cap,
            normalized=normalized))(images)

    def edge_one(img):
        edges, dx, dy, _ = edge_pipeline(img.astype(jnp.float32), low_q,
                                         high_q, normalized=normalized)
        dxp, eg, _pad = _pad_for_scoring(dx, edges, max_radius)
        return eg, dxp, jnp.pad(dy, pad)

    eg, dxp, dyp = jax.vmap(edge_one)(images)
    folded, s = score_maps_folded(None, eg, min_radius=min_radius,
                                  max_radius=max_radius, grads=(dxp, dyp))

    def tail(f):
        neg, cand_lin, n_keep = _folded_survivors(
            f, s, hp=hp, wp=wp, h=h, w=w, pad=pad, min_radius=min_radius,
            min_roundness=min_roundness, cap=cap)
        return _candidates_from_lin(neg, cand_lin, n_keep, hp=hp, wp=wp,
                                    pad=pad, min_radius=min_radius)

    return jax.vmap(tail)(folded)


def _stage_dense_full_batch(images, low_q, high_q, min_roundness, *,
                            min_radius, max_radius, cap, nms_cap, min_dist,
                            normalized=False):
    """Batched :func:`_stage_dense_full`: natively batched candidates front,
    vmapped per-plane NMS tail."""
    _b, h, w = images.shape
    circles, scores, n_keep = _dense_candidates_batch(
        images, low_q, high_q, min_roundness, min_radius=min_radius,
        max_radius=max_radius, cap=cap, normalized=normalized,
    )

    def nms_one(circ, sc):
        c = circ[:nms_cap]
        s = sc[:nms_cap]
        if min_dist > 0:
            accepted = parallel_greedy_nms(c, jnp.isfinite(s),
                                           min_dist=min_dist, height=h,
                                           width=w, max_radius=max_radius)
        else:
            accepted = jnp.isfinite(s)
        return c, s, accepted

    c, s, accepted = jax.vmap(nms_one)(circles, scores)
    return c, s, accepted, n_keep


@functools.partial(
    jax.jit,
    static_argnames=("min_radius", "max_radius", "cap", "nms_cap",
                     "min_dist"),
)
def _stage_dense_batch(images, low_q, high_q, min_roundness, *, min_radius,
                       max_radius, cap, nms_cap, min_dist):
    return _stage_dense_full_batch(
        images, low_q, high_q, min_roundness, min_radius=min_radius,
        max_radius=max_radius, cap=cap, nms_cap=nms_cap, min_dist=min_dist,
    )


@functools.partial(
    jax.jit,
    static_argnames=("min_radius", "max_radius", "cap", "nms_cap",
                     "min_dist", "pull_cap", "normalized"),
)
def _stage_dense_batch_packed(images, low_q, high_q, min_roundness, *,
                              min_radius, max_radius, cap, nms_cap, min_dist,
                              pull_cap, normalized=False):
    """Batched :func:`_stage_dense_packed`: one small (B, pull_cap+1, 4)
    transfer carries every plane's accepted circles + counts. The score
    conv runs natively at N=B (see :func:`_dense_candidates_batch`)."""
    c, s, accepted, n_keep = _stage_dense_full_batch(
        images, low_q, high_q, min_roundness, min_radius=min_radius,
        max_radius=max_radius, cap=cap, nms_cap=nms_cap, min_dist=min_dist,
        normalized=normalized,
    )
    return jax.vmap(
        functools.partial(_pack_accepted, pull_cap=pull_cap)
    )(c, s, accepted, n_keep)


def normalize_planes_u8(images: np.ndarray) -> np.ndarray:
    """Host twin of per-plane :func:`magnify_tpu.ops.edge.normalize_to_u8`
    (bitwise-identical f32 arithmetic), so only 1 byte/pixel crosses the
    host->device link and the device skips its normalization."""
    x = images.astype(np.float32)
    x -= x.min(axis=(-2, -1), keepdims=True)
    peak = x.max(axis=(-2, -1), keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        x = np.where(peak > 0, 255.0 * x / peak, x)
    return np.trunc(x).astype(np.uint8)


def normalize_planes_u16(images: np.ndarray) -> np.ndarray:
    """Per-plane min-max quantization to uint16 (2 B/px up the link).

    The high-precision escalation of :func:`normalize_planes_u8` for frames
    whose useful dynamic range is compressed by rare extreme outliers (see
    :func:`choose_upload_precision`): 65,536 levels keep per-ROI
    re-normalization faithful where 256 would band. Unlike the u8 twin the
    device does NOT skip its normalization for u16 uploads (callers pass
    ``normalized=False``) — the on-device per-plane normalize then matches
    the reference's ``to_uint8(raw)`` semantics (utils.py:20-27) up to the
    u16 grid. The f32 rescale is within one level of the exact affine map
    (65535*x overflows the 24-bit f32 mantissa), so u16 inputs keep
    ~65,000 distinguishable levels — against u8's 256.
    """
    x = images.astype(np.float32)
    x -= x.min(axis=(-2, -1), keepdims=True)
    peak = x.max(axis=(-2, -1), keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        x = np.where(peak > 0, 65535.0 * x / peak, x)
    return np.trunc(x).astype(np.uint16)


#: 'auto' (default) picks u8 unless outliers crush the useful range;
#: 'u8'/'u16' force a precision. Read per call (the choice keys new
#: compiled programs via dtype/static flags, so no import-time snapshot is
#: needed for trace consistency).
_UPLOAD_PRECISION_KNOB = "MAGNIFY_TPU_UPLOAD_PRECISION"


def choose_upload_precision(planes: np.ndarray) -> str:
    """Pick the host->device quantization ('u8' or 'u16') for raw planes.

    The minimum-traffic CHIP path ships host-normalized planes instead of
    raw pixels. u8 (1 B/px) is bit-exactly the reference's own global
    quantization (``to_uint8(raw plane)``, find.py:209/466), so it is
    always right for detection — but the chip's per-chamber re-detection
    then re-normalizes CROPS of the shipped planes, where the reference
    re-normalizes crops of RAW data (``to_uint8(roi)``, find.py:342): a
    single saturated speck (a fiducial, a hot pixel cluster) can compress
    every chamber's contrast into a handful of u8 levels and band the
    refinement. The bead path has no raw re-read downstream of the global
    quantize, so it stays u8 unconditionally. Heuristic: escalate to u16
    when the full min-max range exceeds 4x the 0.1%..99.9% range of a
    <= 64k-px subsample — i.e. when the extremes are too rare for the
    subsample to see, which is exactly when u8-of-the-global-range
    starves per-crop contrast. u16 planes ship 2 B/px with
    ``normalized=False``: global detection then device-normalizes (same
    trunc as the reference) while refinement crops keep ~raw contrast.
    Programs recompile once per (shape, dtype).
    ``MAGNIFY_TPU_UPLOAD_PRECISION=u8|u16`` overrides.
    """
    mode = os.environ.get(_UPLOAD_PRECISION_KNOB, "auto")
    if mode in ("u8", "u16"):
        return mode
    if mode != "auto":
        raise ValueError(
            f"{_UPLOAD_PRECISION_KNOB} must be 'auto', 'u8', or 'u16', "
            f"got {mode!r}")
    planes = np.asarray(planes)
    flat = planes.reshape(-1, planes.shape[-2], planes.shape[-1])
    for plane in flat:
        lo = float(plane.min())
        hi = float(plane.max())
        if hi <= lo:
            continue
        stride = max(1, int(np.ceil(np.sqrt(plane.size / 65536.0))))
        sub = plane[::stride, ::stride]
        q_lo, q_hi = np.quantile(sub.astype(np.float32), [0.001, 0.999])
        useful = float(q_hi - q_lo)
        # useful == 0: the subsample saw only background — the signal is
        # too sparse to even estimate its range; take the safe precision.
        if useful <= 0 or (hi - lo) > 4.0 * useful:
            return "u16"
    return "u8"


def find_circles_stack(
    images: np.ndarray,
    low_edge_quantile: float,
    high_edge_quantile: float,
    min_radius: int,
    max_radius: int,
    min_roundness: float,
    min_dist: int,
    nms_cap: int = 4096,
    batch: int = 4,
    pull_cap: int = 511,
) -> list:
    """Dense detection over a stack of planes, sub-batched per dispatch.

    The streaming/4D entry point: (B, H, W) planes run through the vmapped
    dense detector ``batch`` at a time — edge stack, MXU score maps,
    compaction, and per-plane NMS all batched — so per-dispatch overhead
    amortizes across the stack while HBM temporaries stay bounded. Returns a
    list of (circles, scores) per plane. With a multi-device mesh active
    (``mg.parallel.use_mesh``), the whole stack shards over (batch, space)
    instead.
    """
    images = np.ascontiguousarray(images)

    from magnify_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is not None and mesh.size > 1:
        from magnify_tpu.parallel.mesh import sharded_find_circles_batch_packed

        memo_key = ("stack_mesh", images.shape[-2], images.shape[-1],
                    int(min_radius), int(max_radius),
                    tuple(sorted(mesh.shape.items())))
        cap = max(nms_cap, _cap_memo.get(memo_key, nms_cap))
        # Minimum-traffic mesh path, mirroring the single-chip stack path
        # below: host-normalize to uint8 (1 B/px up the link) and pull ONE
        # small packed block per retry round instead of full (B, cap)
        # circle/score/accepted arrays.
        planes_u8 = jax.device_put(normalize_planes_u8(images))
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
                _cap_memo[memo_key] = cap
                break
            cap = _grow_cap(worst, cap)
        results = []
        for b in range(packed.shape[0]):
            n_acc = unpack_count(packed[b, 0, 0])
            rows = packed[b, 1:1 + min(n_acc, pull_cap)]
            if n_acc > pull_cap:
                rows = np.concatenate(
                    [rows, np.asarray(full_d[b, pull_cap:n_acc])]
                )
            results.append((rows[:, :3].astype(np.int32), rows[:, 3].copy()))
        return results

    results = []
    # Host-normalize to uint8 (exact): halves/quarters the bytes crossing
    # the link; the device program skips its own normalization.
    planes_u8 = normalize_planes_u8(images)
    # device_put is asynchronous: queue every chunk's transfer up front so
    # uploads overlap with the previous chunk's compute.
    chunks = [jax.device_put(planes_u8[start:start + batch])
              for start in range(0, images.shape[0], batch)]
    memo_key = ("stack", images.shape[-2], images.shape[-1],
                int(min_radius), int(max_radius))
    # Cap persists across chunks (and runs): an overflow on chunk k should
    # not be rediscovered by chunk k+1 or the next call.
    cap = max(nms_cap, _cap_memo.get(memo_key, nms_cap))
    for chunk in chunks:
        while True:
            packed_d, full_d = _stage_dense_batch_packed(
                chunk, float(low_edge_quantile), float(high_edge_quantile),
                float(min_roundness), min_radius=int(min_radius),
                max_radius=int(max_radius), cap=cap, nms_cap=cap,
                min_dist=int(min_dist), pull_cap=pull_cap, normalized=True,
            )
            packed = np.asarray(packed_d)  # one transfer per chunk
            worst = max(unpack_count(v)
                        for v in np.ascontiguousarray(packed[:, 0, 1]))
            if worst <= cap:
                _cap_memo[memo_key] = cap
                break
            cap = _grow_cap(worst, cap)
        for b in range(packed.shape[0]):
            n_acc = unpack_count(packed[b, 0, 0])
            rows = packed[b, 1:1 + min(n_acc, pull_cap)]
            if n_acc > pull_cap:
                rows = np.concatenate(
                    [rows, np.asarray(full_d[b, pull_cap:n_acc])]
                )
            results.append((rows[:, :3].astype(np.int32), rows[:, 3].copy()))
    return results


@functools.partial(
    jax.jit, static_argnames=("min_radius", "max_radius"),
)
def _detect_rois_dense(rois, low_q, high_q, min_roundness, *, min_radius,
                       max_radius):
    """Dense per-ROI detection: the best (center, radius) by exhaustive
    score-map argmax — the num_iter -> inf limit of the RANSAC chamber
    search, with no sampling and no hill-climb needed.

    The per-ROI edge stacks run under ``jax.vmap``, but the score conv runs
    ONCE natively at N=n_rois (leading-batch :func:`score_maps`) and the
    argmax tail is a plain batched reduction — identical results to the
    fully vmapped per-ROI form (first-max argmax over the same flat
    layout)."""
    rois = rois.astype(jnp.float32)
    n, l, _ = rois.shape
    pad = 2 * max_radius

    def edge_one(roi):
        edges, dx, dy, _grad_angles = edge_pipeline(roi, low_q, high_q)
        dxp, eg, _pad = _pad_for_scoring(dx, edges, max_radius)
        return eg, dxp, jnp.pad(dy, pad)

    eg, dxp, dyp = jax.vmap(edge_one)(rois)
    maps = score_maps(None, eg, min_radius=min_radius,
                      max_radius=max_radius, grads=(dxp, dyp))
    _n, _n_r, hp, wp = maps.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, maps.shape[1:], 1) - pad
    cols = jax.lax.broadcasted_iota(jnp.int32, maps.shape[1:], 2) - pad
    rads = jax.lax.broadcasted_iota(jnp.int32, maps.shape[1:], 0) \
        + min_radius
    ok = (rows + rads >= 0) & (cols + rads >= 0)
    ok &= (rows - rads < l) & (cols - rads < l)
    ok = ok[None] & (maps >= min_roundness)
    flat = jnp.where(ok, maps, -jnp.inf).reshape(n, -1)
    best = jnp.argmax(flat, axis=1)
    r_idx = best // (hp * wp)
    rem = best % (hp * wp)
    circles = jnp.stack([rem // wp - pad, rem % wp - pad,
                         r_idx + min_radius], axis=1).astype(jnp.int32)
    scores = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
    return circles, scores


def detect_best_in_rois(
    rois: np.ndarray,
    low_edge_quantile: float,
    high_edge_quantile: float,
    grid_length: int,
    num_iter: int,
    min_radius: int,
    max_radius: int,
    min_roundness: float,
    seed: int = 0,
    unique_cap: int = 4096,
    detector: str = "auto",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Best circle per ROI for a batch of same-size ROIs.

    Batched equivalent of the reference's per-chamber re-detection loop
    (find.py:324-360, min_dist=0 and argmax over scores). Returns
    (circles (N, 3) int32, scores (N,), found (N,) bool).
    """
    if not isinstance(rois, jax.Array):
        rois = jnp.asarray(np.ascontiguousarray(rois))
    n = rois.shape[0]
    if resolve_detector(detector) == "dense":
        circles, scores = _detect_rois_dense(
            rois, float(low_edge_quantile), float(high_edge_quantile),
            float(min_roundness), min_radius=int(min_radius),
            max_radius=int(max_radius),
        )
    else:
        keys = jax.random.split(jax.random.PRNGKey(seed), n)
        num_iter = max(int(num_iter), 1)
        circles, scores = _detect_rois(
            rois, float(low_edge_quantile), float(high_edge_quantile),
            float(min_roundness), keys,
            grid_length=int(grid_length), num_iter=num_iter,
            min_radius=int(min_radius), max_radius=int(max_radius),
            unique_cap=int(min(unique_cap, num_iter)),
            use_conv=_use_conv_scorer(),
        )
    circles = np.asarray(circles)
    scores = np.asarray(scores)
    return circles, scores, np.isfinite(scores)
