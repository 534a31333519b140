"""Greedy neighbor suppression with the reference's claimed-raster semantics.

The reference paints each accepted circle's exclusion perimeter (a
4-connected Bresenham ring of radius ``min_dist``) into a raster and rejects
any lower-scoring circle whose own ring touches a painted pixel
(/root/reference/src/magnify/utils.py:254-292). The accept/reject set is
order-dependent, so this implementation keeps the sequential structure as a
``lax.scan`` over score-sorted circles whose carry is the claim raster —
each step is a tiny gather + conditional scatter that stays on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from magnify_tpu import utils

__all__ = ["claimed_raster_nms", "parallel_greedy_nms"]


# Above this many circles the (n, n) pairwise conflict matrix costs more
# HBM than the raster rounds; below it, the matrix formulation wins big on
# TPU (masked reductions instead of full-raster scatters per round). On
# CPU the raster rounds win (scatters are cheap, (n, n) passes are not),
# so pairwise is TPU-only unless MAGNIFY_TPU_NMS forces it.
PAIRWISE_NMS_LIMIT = 8192


def _use_pairwise(n: int) -> bool:
    import os

    mode = os.environ.get("MAGNIFY_TPU_NMS", "auto")
    if mode == "pairwise":
        return True
    if mode == "raster":
        return False
    return n <= PAIRWISE_NMS_LIMIT and jax.default_backend() == "tpu"


def parallel_greedy_nms(circles, valid, *, min_dist: int, height: int,
                        width: int, max_radius: int):
    """Exact greedy suppression computed in parallel rounds.

    Produces the same accepted set as :func:`claimed_raster_nms` (circles
    sorted best first, conflict = exclusion rings sharing a pixel) but runs
    in O(conflict-chain depth) parallel rounds instead of one sequential
    scan step per circle. Small batches use the pairwise conflict-matrix
    rounds (:func:`_pairwise_greedy_nms`); larger ones the raster rounds.

    This thin host wrapper resolves the formulation (MAGNIFY_TPU_NMS /
    backend heuristic) OUTSIDE the jit boundary and passes it as a static
    argument, so changing the env var after a shape has been traced picks
    the new mode instead of silently reusing the baked one. (Calls from
    inside an enclosing jitted program still bake the mode into that
    caller's cache — inherent to tracing.)
    """
    if min_dist <= 0:
        return valid
    return _parallel_greedy_nms(
        circles, valid, min_dist=min_dist, height=height, width=width,
        max_radius=max_radius, pairwise=_use_pairwise(circles.shape[0]),
    )


@functools.lru_cache(maxsize=None)
def _conflict_extents(min_dist: int) -> np.ndarray:
    """EXT[a] = max |dcol| at which two radius-``min_dist`` exclusion rings
    whose centers differ by (a, dcol) share a pixel; -1 when no dcol does.

    Exact: the conflicting offsets are the correlation support
    ring (+) (-ring), enumerated from all L^2 ring-pixel pairs. Each |drow|
    row of that support is a contiguous, symmetric |dcol| interval
    (asserted), so the whole relation compresses to one extent per row —
    the same trick as the disk-extent LUT in ops.geom.
    """
    ring = utils.circle_points(min_dist, four_connected=True)
    d = min_dist
    off = 2 * d
    diff = ring[:, None, :] - ring[None, :, :]
    lut = np.zeros((4 * d + 1, 4 * d + 1), bool)
    lut[diff[..., 0] + off, diff[..., 1] + off] = True
    ext = np.full(2 * d + 1, -1, np.int32)
    for a in range(2 * d + 1):
        xs = np.flatnonzero(lut[off + a])
        if len(xs):
            # The extent compression is only valid when each |drow| row of
            # the conflict support is a symmetric contiguous interval. Real
            # Bresenham rings satisfy this; raise (not assert, which
            # vanishes under -O) so a violating future ring shape fails
            # loudly instead of producing a wrong conflict matrix.
            if xs[0] + xs[-1] != 2 * off:
                raise ValueError(
                    f"asymmetric NMS conflict row {a} (min_dist={d})")
            if not np.all(np.diff(xs) == 1):
                raise ValueError(
                    f"non-convex NMS conflict row {a} (min_dist={d})")
            ext[a] = xs[-1] - off
    return ext


def _pairwise_greedy_nms(circles, valid, *, min_dist: int):
    """Greedy rounds over an exact pairwise conflict matrix.

    conflict[i, j] == rings of i and j share a pixel — computed from the
    center offset via the extent LUT, so each round is two masked (n, n)
    reductions (VPU-friendly) instead of the raster version's full-image
    scatters.
    """
    n = circles.shape[0]
    ext = _conflict_extents(min_dist)
    drow = jnp.abs(circles[:, 0, None] - circles[None, :, 0])
    dcol = jnp.abs(circles[:, 1, None] - circles[None, :, 1])
    # Gather-free LUT lookup: an unrolled masked sum over the <= 2d+1
    # table entries fuses into pure VPU compares/adds — (n, n) gathers from
    # the table are ~100x slower on TPU.
    acc = jnp.zeros(drow.shape, jnp.int32)
    for a in range(2 * min_dist + 1):
        acc = acc + jnp.where(drow == a, jnp.int32(int(ext[a]) + 1), 0)
    conflict = dcol < acc  # dcol <= ext[drow]; drow out of range -> False
    pri = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(np.iinfo(np.int32).max)

    def cond(state):
        live, accepted, progressed = state
        return jnp.any(live) & progressed

    def body(state):
        live, accepted, _ = state
        best = jnp.min(
            jnp.where(conflict & live[None, :], pri[None, :], big), axis=1
        )
        newly = live & (best == pri)
        accepted = accepted | newly
        conflicted = jnp.any(conflict & accepted[None, :], axis=1)
        live = live & ~newly & ~conflicted
        return live, accepted, jnp.any(newly)

    _, accepted, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.asarray(True))
    )
    return accepted


@functools.partial(
    jax.jit, static_argnames=("min_dist", "height", "width", "max_radius",
                              "pairwise")
)
def _parallel_greedy_nms(circles, valid, *, min_dist: int, height: int,
                         width: int, max_radius: int, pairwise: bool):
    """Jitted NMS body; ``pairwise`` picks the formulation. Raster rounds:

    * scatter-min every live circle's priority onto its ring pixels,
    * accept circles whose ring sees no better live priority (their greedy
      fate cannot depend on undecided circles),
    * reject live circles whose ring touches an accepted ring.
    """
    if pairwise:
        return _pairwise_greedy_nms(circles, valid, min_dist=min_dist)
    n = circles.shape[0]
    ring = jnp.asarray(utils.circle_points(min_dist, four_connected=True))
    shift = max_radius + min_dist + 1
    rh = height + 2 * shift
    rw = width + 2 * shift
    big = jnp.int32(np.iinfo(np.int32).max)

    idx = (ring[None, :, 0] + circles[:, None, 0] + shift) * rw + (
        ring[None, :, 1] + circles[:, None, 1] + shift
    )
    idx = jnp.clip(idx, 0, rh * rw - 1)  # (n, L)
    priority = jnp.arange(n, dtype=jnp.int32)

    def cond(state):
        live, accepted, progressed = state
        return jnp.any(live) & progressed

    def body(state):
        live, accepted, _ = state
        pri_raster = jnp.full((rh * rw,), big, jnp.int32)
        scatter_idx = jnp.where(live[:, None], idx, rh * rw)
        pri_raster = pri_raster.at[scatter_idx].min(
            jnp.broadcast_to(priority[:, None], idx.shape), mode="drop"
        )
        ring_best = pri_raster[idx].min(axis=1)
        newly = live & (ring_best == priority)
        acc_raster = jnp.zeros((rh * rw,), bool).at[
            jnp.where((accepted | newly)[:, None], idx, rh * rw)
        ].max(True, mode="drop")
        conflicted = acc_raster[idx].max(axis=1)
        accepted = accepted | newly
        live = live & ~newly & ~conflicted
        return live, accepted, jnp.any(newly)

    live0 = valid
    accepted0 = jnp.zeros_like(valid)
    _, accepted, _ = jax.lax.while_loop(
        cond, body, (live0, accepted0, jnp.asarray(True))
    )
    return accepted


@functools.partial(
    jax.jit, static_argnames=("min_dist", "height", "width", "max_radius")
)
def claimed_raster_nms(circles, valid, *, min_dist: int, height: int, width: int,
                       max_radius: int):
    """Suppress circles whose exclusion rings touch earlier accepted rings.

    ``circles`` is (S, 3) int32 (row, col, radius) sorted best-score first;
    ``valid`` masks live rows. Returns the accepted mask.
    """
    if min_dist <= 0:
        return valid

    ring = jnp.asarray(utils.circle_points(min_dist, four_connected=True))
    # Accepted-circle centers lie in [-max_radius, dim + max_radius); the ring
    # extends another min_dist. Shift everything into the raster.
    shift = max_radius + min_dist + 1
    rh = height + 2 * shift
    rw = width + 2 * shift

    rows0 = circles[:, 0] + shift
    cols0 = circles[:, 1] + shift

    def step(claim, inputs):
        row, col, ok = inputs
        idx = (ring[:, 0] + row) * rw + (ring[:, 1] + col)
        idx = jnp.clip(idx, 0, rh * rw - 1)
        taken = jnp.any(claim[idx])
        accept = ok & ~taken
        claim = claim.at[idx].max(accept)
        return claim, accept

    claim0 = jnp.zeros((rh * rw,), dtype=bool)
    _, accepted = jax.lax.scan(step, claim0, (rows0, cols0, valid))
    return accepted
