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

__all__ = ["claimed_raster_nms"]


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
