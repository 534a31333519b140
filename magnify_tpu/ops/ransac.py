"""Batched RANSAC circle proposal on device.

The reference's hottest loop is a numba ``prange`` over ``num_iter`` (default
5e6) iterations, each sampling one random edge pixel plus two neighbors from
its grid cell and emitting their circumcircle
(/root/reference/src/magnify/utils.py:295-344). Data-dependent sampling from
a ragged grid index doesn't map to TPUs, so this kernel re-derives the same
sampling *distribution* with fixed shapes:

* global edge sampling: inclusive cumsum over the edge mask + vectorized
  ``searchsorted`` (one binary search per iteration),
* per-cell neighbor sampling: a CSR view built by a single stable argsort of
  per-pixel cell ids (the grid_array equivalent, utils.py:347-377),
* circumcircle centers via the same perpendicular-bisector algebra.

The RNG is counter-based ``jax.random`` so results are reproducible for a
given key, unlike the reference's global numpy RNG.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["candidate_circles"]


@functools.lru_cache(maxsize=None)
def _cell_major_perm(h: int, w: int, grid_length: int) -> np.ndarray:
    """Static permutation mapping cell-major traversal -> row-major pixel ids.

    The grid geometry is static per image shape, so the grouping of pixels by
    grid cell is a compile-time constant — this removes the runtime argsort a
    dynamic CSR build would need.
    """
    rows, cols = np.mgrid[0:h, 0:w]
    n_grid_cols = -(-w // grid_length)
    cell = (rows // grid_length) * n_grid_cols + cols // grid_length
    return np.argsort(cell.reshape(-1), kind="stable").astype(np.int32)


@functools.partial(jax.jit, static_argnames=("grid_length", "num_iter"))
def candidate_circles(edges, grid_length: int, num_iter: int, key):
    """Propose ``num_iter`` candidate circles from an edge mask.

    Returns (circles, any_edges): circles is (num_iter, 3) float32 rows of
    (row, col, radius); any_edges is a scalar bool that is False when the
    image has no edge pixels (callers must then treat all rows as invalid,
    mirroring the empty-coords early-out at utils.py:300-301).
    """
    h, w = edges.shape
    flat = edges.reshape(-1).astype(jnp.int32)
    total = flat.sum()
    any_edges = total > 0

    n_grid_cols = -(-w // grid_length)

    # CSR over edge pixels grouped by cell, with no runtime sort: permute the
    # edge mask into static cell-major order, then a single cumsum yields each
    # edge pixel's slot in the flat coordinate list.
    perm = jnp.asarray(_cell_major_perm(h, w, grid_length))
    e_cm = flat[perm]
    slot = jnp.cumsum(e_cm) - 1
    order = jnp.zeros((h * w,), jnp.int32).at[
        jnp.where(e_cm > 0, slot, h * w)
    ].set(perm, mode="drop")

    # Per-cell counts via block reduction (grid_array equivalent).
    gh = -(-h // grid_length) * grid_length
    gw = -(-w // grid_length) * grid_length
    padded = jnp.pad(flat.reshape(h, w), ((0, gh - h), (0, gw - w)))
    counts = padded.reshape(gh // grid_length, grid_length,
                            gw // grid_length, grid_length).sum((1, 3))
    counts_flat = counts.reshape(-1)
    starts = jnp.concatenate(
        [jnp.zeros((1,), counts_flat.dtype), jnp.cumsum(counts_flat)[:-1]]
    )
    counts_flat = jnp.maximum(counts_flat, 1)

    # Uniform edge-pixel sampling: the CSR ``order`` array already holds all
    # edge pixels compacted at the front, so one gather replaces a binary
    # search over a cumsum (20x fewer random reads per sample).
    k0, k1, k2 = jax.random.split(key, 3)
    u0 = jax.random.randint(k0, (num_iter,), 0, jnp.maximum(total, 1))
    p0_flat = order[u0]
    p0r = p0_flat // w
    p0c = p0_flat % w

    # Cell id from the sampled coordinates directly — arithmetic instead of
    # another num_iter-sized random gather from a cell-id raster.
    c0 = (p0r // grid_length) * n_grid_cols + p0c // grid_length
    u1 = jax.random.randint(k1, (num_iter,), 0, jnp.iinfo(jnp.int32).max)
    u2 = jax.random.randint(k2, (num_iter,), 0, jnp.iinfo(jnp.int32).max)
    j1 = starts[c0] + u1 % counts_flat[c0]
    j2 = starts[c0] + u2 % counts_flat[c0]
    p1_flat = order[j1]
    p2_flat = order[j2]

    # Center the coordinate frame on p0 (float32 algebra mirrors
    # utils.py:323-342, eps guards vertical bisectors and parallel pairs).
    eps = jnp.float32(1e-20)
    p1r = (p1_flat // w - p0r).astype(jnp.float32)
    p1c = (p1_flat % w - p0c).astype(jnp.float32)
    p2r = (p2_flat // w - p0r).astype(jnp.float32)
    p2c = (p2_flat % w - p0c).astype(jnp.float32)

    m1 = -p1c / (p1r + eps)
    m2 = -p2c / (p2r + eps)
    b1 = jnp.float32(0.5) * p1r - m1 * (jnp.float32(0.5) * p1c)
    b2 = jnp.float32(0.5) * p2r - m2 * (jnp.float32(0.5) * p2c)
    col = (b1 - b2) / (m2 - m1 + eps)
    row = m1 * col + b1
    radius = jnp.sqrt(row * row + col * col)
    circles = jnp.stack(
        [row + p0r.astype(jnp.float32), col + p0c.astype(jnp.float32), radius],
        axis=1,
    )
    return circles, any_edges
