"""Batched RANSAC circle proposal on device.

The reference's hottest loop is a numba ``prange`` over ``num_iter`` (default
5e6) iterations, each sampling one random edge pixel plus two neighbors from
its grid cell and emitting their circumcircle
(/root/reference/src/magnify/utils.py:295-344). Data-dependent sampling from
a ragged grid index doesn't map to TPUs, so this kernel re-derives the same
sampling *distribution* with fixed shapes:

* global edge sampling: one row-gather from a cell-major CSR coordinate
  table (edge pixels compacted at the front by a static-permutation cumsum
  scatter),
* per-cell neighbor sampling: CSR starts/counts interleaved into one
  row-gathered LUT, in-cell offsets by f32 multiply (the grid_array
  equivalent, utils.py:347-377),
* circumcircle centers via the same perpendicular-bisector algebra.

All num_iter-sized table lookups go through :func:`_gather_rows` — XLA's
flat 1-D gather lowering is per-element bound on v5e and 3x slower.

The RNG is counter-based ``jax.random`` so results are reproducible for a
given key, unlike the reference's global numpy RNG.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["candidate_circles"]


def _gather_rows(table, idx):
    """Exact ``table[idx]`` via a 128-lane row gather + one-hot select.

    XLA's flat 1-D dynamic gather is per-element bound on v5e (~33 ms per
    5e6 int32 elements, independent of table size or index order); fetching
    whole (8, 128)-tile rows by ``idx // 128`` and selecting the lane with
    an iota-compare mask measures 11 ms — the win holds for row widths
    8..128 and inverts past 256 (scripts/gather_experiments.py).

    ``table`` must be 1-D with length a multiple of 128; all ``idx`` must
    be in range (callers guarantee both).

    Backend-routed: the CPU backend has real random access — its native
    flat gather is cache-speed while the row trick inflates traffic 128x
    ((5e6, 128) intermediates = GBs per lookup; measured ~15x on the
    whole anchor frame, 1.9 -> 29 s, before this guard). Same values
    gathered either way, so results are bit-identical across backends.
    """
    if jax.default_backend() == "cpu":
        return table[idx]
    rows = table.reshape(-1, 128)[idx >> 7]
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    return jnp.sum(jnp.where(lane == (idx & 127)[:, None], rows, 0), axis=1)


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


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

    Returns ((rows, cols, radii), any_edges): three (num_iter,) float32
    vectors — NOT a stacked (num_iter, 3) array, whose 3-wide minor dim
    forces an awkward padded layout between this stage and the dedupe
    (an in-frame relayout measured ~110 ms at 5e6 iters on v5e; the
    vectors fuse straight into the dedupe's key arithmetic). ``any_edges``
    is a scalar bool that is False when the image has no edge pixels
    (callers must then treat all rows as invalid, mirroring the
    empty-coords early-out at utils.py:300-301).
    """
    return _candidate_circles_impl(edges, grid_length, num_iter, key,
                                   jnp.int32(0), num_iter)


def _candidate_circles_impl(edges, grid_length: int, num_iter: int, key,
                            start, count: int):
    """Core of :func:`candidate_circles`, computing only iterations
    ``start .. start + count`` of the ``num_iter``-long counter-based
    stream.

    The random streams are always generated at the FULL ``num_iter`` shape
    and then dynamically sliced, so the candidates a slice produces are
    byte-identical to the corresponding rows of the full run — that is
    what lets a device mesh split the Monte-Carlo iterations across chips
    (each chip takes a disjoint slice) while the union of proposals stays
    exactly the single-chip proposal set
    (:func:`magnify_tpu.parallel.mesh.sharded_ransac_find_circles`).
    Stream generation is cheap (counter-based threefry, ~0.4 ms at 5e6);
    the expensive parts — the row gathers and circumcircle algebra — run
    at the ``count`` shape only.
    """
    h, w = edges.shape
    flat = edges.reshape(-1).astype(jnp.int32)
    total = flat.sum()
    any_edges = total > 0

    n_grid_cols = -(-w // grid_length)

    # CSR over edge pixels grouped by cell, with no runtime sort: permute the
    # edge mask into static cell-major order, then a single cumsum yields each
    # edge pixel's slot in the flat coordinate list. The table is padded to a
    # multiple of 128 for the row-gather sampler below.
    perm = jnp.asarray(_cell_major_perm(h, w, grid_length))
    e_cm = flat[perm]
    slot = jnp.cumsum(e_cm) - 1
    order_len = _pad128(h * w)
    order = jnp.zeros((order_len,), jnp.int32).at[
        jnp.where(e_cm > 0, slot, order_len)
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
    # Interleave (start, count) per cell so ONE row gather serves both
    # lookups: lane 2*c holds starts[c], lane 2*c+1 holds counts[c] (2*c is
    # even, so the pair never straddles a 128-lane row boundary).
    n_cells = counts_flat.shape[0]
    sc = jnp.zeros((_pad128(2 * n_cells),), jnp.int32)
    sc = sc.at[0 : 2 * n_cells : 2].set(starts)
    sc = sc.at[1 : 2 * n_cells : 2].set(counts_flat)

    # Uniform edge-pixel sampling: the CSR ``order`` array already holds all
    # edge pixels compacted at the front, so one gather replaces a binary
    # search over a cumsum (20x fewer random reads per sample).
    k0, k1, k2 = jax.random.split(key, 3)
    start = jnp.asarray(start, jnp.int32)
    u0 = jax.lax.dynamic_slice(
        jax.random.randint(k0, (num_iter,), 0, jnp.maximum(total, 1)),
        (start,), (count,))
    p0_flat = _gather_rows(order, u0)
    p0r = p0_flat // w
    p0c = p0_flat % w

    # Cell id from the sampled coordinates directly — arithmetic instead of
    # another num_iter-sized random gather from a cell-id raster.
    c0 = (p0r // grid_length) * n_grid_cols + p0c // grid_length
    if jax.default_backend() == "cpu":
        # Native random access beats the row trick off-TPU (see
        # _gather_rows): two cache-speed flat gathers, same values.
        c_starts = sc[2 * c0]
        c_counts = sc[2 * c0 + 1]
    else:
        sc_rows = sc.reshape(-1, 128)[c0 >> 6]  # row with lanes 2c, 2c+1
        lane = jax.lax.broadcasted_iota(jnp.int32, sc_rows.shape, 1)
        lane0 = ((c0 & 63) << 1)[:, None]
        c_starts = jnp.sum(jnp.where(lane == lane0, sc_rows, 0), axis=1)
        c_counts = jnp.sum(jnp.where(lane == lane0 + 1, sc_rows, 0), axis=1)

    # In-cell offsets by float multiply instead of `u % count`: an integer
    # mod with a VECTOR divisor costs ~17 ms per 5e6 elements on v5e (no
    # integer-divide unit; scalar/constant divisors strength-reduce and stay
    # cheap). counts <= grid_length^2, so the f32 sampler's bias is
    # < grid_length^2 / 2^24 (~2e-5 at the default grid) — the reference's
    # own modulo sampling is similarly biased at the last count.
    cf = c_counts.astype(jnp.float32)
    u1 = jax.lax.dynamic_slice(
        jax.random.uniform(k1, (num_iter,), jnp.float32), (start,), (count,))
    u2 = jax.lax.dynamic_slice(
        jax.random.uniform(k2, (num_iter,), jnp.float32), (start,), (count,))
    off1 = jnp.minimum((u1 * cf).astype(jnp.int32), c_counts - 1)
    off2 = jnp.minimum((u2 * cf).astype(jnp.int32), c_counts - 1)
    p1_flat = _gather_rows(order, c_starts + off1)
    p2_flat = _gather_rows(order, c_starts + off2)

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
    return (row + p0r.astype(jnp.float32), col + p0c.astype(jnp.float32),
            radius), any_edges
