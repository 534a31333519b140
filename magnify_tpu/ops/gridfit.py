"""Device-side chip-grid geometry: 1-D clustering, per-cluster regression,
and grid-line intersection.

Device twins of the host geometry in
:mod:`magnify_tpu.components.find` (reference semantics at
/root/reference/src/magnify/find.py:632-748): the exhaustive 1-D
grid-offset sweep (``cluster_1d``), fixed-geometry interval labeling
(``label_clusters``), and the robust per-cluster line fits
(``regress_clusters``). Having these on device lets the entire chip
timestep — multi-channel detection, clustering, regression, grid
intersection, and per-chamber refinement — run as ONE jitted dispatch with
a single small pull, instead of detection and refinement round-tripping
through host geometry.

Numerical notes: everything is float32 (TPU-native). The offset sweep
evaluates per-cluster squared deviations *directly* against each candidate
grid's cluster centers — deviations are bounded by the cluster length, so
the f32 sums are well-conditioned, unlike a prefix-sum-of-squares
formulation whose cancellation error grows with image size. Regression
slopes likewise use mean-centered second moments. Host/f64 vs device/f32
results agree to ~1e-4 of a pixel on realistic inputs (pinned by
tests/test_gridfit.py); exact label flips can only occur when a detected
integer point sits within f32 rounding of a cluster edge.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

__all__ = [
    "cluster_1d_dev",
    "label_clusters_dev",
    "regress_clusters_dev",
]


def num_offsets(total_length: int, num_clusters: int,
                cluster_length: float) -> int:
    """The sweep width of the 1-D offset search (host cluster_1d's
    ``n_offsets``); callers validate it is positive before tracing."""
    return int(total_length - round(num_clusters * cluster_length))


def _masked_linregress(x, y, mask):
    """Least squares over masked points; (nan, mean(y)) when degenerate —
    the host ``_linregress`` contract."""
    w = mask.astype(jnp.float32)
    m = w.sum()
    safe = jnp.maximum(m, 1.0)
    xm = (w * x).sum() / safe
    ym = (w * y).sum() / safe
    dx = jnp.where(mask, x - xm, 0.0)
    dy = jnp.where(mask, y - ym, 0.0)
    denom = (dx * dx).sum()
    slope = jnp.where(denom != 0.0,
                      (dx * dy).sum() / jnp.where(denom == 0.0, 1.0, denom),
                      jnp.nan)
    intercept = jnp.where(denom != 0.0, ym - slope * xm, ym)
    # Zero live points: the host's mean-of-empty is NaN, not 0.
    intercept = jnp.where(m > 0, intercept, jnp.nan)
    return slope, intercept


def _nanmedian_small(v):
    """nanmedian of a small 1-D vector (sort once; NaNs sort to the top)."""
    key = jnp.where(jnp.isnan(v), jnp.inf, v)
    s = jnp.sort(key)
    m = (~jnp.isnan(v)).sum()
    lo = s[jnp.maximum((m - 1) // 2, 0)]
    hi = s[jnp.maximum(m // 2, 0)]
    return jnp.where(m > 0, 0.5 * (lo + hi), jnp.nan)


def cluster_1d_dev(points, valid, *, total_length: int, num_clusters: int,
                   cluster_length: float, ideal_num_points, penalty,
                   offset_chunk: int = 128):
    """Exhaustive 1-D grid-offset sweep on device (host ``cluster_1d``).

    Same cost model as the reference (find.py:632-677): per-cluster point
    variance scaled by sqrt(ideal count) plus a quadratic count-mismatch
    penalty; empty clusters cost the per-offset maximum; points outside the
    winning grid label -1. ``points`` is a fixed-capacity buffer with
    ``valid`` marking live entries. The O(offsets x clusters x points)
    evaluation runs in offset chunks to bound memory.
    """
    n_off = num_offsets(total_length, num_clusters, cluster_length)
    c = num_clusters
    cl = jnp.float32(cluster_length)
    pts = jnp.where(valid, points.astype(jnp.float32), jnp.inf)
    ideal = jnp.asarray(ideal_num_points, jnp.float32)
    sqrt_ideal = jnp.sqrt(ideal)
    penalty = jnp.asarray(penalty, jnp.float32)

    edge_idx = jnp.arange(c + 1, dtype=jnp.float32) * cl  # (C+1,)

    n_chunks = max(1, math.ceil(n_off / offset_chunk))
    padded = n_chunks * offset_chunk
    offs = jnp.arange(padded, dtype=jnp.float32)

    def chunk_cost(off_k):  # (K,) -> (K,)
        edges = off_k[:, None] + edge_idx[None, :]         # (K, C+1)
        lo = edges[:, :-1][..., None]                      # (K, C, 1)
        hi = edges[:, 1:][..., None]
        p = pts[None, None, :]
        inside = (p >= lo) & (p < hi)                      # (K, C, N)
        counts = inside.sum(-1).astype(jnp.float32)        # (K, C)
        centers = 0.5 * (edges[:, 1:] + edges[:, :-1])     # (K, C)
        dev = jnp.where(inside, p - centers[..., None], 0.0)
        sq_dev = (dev * dev).sum(-1)
        var = jnp.where(counts > 0, sq_dev / jnp.maximum(counts, 1.0), 0.0)
        row_max = var.max(axis=1, keepdims=True)
        var = jnp.where(counts == 0, row_max, var)
        cost = var * sqrt_ideal[None, :] + penalty * (ideal[None, :]
                                                      - counts) ** 2
        return cost.sum(axis=1)

    costs = jax.lax.map(chunk_cost,
                        offs.reshape(n_chunks, offset_chunk)).reshape(-1)
    costs = jnp.where(jnp.arange(padded) < n_off, costs, jnp.inf)
    best = jnp.argmin(costs)

    best_edges = best.astype(jnp.float32) + edge_idx       # (C+1,)
    k = (pts[:, None] >= best_edges[None, :]).sum(1) - 1   # (N,)
    labels = jnp.where(valid & (k >= 0) & (k < c), k, -1)
    return labels.astype(jnp.int32)


def label_clusters_dev(points, valid, *, offset, num_clusters: int,
                       cluster_length, cluster_gap):
    """Fixed-geometry interval labeling on device (host ``label_clusters``):
    cluster ``i`` spans [offset + i*(length+gap), ... + length)."""
    pts = points.astype(jnp.float32)
    pitch = jnp.float32(cluster_length) + jnp.float32(cluster_gap)
    starts = (jnp.float32(offset)
              + jnp.arange(num_clusters, dtype=jnp.float32) * pitch)
    slot = (pts[:, None] >= starts[None, :]).sum(1) - 1
    clipped = jnp.clip(slot, 0, num_clusters - 1)
    inside = ((slot >= 0) & (pts < starts[clipped] + cluster_length)
              & valid)
    return jnp.where(inside, clipped, -1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_clusters",))
def regress_clusters_dev(x, y, labels, *, num_clusters: int,
                         ideal_num_points):
    """Robust per-cluster line fits on device (host ``regress_clusters``,
    reference find.py:698-748): median of per-cluster least-squares slopes,
    per-cluster median intercepts under the shared slope, then a weighted
    blend with the global evenly-spaced-intercept lattice. ``labels`` < 0
    marks outliers. Returns (slope, intercepts (C,), counts (C,) f32)."""
    cnum = num_clusters
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    ideal = jnp.asarray(ideal_num_points, jnp.float32)
    live = labels >= 0

    if cnum == 1:
        m = live.sum()
        slope, b = _masked_linregress(x, y, live)
        single = (jnp.where(live, y, 0.0)).sum()
        slope = jnp.where(m == 1, 0.0, slope)
        b = jnp.where(m == 1, single, b)
        return slope, b[None], m.astype(jnp.float32)[None]

    onehot = (labels[:, None] == jnp.arange(cnum)[None, :]) & live[:, None]
    w = onehot.astype(jnp.float32)                         # (N, C)
    n = w.sum(0)                                           # (C,)
    safe_n = jnp.maximum(n, 1.0)
    xm = (w * x[:, None]).sum(0) / safe_n
    ym = (w * y[:, None]).sum(0) / safe_n
    dx = jnp.where(onehot, x[:, None] - xm[None, :], 0.0)
    dy = jnp.where(onehot, y[:, None] - ym[None, :], 0.0)
    sxx = (dx * dx).sum(0)
    sxy = (dx * dy).sum(0)
    slopes = jnp.where((n >= 2) & (sxx != 0.0),
                       sxy / jnp.where(sxx == 0.0, 1.0, sxx), jnp.nan)
    slope = _nanmedian_small(slopes)
    # Every cluster has <= 1 point (Nx1 / 1xN grids): no slope is
    # estimable — treat the grid lines as axis-aligned (host twin does the
    # same; the reference propagates NaN and fails downstream).
    slope = jnp.where(jnp.isnan(slope), 0.0, slope)

    residuals = y - slope * x
    res = jnp.where(onehot.T, residuals[None, :], jnp.inf)  # (C, N)
    res = jnp.sort(res, axis=1)
    m_i = n.astype(jnp.int32)
    lo_i = jnp.maximum((m_i - 1) // 2, 0)
    hi_i = jnp.maximum(m_i // 2, 0)
    med = 0.5 * (jnp.take_along_axis(res, lo_i[:, None], 1)[:, 0]
                 + jnp.take_along_axis(res, hi_i[:, None], 1)[:, 0])
    observed = n > 0

    idx = jnp.arange(cnum, dtype=jnp.float32)
    lat_m, lat_b = _masked_linregress(idx, jnp.where(observed, med, 0.0),
                                      observed)
    lattice = lat_m * idx + lat_b
    weight = jnp.minimum(n, ideal) / jnp.where(ideal == 0.0, 1.0, ideal)
    use_local = observed & (ideal != 0.0)
    blended = jnp.where(use_local,
                        weight * jnp.where(observed, med, 0.0)
                        + (1.0 - weight) * lattice,
                        lattice)
    return slope, blended, n
