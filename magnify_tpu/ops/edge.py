"""Fused edge-detection stack: normalize -> blur -> Scharr -> Canny.

Device replacement for the OpenCV calls in the reference's circle finder
(/root/reference/src/magnify/utils.py:115-142): 5x5 Gaussian blur, Scharr
gradients, gradient-magnitude quantile thresholds, and Canny with L2 norm.
Everything is expressed as XLA-fusable stencils; hysteresis runs as an
iterated 3x3 dilation inside ``lax.while_loop`` until fixpoint, which XLA
keeps entirely on device.

Numerics track OpenCV: the blur rounds to uint8, Scharr runs on the rounded
blur, Canny quantizes gradients to int16 (trunc) and compares squared
magnitudes against squared thresholds with the same tg(22.5)/tg(67.5)
fixed-point sector tests.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# Snapshot of MAGNIFY_TPU_PALLAS (see the hysteresis routing note below).
_PALLAS_ENV = os.environ.get("MAGNIFY_TPU_PALLAS", "1")

__all__ = [
    "canny",
    "edge_pipeline",
    "gaussian_blur5_u8",
    "histogram_quantile",
    "histogram_quantiles",
    "normalize_to_u8",
    "scharr",
]

# OpenCV's fixed 5-tap Gaussian for ksize=5, sigma=0: [1, 4, 6, 4, 1] / 16.
_GAUSS5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0
_TG22 = 13573  # tan(22.5 deg) in Q15, as used by OpenCV's Canny.


def normalize_to_u8(img):
    """Min-max normalize to [0, 255] with trunc cast (utils.to_uint8 on device)."""
    img = img.astype(jnp.float32)
    img = img - jnp.min(img)
    peak = jnp.max(img)
    img = jnp.where(peak > 0, 255.0 * img / peak, img)
    return jnp.trunc(img).astype(jnp.float32)


def _reflect101_pad(img, pad_h, pad_w):
    return jnp.pad(img, ((pad_h, pad_h), (pad_w, pad_w)), mode="reflect")


def _sepconv(img, krow, kcol):
    """Separable 2-D correlation with BORDER_REFLECT_101 semantics."""
    ph, pw = len(krow) // 2, len(kcol) // 2
    x = _reflect101_pad(img, ph, pw)
    # Convolve along rows then columns via shifted adds (kernels are tiny).
    h, w = img.shape
    out = jnp.zeros((h, w + 2 * pw), dtype=jnp.float32)
    for i, kv in enumerate(krow):
        if kv != 0.0:
            out = out + kv * x[i : i + h, :]
    out2 = jnp.zeros((h, w), dtype=jnp.float32)
    for j, kv in enumerate(kcol):
        if kv != 0.0:
            out2 = out2 + kv * out[:, j : j + w]
    return out2


def gaussian_blur5_u8(img_u8):
    """5x5 Gaussian blur on uint8-valued data, rounded back to uint8 range."""
    blurred = _sepconv(img_u8.astype(jnp.float32), _GAUSS5, _GAUSS5)
    return jnp.round(blurred)


def scharr(img):
    """Scharr dx, dy (float32), matching cv.Scharr's kernels and borders."""
    smooth = np.array([3.0, 10.0, 3.0], dtype=np.float32)
    deriv = np.array([-1.0, 0.0, 1.0], dtype=np.float32)
    dx = _sepconv(img, smooth, deriv)
    dy = _sepconv(img, deriv, smooth)
    return dx, dy


def canny_nms(dx, dy, low_thresh, high_thresh):
    """Sector non-max-suppression + double threshold; returns (strong, weak).

    OpenCV's fixed-point sector tests on int16-quantized gradients with L2
    squared magnitudes. Exposed separately so the sharded pipeline can apply
    it on halo-padded shards (magnify_tpu.parallel.mesh).
    """
    # int16 truncation, as the reference applies before Canny.
    xs = jnp.clip(jnp.trunc(dx), -32768, 32767).astype(jnp.int32)
    ys = jnp.clip(jnp.trunc(dy), -32768, 32767).astype(jnp.int32)
    mag = xs * xs + ys * ys  # L2 squared, exact in int32 for Scharr range
    low2 = jnp.asarray(low_thresh, jnp.float32) ** 2
    high2 = jnp.asarray(high_thresh, jnp.float32) ** 2
    magf = mag.astype(jnp.float32)

    # Neighbor magnitudes with a zero border.
    mp = jnp.pad(magf, 1)

    def shift(dr, dc):
        h, w = magf.shape
        return jax.lax.dynamic_slice(mp, (1 + dr, 1 + dc), (h, w))

    left, right = shift(0, -1), shift(0, 1)
    up, down = shift(-1, 0), shift(1, 0)
    ul, ur = shift(-1, -1), shift(-1, 1)
    dl, dr_ = shift(1, -1), shift(1, 1)

    x_abs = jnp.abs(xs)
    y_q15 = jnp.abs(ys) << 15
    tg22x = x_abs * _TG22
    tg67x = tg22x + (x_abs << 16)

    horiz = y_q15 < tg22x
    vert = y_q15 > tg67x
    same_sign = (xs ^ ys) >= 0

    keep_h = (magf > left) & (magf >= right)
    keep_v = (magf > up) & (magf >= down)
    # Diagonal sector: neighbors along the gradient direction. With matching
    # signs the gradient runs along the main diagonal (ul/dr), otherwise the
    # anti-diagonal (ur/dl).
    keep_d_same = (magf > ul) & (magf > dr_)
    keep_d_diff = (magf > ur) & (magf > dl)

    keep = jnp.where(
        horiz, keep_h,
        jnp.where(vert, keep_v, jnp.where(same_sign, keep_d_same, keep_d_diff)),
    )

    cand = (magf > low2) & keep
    strong = cand & (magf > high2)
    return strong, cand


def dilate8(m):
    """One step of 8-connected boolean dilation (zero border)."""
    p = jnp.pad(m, 1)
    h, w = m.shape
    acc = m
    for drr in (-1, 0, 1):
        for dcc in (-1, 0, 1):
            if drr == 0 and dcc == 0:
                continue
            acc = acc | jax.lax.dynamic_slice(p, (1 + drr, 1 + dcc), (h, w))
    return acc


def canny(dx, dy, low_thresh, high_thresh):
    """Canny edges from int16-quantized gradients with L2 magnitude.

    Replicates cv.Canny(dx.astype(int16), dy.astype(int16), low, high,
    L2gradient=True) (/root/reference/src/magnify/utils.py:128-134):
    squared-magnitude thresholding, OpenCV's fixed-point sector
    non-max-suppression, and 8-connected hysteresis grown to fixpoint.
    """
    strong, weak = canny_nms(dx, dy, low_thresh, high_thresh)

    # _PALLAS_ENV is snapshotted at import (this function is traced inside
    # the jitted detection stages, so a per-call env read would be baked
    # per trace — mid-process changes silently half-applied). The knob is
    # process-level: set it before importing magnify_tpu.
    if _PALLAS_ENV != "0" and jax.default_backend() == "tpu":
        from magnify_tpu.ops.pallas_kernels import hysteresis, pallas_preferred

        if pallas_preferred(strong.shape):
            return hysteresis(strong, weak)

    def cond(state):
        cur, changed = state
        return changed

    def body(state):
        cur, _ = state
        grown = dilate8(cur) & weak | cur
        return grown, jnp.any(grown != cur)

    edges, _ = jax.lax.while_loop(cond, body, (strong, jnp.asarray(True)))
    return edges


def _f32_sort_key(values):
    """Monotone uint32 key of float32 values (IEEE-754 total order trick):
    nonnegative floats get the sign bit set, negative floats get all bits
    flipped, so unsigned key order equals numeric order. NaNs sort above
    +inf."""
    bits = jax.lax.bitcast_convert_type(values.astype(jnp.float32),
                                        jnp.uint32)
    sign = jnp.uint32(1) << 31
    return jnp.where(bits & sign != 0, ~bits, bits | sign)


def _f32_from_sort_key(key):
    sign = jnp.uint32(1) << 31
    bits = jnp.where(key & sign != 0, key ^ sign, ~key)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


_RADIX_BITS = 2  # digits per round; must divide 32


def _order_statistics(flat, ks, axis_names=(), mask=None):
    """Exact k-th order statistics (vector of ranks) via radix rank
    search — no sort, no scatter.

    The float32 values map to monotone uint32 keys, and the answer (the
    smallest key whose rank covers each ``k``) is built ``_RADIX_BITS``
    bits per round, most-significant first: round j tests the pivots
    ``prefix | d | 111...`` for every digit d and picks the digit as the
    number of pivots whose count(keys <= pivot) still falls short of
    k + 1 (counts are monotone in d). Each round is one compare+reduce
    pass over the data shared by all ranks and digits (VPU-friendly;
    scatter-add histograms are an order of magnitude slower on TPU) —
    the search is bandwidth-bound, so fewer, slightly-wider passes win:
    measured on v5e at 1M elements x 2 quantiles, 2-bit digits (16
    passes, 12 compare rows) run 0.22 ms vs 0.38 ms for plain bisection
    (32 passes) and 0.30 ms for 4-bit digits (8 passes, 60 rows). The
    result is exact for arbitrary float32 data: all 32 bits are pinned.

    ``axis_names`` names mesh axes to psum the counts over, making the same
    search exact across shards of a distributed array; ``mask`` excludes
    elements (e.g. padding rows on a sharded plane). NaNs are not supported
    (they sort above +inf).
    """
    keys = _f32_sort_key(flat)
    live = mask.reshape(-1) if mask is not None else None
    n_digits = (1 << _RADIX_BITS) - 1  # pivots per rank per round
    digits = jnp.arange(n_digits, dtype=jnp.uint32)

    def body(j, ans):
        shift = 32 - _RADIX_BITS * (j + 1)
        suffix = (jnp.uint32(1) << shift) - jnp.uint32(1)
        # (D, S) pivots: prefix | digit << shift | all-ones suffix —
        # flattened to a (D*S, N) 2-D compare: the 3-D broadcast form
        # defeats XLA's compare+reduce fusion on TPU (the (D, S, N) bool
        # intermediate materializes to HBM; measured 4x slower overall).
        pivots = (ans[None, :] | (digits[:, None] << shift)
                  | suffix).reshape(-1)
        hit = keys[None, :] <= pivots[:, None]
        if live is not None:
            hit &= live[None, :]
        counts = jnp.sum(hit, axis=1, dtype=jnp.int32).reshape(
            digits.shape[0], ks.shape[0])
        for ax in axis_names:
            counts = jax.lax.psum(counts, ax)
        too_small = jnp.sum(counts < ks[None, :] + 1, axis=0)
        return ans | (too_small.astype(jnp.uint32) << shift)

    # Seeding the prefix from the data keeps its varying-manual-axes
    # annotation consistent with the loop body under shard_map; the value
    # is still exactly 0.
    zero = jnp.broadcast_to(keys[0] & jnp.uint32(0), ks.shape)
    ans = jax.lax.fori_loop(0, 32 // _RADIX_BITS, body, zero)
    return _f32_from_sort_key(ans)


def histogram_quantiles(values, qs, axis_names=(), mask=None):
    """Exact quantiles (numpy ``linear`` interpolation semantics) via
    bitwise binary search — no XLA sort, no scatter.

    Matches the reference's ``np.quantile`` thresholds
    (/root/reference/src/magnify/utils.py:126-127) exactly: the k-th and
    (k+1)-th order statistics of every requested quantile are recovered by
    one shared rank binary search and interpolated at rank q*(n-1). With
    ``axis_names``/``mask`` the same program computes the quantiles of a
    mesh-sharded array exactly (the multi-chip edge pipeline's thresholds
    equal the single-chip ones bit-for-bit).
    """
    flat = values.reshape(-1)
    if mask is None and not axis_names:
        n = flat.shape[0]
    else:
        n = (mask.reshape(-1).sum() if mask is not None
             else jnp.int32(flat.shape[0]))
        for ax in axis_names:
            n = jax.lax.psum(n, ax)
    qs = jnp.atleast_1d(jnp.asarray(qs, jnp.float32))
    rank = qs * (n - 1)
    k = jnp.clip(jnp.floor(rank).astype(jnp.int32), 0, n - 1)
    frac = rank - k.astype(jnp.float32)
    ranks = jnp.concatenate([k, jnp.minimum(k + 1, n - 1)])
    stats = _order_statistics(flat, ranks, axis_names=axis_names, mask=mask)
    s = k.shape[0]
    x_k = stats[:s]
    x_k1 = jnp.where(k + 1 <= n - 1, stats[s:], x_k)
    return x_k + frac * (x_k1 - x_k)


def histogram_quantile(values, q, axis_names=(), mask=None):
    """Scalar-q convenience over :func:`histogram_quantiles`."""
    return histogram_quantiles(values, jnp.asarray(q, jnp.float32)[None],
                               axis_names=axis_names, mask=mask)[0]


def edge_pipeline(img, low_edge_quantile, high_edge_quantile,
                  normalized: bool = False):
    """normalize -> blur -> Scharr -> quantile thresholds -> Canny.

    Returns (edges bool, dx, dy, grad_angles) where grad_angles come from the
    float Scharr gradients (the scoring inputs at
    /root/reference/src/magnify/utils.py:170).

    ``normalized=True`` skips the min-max normalization: the caller already
    holds uint8-valued data (e.g. normalized on the host so only 1 byte per
    pixel crosses the host->HBM link). Values must then match
    :func:`normalize_to_u8` output exactly for bitwise parity.
    """
    u8 = img.astype(jnp.float32) if normalized else normalize_to_u8(img)
    blurred = gaussian_blur5_u8(u8)
    dx, dy = scharr(blurred)
    grad = jnp.sqrt(dx * dx + dy * dy)
    low_t, high_t = histogram_quantiles(
        grad, jnp.stack([jnp.asarray(low_edge_quantile, jnp.float32),
                         jnp.asarray(high_edge_quantile, jnp.float32)])
    )
    edges = canny(dx, dy, low_t, high_t)
    grad_angles = jnp.arctan2(dy, dx)
    return edges, dx, dy, grad_angles
