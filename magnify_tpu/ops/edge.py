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

__all__ = [
    "canny",
    "edge_pipeline",
    "gaussian_blur5_u8",
    "histogram_quantile",
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

    if os.environ.get("MAGNIFY_TPU_PALLAS", "1") != "0" \
            and jax.default_backend() == "tpu":
        from magnify_tpu.ops.pallas_kernels import hysteresis, pallas_supported

        if pallas_supported(strong.shape):
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


def _order_statistic(flat, k, bins: int = 1 << 16, rounds: int = 4,
                     axis_names=(), mask=None):
    """Exact k-th order statistic via iterative histogram narrowing.

    Each round histograms the elements inside the current (lo, hi] bracket
    and descends into the bin containing rank ``k``. Four rounds shrink the
    bracket below float32 resolution, so every element left inside is the
    same value — the exact k-th smallest — with no sort: O(rounds * N).

    ``axis_names`` names mesh axes to psum/pmin/pmax over, making the same
    narrowing exact across shards of a distributed array; ``mask`` excludes
    elements (e.g. padding rows on a sharded plane).
    """
    def allmin(x):
        for ax in axis_names:
            x = jax.lax.pmin(x, ax)
        return x

    def allmax(x):
        for ax in axis_names:
            x = jax.lax.pmax(x, ax)
        return x

    live = mask.reshape(-1) if mask is not None else None

    def body(_, state):
        lo, hi, below = state
        span = jnp.maximum(hi - lo, 1e-35)
        # Elements outside the bracket get parked in an overflow bin.
        rel = (flat - lo) * (bins / span)
        idx = jnp.clip(rel.astype(jnp.int32), 0, bins - 1)
        inside = (flat >= lo) & (flat <= hi)
        if live is not None:
            inside &= live
        idx = jnp.where(inside, idx, bins)
        hist = jnp.zeros((bins + 1,), jnp.int32).at[idx].add(
            1, mode="drop"
        )[:-1]
        for ax in axis_names:
            hist = jax.lax.psum(hist, ax)
        cdf = below + jnp.cumsum(hist)
        b = jnp.searchsorted(cdf, k + 1, side="left")
        b = jnp.minimum(b, bins - 1)
        # Derive the new bracket from the elements of the chosen bin — exact
        # under float rounding (the arithmetic bin edges may exclude the
        # bin's own members).
        in_bin = inside & (idx == b)
        new_lo = allmin(jnp.min(jnp.where(in_bin, flat, jnp.inf)))
        new_hi = allmax(jnp.max(jnp.where(in_bin, flat, -jnp.inf)))
        new_below = jnp.where(b > 0, cdf[jnp.maximum(b - 1, 0)], below)
        return new_lo, new_hi, new_below

    if live is not None:
        lo0 = allmin(jnp.min(jnp.where(live, flat, jnp.inf)))
        hi0 = allmax(jnp.max(jnp.where(live, flat, -jnp.inf)))
    else:
        lo0 = allmin(jnp.min(flat))
        hi0 = allmax(jnp.max(flat))
    # The loop-carry zero must share the bracket values' varying-manual-axes
    # annotation under shard_map (the where joins lo0's axes onto the
    # constant); plain jnp.int32(0) would be rejected as unvarying.
    below0 = jnp.where(lo0 == lo0, jnp.int32(0), jnp.int32(0))
    lo, hi, below = jax.lax.fori_loop(
        0, rounds, body, (lo0, hi0, below0)
    )
    inside = (flat >= lo) & (flat <= hi)
    if live is not None:
        inside &= live
    return allmin(jnp.min(jnp.where(inside, flat, jnp.inf)))


def histogram_quantile(values, q, bins: int = 1 << 16, axis_names=(),
                       mask=None):
    """Exact quantile (numpy ``linear`` interpolation semantics) via
    iterative histogram narrowing — no XLA sort.

    Matches the reference's ``np.quantile`` thresholds
    (/root/reference/src/magnify/utils.py:126-127) exactly: the k-th and
    (k+1)-th order statistics are recovered by histogram descent and
    interpolated at rank q*(n-1). With ``axis_names``/``mask`` the same
    program computes the quantile of a mesh-sharded array exactly (the
    multi-chip edge pipeline's thresholds equal the single-chip ones
    bit-for-bit).
    """
    flat = values.reshape(-1)
    if mask is None and not axis_names:
        n = flat.shape[0]
    else:
        n = (mask.reshape(-1).sum() if mask is not None
             else jnp.int32(flat.shape[0]))
        for ax in axis_names:
            n = jax.lax.psum(n, ax)
    q = jnp.asarray(q, jnp.float32)
    rank = q * (n - 1)
    k = jnp.clip(jnp.floor(rank).astype(jnp.int32), 0, n - 1)
    frac = rank - k.astype(jnp.float32)
    x_k = _order_statistic(flat, k, bins, axis_names=axis_names, mask=mask)
    x_k1 = jnp.where(k + 1 <= n - 1,
                     _order_statistic(flat, jnp.minimum(k + 1, n - 1), bins,
                                      axis_names=axis_names, mask=mask),
                     x_k)
    return x_k + frac * (x_k1 - x_k)


def edge_pipeline(img, low_edge_quantile, high_edge_quantile):
    """normalize -> blur -> Scharr -> quantile thresholds -> Canny.

    Returns (edges bool, dx, dy, grad_angles) where grad_angles come from the
    float Scharr gradients (the scoring inputs at
    /root/reference/src/magnify/utils.py:170).
    """
    u8 = normalize_to_u8(img)
    blurred = gaussian_blur5_u8(u8)
    dx, dy = scharr(blurred)
    grad = jnp.sqrt(dx * dx + dy * dy)
    low_t = histogram_quantile(grad, low_edge_quantile)
    high_t = histogram_quantile(grad, high_edge_quantile)
    edges = canny(dx, dy, low_t, high_t)
    grad_angles = jnp.arctan2(dy, dx)
    return edges, dx, dy, grad_angles
