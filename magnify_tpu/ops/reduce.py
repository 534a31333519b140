"""Masked per-marker reductions over ROI stacks.

Fused replacements for the reference's xarray ``where(...).mean/median``
chains over fg/bg masks (identify.py:76-81, filter.py:21-23): the ROI stack,
both masks, and both statistics are handled in one device program, so only
per-marker scalars return to host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fg_mean_bg_median", "masked_median", "masked_mean"]


def _masked_median_1d(values, mask):
    """Median of masked elements, NaN when the mask is empty.

    Sort-free selection would need data-dependent shapes; instead masked
    entries are pushed to +inf, sorted, and the median read at the
    (count-dependent) middle — matching numpy's even/odd interpolation.
    """
    n = values.shape[0]
    filled = jnp.where(mask, values, jnp.inf)
    s = jnp.sort(filled)
    count = mask.sum()
    hi = jnp.maximum(count - 1, 0)
    mid_lo = (count - 1) // 2
    mid_hi = count // 2
    lo_val = s[jnp.clip(mid_lo, 0, n - 1)]
    hi_val = s[jnp.clip(jnp.minimum(mid_hi, hi), 0, n - 1)]
    med = (lo_val + hi_val) / 2
    return jnp.where(count > 0, med, jnp.nan)


@jax.jit
def _fg_mean_bg_median(roi, fg, bg):
    n_marks, n_ch = roi.shape[:2]
    flat = roi.reshape(n_marks, n_ch, -1).astype(jnp.float32)
    fg_flat = fg.reshape(n_marks, 1, -1)
    bg_flat = bg.reshape(n_marks, 1, -1)

    fg_sum = jnp.where(fg_flat, flat, 0.0).sum(-1)
    fg_cnt = jnp.broadcast_to(fg_flat, flat.shape).sum(-1)
    fg_mean = jnp.where(fg_cnt > 0, fg_sum / jnp.maximum(fg_cnt, 1), jnp.nan)

    bg_med = jax.vmap(
        jax.vmap(_masked_median_1d, in_axes=(0, None)), in_axes=(0, 0)
    )(flat, bg_flat[:, 0])
    return fg_mean - bg_med


def _fg_mean_bg_median_np(roi, fg, bg):
    """Numpy twin of :func:`_fg_mean_bg_median` (same inf-fill sort median
    and f32 arithmetic) for small problems, where one XLA sort dispatch
    costs more than the whole reduction in numpy.

    Large stores reduce in mark chunks: the body makes ~6 array-sized
    temporaries, and first-touch of fresh anonymous pages is the dominant
    cost on VM hosts (~100 MB/s measured, vs GB/s once the allocator
    recycles the pages) — chunking bounds the temporaries to a recycled
    working set. Chunking over marks is exact (every statistic is
    per-mark).
    """
    n_marks = roi.shape[0]
    per_mark = max(int(np.prod(roi.shape[1:], dtype=np.int64)) * 4, 1)
    chunk = max(1, min(n_marks, (32 << 20) // per_mark))
    if chunk >= n_marks:
        return _fg_mean_bg_median_np_block(roi, fg, bg)
    out = np.empty(roi.shape[:2], np.float32)
    for s in range(0, n_marks, chunk):
        e = min(s + chunk, n_marks)
        out[s:e] = _fg_mean_bg_median_np_block(roi[s:e], fg[s:e], bg[s:e])
    return out


def _fg_mean_bg_median_np_block(roi, fg, bg):
    n_marks, n_ch = roi.shape[:2]
    flat = roi.reshape(n_marks, n_ch, -1).astype(np.float32)
    n = flat.shape[-1]
    fg_flat = fg.reshape(n_marks, 1, -1)
    bg_flat = bg.reshape(n_marks, 1, -1)

    fg_cnt = fg_flat.sum(-1)
    fg_sum = np.where(fg_flat, flat, 0.0).sum(-1)
    fg_mean = np.where(fg_cnt > 0, fg_sum / np.maximum(fg_cnt, 1), np.nan)

    filled = np.where(bg_flat, flat, np.inf)
    filled.sort(axis=-1)
    cnt = bg_flat.sum(-1)  # (marks, 1), same mask for every channel
    hi_idx = np.maximum(cnt - 1, 0)
    mid_lo = np.clip((cnt - 1) // 2, 0, n - 1)
    mid_hi = np.clip(np.minimum(cnt // 2, hi_idx), 0, n - 1)
    idx_lo = np.broadcast_to(mid_lo[..., None], filled.shape[:2] + (1,))
    idx_hi = np.broadcast_to(mid_hi[..., None], filled.shape[:2] + (1,))
    lo_val = np.take_along_axis(filled, idx_lo, -1)[..., 0]
    hi_val = np.take_along_axis(filled, idx_hi, -1)[..., 0]
    bg_med = np.where(cnt > 0, (lo_val + hi_val) / 2, np.nan)
    return fg_mean - bg_med


def fg_mean_bg_median(roi: np.ndarray, fg: np.ndarray, bg: np.ndarray,
                      prefer_host: bool = False) -> np.ndarray:
    """Per-(mark, channel) foreground mean minus background median.

    roi: (mark, channel, roi_y, roi_x); fg/bg: (mark, roi_y, roi_x).
    The intensity statistic of the mrbles decoder (identify.py:76-81).

    ``prefer_host=True`` forces the numpy twin regardless of size — used by
    streaming consumers whose data lives in host spill files (uploading a
    disk-resident store batch-by-batch costs more in transfer than the
    device reduction saves, and per-marker summaries are host-bound output
    anyway). The two paths are exact twins (same inf-fill sort median and
    f32 arithmetic), so routing is a pure performance policy.
    """
    if not isinstance(roi, jax.Array) and (
            prefer_host or np.asarray(roi).size < (1 << 24)):
        return _fg_mean_bg_median_np(np.asarray(roi), np.asarray(fg),
                                     np.asarray(bg))
    return np.asarray(_fg_mean_bg_median(
        jnp.asarray(roi), jnp.asarray(fg), jnp.asarray(bg)
    ))


@jax.jit
def _masked_median(values, mask):
    n = values.shape[0]
    flat = values.reshape(n, -1).astype(jnp.float32)
    m = mask.reshape(n, -1)
    return jax.vmap(_masked_median_1d)(flat, m)


def masked_median(values: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Per-row median over masked elements: values/mask (n, ...)."""
    return np.asarray(_masked_median(jnp.asarray(values), jnp.asarray(mask)))


@jax.jit
def _masked_mean(values, mask):
    n = values.shape[0]
    flat = values.reshape(n, -1).astype(jnp.float32)
    m = mask.reshape(n, -1)
    s = jnp.where(m, flat, 0.0).sum(-1)
    c = m.sum(-1)
    return jnp.where(c > 0, s / jnp.maximum(c, 1), jnp.nan)


def masked_mean(values: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Per-row mean over masked elements: values/mask (n, ...)."""
    return np.asarray(_masked_mean(jnp.asarray(values), jnp.asarray(mask)))
