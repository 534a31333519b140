"""Masked per-marker reductions over ROI stacks.

Fused replacements for the reference's xarray ``where(...).mean/median``
chains over fg/bg masks (identify.py:76-81, filter.py:21-23): the ROI stack,
both masks, and both statistics are handled in one device program, so only
per-marker scalars return to host.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fg_mean_bg_median",
    "masked_median",
    "masked_mean",
    "measured_transfer_rate",
    "prefer_host_reduction",
]


# Effective host-twin reduction rate (bytes/s) for the cost model below:
# the chunked numpy twins process a 167 MB ROI store in ~1.3-1.5 s on the
# dev VM (page-fault bound, BASELINE.md decode8k_spilled) — ~120 MB/s.
_HOST_REDUCE_RATE = 120e6
# Probe stores at least this big; smaller ones route by the existing
# element-count rule in masked_*/fg_mean_bg_median.
_PROBE_MIN_BYTES = 32 << 20
_transfer_probe = {"t": -1e9, "rate": None}


def measured_transfer_rate(sample_bytes: int = 2 << 20,
                           ttl_s: float = 60.0) -> float | None:
    """Effective host<->device transfer rate (bytes/s), measured by a tiny
    timed round trip (device_put + full pull — no compilation involved)
    and cached for ``ttl_s``.

    This is the signal the auto reduction-placement policy routes big
    uploads on: link throughput is a PROCESS property, not a constant —
    on relay-attached setups it degrades with the process's RSS watermark
    (the documented high-RSS upload penalty that made the 8k-mark decode
    7 s device-routed vs 1.5 s on the host twin inside the bench
    process), while directly-attached TPUs measure GB/s and keep the
    device route. Returns None if the probe fails (no device, etc.).
    """
    now = time.monotonic()
    if now - _transfer_probe["t"] < ttl_s:
        return _transfer_probe["rate"]
    rate = None
    try:
        def round_trip(n):
            buf = np.ones(n, np.uint8)  # pre-faulted pages
            t0 = time.monotonic()
            arr = jax.device_put(buf)
            np.asarray(arr)  # the pull is the only reliable sync on relays
            return max(time.monotonic() - t0, 1e-6)

        # Subtract a tiny round trip so latency doesn't masquerade as low
        # bandwidth: a 2 MiB probe through a 35 ms-RTT link measures
        # ~115 MB/s regardless of true throughput — which would wrongly
        # route every big store to the host twin on high-latency
        # high-bandwidth links. dt_big - dt_small isolates the per-byte
        # transfer cost. The first transfer of a session pays one-time
        # setup (observed 425 ms for 4 KB cold vs 30 ms warm — enough to
        # make dt_small exceed dt_big and fabricate a GB/s link), so one
        # untimed warmup precedes the measurements.
        round_trip(4096)
        dt_small = round_trip(4096)
        dt_big = round_trip(sample_bytes)
        dt = max(dt_big - dt_small, 1e-4)
        rate = 2.0 * sample_bytes / dt  # bytes crossed the link twice
    except Exception:
        rate = None
    _transfer_probe["t"] = now
    _transfer_probe["rate"] = rate
    return rate


def prefer_host_reduction(store) -> bool:
    """Shared reduction-placement policy (quantify, identify_mrbles, the
    QC filters). MAGNIFY_TPU_QUANTIFY=host|device overrides; auto routes

    * host when the backing store is a disk spill (uploading data that
      already lives in host spill files costs more in host->HBM transfer
      than the device reduction saves);
    * for big in-RAM stores (>= 32 MB), by a measured cost model: the
      store's upload time at the probed link rate
      (:func:`measured_transfer_rate`) vs the host twin's ~120 MB/s —
      so a degraded or RSS-penalized link falls back to the exact host
      twin instead of paying a multi-second upload, while attached
      hardware (GB/s) keeps the device route;
    * device otherwise.
    """
    policy = os.environ.get("MAGNIFY_TPU_QUANTIFY", "auto")
    if policy != "auto":
        return policy == "host"
    from magnify_tpu.core.lazy import is_memmap_backed

    if is_memmap_backed(store):
        return True
    nbytes = getattr(store, "nbytes", 0)
    if nbytes < _PROBE_MIN_BYTES:
        return False
    rate = measured_transfer_rate()
    if not rate:
        return False
    device_cost = nbytes / rate + 0.05  # + a dispatch round trip
    return device_cost > nbytes / _HOST_REDUCE_RATE


def _row_chunk(shape, itemsize: int = 4, budget: int = 32 << 20) -> int:
    """Rows per chunk keeping ~``budget`` bytes of temporaries: first-touch
    of fresh anonymous pages runs at ~100 MB/s on VM hosts while
    allocator-recycled pages run at GB/s, so bounded chunks win."""
    per_row = max(int(np.prod(shape[1:], dtype=np.int64)) * itemsize, 1)
    return max(1, min(int(shape[0]), budget // per_row))


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
    chunk = _row_chunk(roi.shape)
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
    anyway). The bg median is bit-identical across paths (both select the
    same inf-fill-sorted elements); the fg MEAN agrees only to f32
    summation-order rounding (numpy's pairwise sum vs XLA's reduction
    tree), so intensities can differ at the last ulp with routing — same
    caveat as :func:`masked_mean`, stated in docs/architecture.md.
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


def _masked_median_np_block(values, mask):
    """Numpy twin of :func:`_masked_median` (same inf-fill sort median)."""
    n = values.shape[0]
    flat = values.reshape(n, -1).astype(np.float32)
    m = mask.reshape(n, -1)
    length = flat.shape[1]
    filled = np.where(m, flat, np.inf)
    filled.sort(axis=-1)
    cnt = m.sum(-1)
    hi = np.maximum(cnt - 1, 0)
    mid_lo = np.clip((cnt - 1) // 2, 0, length - 1)
    mid_hi = np.clip(np.minimum(cnt // 2, hi), 0, length - 1)
    lo_val = np.take_along_axis(filled, mid_lo[:, None], -1)[:, 0]
    hi_val = np.take_along_axis(filled, mid_hi[:, None], -1)[:, 0]
    return np.where(cnt > 0, (lo_val + hi_val) / 2,
                    np.float32(np.nan)).astype(np.float32)


@jax.jit
def _masked_mean(values, mask):
    n = values.shape[0]
    flat = values.reshape(n, -1).astype(jnp.float32)
    m = mask.reshape(n, -1)
    s = jnp.where(m, flat, 0.0).sum(-1)
    c = m.sum(-1)
    return jnp.where(c > 0, s / jnp.maximum(c, 1), jnp.nan)


def _masked_mean_np_block(values, mask):
    """Numpy twin of :func:`_masked_mean` (f32 where-sum / count)."""
    n = values.shape[0]
    flat = values.reshape(n, -1).astype(np.float32)
    m = mask.reshape(n, -1)
    s = np.where(m, flat, np.float32(0.0)).sum(-1)
    c = m.sum(-1)
    return np.where(c > 0, s / np.maximum(c, 1),
                    np.float32(np.nan)).astype(np.float32)


def _rowwise(block_fn, values, mask):
    """Run a per-row numpy twin in recycled-page chunks (see _row_chunk)."""
    n = values.shape[0]
    chunk = _row_chunk(values.shape)
    if chunk >= n:
        return block_fn(values, mask)
    out = np.empty((n,), np.float32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        out[s:e] = block_fn(values[s:e], mask[s:e])
    return out


def masked_median(values: np.ndarray, mask: np.ndarray,
                  prefer_host: bool = False) -> np.ndarray:
    """Per-row median over masked elements: values/mask (n, ...).

    Small or ``prefer_host`` (disk-spilled) inputs take the exact numpy
    twin — one XLA sort dispatch through a remote relay costs more than
    the whole reduction, and spilled stores should never be uploaded.
    """
    if not isinstance(values, jax.Array) and (
            prefer_host or np.asarray(values).size < (1 << 24)):
        return _rowwise(_masked_median_np_block, np.asarray(values),
                        np.asarray(mask))
    return np.asarray(_masked_median(jnp.asarray(values), jnp.asarray(mask)))


def masked_mean(values: np.ndarray, mask: np.ndarray,
                prefer_host: bool = False) -> np.ndarray:
    """Per-row mean over masked elements: values/mask (n, ...). Same
    host/device routing as :func:`masked_median`. Unlike the median twin
    (bit-identical: both select the same sorted elements), the host and
    device means agree only to f32 summation-order rounding — numpy's
    pairwise summation and XLA's reduction tree associate differently."""
    if not isinstance(values, jax.Array) and (
            prefer_host or np.asarray(values).size < (1 << 24)):
        return _rowwise(_masked_mean_np_block, np.asarray(values),
                        np.asarray(mask))
    return np.asarray(_masked_mean(jnp.asarray(values), jnp.asarray(mask)))
