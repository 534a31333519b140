"""Per-marker intensity quantification over the full (channel, time) stack.

A first-class extension beyond the reference (which computes fg/bg
statistics only inside the mrbles decoder at t=0, identify.py:76-81): the
``quantify`` component streams the marker ROI stack through the device in
time batches and attaches an ``intensity`` variable of per-(mark, channel,
time) foreground-mean minus background-median values — the "only summaries
return to host" pattern for terabyte-scale 4D runs.
"""

from __future__ import annotations

import numpy as np

from magnify_tpu.core.registry import component
from magnify_tpu.ops.reduce import fg_mean_bg_median

__all__ = ["quantify"]


from magnify_tpu.core.lazy import is_memmap_backed as _is_memmap_backed


@component("quantify")
def quantify(assay, batch_timesteps: int = 8):
    """Attach intensity (mark, channel, time): fg mean minus bg median.

    Processes ``batch_timesteps`` timesteps per reduction call — the
    (mark, time) axes fold together so one fused summary pass covers the
    whole batch — while a background thread reads the next batch from the
    (possibly memmapped) ROI store, keeping IO behind compute.

    Numerics: the fg MEAN follows the host/device routing policy of
    :mod:`magnify_tpu.ops.reduce` (small or memmap-resident batches run on
    the numpy twin, MAGNIFY_TPU_QUANTIFY overrides). The two backends agree
    only to f32 summation-order rounding (numpy pairwise vs XLA reduction
    tree), so intensities can differ in the last ulp with batch size and
    placement; the bg MEDIAN is bit-identical on both. See docs/index.md
    "Numerics and compatibility notes".
    """
    import concurrent.futures

    from magnify_tpu.core.lazy import evict_backing_pages

    # Single-channel / single-timestep datasets come out of restore_format
    # with those dims squeezed away; treat missing dims as size 1 and
    # attach `intensity` over only the dims that exist.
    n_t = assay.sizes.get("time", 1)
    n_marks = assay.sizes["mark"]
    n_ch = assay.sizes.get("channel", 1)
    # Cap the host batch buffer at ~128 MB: at out-of-core scale (thousands
    # of marks) the requested batch_timesteps would otherwise stage
    # multi-hundred-MB copies per batch (x2 with the prefetch thread, x2
    # again for the device upload), dominating peak RSS.
    bytes_per_t = (n_marks * n_ch * assay.sizes["roi_y"]
                   * assay.sizes["roi_x"]
                   * np.dtype(assay.roi.dtype).itemsize)
    batch_timesteps = max(1, min(batch_timesteps,
                                 (128 << 20) // max(bytes_per_t, 1)))
    # Reduction placement: a disk-spilled ROI store (out-of-core regime)
    # reduces on host — streaming a store that already lives in host spill
    # files through the device costs more in host->HBM transfer than the
    # reduction saves, and the result is a host-bound summary. In-RAM
    # stores keep the device path (one fused program per batch). The bg
    # median is bit-identical across placements; the fg mean agrees only
    # to f32 summation-order rounding (ops.reduce.fg_mean_bg_median), so
    # intensity can move at the last ulp with MAGNIFY_TPU_QUANTIFY=
    # device|host (shared with identify_mrbles and the QC filters).
    from magnify_tpu.ops.reduce import prefer_host_reduction

    prefer_host = prefer_host_reduction(assay["roi"].data)
    out = np.empty((n_marks, n_ch, n_t), np.float32)
    starts = list(range(0, n_t, batch_timesteps))

    def ordered(da, want):
        """Window ``da`` over time (when present), order its axes as
        ``want``, and insert size-1 axes for absent dims."""
        present = [d for d in want if d in da.dims]
        da = da.transpose(*present)

        def fetch(window):
            arr = (da.isel(time=window) if "time" in da.dims
                   else da).to_numpy()
            for i, d in enumerate(want):
                if d not in da.dims:
                    arr = np.expand_dims(arr, i)
            return arr

        return fetch

    roi_f = ordered(assay.roi, ("mark", "channel", "time", "roi_y", "roi_x"))
    fg_f = ordered(assay["fg"], ("mark", "time", "roi_y", "roi_x"))
    bg_f = ordered(assay["bg"], ("mark", "time", "roi_y", "roi_x"))

    def load(start):
        stop = min(start + batch_timesteps, n_t)
        window = slice(start, stop)
        return (start, stop, roi_f(window), fg_f(window), bg_f(window))

    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
        pending = pool.submit(load, starts[0])
        for i in range(len(starts)):
            start, stop, roi, fg, bg = pending.result()
            # This batch is fully copied to host arrays; drop its (and all
            # prior) page-cache pages of a spilled ROI store before kicking
            # off the next prefetch, so a big store never accumulates in
            # RSS. (Evicting here, not after the reduction, keeps the
            # eviction from racing the prefetch thread's reads.)
            evict_backing_pages(assay["roi"].data)
            if i + 1 < len(starts):
                pending = pool.submit(load, starts[i + 1])
            b = stop - start
            length_y, length_x = roi.shape[-2:]
            # Fold (mark, time) into one batch axis for a single reduction.
            roi_b = roi.transpose(0, 2, 1, 3, 4).reshape(
                n_marks * b, n_ch, length_y, length_x)
            fg_b = fg.reshape(n_marks * b, length_y, length_x)
            bg_b = bg.reshape(n_marks * b, length_y, length_x)
            vals = fg_mean_bg_median(roi_b, fg_b, bg_b,
                                     prefer_host=prefer_host)
            out[:, :, start:stop] = vals.reshape(n_marks, b,
                                                 n_ch).transpose(0, 2, 1)
    dims = ["mark"] + [d for d in ("channel", "time") if d in assay.roi.dims]
    shape = [n_marks] + ([n_ch] if "channel" in assay.roi.dims else []) \
        + ([n_t] if "time" in assay.roi.dims else [])
    assay["intensity"] = (tuple(dims), out.reshape(shape))
    return assay
