"""Marker QC filters (reference /root/reference/src/magnify/filter.py).

Registered but not part of any default pipeline; users attach them with
``pipe.add_pipe(...)``. The masked fg/bg statistics run as fused device
reductions; roundness uses an on-device perimeter estimate instead of
OpenCV contour tracing.
"""

from __future__ import annotations


import numpy as np

from magnify_tpu import utils
from magnify_tpu.core.registry import component
from magnify_tpu.ops.reduce import masked_median

__all__ = ["filter_expression", "filter_nonround", "filter_leaky_buttons"]


def _search_channels(assay, search_channel):
    if search_channel is None:
        return list(assay["channel"].values.tolist()) if "channel" in assay.coords \
            else list(range(assay.sizes["channel"]))
    return utils.to_list(search_channel)


def _fg_bg_medians(assay, channel):
    sub = assay.roi.isel(time=0).sel(channel=channel)
    vals = sub.to_numpy()
    fg = assay["fg"].isel(time=0).to_numpy()
    bg = assay["bg"].isel(time=0).to_numpy()
    return masked_median(vals, fg), masked_median(vals, bg)


def _bg_sigma_bound(bg: np.ndarray, mult: float) -> float:
    """Std of all pairwise off-diagonal background differences, scaled.

    Mirrors filter.py:24-34: the auto contrast threshold is ``mult`` times
    the standard deviation of bg_i - bg_j over all i != j.
    """
    diffs = bg[:, None] - bg[None, :]
    offdiag = ~np.eye(len(bg), dtype=bool)
    return mult * diffs[offdiag].std()


@component("filter_expression")
def filter_expression(assay, search_channel=None, min_contrast=None):
    """Mark valid only where fg median exceeds bg median by a contrast bound
    (auto: 4 sigma of pairwise bg differences; reference filter.py:11-37)."""
    channels = _search_channels(assay, search_channel)
    valid_dims = assay["valid"].dims
    acc = np.zeros(assay["valid"].shape, bool)
    for channel in channels:
        fg_med, bg_med = _fg_bg_medians(assay, channel)
        if min_contrast is None:
            upper = _bg_sigma_bound(bg_med.flatten(), 4.0)
        else:
            upper = min_contrast
        ok = fg_med - bg_med > upper  # (mark,)
        acc |= ok.reshape(ok.shape + (1,) * (len(valid_dims) - ok.ndim))
    assay["valid"] = (valid_dims, assay["valid"].to_numpy() & acc)
    return assay


def _contour_perimeters(fg: np.ndarray) -> np.ndarray:
    """Per-mark external contour length of the fg masks.

    Uses OpenCV contour tracing (exact parity with reference
    filter.py:53-56) when available; otherwise an 8-neighborhood
    boundary-cycle estimate that counts thin-structure pixels twice (a
    closed contour traverses both sides of a 1-px feature).
    """
    n = fg.shape[0]
    out = np.zeros(n)
    try:
        import cv2 as cv

        for i in range(n):
            mask = (fg[i] > 0).astype(np.uint8) * 255
            contours, _ = cv.findContours(mask, cv.RETR_EXTERNAL,
                                          cv.CHAIN_APPROX_SIMPLE)
            out[i] = sum(cv.arcLength(c, True) for c in contours)
        return out
    except ImportError:
        pass
    for i in range(n):
        mask = fg[i] > 0
        padded = np.pad(mask, 1)
        inside4 = (padded[:-2, 1:-1] & padded[2:, 1:-1]
                   & padded[1:-1, :-2] & padded[1:-1, 2:])
        boundary = mask & ~inside4
        # Pixels on a thin ridge (no interior on either side in one axis)
        # are traversed twice by a closed contour.
        thin = boundary & ~(padded[:-2, 1:-1] & padded[2:, 1:-1]) \
            & ~(padded[1:-1, :-2] & padded[1:-1, 2:])
        out[i] = boundary.sum() + thin.sum()
    return out


@component("filter_nonround")
def filter_nonround(assay, min_roundness=0.75, search_channel=None):
    """Invalidate marks whose fg mask roundness = 4*pi*A/P^2 falls at or
    below ``min_roundness`` (reference filter.py:40-62)."""
    valid = assay["valid"].to_numpy().copy()
    fg = assay["fg"].isel(time=0).to_numpy()
    areas = fg.reshape(fg.shape[0], -1).sum(-1)
    perimeters = _contour_perimeters(fg)
    ok = np.zeros(fg.shape[0], bool)
    nonzero = perimeters > 0
    ok[nonzero] = (4 * np.pi * areas[nonzero] / perimeters[nonzero] ** 2
                   > min_roundness)
    valid &= ok.reshape(ok.shape + (1,) * (valid.ndim - ok.ndim))
    assay["valid"] = (assay["valid"].dims, valid)
    return assay


@component("filter_leaky")
def filter_leaky_buttons(assay, search_channel=None):
    """Invalidate buttons whose neighboring blank chambers express above
    5 sigma of pairwise bg differences (reference filter.py:65-94)."""
    channels = _search_channels(assay, search_channel)
    tag = assay["tag"].to_numpy()
    valid = assay["valid"].to_numpy().copy()
    rows = assay["mark_row"].to_numpy()
    n_marks = assay.sizes["mark"]
    for channel in channels:
        fg_med, bg_med = _fg_bg_medians(assay, channel)
        upper = _bg_sigma_bound(bg_med.flatten(), 5.0)
        empty = (fg_med - bg_med) < upper
        for i in range(n_marks):
            if tag[i] == "":
                continue
            if rows[i] > 0 and tag[i - 1] == "":
                valid[i] &= empty[i - 1]
            if rows[i] < rows.max() and i + 1 < n_marks and tag[i + 1] == "":
                valid[i] &= empty[i + 1]
    assay["valid"] = (assay["valid"].dims, valid)
    return assay
