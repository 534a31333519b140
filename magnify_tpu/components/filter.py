"""Marker QC filters (reference /root/reference/src/magnify/filter.py).

Registered but not part of any default pipeline; users attach them with
``pipe.add_pipe(...)``. The masked fg/bg statistics run as fused device
reductions; roundness uses an on-device perimeter estimate instead of
OpenCV contour tracing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
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


@jax.jit
def _roundness(fg):
    """4*pi*A/P^2 per mark with P estimated from the mask boundary.

    The boundary length uses the standard 8-neighborhood contour-length
    estimate (orthogonal steps + sqrt(2) diagonal steps), replacing
    cv.findContours + arcLength (reference filter.py:53-56).
    """
    f = fg.astype(jnp.float32)
    n = f.shape[0]
    area = f.reshape(n, -1).sum(-1)

    pad = jnp.pad(f, ((0, 0), (1, 1), (1, 1)))

    def shift(dr, dc):
        return jax.lax.dynamic_slice(
            pad, (0, 1 + dr, 1 + dc), f.shape
        )

    # Boundary pixels: in-mask with at least one 4-neighbor outside.
    inside4 = (shift(-1, 0) * shift(1, 0) * shift(0, -1) * shift(0, 1))
    boundary = f * (1 - inside4)
    # Perimeter estimate: count boundary-to-boundary steps along the contour.
    # Approximate contour length with the local transition counts.
    horiz = (boundary * jax.lax.dynamic_slice(
        jnp.pad(boundary, ((0, 0), (0, 0), (1, 1))), (0, 0, 2), f.shape
    )).reshape(n, -1).sum(-1)
    vert = (boundary * jax.lax.dynamic_slice(
        jnp.pad(boundary, ((0, 0), (1, 1), (0, 0))), (0, 2, 0), f.shape
    )).reshape(n, -1).sum(-1)
    diag1 = (boundary * jax.lax.dynamic_slice(
        jnp.pad(boundary, ((0, 0), (1, 1), (1, 1))), (0, 2, 2), f.shape
    )).reshape(n, -1).sum(-1)
    diag2 = (boundary * jax.lax.dynamic_slice(
        jnp.pad(boundary, ((0, 0), (1, 1), (1, 1))), (0, 2, 0), f.shape
    )).reshape(n, -1).sum(-1)
    # Each adjacency counted once per direction; prefer orthogonal links and
    # only add diagonals not shortcut by orthogonal neighbors.
    perimeter = horiz + vert + jnp.sqrt(2.0) * 0.5 * (diag1 + diag2)
    perimeter = jnp.maximum(perimeter, 1e-6)
    roundness = 4 * jnp.pi * area / perimeter**2
    return roundness, area > 0


@component("filter_nonround")
def filter_nonround(assay, min_roundness=0.75, search_channel=None):
    """Invalidate marks whose fg mask roundness = 4*pi*A/P^2 falls at or
    below ``min_roundness`` (reference filter.py:40-62)."""
    valid = assay["valid"].to_numpy().copy()
    fg = assay["fg"].isel(time=0).to_numpy()
    roundness, nonempty = _roundness(jnp.asarray(fg))
    roundness = np.asarray(roundness)
    nonempty = np.asarray(nonempty)
    ok = (roundness > min_roundness) & nonempty
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
