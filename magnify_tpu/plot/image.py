"""Image and ROI viewers (matplotlib counterpart of reference plot/image.py).

``imshow`` renders the stitched image with foreground-label overlays and ROI
rectangles (the napari layer stack of reference plot/image.py:52-154);
``roishow`` tiles per-tag ROI galleries (plot/image.py:14-49). Both return
the matplotlib figure so headless callers can save it.
"""

from __future__ import annotations

import numpy as np

from magnify_tpu import utils

__all__ = ["imshow", "roishow", "roi_to_image_labels"]


def roi_to_image_labels(roi_masks: np.ndarray, bboxes: np.ndarray,
                        img_shape: tuple) -> np.ndarray:
    """Paint per-mark ROI masks into full-image label maps.

    Vectorized equivalent of the reference's numba kernel
    (plot/image.py:157-168): later marks overwrite earlier ones inside
    their mask.
    """
    n_marks, n_extra = roi_masks.shape[:2]
    labels = np.zeros((n_extra,) + tuple(img_shape), dtype=np.int32)
    for i in range(n_marks):
        for j in range(n_extra):
            top, bottom, left, right = bboxes[i, j]
            mask = roi_masks[i, j]
            region = labels[j, top:bottom, left:right]
            labels[j, top:bottom, left:right] = (
                (i + 1) * mask + region * (1 - mask)
            )
    return labels


def _multiscale(img: np.ndarray, limit: int = 512) -> np.ndarray:
    """Downsample by 2 until the plane fits limit^2 (plot/image.py:60-62)."""
    while img.shape[-1] * img.shape[-2] > limit**2:
        img = img[..., ::2, ::2]
    return img


def imshow(xp, show: bool = True):
    """Show the stitched image with fg overlays and ROI boxes."""
    import matplotlib.pyplot as plt
    from matplotlib import patches

    if "mark_row" in xp.dims and "mark_col" in xp.dims and "mark" not in xp.dims:
        xp = xp.stack(mark=("mark_row", "mark_col"))
    img = xp.image
    # Reduce to a single displayable plane: first channel/time.
    disp = img
    for dim in ("channel", "time"):
        if dim in disp.dims:
            disp = disp.isel(**{dim: 0})
    plane = _multiscale(disp.to_numpy())
    scale = disp.shape[-1] / plane.shape[-1]

    fig, ax = plt.subplots()
    ax.imshow(plane, cmap="gray")

    if "roi" in xp:
        fg = xp.fg
        for dim in ("time",):
            if dim in fg.dims:
                fg = fg.isel(**{dim: 0})
        xs = xp.x
        ys = xp.y
        if "time" in xs.dims:
            xs = xs.isel(time=0)
            ys = ys.isel(time=0)
        xs = np.round(xs.to_numpy()).astype(int)
        ys = np.round(ys.to_numpy()).astype(int)
        tags = (xp.tag.values if "tag" in xp.coords
                else np.array([""] * xp.sizes["mark"]))
        roi_len = xp.sizes["roi_y"]
        h, w = img.sizes["im_y"], img.sizes["im_x"]
        for i in range(xp.sizes["mark"]):
            top, bottom, left, right = utils.bounding_box(
                xs[i], ys[i], roi_len, w, h
            )
            rect = patches.Rectangle(
                (left / scale, top / scale), (right - left) / scale,
                (bottom - top) / scale, fill=False, edgecolor="white",
                linewidth=0.5,
            )
            ax.add_patch(rect)
            mask = fg.isel(mark=i).to_numpy()
            ys_m, xs_m = np.nonzero(mask)
            if len(ys_m):
                ax.scatter((left + xs_m) / scale, (top + ys_m) / scale,
                           s=0.05, c="lime", alpha=0.3)
            if tags[i]:
                ax.annotate(str(tags[i]), ((left + right) / 2 / scale,
                                           top / scale - 2),
                            color="yellow", fontsize=5, ha="center")
    if show:
        import matplotlib

        if matplotlib.get_backend().lower() != "agg":
            plt.show(block=False)
    return fig


def roishow(xp, show: bool = True, max_cols: int = 12):
    """Grid of per-mark ROIs grouped by tag with fg/bg outlines."""
    import matplotlib.pyplot as plt

    tags = (xp.tag.values if "tag" in xp.coords
            else np.array([""] * xp.sizes["mark"]))
    uniq = np.unique(tags)
    counts = [(tags == t).sum() for t in uniq]
    n_rows = len(uniq)
    n_cols = min(int(max(counts)), max_cols)
    fig, axes = plt.subplots(n_rows, n_cols, squeeze=False,
                             figsize=(1.2 * n_cols, 1.2 * n_rows))
    roi = xp.roi
    for dim in ("channel", "time"):
        if dim in roi.dims:
            roi = roi.isel(**{dim: 0})
    fg = xp.fg.isel(time=0) if "time" in xp.fg.dims else xp.fg
    for r, t in enumerate(uniq):
        idxs = np.nonzero(tags == t)[0][:n_cols]
        for c in range(n_cols):
            ax = axes[r][c]
            ax.set_axis_off()
            if c < len(idxs):
                i = int(idxs[c])
                ax.imshow(roi.isel(mark=i).to_numpy(), cmap="gray")
                ax.contour(fg.isel(mark=i).to_numpy(), levels=[0.5],
                           colors="lime", linewidths=0.5)
                if c == 0:
                    ax.set_title(str(t), fontsize=6)
    if show:
        import matplotlib

        if matplotlib.get_backend().lower() != "agg":
            plt.show(block=False)
    return fig
