"""Fused on-device circle detection: the framework's flagship kernel path.

One jitted program replaces the reference's ``find_circles`` orchestration
(/root/reference/src/magnify/utils.py:102-222):

    normalize -> blur -> Scharr -> quantile thresholds -> Canny
    -> batched RANSAC proposals -> unique-triple dedupe -> perimeter
    alignment scoring -> roundness threshold -> score sort -> claimed-raster
    NMS

The host wrapper :func:`find_circles` feeds a numpy image in and compacted
numpy circles out; everything between the two transfers runs on device. The
vmapped variant :func:`detect_best_in_rois` batches the per-chamber
re-detection of the button pipeline (reference find.py:324-360) across all
R x C ROIs in a single program instead of a Python double loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from magnify_tpu.ops.edge import edge_pipeline
from magnify_tpu.ops.nms import claimed_raster_nms
from magnify_tpu.ops.ransac import candidate_circles
from magnify_tpu.ops.score import dedupe_circles, score_circles

__all__ = ["find_circles", "detect_best_in_rois"]

DEFAULT_UNIQUE_CAP = 65536
DEFAULT_NMS_CAP = 16384


def _pad_for_scoring(grad_angles, edges, max_radius):
    pad = 2 * max_radius
    ga = jnp.pad(grad_angles, pad)
    eg = jnp.pad(edges, pad)
    return ga, eg, pad


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_length", "num_iter", "min_radius", "max_radius",
        "unique_cap", "nms_cap", "min_dist",
    ),
)
def _detect(image, low_q, high_q, min_roundness, key, *, grid_length, num_iter,
            min_radius, max_radius, unique_cap, nms_cap, min_dist):
    h, w = image.shape
    edges, _dx, _dy, grad_angles = edge_pipeline(image, low_q, high_q)
    cands, any_edges = candidate_circles(edges, grid_length=grid_length,
                                         num_iter=num_iter, key=key)
    valid = jnp.full((num_iter,), True) & any_edges
    uniq, uvalid, n_unique = dedupe_circles(
        cands, valid, height=h, width=w, min_radius=min_radius,
        max_radius=max_radius, cap=unique_cap,
    )
    ga, eg, pad = _pad_for_scoring(grad_angles, edges, max_radius)
    shifted = uniq.at[:, :2].add(pad)
    scores = score_circles(ga, eg, shifted, uvalid, max_radius=max_radius)
    keep = scores >= min_roundness
    n_keep = keep.sum()
    scores = jnp.where(keep, scores, -jnp.inf)

    order = jnp.argsort(-scores)
    top = order[:nms_cap]
    c_sorted = uniq[top]
    s_sorted = scores[top]
    k_sorted = keep[top]
    accepted = claimed_raster_nms(c_sorted, k_sorted, min_dist=min_dist,
                                  height=h, width=w, max_radius=max_radius)
    return c_sorted, s_sorted, accepted, n_unique, n_keep


def find_circles(
    image: np.ndarray,
    low_edge_quantile: float,
    high_edge_quantile: float,
    grid_length: int,
    num_iter: int,
    min_radius: int,
    max_radius: int,
    min_roundness: float,
    min_dist: int,
    gui=None,
    seed: int = 0,
    unique_cap: int = DEFAULT_UNIQUE_CAP,
    nms_cap: int = DEFAULT_NMS_CAP,
) -> tuple[np.ndarray, np.ndarray]:
    """Detect circles in a single image.

    Same contract as the reference find_circles (utils.py:102-222): returns
    (circles, scores) with circles int32 rows of (row, col, radius) sorted by
    descending roundness score, already NMS-deduped when ``min_dist > 0``.
    ``gui`` is accepted for interface parity; interactive tuning is provided
    by :mod:`magnify_tpu.plot.vis` outside the fused path.
    """
    if gui is not None:
        from magnify_tpu.plot.vis import interactive_find_circles

        return interactive_find_circles(
            image, gui,
            low_edge_quantile=low_edge_quantile,
            high_edge_quantile=high_edge_quantile,
            grid_length=grid_length, num_iter=num_iter, min_radius=min_radius,
            max_radius=max_radius, min_roundness=min_roundness,
            min_dist=min_dist, seed=seed,
        )

    image = jnp.asarray(np.ascontiguousarray(image), dtype=jnp.float32)
    key = jax.random.PRNGKey(seed)
    ucap = int(min(unique_cap, num_iter))
    while True:
        ncap = int(min(nms_cap, ucap))
        circles, scores, accepted, n_unique, n_keep = _detect(
            image, float(low_edge_quantile), float(high_edge_quantile),
            float(min_roundness), key,
            grid_length=int(grid_length), num_iter=int(num_iter),
            min_radius=int(min_radius), max_radius=int(max_radius),
            unique_cap=ucap, nms_cap=ncap, min_dist=int(min_dist),
        )
        n_unique = int(n_unique)
        n_keep = int(n_keep)
        if n_unique > ucap and ucap < num_iter:
            ucap = int(min(num_iter, max(4 * ucap, n_unique)))
            continue
        if n_keep > ncap and ncap < ucap:
            nms_cap = int(min(ucap, max(4 * ncap, n_keep)))
            continue
        break

    accepted = np.asarray(accepted)
    circles = np.asarray(circles)[accepted]
    scores = np.asarray(scores)[accepted]
    return circles, scores


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_length", "num_iter", "min_radius", "max_radius", "unique_cap",
    ),
)
def _detect_rois(rois, low_q, high_q, min_roundness, keys, *, grid_length,
                 num_iter, min_radius, max_radius, unique_cap):
    n, l, _ = rois.shape

    def one(roi, key):
        edges, _dx, _dy, grad_angles = edge_pipeline(roi, low_q, high_q)
        cands, any_edges = candidate_circles(edges, grid_length=grid_length,
                                             num_iter=num_iter, key=key)
        valid = jnp.full((num_iter,), True) & any_edges
        uniq, uvalid, _n = dedupe_circles(
            cands, valid, height=l, width=l, min_radius=min_radius,
            max_radius=max_radius, cap=unique_cap,
        )
        ga, eg, pad = _pad_for_scoring(grad_angles, edges, max_radius)
        shifted = uniq.at[:, :2].add(pad)
        scores = score_circles(ga, eg, shifted, uvalid, max_radius=max_radius)
        scores = jnp.where(scores >= min_roundness, scores, -jnp.inf)
        best = jnp.argmax(scores)
        return uniq[best], scores[best]

    return jax.vmap(one)(rois, keys)


def detect_best_in_rois(
    rois: np.ndarray,
    low_edge_quantile: float,
    high_edge_quantile: float,
    grid_length: int,
    num_iter: int,
    min_radius: int,
    max_radius: int,
    min_roundness: float,
    seed: int = 0,
    unique_cap: int = 4096,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Best circle per ROI for a batch of same-size ROIs.

    Batched equivalent of the reference's per-chamber re-detection loop
    (find.py:324-360, min_dist=0 and argmax over scores). Returns
    (circles (N, 3) int32, scores (N,), found (N,) bool).
    """
    rois = jnp.asarray(np.ascontiguousarray(rois), dtype=jnp.float32)
    n = rois.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    num_iter = max(int(num_iter), 1)
    circles, scores = _detect_rois(
        rois, float(low_edge_quantile), float(high_edge_quantile),
        float(min_roundness), keys,
        grid_length=int(grid_length), num_iter=num_iter,
        min_radius=int(min_radius), max_radius=int(max_radius),
        unique_cap=int(min(unique_cap, num_iter)),
    )
    circles = np.asarray(circles)
    scores = np.asarray(scores)
    return circles, scores, np.isfinite(scores)
