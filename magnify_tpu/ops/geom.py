"""Device-side geometry: disk/annulus rasterization and batched ROI gather.

The reference rasterizes masks by scattering ``filled_circle_points`` /
``cv.circle`` pixels on host (/root/reference/src/magnify/utils.py:30-52,
find.py:383-397). Point scatters are hostile to TPUs, so these kernels use the
per-row extent tables from :func:`magnify_tpu.utils.disk_extents`: a filled
Bresenham disk is exactly ``{(dy, dx): |dy| <= r, |dx| <= ext_r[|dy|]}``,
which rasterizes as one gather plus a vectorized compare. The resulting masks
are pixel-identical to the host rasterizer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from magnify_tpu import utils

__all__ = [
    "bounding_box_corners",
    "disk_mask",
    "annulus_mask",
    "extent_lut",
    "extract_rois",
    "perimeter_tables",
    "rotate_plane",
]


@functools.lru_cache(maxsize=None)
def extent_lut(max_radius: int) -> np.ndarray:
    """EXT[r, a] = half-width of the radius-r Bresenham disk in row ±a.

    Entries with a > r are -1 (empty row), so a plain compare produces the
    mask without branching. Shape (max_radius + 1, max_radius + 1), int32.
    """
    lut = -np.ones((max_radius + 1, max_radius + 1), dtype=np.int32)
    for r in range(max_radius + 1):
        lut[r, : r + 1] = utils.disk_extents(r)
    return lut


@functools.lru_cache(maxsize=None)
def perimeter_tables(max_radius: int, four_connected: bool = False):
    """Padded Bresenham perimeter offsets for every radius up to max_radius.

    Returns (offsets, lengths, expected_angles):
      offsets: (max_radius + 1, L, 2) int32, padded rows repeat offset 0
      lengths: (max_radius + 1,) int32 true perimeter lengths
      expected_angles: (max_radius + 1, L) float32 of atan2(row, col) per
        offset — the radial direction used by the roundness score
        (/root/reference/src/magnify/utils.py:234).
    """
    tables = [utils.circle_points(r, four_connected) for r in range(max_radius + 1)]
    lengths = np.array([len(t) for t in tables], dtype=np.int32)
    L = int(lengths.max())
    offsets = np.zeros((max_radius + 1, L, 2), dtype=np.int32)
    for r, t in enumerate(tables):
        offsets[r, : len(t)] = t
    angles = np.arctan2(offsets[..., 0], offsets[..., 1]).astype(np.float32)
    return offsets, lengths, angles


def disk_mask(shape, center_row, center_col, radius, max_radius):
    """Boolean mask of a filled Bresenham disk, pixel-identical to
    ``utils.circle(shape, center, radius)``.

    ``center_row``/``center_col``/``radius`` may be traced scalars; ``shape``
    and ``max_radius`` are static.
    """
    lut = jnp.asarray(extent_lut(max_radius))
    h, w = shape
    radius = jnp.clip(radius, 0, max_radius)
    rows = jnp.abs(jnp.arange(h) - center_row)
    cols = jnp.abs(jnp.arange(w) - center_col)
    width = jnp.where(rows <= radius, lut[radius, jnp.minimum(rows, max_radius)], -1)
    return cols[None, :] <= width[:, None]


def annulus_mask(shape, center_row, center_col, outer_radius, inner_radius,
                 max_radius):
    """Annulus between two Bresenham disks (outer & ~inner), matching
    ``utils.annulus`` (reference find.py:383-390 background masks)."""
    outer = disk_mask(shape, center_row, center_col, outer_radius, max_radius)
    inner = disk_mask(shape, center_row, center_col, inner_radius, max_radius)
    return outer & ~inner


def bounding_box_corners(x, y, box_length: int, image_width: int,
                         image_height: int):
    """(top, left) of the slid-not-shrunk ROI window; device version of
    ``utils.bounding_box``."""
    top = jnp.clip(y - box_length // 2, 0, image_height - box_length)
    left = jnp.clip(x - box_length // 2, 0, image_width - box_length)
    return top, left


@functools.partial(jax.jit, static_argnames=())
def rotate_plane(image, degrees):
    """Rotate a 2-D plane about its center (bilinear, zero fill).

    Device implementation of the rotation the reference left commented out
    (/root/reference/src/magnify/preprocess.py:54-59, dask_image rotate with
    reshape=False): output keeps the input shape.
    """
    h, w = image.shape
    theta = jnp.deg2rad(degrees)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rows = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    cols = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    # Inverse mapping: output pixel <- input coordinates.
    src_r = cos_t * rows + sin_t * cols + cy
    src_c = -sin_t * rows + cos_t * cols + cx

    r0 = jnp.floor(src_r)
    c0 = jnp.floor(src_c)
    fr = src_r - r0
    fc = src_c - c0

    img = image.astype(jnp.float32)

    def sample(rr, cc):
        inside = (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
        rr = jnp.clip(rr, 0, h - 1).astype(jnp.int32)
        cc = jnp.clip(cc, 0, w - 1).astype(jnp.int32)
        return jnp.where(inside, img[rr, cc], 0.0)

    out = (
        sample(r0, c0) * (1 - fr) * (1 - fc)
        + sample(r0, c0 + 1) * (1 - fr) * fc
        + sample(r0 + 1, c0) * fr * (1 - fc)
        + sample(r0 + 1, c0 + 1) * fr * fc
    )
    return out


def extract_rois(image, tops, lefts, roi_length: int):
    """Gather fixed-size ROI windows: image (..., H, W) -> (N, ..., L, L).

    Batched dynamic-slice replacement for the reference's per-marker numpy
    crop loops (/root/reference/src/magnify/find.py:589-602).
    """
    def one(top, left):
        start = (0,) * (image.ndim - 2) + (top, left)
        sizes = image.shape[:-2] + (roi_length, roi_length)
        return jax.lax.dynamic_slice(image, start, sizes)

    return jax.vmap(one)(tops, lefts)
