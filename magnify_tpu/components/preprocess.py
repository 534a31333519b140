"""Preprocessing components: canonical layout, corrections, flips, masks.

Mirrors the registered component set of
/root/reference/src/magnify/preprocess.py: ``standardize_format``,
``rename_labels``, ``rotate`` (stub, as in the reference), ``flatfield_correct``,
``basic_correct``, ``horizontal_flip``, ``vertical_flip``, ``circle_mask``.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np

from magnify_tpu import utils
from magnify_tpu.core import DataArray, Dataset, Variable
from magnify_tpu.core.lazy import ChunkedArray
from magnify_tpu.core.registry import component

STANDARD_DIMS = ["channel", "time", "tile_row", "tile_col", "tile_y", "tile_x"]


@component("standardize_format")
def standardize_format(xp):
    """Normalize any input layout into the canonical 6-D tile stack.

    Same dim gymnastics as /root/reference/src/magnify/preprocess.py:11-41:
    rename x/y/row/col to tile_*, fold extra dims into time (renaming a real
    time dim to __time__ first), add missing dims, record the original order
    in ``__original_tile_dims__`` for restore_format, and transpose to
    (channel, time, tile_row, tile_col, tile_y, tile_x).
    """
    if isinstance(xp, DataArray):
        ds = Dataset({"tile": xp}, attrs=xp.attrs)
        xp = ds

    renames = {old: "tile_" + old for old in ["x", "y", "row", "col"]
               if old in xp.tile.dims}
    if renames:
        xp = xp.rename(renames)

    xp.attrs["__original_tile_dims__"] = list(xp.tile.dims)

    extra_dims = [d for d in xp.tile.dims if d not in STANDARD_DIMS]
    if extra_dims:
        if "time" in xp.tile.dims:
            xp = xp.rename({"time": "__time__"})
            extra_dims.append("__time__")
        xp = xp.stack(time=tuple(extra_dims))

    tile = xp["tile"]
    for dim in STANDARD_DIMS:
        if dim not in tile.dims:
            tile = tile.expand_dims(dim)
    xp["tile"] = tile

    return xp.transpose(*STANDARD_DIMS, missing_dims="ignore")


@component("rename_labels")
def rename_labels(xp, **coords):
    """Reassign coordinate labels by replacement dict or full list
    (reference preprocess.py:44-51)."""
    for name, new_labels in coords.items():
        if isinstance(new_labels, dict):
            vals = np.asarray(
                [new_labels.get(v, v) for v in xp[name].values.tolist()]
            )
            xp = xp.assign_coords({name: ((name,), vals)})
        else:
            xp = xp.assign_coords({name: ((name,), np.asarray(new_labels))})
    return xp


@component("rotate")
def rotate(xp, rotation=0):
    """Rotate the stitched image about its center.

    The reference registers this component but its body is commented out
    (/root/reference/src/magnify/preprocess.py:54-59), making it a silent
    no-op; here ``rotation`` (degrees) is applied for real — bilinear
    resampling on device, shape preserved — and ``rotation=0`` remains a
    no-op for exact parity with the default pipelines.
    """
    if rotation == 0 or "image" not in xp:
        return xp
    import jax
    import jax.numpy as jnp

    from magnify_tpu.ops.geom import rotate_plane

    var = xp["image"]
    image = var.values
    lead = image.shape[:-2]
    flat = image.reshape((-1,) + image.shape[-2:])
    rotated = jax.vmap(lambda p: rotate_plane(p, float(rotation)))(
        jnp.asarray(flat, jnp.float32)
    )
    out = np.asarray(rotated).reshape(image.shape).astype(image.dtype)
    xp["image"] = Variable(var.dims, out, var.variable.attrs)
    return xp


def _load_field(value, group):
    """Resolve scalar / TIFF path / store dir into an array or scalar."""
    if isinstance(value, os.PathLike | str):
        path = pathlib.Path(value).expanduser()
        if path.is_dir():
            from magnify_tpu.io.zarrlite import open_store

            ds = open_store(path, group=group)
            return ds[group]
        from magnify_tpu.io.tiff import read_tiff

        return read_tiff(path)
    return value


@component("flatfield_correct")
def flatfield_correct(xp, flatfield=1.0, darkfield=0.0):
    """Illumination correction: ``clip(tile - darkfield) / flatfield``,
    rescaled to preserve the maximum and cast back to the input dtype
    (reference preprocess.py:62-88). Scalar, TIFF-path, or store-dir
    corrections are accepted; lazy tiles stay lazy (two chunk passes: one
    reduction for the rescale factors, one deferred map).
    """
    flatfield = _load_field(flatfield, "flatfield")
    darkfield = _load_field(darkfield, "darkfield")
    if isinstance(flatfield, DataArray):
        flatfield = flatfield.values
    if isinstance(darkfield, DataArray):
        darkfield = darkfield.values

    # Identity correction (the pipeline defaults): mathematically a no-op on
    # non-negative data — skip the passes entirely. Unsigned dtypes are
    # non-negative by construction; eager signed/float data gets one cheap
    # min() check (the clip-at-zero still matters when negatives exist).
    identity = (np.isscalar(flatfield) and flatfield == 1.0
                and np.isscalar(darkfield) and darkfield == 0.0)
    if identity:
        if np.issubdtype(np.dtype(xp["tile"].dtype), np.unsignedinteger):
            return xp
        data = xp["tile"].data
        if (not isinstance(data, ChunkedArray)
                and np.asarray(data).size > 0
                and np.asarray(data).min() >= 0):
            return xp

    tile_var = xp["tile"]
    dtype = tile_var.dtype
    data = tile_var.data
    # float32 keeps uint16/float32 data exact; only widen for f64 inputs.
    work_dtype = np.result_type(dtype, np.float32)

    def corrected(block):
        return np.clip(block.astype(work_dtype) - darkfield, 0, None)

    if isinstance(data, ChunkedArray):
        if np.isscalar(flatfield) and flatfield == 1.0:
            # Unit flatfield: the rescale factor is exactly 1 (max_pre and
            # max_post are maxima of the SAME array), so the eager global-
            # max passes would read the whole lazy stack for nothing.
            # Defer the darkfield clip as a single chunk map — zero eager
            # reads; out-of-core stacks stay on disk.
            out = data.map_chunks(
                lambda b: corrected(b).astype(dtype), dtype=dtype,
            )
            xp["tile"] = Variable(tile_var.dims, out, tile_var.attrs)
            return xp
        # Pass 1: the two global maxima that set the rescale factor.
        max_pre = -np.inf
        max_post = -np.inf
        for idx in np.ndindex(*data.numblocks):
            block = corrected(data._block(idx))
            max_pre = max(max_pre, block.max(initial=-np.inf))
            max_post = max(max_post, (block / flatfield).max(initial=-np.inf))
        scale = max_pre / max_post if max_post > 0 else 1.0

        out = data.map_chunks(
            lambda b: ((corrected(b) / flatfield) * scale).astype(dtype),
            dtype=dtype,
        )
        xp["tile"] = Variable(tile_var.dims, out, tile_var.attrs)
    else:
        pre = corrected(np.asarray(data))
        if np.isscalar(flatfield) and flatfield == 1.0:
            # Unit flatfield: the rescale factor is exactly 1 and the
            # divide/multiply passes are identities — only the darkfield
            # clip (already applied) matters.
            xp["tile"] = Variable(tile_var.dims, pre.astype(dtype),
                                  tile_var.attrs)
            return xp
        max_pre = pre.max(initial=-np.inf)
        post = pre / flatfield
        max_post = post.max(initial=-np.inf)
        scale = max_pre / max_post if max_post > 0 else 1.0
        xp["tile"] = Variable(tile_var.dims, (post * scale).astype(dtype),
                              tile_var.attrs)
    return xp


@component("basic_correct")
def basic_correct(xp):
    """Retrospective illumination correction (reference preprocess.py:91-115).

    Uses BaSiC when the optional ``basicpy`` package is installed; otherwise
    the framework's own JAX implementation of the same model
    (:func:`magnify_tpu.ops.basic.fit_basic`: rank-1 baseline x smooth
    flatfield + smooth darkfield, DCT-sparsity smoothness, IRLS
    robustness — not a median stand-in, so structured darkfield is
    recovered too). Per channel, the fields are fit on the t=0 tiles
    (matching the reference's fit choice) and applied as
    ``(tile - darkfield) / flatfield`` to all tiles of that channel. Lazy
    tiles stay lazy.
    """
    try:
        import basicpy
    except ImportError:
        basicpy = None

    from magnify_tpu.core.lazy import ChunkedArray
    from magnify_tpu.ops.basic import fit_basic

    tile_var = xp["tile"]
    dtype = tile_var.dtype
    n_ch = xp.sizes["channel"]
    models = []
    for ci in range(n_ch):
        train = xp.tile.isel(channel=ci, time=0).values
        train = np.asarray(train).reshape(-1, train.shape[-2], train.shape[-1])
        if basicpy is not None:
            model = basicpy.basicpy.BaSiC(get_darkfield=True,
                                          smoothness_flatfield=1)
            model.fit(train)
            models.append((np.asarray(model.flatfield),
                           np.asarray(model.darkfield)))
        else:
            models.append(fit_basic(train, get_darkfield=True,
                                    smoothness_flatfield=1.0))

    def correct(block, slices):
        out = np.empty_like(block, dtype=float)
        for k, ci in enumerate(range(slices[0].start, slices[0].stop)):
            flat, dark = models[ci]
            out[k] = (block[k].astype(float) - dark) / flat
        return np.clip(out, 0, None).astype(dtype)

    data = tile_var.data
    if isinstance(data, ChunkedArray):
        xp["tile"] = Variable(
            tile_var.dims, data.map_chunks(correct, with_slices=True),
            tile_var.attrs,
        )
    else:
        out = np.empty_like(np.asarray(data))
        for ci in range(n_ch):
            flat, dark = models[ci]
            out[ci] = np.clip(
                (np.asarray(data)[ci].astype(float) - dark) / flat, 0, None
            ).astype(dtype)
        xp["tile"] = Variable(tile_var.dims, out, tile_var.attrs)
    xp.cache("tile")
    return xp


@component("horizontal_flip")
def horizontal_flip(xp):
    if "image" in xp:
        xp["image"] = xp.image.isel(im_x=slice(None, None, -1))
    else:
        xp["tile"] = xp.tile.isel(tile_x=slice(None, None, -1))
    return xp


@component("vertical_flip")
def vertical_flip(xp):
    if "image" in xp:
        xp["image"] = xp.image.isel(im_y=slice(None, None, -1))
    else:
        xp["tile"] = xp.tile.isel(tile_y=slice(None, None, -1))
    return xp


@component("circle_mask")
def circle_mask(xp, center, diameter, mask_inner=False):
    """Zero out pixels outside (or inside) a circle
    (reference preprocess.py:136-153)."""
    radius = diameter // 2
    name = "image" if "image" in xp else "tile"
    shape = xp[name].shape[-2:]
    mask = utils.circle(shape, center, radius, True)
    mask = ~mask if mask_inner else mask
    var = xp[name]
    xp[name] = Variable(var.dims, var.values * mask, var.variable.attrs)
    return xp
