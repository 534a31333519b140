"""Directory stores: the framework's native store plus zarr-v2 reading.

Two jobs the reference delegates to zarr:

* re-opening prior experiment outputs, including legacy "prismo" layouts
  (/root/reference/src/magnify/reader.py:57-65),
* flatfield/darkfield correction images stored per channel
  (preprocess.py:66-76).

The native store is a plain directory: one ``.npy`` per variable (memmap-
readable, so reads stay out-of-core) plus a JSON manifest of dims, coords
and attrs. Zarr v2 directories (``.zgroup``/``.zarray`` JSON + chunk files)
are read directly for null/zlib/gzip compressors so existing datasets
remain loadable without the zarr package.
"""

from __future__ import annotations

import json
import os
import pathlib
import zlib

import numpy as np

from magnify_tpu.core import Dataset

__all__ = ["open_any_store", "open_store", "open_zarr_v2", "write_store"]

MANIFEST = "manifest.json"


def write_store(path, dataset: Dataset, group: str | None = None) -> None:
    """Write a Dataset as a native directory store."""
    root = pathlib.Path(path)
    if group:
        root = root / group
    root.mkdir(parents=True, exist_ok=True)
    manifest = {"attrs": dataset.attrs, "vars": {}, "coords": []}
    for name, var in dataset.variables.items():
        values = var.values
        np.save(root / f"{name}.npy", values, allow_pickle=False)
        manifest["vars"][name] = {"dims": list(var.dims)}
        if name in dataset._coord_names:
            manifest["coords"].append(name)
    (root / MANIFEST).write_text(json.dumps(manifest, default=str))


def open_store(path, group: str | None = None) -> Dataset:
    """Open a native directory store lazily (variables are memmaps)."""
    root = pathlib.Path(path)
    if group and (root / group / MANIFEST).exists():
        root = root / group
    manifest = json.loads((root / MANIFEST).read_text())
    ds = Dataset(attrs=manifest.get("attrs", {}))
    coords = set(manifest.get("coords", []))
    for name, spec in manifest["vars"].items():
        data = np.load(root / f"{name}.npy", mmap_mode="r",
                       allow_pickle=False)
        ds[name] = (tuple(spec["dims"]), data)
        if name in coords:
            ds._coord_names.add(name)
    return ds


def _zarr_decompress(raw: bytes, compressor) -> bytes:
    if compressor is None:
        return raw
    cid = compressor.get("id")
    if cid in ("zlib",):
        return zlib.decompress(raw)
    if cid in ("gzip",):
        import gzip

        return gzip.decompress(raw)
    raise ValueError(
        f"Unsupported zarr compressor {cid!r}; re-save with compressor=None, "
        "zlib, or gzip."
    )


def _read_zarr_array(adir: pathlib.Path) -> np.ndarray:
    meta = json.loads((adir / ".zarray").read_text())
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    dtype = np.dtype(meta["dtype"])
    fill = meta.get("fill_value", 0)
    order = meta.get("order", "C")
    sep = meta.get("dimension_separator", ".")
    out = np.full(shape, fill if fill is not None else 0, dtype=dtype)
    grid = [max(1, -(-s // c)) for s, c in zip(shape, chunks)]
    for idx in np.ndindex(*grid):
        name = sep.join(str(i) for i in idx) if shape else "0"
        fp = adir / name
        if not fp.exists():
            continue
        raw = _zarr_decompress(fp.read_bytes(), meta.get("compressor"))
        block = np.frombuffer(raw, dtype=dtype)
        bshape = chunks
        block = block.reshape(bshape, order=order)
        sl = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        trim = tuple(slice(0, s.stop - s.start) for s in sl)
        out[sl] = block[trim]
    return out


def open_zarr_v2(path, group: str | None = None) -> Dataset:
    """Read a zarr-v2 directory written by xarray (incl. prismo layouts)."""
    root = pathlib.Path(path)
    if group:
        root = root / group
    attrs = {}
    zattrs = root / ".zattrs"
    if zattrs.exists():
        attrs = json.loads(zattrs.read_text())
    ds = Dataset(attrs={k: v for k, v in attrs.items()
                        if not k.startswith("_")})
    for sub in sorted(root.iterdir()):
        if not (sub / ".zarray").is_file():
            continue
        arr_attrs = {}
        if (sub / ".zattrs").exists():
            arr_attrs = json.loads((sub / ".zattrs").read_text())
        dims = arr_attrs.get("_ARRAY_DIMENSIONS")
        values = _read_zarr_array(sub)
        if dims is None:
            dims = tuple(f"dim_{i}" for i in range(values.ndim))
        ds[sub.name] = (tuple(dims), values)
        if values.ndim == 1 and dims[0] == sub.name:
            ds._coord_names.add(sub.name)
    return ds


def open_any_store(path) -> Dataset:
    """Open a directory as a dataset, dispatching on layout.

    Mirrors the reference's zarr-open branch (reader.py:57-65): a directory
    whose own ``.zattrs``/manifest exists is a group written by a recent
    version (the final path element names the group); otherwise it is a
    flat legacy layout.
    """
    root = pathlib.Path(path)
    if (root / MANIFEST).is_file():
        return open_store(root)
    if (root / ".zattrs").is_file() or (root / ".zgroup").is_file():
        return open_zarr_v2(root)
    raise ValueError(f"{path} is not a recognized store directory.")
