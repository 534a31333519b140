"""Whole-dataset save/load round-trip (reference file.py:6-17).

The reference uses netCDF; this framework uses a single ``.npz`` file
carrying every variable plus a JSON manifest of dims/coords/attrs. Saving
unstacks any multi-index (netCDF can't store them either); loading
re-stacks ``mark = (mark_row, mark_col)`` for chip datasets, matching the
reference's behavior.
"""

from __future__ import annotations


import json

import numpy as np

from magnify_tpu.core import Dataset

__all__ = ["load", "save"]


def save(file, xp: Dataset) -> None:
    """Save a dataset (or DataArray) to a single npz file."""
    from magnify_tpu.core import DataArray

    if isinstance(xp, DataArray):
        xp = Dataset({xp.name or "data": xp}, attrs=xp.attrs)
    xp = xp.unstack()
    manifest = {"attrs": xp.attrs, "vars": {}, "coords": []}
    arrays = {}
    for name, var in xp.variables.items():
        manifest["vars"][name] = {"dims": list(var.dims)}
        if name in xp._coord_names:
            manifest["coords"].append(name)
        values = var.values
        if values.dtype == object:
            values = values.astype(str)
        arrays[f"var_{name}"] = values
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest, default=str).encode(), dtype=np.uint8
    )
    np.savez(file, **arrays)


def load(file) -> Dataset:
    """Load a dataset saved by :func:`save`; re-stack chip multi-indexes."""
    with np.load(file, allow_pickle=False) as npz:
        manifest = json.loads(bytes(npz["__manifest__"]).decode())
        ds = Dataset(attrs=manifest.get("attrs", {}))
        for name, spec in manifest["vars"].items():
            ds[name] = (tuple(spec["dims"]), npz[f"var_{name}"])
        for name in manifest.get("coords", []):
            ds._coord_names.add(name)
    if "mark_row" in ds.dims and "mark_col" in ds.dims:
        ds = ds.stack(mark=("mark_row", "mark_col")).transpose("mark", ...)
    return ds
