"""Input normalization: path patterns, lazy TIFF stacks, stores.

Implements the reference's reader contract
(/root/reference/src/magnify/reader.py): the ``Reader`` registered as
``"read"`` turns a path/glob (with ``(assay)``, ``(channel)``,
``(time|FMT)``, ``(row)``, ``(col)`` specifiers and attached metadata
``(NAME_KEY|TYPE|FMT)``), an in-memory DataArray/Dataset, or a sequence of
them into an iterator of raw per-assay datasets. TIFF stacks load lazily —
one chunk per page — through :mod:`magnify_tpu.io.tiff`, replacing the
reference's ``da.map_blocks`` page loader (reader.py:265-292).
"""

from __future__ import annotations

import collections
import datetime
import fnmatch
import glob as _glob
import os
import pathlib
import re

import numpy as np

from magnify_tpu import utils
from magnify_tpu.core import DataArray, Dataset
from magnify_tpu.core.lazy import ChunkedArray
from magnify_tpu.core.registry import readers
from magnify_tpu.io import tiff as tiff_io

__all__ = ["Reader", "extract_paths", "read_tiffs"]

_ALL_KEYS = ("assay", "channel", "time", "row", "col")


class Reader:
    """Normalize input into an iterator of raw assay datasets
    (reference reader.py:23-77)."""

    def __call__(self, data):
        items = ([data] if isinstance(data, utils.PathLike | DataArray | Dataset)
                 else data)
        for item in items:
            if isinstance(item, (DataArray, Dataset)):
                yield item
                continue

            path_dict, meta_dict = extract_paths(
                item, assay="str", channel="str", time="time", row="int",
                col="int",
            )
            if len(path_dict) == 0:
                raise FileNotFoundError(
                    f"The pattern {item} did not lead to any files."
                )

            # Nameless experiments get the empty-string name.
            path_dict = {("",) + k[1:] if k[0] is None else k: v
                         for k, v in path_dict.items()}
            names = sorted({k[0] for k in path_dict},
                           key=utils.natural_sort_key)
            for name in names:
                sub = {
                    tuple(-1 if v is None else v for v in k[1:]): p
                    for k, p in path_dict.items() if k[0] == name
                }
                path = pathlib.Path(next(iter(sub.values())))
                if len(sub) == 1 and path.is_dir():
                    from magnify_tpu.io.zarrlite import open_any_store

                    ds = open_any_store(path)
                    ds.attrs["name"] = name
                    yield ds
                else:
                    yield read_tiffs(sub, name=name, meta_dict=meta_dict)

    @readers.register("read")
    def make():
        return Reader()


_DEFAULT_FORMATTERS = {
    "": lambda x, y: x,
    "str": lambda x, y: x,
    "time": lambda x, y: datetime.datetime.strptime(
        x, y if y else "%Y%m%d-%H%M%S"
    ),
    "int": lambda x, y: int(x),
    "float": lambda x, y: float(x),
}


def extract_paths(pattern, **keys):
    """Expand a glob+specifier pattern into indexed paths and metadata.

    The grammar of reference reader.py:80-160: each ``(key)`` or
    ``(key|FMT)`` names a path component captured into that key's index;
    ``(name_key)`` / ``(name_key|TYPE|FMT)`` captures extra metadata mapped
    by that key. Returns (path_dict, meta_dict) where path_dict maps
    ``(assay, channel, time, row, col)`` index tuples (None for unused keys)
    to absolute paths; duplicate index tuples raise ValueError.
    """
    keys = {k: (f if callable(f) else _DEFAULT_FORMATTERS[f])
            for k, f in keys.items()}
    all_keys = list(keys)

    pattern = os.path.expanduser(str(pattern))
    meta = collections.defaultdict(dict)
    glob_path = pattern
    regex_path = fnmatch.translate(pattern)
    for key, formatter in list(keys.items()):
        glob_path = re.sub(rf"\({key}.*?\)", "*", glob_path)
        glob_path = re.sub(rf"\([^\(]*?_{key}.*?\)", "*", glob_path)
        regex_path = re.sub(rf"\\\({key}.*?\\\)", rf"(?P<{key}>[^/\\\]*?)",
                            regex_path)
        regex_path = re.sub(rf"\\\(([^\(]*?)_{key}.*?\\\)",
                            r"(?P<\1>[^/\\\]*?)", regex_path)

        key_search = re.search(rf"\({key}(?:\s*\|\s*(.*?))?\)", pattern)
        if key_search:
            format_str = key_search.group(1)
            keys[key] = lambda x, y=format_str, f=formatter: f(x, y)
        else:
            del keys[key]

        for name, fmt_name, format_str in re.findall(
            rf"\(([^\(]*?)_{key}(?:\s*\|\s*(.*?))?(?:\s*\|\s*(.*?))?\)",
            pattern,
        ):
            meta_formatter = _DEFAULT_FORMATTERS[fmt_name]
            meta[key][name] = (
                lambda x, y=format_str, f=meta_formatter: f(x, y)
            )

    regex = re.compile(regex_path, re.IGNORECASE)
    paths = _glob.glob(glob_path, recursive=True)

    path_dict = {}
    meta_dict = collections.defaultdict(dict)
    for path in paths:
        match = regex.fullmatch(path)
        if match is None:
            continue
        idxs = []
        for key in all_keys:
            if key in keys:
                value = keys[key](match.group(key))
                idxs.append(value)
                for name, formatter in meta[key].items():
                    meta_dict[name, key][value] = formatter(match.group(name))
            else:
                idxs.append(None)
        idxs = tuple(idxs)
        if idxs in path_dict:
            raise ValueError(
                f"{path} and {path_dict[idxs]} map to the same index."
            )
        path_dict[idxs] = os.path.abspath(path)

    return path_dict, meta_dict


_LETTER_TO_DIM = {
    "C": "channel",
    "T": "time",
    "Z": "depth",
    "Y": "tile_y",
    "X": "tile_x",
    "R": "tile_pos",
}


def read_tiffs(xp_dict, name, meta_dict) -> Dataset:
    """Assemble a lazy tile stack from indexed TIFF paths
    (reference reader.py:163-324): one lazy chunk per TIFF page."""
    channel_idxs, time_idxs, row_idxs, col_idxs = (
        sorted(set(idx)) for idx in zip(*xp_dict.keys())
    )

    dims_in_path = []
    outer_shape = ()
    if channel_idxs[0] != -1:
        dims_in_path.append("channel")
        outer_shape += (len(channel_idxs),)
    if time_idxs[0] != -1:
        dims_in_path.append("time")
        outer_shape += (len(time_idxs),)
    if row_idxs[0] != -1:
        dims_in_path.append("tile_row")
        outer_shape += (len(row_idxs),)
    if col_idxs[0] != -1:
        dims_in_path.append("tile_col")
        outer_shape += (len(col_idxs),)

    times = time_idxs if "time" in dims_in_path else None
    channels = channel_idxs if "channel" in dims_in_path else None

    first_path = next(iter(xp_dict.values()))
    info = tiff_io.probe(first_path)
    dims_in_file = [_LETTER_TO_DIM[c] for c in info.axes]
    inner_shape = tuple(info.shape)

    if times is None and info.times is not None:
        times = list(info.times)
    if channels is None and info.channels is not None:
        channels = list(info.channels)

    if "tile_pos" in dims_in_file:
        # Tiles always span files; users must specify tiles in the path.
        i = dims_in_file.index("tile_pos")
        inner_shape = inner_shape[:i] + inner_shape[i + 1:]
        dims_in_file = dims_in_file[:i] + dims_in_file[i + 1:]
    if "depth" in dims_in_file:
        raise ValueError("tiff files with a Z dimension are not yet supported.")
    if "tile_y" not in dims_in_file or "tile_x" not in dims_in_file:
        raise ValueError("tiff files must contain an X and Y dimension.")
    if set(dims_in_file).intersection(dims_in_path):
        raise ValueError(
            "Dimensions specified in the path names and inside the tiff file "
            "overlap."
        )

    filenames = [p for _, p in sorted(xp_dict.items())]
    page_shape = info.page_shape
    page_lead = inner_shape[: len(inner_shape) - len(page_shape)]

    def load_page(block_idx):
        outer_id = block_idx[: len(outer_shape)]
        inner_id = block_idx[len(outer_shape):]
        file_idx = (int(np.ravel_multi_index(outer_id, outer_shape))
                    if outer_shape else 0)
        page_idx = (int(np.ravel_multi_index(inner_id[: len(page_lead)],
                                             page_lead))
                    if page_lead else 0)
        page = tiff_io.read_page(filenames[file_idx], page_idx)
        lead = len(block_idx) - page.ndim
        return page.reshape((1,) * lead + page.shape)

    shape = outer_shape + inner_shape
    chunks = ((1,) * len(outer_shape) + (1,) * len(page_lead)
              + page_shape)
    tiles = ChunkedArray(load_page, shape=shape, dtype=info.dtype,
                         chunks=chunks)

    coords = {}
    if channels is not None:
        coords["channel"] = (("channel",), np.asarray(channels))
    if times is not None:
        stamps = [int(t.timestamp()) if isinstance(t, datetime.datetime)
                  else t for t in times]
        coords["time"] = (("time",), np.asarray(stamps))

    xp = Dataset(
        {"tile": (tuple(dims_in_path + dims_in_file), tiles)},
        coords=coords,
        attrs={"name": name},
    )
    xp = xp.transpose("channel", "time", "tile_row", "tile_col", "tile_y",
                      "tile_x", missing_dims="ignore")

    for (meta_name, dim), mapping in meta_dict.items():
        if dim not in xp.dims or dim not in xp.coords:
            continue
        dim_vals = xp[dim].values
        if dim == "time":
            dim_vals = [datetime.datetime.fromtimestamp(int(v))
                        for v in dim_vals]
        else:
            dim_vals = dim_vals.tolist()
        meta_vals = [mapping[v] for v in dim_vals]
        xp = xp.assign_coords({meta_name: ((dim,), np.asarray(meta_vals))})

    return xp
