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

__all__ = ["blosc_decompress", "open_any_store", "open_store",
           "open_zarr_v2", "open_zarr_v3", "write_store", "write_zarr_v2"]

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


def write_zarr_v2(path, dataset: Dataset, level: int = 5) -> None:
    """Write a Dataset as a zarr-v2 directory store (zlib-compressed).

    The layout xarray/zarr-python read directly (one chunk per variable,
    ``_ARRAY_DIMENSIONS`` attributes, numcodecs ``zlib`` compressor), so
    reference-era tooling can re-open outputs written by this framework —
    the reverse direction of :func:`open_zarr_v2`.
    """
    root = pathlib.Path(path)
    root.mkdir(parents=True, exist_ok=True)
    (root / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    (root / ".zattrs").write_text(
        json.dumps(dataset.attrs, default=str))
    for name, var in dataset.variables.items():
        values = np.ascontiguousarray(var.values)
        if values.dtype == object:
            values = values.astype(str)
        adir = root / name
        adir.mkdir(exist_ok=True)
        (adir / ".zarray").write_text(json.dumps({
            "zarr_format": 2,
            "shape": list(values.shape),
            "chunks": list(values.shape) if values.ndim else [1],
            "dtype": values.dtype.str,
            "compressor": {"id": "zlib", "level": int(level)},
            "fill_value": None,
            "order": "C",
            "filters": None,
        }))
        (adir / ".zattrs").write_text(json.dumps(
            {"_ARRAY_DIMENSIONS": list(var.dims)}))
        chunk_name = ".".join(["0"] * max(values.ndim, 1))
        (adir / chunk_name).write_bytes(zlib.compress(values.tobytes(),
                                                      int(level)))


def _lz4_block_decompress(src: bytes, max_out: int) -> bytes:
    """LZ4 *block* format decoder (the codec inside blosc-lz4).

    Token = 4-bit literal length | 4-bit match length; lengths >= 15 extend
    with 255-terminated byte runs; matches copy byte-wise from the already
    produced output (overlap allowed). Stops when the input is consumed.

    Routes to the native C++ decoder when available (the Python byte loop
    below runs ~MB/s; blosc-lz4 is the zarr-v2 DEFAULT compressor, so big
    store reads sit on this path) — parity-fuzzed in tests/test_io.py.
    """
    from magnify_tpu import native

    if native.available():
        return native.lz4_decompress(src, max_out)
    out = bytearray()
    pos = 0
    n = len(src)
    while pos < n:
        token = src[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        out += src[pos:pos + lit]
        pos += lit
        if pos >= n:
            break  # last sequence carries no match
        offset = src[pos] | (src[pos + 1] << 8)
        pos += 2
        if offset == 0:
            raise ValueError("corrupt LZ4 block: zero match offset")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("corrupt LZ4 block: offset before start")
        for i in range(mlen):  # byte-wise: overlapping self-copy semantics
            out.append(out[start + i])
        if len(out) > max_out:
            raise ValueError("corrupt LZ4 block: output overrun")
    return bytes(out)


# c-blosc1 numeric codec ids (header flags bits 5-7).
_BLOSC_CODECS = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}


def _blosc_stream_decompress(codec: str, payload: bytes, ubytes: int) -> bytes:
    if codec == "zlib":
        return zlib.decompress(payload)
    if codec == "zstd":
        import zstandard

        return zstandard.ZstdDecompressor().decompress(
            payload, max_output_size=ubytes)
    if codec == "lz4":
        return _lz4_block_decompress(payload, ubytes)
    raise ValueError(
        f"blosc inner codec {codec!r} is not supported; re-save with "
        "lz4/zstd/zlib (or no compressor)."
    )


def _blosc_parse_block(raw: bytes, start: int, ubytes: int, nsplits: int,
                       codec: str) -> bytes:
    """One blosc block: ``nsplits`` streams, each an int32 length followed
    by payload; a stream whose length equals its uncompressed size is
    stored raw (c-blosc's incompressible-data path)."""
    neblock = ubytes // nsplits
    leftovers = ubytes - neblock * nsplits
    out = bytearray()
    pos = start
    for s in range(nsplits):
        want = neblock + (leftovers if s == nsplits - 1 else 0)
        (csize,) = np.frombuffer(raw, np.uint32, 1, pos)
        pos += 4
        payload = raw[pos:pos + int(csize)]
        pos += int(csize)
        if int(csize) == want:
            out += payload
        else:
            piece = _blosc_stream_decompress(codec, payload, want)
            if len(piece) != want:
                raise ValueError("blosc stream size mismatch")
            out += piece
    return bytes(out)


def _unshuffle_bytes(data: bytes, typesize: int) -> bytes:
    """Reverse c-blosc byte shuffling: all 0th bytes first, then 1st, ..."""
    arr = np.frombuffer(data, np.uint8)
    n = arr.size // typesize
    full = arr[: n * typesize].reshape(typesize, n).T.reshape(-1)
    return full.tobytes() + data[n * typesize:]


def blosc_decompress(raw: bytes) -> bytes:
    """Decode a c-blosc1 frame (the default zarr-v2 chunk compressor)
    without the blosc library: parse the 16-byte header + per-block offset
    table, decompress each block's streams (lz4 via the native C++ decoder
    when built, else pure Python; zstd/zlib via their libraries), and undo
    byte shuffling."""
    if len(raw) < 16:
        raise ValueError("blosc frame shorter than its header")
    flags, typesize = raw[2], raw[3]
    nbytes, blocksize, _cbytes = np.frombuffer(raw, np.uint32, 3, 4)
    nbytes, blocksize = int(nbytes), int(blocksize)
    if flags & 0x2:  # pure memcpy frame
        return raw[16:16 + nbytes]
    if flags & 0x4:
        raise ValueError("blosc bit-shuffle is not supported")
    codec = _BLOSC_CODECS.get((flags >> 5) & 0x7, "?")
    shuffled = bool(flags & 0x1) and typesize > 1

    nblocks = max(1, -(-nbytes // blocksize))
    bstarts = np.frombuffer(raw, np.uint32, nblocks, 16)

    # c-blosc1 splits a block into `typesize` streams for blosclz/lz4 when
    # typesize <= 16 and the split streams stay above its minimum buffer;
    # exact historical conditions vary, so try the likely split first and
    # fall back to the other parse on a malformed read.
    likely_split = (codec in ("blosclz", "lz4") and 1 < typesize <= 16
                    and blocksize // typesize >= 128)
    candidates = (typesize, 1) if likely_split else (1, typesize)

    out = bytearray()
    for b in range(nblocks):
        ubytes = min(blocksize, nbytes - b * blocksize)
        piece = None
        err = None
        for nsplits in candidates:
            if nsplits < 1 or (nsplits > 1 and ubytes % nsplits):
                continue
            try:
                piece = _blosc_parse_block(raw, int(bstarts[b]), ubytes,
                                           nsplits, codec)
                break
            except Exception as e:  # try the other split interpretation
                err = e
        if piece is None:
            raise ValueError(f"could not parse blosc block {b}: {err}")
        if shuffled:
            piece = _unshuffle_bytes(piece, typesize)
        out += piece
    return bytes(out)


def _zarr_decompress(raw: bytes, compressor) -> bytes:
    if compressor is None:
        return raw
    cid = compressor.get("id")
    if cid in ("zlib",):
        return zlib.decompress(raw)
    if cid in ("gzip",):
        import gzip

        return gzip.decompress(raw)
    if cid == "blosc":
        return blosc_decompress(raw)
    if cid == "zstd":
        import zstandard

        return zstandard.ZstdDecompressor().decompress(raw)
    raise ValueError(
        f"Unsupported zarr compressor {cid!r}; re-save with blosc "
        "(lz4/zstd/zlib inner), zstd, zlib, gzip, or no compressor."
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


def _v3_decode_chunk(raw: bytes, codecs, dtype, chunk_shape) -> np.ndarray:
    """Apply a zarr-v3 codec chain in reverse (bytes<-compressors)."""
    data = raw
    endian = "little"
    array_codecs = []
    for codec in codecs:
        name = codec.get("name")
        conf = codec.get("configuration", {}) or {}
        if name == "bytes":
            endian = conf.get("endian", "little")
            array_codecs.append(("bytes", endian))
        elif name in ("gzip",):
            array_codecs.append(("gzip", None))
        elif name in ("zstd",):
            array_codecs.append(("zstd", None))
        elif name in ("blosc",):
            array_codecs.append(("blosc", None))
        elif name in ("crc32c",):
            array_codecs.append(("crc32c", None))
        else:
            raise ValueError(f"Unsupported zarr v3 codec {name!r}.")
    for name, conf in reversed(array_codecs):
        if name == "bytes":
            break
        if name == "crc32c":
            data = data[:-4]
        elif name == "gzip":
            import gzip

            data = gzip.decompress(data)
        elif name == "zstd":
            import zstandard

            data = zstandard.ZstdDecompressor().decompress(
                data, max_output_size=int(np.prod(chunk_shape))
                * dtype.itemsize)
        elif name == "blosc":
            data = blosc_decompress(data)
    dt = dtype.newbyteorder("<" if endian == "little" else ">")
    return np.frombuffer(data, dt).astype(dtype).reshape(chunk_shape)


_V3_DTYPES = {"bool": "bool"}


def _read_zarr_v3_array(adir: pathlib.Path, meta: dict) -> np.ndarray:
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunk_grid"]["configuration"]["chunk_shape"])
    dtype = np.dtype(_V3_DTYPES.get(meta["data_type"], meta["data_type"]))
    fill = meta.get("fill_value", 0)
    if fill in ("NaN", "nan"):
        fill = np.nan
    codecs = meta.get("codecs", [{"name": "bytes"}])
    enc = meta.get("chunk_key_encoding",
                   {"name": "default", "configuration": {"separator": "/"}})
    sep = (enc.get("configuration") or {}).get("separator", "/")
    v2_style = enc.get("name") == "v2"

    out = np.full(shape, fill if fill is not None else 0, dtype=dtype)
    grid = [max(1, -(-s // c)) for s, c in zip(shape, chunks)]
    for idx in np.ndindex(*grid):
        if v2_style:
            name = sep.join(str(i) for i in idx) if shape else "0"
        else:
            name = "c" + sep + sep.join(str(i) for i in idx) if shape else "c"
        fp = adir / name if sep == "." or v2_style else adir.joinpath(
            *name.split("/"))
        if not fp.exists():
            continue
        block = _v3_decode_chunk(fp.read_bytes(), codecs, dtype, chunks)
        sl = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        trim = tuple(slice(0, s.stop - s.start) for s in sl)
        out[sl] = block[trim]
    return out


def open_zarr_v3(path, group: str | None = None) -> Dataset:
    """Read a zarr-v3 directory (zarr.json metadata documents)."""
    root = pathlib.Path(path)
    if group:
        root = root / group
    meta = json.loads((root / "zarr.json").read_text())
    ds = Dataset(attrs={k: v for k, v in meta.get("attributes", {}).items()
                        if not k.startswith("_")})
    if meta.get("node_type") == "array":
        raise ValueError(
            f"{path} is a bare zarr v3 array; open its parent group."
        )
    for sub in sorted(root.iterdir()):
        zj = sub / "zarr.json"
        if not zj.is_file():
            continue
        arr_meta = json.loads(zj.read_text())
        if arr_meta.get("node_type") != "array":
            continue
        values = _read_zarr_v3_array(sub, arr_meta)
        dims = (arr_meta.get("dimension_names")
                or arr_meta.get("attributes", {}).get("_ARRAY_DIMENSIONS"))
        if dims is None:
            dims = tuple(f"dim_{i}" for i in range(values.ndim))
        ds[sub.name] = (tuple(dims), values)
        if values.ndim == 1 and tuple(dims)[0] == sub.name:
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
    if (root / "zarr.json").is_file():
        return open_zarr_v3(root)
    if (root / ".zattrs").is_file() or (root / ".zgroup").is_file():
        return open_zarr_v2(root)
    raise ValueError(f"{path} is not a recognized store directory.")
