"""Native (C++) IO runtime, built on first use and bound via ctypes.

Provides :func:`read_regions` — thread-pooled pread + optional zlib inflate
of many file regions into one buffer — used by the TIFF loader for batched
page/strip decoding, and :func:`lz4_decompress` — the LZ4 block decoder
behind blosc-lz4 zarr chunks (the zarr-v2 default compressor), replacing a
pure-Python byte loop. Falls back cleanly to pure-Python IO when no
compiler is available (``available()`` is False).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess

import numpy as np

__all__ = ["available", "lz4_decompress", "read_regions"]

_lib = None
_tried = False
_SRC = pathlib.Path(__file__).with_name("io_native.cpp")


def _build() -> pathlib.Path | None:
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache = pathlib.Path(
        os.environ.get(
            "MAGNIFY_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "magnify_tpu"),
        )
    ) / "native"
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"io_native_{tag}.so"
    if so.exists():
        return so
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC),
        "-o", str(so), "-lz", "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("MAGNIFY_TPU_DISABLE_NATIVE"):
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.mgtpu_read_regions.restype = ctypes.c_int
        lib.mgtpu_read_regions.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.mgtpu_lz4_decompress.restype = ctypes.c_int64
        lib.mgtpu_lz4_decompress.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        if lib.mgtpu_version() != 2:
            return None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def read_regions(path, src_offsets, src_sizes, dst_offsets, dst_sizes,
                 out: np.ndarray, compression: int = 0,
                 n_threads: int | None = None) -> None:
    """Fill ``out`` (uint8, writable, C-contiguous) with file regions.

    compression 0 copies raw bytes; 8 inflates zlib/DEFLATE streams of
    ``dst_sizes`` decompressed bytes each.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    n = len(src_offsets)
    arr = lambda v: np.ascontiguousarray(np.asarray(v, dtype=np.int64))
    so, ss = arr(src_offsets), arr(src_sizes)
    do, ds = arr(dst_offsets), arr(dst_sizes)
    if n_threads is None:
        n_threads = min(16, os.cpu_count() or 4)
    assert out.dtype == np.uint8 and out.flags.c_contiguous
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    rc = lib.mgtpu_read_regions(
        str(path).encode(), n, p(so), p(ss), p(do), p(ds),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(compression), int(n_threads),
    )
    if rc != 0:
        raise IOError(f"native read_regions failed with status {rc} for {path}")


def lz4_decompress(src: bytes, max_out: int) -> bytes:
    """Decode one LZ4 block (the stream codec inside blosc-lz4 chunks).

    ``max_out`` bounds the decoded size (blosc stores it per stream);
    raises ValueError on a corrupt block, RuntimeError if the native
    library is unavailable (callers check :func:`available` first).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    out = np.empty(max_out, np.uint8)
    src_arr = np.frombuffer(src, np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    n = lib.mgtpu_lz4_decompress(
        src_arr.ctypes.data_as(u8p), len(src),
        out.ctypes.data_as(u8p), max_out,
    )
    if n < 0:
        raise ValueError(f"corrupt LZ4 block (native status {n})")
    return out[:n].tobytes()
