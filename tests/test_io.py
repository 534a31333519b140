"""IO layer: TIFF roundtrips, path grammar, reader, stores, save/load."""

import datetime
import os

import json
import numpy as np
import pytest

import magnify_tpu as mg
from magnify_tpu.core import DataArray, Dataset
from magnify_tpu.io import tiff
from magnify_tpu.io.file import load, save
from magnify_tpu.io.reader import Reader, extract_paths
from magnify_tpu.io.zarrlite import open_store, write_store
from tests.synth import draw_beads


# -- tiff --------------------------------------------------------------------

@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
def test_tiff_roundtrip_dtypes(tmp_path, dtype):
    rng = np.random.default_rng(0)
    arr = (rng.random((32, 48)) * 200).astype(dtype)
    path = tmp_path / "x.tif"
    tiff.write_tiff(path, arr)
    back = tiff.read_tiff(path)
    np.testing.assert_array_equal(back, arr)
    assert back.dtype == dtype


def test_tiff_multipage_ome(tmp_path):
    arr = np.arange(3 * 2 * 16 * 16, dtype=np.uint16).reshape(3, 2, 16, 16)
    path = tmp_path / "stack.ome.tif"
    tiff.write_tiff(path, arr, channels=["a", "b"])
    info = tiff.probe(path)
    assert info.axes == "TCYX"
    assert info.shape == (3, 2, 16, 16)
    assert info.channels == ["a", "b"]
    np.testing.assert_array_equal(tiff.read_tiff(path), arr)
    np.testing.assert_array_equal(tiff.read_page(path, 5),
                                  arr.reshape(-1, 16, 16)[5])


def _write_deflate_predictor_tiff(path, arr: np.ndarray, rows_per_strip: int):
    """Hand-assemble a classic little-endian TIFF with deflate compression
    (tag 259 = 8) and horizontal-differencing predictor (tag 317 = 2),
    split into multiple strips — the native decode branch of
    io/tiff.py:183-199 that PIL interop (uncompressed) never reaches."""
    import struct
    import zlib

    h, w = arr.shape
    itemsize = arr.dtype.itemsize
    strips = []
    for r0 in range(0, h, rows_per_strip):
        rows = arr[r0: r0 + rows_per_strip].astype(arr.dtype)
        # Predictor 2: store per-row deltas (wrapping in the storage dtype).
        delta = rows.copy()
        delta[:, 1:] = rows[:, 1:] - rows[:, :-1]  # uint wraps mod 2^bits
        strips.append(zlib.compress(delta.astype("<" + arr.dtype.str[1:]
                                                 ).tobytes()))

    n_strips = len(strips)
    # Layout: header(8) | IFD | offsets arrays | strip data.
    entries = []

    def entry(tag, typ, count, value_bytes):
        entries.append((tag, typ, count, value_bytes.ljust(4, b"\0")))

    def short(v):
        return struct.pack("<H", v) + b"\0\0"

    def long(v):
        return struct.pack("<I", v)

    n_entries = 11
    ifd_off = 8
    arrays_off = ifd_off + 2 + n_entries * 12 + 4
    offsets_bytes = 4 * n_strips
    data_off = arrays_off + 2 * offsets_bytes
    strip_offsets = []
    pos = data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    entry(256, 3, 1, short(w))
    entry(257, 3, 1, short(h))
    entry(258, 3, 1, short(itemsize * 8))
    entry(259, 3, 1, short(8))  # deflate
    entry(262, 3, 1, short(1))
    if n_strips == 1:
        entry(273, 4, 1, long(strip_offsets[0]))
        entry(279, 4, 1, long(len(strips[0])))
    else:
        entry(273, 4, n_strips, long(arrays_off))
        entry(279, 4, n_strips, long(arrays_off + offsets_bytes))
    entry(277, 3, 1, short(1))
    entry(278, 3, 1, short(rows_per_strip))
    entry(317, 3, 1, short(2))  # horizontal differencing
    entry(339, 3, 1, short(1))
    entries.sort()

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", n_entries)
    for tag, typ, count, val in entries:
        out += struct.pack("<HHI", tag, typ, count) + val
    out += b"\0\0\0\0"  # next IFD
    for off in strip_offsets:
        out += struct.pack("<I", off)
    for s in strips:
        out += struct.pack("<I", len(s))
    assert len(out) == data_off
    for s in strips:
        out += s
    path.write_bytes(bytes(out))


def test_tiff_deflate_predictor_decode(tmp_path):
    """The native deflate+predictor strip decode matches the source array,
    including uint16 deltas that wrap mod 2^16 and multi-strip joins."""
    rng = np.random.default_rng(11)
    # Large jumps force wrapping deltas; 7 rows over rows_per_strip=3
    # exercises the ragged final strip.
    arr = (rng.integers(0, 65536, (7, 13))).astype(np.uint16)
    arr[:, 0] = 60000
    arr[:, 1] = 5  # delta wraps negative
    path = tmp_path / "pred.tif"
    _write_deflate_predictor_tiff(path, arr, rows_per_strip=3)
    got = tiff.read_page(path, 0)
    np.testing.assert_array_equal(got, arr)
    # PIL agrees on the same file (cross-decoder oracle).
    from PIL import Image

    with Image.open(path) as im:
        np.testing.assert_array_equal(np.asarray(im), arr)


def test_tiff_pil_interop(tmp_path):
    from PIL import Image

    arr = (np.random.default_rng(1).random((20, 20)) * 999).astype(np.uint16)
    ours = tmp_path / "ours.tif"
    tiff.write_tiff(ours, arr)
    with Image.open(ours) as im:
        np.testing.assert_array_equal(np.asarray(im), arr)

    theirs = tmp_path / "theirs.tif"
    Image.fromarray(arr).save(theirs)
    np.testing.assert_array_equal(tiff.read_tiff(theirs), arr)


# -- path grammar --------------------------------------------------------------

def make_tree(tmp_path, layout):
    for rel, arr in layout.items():
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        tiff.write_tiff(p, arr, ome=False)


def test_extract_paths_channel_dirs(tmp_path):
    img = np.zeros((8, 8), np.uint16)
    make_tree(tmp_path, {"egfp/a.tif": img, "cy5/a.tif": img})
    paths, meta = extract_paths(str(tmp_path / "(channel)/a.tif"),
                                assay="str", channel="str", time="time",
                                row="int", col="int")
    assert len(paths) == 2
    keys = sorted(paths)
    assert keys[0][1] == "cy5"
    assert keys[1][1] == "egfp"
    assert all(k[0] is None and k[2] is None for k in keys)


def test_extract_paths_rows_cols_and_time(tmp_path):
    img = np.zeros((8, 8), np.uint16)
    layout = {}
    for t in ["20240101-000000", "20240101-000100"]:
        for r in range(2):
            for c in range(2):
                layout[f"{t}/img_{r}_{c}.tif"] = img
    make_tree(tmp_path, layout)
    paths, _ = extract_paths(
        str(tmp_path / "(time)/img_(row)_(col).tif"),
        assay="str", channel="str", time="time", row="int", col="int",
    )
    assert len(paths) == 8
    k = sorted(paths)[0]
    assert isinstance(k[2], datetime.datetime)
    assert k[3] == 0 and k[4] == 0


def test_extract_paths_custom_time_format(tmp_path):
    img = np.zeros((8, 8), np.uint16)
    make_tree(tmp_path, {"t_0130/x.tif": img})
    paths, _ = extract_paths(str(tmp_path / "t_(time|%H%M)/x.tif"),
                             assay="str", channel="str", time="time",
                             row="int", col="int")
    ((_, _, t, _, _),) = paths.keys()
    assert (t.hour, t.minute) == (1, 30)


def test_extract_paths_metadata_coord(tmp_path):
    img = np.zeros((8, 8), np.uint16)
    make_tree(tmp_path, {"ch0_100nM/x.tif": img, "ch1_200nM/x.tif": img})
    paths, meta = extract_paths(
        str(tmp_path / "ch(channel)_(conc_channel)nM/x.tif"),
        assay="str", channel="str", time="time", row="int", col="int",
    )
    assert len(paths) == 2
    assert meta[("conc", "channel")] == {"0": "100", "1": "200"}


def test_extract_paths_duplicate_index_error(tmp_path):
    img = np.zeros((8, 8), np.uint16)
    make_tree(tmp_path, {"a/x.tif": img, "a/y.tif": img})
    with pytest.raises(ValueError, match="same index"):
        extract_paths(str(tmp_path / "(channel)/*.tif"),
                      assay="str", channel="str", time="time", row="int",
                      col="int")


# -- reader --------------------------------------------------------------------

def test_reader_missing_pattern_raises():
    reader = Reader()
    with pytest.raises(FileNotFoundError):
        list(reader("/nonexistent/(channel)/*.tif"))


def test_reader_builds_lazy_tile_stack(tmp_path):
    img0 = draw_beads((64, 64), [[32, 32]]).astype(np.uint16)
    img1 = (img0 * 2).astype(np.uint16)
    make_tree(tmp_path, {"red/img.tif": img0, "green/img.tif": img1})
    reader = Reader()
    (ds,) = list(reader(str(tmp_path / "(channel)/img.tif")))
    assert ds.tile.dims == ("channel", "tile_y", "tile_x")
    assert list(ds.channel.values) == ["green", "red"]
    np.testing.assert_array_equal(ds.tile.isel(channel=1).values, img0)


def test_reader_multi_assay(tmp_path):
    img = np.zeros((8, 8), np.uint16)
    make_tree(tmp_path, {"exp2/x.tif": img, "exp10/x.tif": img})
    reader = Reader()
    out = list(reader(str(tmp_path / "(assay)/x.tif")))
    assert [ds.attrs["name"] for ds in out] == ["exp2", "exp10"]  # natural sort


def test_image_pipeline_from_tiff_grid(tmp_path):
    rng = np.random.default_rng(2)
    tiles = {}
    full = {}
    for r in range(2):
        for c in range(2):
            t = (rng.random((20, 20)) * 999).astype(np.uint16)
            tiles[f"g/tile_{r}_{c}.tif"] = t
            full[(r, c)] = t
    make_tree(tmp_path, tiles)
    xp = mg.image(str(tmp_path / "g/tile_(row)_(col).tif"), overlap=0)
    assert xp.sizes["im_y"] == 40
    assert xp.sizes["im_x"] == 40
    np.testing.assert_array_equal(xp.image.values[:20, 20:], full[(0, 1)])


def test_reader_ome_stack_channels_times(tmp_path):
    arr = np.random.default_rng(3).integers(0, 999, (3, 2, 16, 16)).astype(
        np.uint16
    )
    # OME TCYX stack (3 timepoints x 2 channels) in a single file.
    tiff.write_tiff(tmp_path / "s.ome.tif", arr, channels=["bf", "gfp"])
    reader = Reader()
    (ds,) = list(reader(str(tmp_path / "s.ome.tif")))
    assert ds.tile.dims == ("channel", "time", "tile_y", "tile_x")
    assert list(ds.channel.values) == ["bf", "gfp"]
    np.testing.assert_array_equal(
        ds.tile.values, arr.transpose(1, 0, 2, 3)
    )


# -- stores + save/load ----------------------------------------------------------

def test_store_roundtrip(tmp_path):
    ds = Dataset(
        {"image": (("channel", "y", "x"),
                   np.arange(2 * 4 * 4, dtype=np.float32).reshape(2, 4, 4))},
        coords={"channel": ["a", "b"]},
        attrs={"name": "exp"},
    )
    write_store(tmp_path / "store", ds)
    back = open_store(tmp_path / "store")
    np.testing.assert_array_equal(back.image.values, ds.image.values)
    assert list(back.channel.values) == ["a", "b"]
    assert back.attrs["name"] == "exp"
    assert "channel" in back.coords


def test_reader_opens_store_dir(tmp_path):
    ds = Dataset({"tile": (("tile_y", "tile_x"), np.ones((8, 8)))})
    write_store(tmp_path / "run1", ds)
    reader = Reader()
    (back,) = list(reader(str(tmp_path / "run1")))
    np.testing.assert_array_equal(back.tile.values, np.ones((8, 8)))


def test_save_load_roundtrip_beads(tmp_path):
    ds = Dataset(
        {"roi": (("mark", "roi_y", "roi_x"),
                 np.arange(2 * 3 * 3, dtype=np.float32).reshape(2, 3, 3))},
        coords={"x": (("mark",), np.array([1.0, 2.0])),
                "tag": (("mark",), np.array(["a", "b"]))},
        attrs={"name": "run"},
    )
    save(tmp_path / "out.npz", ds)
    back = load(tmp_path / "out.npz")
    np.testing.assert_array_equal(back.roi.values, ds.roi.values)
    assert list(back.tag.values) == ["a", "b"]
    assert "x" in back.coords


def test_save_load_restacks_chip(tmp_path):
    ds = Dataset(
        {"roi": (("mark_row", "mark_col", "roi_y"),
                 np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4))},
    )
    st = ds.stack(mark=("mark_row", "mark_col")).transpose("mark", ...)
    save(tmp_path / "chip.npz", st)
    back = load(tmp_path / "chip.npz")
    assert "mark" in back.dims
    un = back.unstack()
    np.testing.assert_array_equal(
        un.roi.transpose("mark_row", "mark_col", "roi_y").values,
        ds.roi.values,
    )


def test_native_batch_page_reader(tmp_path):
    from magnify_tpu import native
    from magnify_tpu.io.tiff import read_pages

    arr = np.random.default_rng(9).integers(0, 999, (6, 33, 47)).astype(
        np.uint16
    )
    p = tmp_path / "batch.tif"
    tiff.write_tiff(p, arr, axes="TYX", ome=False)
    out = read_pages(p, [0, 3, 5])
    np.testing.assert_array_equal(out, arr[[0, 3, 5]])
    # Whole-series read goes through the same path.
    np.testing.assert_array_equal(tiff.read_tiff(p), arr)
    # Report whether the native library actually built (informational).
    assert native.available() in (True, False)


def test_native_read_regions_roundtrip(tmp_path):
    from magnify_tpu import native

    if not native.available():
        pytest.skip("native IO unavailable (no compiler)")
    blob = np.random.default_rng(10).integers(0, 255, 4096).astype(np.uint8)
    p = tmp_path / "blob.bin"
    p.write_bytes(blob.tobytes())
    out = np.zeros(600, np.uint8)
    native.read_regions(p, [100, 2000], [200, 400], [0, 200], [200, 400], out)
    np.testing.assert_array_equal(out[:200], blob[100:300])
    np.testing.assert_array_equal(out[200:], blob[2000:2400])


def test_open_zarr_v2_layout(tmp_path):
    """Read a hand-built zarr-v2 directory (the legacy-store format the
    reference reopens, reader.py:57-65)."""
    import json
    import zlib

    from magnify_tpu.io.zarrlite import open_zarr_v2

    root = tmp_path / "legacy"
    (root / "image").mkdir(parents=True)
    (root / ".zattrs").write_text(json.dumps({"name": "legacy-run"}))
    (root / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    arr = np.arange(24, dtype=np.float64).reshape(4, 6)
    meta = {
        "zarr_format": 2, "shape": [4, 6], "chunks": [2, 6],
        "dtype": "<f8", "order": "C", "fill_value": 0,
        "compressor": {"id": "zlib", "level": 1}, "filters": None,
    }
    (root / "image" / ".zarray").write_text(json.dumps(meta))
    (root / "image" / ".zattrs").write_text(
        json.dumps({"_ARRAY_DIMENSIONS": ["y", "x"]})
    )
    for i in range(2):
        chunk = arr[i * 2:(i + 1) * 2]
        (root / "image" / f"{i}.0").write_bytes(
            zlib.compress(np.ascontiguousarray(chunk).tobytes())
        )
    ds = open_zarr_v2(root)
    np.testing.assert_array_equal(ds.image.values, arr)
    assert ds.image.dims == ("y", "x")
    assert ds.attrs["name"] == "legacy-run"


def test_reader_path_channels_with_in_file_times(tmp_path):
    """Channels from the path grammar combined with a time axis inside each
    OME file (reader.py:259-260 disjointness contract)."""
    rng = np.random.default_rng(5)
    stacks = {}
    for ch in ["red", "green"]:
        arr = rng.integers(0, 999, (3, 1, 12, 14)).astype(np.uint16)  # TCYX
        (tmp_path / ch).mkdir()
        tiff.write_tiff(tmp_path / ch / "s.ome.tif", arr)
        stacks[ch] = arr[:, 0]
    reader = Reader()
    (ds,) = list(reader(str(tmp_path / "(channel)/s.ome.tif")))
    assert ds.tile.dims == ("channel", "time", "tile_y", "tile_x")
    assert ds.sizes["channel"] == 2 and ds.sizes["time"] == 3
    np.testing.assert_array_equal(ds.tile.sel(channel="red").values,
                                  stacks["red"])
    np.testing.assert_array_equal(ds.tile.sel(channel="green").values,
                                  stacks["green"])


def test_reader_rejects_overlapping_dims(tmp_path):
    # Time both in the path and inside the file must be rejected.
    arr = np.zeros((3, 1, 8, 8), np.uint16)
    (tmp_path / "t0").mkdir()
    tiff.write_tiff(tmp_path / "t0" / "s.ome.tif", arr)
    reader = Reader()
    with pytest.raises(ValueError, match="overlap"):
        list(reader(str(tmp_path / "t(time|%S)/s.ome.tif")))


# -- interchange: netCDF, blosc, zarr v3 ----------------------------------------


def _chiplike_dataset():
    ds = Dataset({"roi": (("mark_row", "mark_col", "roi_y", "roi_x"),
                          np.arange(2 * 3 * 4 * 4,
                                    dtype=np.uint16).reshape(2, 3, 4, 4))},
                 attrs={"name": "exp1"})
    return ds.assign_coords(
        tag=(("mark_row", "mark_col"),
             np.array([["a", "b", ""], ["c", "d", "e"]])),
        x=(("mark_row", "mark_col"), np.arange(6, dtype=float).reshape(2, 3)),
        mark_row=(("mark_row",), np.array([0, 1])),
    )


def test_netcdf_round_trip(tmp_path):
    import magnify_tpu as mg

    ds = _chiplike_dataset().stack(mark=("mark_row", "mark_col"))
    ds = ds.transpose("mark", ...)
    path = tmp_path / "out.nc"
    mg.save(path, ds)
    assert path.open("rb").read(4).startswith(b"\x89HDF")  # real netCDF4
    back = mg.load(path)
    assert back.roi.sizes["mark"] == 6  # multi-index re-stacked
    np.testing.assert_array_equal(
        back.roi.transpose("mark", "roi_y", "roi_x").values,
        ds.roi.transpose("mark", "roi_y", "roi_x").values)
    assert back.attrs["name"] == "exp1"
    assert "tag" in back.coords and "x" in back.coords
    assert back.tag.values.tolist() == ["a", "b", "", "c", "d", "e"]


def test_netcdf3_classic_reads(tmp_path):
    """Classic netCDF-3 written by an independent implementation (scipy)
    loads through mg.load."""
    import scipy.io

    import magnify_tpu as mg

    path = tmp_path / "classic.nc"
    f = scipy.io.netcdf_file(str(path), "w")
    f.createDimension("t", 3)
    tv = f.createVariable("t", "i4", ("t",))
    tv[:] = [1, 2, 3]
    sv = f.createVariable("signal", "f4", ("t",))
    sv[:] = [0.5, 1.5, 2.5]
    f._attributes["name"] = "classic"
    f.close()

    back = mg.load(path)
    assert back.signal.values.tolist() == [0.5, 1.5, 2.5]
    assert "t" in back.coords
    assert back.attrs["name"] == "classic"


def _lz4_compress_literals(data: bytes) -> bytes:
    """Minimal conforming LZ4 block: one all-literal sequence."""
    n = len(data)
    if n < 15:
        return bytes([n << 4]) + data
    out = bytearray([0xF0])
    rest = n - 15
    while rest >= 255:
        out.append(255)
        rest -= 255
    out.append(rest)
    return bytes(out) + data


def _blosc_frame(payload: np.ndarray, codec_id: int, streams, *,
                 shuffle: bool, blocksize: int) -> bytes:
    """Hand-build a c-blosc1 frame: header, bstarts, per-block streams.
    ``streams(chunk) -> bytes or None`` compresses one stream (None =
    store raw, the incompressible path)."""
    raw = payload.tobytes()
    typesize = payload.dtype.itemsize
    nbytes = len(raw)
    nblocks = max(1, -(-nbytes // blocksize))
    header = bytearray(16)
    header[0], header[1] = 2, 1
    flags = (codec_id << 5) | (1 if shuffle else 0)
    header[2], header[3] = flags, typesize
    header[4:8] = np.uint32(nbytes).tobytes()
    header[8:12] = np.uint32(blocksize).tobytes()

    split = codec_id in (0, 1) and 1 < typesize <= 16 and (
        blocksize // typesize >= 128)
    body = bytearray()
    bstarts = []
    pos = 16 + 4 * nblocks
    for b in range(nblocks):
        bstarts.append(pos)
        block = raw[b * blocksize:(b + 1) * blocksize]
        if shuffle and typesize > 1:
            arr = np.frombuffer(block, np.uint8)
            m = arr.size // typesize
            shuf = (arr[:m * typesize].reshape(m, typesize).T.reshape(-1)
                    .tobytes() + block[m * typesize:])
            block = shuf
        nsplits = typesize if split else 1
        neblock = len(block) // nsplits
        for s in range(nsplits):
            want = (len(block) - neblock * (nsplits - 1)
                    if s == nsplits - 1 else neblock)
            start = s * neblock
            chunk = block[start:start + want]
            comp = streams(chunk)
            if comp is None or len(comp) >= want:
                body += np.uint32(want).tobytes() + chunk
                pos += 4 + want
            else:
                body += np.uint32(len(comp)).tobytes() + comp
                pos += 4 + len(comp)
    header[12:16] = np.uint32(pos).tobytes()
    return bytes(header) + b"".join(np.uint32(s).tobytes()
                                    for s in bstarts) + bytes(body)


def test_blosc_decode_paths():
    from magnify_tpu.io.zarrlite import blosc_decompress

    rng = np.random.default_rng(0)
    data = rng.integers(0, 50, 4096).astype(np.uint16)

    # lz4 inner codec, shuffled, split streams (the zarr default layout).
    frame = _blosc_frame(data, 1, _lz4_compress_literals, shuffle=True,
                         blocksize=2048)
    assert np.array_equal(
        np.frombuffer(blosc_decompress(frame), np.uint16), data)

    # Incompressible path: every stream stored raw.
    frame = _blosc_frame(data, 1, lambda b: None, shuffle=False,
                         blocksize=2048)
    assert np.array_equal(
        np.frombuffer(blosc_decompress(frame), np.uint16), data)

    # zstd inner codec (real compressor), unsplit, shuffled.
    import zstandard

    comp = zstandard.ZstdCompressor().compress
    frame = _blosc_frame(data, 4, comp, shuffle=True, blocksize=2048)
    assert np.array_equal(
        np.frombuffer(blosc_decompress(frame), np.uint16), data)

    # memcpy frame.
    raw = data.tobytes()
    header = bytearray(16)
    header[0], header[2], header[3] = 2, 0x2, 2
    header[4:8] = np.uint32(len(raw)).tobytes()
    header[8:12] = np.uint32(len(raw)).tobytes()
    header[12:16] = np.uint32(16 + len(raw)).tobytes()
    assert blosc_decompress(bytes(header) + raw) == raw


def test_lz4_block_matches():
    """Hand-crafted LZ4 block with a real back-reference match."""
    from magnify_tpu.io.zarrlite import _lz4_block_decompress

    # "abcd" literals, then match of length 8 at offset 4 -> "abcdabcdabcd",
    # then final literal sequence "XY".
    block = bytes([0x44]) + b"abcd" + bytes([0x04, 0x00])
    block += bytes([0x20]) + b"XY"
    out = _lz4_block_decompress(block, 64)
    assert out == b"abcd" + b"abcdabcd" + b"XY"


def test_zarr_v2_blosc_chunks(tmp_path):
    """A zarr-v2 store whose chunks are blosc-compressed loads."""
    from magnify_tpu.io.zarrlite import open_zarr_v2

    root = tmp_path / "store"
    (root / "image").mkdir(parents=True)
    data = np.arange(64, dtype=np.uint16).reshape(8, 8)
    frame = _blosc_frame(data.ravel(), 1, _lz4_compress_literals,
                         shuffle=True, blocksize=data.nbytes)
    (root / ".zgroup").write_text('{"zarr_format": 2}')
    (root / "image" / ".zarray").write_text(json.dumps({
        "zarr_format": 2, "shape": [8, 8], "chunks": [8, 8],
        "dtype": "<u2", "order": "C", "fill_value": 0,
        "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5,
                       "shuffle": 1},
    }))
    (root / "image" / ".zattrs").write_text(
        '{"_ARRAY_DIMENSIONS": ["y", "x"]}')
    (root / "image" / "0.0").write_bytes(frame)
    ds = open_zarr_v2(root)
    np.testing.assert_array_equal(ds.image.values, data)


def test_zarr_v3_store_reads(tmp_path):
    """A zarr-v3 group (zarr.json metadata, c/-prefixed chunks, zstd and
    gzip codecs) loads through open_any_store."""
    import gzip

    import zstandard

    from magnify_tpu.io.zarrlite import open_any_store

    root = tmp_path / "v3store"
    root.mkdir()
    (root / "zarr.json").write_text(json.dumps({
        "zarr_format": 3, "node_type": "group",
        "attributes": {"name": "v3exp"},
    }))

    img = np.arange(96, dtype=np.float32).reshape(8, 12)
    adir = root / "image"
    (adir / "c" / "0").mkdir(parents=True)
    (adir / "zarr.json").write_text(json.dumps({
        "zarr_format": 3, "node_type": "array", "shape": [8, 12],
        "data_type": "float32",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [8, 6]}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": "/"}},
        "codecs": [{"name": "bytes",
                    "configuration": {"endian": "little"}},
                   {"name": "zstd", "configuration": {"level": 3}}],
        "fill_value": 0.0, "dimension_names": ["y", "x"],
    }))
    comp = zstandard.ZstdCompressor()
    for j in range(2):
        chunk = np.ascontiguousarray(img[:, j * 6:(j + 1) * 6])
        (adir / "c" / "0" / str(j)).write_bytes(
            comp.compress(chunk.tobytes()))

    tdir = root / "t"
    (tdir / "c").mkdir(parents=True)
    (tdir / "zarr.json").write_text(json.dumps({
        "zarr_format": 3, "node_type": "array", "shape": [8],
        "data_type": "int64",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [8]}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": "/"}},
        "codecs": [{"name": "bytes",
                    "configuration": {"endian": "little"}},
                   {"name": "gzip", "configuration": {"level": 5}}],
        "fill_value": 0, "dimension_names": ["t"],
    }))
    (tdir / "c" / "0").write_bytes(
        gzip.compress(np.arange(8, dtype=np.int64).tobytes()))

    ds = open_any_store(root)
    np.testing.assert_array_equal(ds.image.values, img)
    assert ds.image.dims == ("y", "x")
    assert "t" in ds.coords
    assert ds.attrs["name"] == "v3exp"


def test_lzw_tiff_reads(tmp_path):
    """LZW-compressed TIFFs (PIL-written) decode through the PIL fallback."""
    from PIL import Image

    from magnify_tpu.io import tiff

    arr = (np.arange(48 * 64) % 251).astype(np.uint8).reshape(48, 64)
    p = tmp_path / "lzw.tif"
    Image.fromarray(arr).save(p, compression="tiff_lzw")
    got = tiff.read_tiff(p)
    np.testing.assert_array_equal(got, arr)


def _write_tiff_deflate_predictor(path, arr):
    """Minimal single-strip little-endian TIFF with deflate + horizontal
    predictor (hand-built: the framework's writer doesn't emit predictors,
    so this exercises the reader against an independent construction)."""
    import struct
    import zlib

    h, w = arr.shape
    diff = arr.astype(np.int32)
    diff[:, 1:] = diff[:, 1:] - diff[:, :-1]
    payload = zlib.compress(diff.astype(arr.dtype).tobytes())

    bits = arr.dtype.itemsize * 8
    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, bits),
        (259, 3, 1, 8),            # deflate
        (262, 3, 1, 1),
        (273, 4, 1, 0),            # strip offset (patched below)
        (277, 3, 1, 1),
        (278, 3, 1, h),
        (279, 4, 1, len(payload)),
        (317, 3, 1, 2),            # horizontal predictor
    ]
    ifd = struct.pack("<H", len(tags))
    for tag, typ, cnt, val in tags:
        ifd += struct.pack("<HHI", tag, typ, cnt) + struct.pack("<I", val)
    ifd += struct.pack("<I", 0)
    header = struct.pack("<2sHI", b"II", 42, 8)
    strip_off = 8 + len(ifd)
    # patch tag 273's value (6th tag entry, value at offset 8 within entry)
    entry_pos = 2 + 5 * 12 + 8
    ifd = ifd[:entry_pos] + struct.pack("<I", strip_off) + ifd[entry_pos + 4:]
    path.write_bytes(header + ifd + payload)


def test_deflate_predictor_tiff_reads(tmp_path):
    """Deflate-compressed strips with TIFF predictor 2 decode correctly
    (the predictor reversal is a wrapping per-row cumsum)."""
    from magnify_tpu.io import tiff

    rng = np.random.default_rng(0)
    for dtype in (np.uint8, np.uint16):
        arr = rng.integers(0, np.iinfo(dtype).max, (20, 31)).astype(dtype)
        p = tmp_path / f"pred_{dtype.__name__}.tif"
        _write_tiff_deflate_predictor(p, arr)
        got = tiff.read_tiff(p)
        np.testing.assert_array_equal(got, arr)
        # The multi-page reader path must agree (native gate falls back).
        got2 = tiff.read_pages(p, [0])[0]
        np.testing.assert_array_equal(got2, arr)


def test_tiled_tiff_reads_via_fallback(tmp_path):
    """Tiled TIFFs (tile tags instead of strips) decode via PIL."""
    from PIL import Image

    from magnify_tpu.io import tiff

    arr = (np.arange(128 * 96) % 251).astype(np.uint8).reshape(128, 96)
    p = tmp_path / "tiled.tif"
    Image.fromarray(arr).save(p, compression="tiff_adobe_deflate",
                              tiffinfo={322: 64, 323: 64})
    np.testing.assert_array_equal(tiff.read_tiff(p), arr)


def test_write_zarr_v2_round_trip(tmp_path):
    """Datasets written as zarr v2 re-open (and follow the spec layout a
    zarr/xarray reader expects: .zgroup, .zarray with numcodecs zlib,
    _ARRAY_DIMENSIONS)."""
    from magnify_tpu.io.zarrlite import open_any_store, write_zarr_v2

    ds = Dataset({"image": (("y", "x"),
                            np.arange(48, dtype=np.uint16).reshape(6, 8))},
                 attrs={"name": "run1"})
    ds = ds.assign_coords(y=(("y",), np.arange(6)))
    root = tmp_path / "store"
    write_zarr_v2(root, ds)

    meta = json.loads((root / "image" / ".zarray").read_text())
    assert meta["zarr_format"] == 2
    assert meta["compressor"] == {"id": "zlib", "level": 5}
    assert json.loads((root / "image" / ".zattrs").read_text()) == {
        "_ARRAY_DIMENSIONS": ["y", "x"]}

    back = open_any_store(root)
    np.testing.assert_array_equal(back.image.values, ds.image.values)
    assert back.image.dims == ("y", "x")
    assert "y" in back.coords
    assert back.attrs["name"] == "run1"


def _lz4_block_build(seqs, tail):
    """Assemble a valid LZ4 block from (literals, offset, match_len>=4)
    sequences plus a final literal-only tail; returns (block, decoded)."""
    out = bytearray()
    block = bytearray()

    def ext(n):
        b = bytearray()
        while n >= 255:
            b.append(255)
            n -= 255
        b.append(n)
        return b

    for lits, off, mlen in seqs:
        lit = len(lits)
        tok_l = min(lit, 15)
        tok_m = min(mlen - 4, 15)
        block.append((tok_l << 4) | tok_m)
        if tok_l == 15:
            block += ext(lit - 15)
        block += lits
        out += lits
        block += bytes([off & 0xFF, off >> 8])
        if tok_m == 15:
            block += ext(mlen - 4 - 15)
        start = len(out) - off
        for i in range(mlen):
            out.append(out[start + i])
    tok_l = min(len(tail), 15)
    block.append(tok_l << 4)
    if tok_l == 15:
        block += ext(len(tail) - 15)
    block += tail
    out += tail
    return bytes(block), bytes(out)


def test_lz4_native_python_parity_fuzz(monkeypatch):
    """The native C++ LZ4 block decoder and the pure-Python fallback decode
    identical bytes on randomized valid blocks (short/long literal runs,
    overlapping matches, 255-extended lengths)."""
    from magnify_tpu import native
    from magnify_tpu.io import zarrlite

    rng = np.random.default_rng(7)
    blocks = []
    for _trial in range(40):
        seqs = []
        produced = 8
        first = rng.integers(0, 256, produced, dtype=np.uint8).tobytes()
        seqs.append((first, int(rng.integers(1, produced + 1)),
                     int(rng.integers(4, 20))))
        produced = len(first) + seqs[0][2]
        for _s in range(int(rng.integers(0, 5))):
            lit_len = int(rng.choice([0, 3, 15, 16, 300]))
            lits = rng.integers(0, 256, lit_len, dtype=np.uint8).tobytes()
            off = int(rng.integers(1, produced + lit_len + 1))
            mlen = int(rng.choice([4, 7, 19, 20, 280]))
            seqs.append((lits, off, mlen))
            produced += lit_len + mlen
        tail_len = int(rng.choice([0, 2, 15, 40, 270]))
        tail = rng.integers(0, 256, tail_len, dtype=np.uint8).tobytes()
        blocks.append(_lz4_block_build(seqs, tail))

    for block, expect in blocks:
        py = None
        if native.available():
            got_native = native.lz4_decompress(block, len(expect))
            assert got_native == expect
        # Force the pure-Python loop for the parity leg.
        monkeypatch.setattr(native, "available", lambda: False)
        py = zarrlite._lz4_block_decompress(block, len(expect))
        monkeypatch.undo()
        assert py == expect

    # Corrupt blocks raise on both decoders: zero match offset.
    bad = bytes([0x14]) + b"a" + bytes([0x00, 0x00])
    with pytest.raises(ValueError):
        zarrlite._lz4_block_decompress(bad, 64)
    monkeypatch.setattr(native, "available", lambda: False)
    with pytest.raises(ValueError):
        zarrlite._lz4_block_decompress(bad, 64)
