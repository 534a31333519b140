"""Stitcher semantics: take-the-middle cropping and tile joining."""

import numpy as np
import pytest

from magnify_tpu.components.stitch import Stitcher
from magnify_tpu.core import Dataset
from magnify_tpu.core.lazy import from_block_function

DIMS = ("channel", "time", "tile_row", "tile_col", "tile_y", "tile_x")


def tiles_dataset(data):
    return Dataset({"tile": (DIMS, data)})


def test_middle_crop_placement():
    rng = np.random.default_rng(0)
    data = rng.random((1, 1, 2, 3, 40, 40))
    out = Stitcher(overlap=5)(tiles_dataset(data))
    assert "image" in out.data_vars
    assert out.sizes["im_y"] == 2 * 35
    assert out.sizes["im_x"] == 3 * 35
    np.testing.assert_array_equal(
        out.image[0, 0, 35:70, 35:70].values, data[0, 0, 1, 1, 2:37, 2:37]
    )


def test_single_tile():
    rng = np.random.default_rng(1)
    data = rng.random((1, 1, 1, 1, 30, 30))
    out = Stitcher(overlap=5)(tiles_dataset(data))
    assert out.sizes["im_y"] == 25
    assert out.sizes["im_x"] == 25
    np.testing.assert_array_equal(out.image[0, 0].values,
                                  data[0, 0, 0, 0, 2:27, 2:27])


def test_channels_and_time_preserved():
    rng = np.random.default_rng(2)
    data = rng.random((2, 3, 2, 2, 25, 25))
    ds = Dataset(
        {"tile": (DIMS, data)},
        coords={"channel": ["red", "green"], "time": [0, 1, 2]},
    )
    out = Stitcher(overlap=8)(ds)
    assert "channel" in out.image.dims
    assert "time" in out.image.dims
    assert out.sizes["channel"] == 2
    assert out.sizes["time"] == 3


def test_zero_overlap_is_plain_concat():
    rng = np.random.default_rng(3)
    data = rng.random((1, 1, 1, 2, 20, 20))
    out = Stitcher(overlap=0)(tiles_dataset(data))
    assert out.sizes["im_y"] == 20
    assert out.sizes["im_x"] == 40
    np.testing.assert_array_equal(out.image[0, 0, :, :20].values,
                                  data[0, 0, 0, 0])
    np.testing.assert_array_equal(out.image[0, 0, :, 20:].values,
                                  data[0, 0, 0, 1])


def test_odd_overlap_remainder_from_far_edge():
    rng = np.random.default_rng(4)
    data = rng.random((1, 1, 1, 1, 11, 11))
    out = Stitcher(overlap=3)(tiles_dataset(data))
    # clip 1 from each edge plus remainder 1 from the far edge.
    np.testing.assert_array_equal(out.image[0, 0].values,
                                  data[0, 0, 0, 0, 1:9, 1:9])


def test_negative_overlap_rejected():
    with pytest.raises(ValueError):
        Stitcher(overlap=-5)


def test_missing_tile_var_rejected():
    ds = Dataset({"other": (("x",), np.arange(3.0))})
    with pytest.raises(AttributeError):
        Stitcher(overlap=10)(ds)


def test_overlap_larger_than_tile_rejected():
    data = np.random.default_rng(5).random((1, 1, 2, 2, 50, 50))
    with pytest.raises(ValueError):
        Stitcher(overlap=100)(tiles_dataset(data))


def test_lazy_tiles_stay_lazy_until_read():
    rng = np.random.default_rng(6)
    full = rng.random((1, 1, 2, 2, 16, 16))
    loads = []

    def loader(idx):
        loads.append(idx)
        c, t, i, j = idx[:4]
        return full[c:c + 1, t:t + 1, i:i + 1, j:j + 1]

    lazy = from_block_function(
        loader, shape=full.shape, dtype=full.dtype,
        chunks=(1, 1, 1, 1, 16, 16),
    )
    ds = Dataset({"tile": (DIMS, lazy)})
    out = Stitcher(overlap=4)(ds)
    # cache() spilled the stitched image to a memmap; loads happened once
    # per tile.
    assert len(loads) == 4
    expected = np.concatenate(
        [np.concatenate([full[0, 0, i, j, 2:14, 2:14] for j in range(2)],
                        axis=1) for i in range(2)],
        axis=0,
    )
    np.testing.assert_array_equal(np.asarray(out.image[0, 0].values), expected)
