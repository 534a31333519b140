"""Unit tests for the labeled-array data model (core/xd.py)."""

import numpy as np
import pytest

from magnify_tpu.core import DataArray, Dataset


def make_ds():
    rng = np.random.default_rng(0)
    tile = rng.random((2, 3, 4, 5))
    ds = Dataset(
        {"tile": (("channel", "time", "y", "x"), tile)},
        coords={"channel": ["red", "green"], "time": [10, 20, 30]},
        attrs={"name": "exp"},
    )
    return ds, tile


def test_basic_construction():
    ds, tile = make_ds()
    assert ds.dims == {"channel": 2, "time": 3, "y": 4, "x": 5}
    assert "tile" in ds.data_vars
    assert "channel" in ds.coords
    assert ds.tile.shape == (2, 3, 4, 5)
    np.testing.assert_array_equal(ds.tile.values, tile)
    assert ds.attrs["name"] == "exp"


def test_isel_and_sel():
    ds, tile = make_ds()
    sub = ds.isel(time=1)
    assert "time" not in sub.tile.dims
    np.testing.assert_array_equal(sub.tile.values, tile[:, 1])

    red = ds.sel(channel="red")
    np.testing.assert_array_equal(red.tile.values, tile[0])

    both = ds.sel(channel=["green", "red"])
    np.testing.assert_array_equal(both.tile.values, tile[[1, 0]])

    t = ds.sel(time=20)
    np.testing.assert_array_equal(t.tile.values, tile[:, 1])


def test_dataarray_positional_indexing():
    ds, tile = make_ds()
    da = ds.tile
    np.testing.assert_array_equal(da[0].values, tile[0])
    np.testing.assert_array_equal(da[0, 1].values, tile[0, 1])
    np.testing.assert_array_equal(da[..., 2].values, tile[..., 2])
    assert da[0, 0, 0, 0].values.item() == tile[0, 0, 0, 0]


def test_transpose_ellipsis():
    ds, tile = make_ds()
    t = ds.tile.transpose("x", ...)
    assert t.dims == ("x", "channel", "time", "y")
    t2 = ds.tile.transpose(..., "channel")
    assert t2.dims == ("time", "y", "x", "channel")
    ds2 = ds.transpose("time", ...)
    assert ds2.tile.dims[0] == "time"


def test_arithmetic_broadcasting():
    ds, tile = make_ds()
    flat = np.full((4, 5), 2.0)
    out = ds.tile / DataArray(flat, dims=("y", "x"))
    np.testing.assert_allclose(out.values, tile / 2.0)
    # Scalar ops and comparisons.
    assert ((ds.tile * 0 + 1) == 1).all().values.item()


def test_where_and_reductions():
    ds, tile = make_ds()
    mask = DataArray(np.zeros((4, 5), bool), dims=("y", "x"))
    mask.data.flat[0] = True  # only element (0, 0)
    masked = ds.tile.where(mask)
    m = masked.mean(dim=["y", "x"])
    np.testing.assert_allclose(m.values, tile[..., 0, 0])
    s = ds.tile.sum(dim=["y", "x"])
    np.testing.assert_allclose(s.values, tile.sum(axis=(2, 3)))
    assert ds.tile.sum().values.item() == pytest.approx(tile.sum())


def test_squeeze_and_expand():
    da = DataArray(np.ones((1, 3)), dims=("a", "b"))
    assert da.squeeze().dims == ("b",)
    assert da.expand_dims("c").dims == ("c", "a", "b")


def test_assign_coords_and_attr_access():
    ds, _ = make_ds()
    ds2 = ds.assign_coords(meta=("time", ["a", "b", "c"]))
    assert "meta" in ds2.coords
    assert list(ds2.meta.values) == ["a", "b", "c"]
    # Coord carried onto DataArray.
    assert "meta" in ds2.tile.coords
    # Selection reduces coords.
    sub = ds2.isel(time=0)
    assert sub.meta.values.item() == "a"


def test_stack_unstack_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.random((2, 3, 4))
    ds = Dataset(
        {"roi": (("mark_row", "mark_col", "t"), x)},
        coords={"tag": (("mark_row", "mark_col"), np.array([["a", "b", "c"],
                                                            ["d", "e", "f"]]))},
    )
    st = ds.stack(mark=("mark_row", "mark_col"))
    assert st.roi.dims == ("t", "mark")
    assert st.dims["mark"] == 6
    # Row-major flattening order (row varies slowest).
    np.testing.assert_array_equal(
        st.roi.transpose("mark", "t").values, x.reshape(6, 4, order="C").reshape(6, 4)
    )
    np.testing.assert_array_equal(st.tag.values, np.array(list("abcdef")))
    np.testing.assert_array_equal(st.mark_row.values, [0, 0, 0, 1, 1, 1])
    np.testing.assert_array_equal(st.mark_col.values, [0, 1, 2, 0, 1, 2])

    un = st.unstack()
    assert un.dims["mark_row"] == 2 and un.dims["mark_col"] == 3
    back = un.roi.transpose("mark_row", "mark_col", "t")
    np.testing.assert_array_equal(back.values, x)
    np.testing.assert_array_equal(
        un.tag.transpose("mark_row", "mark_col").values,
        np.array([["a", "b", "c"], ["d", "e", "f"]]),
    )


def test_stack_after_transpose_matches_reference_usage():
    # Mirrors find.py:182: stack then transpose("mark", ...).
    x = np.arange(24).reshape(2, 3, 4)
    ds = Dataset({"v": (("mark_row", "mark_col", "time"), x)})
    st = ds.stack(mark=("mark_row", "mark_col")).transpose("mark", ...)
    assert st.v.dims == ("mark", "time")
    np.testing.assert_array_equal(st.v.values, x.reshape(6, 4))


def test_rename_drop():
    ds, _ = make_ds()
    r = ds.rename({"y": "im_y"})
    assert "im_y" in r.tile.dims
    d = ds.drop_vars(["tile"])
    assert "tile" not in d
    d2 = ds.drop_vars(["nope"], errors="ignore")
    assert "tile" in d2
    with pytest.raises(KeyError):
        ds.drop_vars(["nope"])


def test_setitem_positional():
    ds, _ = make_ds()
    x = ds.tile
    x[0, 0] = 7.0
    assert (x.values[0, 0] == 7.0).all()


def test_iteration():
    ds, tile = make_ds()
    parts = list(ds.tile)
    assert len(parts) == 2
    np.testing.assert_array_equal(parts[1].values, tile[1])


def test_groupby():
    ds = Dataset(
        {"v": (("mark",), np.array([1.0, 2.0, 3.0, 4.0]))},
        coords={"tag": (("mark",), np.array(["a", "b", "a", "b"]))},
    )
    groups = dict(ds.v.groupby("tag"))
    np.testing.assert_array_equal(groups["a"].values, [1.0, 3.0])
    np.testing.assert_array_equal(groups["b"].values, [2.0, 4.0])


def test_where_broadcast_channel():
    # roi (mark, channel, y, x) masked by fg (mark, y, x) — identify_mrbles usage.
    roi = np.arange(2 * 2 * 3 * 3, dtype=float).reshape(2, 2, 3, 3)
    fg = np.zeros((2, 3, 3), bool)
    fg[:, 1, 1] = True
    ds = Dataset({"roi": (("mark", "channel", "y", "x"), roi)},
                 coords={"fg": (("mark", "y", "x"), fg)})
    sel = ds.roi
    out = sel.where(ds.fg).mean(dim=["y", "x"])
    np.testing.assert_allclose(out.values, roi[:, :, 1, 1])


def test_concat():
    from magnify_tpu.core import concat

    a = DataArray(np.ones((2, 3)), dims=("t", "x"))
    b = DataArray(np.zeros((1, 3)), dims=("t", "x"))
    out = concat([a, b], dim="t")
    assert out.shape == (3, 3)
    stacked = concat([a, a], dim="new")
    assert stacked.dims == ("new", "t", "x")


def test_any_all_reductions():
    da = DataArray(np.array([[True, False], [True, True]]), dims=("a", "b"))
    assert da.any().values.item()
    assert not da.all().values.item()
    np.testing.assert_array_equal(da.all(dim="b").values, [False, True])


def test_sel_with_label_slices():
    da = DataArray(np.arange(12).reshape(3, 4), dims=("t", "x"),
                   coords={"t": [10, 20, 30], "x": [0.5, 1.5, 2.5, 3.5]})
    # Label slices are inclusive of both endpoints (xarray semantics).
    out = da.sel(t=slice(10, 20))
    assert out.sizes["t"] == 2
    np.testing.assert_array_equal(out.t.values, [10, 20])
    out = da.sel(x=slice(1.0, 3.0))
    np.testing.assert_array_equal(out.x.values, [1.5, 2.5])
    # Open-ended slices.
    assert da.sel(t=slice(None, 20)).sizes["t"] == 2
    assert da.sel(t=slice(20, None)).sizes["t"] == 2
    # Descending coordinate.
    dd = DataArray(np.arange(4), dims=("t",), coords={"t": [40, 30, 20, 10]})
    np.testing.assert_array_equal(dd.sel(t=slice(35, 15)).t.values, [30, 20])
    # Non-monotonic coordinates reject label slices.
    nm = DataArray(np.arange(3), dims=("t",), coords={"t": [1, 3, 2]})
    with pytest.raises(KeyError, match="monotonic"):
        nm.sel(t=slice(1, 2))
    # Dataset sel with slices works too.
    ds = Dataset({"v": da})
    assert ds.sel(t=slice(10, 20)).sizes["t"] == 2


def test_dataarray_loc():
    da = DataArray(np.arange(12).reshape(3, 4), dims=("t", "x"),
                   coords={"t": [10, 20, 30], "x": [0.5, 1.5, 2.5, 3.5]})
    assert float(da.loc[20, 1.5].values) == 5
    np.testing.assert_array_equal(da.loc[{"x": 2.5}].values, [2, 6, 10])
    np.testing.assert_array_equal(da.loc[slice(20, 30)].values,
                                  da.values[1:])


def test_regular_array_indexers_become_views():
    """1-D constant-stride integer indexers (identity selections, channel
    subsets) rewrite to slices: same outer-indexing result, but a view —
    numpy's advanced indexing would copy the array at ~100 MB/s. The
    rewrite must NOT fire for descending/irregular/negative/bool/empty
    indexers, for unsigned descending sequences (np.diff wraps), or for
    out-of-bounds indices (a slice would silently clamp where advanced
    indexing raises)."""
    from magnify_tpu.core.xd import _regular_to_slice

    assert _regular_to_slice(np.array([0, 1, 2, 3]), 10) == slice(0, 4, 1)
    assert _regular_to_slice(np.array([2, 4, 6]), 10) == slice(2, 7, 2)
    assert _regular_to_slice(np.array([5]), 10) == slice(5, 6)
    # Not rewritable: reversed, irregular, negative, bool, empty,
    # unsigned-descending (diff wraps to a huge positive step), OOB.
    for arr in (np.array([3, 2, 1]), np.array([0, 1, 3]),
                np.array([-1, 0]), np.array([True, False]),
                np.array([], dtype=int),
                np.array([3, 2, 1], dtype=np.uint32),
                np.array([8, 9, 10])):
        out = _regular_to_slice(arr, 10)
        assert not isinstance(out, slice), arr

    data = np.arange(2 * 3 * 4).reshape(2, 3, 4)
    ds = Dataset({"v": (("a", "b", "c"), data)},
                 coords={"b": ["x", "y", "z"]})
    sel = ds.v.sel(b=["x", "y", "z"]).values
    np.testing.assert_array_equal(sel, data)
    assert sel.base is not None  # a view, not an advanced-indexing copy
    # ... but a READ-ONLY view: where numpy advanced indexing returned a
    # private copy, mutation must raise rather than silently write
    # through to the parent store (e.g. an on-disk memmap spill).
    with pytest.raises(ValueError):
        sel[0, 0, 0] = -1
    assert data[0, 0, 0] == 0
    np.testing.assert_array_equal(ds.v.sel(b=["z", "x"]).values,
                                  data[:, [2, 0]])
    np.testing.assert_array_equal(ds.v.isel(b=[0, 2]).values,
                                  data[:, [0, 2]])
    # The documented snapshot escape hatch: .copy() (deep by default, the
    # xarray contract) yields a private writable buffer decoupled from
    # later parent-store mutations.
    snap = ds.v.sel(b=["x", "y", "z"]).copy()
    snap.values[0, 0, 0] = -1  # writable
    assert data[0, 0, 0] == 0  # parent untouched
    data[0, 0, 1] = 99
    assert snap.values[0, 0, 1] == 1  # snapshot, not an alias
    shallow = ds.v.copy(deep=False)
    assert shallow.values.base is data.base or shallow.values is data
    # Descending uint indexer takes the (correct) advanced-indexing path.
    np.testing.assert_array_equal(
        ds.v.isel(b=np.array([2, 1, 0], np.uint32)).values,
        data[:, [2, 1, 0]])
    # Out-of-bounds stays a loud IndexError, not a silent empty slice.
    with pytest.raises(IndexError):
        ds.v.isel(b=[7]).values


def test_dataarray_copy_attrs_independent():
    """copy(deep=True) snapshots metadata too: mutating the copy's attrs
    must not leak into the parent (the xarray deep-copy contract)."""
    from magnify_tpu.core import DataArray

    da = DataArray(np.arange(6.0).reshape(2, 3), dims=("y", "x"))
    da.variable.attrs["k"] = "orig"
    snap = da.copy()
    snap.variable.attrs["k"] = "mutated"
    assert da.variable.attrs["k"] == "orig"
    # And the data buffer is independent + writable.
    snap.values[0, 0] = 99.0
    assert da.values[0, 0] == 0.0
