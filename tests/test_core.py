"""Tests for the lazy chunked backend, registry, and pipeline engine."""

import numpy as np
import pytest

from magnify_tpu.core import Dataset
from magnify_tpu.core.lazy import ChunkedArray, from_block_function, spill_to_store
from magnify_tpu.core.pipeline import Pipeline
from magnify_tpu.core.registry import Registry, component, components, readers


# ---------------------------------------------------------------------------
# ChunkedArray
# ---------------------------------------------------------------------------

def make_lazy(shape=(4, 6, 8), chunks=(1, 3, 4), seed=0):
    rng = np.random.default_rng(seed)
    full = rng.integers(0, 100, size=shape).astype(np.int32)
    calls = []

    from magnify_tpu.core.lazy import normalize_chunks
    norm = normalize_chunks(chunks, shape)
    offs = [np.concatenate([[0], np.cumsum(c)]) for c in norm]

    def loader(idx):
        calls.append(idx)
        sl = tuple(slice(offs[d][i], offs[d][i + 1]) for d, i in enumerate(idx))
        return full[sl]

    return from_block_function(loader, shape, np.int32, chunks), full, calls


def test_chunked_compute():
    arr, full, _ = make_lazy()
    np.testing.assert_array_equal(arr.compute(), full)


def test_chunked_partial_read_only_touches_needed_chunks():
    arr, full, calls = make_lazy()
    out = arr[1]
    np.testing.assert_array_equal(out, full[1])
    assert all(idx[0] == 1 for idx in calls)


def test_chunked_getitem_variants():
    arr, full, _ = make_lazy()
    np.testing.assert_array_equal(arr[2, 1:5], full[2, 1:5])
    np.testing.assert_array_equal(arr[..., 3], full[..., 3])
    np.testing.assert_array_equal(arr[:, :, ::-1], full[:, :, ::-1])
    np.testing.assert_array_equal(arr[0, ::2], full[0, ::2])
    np.testing.assert_array_equal(arr[np.array([2, 0])], full[np.array([2, 0])])


def test_chunked_map_and_astype():
    arr, full, _ = make_lazy()
    doubled = arr.map_chunks(lambda b: b * 2)
    np.testing.assert_array_equal(doubled.compute(), full * 2)
    f = arr.astype(np.float32)
    assert f.dtype == np.float32


def test_chunked_map_with_slices_broadcast():
    arr, full, _ = make_lazy()
    bias = np.arange(8, dtype=np.int32)

    def op(block, slices):
        return block + bias[slices[2]]

    out = arr.map_chunks(op, with_slices=True)
    np.testing.assert_array_equal(out.compute(), full + bias)


def test_chunked_transpose_expand():
    arr, full, _ = make_lazy()
    t = arr.transpose((2, 0, 1))
    assert t.shape == (8, 4, 6)
    np.testing.assert_array_equal(t.compute(), full.transpose(2, 0, 1))
    e = arr.expand_dims(1)
    assert e.shape == (4, 1, 6, 8)
    np.testing.assert_array_equal(e.compute(), full[:, None])


def test_spill_to_store_roundtrip():
    arr, full, _ = make_lazy()
    mm = spill_to_store(arr, "tile")
    assert isinstance(mm, np.memmap)
    np.testing.assert_array_equal(np.asarray(mm), full)


def test_dataset_cache_rebinds_lazy_vars():
    arr, full, _ = make_lazy()
    ds = Dataset({"tile": (("a", "b", "c"), arr)})
    ds.cache("tile")
    assert isinstance(ds["tile"].data, np.memmap)
    np.testing.assert_array_equal(ds.tile.values, full)
    # .mg accessor parity shim.
    ds2 = Dataset({"tile": (("a", "b", "c"), make_lazy()[0])})
    ds2.mg.cache(["tile"])
    assert isinstance(ds2["tile"].data, np.memmap)


def test_variable_isel_on_lazy_reads_region():
    arr, full, calls = make_lazy()
    ds = Dataset({"tile": (("a", "b", "c"), arr)})
    sub = ds.tile.isel(a=2)
    np.testing.assert_array_equal(sub.values, full[2])


def test_multidim_isel_on_lazy_reads_one_chunk():
    """Multi-dim scalar isel must be ONE region read of ONE chunk.

    Regression: indexers applied dim-by-dim materialized the full extent of
    every not-yet-indexed dim (reading a (channel, time) plane of a lazy
    4-D stack loaded the entire channel — a 40x IO/RSS blowup at 10.7 GB
    out-of-core scale)."""
    calls = []

    def loader(idx):
        calls.append(idx)
        return np.full((1, 1, 4, 5), idx[0] * 10 + idx[1], np.float32)

    arr = ChunkedArray(loader, shape=(3, 6, 4, 5), dtype=np.float32,
                       chunks=(1, 1, 4, 5))
    ds = Dataset({"image": (("channel", "time", "im_y", "im_x"), arr)})
    plane = ds.image.isel(channel=2, time=4).to_numpy()
    assert calls == [(2, 4, 0, 0)]
    np.testing.assert_array_equal(plane, np.full((4, 5), 24.0))
    # Dataset-level isel: same contract.
    calls.clear()
    sub = ds.isel(channel=1, time=3)
    np.testing.assert_array_equal(sub.image.to_numpy(),
                                  np.full((4, 5), 13.0))
    assert calls == [(1, 3, 0, 0)]
    # Mixed fancy + scalar stays minimal: only chunks in the fancy index's
    # bounding range load (not the full time extent), with per-dim (outer)
    # indexing semantics.
    calls.clear()
    out = ds.image.isel(channel=np.array([0, 2]), time=5).to_numpy()
    assert sorted(calls) == [(0, 5, 0, 0), (1, 5, 0, 0), (2, 5, 0, 0)]
    np.testing.assert_array_equal(out[:, 0, 0], [5.0, 25.0])


# ---------------------------------------------------------------------------
# Registry + Pipeline
# ---------------------------------------------------------------------------

def test_registry_get_missing():
    r = Registry("test")
    with pytest.raises(ValueError, match="Can't find"):
        r.get("nope")


@pytest.fixture(autouse=True)
def _test_components():
    # Register throwaway components/readers for pipeline tests.
    created = []

    if not readers.has("_test_read"):
        @readers.register("_test_read")
        def make_reader():
            def read(data):
                yield Dataset({"v": (("x",), np.asarray(data, dtype=float))})
            return read

    for nm, delta in [("_add_one", 1.0), ("_add_ten", 10.0)]:
        if not components.has(nm):
            def make(nm=nm, delta=delta):
                @component(nm)
                def comp(xp, scale=1.0, _delta=delta):
                    xp["v"] = (("x",), xp.v.values + _delta * scale)
                    return xp
            make()
            created.append(nm)
    yield


def test_pipeline_runs_in_order():
    pipe = Pipeline("_test_read")
    pipe.add_pipe("_add_one")
    pipe.add_pipe("_add_ten", scale=2.0)
    out = pipe([1.0, 2.0])
    np.testing.assert_allclose(out.v.values, [22.0, 23.0])


def test_pipeline_insertion_rules():
    pipe = Pipeline("_test_read")
    pipe.add_pipe("_add_one")
    pipe.add_pipe("_add_ten", first=True)
    assert [n for n, _ in pipe.components] == ["_add_ten", "_add_one"]
    pipe.remove_pipe("_add_ten")
    pipe.add_pipe("_add_ten", after="_add_one")
    assert [n for n, _ in pipe.components] == ["_add_one", "_add_ten"]
    pipe.remove_pipe("_add_ten")
    pipe.add_pipe("_add_ten", before="_add_one")
    assert [n for n, _ in pipe.components] == ["_add_ten", "_add_one"]


def test_pipeline_duplicate_and_conflicts():
    pipe = Pipeline("_test_read")
    pipe.add_pipe("_add_one")
    with pytest.raises(ValueError, match="already exists"):
        pipe.add_pipe("_add_one")
    with pytest.raises(ValueError, match="Only one of"):
        pipe.add_pipe("_add_ten", first=True, last=True)


def test_pipeline_custom_callable():
    pipe = Pipeline("_test_read")

    def scale(xp, factor=3.0):
        xp["v"] = (("x",), xp.v.values * factor)
        return xp

    pipe.add_pipe(scale, factor=4.0)
    out = pipe([2.0])
    np.testing.assert_allclose(out.v.values, [8.0])


def test_pipeline_remove_missing():
    pipe = Pipeline("_test_read")
    with pytest.raises(ValueError, match="no components"):
        pipe.remove_pipe("_add_one")
    pipe.add_pipe("_add_one")
    with pytest.raises(ValueError, match="not found"):
        pipe.remove_pipe("_zzz")


def test_pipeline_multiple_assays_returns_list():
    import magnify_tpu as mg
    from tests.synth import bead_image

    a = bead_image((256, 256), [[100, 100]])
    b = bead_image((256, 256), [[60, 200]])
    out = mg.beads(data=[a, b], min_bead_diameter=16, max_bead_diameter=24,
                   overlap=0, num_iter=2000)
    assert isinstance(out, list) and len(out) == 2
    assert out[0].roi.sizes["mark"] == 1
    assert out[1].roi.sizes["mark"] == 1
    assert round(out[1].x.squeeze().values.item() / 10) == 20


def test_user_api_signatures_match_pipe_factories():
    """The one-shot wrappers (mg.beads/mrbles/microfluidic_chip/image) must
    expose the same explicit parameters and defaults as their *_pipe
    factories (plus the leading ``data``) — the reference spells every
    parameter out (registry.py:32-693), and an explicit signature keeps
    help()/IDE introspection and typo detection faithful."""
    import inspect

    import magnify_tpu as mg

    for fn, pipe_fn in [(mg.beads, mg.beads_pipe),
                        (mg.mrbles, mg.mrbles_pipe),
                        (mg.microfluidic_chip, mg.microfluidic_chip_pipe),
                        (mg.image, mg.image_pipe)]:
        sig = inspect.signature(fn)
        pipe_sig = inspect.signature(pipe_fn)
        params = dict(sig.parameters)
        assert next(iter(params)) == "data", fn.__name__
        params.pop("data")
        assert all(p.kind is inspect.Parameter.POSITIONAL_OR_KEYWORD
                   for p in params.values()), fn.__name__
        assert list(params) == list(pipe_sig.parameters), fn.__name__
        # The reference intentionally defaults beads to 10/50 but
        # beads_pipe to 5/25 (registry.py:454-459 vs :568-573).
        asym = {("beads", "min_bead_diameter"), ("beads", "max_bead_diameter")}
        for name, p in pipe_sig.parameters.items():
            if (fn.__name__, name) in asym:
                continue
            assert params[name].default == p.default, (fn.__name__, name)
