"""The pipelined multi-frame bead pipeline (mg.beads_stream): per-frame
outputs must be BIT-IDENTICAL to the single-frame pipeline, in input order,
through the fused overlap path, the serial fallbacks (ransac detector,
out-of-core stacks), cap growth mid-stream, and empty frames."""

import numpy as np
import pytest

import magnify_tpu as mg
from magnify_tpu.components import find as find_mod
from magnify_tpu.core import DataArray
from magnify_tpu.ops import detect as ops_detect
from tests.synth import draw_beads

KW = dict(min_bead_diameter=16, max_bead_diameter=24, overlap=0,
          num_iter=20000, min_roundness=0.3)


def make_frame(seed, n_beads):
    """A small noisy frame with ``n_beads`` beads (distinct per frame so
    output order is observable)."""
    rng = np.random.default_rng(seed)
    positions = [[70 + 90 * (k // 3), 70 + 90 * (k % 3)]
                 for k in range(n_beads)]
    img = draw_beads((340, 340), positions, diameters=20)
    img = (img + rng.normal(0, 3, img.shape)).astype(np.float32)
    return DataArray(img, dims=("y", "x")), n_beads


def assert_streams_match_single(frames, outs, **kw):
    params = dict(KW)
    params.update(kw)
    assert len(outs) == len(frames)
    for k, (frame, out) in enumerate(zip(frames, outs)):
        ref = mg.beads(data=frame, **params)
        assert out.roi.sizes["mark"] == ref.roi.sizes["mark"], k
        np.testing.assert_array_equal(out.x.values, ref.x.values)
        np.testing.assert_array_equal(out.y.values, ref.y.values)
        np.testing.assert_array_equal(np.asarray(out.roi.values),
                                      np.asarray(ref.roi.values))
        np.testing.assert_array_equal(np.asarray(out.fg.values),
                                      np.asarray(ref.fg.values))
        np.testing.assert_array_equal(np.asarray(out.bg.values),
                                      np.asarray(ref.bg.values))
        np.testing.assert_array_equal(np.asarray(out.valid.values),
                                      np.asarray(ref.valid.values))


def test_stream_bit_identical_and_ordered():
    # Distinct bead counts per frame make output order observable.
    frames_counts = [make_frame(s, n) for s, n in
                     zip(range(4), (4, 7, 2, 9))]
    frames = [f for f, _ in frames_counts]
    outs = list(mg.beads_stream(frames, **KW))
    assert [o.roi.sizes["mark"] for o in outs] == [4, 7, 2, 9]
    assert_streams_match_single(frames, outs)


@pytest.mark.parametrize("depth", [1, 3])
def test_stream_depths(depth):
    frames = [make_frame(s, n)[0] for s, n in zip(range(3), (3, 5, 1))]
    outs = list(mg.beads_stream(frames, stream_depth=depth, **KW))
    assert [o.roi.sizes["mark"] for o in outs] == [3, 5, 1]
    assert_streams_match_single(frames, outs)


def test_stream_empty_frame_mid_stream():
    rng = np.random.default_rng(0)
    empty = DataArray(rng.normal(100, 3, (340, 340)).astype(np.float32),
                      dims=("y", "x"))
    f1, _ = make_frame(1, 5)
    f2, _ = make_frame(2, 3)
    outs = list(mg.beads_stream([f1, empty, f2], **KW))
    assert [o.roi.sizes["mark"] for o in outs] == [5, 0, 3]
    assert_streams_match_single([f1, empty, f2], outs)


def test_stream_ransac_serial_fallback():
    """detector='ransac' cannot take the fused path: the stream must fall
    back to the ordinary serial component chain, same outputs, same order."""
    frames = [make_frame(s, n)[0] for s, n in zip(range(2), (3, 5))]
    outs = list(mg.beads_stream(frames, detector="ransac", **KW))
    assert [o.roi.sizes["mark"] for o in outs] == [3, 5]
    assert_streams_match_single(frames, outs, detector="ransac")


def test_stream_out_of_core_fallback(monkeypatch):
    """Frames above MAX_RESIDENT_BYTES drain the pipeline and run serially,
    interleaved with fused frames without reordering."""
    monkeypatch.setattr(find_mod, "MAX_RESIDENT_BYTES", 300 * 340 * 4)
    frames = [make_frame(s, n)[0] for s, n in zip(range(3), (3, 5, 2))]
    outs = list(mg.beads_stream(frames, **KW))
    assert [o.roi.sizes["mark"] for o in outs] == [3, 5, 2]
    assert_streams_match_single(frames, outs)


def test_stream_cap_growth_mid_stream(monkeypatch):
    """A tiny initial cap forces the in-stream re-dispatch retry (the
    overflow is only observed at the delayed pull)."""
    from tests.test_beads_dense import _Memo

    monkeypatch.setattr(ops_detect, "_cap_memo", _Memo(cap0=2, pull0=3))
    frames = [make_frame(s, n)[0] for s, n in zip(range(2), (6, 4))]
    outs = list(mg.beads_stream(frames, **KW))
    assert [o.roi.sizes["mark"] for o in outs] == [6, 4]
    assert_streams_match_single(frames, outs)


def test_stream_abandoned_mid_iteration():
    """Abandoning the generator must release the producer thread (no hang,
    no leaked device buffers blocking on the queue condvar)."""
    frames = [make_frame(s, 3)[0] for s in range(6)]
    gen = mg.beads_stream(frames, **KW)
    first = next(gen)
    assert first.roi.sizes["mark"] == 3
    gen.close()  # must not deadlock


def test_stream_consumes_lazy_iterable():
    """The input can be a generator (frames produced on demand — the
    terabyte-run shape); the stream must not materialize it eagerly."""
    produced = []

    def gen_frames():
        for s, n in zip(range(3), (2, 4, 3)):
            f, _ = make_frame(s, n)
            produced.append(s)
            yield f

    outs = list(mg.beads_stream(gen_frames(), **KW))
    assert [o.roi.sizes["mark"] for o in outs] == [2, 4, 3]
    assert produced == [0, 1, 2]
