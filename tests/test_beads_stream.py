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

# detector="dense" explicitly: on the CPU test backend "auto" resolves to
# ransac, which would silently route every frame through the serial
# fallback instead of the fused overlap path under test.
KW = dict(min_bead_diameter=16, max_bead_diameter=24, overlap=0,
          num_iter=20000, min_roundness=0.3, detector="dense")


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
    # Featureless constant frame: zero detections (noise-only frames can
    # legitimately surface marginal circles under the exhaustive dense
    # detector — identically in stream and single-frame runs).
    empty = DataArray(np.full((340, 340), 100, np.float32),
                      dims=("y", "x"))
    f1, _ = make_frame(1, 5)
    f2, _ = make_frame(2, 3)
    outs = list(mg.beads_stream([f1, empty, f2], **KW))
    assert [o.roi.sizes["mark"] for o in outs] == [5, 0, 3]
    assert_streams_match_single([f1, empty, f2], outs)


def test_stream_ransac_serial_fallback():
    """detector='ransac' cannot take the fused path: the stream must fall
    back to the ordinary serial component chain, same outputs, same order."""
    kw = dict(KW, detector="ransac")
    frames = [make_frame(s, n)[0] for s, n in zip(range(2), (3, 5))]
    outs = list(mg.beads_stream(frames, **kw))
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


def test_mrbles_stream_bit_identical_with_shared_csv_handles():
    """mrbles_stream runs the full decode per frame on the stream's
    assembly worker: per-frame outputs (tags included) must equal the
    single-frame pipeline, and the SAME spectra/codes StringIO handles
    must serve every frame (identify rewinds file-likes)."""
    import io

    spectra = io.StringIO(
        "name,c1,c2\neu,1.0,0.1\ndy,0.1,1.0\n")
    codes = io.StringIO(
        "name,eu,dy\ncode_a,1.0,0.0\ncode_b,1.0,1.0\n")

    def frame(seed):
        rng = np.random.default_rng(seed)
        spectra_m = np.array([[1.0, 0.1], [0.1, 1.0]])
        chans = np.zeros((2, 300, 300), np.float32)
        for k, dy in enumerate([0.0, 1.0, 0.0, 1.0, 0.0]):
            pos = [[60 + 50 * k, 60 + 40 * k]]
            vols = np.array([100.0, 100.0 * dy])
            inten = vols @ spectra_m
            for ci in range(2):
                chans[ci] += draw_beads((300, 300), pos, diameters=20,
                                        values=float(inten[ci]) + 1)
        chans += rng.normal(8.0, 1.5, chans.shape).astype(np.float32)
        return DataArray(np.maximum(chans, 0), dims=("channel", "y", "x"),
                         coords={"channel": ["c1", "c2"]})

    kw = dict(overlap=0, min_bead_diameter=16, max_bead_diameter=24,
              num_iter=20000, min_roundness=0.3, search_channel="c1",
              detector="dense")
    frames = [frame(s) for s in range(3)]
    outs = list(mg.mrbles_stream(frames, spectra=spectra, codes=codes,
                                 **kw))
    assert len(outs) == 3
    for k, (f, o) in enumerate(zip(frames, outs)):
        ref = mg.mrbles(data=f, spectra=spectra, codes=codes, **kw)
        assert o.roi.sizes["mark"] == ref.roi.sizes["mark"] >= 5, k
        assert (o.tag.values == ref.tag.values).all()
        assert {"code_a", "code_b"} <= set(o.tag.values)
        np.testing.assert_array_equal(o.x.values, ref.x.values)
        np.testing.assert_array_equal(o.ln_ratio.values,
                                      ref.ln_ratio.values)


def test_mrbles_empty_field_decodes_to_zero_marks():
    """An empty frame through the full MRBLEs pipeline returns the valid
    zero-mark schema instead of crashing the lattice fit."""
    import io

    rng = np.random.default_rng(0)
    empty = DataArray(
        np.stack([rng.normal(10, 2, (300, 300)).astype(np.float32)] * 2),
        dims=("channel", "y", "x"), coords={"channel": ["c1", "c2"]})
    spectra = io.StringIO("name,c1,c2\neu,1.0,0.1\ndy,0.1,1.0\n")
    codes = io.StringIO("name,eu,dy\ncode_a,1.0,0.0\ncode_b,1.0,1.0\n")
    xp = mg.mrbles(data=empty, spectra=spectra, codes=codes, overlap=0,
                   min_bead_diameter=16, max_bead_diameter=24,
                   num_iter=20000, search_channel="c1", detector="dense")
    assert xp.roi.sizes["mark"] == 0
    assert xp.tag.values.shape == (0,)
    assert xp.ln_ratio.values.shape == (0, 2)


def test_stream_pull_cap_growth_mid_batch(monkeypatch):
    """The pull-cap memo can grow mid-stream (overflow observed at a
    batched pull while later frames are already dispatched with the old
    cap) — the flush must stack per run of equal packed shape instead of
    crashing jnp.stack on mixed shapes, and the memo must not be
    re-shrunk by stale writes from neighbors in the same batch."""
    from tests.test_beads_dense import _Memo

    monkeypatch.setattr(ops_detect, "_cap_memo", _Memo(cap0=64, pull0=3))
    counts = (6, 7, 5, 8, 6, 7, 5, 6)
    frames = [make_frame(s, n)[0] for s, n in zip(range(8), counts)]
    outs = list(mg.beads_stream(frames, **KW))
    assert [o.roi.sizes["mark"] for o in outs] == list(counts)
    assert_streams_match_single(frames, outs)
