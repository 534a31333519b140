"""The production single-frame bead path (BeadFinder._fused_dense) driven
end-to-end through mg.beads(detector="dense") — the minimum-traffic path the
TPU headline number runs, exercised off-mesh on CPU: the fused-branch
selection, the pull-cap spill + memo growth, the cap-grow retry, empty
images, and multi-channel dedupe, all pinned against the ransac path."""

import numpy as np
import pytest

import magnify_tpu as mg
from magnify_tpu.components import find as find_mod
from magnify_tpu.core import DataArray
from magnify_tpu.ops import detect as ops_detect
from tests.synth import bead_image, draw_beads

TRUE_RADIUS = 10
POSITIONS = [[100, 100], [100, 400], [256, 256], [400, 100], [400, 400]]


def detect(data, num_iter=10000, **kw):
    kw.setdefault("min_bead_diameter", 16)
    kw.setdefault("max_bead_diameter", 24)
    kw.setdefault("overlap", 0)
    return mg.beads(data=data, num_iter=num_iter, **kw)


class _Memo(dict):
    """Stand-in cap memo with tiny defaults, to force the grow/spill
    branches. Writes stay local to the test (nothing persisted)."""

    def __init__(self, cap0=None, pull0=None):
        super().__init__()
        self.cap0, self.pull0 = cap0, pull0

    def get(self, key, default=None):
        if key in self:
            return self[key]
        if key[-1] == "pull":
            return self.pull0 if self.pull0 is not None else default
        return self.cap0 if self.cap0 is not None else default


@pytest.fixture
def spy_fused(monkeypatch):
    """Record every _fused_dense invocation (and still run it)."""
    calls = []
    real = find_mod.BeadFinder._fused_dense

    def wrapper(self, assay, image_np, search_idxs):
        calls.append(search_idxs)
        return real(self, assay, image_np, search_idxs)

    monkeypatch.setattr(find_mod.BeadFinder, "_fused_dense", wrapper)
    return calls


def assert_same_beads(a, b, atol=1.5):
    assert a.roi.sizes["mark"] == b.roi.sizes["mark"]
    order_a = np.lexsort([a.x.values.ravel(), a.y.values.ravel()])
    order_b = np.lexsort([b.x.values.ravel(), b.y.values.ravel()])
    np.testing.assert_allclose(a.x.values.ravel()[order_a],
                               b.x.values.ravel()[order_b], atol=atol)
    np.testing.assert_allclose(a.y.values.ravel()[order_a],
                               b.y.values.ravel()[order_b], atol=atol)


def test_fused_dense_taken_and_matches_ransac(spy_fused):
    data = bead_image((512, 512), POSITIONS)
    dense = detect(data, detector="dense")
    assert len(spy_fused) == 1, "the fused dense branch was not taken"
    ransac = detect(data, detector="ransac")
    assert_same_beads(dense, ransac)
    areas = dense.fg.sum(dim=["roi_x", "roi_y"]).values
    radii = np.sqrt(areas / np.pi)
    assert radii.min() > 0.9 * TRUE_RADIUS
    assert radii.max() < 1.1 * TRUE_RADIUS
    # Schema parity with the ransac output.
    for coord in ("x", "y", "fg", "bg", "valid"):
        assert coord in dense.coords
    assert dense.roi.dims == ransac.roi.dims


def test_fused_dense_pull_cap_spill(monkeypatch, spy_fused):
    """n > pull_cap exercises the second-pull spill (find.py pull-cap
    branch) and grows the remembered pull cap for the next frame."""
    memo = _Memo(pull0=2)
    monkeypatch.setattr(ops_detect, "_cap_memo", memo)
    data = bead_image((512, 512), POSITIONS)
    spilled = detect(data, detector="dense")
    assert spilled.roi.sizes["mark"] == 5
    grown = [v for k, v in memo.items() if k[-1] == "pull"]
    assert grown and grown[0] >= 5, "spill did not grow the pull-cap memo"

    # Second frame uses the grown pull cap: no spill, identical output.
    again = detect(data, detector="dense")
    assert len(spy_fused) == 2
    np.testing.assert_array_equal(spilled.x.values, again.x.values)
    np.testing.assert_array_equal(spilled.fg.values, again.fg.values)


def test_fused_dense_cap_grow_retry(monkeypatch, spy_fused):
    """An undersized compaction cap triggers the grow-retry loop; the final
    output is identical to a right-sized first guess."""
    data = bead_image((512, 512), POSITIONS)
    baseline = detect(data, detector="dense")

    memo = _Memo(cap0=2)
    monkeypatch.setattr(ops_detect, "_cap_memo", memo)
    grown = detect(data, detector="dense")
    beads_keys = [k for k in memo if k[0] == "beads" and k[-1] != "pull"]
    assert beads_keys and memo[beads_keys[0]] > 2, "cap never grew"
    np.testing.assert_array_equal(baseline.x.values, grown.x.values)
    np.testing.assert_array_equal(baseline.y.values, grown.y.values)
    np.testing.assert_array_equal(baseline.fg.values, grown.fg.values)
    np.testing.assert_array_equal(baseline.roi.values, grown.roi.values)


def test_fused_dense_empty_image(spy_fused):
    data = DataArray(np.zeros((512, 512), np.uint16), dims=("y", "x"))
    xp = detect(data, detector="dense")
    assert len(spy_fused) == 1
    assert xp.roi.sizes["mark"] == 0
    for coord in ("x", "y", "fg", "bg"):
        assert coord in xp.coords


def two_channel(ch1, ch2):
    return DataArray(np.stack([ch1, ch2]), dims=("channel", "y", "x"),
                     coords={"channel": ["red", "green"]})


def test_fused_dense_multichannel_dedupe(spy_fused):
    """The in-dispatch cross-channel dedupe drops the second channel's copy
    of a shared bead and keeps disjoint beads from both channels."""
    shared = [[256, 256]]
    ch1 = draw_beads((512, 512), shared + [[100, 100]], values=1000)
    ch2 = draw_beads((512, 512), shared + [[400, 400]], values=2000)
    dense = detect(two_channel(ch1, ch2), detector="dense",
                   search_channel=["red", "green"])
    assert len(spy_fused) == 1
    assert dense.roi.sizes["mark"] == 3
    found = {(round(dense.y[i].values.item() / 4) * 4,
              round(dense.x[i].values.item() / 4) * 4) for i in range(3)}
    assert found == {(256, 256), (100, 100), (400, 400)}
    ransac = detect(two_channel(ch1, ch2), detector="ransac",
                    search_channel=["red", "green"])
    assert_same_beads(dense, ransac)
