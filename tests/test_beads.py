"""Bead pipeline behavior: the detection coverage matrix of the reference's
bead suite, exercised through mg.beads end to end."""

import numpy as np
import pytest

import magnify_tpu as mg
from magnify_tpu.core import DataArray
from tests.synth import bead_image, draw_beads

TRUE_RADIUS = 10  # diameter 20 fixtures


def detect(data, num_iter=10000, **kw):
    kw.setdefault("min_bead_diameter", 16)
    kw.setdefault("max_bead_diameter", 24)
    kw.setdefault("overlap", 0)
    return mg.beads(data=data, num_iter=num_iter, **kw)


def fg_radii(xp):
    areas = xp.fg.sum(dim=["roi_x", "roi_y"]).values
    return np.sqrt(areas / np.pi)


def test_single_centered_bead():
    xp = detect(bead_image((1024, 1024), [512, 512]), num_iter=100)
    assert isinstance(xp, mg.Dataset)
    assert xp.roi.sizes["mark"] == 1
    r = np.sqrt(xp.fg.sum().values.item() / np.pi)
    assert 0.95 * TRUE_RADIUS < r < 1.05 * TRUE_RADIUS
    assert 0.95 * 512 < xp.x.squeeze().values.item() < 1.05 * 512
    assert 0.95 * 512 < xp.y.squeeze().values.item() < 1.05 * 512


def test_multiple_beads():
    positions = [[200, 200], [200, 800], [512, 512], [800, 200], [800, 800]]
    xp = detect(bead_image((1024, 1024), positions))
    assert xp.roi.sizes["mark"] == 5
    radii = fg_radii(xp)
    assert radii.min() > 0.9 * TRUE_RADIUS
    assert radii.max() < 1.1 * TRUE_RADIUS


def test_beads_near_image_edges():
    positions = [[50, 512], [974, 512], [512, 50], [512, 974]]
    xp = detect(bead_image((1024, 1024), positions))
    assert xp.roi.sizes["mark"] == 4
    xs = xp.x.squeeze().values
    ys = xp.y.squeeze().values
    assert np.any(ys < 100) and np.any(ys > 900)
    assert np.any(xs < 100) and np.any(xs > 900)


def test_varying_bead_sizes():
    positions = [[300, 300], [300, 700], [700, 300], [700, 700]]
    xp = detect(
        bead_image((1024, 1024), positions, diameters=[16, 20, 24, 28]),
        min_bead_diameter=14,
        max_bead_diameter=32,
    )
    assert xp.roi.sizes["mark"] == 4
    areas = xp.fg.sum(dim=["roi_x", "roi_y"]).values
    assert areas.max() / areas.min() > 1.5


def test_close_but_separate_beads():
    positions = [[500, 500], [500, 540], [540, 500]]
    xp = detect(bead_image((1024, 1024), positions))
    assert xp.roi.sizes["mark"] == 3
    pts = np.stack([xp.x.squeeze().values, xp.y.squeeze().values], axis=1)
    for i in range(3):
        for j in range(i + 1, 3):
            assert np.linalg.norm(pts[i] - pts[j]) > 20


def test_varying_intensities():
    positions = [[300, 500], [500, 500], [700, 500]]
    xp = detect(bead_image((1024, 1024), positions, values=[500, 1000, 2000]))
    assert xp.roi.sizes["mark"] == 3
    assert np.all(fg_radii(xp) > 0.85 * TRUE_RADIUS)


def test_empty_image_finds_nothing():
    data = DataArray(np.zeros((512, 512), np.uint16), dims=("y", "x"))
    xp = detect(data, num_iter=100)
    assert xp.roi.sizes["mark"] == 0


def test_float_input():
    data = bead_image((1024, 1024), [512, 512]).astype(np.float32)
    xp = detect(data, num_iter=100)
    assert xp.roi.sizes["mark"] == 1


def test_output_schema():
    xp = detect(bead_image((1024, 1024), [512, 512]), num_iter=100)
    for coord in ("x", "y", "fg", "bg"):
        assert coord in xp.coords
    assert "roi" in xp.data_vars
    for dim in ("mark", "roi_x", "roi_y"):
        assert dim in xp.dims


def test_roi_content_centered_on_bead():
    xp = detect(bead_image((1024, 1024), [512, 512]), num_iter=100)
    roi = xp.roi.squeeze().values
    # The bead's bright pixels sit where fg says they are.
    fg = xp.fg.squeeze().values
    assert roi[fg].min() == 1000
    assert (roi[~fg] == 0).mean() > 0.95


# -- multi-channel ----------------------------------------------------------

def two_channel(ch1, ch2):
    return DataArray(np.stack([ch1, ch2]), dims=("channel", "y", "x"),
                     coords={"channel": ["red", "green"]})


def test_multichannel_single_search_channel():
    positions = [[300, 300], [700, 700]]
    data = two_channel(draw_beads((1024, 1024), positions),
                       draw_beads((1024, 1024), positions))
    xp = detect(data, num_iter=5000, search_channel="red")
    assert xp.roi.sizes["mark"] == 2
    assert "red" in xp.channel.values
    assert "green" in xp.channel.values
    found = {(round(xp.y[i].values.item() / 100) * 100,
              round(xp.x[i].values.item() / 100) * 100) for i in range(2)}
    assert found == {(300, 300), (700, 700)}
    for r in fg_radii(xp):
        assert 0.8 * TRUE_RADIUS < r < 1.2 * TRUE_RADIUS


def test_multichannel_disjoint_beads_found_in_both():
    ch1 = draw_beads((1024, 1024), [[200, 200], [200, 800]])
    ch2 = draw_beads((1024, 1024), [[800, 200], [800, 800]])
    xp = detect(two_channel(ch1, ch2), search_channel=["red", "green"])
    assert xp.roi.sizes["mark"] == 4
    found = {(round(xp.y[i].values.item() / 100) * 100,
              round(xp.x[i].values.item() / 100) * 100) for i in range(4)}
    assert found == {(200, 200), (200, 800), (800, 200), (800, 800)}


def test_multichannel_unsearched_channel_ignored():
    ch1 = np.zeros((1024, 1024), np.uint16)
    ch2 = draw_beads((1024, 1024), [[512, 512]])
    xp = detect(two_channel(ch1, ch2), num_iter=1000, search_channel="red")
    assert xp.roi.sizes["mark"] == 0


def test_multichannel_same_bead_not_duplicated():
    positions = [[512, 512]]
    ch1 = draw_beads((1024, 1024), positions, values=1000)
    ch2 = draw_beads((1024, 1024), positions, values=2000)
    xp = detect(two_channel(ch1, ch2), num_iter=5000,
                search_channel=["red", "green"])
    assert xp.roi.sizes["mark"] == 1
    assert 480 < xp.y[0].values.item() < 544
    assert 480 < xp.x[0].values.item() < 544
    r = fg_radii(xp).item()
    assert 0.8 * TRUE_RADIUS < r < 1.2 * TRUE_RADIUS


def test_beads_deterministic_given_same_input():
    data = bead_image((1024, 1024), [[300, 400], [600, 200]])
    a = detect(data, num_iter=2000)
    b = detect(data, num_iter=2000)
    np.testing.assert_array_equal(a.x.values, b.x.values)
    np.testing.assert_array_equal(a.fg.values, b.fg.values)


def test_roi_only_returns_dataarray():
    xp = detect(bead_image((512, 512), [256, 256]), num_iter=2000,
                roi_only=True)
    from magnify_tpu.core import DataArray

    assert isinstance(xp, DataArray)
    assert "mark" in xp.dims
    assert xp.sizes["mark"] == 1


def test_beads_from_tiff_path(tmp_path):
    from magnify_tpu.io.tiff import write_tiff
    from tests.synth import draw_beads

    img = draw_beads((512, 512), [[200, 300]])
    write_tiff(tmp_path / "beads.tif", img, ome=False)
    xp = mg.beads(data=str(tmp_path / "beads.tif"), min_bead_diameter=16,
                  max_bead_diameter=24, overlap=0, num_iter=2000)
    assert xp.roi.sizes["mark"] == 1
    assert 290 < xp.x.squeeze().values.item() < 310


def test_bead_ownership_vectorized_matches_loop_oracle(monkeypatch):
    """The pair-vectorized ownership masks equal a literal transcription of
    the per-(window, neighbor) loop (the reference's painted-raster
    semantics, find.py:561-586), across crowding, borders, and radius
    clamping."""
    import scipy.spatial

    from magnify_tpu.components.find import _bead_ownership_host
    from magnify_tpu.ops import geom as ops_geom

    rng = np.random.default_rng(21)
    h = w = 120
    L, max_radius = 19, 8
    n = 35
    beads = np.stack([
        rng.integers(4, h - 4, n), rng.integers(4, w - 4, n),
        rng.integers(3, 12, n),  # some radii exceed max_radius -> clamp
    ], axis=1).astype(np.int64)

    fg, bg, tops, lefts = _bead_ownership_host(beads, h, w, L, max_radius)

    lut = ops_geom.extent_lut(max_radius)
    tops_o = np.clip(beads[:, 0] - L // 2, 0, h - L)
    lefts_o = np.clip(beads[:, 1] - L // 2, 0, w - L)
    tree = scipy.spatial.KDTree(beads[:, :2])
    win_centers = np.stack([tops_o + L // 2, lefts_o + L // 2], axis=1)
    neighbor_lists = tree.query_ball_point(
        win_centers, L / 2 + max_radius + 1, p=np.inf)
    arange_l = np.arange(L)
    fg_o = np.zeros((n, L, L), bool)
    count = np.zeros((n, L, L), np.int16)
    for i in range(n):
        for j in neighbor_lists[i]:
            r = min(max(int(beads[j, 2]), 0), max_radius)
            dr = np.abs(tops_o[i] + arange_l - beads[j, 0])
            width = np.where(dr <= r, lut[r, np.minimum(dr, max_radius)], -1)
            dc = np.abs(lefts_o[i] + arange_l - beads[j, 1])
            cover = dc[None, :] <= width[:, None]
            count[i] += cover
            if j == i:
                fg_o[i] = cover
    fg_o &= count == 1

    np.testing.assert_array_equal(tops, tops_o)
    np.testing.assert_array_equal(lefts, lefts_o)
    np.testing.assert_array_equal(fg, fg_o)
    np.testing.assert_array_equal(bg, count == 0)

    # Drive the REAL pair-chunk boundary (the default 32 MB budget never
    # chunks at test scale): 3 pairs per chunk splits windows' contiguous
    # pair runs across chunks, which the reduceat accumulation must
    # handle by adding partial sums into count.
    from magnify_tpu.components import find as find_mod

    monkeypatch.setattr(find_mod, "_PAIR_CHUNK_BYTES", 3 * L * L)
    fg_c, bg_c, tops_c, lefts_c = _bead_ownership_host(
        beads, h, w, L, max_radius)
    np.testing.assert_array_equal(fg_c, fg_o)
    np.testing.assert_array_equal(bg_c, count == 0)
