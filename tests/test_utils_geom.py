"""Tests for host geometry utilities (the rasterization contract)."""

import numpy as np
import pytest

from magnify_tpu import utils


# Hand-traced expected perimeters for small radii (from the Bresenham walk
# contract documented in utils.py).
def as_set(pts):
    return {tuple(p) for p in np.asarray(pts).tolist()}


def test_circle_points_r1():
    expected = {(0, -1), (-1, 0), (0, 1), (1, 0), (1, -1), (-1, 1), (-1, -1), (1, 1)}
    assert as_set(utils.circle_points(1)) == expected


def test_circle_points_r2():
    expected = {(0, -2), (-2, 0), (0, 2), (2, 0),
                (1, -2), (-2, 1), (-1, -2), (2, 1), (1, 2), (-2, -1), (-1, 2), (2, -1)}
    assert as_set(utils.circle_points(2)) == expected


def test_circle_points_r3():
    expected = {(0, -3), (-3, 0), (0, 3), (3, 0),
                (1, -3), (-3, 1), (-1, -3), (3, 1), (1, 3), (-3, -1), (-1, 3), (3, -1),
                (2, -2), (-2, 2), (-2, -2), (2, 2)}
    assert as_set(utils.circle_points(3)) == expected


@pytest.mark.parametrize("r", [1, 2, 3, 5, 8, 10, 16, 25, 40])
def test_circle_points_ring_properties(r):
    pts = utils.circle_points(r)
    s = as_set(pts)
    assert len(s) == len(pts)  # no duplicates
    # 8-way symmetric.
    for a, b in s:
        assert (b, a) in s and (-a, -b) in s and (a, -b) in s
    # Points lie within 1 px of the ideal ring.
    d = np.sqrt((pts ** 2).sum(axis=1))
    assert np.all(np.abs(d - r) < 1.0)
    # Contains the four axis extremes.
    for p in [(0, r), (0, -r), (r, 0), (-r, 0)]:
        assert p in s


@pytest.mark.parametrize("r", [2, 5, 10, 20])
def test_four_connected_perimeter(r):
    pts = utils.circle_points(r, four_connected=True)
    s = as_set(pts)
    # Every point has a 4-neighbor in the set (connected ring, no diagonal-only
    # steps needed).
    for a, b in s:
        assert any((a + da, b + db) in s for da, db in
                   [(1, 0), (-1, 0), (0, 1), (0, -1)])


@pytest.mark.parametrize("r", [1, 2, 3, 5, 8, 10, 14, 20, 32])
def test_filled_circle_matches_extent_span(r):
    filled = as_set(utils.filled_circle_points(r))
    ext = utils.disk_extents(r)
    span = {(a, b) for a in range(-r, r + 1)
            for b in range(-int(ext[abs(a)]), int(ext[abs(a)]) + 1)}
    assert filled == span
    # No duplicates in the listing.
    assert len(utils.filled_circle_points(r)) == len(filled)


@pytest.mark.parametrize("r", [8, 10, 12, 16, 20])
def test_filled_circle_area_near_pi_r2(r):
    area = len(utils.filled_circle_points(r))
    detected_radius = np.sqrt(area / np.pi)
    assert 0.97 * r < detected_radius < 1.08 * r


def test_bounding_box_center_and_edges():
    # Interior: centered box.
    assert utils.bounding_box(50, 40, 20, 100, 100) == (30, 50, 40, 60)
    # Odd length: extra pixel goes after the center.
    assert utils.bounding_box(50, 50, 21, 100, 100) == (40, 61, 40, 61)
    # Near the top-left: slides, keeps size.
    t, b, l, r = utils.bounding_box(3, 2, 20, 100, 100)
    assert (b - t, r - l) == (20, 20) and t == 0 and l == 0
    # Near the bottom-right: slides back.
    t, b, l, r = utils.bounding_box(98, 99, 20, 100, 100)
    assert (b - t, r - l) == (20, 20) and b == 100 and r == 100


def test_to_uint8():
    x = np.array([5.0, 10.0, 15.0])
    out = utils.to_uint8(x)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, [0, 127, 255])
    assert utils.to_uint8(np.zeros(3)).max() == 0
    assert utils.to_uint8(np.array([])).dtype == np.uint8


def test_circle_and_annulus_masks():
    disk = utils.circle((21, 21), (10, 10), 5)
    assert disk.sum() == len(utils.filled_circle_points(5))
    ring = utils.circle((21, 21), (10, 10), 5, thickness=1)
    assert ring.sum() == len(utils.circle_points(5))
    ann = utils.annulus((21, 21), (10, 10), 7, 3, value=1)
    assert ann.sum() == (len(utils.filled_circle_points(7))
                         - len(utils.filled_circle_points(3)))
    # Float values must work too (the default value=1.0): the ring is built
    # as a boolean mask, then scaled.
    annf = utils.annulus((21, 21), (10, 10), 7, 3, value=2.5)
    assert annf.dtype == np.float64
    np.testing.assert_array_equal(annf, ann * 2.5)
    # Off-image circles clip cleanly.
    edge = utils.circle((10, 10), (0, 0), 4)
    assert edge.sum() > 0


@pytest.mark.parametrize("r,t", [(5, 2), (6, 3), (8, 4), (4, 5)])
def test_circle_thickness_band(r, t):
    """thickness > 1 draws the documented stroke band: the filled annulus
    of exactly t radii, r - (t-1)//2 .. r + t//2 (cv.circle honors
    thickness at reference utils.py:38 with a t-px stroke; our band
    deviates from cv's polyline stroke by ~1 px at the edges — documented
    in the docstring)."""
    n = 2 * (r + t) + 5
    c = (n // 2, n // 2)
    band = utils.circle((n, n), c, r, thickness=t).astype(bool)
    lo, hi = r - (t - 1) // 2, r + t // 2
    assert hi - lo + 1 == t  # exactly t radii, matching cv.circle's width
    outer = utils.circle((n, n), c, hi).astype(bool)
    inner = utils.circle((n, n), c, lo - 1).astype(bool) \
        if lo - 1 >= 0 else np.zeros((n, n), bool)
    np.testing.assert_array_equal(band, outer & ~inner)
    # The band contains every Bresenham ring in its radius range, including
    # the thickness=1 perimeter itself.
    for rr in range(max(0, lo), hi + 1):
        ring = utils.circle((n, n), c, rr, thickness=1).astype(bool)
        assert (band | ring).sum() == band.sum()
    # Monotone: thicker strokes are supersets.
    thicker = utils.circle((n, n), c, r, thickness=t + 2).astype(bool)
    assert (thicker | band).sum() == thicker.sum()
    # Pixel-count sanity vs the ideal t-px stroke area 2*pi*r*t: the band
    # must be within ~20% of it (the old ceil-both-ways band was +50-100%).
    ideal = 2 * np.pi * r * t
    assert abs(band.sum() - ideal) / ideal < 0.25


def test_misc_helpers():
    assert utils.ceildiv(7, 2) == 4
    assert utils.to_list(None) == []
    assert utils.to_list("abc") == ["abc"]
    assert utils.to_list((1, 2)) == [1, 2]
    assert utils.natural_sort_key("a10b2") < utils.natural_sort_key("a10b11")

    def f(a, b=1):
        return a

    assert utils.valid_kwargs({"b": 2, "c": 3}, f) == {"b": 2}


def test_batched_disk_annulus_masks_match_scalar():
    """disk_masks/annulus_masks are bit-identical per row to the scalar
    circle/annulus rasterizers, including off-image centers, clipped
    disks, r=0, and negative radii (empty)."""
    rng = np.random.default_rng(13)
    L = 21
    centers = np.stack([rng.integers(-5, L + 5, 40),
                        rng.integers(-5, L + 5, 40)], axis=1)
    radii = rng.integers(-1, 9, 40)
    batched = utils.disk_masks((L, L), centers, radii)
    for i, ((cy, cx), r) in enumerate(zip(centers, radii)):
        ref = utils.circle((L, L), (cy, cx), int(r)).astype(bool)
        np.testing.assert_array_equal(batched[i], ref, err_msg=str(i))
    ann = utils.annulus_masks((L, L), centers, 7, 3)
    for i, (cy, cx) in enumerate(centers):
        ref = utils.annulus((L, L), (cy, cx), 7, 3, True)
        np.testing.assert_array_equal(ann[i], ref, err_msg=str(i))
