"""Kernel-level detection tests: OpenCV parity and NMS semantics."""

import os
import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import cv2 as cv  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from magnify_tpu import utils  # noqa: E402
from magnify_tpu.ops import edge as edge_ops  # noqa: E402
from magnify_tpu.ops.nms import claimed_raster_nms  # noqa: E402
from magnify_tpu.ops.score import dedupe_circles  # noqa: E402
from tests.synth import draw_beads  # noqa: E402


def reference_edge_stack(img_u8, low_q, high_q):
    """The reference's exact OpenCV sequence (utils.py:115-142)."""
    blur = cv.GaussianBlur(img_u8, (5, 5), 0)
    dx = cv.Scharr(blur, ddepth=cv.CV_32F, dx=1, dy=0)
    dy = cv.Scharr(blur, ddepth=cv.CV_32F, dx=0, dy=1)
    grad = np.sqrt(dx**2 + dy**2)
    lo = np.quantile(grad, low_q)
    hi = np.quantile(grad, high_q)
    edges = cv.Canny(dx.astype(np.int16), dy.astype(np.int16),
                     threshold1=lo, threshold2=hi, L2gradient=True)
    return blur, dx, dy, (lo, hi), edges != 0


@pytest.mark.parametrize("seed,n_beads", [(0, 8), (1, 20)])
def test_edge_stack_matches_opencv_on_clean_beads(seed, n_beads):
    rng = np.random.default_rng(seed)
    pos = rng.integers(40, 472, size=(n_beads, 2))
    img = draw_beads((512, 512), pos, diameters=20)
    u8 = utils.to_uint8(img)

    blur_cv, dx_cv, dy_cv, (lo, hi), edges_cv = reference_edge_stack(
        u8, 0.1, 0.9
    )
    edges, dx, dy, _ = jax.jit(edge_ops.edge_pipeline)(
        jnp.asarray(img, jnp.float32), 0.1, 0.9
    )
    np.testing.assert_array_equal(np.asarray(dx), dx_cv)
    np.testing.assert_array_equal(np.asarray(dy), dy_cv)
    agreement = (np.asarray(edges) == edges_cv).mean()
    assert agreement == 1.0


def test_edge_stack_close_to_opencv_on_noise():
    rng = np.random.default_rng(2)
    img = rng.normal(100, 20, (256, 256)).astype(np.float32)
    img[100:130, 100:130] += 500
    u8 = utils.to_uint8(img)
    *_, edges_cv = reference_edge_stack(u8, 0.1, 0.9)
    edges, _, _, _ = jax.jit(edge_ops.edge_pipeline)(
        jnp.asarray(img), 0.1, 0.9
    )
    # Thresholds interpolate in f32 on device vs numpy's f64: a 1-ulp
    # difference can flip the integer floor(threshold^2) boundary, flipping
    # borderline weak pixels and their hysteresis cascades. NMS, thresholds,
    # and hysteresis are otherwise verified bit-exact against a scalar
    # transcription of OpenCV's semantics.
    agreement = (np.asarray(edges) == edges_cv).mean()
    assert agreement > 0.995


def test_histogram_quantile_exactly_matches_numpy():
    rng = np.random.default_rng(3)
    for x in (rng.gamma(2.0, 100.0, (512, 512)),
              np.round(rng.normal(100, 30, (512, 512))),  # heavy ties
              np.full((64, 64), 3.5)):
        x = x.astype(np.float32)
        for q in (0.0, 0.1, 0.5, 0.9, 0.99, 1.0):
            mine = np.float32(jax.jit(edge_ops.histogram_quantile)(
                jnp.asarray(x), q))
            ref = np.float32(np.quantile(x, q))
            assert mine == ref, (q, mine, ref)


def greedy_reference_nms(circles, min_dist):
    """Literal transcription-free reimplementation of the claimed-raster
    semantics in pure python, used as the oracle."""
    ring = utils.circle_points(min_dist, four_connected=True)
    claimed = {}
    keep = []
    for i, (r, c, _rad) in enumerate(circles):
        pts = [(int(r + dr), int(c + dc)) for dr, dc in ring]
        if any(p in claimed for p in pts):
            keep.append(False)
            continue
        keep.append(True)
        for p in pts:
            claimed[p] = i
    return np.array(keep)


def test_nms_matches_greedy_oracle():
    rng = np.random.default_rng(4)
    n = 200
    circles = np.stack([
        rng.integers(20, 180, n), rng.integers(20, 180, n),
        rng.integers(8, 12, n),
    ], axis=1).astype(np.int32)
    accepted = claimed_raster_nms(
        jnp.asarray(circles), jnp.ones(n, bool), min_dist=8, height=200,
        width=200, max_radius=12,
    )
    expected = greedy_reference_nms(circles, 8)
    np.testing.assert_array_equal(np.asarray(accepted), expected)


def test_nms_zero_min_dist_keeps_all():
    circles = jnp.asarray([[10, 10, 5], [10, 10, 5]], jnp.int32)
    out = claimed_raster_nms(circles, jnp.ones(2, bool), min_dist=0,
                             height=64, width=64, max_radius=5)
    assert np.asarray(out).all()


def test_dedupe_collapses_rounded_triples():
    circles = jnp.asarray([
        [10.2, 10.4, 8.1],
        [9.8, 10.0, 8.4],   # rounds to the same (10, 10, 8)
        [30.0, 40.0, 9.0],
        [200.0, 10.0, 8.0],  # off-image rows (height 100)
        [10.0, 10.0, 30.0],  # radius out of bounds
    ], jnp.float32)
    valid = jnp.ones(5, bool)
    uniq, uvalid, n = dedupe_circles(circles, valid, height=100, width=100,
                                     min_radius=5, max_radius=12, cap=8)
    assert int(n) == 2
    got = {tuple(row) for row in np.asarray(uniq)[np.asarray(uvalid)].tolist()}
    assert got == {(10, 10, 8), (30, 40, 9)}


def test_dedupe_fuzz_both_paths_match_numpy_oracle():
    """Raster scatter-min dedupe and the sorted fallback (huge key spaces,
    ops/score.py _dedupe_sorted) both produce exactly the oracle's unique
    rounded-triple set under random duplicates/invalid/out-of-bounds mixes.
    The two paths compact in different orders (input order vs
    lexicographic), so sets are compared."""
    from magnify_tpu.ops.score import _dedupe_sorted

    rng = np.random.default_rng(7)
    height, width, min_radius, max_radius, cap = 80, 96, 4, 9, 512
    for trial in range(5):
        n = 400
        # Coarse grid + jitter forces rounded-triple collisions; wide
        # ranges force the radius and off-image filters to engage.
        circles = np.stack([
            rng.integers(-20, height + 20, n) + rng.normal(0, 0.3, n),
            rng.integers(-20, width + 20, n) + rng.normal(0, 0.3, n),
            rng.integers(min_radius - 3, max_radius + 4, n)
            + rng.normal(0, 0.3, n),
        ], axis=1).astype(np.float32)
        valid = rng.random(n) > 0.3

        rc = np.round(circles).astype(np.int32)
        row, col, rad = rc[:, 0], rc[:, 1], rc[:, 2]
        ok = (valid & (rad >= min_radius) & (rad <= max_radius)
              & (row + rad >= 0) & (col + rad >= 0)
              & (row - rad < height) & (col - rad < width))
        oracle = {tuple(t) for t in rc[ok].tolist()}
        assert len(oracle) > 50  # the fixture actually exercises dedupe

        uniq, uvalid, n_uniq = dedupe_circles(
            jnp.asarray(circles), jnp.asarray(valid), height=height,
            width=width, min_radius=min_radius, max_radius=max_radius,
            cap=cap)
        got = {tuple(t) for t in
               np.asarray(uniq)[np.asarray(uvalid)].tolist()}
        assert int(n_uniq) == len(oracle)
        assert got == oracle

        s_uniq, s_uvalid, s_n = _dedupe_sorted(
            jnp.asarray(row), jnp.asarray(col), jnp.asarray(rad),
            jnp.asarray(ok), max_radius, cap)
        s_got = {tuple(t) for t in
                 np.asarray(s_uniq)[np.asarray(s_uvalid)].tolist()}
        assert int(s_n) == len(oracle)
        assert s_got == oracle


def test_disk_mask_matches_host_rasterizer():
    from magnify_tpu.ops.geom import annulus_mask, disk_mask

    for r in (3, 7, 10):
        dev = np.asarray(disk_mask((41, 41), 20, 20, r, 12))
        host = utils.circle((41, 41), (20, 20), r, 1).astype(bool)
        np.testing.assert_array_equal(dev, host)
    ann_dev = np.asarray(annulus_mask((41, 41), 20, 20, 12, 6, 12))
    ann_host = utils.annulus((41, 41), (20, 20), 12, 6, 1).astype(bool)
    np.testing.assert_array_equal(ann_dev, ann_host)


def test_masked_reductions():
    from magnify_tpu.ops.reduce import fg_mean_bg_median, masked_median

    rng = np.random.default_rng(5)
    roi = rng.normal(0, 1, (3, 2, 9, 9)).astype(np.float32)
    fg = rng.random((3, 9, 9)) > 0.6
    bg = (rng.random((3, 9, 9)) > 0.6) & ~fg
    out = fg_mean_bg_median(roi, fg, bg)
    for m in range(3):
        for c in range(2):
            expect = (roi[m, c][fg[m]].mean()
                      - np.median(roi[m, c][bg[m]]))
            assert out[m, c] == pytest.approx(expect, abs=1e-5)
    med = masked_median(roi[:, 0], fg)
    for m in range(3):
        assert med[m] == pytest.approx(np.median(roi[m, 0][fg[m]]), abs=1e-6)
    # Empty mask -> NaN.
    empty = np.zeros((1, 4, 4), bool)
    assert np.isnan(masked_median(np.ones((1, 4, 4), np.float32), empty))[0]


@pytest.mark.parametrize("mode", ["raster", "pairwise"])
def test_parallel_nms_matches_scan_nms(mode, monkeypatch):
    from magnify_tpu.ops.nms import parallel_greedy_nms

    monkeypatch.setenv("MAGNIFY_TPU_NMS", mode)
    rng = np.random.default_rng(7)
    for trial in range(3):
        n = 300
        circles = np.stack([
            rng.integers(10, 190, n), rng.integers(10, 190, n),
            rng.integers(8, 12, n),
        ], axis=1).astype(np.int32)
        valid = rng.random(n) > 0.1
        a = claimed_raster_nms(jnp.asarray(circles), jnp.asarray(valid),
                               min_dist=7, height=200, width=200,
                               max_radius=12)
        # The host wrapper re-resolves MAGNIFY_TPU_NMS on every call, so the
        # monkeypatched mode takes effect without bypassing the jit cache.
        b = parallel_greedy_nms(
            jnp.asarray(circles), jnp.asarray(valid), min_dist=7, height=200,
            width=200, max_radius=12)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_conv_scorer_matches_gather_scorer():
    from magnify_tpu.ops.score import (
        gather_map_scores, score_circles, score_maps,
    )

    rng = np.random.default_rng(8)
    img = draw_beads((128, 128), [[40, 40], [90, 80]], diameters=20)
    img = img + rng.normal(0, 3, img.shape)
    edges, _, _, ga = jax.jit(edge_ops.edge_pipeline)(
        jnp.asarray(img, jnp.float32), 0.1, 0.9
    )
    max_r, min_r = 12, 8
    pad = 2 * max_r
    gap = jnp.pad(ga, pad)
    egp = jnp.pad(edges, pad)
    circles = []
    for row in range(30, 110, 7):
        for col in range(30, 110, 11):
            for r in range(min_r, max_r + 1):
                circles.append((row + pad, col + pad, r))
    circles = jnp.asarray(np.array(circles, np.int32))
    valid = jnp.ones(len(circles), bool)

    exact = np.asarray(score_circles(gap, egp, circles, valid,
                                     max_radius=max_r))
    maps = score_maps(gap, egp, min_radius=min_r, max_radius=max_r)
    approx = np.asarray(gather_map_scores(maps, circles, valid,
                                          min_radius=min_r))
    # Fourier truncation error is bounded by the dropped harmonic mass
    # (~2.3% of the [-1, 1] score range per ring pixel).
    assert np.abs(exact - approx).max() < 0.04
    # Ranking of the real beads is preserved.
    assert np.argmax(exact) == np.argmax(approx)


def test_dense_detector_matches_ransac_on_clean_fixture():
    import os

    from magnify_tpu.ops.detect import find_circles

    img = draw_beads((512, 512), [[100, 100], [100, 380], [256, 256],
                                  [400, 120], [380, 400]], diameters=20)
    ransac_c, _ = find_circles(img, 0.1, 0.9, 20, 20000, 8, 12, 0.3, 8,
                               detector="ransac")
    dense_c, dense_s = find_circles(img, 0.1, 0.9, 20, 100, 8, 12, 0.3, 8,
                                    detector="dense")
    assert len(dense_c) == 5
    # Dense finds the same circles (order may differ).
    got_r = {tuple(c) for c in ransac_c.tolist()}
    got_d = {tuple(c) for c in dense_c.tolist()}
    for center in got_r:
        assert any(abs(center[0] - d[0]) <= 1 and abs(center[1] - d[1]) <= 1
                   and abs(center[2] - d[2]) <= 1 for d in got_d)


def test_dense_detector_empty_image():
    from magnify_tpu.ops.detect import find_circles

    img = np.zeros((256, 256), np.uint16)
    c, s = find_circles(img, 0.1, 0.9, 20, 100, 8, 12, 0.3, 8,
                        detector="dense")
    assert len(c) == 0


def test_dense_roi_detection_matches_truth():
    from magnify_tpu.ops.detect import detect_best_in_rois

    rois = np.stack([
        draw_beads((72, 72), [[36, 36]], diameters=20),
        draw_beads((72, 72), [[30, 40]], diameters=22),
        np.zeros((72, 72), np.uint16),
    ])
    circles, scores, found = detect_best_in_rois(
        rois, 0.1, 1 - np.pi * 8 / 72**2, 20, 100, 8, 16, 0.2,
        detector="dense",
    )
    assert found.tolist() == [True, True, False]
    assert tuple(circles[0][:2]) == (36, 36) and circles[0][2] == 10
    assert tuple(circles[1][:2]) == (30, 40) and circles[1][2] == 11


def test_find_circles_stack_batches_planes():
    from magnify_tpu.ops.detect import find_circles_stack

    img0 = draw_beads((256, 256), [[80, 80], [180, 160]], diameters=20)
    img1 = draw_beads((256, 256), [[60, 190]], diameters=20)
    out = find_circles_stack(np.stack([img0, img1]), 0.1, 0.9, 8, 12, 0.3, 8)
    assert len(out) == 2
    c0, s0 = out[0]
    c1, s1 = out[1]
    assert len(c0) == 2 and len(c1) == 1
    assert tuple(c1[0][:2]) == (60, 190)


def test_batched_dense_packed_matches_single_plane():
    """The batched program (native N=B score conv + vmapped tail) must be
    BIT-identical per plane to the single-plane packed program."""
    from magnify_tpu.ops.detect import (
        _stage_dense_batch_packed,
        _stage_dense_packed,
        normalize_planes_u8,
    )

    img = draw_beads((256, 256), [[80, 80], [180, 160], [60, 190]],
                     diameters=20)
    stack = np.stack([np.roll(img, 7 * b, axis=1) for b in range(3)])
    planes = jnp.asarray(normalize_planes_u8(stack).astype(np.float32))
    kw = dict(min_radius=8, max_radius=12, cap=1024, nms_cap=1024,
              min_dist=8, pull_cap=63, normalized=True)
    pb, fb = _stage_dense_batch_packed(planes, 0.1, 0.9, 0.3, **kw)
    for b in range(3):
        p1, f1 = _stage_dense_packed(planes[b], 0.1, 0.9, 0.3, **kw)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(pb)[b])
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(fb)[b])


def test_multi_channel_detect_batched_matches_sequential():
    """S>1 channels route through the batched detector; the result must be
    bit-identical to the sequential per-channel form (same dedupe order)."""
    import jax

    from magnify_tpu.components.find import (
        _cross_channel_dedupe,
        _multi_channel_detect,
    )
    from magnify_tpu.ops.detect import _stage_dense_full

    img0 = draw_beads((256, 256), [[80, 80], [180, 160]], diameters=20)
    img1 = draw_beads((256, 256), [[82, 82], [60, 190]], diameters=20)
    planes = jnp.asarray(np.stack([img0, img1]).astype(np.float32))
    kw = dict(min_radius=8, max_radius=12, cap=1024, nms_cap=1024,
              min_dist=8, normalized=False)

    got_c, got_v, got_nk = jax.jit(
        lambda p: _multi_channel_detect(p, 0.1, 0.9, 0.3, 16.0, **kw)
    )(planes)

    blocks, nks = [], []
    for ci in range(2):
        c, _s, acc, nk = _stage_dense_full(planes[ci], 0.1, 0.9, 0.3, **kw)
        blocks.append((c, acc))
        nks.append(nk)
    want_c, want_v = _cross_channel_dedupe(blocks, 16.0, 1024)
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    assert int(got_nk) == int(jnp.max(jnp.stack(nks)))
    # The dedupe must have dropped channel 1's near-duplicate of (80, 80).
    got = np.asarray(got_c)[np.asarray(got_v)]
    assert len(got) == 3


def test_detect_rois_dense_batch_independent():
    """The batched N=n_rois score conv must give each ROI the same answer
    it gets alone (n=1): batching cannot leak across ROIs."""
    from magnify_tpu.ops.detect import _detect_rois_dense

    rois = np.stack([
        draw_beads((72, 72), [[36, 36]], diameters=20),
        draw_beads((72, 72), [[30, 40]], diameters=22),
        np.zeros((72, 72), np.uint16),
    ]).astype(np.float32)
    cb, sb = _detect_rois_dense(jnp.asarray(rois), 0.1, 0.9, 0.2,
                                min_radius=8, max_radius=16)
    for i in range(3):
        c1, s1 = _detect_rois_dense(jnp.asarray(rois[i:i + 1]), 0.1, 0.9,
                                    0.2, min_radius=8, max_radius=16)
        np.testing.assert_array_equal(np.asarray(c1)[0], np.asarray(cb)[i])
        np.testing.assert_array_equal(np.asarray(s1)[0], np.asarray(sb)[i])


def test_score_maps_leading_batch_matches_single():
    """score_maps/score_maps_folded on (B, Hp, Wp) inputs must equal the
    per-plane calls byte-for-byte (the native-batch conv is exact)."""
    from magnify_tpu.ops import edge as edge_ops
    from magnify_tpu.ops.score import score_maps

    img = draw_beads((128, 128), [[40, 40], [60, 90]], diameters=20)
    stack = np.stack([img, np.roll(img, 9, axis=0)]).astype(np.float32)

    def prep(im):
        edges, dx, dy, _ = edge_ops.edge_pipeline(jnp.asarray(im), 0.1, 0.9)
        pad = 2 * 12
        return (jnp.pad(edges, pad), jnp.pad(dx, pad), jnp.pad(dy, pad))

    eg0, dx0, dy0 = prep(stack[0])
    eg1, dx1, dy1 = prep(stack[1])
    want0 = score_maps(None, eg0, min_radius=8, max_radius=12,
                       grads=(dx0, dy0))
    want1 = score_maps(None, eg1, min_radius=8, max_radius=12,
                       grads=(dx1, dy1))
    got = score_maps(None, jnp.stack([eg0, eg1]), min_radius=8,
                     max_radius=12,
                     grads=(jnp.stack([dx0, dx1]), jnp.stack([dy0, dy1])))
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want0))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want1))


def test_s2d_conv_matches_plain_conv():
    from magnify_tpu.ops.score import score_maps

    rng = np.random.default_rng(11)
    img = draw_beads((96, 128), [[40, 40], [60, 90]], diameters=20)
    edges, _, _, ga = jax.jit(edge_ops.edge_pipeline)(
        jnp.asarray(img, jnp.float32), 0.1, 0.9
    )
    pad = 24
    gap, egp = jnp.pad(ga, pad), jnp.pad(edges, pad)
    plain = np.asarray(score_maps(gap, egp, min_radius=8, max_radius=12,
                                  s2d=1))
    folded = np.asarray(score_maps(gap, egp, min_radius=8, max_radius=12,
                                   s2d=4))
    assert plain.shape == folded.shape
    np.testing.assert_allclose(folded, plain, atol=5e-3)


def _quant_fixture():
    rng = np.random.default_rng(11)
    img = draw_beads((96, 128), [[40, 40], [60, 90]], diameters=20)
    img = img + rng.normal(0, 3, img.shape)
    edges, _, _, ga = jax.jit(edge_ops.edge_pipeline)(
        jnp.asarray(img, jnp.float32), 0.1, 0.9
    )
    pad = 24
    return jnp.pad(ga, pad), jnp.pad(edges, pad)


def test_int8_score_maps_close_to_bf16():
    """int8 quantization error stays well under the k<=7 harmonic
    truncation bound (the TPU default routes the score conv through the
    2x int8 MXU path; see score._ring_conv_kernel_q8)."""
    from magnify_tpu.ops.score import score_maps

    gap, egp = _quant_fixture()
    ref = np.asarray(score_maps(gap, egp, min_radius=8, max_radius=12,
                                s2d=1, qdtype="bf16"))
    q = np.asarray(score_maps(gap, egp, min_radius=8, max_radius=12,
                              s2d=1, qdtype="int8"))
    assert np.abs(ref - q).max() < 0.015


def test_int8_fold_fungibility_bit_identical():
    """Folded and unfolded int8 score maps are BIT-identical: the folded
    kernel is quantized with the unfolded per-radius scales (the fold only
    redistributes taps) and int32 accumulation is exact — the property the
    mesh path's single-chip parity relies on (parallel/mesh.py uses
    s2d=1 while the single-chip dense detector runs folded)."""
    from magnify_tpu.ops.score import score_maps

    gap, egp = _quant_fixture()
    plain = np.asarray(score_maps(gap, egp, min_radius=8, max_radius=12,
                                  s2d=1, qdtype="int8"))
    folded = np.asarray(score_maps(gap, egp, min_radius=8, max_radius=12,
                                   s2d=4, qdtype="int8"))
    np.testing.assert_array_equal(plain, folded)


def test_int8_survivor_set_matches_bf16():
    """The detection-relevant property: at the bench threshold the int8
    and bf16 score maps keep the SAME survivor set on a noisy fixture
    (the TPU-side gate script scripts/score_quant_gate.py asserts the
    same identity end-to-end on the full bench pipelines)."""
    from magnify_tpu.ops.score import score_maps

    gap, egp = _quant_fixture()
    ref = np.asarray(score_maps(gap, egp, min_radius=8, max_radius=12,
                                s2d=1, qdtype="bf16"))
    q = np.asarray(score_maps(gap, egp, min_radius=8, max_radius=12,
                              s2d=1, qdtype="int8"))
    np.testing.assert_array_equal(ref >= 0.3, q >= 0.3)


def test_pallas_hysteresis_matches_xla_loop():
    from magnify_tpu.ops.edge import dilate8
    from magnify_tpu.ops.pallas_kernels import hysteresis

    rng = np.random.default_rng(12)
    strong = jnp.asarray(rng.random((64, 128)) > 0.97)
    weak = strong | jnp.asarray(rng.random((64, 128)) > 0.7)

    def xla_fixpoint(s, w):
        def cond(state):
            return state[1]

        def body(state):
            cur, _ = state
            grown = dilate8(cur) & w | cur
            return grown, jnp.any(grown != cur)

        return jax.lax.while_loop(cond, body, (s, jnp.asarray(True)))[0]

    a = np.asarray(jax.jit(xla_fixpoint)(strong, weak))
    b = np.asarray(hysteresis(strong, weak))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("tile_rows", [8, 16, 48])
def test_pallas_tiled_hysteresis_matches_xla_loop(tile_rows):
    """The serpentine tiled kernel (the > VMEM path) reaches the same
    least fixpoint as the whole-plane dilation across block sizes,
    including blocks that don't divide the plane and chains that cross
    block boundaries repeatedly."""
    from magnify_tpu.ops.edge import dilate8
    from magnify_tpu.ops.pallas_kernels import hysteresis

    def xla_fixpoint(s, w):
        def cond(state):
            return state[1]

        def body(state):
            cur, _ = state
            grown = dilate8(cur) & w | cur
            return grown, jnp.any(grown != cur)

        return jax.lax.while_loop(cond, body, (s, jnp.asarray(True)))[0]

    rng = np.random.default_rng(12)
    strong = jnp.asarray(rng.random((100, 150)) > 0.99)
    weak = strong | jnp.asarray(rng.random((100, 150)) > 0.65)
    a = np.asarray(jax.jit(xla_fixpoint)(strong, weak))
    b = np.asarray(hysteresis(strong, weak, tile_rows=tile_rows))
    np.testing.assert_array_equal(a, b)

    # A serpentine chain spanning many blocks: down-and-up propagation.
    img = np.zeros((96, 150), bool)
    img[5, 10:140] = True      # top H run
    img[5:90, 140] = True      # long V run down
    img[90, 20:141] = True     # bottom H run back
    img[20:91, 20] = True      # V run back up
    strong2 = np.zeros_like(img)
    strong2[5, 10] = True
    a2 = np.asarray(jax.jit(xla_fixpoint)(jnp.asarray(strong2),
                                          jnp.asarray(img)))
    b2 = np.asarray(hysteresis(jnp.asarray(strong2), jnp.asarray(img),
                               tile_rows=tile_rows))
    np.testing.assert_array_equal(a2, b2)
    assert a2.sum() == img.sum()  # the whole chain lights up


def test_grow_cap_errors_at_ceiling():
    """A degenerate detection (more survivors than the compaction ceiling)
    must raise instead of re-dispatching the same program forever."""
    from magnify_tpu.ops.detect import CAP_CEILING, _grow_cap

    cap = 4096
    cap = _grow_cap(100_000, cap)
    assert cap >= 100_000 and cap & (cap - 1) == 0
    with pytest.raises(ValueError, match="ceiling"):
        _grow_cap(CAP_CEILING + 1, CAP_CEILING)


def test_checkify_mode_matches_unchecked(monkeypatch):
    """MAGNIFY_TPU_CHECKIFY=1 runs detection under float/index guards and
    returns identical results on healthy inputs."""
    import jax

    if jax.default_backend() not in ("cpu", "tpu") or             jax.default_backend() == "tpu":
        pytest.skip("checkify lowering is exercised on the CPU backend")
    from magnify_tpu.ops.detect import find_circles
    from tests.synth import draw_beads

    img = draw_beads((128, 128), [[40, 40], [90, 90]], diameters=16)
    ref_c, ref_s = find_circles(img, 0.1, 0.9, 20, 1000, 6, 10, 0.3, 6,
                                detector="dense")
    monkeypatch.setenv("MAGNIFY_TPU_CHECKIFY", "1")
    got_c, got_s = find_circles(img, 0.1, 0.9, 20, 1000, 6, 10, 0.3, 6,
                                detector="dense")
    np.testing.assert_array_equal(got_c, ref_c)
    np.testing.assert_array_equal(got_s, ref_s)
    assert len(ref_c) == 2


def test_histogram_quantiles_property_fuzz():
    """Seeded fuzz: exact np.quantile equality across distributions, sizes,
    duplicates, negatives, and extreme magnitudes."""
    import jax

    from magnify_tpu.ops.edge import histogram_quantiles

    rng = np.random.default_rng(42)
    datasets = [
        rng.normal(0, 1, 10_001).astype(np.float32),
        rng.gamma(0.3, 1e6, 4_096).astype(np.float32),
        np.repeat(rng.normal(5, 2, 13).astype(np.float32), 100),
        (rng.random(2_048).astype(np.float32) - 0.5) * 1e30,
        np.array([3.0], np.float32),
        np.array([-1.0, -1.0, 2.0], np.float32),
    ]
    qs = np.array([0.0, 0.013, 0.1, 0.5, 0.9, 0.987, 1.0], np.float32)
    fn = jax.jit(lambda x: histogram_quantiles(x, qs))
    for data in datasets:
        got = np.asarray(fn(data))
        want = np.quantile(data.astype(np.float32), qs).astype(np.float32)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mode", ["raster", "pairwise"])
def test_nms_oracle_property_fuzz(mode, monkeypatch):
    """Seeded fuzz: both parallel NMS formulations (raster scatter rounds
    and the pairwise conflict-matrix rounds used on TPU) equal the
    sequential claimed-raster oracle across random circle sets, validity
    masks, and distances."""
    from magnify_tpu.ops.nms import claimed_raster_nms, parallel_greedy_nms

    monkeypatch.setenv("MAGNIFY_TPU_NMS", mode)
    rng = np.random.default_rng(7)
    for _ in range(15):
        n = int(rng.integers(1, 120))
        circles = np.stack([
            rng.integers(-5, 100, n), rng.integers(-5, 130, n),
            rng.integers(3, 9, n),
        ], axis=1).astype(np.int32)
        valid = rng.random(n) < 0.85
        md = int(rng.integers(1, 10))
        a = np.asarray(parallel_greedy_nms(
            jnp.asarray(circles), jnp.asarray(valid), min_dist=md,
            height=96, width=128, max_radius=8))
        b = np.asarray(claimed_raster_nms(circles, valid, min_dist=md,
                                          height=96, width=128,
                                          max_radius=8))
        np.testing.assert_array_equal(a, b)


def test_ranked_survivor_sources_oracle_fuzz():
    """Seeded fuzz: the hierarchical compare-reduce rank extraction equals
    ``searchsorted(cumsum(keep.ravel()), 1..cap)`` exactly — across row
    widths (incl. non-lane-aligned and width-1), occupancies (empty, full,
    sparse), multiple super-groups (> 256 rows), and n_keep > cap
    overflow. Entries past n_keep are unspecified; only [:min(n, cap)]
    and the count are pinned."""
    import functools

    import jax

    from magnify_tpu.ops.detect import ranked_survivor_sources

    rng = np.random.default_rng(7)
    cases = []
    for trial in range(24):
        nr = int(rng.integers(1, 2000))
        wd = int(rng.choice([1, 2, 7, 67, 128, 256]))
        p = float(rng.choice([0.0, 0.001, 0.02, 0.3, 1.0]))
        cases.append((rng.random((nr, wd)) < p, int(rng.choice([4, 64, 512]))))
    cases.append((np.zeros((1, 1), bool), 8))
    cases.append((np.ones((3000, 67), bool), 128))  # n_keep >> cap, 12 supers
    for keep, cap in cases:
        src, nk = jax.jit(
            functools.partial(ranked_survivor_sources, cap=cap)
        )(jnp.asarray(keep))
        kf = keep.ravel()
        cs = np.cumsum(kf)
        n = int(cs[-1]) if kf.size else 0
        oracle = np.searchsorted(cs, np.arange(1, cap + 1), side="left")
        m = min(n, cap)
        assert int(nk) == n, (keep.shape, cap, int(nk), n)
        np.testing.assert_array_equal(np.asarray(src)[:m], oracle[:m])


def test_dense_candidates_folded_layout_matches_unfolded():
    """The folded-s2d dense path must be bit-identical to compacting the
    UNFOLDED maps of the same conv: identical survivor set (n_keep <= cap)
    and the same (-score, unfolded row-major index) order. Guards the
    layout-fungibility argument in ops/detect.py's folded branch — the
    oracle below unfolds via score_maps (a pure permutation of the same
    conv output) and compacts in numpy."""
    from magnify_tpu.ops.detect import _dense_candidates, _pad_for_scoring
    from magnify_tpu.ops.edge import edge_pipeline
    from magnify_tpu.ops.score import score_maps

    rng = np.random.default_rng(3)
    img = draw_beads((160, 200), [[40, 50], [80, 150], [120, 60]],
                     diameters=20).astype(np.float32)
    img = img + rng.normal(0, 4, img.shape).astype(np.float32)
    h, w = img.shape
    min_r, max_r, cap, thresh = 8, 12, 512, 0.2

    c_folded, s_folded, n_folded = _dense_candidates(
        jnp.asarray(img), 0.1, 0.9, thresh, min_radius=min_r,
        max_radius=max_r, cap=cap)
    n_folded = int(n_folded)
    assert 0 < n_folded <= cap

    edges, dx, dy, _ga = edge_pipeline(jnp.asarray(img), 0.1, 0.9)
    # The oracle unfolds the SAME conv (gradient-derived features, like the
    # production path) — this test pins layout fungibility, not features.
    dxp, egp, pad = _pad_for_scoring(dx, edges, max_r)
    maps = np.asarray(score_maps(None, egp, min_radius=min_r,
                                 max_radius=max_r,
                                 grads=(dxp, jnp.pad(dy, pad))))
    n_r, hp, wp = maps.shape
    rads = np.arange(n_r)[:, None, None] + min_r
    rows = np.arange(hp)[None, :, None] - pad
    cols = np.arange(wp)[None, None, :] - pad
    ok = (rows + rads >= 0) & (cols + rads >= 0)
    ok = ok & (rows - rads < h) & (cols - rads < w)
    keep = ok & (maps >= thresh)
    lin = np.flatnonzero(keep.ravel())
    assert len(lin) == n_folded
    order = np.lexsort((lin, -maps.ravel()[lin]))
    lin = lin[order]
    want_scores = maps.ravel()[lin]
    want_circles = np.stack(
        [lin % (hp * wp) // wp - pad, lin % wp - pad,
         lin // (hp * wp) + min_r], axis=1)
    np.testing.assert_array_equal(np.asarray(c_folded)[:n_folded],
                                  want_circles)
    np.testing.assert_array_equal(np.asarray(s_folded)[:n_folded],
                                  want_scores)


def test_ransac_cap_grow_retry_paths(monkeypatch):
    """Force tiny memoized unique/NMS caps so the ransac host loop's two
    grow-retry branches both execute, and pin that the final result equals
    a run that started with ample caps."""
    import magnify_tpu.ops.detect as detect_mod
    from magnify_tpu.ops.detect import find_circles

    img = draw_beads((256, 256), [[64, 64], [64, 192], [128, 128],
                                  [192, 64], [192, 192]], diameters=20)
    kw = dict(low_edge_quantile=0.1, high_edge_quantile=0.9, grid_length=20,
              num_iter=20000, min_radius=8, max_radius=12,
              min_roundness=0.3, min_dist=8, detector="ransac")

    want_c, want_s = find_circles(img, **kw)
    assert len(want_c) == 5

    h, w = img.shape
    ucap_key = ("ransac", h, w, 8, 12)
    keep_key = ("ransac_keep", h, w, 8, 12)
    memo = dict(detect_mod._cap_memo)
    memo[ucap_key] = 4      # n_unique certainly exceeds this -> grow
    memo[keep_key] = 2      # n_keep exceeds this -> grow
    monkeypatch.setattr(detect_mod, "_cap_memo", memo)

    got_c, got_s = find_circles(img, **kw)
    assert memo[ucap_key] > 4 and memo[keep_key] > 2
    np.testing.assert_array_equal(got_c, want_c)
    np.testing.assert_array_equal(got_s, want_s)


def test_fg_mean_bg_median_chunked_twin_bit_identical(monkeypatch):
    """The mark-chunked numpy reduction equals the single-block twin
    bit-for-bit. The REAL chunked dispatch loop is driven by shrinking
    _row_chunk (the default 32 MB budget exceeds any test fixture)."""
    import magnify_tpu.ops.reduce as red
    from magnify_tpu.ops.reduce import (
        _fg_mean_bg_median_np,
        _fg_mean_bg_median_np_block,
    )

    rng = np.random.default_rng(2)
    n, C, L = 300, 3, 24
    roi = rng.normal(100, 30, (n, C, L, L)).astype(np.float32)
    fg = rng.random((n, L, L)) > 0.5
    bg = rng.random((n, L, L)) > 0.5
    fg[0] = False  # empty masks hit the NaN paths in both twins
    bg[1] = False
    whole = _fg_mean_bg_median_np_block(roi, fg, bg)
    np.testing.assert_array_equal(
        _fg_mean_bg_median_np(roi, fg, bg), whole)
    # Force the multi-chunk loop (ragged final chunk: 300 % 37 != 0).
    monkeypatch.setattr(red, "_row_chunk", lambda *a, **k: 37)
    chunked = _fg_mean_bg_median_np(roi, fg, bg)
    np.testing.assert_array_equal(chunked,
                                  np.asarray(whole, np.float32))


def test_masked_median_mean_twins_match_device(monkeypatch):
    """The numpy twins of masked_median/masked_mean equal the device
    reductions (median bit-identical: both select the same sorted
    elements; mean to f32 tolerance), including empty-mask NaN rows and
    forced chunked execution."""
    from magnify_tpu.ops.reduce import (
        _masked_mean_np_block,
        _masked_median_np_block,
        _masked_mean,
        _masked_median,
        _rowwise,
        masked_mean,
        masked_median,
    )

    rng = np.random.default_rng(9)
    n, L = 129, 17
    vals = rng.normal(50, 40, (n, L, L)).astype(np.float32)
    mask = rng.random((n, L, L)) > 0.55
    mask[3] = False  # empty mask -> NaN
    mask[4] = True   # full mask

    dev_med = np.asarray(_masked_median(jnp.asarray(vals), jnp.asarray(mask)))
    host_med = _masked_median_np_block(vals, mask)
    np.testing.assert_array_equal(host_med, dev_med)

    dev_mean = np.asarray(_masked_mean(jnp.asarray(vals), jnp.asarray(mask)))
    host_mean = _masked_mean_np_block(vals, mask)
    np.testing.assert_allclose(host_mean, dev_mean, rtol=1e-5, atol=1e-4)

    # Drive the REAL chunked _rowwise loop (ragged final chunk).
    import magnify_tpu.ops.reduce as red
    monkeypatch.setattr(red, "_row_chunk", lambda *a, **k: 23)
    np.testing.assert_array_equal(_rowwise(_masked_median_np_block, vals,
                                           mask), host_med)
    np.testing.assert_allclose(_rowwise(_masked_mean_np_block, vals, mask),
                               host_mean, rtol=1e-6, atol=1e-6)
    monkeypatch.undo()

    # Public routing: small host inputs take the twin; results match.
    np.testing.assert_array_equal(masked_median(vals, mask), host_med)
    np.testing.assert_allclose(masked_mean(vals, mask), host_mean,
                               rtol=1e-6, atol=1e-6)


def test_packed_header_counts_exact_above_2_24():
    """Counts bit-stored in float32 packed-header slots survive values a
    plain f32 cast rounds (2^24 + 1 -> 2^24), which would let the host's
    grow-retry check accept a truncated survivor set."""
    from magnify_tpu.ops.detect import pack_count, unpack_count

    for n in (0, 1, (1 << 24) - 1, 1 << 24, (1 << 24) + 1,
              (1 << 24) + 3, (1 << 31) - 1):
        slot = np.asarray(pack_count(n))  # float32 scalar
        assert slot.dtype == np.float32
        assert unpack_count(slot) == n, n
    # The failure mode being prevented:
    assert int(np.float32((1 << 24) + 1)) == 1 << 24


def test_stack_pull_cap_spill_matches_default():
    """When a plane holds more accepted circles than the packed pull block
    (n_acc > pull_cap), the host completes the rows from the full device
    block — a branch the production pull_cap=511 never exercises at test
    scale. A tiny pull_cap must return exactly the default's circles."""
    from magnify_tpu.ops.detect import find_circles_stack

    rng = np.random.default_rng(17)
    img = rng.normal(100, 3, (160, 160)).astype(np.float32)
    centers = [(r, c) for r in range(20, 160, 36) for c in range(20, 160, 36)]
    for pos in centers:  # 16 beads > pull_cap=4
        pts = utils.filled_circle_points(7) + np.array(pos)
        img[pts[:, 0], pts[:, 1]] = 900.0
    planes = np.stack([img, img[::-1].copy()])

    kw = dict(min_radius=5, max_radius=9, min_roundness=0.2, min_dist=5)
    base = find_circles_stack(planes, 0.1, 0.9, **kw)
    spill = find_circles_stack(planes, 0.1, 0.9, pull_cap=4, **kw)
    assert len(base) == len(spill) == 2
    for (bc, bs), (sc, ss) in zip(base, spill):
        assert len(bc) > 4  # the spill branch actually engaged
        np.testing.assert_array_equal(sc, bc)
        np.testing.assert_array_equal(ss, bs)


def test_choose_upload_precision(monkeypatch):
    """Upload-precision policy (the chip minimum-traffic path): u8 for
    ordinary frames where markers occupy a visible slice of the dynamic
    range, u16 when rare extreme outliers (a saturated speck) compress the
    useful range so far that u8-of-the-global-range would band the
    per-chamber re-normalization (reference find.py:342 re-normalizes each
    ROI from RAW data); env override wins."""
    from magnify_tpu.ops.detect import (
        choose_upload_precision,
        normalize_planes_u16,
    )
    from tests.synth import draw_chip

    ordinary = draw_chip((3, 3), value=1000).astype(np.uint16)[None]
    assert choose_upload_precision(ordinary) == "u8"

    speck = ordinary.copy()
    speck[0, 2:5, 2:5] = 65535  # rare saturated outlier
    assert choose_upload_precision(speck) == "u16"

    # A flat plane has nothing to lose.
    assert choose_upload_precision(np.zeros((1, 64, 64), np.uint16)) == "u8"

    # Signal too sparse for the subsample to even see -> the safe choice.
    sparse = np.zeros((1, 512, 512), np.uint16)
    sparse[0, 100, 100] = 4000
    assert choose_upload_precision(sparse) == "u16"

    monkeypatch.setenv("MAGNIFY_TPU_UPLOAD_PRECISION", "u8")
    assert choose_upload_precision(speck) == "u8"
    monkeypatch.setenv("MAGNIFY_TPU_UPLOAD_PRECISION", "u16")
    assert choose_upload_precision(ordinary) == "u16"
    monkeypatch.setenv("MAGNIFY_TPU_UPLOAD_PRECISION", "bogus")
    with pytest.raises(ValueError, match="MAGNIFY_TPU_UPLOAD_PRECISION"):
        choose_upload_precision(ordinary)

    # The u16 rescale is monotone and within one level of the exact affine
    # map (65535*x overflows the 24-bit f32 mantissa, so exact identity is
    # not achievable) — i.e. it preserves ~65k distinguishable levels.
    full = np.arange(65536, dtype=np.uint16).reshape(1, 256, 256)
    q = normalize_planes_u16(full).astype(np.int32)
    assert np.abs(q - full.astype(np.int32)).max() <= 1
    assert (np.diff(q.reshape(-1)) >= 0).all()


def test_harmonics_7_vs_11_detection_set_identity(tmp_path):
    """Contract guardrail for the k<=7 score-harmonics default (advisor
    round 3; documented in docs/index.md "Numerics and compatibility
    notes"): on noisy fixtures — the marginal-detection-sensitive case —
    MAGNIFY_TPU_HARMONICS=7 and =11 must produce IDENTICAL detection sets.
    The knob is read once at import, so each setting runs in a fresh
    subprocess via the real env path."""
    import json
    import subprocess
    import sys

    worker = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, os.environ["MAGNIFY_TPU_TEST_REPO"])
from magnify_tpu.ops.detect import find_circles, normalize_planes_u8
from tests.synth import draw_beads

out = []
for seed, positions in ((0, [[60, 60], [60, 150], [150, 100], [200, 200]]),
                        (5, [[80, 120], [170, 60]])):
    rng = np.random.default_rng(seed)
    img = (draw_beads((256, 256), positions, diameters=20)
           + rng.normal(0, 6, (256, 256))).astype(np.float32)
    plane = normalize_planes_u8(img[None])[0]
    circles, _ = find_circles(plane, 0.1, 0.9, 20, 1000, 8, 12, 0.3, 8,
                              detector="dense")
    out.append(sorted(map(tuple, np.asarray(circles).tolist())))
print(json.dumps(out))
"""
    results = {}
    for k in ("7", "11"):
        env = dict(
            os.environ, MAGNIFY_TPU_HARMONICS=k, JAX_PLATFORMS="cpu",
            MAGNIFY_TPU_TEST_REPO=str(
                pathlib.Path(__file__).resolve().parents[1]),
        )
        proc = subprocess.run([sys.executable, "-c", worker], env=env,
                              capture_output=True, text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-2000:]
        results[k] = json.loads(proc.stdout.strip().splitlines()[-1])
    assert results["7"] == results["11"]
    assert sum(len(fixture) for fixture in results["7"]) >= 6
