"""Device grid-fit geometry (ops/gridfit.py) vs the host reference twins.

The fused chip step runs cluster_1d / label_clusters / regress_clusters on
device (float32); these tests pin it against the host implementations
(float64, reference semantics at /root/reference/src/magnify/find.py:632-748)
on random scatters, and pin the fused one-dispatch chip timestep against the
two-dispatch dense path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from magnify_tpu.components.find import (
    cluster_1d,
    label_clusters,
    regress_clusters,
)
from magnify_tpu.ops import gridfit


def _pad(points, cap=128):
    buf = np.zeros(cap, np.float32)
    buf[: len(points)] = points
    valid = np.zeros(cap, bool)
    valid[: len(points)] = True
    return jnp.asarray(buf), jnp.asarray(valid)


@pytest.mark.parametrize("seed", range(5))
def test_cluster_1d_matches_host(seed):
    rng = np.random.default_rng(seed)
    n_clusters = int(rng.integers(2, 10))
    length = float(rng.choice([60, 80, 100, 68.18]))
    total = int(n_clusters * length + rng.integers(40, 400))
    truth = np.arange(n_clusters) * length + rng.uniform(5, 30)
    pts = np.concatenate(
        [truth + rng.normal(0, 2, n_clusters) for _ in range(5)]
    )
    pts = np.clip(np.concatenate([pts, rng.uniform(0, total, 4)]), 0,
                  total - 1)
    pts = np.round(pts)  # detected circle centers are integers
    ideal = np.full(n_clusters, 5.0)

    host = cluster_1d(pts, total_length=total, num_clusters=n_clusters,
                      cluster_length=length, ideal_num_points=ideal,
                      penalty=10.0)
    buf, valid = _pad(pts)
    dev = np.asarray(gridfit.cluster_1d_dev(
        buf, valid, total_length=total, num_clusters=n_clusters,
        cluster_length=length, ideal_num_points=jnp.asarray(ideal),
        penalty=10.0,
    ))
    assert (dev[: len(pts)] == host).all()
    assert (dev[len(pts):] == -1).all()


def test_cluster_1d_empty_points():
    buf, valid = _pad(np.empty(0))
    dev = np.asarray(gridfit.cluster_1d_dev(
        buf, jnp.zeros_like(valid), total_length=500, num_clusters=4,
        cluster_length=100, ideal_num_points=jnp.full(4, 2.0), penalty=10.0,
    ))
    assert (dev == -1).all()


@pytest.mark.parametrize("seed", range(3))
def test_label_clusters_matches_host(seed):
    rng = np.random.default_rng(seed)
    pts = np.round(rng.uniform(0, 800, 40))
    host = label_clusters(pts, offset=37.0, num_clusters=6,
                          cluster_length=50.0, cluster_gap=70.0)
    buf, valid = _pad(pts)
    dev = np.asarray(gridfit.label_clusters_dev(
        buf, valid, offset=37.0, num_clusters=6, cluster_length=50.0,
        cluster_gap=70.0,
    ))
    assert (dev[: len(pts)] == host).all()
    assert (dev[len(pts):] == -1).all()


@pytest.mark.parametrize("seed", range(5))
def test_regress_clusters_matches_host(seed):
    rng = np.random.default_rng(100 + seed)
    n_clusters = int(rng.integers(2, 9))
    slope_true = rng.uniform(-0.02, 0.02)
    xs, ys, labels = [], [], []
    for c in range(n_clusters):
        m = int(rng.integers(0, 7))
        x = rng.uniform(0, 900, m)
        y = c * 100.0 + 50 + slope_true * x + rng.normal(0, 1, m)
        xs.append(x)
        ys.append(y)
        labels.append(np.full(m, c))
    xs = np.concatenate(xs)
    ys = np.concatenate(ys)
    labels = np.concatenate(labels).astype(int)
    ideal = rng.integers(0, 7, n_clusters).astype(float)

    h_slope, h_int = regress_clusters(xs, ys, labels=labels,
                                      num_clusters=n_clusters,
                                      ideal_num_points=ideal)
    xbuf, _ = _pad(xs)
    ybuf, _ = _pad(ys)
    lbuf = -np.ones(128, np.int32)
    lbuf[: len(labels)] = labels
    d_slope, d_int, d_n = gridfit.regress_clusters_dev(
        xbuf, ybuf, jnp.asarray(lbuf), num_clusters=n_clusters,
        ideal_num_points=jnp.asarray(ideal, jnp.float32),
    )
    counts = np.bincount(labels, minlength=n_clusters)
    assert (np.asarray(d_n) == counts).all()
    if np.isnan(h_slope):
        assert np.isnan(float(d_slope))
    else:
        assert abs(float(d_slope) - h_slope) < 1e-4
    h_int = np.asarray(h_int, float)
    d_int = np.asarray(d_int, float)
    nan_mask = np.isnan(h_int)
    assert (nan_mask == np.isnan(d_int)).all()
    assert np.allclose(h_int[~nan_mask], d_int[~nan_mask], atol=1e-2)


def test_regress_single_cluster_single_point():
    xbuf, _ = _pad(np.array([5.0]))
    ybuf, _ = _pad(np.array([42.0]))
    lbuf = -np.ones(128, np.int32)
    lbuf[0] = 0
    slope, intercepts, n = gridfit.regress_clusters_dev(
        xbuf, ybuf, jnp.asarray(lbuf), num_clusters=1,
        ideal_num_points=jnp.asarray([1.0]),
    )
    assert float(slope) == 0.0
    assert float(intercepts[0]) == 42.0

    h_slope, h_int = regress_clusters(np.array([5.0]), np.array([42.0]),
                                      labels=np.array([0]), num_clusters=1,
                                      ideal_num_points=np.array([1.0]))
    assert h_slope == 0 and float(np.asarray(h_int)[0]) == 42.0


def test_fused_chip_timestep_matches_two_dispatch_dense(monkeypatch):
    """The one-dispatch fused timestep reproduces the two-dispatch dense
    path (find_centers + find_rois) on the same inputs."""
    monkeypatch.setenv("MAGNIFY_TPU_DETECTOR", "dense")
    import magnify_tpu as mg
    from magnify_tpu.core import DataArray
    from magnify_tpu.utils import filled_circle_points
    from magnify_tpu.components import find as F

    grid = (3, 3)
    img = np.zeros((400, 400), np.uint16)
    pts = filled_circle_points(10)
    for i in range(grid[0]):
        for j in range(grid[1]):
            img[pts[:, 0] + (i + 1) * 100, pts[:, 1] + (j + 1) * 100] = 1000
    data = DataArray(img, dims=("y", "x"))
    kw = dict(shape=grid, min_button_diameter=16, max_button_diameter=32,
              overlap=0, row_dist=100, col_dist=100, num_iter=2000)

    xp_fused = mg.microfluidic_chip(data=data, **kw)

    # Disable the fused branch: the loop falls back to the two-dispatch
    # dense path (find_centers + find_rois).
    orig = F.ops_detect.resolve_detector
    calls = {"n": 0}

    def flip_first(detector="auto"):
        # ButtonFinder.__call__ resolves once to pick the fused branch;
        # report "ransac" there, then "dense" for the inner stages.
        calls["n"] += 1
        if calls["n"] == 1:
            return "ransac"
        return orig(detector)

    monkeypatch.setattr(F.ops_detect, "resolve_detector", flip_first)
    xp_two = mg.microfluidic_chip(data=data, **kw)

    np.testing.assert_allclose(xp_fused.x.values, xp_two.x.values, atol=0.51)
    np.testing.assert_allclose(xp_fused.y.values, xp_two.y.values, atol=0.51)
    assert xp_fused.roi.shape == xp_two.roi.shape
    same_fg = (xp_fused.fg.values == xp_two.fg.values).mean()
    assert same_fg > 0.99
