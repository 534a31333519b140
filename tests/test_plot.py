"""Plot layer smoke tests (Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import magnify_tpu as mg
from magnify_tpu import plot as mp
from tests.synth import bead_image


@pytest.fixture(scope="module")
def bead_result():
    data = bead_image((512, 512), [[150, 150], [350, 300]])
    return mg.beads(data=data, min_bead_diameter=16, max_bead_diameter=24,
                    overlap=0, num_iter=5000, drop_tiles=True)


def test_imshow_renders(bead_result):
    fig = mp.imshow(bead_result, show=False)
    assert fig is not None
    assert len(fig.axes) >= 1


def test_roishow_renders(bead_result):
    fig = mp.roishow(bead_result, show=False)
    assert fig is not None


def test_mrbles_clusters_renders():
    from magnify_tpu.core import Dataset

    rng = np.random.default_rng(0)
    n = 60
    ratios = np.column_stack([
        np.ones(n),
        np.repeat([0.1, 1.0, 2.0], n // 3) + rng.normal(0, 0.02, n),
        np.repeat([0.5, 1.5, 0.5], n // 3) + rng.normal(0, 0.02, n),
    ])
    tags = np.repeat(["a", "b", "c"], n // 3)
    ds = Dataset({"ln_ratio": (("mark", "ln"), ratios)},
                 coords={"tag": (("mark",), tags)})
    fig = mp.mrbles_clusters(ds, show=False)
    assert fig is not None


def test_roi_to_image_labels():
    from magnify_tpu.plot.image import roi_to_image_labels

    masks = np.zeros((2, 1, 4, 4), bool)
    masks[0, 0, 1:3, 1:3] = True
    masks[1, 0, 0:2, 0:2] = True
    bboxes = np.array([[[0, 4, 0, 4]], [[4, 8, 4, 8]]])
    labels = roi_to_image_labels(masks, bboxes, (8, 8))
    assert labels.shape == (1, 8, 8)
    assert labels[0, 1, 1] == 1
    assert labels[0, 4, 4] == 2
    assert labels[0, 7, 7] == 0


def test_interactive_ui_headless():
    from magnify_tpu.plot.vis import InteractiveUI

    ui = InteractiveUI()
    out = ui.run_widget(lambda: [(np.zeros((4, 4)), {"name": "x"})])
    assert out[0][1]["name"] == "x"


def test_interactive_find_circles_headless():
    from magnify_tpu.ops.detect import find_circles
    from magnify_tpu.plot.vis import InteractiveUI
    from tests.synth import draw_beads

    img = draw_beads((256, 256), [[128, 128]], diameters=20)
    c, s = find_circles(img, 0.1, 0.9, 20, 2000, 8, 12, 0.3, 8,
                        gui=InteractiveUI())
    assert len(c) == 1


def test_tuning_session_reruns_on_param_change():
    """Parameter changes re-run detection through the tuning session (the
    headless-drivable core of the interactive widget loop)."""
    from magnify_tpu.ops.detect import find_circles
    from magnify_tpu.plot.vis import InteractiveUI
    from tests.synth import draw_beads

    img = draw_beads((256, 256), [[80, 80], [180, 180]], diameters=20)
    ui = InteractiveUI()
    find_circles(img, 0.1, 0.9, 20, 2000, 8, 12, 0.3, 8, gui=ui)

    # Stage 2 is the circle-filter widget: auto_call re-runs on set_param.
    session = ui.sessions[-1]
    assert session.auto_call
    base_calls = session.calls
    layers = session.set_param("min_roundness", 0.99)
    assert session.calls == base_calls + 1
    # An impossible roundness filters both beads out of the points layer.
    assert len(layers[1][0]) == 0

    layers = session.set_param("min_roundness", 0.3)
    assert session.calls == base_calls + 2
    assert len(layers[1][0]) == 2

    with pytest.raises(KeyError):
        session.set_param("not_a_param", 1)


def test_tuning_session_manual_run():
    from magnify_tpu.plot.vis import TuningSession

    seen = []

    def stage(alpha: float = 0.5):
        seen.append(alpha)
        return [(np.zeros((2, 2)), {})]

    s = TuningSession(stage, auto_call=False)
    s.run()
    s.set_param("alpha", 0.9)  # no auto_call: does not re-run
    assert seen == [0.5]
    s.run()
    assert seen == [0.5, 0.9]


def test_interactive_gui_loop_builds_widgets(monkeypatch):
    """The matplotlib widget loop constructs sliders/buttons and exits when
    the window closes (simulated by monkeypatching plt.pause)."""
    import matplotlib.pyplot as plt

    from magnify_tpu.plot.vis import InteractiveUI

    ui = InteractiveUI()
    ui.interactive = True  # force the GUI path on the Agg backend

    monkeypatch.setattr(plt, "pause", lambda _dt: plt.close("all"))

    from typing import Literal

    def stage(threshold: float = 0.4, radius: int = 8, flag: bool = False,
              mode: Literal["dense", "ransac"] = "dense",
              label: str = "beads"):
        return [(np.full((8, 8), threshold), {"name": "img"}),
                (np.array([[4.0, 4.0]]), {"size": 2 * radius}, "points")]

    out = ui.run_widget(stage, auto_call=True, last=True)
    assert out[0][1]["name"] == "img"
    assert ui.sessions[-1].params == {"threshold": 0.4, "radius": 8,
                                      "flag": False, "mode": "dense",
                                      "label": "beads"}
    assert not plt.get_fignums()  # last=True closed the figure


def test_widget_spec_dispatch():
    """magicgui-parity widget inference: bools -> checkbox, Literal/Enum ->
    radio choices, strings -> text, numbers -> sliders (reference
    plot/vis.py:18-24 gets this from magicgui's type-driven widgets)."""
    import enum
    from typing import Literal

    from magnify_tpu.plot.vis import _widget_spec

    class Mode(enum.Enum):
        fast = 1
        exact = 2

    def stage(flag: bool = True, det: Literal["a", "b"] = "b",
              mode: Mode = Mode.fast, name: str = "x",
              opts=("one", "two"), q: float = 0.5, n: int = 4):
        pass

    assert _widget_spec(stage, "flag", True) == ("checkbox", None)
    # Choice specs carry (display labels, TYPED values): the radio callback
    # hands the typed value back to the stage, like magicgui's combo boxes.
    assert _widget_spec(stage, "det", "b") == (
        "choice", (["a", "b"], ["a", "b"]))
    assert _widget_spec(stage, "mode", Mode.fast) == (
        "choice", (["fast", "exact"], [Mode.fast, Mode.exact]))
    assert _widget_spec(stage, "name", "x") == ("text", None)
    assert _widget_spec(stage, "opts", ("one", "two")) == (
        "choice", (["one", "two"], ["one", "two"]))

    def int_stage(k: Literal[1, 2] = 1):
        pass

    assert _widget_spec(int_stage, "k", 1) == ("choice", (["1", "2"], [1, 2]))
    kind, (lo, hi, step) = _widget_spec(stage, "q", 0.5)
    assert kind == "slider" and (lo, hi, step) == (0.0, 1.0, None)
    kind, (lo, hi, step) = _widget_spec(stage, "n", 4)
    assert kind == "slider" and step == 1


def test_categorical_colors_distinct():
    """The generated categorical palette covers the reference colormap's
    274 entries (reference plot/mrbles.py:5-275) with pairwise-distinct
    colors and is deterministic."""
    from magnify_tpu.plot.mrbles import _srgb_to_lab, categorical_colors

    pal = categorical_colors(274)
    assert pal.shape == (274, 3)
    assert len(np.unique((pal * 255).astype(int), axis=0)) == 274
    lab = _srgb_to_lab(pal)
    d = np.linalg.norm(lab[:, None] - lab[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    # Every pair stays perceptually separated (ΔE*ab well above JND ~2.3).
    assert d.min() > 5.0
    np.testing.assert_array_equal(pal, categorical_colors(274))


def test_mrbles_clusters_many_codes_unique_colors():
    """48-code panels get 48 distinct scatter colors (the tab20 cycle
    collided beyond 20)."""
    from magnify_tpu.core import Dataset

    rng = np.random.default_rng(3)
    n_codes = 48
    ratios = np.column_stack([
        np.ones(n_codes * 3),
        np.repeat(rng.uniform(0, 3, n_codes), 3),
        np.repeat(rng.uniform(0, 3, n_codes), 3),
    ])
    tags = np.repeat([f"code{i:02d}" for i in range(n_codes)], 3)
    ds = Dataset({"ln_ratio": (("mark", "ln"), ratios)},
                 coords={"tag": (("mark",), tags)})
    fig = mp.mrbles_clusters(ds, show=False)
    colors = [tuple(np.ravel(c.get_facecolor())[:3])
              for c in fig.axes[0].collections[:n_codes]]
    assert len(set(colors)) == n_codes


def test_resolve_ln_unknown_raises():
    """An unknown lanthanide name must raise a clear error instead of
    falling through to a positional default (advisor finding r2)."""
    from magnify_tpu.core import Dataset

    ratios = np.ones((6, 3))
    ds = Dataset({"ln_ratio": (("mark", "ln"), ratios)},
                 coords={"tag": (("mark",), np.array(["a"] * 6)),
                         "ln": (("ln",), np.array(["eu", "dy", "sm"]))})
    with pytest.raises(ValueError, match="unknown lanthanide"):
        mp.mrbles_clusters(ds, z="tm", show=False)


def test_resolve_ln_unknown_raises_even_when_default_in_range():
    """On a labeled panel an unknown NAME must raise even when the
    positional default index would be in range — otherwise another
    lanthanide's ratios get plotted under the requested label (code
    review r3)."""
    from magnify_tpu.core import Dataset

    ratios = np.ones((6, 4))
    ds = Dataset({"ln_ratio": (("mark", "ln"), ratios)},
                 coords={"tag": (("mark",), np.array(["a"] * 6)),
                         "ln": (("ln",),
                                np.array(["eu", "dy", "sm", "tm"]))})
    with pytest.raises(ValueError, match="unknown lanthanide"):
        mp.mrbles_clusters(ds, x="pm", show=False)


def test_interactive_edge_stage_live_edges():
    """The edge-tuning stage renders the live Canny edge map (reference
    utils.py:132-140) and re-thresholding changes it."""
    from magnify_tpu.ops.detect import find_circles
    from magnify_tpu.plot.vis import InteractiveUI
    from tests.synth import draw_beads

    rng = np.random.default_rng(5)
    img = draw_beads((256, 256), [[80, 80], [180, 180]], diameters=20)
    img = (img + rng.normal(0, 4, img.shape)).astype(np.float32)
    ui = InteractiveUI()
    find_circles(img, 0.1, 0.9, 20, 2000, 8, 12, 0.3, 8, gui=ui)

    edge_stage = ui.sessions[0]
    layers = edge_stage.result
    assert layers[1][1]["name"] == "Edges"
    edges_before = np.asarray(layers[1][0])
    assert edges_before.shape == img.shape
    assert edges_before.any()

    # Raising the high quantile prunes weak edges: the live map changes.
    layers = edge_stage.set_param("high_edge_quantile", 0.999)
    edges_after = np.asarray(layers[1][0])
    assert edges_after.sum() < edges_before.sum()


def test_imshow_multidim_browsing():
    """(channel, time) planes are browsable: the viewer exposes set_plane
    (the headless twin of the reference's napari dim sliders,
    plot/image.py:64-154) and re-renders the selected plane."""
    from tests.synth import draw_beads

    from magnify_tpu.core import DataArray

    planes = np.stack([
        np.stack([draw_beads((256, 256), [[80, 80]], values=v + t)
                  for t in range(3)])
        for v in (1000, 2000)
    ])
    data = DataArray(planes, dims=("channel", "time", "y", "x"),
                     coords={"channel": ["a", "b"]})
    xp = mg.beads(data=data, min_bead_diameter=16, max_bead_diameter=24,
                  overlap=0, num_iter=5000, search_channel="a",
                  drop_tiles=True)
    fig = mp.imshow(xp, show=False)
    viewer = fig.magnify_viewer
    assert viewer.n_channel == 2 and viewer.n_time == 3
    assert viewer.channel == 0 and viewer.time == 0
    viewer.set_plane(channel=1, time=2)
    assert (viewer.channel, viewer.time) == (1, 2)
    assert "channel 1" in viewer.ax.get_title()
    assert "time 2" in viewer.ax.get_title()
    with pytest.raises(IndexError):
        viewer.set_plane(channel=5)
    # Interactive path builds one slider per browsable dim.
    assert len(fig._magnify_sliders) == 2


def test_imshow_overlays_fg_bg(bead_result):
    """imshow paints fg AND bg label overlays (the reference's two label
    layers) plus the base plane."""
    fig = mp.imshow(bead_result, show=False)
    ax = fig.magnify_viewer.ax
    assert len(ax.images) >= 3  # base + bg overlay + fg overlay


def test_roishow_bg_contours(bead_result):
    """roishow draws fg and bg outlines per ROI (reference
    plot/image.py:28-41 shows both label layers)."""
    fig = mp.roishow(bead_result, show=False)
    filled = [ax for ax in fig.axes if ax.images]
    assert filled
    # Each ROI panel renders >= 2 contour sets (fg + bg).
    assert all(len(ax.collections) >= 2 for ax in filled)


def test_mrbles_clusters_reference_surface():
    """Reference parameter surface (plot/mrbles.py:277): lanthanide
    selection by name, z for 3-D, explicit means/covars, and
    exclude_outliers=False drawing outliers red."""
    from magnify_tpu.core import Dataset

    rng = np.random.default_rng(0)
    n = 60
    ratios = np.column_stack([
        np.ones(n),
        np.repeat([0.1, 1.0, 2.0], 20) + rng.normal(0, 0.02, n),
        np.repeat([0.5, 1.5, 0.5], 20) + rng.normal(0, 0.02, n),
        np.repeat([0.2, 0.2, 0.9], 20) + rng.normal(0, 0.02, n),
    ])
    tags = np.array(["a"] * 20 + ["b"] * 20 + ["outlier"] * 20)
    ds = Dataset({"ln_ratio": (("mark", "ln"), ratios)},
                 coords={"tag": (("mark",), tags),
                         "ln": (("ln",), np.array(["eu", "dy", "sm",
                                                   "tm"]))})
    assert mp.mrbles_clusters(ds, show=False) is not None
    assert mp.mrbles_clusters(ds, x="dy", y="tm", show=False) is not None
    fig = mp.mrbles_clusters(ds, exclude_outliers=False, show=False)
    labels = [t.get_text() for t in fig.axes[0].get_legend().get_texts()]
    assert "outlier" in labels
    assert mp.mrbles_clusters(ds, z="tm", show=False) is not None
    means = np.array([[0.1, 0.5], [1.0, 1.5]])
    covs = np.tile(np.eye(2) * 0.01, (2, 1, 1))
    assert mp.mrbles_clusters(ds, means=means, covars=covs,
                              show=False) is not None


def test_imshow_arbitrary_extra_dims_and_plane_cache(monkeypatch):
    """Every non-spatial dim is browsable (the reference napari viewer
    exposes each extra dim as a slider, plot/image.py:60-71), and rendered
    pyramid levels are cached per plane: browsing back to a visited plane
    never re-reads or re-decimates the full-resolution plane."""
    from magnify_tpu.core import DataArray, Dataset
    from magnify_tpu.plot import image as image_mod

    data = np.zeros((2, 3, 4, 600, 600), np.uint16)
    for z in range(4):
        data[..., 100 + 50 * z, 200] = 1000
    ds = Dataset({"image": (("channel", "time", "z", "im_y", "im_x"), data)})

    reads = []
    real = image_mod._multiscale

    def spy(img, limit=512):
        reads.append(img.shape)
        return real(img, limit)

    monkeypatch.setattr(image_mod, "_multiscale", spy)
    fig = mp.imshow(ds, show=False)
    viewer = fig.magnify_viewer
    assert viewer.extra_dims == ("channel", "time", "z")
    assert len(fig._magnify_sliders) == 3  # one slider per extra dim
    assert len(reads) == 1

    viewer.set_plane(z=3, time=1)
    assert viewer.index == {"channel": 0, "time": 1, "z": 3}
    assert "z 3" in viewer.ax.get_title()
    assert len(reads) == 2
    # The decimated plane shown is the pyramid level <= 512^2.
    plane, scale, full_shape = viewer._plane()
    assert plane.shape[-1] * plane.shape[-2] <= 512**2
    assert full_shape[-2:] == (600, 600)
    assert len(reads) == 2  # _plane() itself hit the cache

    # Browsing BACK re-renders from the cache: no new full-plane read.
    viewer.set_plane(z=0, time=0)
    viewer.set_plane(z=3, time=1)
    assert len(reads) == 2

    with pytest.raises(KeyError, match="browsable"):
        viewer.set_plane(q=1)
    with pytest.raises(IndexError):
        viewer.set_plane(z=9)


def test_set_plane_backward_compatible(bead_result):
    """The pre-extra-dims set_plane contract still holds: channel/time are
    positional, and a dim the image doesn't carry accepts index 0 (its
    implicit size-1 axis) — only a nonzero index is an error."""
    fig = mp.imshow(bead_result, show=False)
    viewer = fig.magnify_viewer
    viewer.set_plane(0, 0)  # positional (channel, time)
    assert (viewer.channel, viewer.time) == (0, 0)
    # bead_result's image is (channel, time, y, x) with singleton dims; a
    # truly absent dim must also tolerate index 0.
    from magnify_tpu.plot.image import ImageViewer

    img2d = viewer.xp.image.isel(channel=0, time=0)
    from magnify_tpu.core import Dataset

    ds = Dataset({"image": (img2d.dims, img2d.values)})
    v2 = ImageViewer(ds, viewer.ax)
    v2.set_plane(time=0)  # no-op, documented API on single-plane assays
    with pytest.raises(KeyError, match="browsable"):
        v2.set_plane(time=1)


def test_widget_layout_no_overlap():
    """A multi-choice radio group is taller than one slider strip; the
    stacked control axes must never overlap (each box starts above the
    previous box's top)."""
    from magnify_tpu.plot.vis import _widget_layout

    specs = [
        ("mode", "dense", "choice", (["dense", "ransac", "auto"],
                                     ["dense", "ransac", "auto"])),
        ("min_roundness", 0.3, "slider", (0.0, 1.0, 0.01)),
        ("invert", False, "checkbox", None),
    ]
    boxes, stack_h = _widget_layout(specs)
    assert boxes[0][1] == pytest.approx(0.09)  # 3 choices x 0.03
    for (y0, h0), (y1, _h1) in zip(boxes, boxes[1:]):
        assert y1 > y0 + h0  # strictly above the previous control
    assert stack_h == pytest.approx(sum(h for _y, h in boxes) + 0.02 * 3)
