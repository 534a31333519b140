"""Marker QC filters."""
import pytest

import numpy as np

from magnify_tpu.components.filter import (
    filter_expression,
    filter_leaky_buttons,
    filter_nonround,
)
from magnify_tpu.core import Dataset
from magnify_tpu.utils import circle


def assay_with_rois(fg_values, bg_value=10.0, fg_shape="disk"):
    """Marks with given fg intensities over a flat background."""
    n = len(fg_values)
    L = 21
    roi = np.full((n, 1, 1, L, L), bg_value, np.float32)
    fg = np.zeros((n, 1, L, L), bool)
    bg = np.zeros((n, 1, L, L), bool)
    for i, v in enumerate(fg_values):
        if fg_shape == "disk":
            mask = circle((L, L), (10, 10), 6).astype(bool)
        elif fg_shape == "line":
            mask = np.zeros((L, L), bool)
            mask[10, 2:19] = True
        fg[i, 0] = mask
        bg[i, 0] = ~mask
        roi[i, 0, 0][mask] = v
    return Dataset(
        {"roi": (("mark", "channel", "time", "roi_y", "roi_x"), roi)},
        coords={
            "channel": ["bf"],
            "fg": (("mark", "time", "roi_y", "roi_x"), fg),
            "bg": (("mark", "time", "roi_y", "roi_x"), bg),
            "valid": (("mark", "time"), np.ones((n, 1), bool)),
            "tag": (("mark",), np.array(["m"] * n)),
            "mark_row": (("mark",), np.arange(n)),
        },
    )


def test_filter_expression_explicit_contrast():
    ds = assay_with_rois([10.0, 50.0, 200.0])
    out = filter_expression(ds, min_contrast=100)
    np.testing.assert_array_equal(out.valid.values[:, 0],
                                  [False, False, True])


def test_filter_expression_auto_threshold():
    # Backgrounds are identical -> sigma 0 -> any expressed mark passes.
    ds = assay_with_rois([10.0, 55.0])
    out = filter_expression(ds)
    np.testing.assert_array_equal(out.valid.values[:, 0], [False, True])


def test_filter_nonround_rejects_lines_keeps_disks():
    ds_disk = assay_with_rois([100.0], fg_shape="disk")
    out = filter_nonround(ds_disk, min_roundness=0.75)
    assert out.valid.values.all()

    ds_line = assay_with_rois([100.0], fg_shape="line")
    out = filter_nonround(ds_line, min_roundness=0.75)
    assert not out.valid.values.any()


def _with_noisy_bg(ds, seed=0):
    # Perturb backgrounds so the pairwise-difference sigma is nonzero
    # (with identical backgrounds the 5-sigma bound degenerates to 0 and
    # every blank counts as expressing — reference behavior too).
    rng = np.random.default_rng(seed)
    roi = ds["roi"].to_numpy()
    bg = ds["bg"].to_numpy()
    for i in range(roi.shape[0]):
        roi[i, 0, 0][bg[i, 0]] += rng.normal(0, 1.0, bg[i, 0].sum())
    ds["roi"] = (("mark", "channel", "time", "roi_y", "roi_x"), roi)
    return ds


def test_filter_leaky_invalidates_neighbors_of_bright_blanks():
    # Three marks in one column: tagged, blank (leaky!), tagged.
    tags = np.array(["a", "", "b"])
    ds = _with_noisy_bg(assay_with_rois([200.0, 200.0, 200.0]))
    ds = ds.assign_coords(tag=(("mark",), tags))
    out = filter_leaky_buttons(ds)
    # The blank neighbor expresses, so both tagged marks are invalidated.
    assert not out.valid.values[0, 0]
    assert not out.valid.values[2, 0]

    ds2 = _with_noisy_bg(assay_with_rois([200.0, 10.0, 200.0]))
    ds2 = ds2.assign_coords(tag=(("mark",), tags))
    out2 = filter_leaky_buttons(ds2)
    assert out2.valid.values[0, 0]
    assert out2.valid.values[2, 0]


def test_quantify_component():
    from magnify_tpu.components.quantify import quantify

    ds = assay_with_rois([50.0, 150.0])
    out = quantify(ds)
    assert out.intensity.dims == ("mark", "channel", "time")
    vals = out.intensity.values[:, 0, 0]
    assert vals[0] == pytest.approx(40.0, abs=1.0)
    assert vals[1] == pytest.approx(140.0, abs=1.0)
