"""magnify-tpu: a TPU-native microscopy image-processing framework.

A registry-driven component-pipeline library with the capabilities of
FordyceLab/magnify — file-pattern ingestion, tile stitching, flat-field
correction, circle/button segmentation, spectral tag identification, and
marker QC filtering — returning labeled datasets with ``image``/``roi``
variables and ``fg``/``bg``/``x``/``y``/``tag``/``valid`` coordinates. The
hot transforms (edge detection, RANSAC circle proposal, roundness scoring,
NMS, ROI gather, masked fg/bg reductions, GMM decoding) run as fused
JAX/XLA programs on TPU.

Public API parity with the reference (/root/reference/src/magnify/__init__.py):
``beads``, ``mrbles``, ``microfluidic_chip``, ``image`` and their ``*_pipe``
factories, ``save``/``load``, the ``component`` decorator, and the plot
sublibrary ``magnify_tpu.plot``.
"""

__version__ = "0.6.0"

__all__ = [
    "parallel",
    "DataArray",
    "Dataset",
    "Pipeline",
    "beads",
    "beads_pipe",
    "beads_stream",
    "component",
    "components",
    "filter",
    "find",
    "identify",
    "image",
    "image_pipe",
    "io",
    "load",
    "microfluidic_chip",
    "microfluidic_chip_pipe",
    "mrbles",
    "mrbles_pipe",
    "mrbles_stream",
    "ops",
    "postprocess",
    "preprocess",
    "quantify",
    "readers",
    "save",
    "stitch",
    "utils",
]

import magnify_tpu.core.jaxcache  # noqa: F401  (persistent XLA cache)
from magnify_tpu import accessor, io, ops, parallel, utils  # noqa: F401
from magnify_tpu.components import (  # noqa: F401
    filter,
    find,
    identify,
    postprocess,
    preprocess,
    stitch,
)
from magnify_tpu.components.quantify import quantify  # noqa: F401
from magnify_tpu.core import DataArray, Dataset
from magnify_tpu.core.pipeline import Pipeline
from magnify_tpu.io import reader  # noqa: F401  (registers the "read" reader)
from magnify_tpu.io.file import load, save
from magnify_tpu.registry import (
    beads,
    beads_pipe,
    beads_stream,
    component,
    components,
    image,
    image_pipe,
    microfluidic_chip,
    microfluidic_chip_pipe,
    mrbles,
    mrbles_pipe,
    mrbles_stream,
    readers,
)
