"""Device (JAX/TPU) compute kernels: the framework's ops layer (L3).

Submodules:

- :mod:`~magnify_tpu.ops.edge` — normalize/blur/Scharr/Canny stack, exact
  histogram quantiles
- :mod:`~magnify_tpu.ops.ransac` — fixed-shape RANSAC circle proposals
- :mod:`~magnify_tpu.ops.score` — unique-triple dedupe, perimeter-gather and
  MXU ring-correlation scoring
- :mod:`~magnify_tpu.ops.nms` — greedy neighbor suppression (sequential scan
  and exact parallel-rounds forms)
- :mod:`~magnify_tpu.ops.detect` — fused detectors (single image, ROI batch,
  plane stack)
- :mod:`~magnify_tpu.ops.geom` — extent-LUT disks/annuli, ROI gather,
  rotation
- :mod:`~magnify_tpu.ops.reduce` — masked per-marker statistics
- :mod:`~magnify_tpu.ops.pallas_kernels` — hand-written Pallas TPU kernels
"""

from magnify_tpu.ops.detect import (  # noqa: F401
    detect_best_in_rois,
    find_circles,
    find_circles_stack,
    resolve_detector,
)
from magnify_tpu.ops.edge import edge_pipeline, histogram_quantile  # noqa: F401
from magnify_tpu.ops.reduce import (  # noqa: F401
    fg_mean_bg_median,
    masked_mean,
    masked_median,
    prefer_host_reduction,
)

__all__ = [
    "detect_best_in_rois",
    "edge_pipeline",
    "fg_mean_bg_median",
    "find_circles",
    "find_circles_stack",
    "histogram_quantile",
    "masked_mean",
    "masked_median",
    "prefer_host_reduction",
    "resolve_detector",
]
