"""Visualization layer (matplotlib/ipywidgets based, GUI-optional).

Counterpart of the reference's napari/plotly plot package
(/root/reference/src/magnify/plot): ``imshow``/``roishow`` marker overlays,
``mrbles_clusters`` ratio scatter, and an interactive step-tuning UI with a
non-GUI fallback for headless environments.
"""

__all__ = ["imshow", "roishow", "mrbles_clusters", "set_style"]

from magnify_tpu.plot.image import imshow, roishow
from magnify_tpu.plot.mrbles import mrbles_clusters
from magnify_tpu.plot.style import set_style

set_style()
