"""MRBLEs cluster visualization (counterpart of reference plot/mrbles.py).

Scatter of per-bead lanthanide ratios colored by decoded tag, with 1/2/3
sigma Gaussian ellipses per cluster, rendered with matplotlib.
"""

from __future__ import annotations

import numpy as np

__all__ = ["mrbles_clusters"]


def _ellipse_path(mean, cov, n_sigma):
    vals, vecs = np.linalg.eigh(cov)
    vals = np.maximum(vals, 0)
    theta = np.linspace(0, 2 * np.pi, 100)
    circle = np.stack([np.cos(theta), np.sin(theta)])
    pts = vecs @ (np.sqrt(vals)[:, None] * circle) * n_sigma
    return mean[0] + pts[0], mean[1] + pts[1]


def mrbles_clusters(xp, dims=(1, 2), show: bool = True):
    """Scatter ``ln_ratio`` pairs colored by tag with sigma contours.

    ``dims`` picks the two lanthanide-ratio columns to plot (the reference
    plots all pairs; column 0 is the reference lanthanide and always 1).
    """
    import matplotlib.pyplot as plt

    ratios = xp.ln_ratio.to_numpy()
    tags = xp.tag.values
    i, j = dims
    fig, ax = plt.subplots()
    cmap = plt.get_cmap("tab20")
    for k, tag in enumerate(np.unique(tags)):
        members = ratios[tags == tag]
        color = cmap(k % 20)
        ax.scatter(members[:, i], members[:, j], s=4, color=color,
                   label=str(tag))
        if len(members) > 2 and tag != "outlier":
            mean = members[:, [i, j]].mean(axis=0)
            cov = np.cov(members[:, [i, j]], rowvar=False)
            for s in (1, 2, 3):
                ex, ey = _ellipse_path(mean, cov, s)
                ax.plot(ex, ey, color=color, alpha=0.4, linewidth=0.7)
    ax.set_xlabel(f"ln_ratio[{i}]")
    ax.set_ylabel(f"ln_ratio[{j}]")
    ax.legend(fontsize=6, markerscale=2)
    if show:
        import matplotlib

        if matplotlib.get_backend().lower() != "agg":
            plt.show(block=False)
    return fig
