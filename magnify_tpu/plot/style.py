"""Plot styling defaults (counterpart of reference plot/style.py)."""

from __future__ import annotations


def set_style(name: str = "whitegrid") -> None:
    """Apply the framework's default matplotlib style. Safe headless."""
    try:
        import matplotlib as mpl

        mpl.rcParams.setdefault("figure.figsize", (8, 8))
        mpl.rcParams["axes.grid"] = name == "whitegrid"
        mpl.rcParams["image.cmap"] = "gray"
    except Exception:
        pass
