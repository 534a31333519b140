"""User-facing pipeline factories: beads, mrbles, microfluidic_chip, image.

The public parameter surface mirrors /root/reference/src/magnify/registry.py
(including chip-type presets and defaults) so reference users can switch
without code changes; execution is the TPU-native component set.
"""

from __future__ import annotations

from magnify_tpu.core.pipeline import Pipeline
from magnify_tpu.core.registry import component, components, readers  # noqa: F401

__all__ = [
    "beads", "beads_pipe", "image", "image_pipe", "microfluidic_chip",
    "microfluidic_chip_pipe", "mrbles", "mrbles_pipe",
]

# Chip-type presets: row/col pitch in pixels (reference registry.py:231-241).
CHIP_PRESETS = {
    "minichip": (375 / 1.61, 400 / 1.61),
    "pc": (406 / 3.22, 750 / 3.22),
    "ps": (375 / 3.22, 655 / 3.22),
}


def microfluidic_chip_pipe(
    shape=(8, 8),
    pinlist=None,
    blank=None,
    overlap: int = 102,
    rotation: int = 0,
    row_dist: float = 375 / 1.61,
    col_dist: float = 400 / 1.61,
    chip_type=None,
    min_button_diameter: int = 8,
    max_button_diameter: int = 30,
    chamber_diameter: int = 60,
    top_chamber=None,
    left_chamber=None,
    low_edge_quantile: float = 0.1,
    high_edge_quantile: float = 0.9,
    num_iter: int = 5000000,
    min_roundness: float = 0.2,
    cluster_penalty: float = 50,
    roi_length=None,
    progress_bar: bool = False,
    search_timestep=0,
    search_channel=None,
    roi_only: bool = False,
    drop_tiles: bool = True,
    interactive: bool = False,
    detector: str = "auto",
) -> Pipeline:
    """Build the button-finding pipeline for microfluidic chip images.

    Pipeline stages (matching reference registry.py:243-271):
    read -> standardize_format -> identify_buttons -> stitch -> rotate ->
    find_buttons -> drop -> restore_format.
    """
    if chip_type is not None:
        if chip_type not in CHIP_PRESETS:
            raise ValueError(
                f"Invalid chip type: {chip_type}. Must be one of "
                f"['pc', 'ps', 'minichip']"
            )
        row_dist, col_dist = CHIP_PRESETS[chip_type]

    pipe = Pipeline("read")
    pipe.add_pipe("standardize_format")
    pipe.add_pipe("identify_buttons", shape=shape, pinlist=pinlist, blank=blank)
    pipe.add_pipe("stitch", overlap=overlap)
    pipe.add_pipe("rotate", rotation=rotation)
    pipe.add_pipe(
        "find_buttons",
        row_dist=row_dist,
        col_dist=col_dist,
        min_button_diameter=min_button_diameter,
        max_button_diameter=max_button_diameter,
        chamber_diameter=chamber_diameter,
        top_chamber=top_chamber,
        left_chamber=left_chamber,
        low_edge_quantile=low_edge_quantile,
        high_edge_quantile=high_edge_quantile,
        num_iter=num_iter,
        min_roundness=min_roundness,
        cluster_penalty=cluster_penalty,
        roi_length=roi_length,
        progress_bar=progress_bar,
        search_timestep=search_timestep,
        search_channel=search_channel,
        interactive=interactive,
        detector=detector,
    )
    pipe.add_pipe("drop", roi_only=roi_only, drop_tiles=drop_tiles)
    pipe.add_pipe("restore_format")
    return pipe


def microfluidic_chip(data, **kwargs):
    """Find buttons in microfluidic-chip images and return the standardized
    dataset.

    Parameters mirror the reference ``microfluidic_chip``
    (/root/reference/src/magnify/registry.py:32-193): ``data`` may be a
    path/glob with ``(assay)/(channel)/(time)/(row)/(col)`` specifiers, a
    DataArray/Dataset, or a sequence of them. ``shape`` or ``pinlist``
    defines the button grid and tags; ``chip_type`` presets override
    ``row_dist``/``col_dist``; detection is tuned by
    ``min/max_button_diameter``, ``chamber_diameter``,
    ``low/high_edge_quantile``, ``num_iter``, ``min_roundness``,
    ``cluster_penalty``; ``search_timestep``/``search_channel`` control where
    detection runs (other timesteps copy positions); ``roi_only``/
    ``drop_tiles`` shape the output.

    Returns the processed dataset (or a list, one per assay) with ``roi``
    plus ``fg``/``bg``/``x``/``y``/``tag``/``valid`` coordinates.
    """
    return microfluidic_chip_pipe(**kwargs)(data=data)


def mrbles_pipe(
    spectra,
    codes,
    flatfield=1.0,
    darkfield=0.0,
    overlap: int = 102,
    min_bead_diameter: int = 10,
    max_bead_diameter: int = 50,
    low_edge_quantile: float = 0.1,
    high_edge_quantile: float = 0.9,
    num_iter: int = 5000000,
    min_roundness: float = 0.3,
    roi_length=None,
    search_channel=None,
    reference: str = "eu",
    roi_only: bool = False,
    drop_tiles: bool = True,
    interactive: bool = False,
    detector: str = "auto",
) -> Pipeline:
    """Build the MRBLEs pipeline: bead detection + spectral decoding
    (reference registry.py:402-451)."""
    pipe = Pipeline("read")
    pipe.add_pipe("standardize_format")
    pipe.add_pipe("flatfield_correct", flatfield=flatfield, darkfield=darkfield)
    pipe.add_pipe("stitch", overlap=overlap)
    pipe.add_pipe(
        "find_beads",
        min_bead_diameter=min_bead_diameter,
        max_bead_diameter=max_bead_diameter,
        low_edge_quantile=low_edge_quantile,
        high_edge_quantile=high_edge_quantile,
        num_iter=num_iter,
        min_roundness=min_roundness,
        roi_length=roi_length,
        search_channel=search_channel,
        interactive=interactive,
        detector=detector,
    )
    pipe.add_pipe("identify_mrbles", spectra=spectra, codes=codes,
                  reference=reference)
    pipe.add_pipe("drop", roi_only=roi_only, drop_tiles=drop_tiles)
    pipe.add_pipe("restore_format")
    return pipe


def mrbles(data, spectra, codes, **kwargs):
    """Find and spectrally decode MRBLEs beads.

    Parameters mirror the reference ``mrbles`` (registry.py:274-399):
    ``spectra``/``codes`` are CSVs of per-lanthanide reference spectra and
    code compositions; ``reference`` names the normalizing lanthanide;
    detection parameters are shared with :func:`beads`. Returns the dataset
    with ``ln_vol``/``ln_ratio`` variables and a per-bead ``tag`` coord.
    """
    return mrbles_pipe(spectra=spectra, codes=codes, **kwargs)(data=data)


def beads_pipe(
    flatfield=1.0,
    darkfield=0.0,
    overlap: int = 102,
    min_bead_diameter: int = 5,
    max_bead_diameter: int = 25,
    low_edge_quantile: float = 0.1,
    high_edge_quantile: float = 0.9,
    num_iter: int = 5000000,
    min_roundness: float = 0.3,
    roi_length=None,
    search_channel=None,
    roi_only: bool = False,
    drop_tiles: bool = True,
    interactive: bool = False,
    detector: str = "auto",
) -> Pipeline:
    """Build the bead-finding pipeline (reference registry.py:568-612):
    read -> standardize_format -> flatfield_correct -> stitch -> find_beads
    -> drop -> restore_format."""
    pipe = Pipeline("read")
    pipe.add_pipe("standardize_format")
    pipe.add_pipe("flatfield_correct", flatfield=flatfield, darkfield=darkfield)
    pipe.add_pipe("stitch", overlap=overlap)
    pipe.add_pipe(
        "find_beads",
        min_bead_diameter=min_bead_diameter,
        max_bead_diameter=max_bead_diameter,
        low_edge_quantile=low_edge_quantile,
        high_edge_quantile=high_edge_quantile,
        num_iter=num_iter,
        min_roundness=min_roundness,
        roi_length=roi_length,
        search_channel=search_channel,
        interactive=interactive,
        detector=detector,
    )
    pipe.add_pipe("drop", roi_only=roi_only, drop_tiles=drop_tiles)
    pipe.add_pipe("restore_format")
    return pipe


def beads(
    data,
    flatfield=1.0,
    darkfield=0.0,
    overlap: int = 102,
    min_bead_diameter: int = 10,
    max_bead_diameter: int = 50,
    low_edge_quantile: float = 0.1,
    high_edge_quantile: float = 0.9,
    num_iter: int = 5000000,
    min_roundness: float = 0.3,
    roi_length=None,
    search_channel=None,
    roi_only: bool = False,
    drop_tiles: bool = True,
    interactive: bool = False,
    detector: str = "auto",
):
    """Find beads in images and return the standardized dataset.

    Parameters mirror the reference ``beads`` (registry.py:454-565):
    ``data`` is a path/glob, DataArray/Dataset, or sequence;
    ``min/max_bead_diameter`` bound detection; ``low/high_edge_quantile``
    tune edge sensitivity; ``num_iter`` is the RANSAC proposal budget;
    ``min_roundness`` thresholds the perimeter-alignment score;
    ``roi_length`` (default ``2 * max_bead_diameter``) sizes the per-bead
    window; ``search_channel`` restricts detection channels. Returns the
    dataset with a ``roi`` variable and ``fg``/``bg``/``x``/``y``/``valid``
    coordinates over marks.
    """
    return beads_pipe(
        flatfield=flatfield,
        darkfield=darkfield,
        overlap=overlap,
        min_bead_diameter=min_bead_diameter,
        max_bead_diameter=max_bead_diameter,
        low_edge_quantile=low_edge_quantile,
        high_edge_quantile=high_edge_quantile,
        num_iter=num_iter,
        min_roundness=min_roundness,
        roi_length=roi_length,
        search_channel=search_channel,
        roi_only=roi_only,
        drop_tiles=drop_tiles,
        interactive=interactive,
        detector=detector,
    )(data=data)


def image_pipe(
    overlap: int = 102,
    rotation: float = 0,
    roi_only: bool = False,
    drop_tiles: bool = True,
) -> Pipeline:
    """Build the plain image-standardization pipeline
    (reference registry.py:672-693)."""
    pipe = Pipeline("read")
    pipe.add_pipe("standardize_format")
    pipe.add_pipe("stitch", overlap=overlap)
    pipe.add_pipe("rotate", rotation=rotation)
    pipe.add_pipe("drop", roi_only=roi_only, drop_tiles=drop_tiles)
    pipe.add_pipe("restore_format")
    return pipe


def image(data, overlap: int = 102, rotation: float = 0,
          roi_only: bool = False, drop_tiles: bool = True):
    """Read and standardize images (stitching included); reference
    registry.py:615-669."""
    return image_pipe(overlap=overlap, rotation=rotation, roi_only=roi_only,
                      drop_tiles=drop_tiles)(data=data)
