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


def microfluidic_chip(
    data,
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
):
    """Find buttons in microfluidic-chip images and return the standardized
    dataset.

    Parameter surface mirrors the reference ``microfluidic_chip``
    (/root/reference/src/magnify/registry.py:32-193).

    Parameters
    ----------
    data :
        A file path or glob (with ``(assay)``, ``(channel)``,
        ``(time|FMT)``, ``(row)``, ``(col)`` specifiers), a
        DataArray/Dataset, or a sequence of any of these.
    shape :
        (rows, cols) of the button grid; every chamber is tagged
        "default". Either ``shape`` or ``pinlist`` must be given.
    pinlist :
        CSV with an ``Indices`` column of 1-indexed "(col, row)" pairs and a
        ``MutantID`` column of chamber names; ``blank`` values (default
        ["", "blank", "BLANK"]) become the empty tag.
    overlap :
        Pixels to crop between adjacent tiles while stitching.
    rotation :
        Degrees to rotate the stitched image about its center.
    row_dist, col_dist :
        Pitch between button rows/columns in pixels.
    chip_type :
        Preset pitch: "minichip", "pc", or "ps" (overrides
        row_dist/col_dist).
    min_button_diameter, max_button_diameter :
        Detection diameter bounds in pixels.
    chamber_diameter :
        Chamber diameter in pixels (sets the background annulus and the
        center-clustering distance).
    top_chamber, left_chamber :
        Known pixel offset of the first chamber edge; when given, row/col
        clustering uses the fixed geometry instead of the offset sweep.
    low_edge_quantile, high_edge_quantile :
        Gradient-magnitude quantiles for the Canny thresholds (0..1).
    num_iter :
        RANSAC proposal budget (shared across chambers); ignored by the
        dense detector.
    min_roundness :
        Minimum perimeter-alignment score for accepted buttons (0..1).
    cluster_penalty :
        Weight of the count-mismatch term in the row/col clustering cost.
    roi_length :
        ROI window edge length (default ``1.2 * chamber_diameter``).
    progress_bar :
        Show progress over timesteps.
    search_timestep :
        Timestep(s) to run detection on; others copy positions from the
        nearest searched timestep before them (or the first after).
    search_channel :
        Channel(s) used for detection (default: all).
    roi_only :
        Return only the roi DataArray.
    drop_tiles :
        Remove the tile variable after stitching.
    interactive :
        Open the step-tuning UI.
    detector :
        "auto" (dense on TPU, ransac elsewhere), "dense", or "ransac".

    Returns
    -------
    Dataset (or list of Datasets, one per assay) with ``roi`` plus
    ``fg``/``bg``/``x``/``y``/``tag``/``valid`` coordinates over
    ``mark = (mark_row, mark_col)``.
    """
    return microfluidic_chip_pipe(
        shape=shape,
        pinlist=pinlist,
        blank=blank,
        overlap=overlap,
        rotation=rotation,
        row_dist=row_dist,
        col_dist=col_dist,
        chip_type=chip_type,
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
        roi_only=roi_only,
        drop_tiles=drop_tiles,
        interactive=interactive,
        detector=detector,
    )(data=data)


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


def mrbles(
    data,
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
):
    """Find and spectrally decode MRBLEs beads.

    Parameter surface mirrors the reference ``mrbles``
    (/root/reference/src/magnify/registry.py:274-399).

    Parameters
    ----------
    data :
        Path/glob, DataArray/Dataset, or a sequence of them.
    spectra :
        CSV of per-lanthanide emission across channels: a ``name`` column
        plus one column per imaging channel.
    codes :
        CSV of code compositions: a ``name`` column plus one column per
        lanthanide (ratios relative to the reference lanthanide).
    flatfield, darkfield :
        Scalar factors, TIFF paths, or store directories for illumination
        correction.
    overlap :
        Pixels to crop between adjacent tiles while stitching.
    min_bead_diameter, max_bead_diameter :
        Detection diameter bounds in pixels.
    low_edge_quantile, high_edge_quantile :
        Gradient-magnitude quantiles for the Canny thresholds (0..1).
    num_iter :
        RANSAC proposal budget; ignored by the dense detector.
    min_roundness :
        Minimum perimeter-alignment score for accepted beads (0..1).
    roi_length :
        ROI window edge length (default ``2 * max_bead_diameter``).
    search_channel :
        Channel(s) used for detection (default: all).
    reference :
        The normalizing lanthanide name (default "eu").
    roi_only, drop_tiles, interactive, detector :
        As in :func:`beads`.

    Returns
    -------
    Dataset with ``roi``, ``ln_vol``/``ln_ratio`` (mark, ln) variables, and
    a decoded per-bead ``tag`` coordinate ("outlier" for unassigned beads).
    """
    return mrbles_pipe(
        spectra=spectra,
        codes=codes,
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
        reference=reference,
        roi_only=roi_only,
        drop_tiles=drop_tiles,
        interactive=interactive,
        detector=detector,
    )(data=data)


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

    Parameter surface mirrors the reference ``beads``
    (/root/reference/src/magnify/registry.py:454-565).

    Parameters
    ----------
    data :
        Path/glob (with specifier grammar), DataArray/Dataset, or a
        sequence of them.
    flatfield, darkfield :
        Scalar factors, TIFF paths, or store directories for illumination
        correction.
    overlap :
        Pixels to crop between adjacent tiles while stitching.
    min_bead_diameter, max_bead_diameter :
        Detection diameter bounds in pixels.
    low_edge_quantile, high_edge_quantile :
        Gradient-magnitude quantiles for the Canny thresholds (0..1).
    num_iter :
        RANSAC proposal budget — more samples find beads more reliably;
        the dense detector evaluates every candidate and ignores it.
    min_roundness :
        Minimum perimeter-alignment score for accepted beads (0..1).
    roi_length :
        ROI window edge length (default ``2 * max_bead_diameter``).
    search_channel :
        Channel(s) used for detection (default: all); beads found in later
        channels within ``2 * min_radius`` of an earlier find are dropped
        as duplicates.
    roi_only :
        Return only the roi DataArray.
    drop_tiles :
        Remove the tile variable after stitching.
    interactive :
        Open the step-tuning UI.
    detector :
        "auto" (dense on TPU, ransac elsewhere), "dense", or "ransac".

    Returns
    -------
    Dataset with a ``roi`` (mark, channel, time, roi_y, roi_x) variable and
    ``fg``/``bg``/``x``/``y``/``valid`` coordinates over marks.
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


def beads_stream(frames, *, stream_depth: int = 2, stream_pull_batch: int = 4,
                 **kwargs):
    """Pipelined multi-frame bead pipeline (generator).

    ``frames`` is an iterable of per-frame inputs (each anything
    :func:`beads` accepts: path/glob, DataArray/Dataset, ...); ``kwargs``
    are the :func:`beads` parameters. Yields one finished Dataset per
    frame, bit-identical to ``beads(frame, **kwargs)`` run alone, but with
    consecutive frames' stages overlapped: the host pre-stages and uint8
    upload of frame k+depth, the device detection of frame k+1, and the
    host ROI/mask assembly of frame k all run concurrently (the device
    dispatch stream is in-order, so detection results arrive exactly when
    the pipeline reaches them). ``stream_depth`` frames are kept
    dispatched-ahead (2 = classic double buffering), and the small packed
    detection results of ``stream_pull_batch`` consecutive frames are
    pulled with one host sync so the per-frame link cost is one round
    trip divided by the batch.

    Steady-state throughput is set by the slowest stage instead of the
    serial per-frame sum — on relay-attached TPUs this hides the ~2
    round trips + upload the single-frame path pays per frame
    (BASELINE.md "environment tax").

    The reference has no multi-frame pipelining: it processes assays
    strictly serially (/root/reference/src/magnify/pipeline.py:14-39),
    overlapping only dask-chunk decode within one frame
    (/root/reference/src/magnify/reader.py:284-292). This is the
    TPU-native replacement at the whole-pipeline level (SURVEY §7.9).
    """
    return _stream_from_pipe(beads_pipe(**kwargs), frames, stream_depth,
                             stream_pull_batch)


def mrbles_stream(frames, *, spectra, codes, stream_depth: int = 2,
                  stream_pull_batch: int = 4, **kwargs):
    """Pipelined multi-frame MRBLEs pipeline (generator).

    The :func:`beads_stream` overlap machinery applied to the full MRBLEs
    chain: detection pipelines across frames exactly as in
    ``beads_stream``, and each frame's spectral decoding
    (``identify_mrbles``) runs on the assembly worker, overlapping the
    next frames' uploads and device detection. Yields one decoded Dataset
    per frame, bit-identical to ``mrbles(frame, ...)`` run alone.
    ``spectra``/``codes`` file-likes are rewound per frame.
    """
    return _stream_from_pipe(
        mrbles_pipe(spectra=spectra, codes=codes, **kwargs), frames,
        stream_depth, stream_pull_batch,
    )


def _stream_from_pipe(pipe, frames, depth, pull_batch):
    """Split a bead-finding pipeline at find_beads and run its streaming
    executor (BeadFinder.stream): pre components feed the producer thread,
    post components (drop/restore, and identify_mrbles for the mrbles
    pipe) run per frame on the assembly worker."""
    split = pipe.component_names.index("find_beads")
    finder = pipe.components[split][1]
    return finder.stream(
        frames,
        reader=pipe.reader,
        pre=pipe.components[:split],
        post=pipe.components[split + 1:],
        depth=depth,
        pull_batch=pull_batch,
    )


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
