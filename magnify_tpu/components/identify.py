"""Marker identification: pinlist tagging and MRBLEs spectral decoding.

Mirrors /root/reference/src/magnify/identify.py. The mrbles decoder's three
compute stages run on device:

* per-bead lanthanide intensities (masked fg mean minus bg median over the
  ROI stack) as one fused reduction,
* the 100x100 affine grid search per lanthanide dim (reference ``fit_1d``
  numba kernel, identify.py:107-147) as a vmapped cost evaluation,
* the 50-iteration Gaussian-mixture EM with a uniform outlier component
  (identify.py:161-219) as a ``lax.fori_loop`` over einsum-shaped updates.
"""

from __future__ import annotations

import functools
import re

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import scipy.spatial

from magnify_tpu.core.registry import component
from magnify_tpu.ops.reduce import fg_mean_bg_median

__all__ = ["identify_buttons", "identify_mrbles"]


def _read_csv(src):
    """pd.read_csv that REWINDS file-like sources first.

    Pipelines re-run their identify component per assay (and per frame in
    the ``*_stream`` APIs) with the same spectra/codes/pinlist argument; a
    StringIO/file handle consumed by the first frame must not come back
    empty for the second. (The reference consumes the handle and fails on
    multi-assay inputs, identify.py:53-70 — paths are unaffected either
    way.)
    """
    if hasattr(src, "seek"):
        src.seek(0)
    return pd.read_csv(src)


def _tags_from_pinlist(pinlist, blank) -> np.ndarray:
    """Parse a pinlist CSV into a (rows, cols) tag grid.

    The CSV schema is the reference's (identify.py:13-47): an ``Indices``
    column of "(col, row)" strings (1-indexed) and a ``MutantID`` name
    column; names in ``blank`` (and missing names) become the empty tag.
    """
    table = _read_csv(pinlist)
    positions = np.array([
        [int(part) for part in re.findall(r"-?\d+", cell)]
        for cell in table["Indices"]
    ])
    cols, rows = positions.T - 1  # "(col, row)", 1-indexed

    names = table["MutantID"].astype(object).fillna("")
    names = np.array(["" if n in blank else str(n) for n in names])

    grid = np.zeros((rows.max() + 1, cols.max() + 1), dtype=names.dtype)
    grid[rows, cols] = names
    return grid


@component("identify_buttons")
def identify_buttons(assay, shape=None, pinlist=None, blank=None):
    """Attach chamber tags from a pinlist CSV or a default-filled shape
    (reference identify.py:13-47 semantics)."""
    if blank is None:
        blank = ["", "blank", "BLANK"]

    if pinlist is not None:
        tags = _tags_from_pinlist(pinlist, blank)
    elif shape is not None:
        tags = np.full(tuple(shape), "default", dtype="<U200")
    else:
        raise ValueError(
            "identify_buttons needs a chip layout: pass pinlist or shape."
        )

    return assay.assign_coords(
        tag=(("mark_row", "mark_col"), tags),
        valid=(
            ("mark_row", "mark_col", "time"),
            np.ones(tags.shape + (assay.sizes["time"],), bool),
        ),
    )


@functools.partial(jax.jit, static_argnames=("n_grid",))
def _fit_affine_1d(points_sorted, codes, counts, n_grid: int = 100):
    """Best (scale, offset) aligning a 1-D code lattice to sorted points.

    Vmapped version of the reference's numba grid search (identify.py:107-147):
    points are assigned to the nearest lattice cluster by midpoint boundaries,
    cost = 100 * mean per-cluster MSE + mean squared cluster-size mismatch.

    TWO search windows are evaluated and the lower-cost fit wins:

    * min/max anchors — the reference's window (identify.py:118-125),
      which covers unbalanced panels whose extreme code level holds very
      few points, but which a handful of extreme ratio outliers (noise
      detections with near-zero reference volume; the exhaustive dense
      detector surfaces more of them than the reference's sampled
      RANSAC) can drag entirely off the true lattice (observed: search
      [3, 5]x while the true scale was 1 — the decode then tagged every
      real bead "outlier");
    * 5th/95th order-statistic anchors — robust to those outliers, since
      the outer levels of a balanced panel hold >= 1/levels of points.

    The true fit minimizes the cost under either window, so taking the
    minimum over both grids is exact whenever either window covers it.
    """
    n_codes = codes.shape[0]
    n_pts = points_sorted.shape[0]

    p1 = jnp.concatenate([jnp.zeros(1), jnp.cumsum(points_sorted)])
    p2 = jnp.concatenate([jnp.zeros(1), jnp.cumsum(points_sorted**2)])

    def cost_fn(a, p):
        clusters = a * codes + p
        mids = (clusters[:-1] + clusters[1:]) / 2
        # Exact searchsorted(side="left") as a compare-reduce: on TPU the
        # native lowering is a while loop of element gathers (~10x slower
        # at these sizes — see CLAUDE.md / ops.nms.ranked_survivor_sources).
        spans = (points_sorted[None, :] < mids[:, None]).sum(
            axis=1, dtype=jnp.int32
        )
        starts = jnp.concatenate([jnp.zeros(1, spans.dtype), spans])
        ends = jnp.concatenate([spans, jnp.full((1,), n_pts, spans.dtype)])
        n = (ends - starts).astype(jnp.float32)
        s1 = p1[ends] - p1[starts]
        s2 = p2[ends] - p2[starts]
        mse = (s2 - 2 * clusters * s1 + n * clusters**2) / jnp.maximum(n, 1)
        mse = jnp.where(n > 0, mse, jnp.inf)
        size_term = ((n / n_pts - counts / counts.sum()) ** 2).mean()
        return 100 * mse.mean() + size_term

    code_span = jnp.maximum(codes[-1] - codes[0], 1e-30)

    def search(lo, hi):
        scale = (hi - lo) / code_span
        a_grid = jnp.linspace(0.75 * scale, 1.25 * scale, n_grid)
        p_grid = jnp.linspace(lo, 0.25 * hi + 0.75 * lo, n_grid)
        costs = jax.vmap(
            lambda a: jax.vmap(lambda p: cost_fn(a, p))(p_grid)
        )(a_grid)
        idx = jnp.argmin(costs)
        return costs.reshape(-1)[idx], a_grid[idx // n_grid], \
            p_grid[idx % n_grid]

    c_mm, a_mm, p_mm = search(points_sorted[0], points_sorted[-1])
    c_q, a_q, p_q = search(
        points_sorted[(n_pts - 1) * 5 // 100],       # floor 5th pct
        points_sorted[-(-(n_pts - 1) * 95 // 100)],  # ceil 95th pct
    )
    use_q = c_q < c_mm
    return jnp.where(use_q, a_q, a_mm), jnp.where(use_q, p_q, p_mm)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def _gmm_em(X, means0, covs0, proportions0, bounds_log_vol, num_iters: int = 50):
    """EM for a Gaussian mixture plus one uniform outlier component
    (reference identify.py:188-219), in log space with shared covariance
    regularization."""
    n, d = X.shape
    k = means0.shape[0]
    uniform_logp = -bounds_log_vol

    def step(_, state):
        means, covs, proportions, probs, ok = state
        diff = X[:, None, :] - means[None, :, :]
        det = jnp.linalg.det(covs)
        inv = jnp.linalg.inv(covs)
        maha = jnp.einsum("nki,kij,nkj->nk", diff, inv, diff)
        log_cond = (-d * jnp.log(2 * jnp.pi) / 2
                    - 0.5 * jnp.log(jnp.abs(det)) - 0.5 * maha)
        bad = jnp.any(det <= 0) | jnp.any(~jnp.isfinite(log_cond))
        log_cond = jnp.concatenate(
            [log_cond, jnp.full((n, 1), uniform_logp)], axis=1
        )
        logp = jnp.log(proportions) + log_cond
        logp = logp - jax.scipy.special.logsumexp(logp, axis=1, keepdims=True)
        new_probs = jnp.exp(logp)

        resp = new_probs[:, :-1]
        weight = resp.sum(axis=0)
        new_means = (resp[:, :, None] * X[:, None, :]).sum(0) / weight[:, None]
        diff = X[:, None, :] - new_means[None, :, :]
        new_covs = jnp.einsum("nk,nki,nkj->kij", resp, diff, diff) / weight[
            :, None, None
        ]
        new_covs = new_covs + jnp.eye(d) * jnp.median(new_covs) / 10
        new_props = new_probs.sum(axis=0) / n

        keep = lambda new, old: jnp.where(bad | ~ok, old, new)
        return (keep(new_means, means), keep(new_covs, covs),
                keep(new_props, proportions), keep(new_probs, probs),
                ok & ~bad)

    probs0 = jnp.zeros((n, k + 1))
    state = (means0, covs0, proportions0, probs0, jnp.asarray(True))
    means, covs, proportions, probs, ok = jax.lax.fori_loop(
        0, num_iters, step, state
    )
    # ok=False means an iteration went singular; `probs` then holds the last
    # good posteriors (all-zero if the very first iteration failed).
    had_probs = jnp.any(probs > 0)
    return probs, ok, had_probs


def _small_problem_device(assay):
    """Device context for the decode stages.

    At typical bead counts the decode work (masked reductions, lattice fit,
    GMM-EM) is microscopic, but it spans several dispatches — on a remote
    accelerator the link latency dominates. Route small problems to the
    local CPU backend (same jitted code, no transfers); large mark counts
    stay on the accelerator where the reductions actually pay.
    """
    import contextlib

    try:
        cpus = jax.devices("cpu")
    except RuntimeError:
        return contextlib.nullcontext()
    work = (assay.sizes["mark"] * assay.sizes["channel"]
            * assay.sizes["roi_y"] * assay.sizes["roi_x"])
    if jax.default_backend() != "cpu" and cpus and work < (1 << 25):
        return jax.default_device(cpus[0])
    return contextlib.nullcontext()


# Wall-clock of the last decode's stages (intensities/lstsq, kNN trim,
# lattice fit, GMM-EM), for diagnostics and the bench report. Overwritten
# by every identify_mrbles call.
last_decode_timings: dict[str, float] = {}


@component("identify_mrbles")
def identify_mrbles(assay, spectra, codes, reference="eu"):
    """Spectral decoding of MRBLEs beads (reference identify.py:50-234)."""
    with _small_problem_device(assay):
        return _identify_mrbles_impl(assay, spectra, codes, reference)


def _identify_mrbles_impl(assay, spectra, codes, reference):
    import time as _time

    _t0 = _time.perf_counter()

    def _stamp(stage):
        nonlocal _t0
        now = _time.perf_counter()
        last_decode_timings[stage] = round(now - _t0, 4)
        _t0 = now

    last_decode_timings.clear()
    spectra_df = _read_csv(spectra)
    ref_matches = spectra_df[spectra_df["name"] == reference].index
    if len(ref_matches) == 0:
        raise ValueError(
            f"Reference lanthanide '{reference}' not found in spectra file"
        )
    ref_idx = ref_matches[0]
    order = [ref_idx] + [i for i in range(len(spectra_df)) if i != ref_idx]
    spectra_df = spectra_df.reindex(order)
    lns = spectra_df["name"].to_list()
    num_lns = len(lns)

    codes_df = _read_csv(codes)
    tag_names = codes_df["name"].to_numpy()
    code_lns = set(codes_df.columns) - {"name"}
    if code_lns != set(lns):
        raise ValueError(
            f"Lanthanide names in {codes} do not match lanthanide names in "
            f"{spectra}."
        )

    if assay.sizes.get("mark", 0) == 0:
        # Empty field (mg.beads found nothing): nothing to decode. The
        # lattice fit / GMM need >= 1 point; return the empty-but-valid
        # schema instead of crashing (the reference's fit_1d would index
        # an empty array here, identify.py:118).
        assay = assay.assign_coords(ln=(("ln",), np.asarray(lns)))
        assay["ln_vol"] = (("mark", "ln"), np.zeros((0, num_lns)))
        assay["ln_ratio"] = (("mark", "ln"), np.zeros((0, num_lns)))
        return assay.assign_coords(tag=(("mark",), np.zeros(0, dtype="<U64")))

    # Step 1: lanthanide volumes from SV = I least squares.
    channels = [c for c in _coord_list(assay, "channel")
                if c in spectra_df.columns]
    sp = spectra_df[channels].to_numpy()
    sel = assay.roi.isel(time=0).sel(channel=channels)
    fg = assay["fg"].isel(time=0)
    bg = assay["bg"].isel(time=0)
    # Reduction placement follows the shared policy (see
    # ops.reduce.prefer_host_reduction): a disk-spilled ROI store reduces
    # on the exact host twin — uploading a store that already lives in
    # spill files costs more in host->HBM transfer than the device
    # reduction saves (and per-mark intensities are host-bound input to
    # the lstsq anyway).
    from magnify_tpu.ops.reduce import prefer_host_reduction

    intensities = fg_mean_bg_median(
        sel.to_numpy(), fg.to_numpy(), bg.to_numpy(),
        prefer_host=prefer_host_reduction(assay["roi"].data))
    volumes = np.linalg.lstsq(sp.T, intensities.T, rcond=None)[0].T
    ratios = volumes / volumes[:, 0:1]
    _stamp("intensities_lstsq")
    assay = assay.assign_coords(ln=(("ln",), np.asarray(lns)))
    assay["ln_vol"] = (("mark", "ln"), volumes)
    assay["ln_ratio"] = (("mark", "ln"), ratios)

    # Step 2: aggressive kNN outlier trim (identify.py:90-100).
    X = ratios[:, 1:]
    num_codes = len(tag_names)
    n_neighbor = round(len(X) / (20 * num_codes)) + 2
    dist = (
        scipy.spatial.KDTree(X, leafsize=n_neighbor)
        .query(X, k=[n_neighbor], workers=-1)[0]
        .flatten()
    )
    X_r = X[dist <= np.percentile(dist, 95)]
    _stamp("knn_trim")

    # Step 3: per-dim affine lattice fit, then nearest-code assignment.
    code_ratios = codes_df[lns[1:]].to_numpy()
    A = np.zeros(num_lns - 1)
    p = np.zeros(num_lns - 1)
    for i in range(num_lns - 1):
        c, counts = np.unique(code_ratios[:, i], return_counts=True)
        if len(c) == 1:
            A[i], p[i] = 1.0, X_r[:, i].mean()
            continue
        a_i, p_i = _fit_affine_1d(
            jnp.asarray(np.sort(X_r[:, i]), jnp.float32),
            jnp.asarray(c, jnp.float32),
            jnp.asarray(counts, jnp.float32),
        )
        A[i], p[i] = float(a_i), float(p_i)

    _stamp("lattice_fit")
    lattice = A * code_ratios + p
    tag_idxs = np.argmin(
        np.linalg.norm(X_r[:, None] - lattice[None], axis=-1), axis=1
    )

    # Step 4: GMM refinement with a uniform outlier component.
    d = num_lns - 1
    means = np.zeros((num_codes, d))
    covs = np.zeros((num_codes, d, d)) + np.eye(d) * 1e-10
    proportions = np.zeros(num_codes + 1)
    for i in range(num_codes):
        members = X_r[tag_idxs == i]
        proportions[i] = len(members) + 1
        means[i] = (np.median(members, axis=0) if len(members)
                    else lattice[i])
        if len(members) > 1:
            covs[i] += np.cov(members, rowvar=False).reshape(d, d)
    covs[:] = np.median(covs, axis=0)
    # The ELEMENTWISE median of PSD matrices need not be PSD: with noise
    # members inflating cross terms, med(c00)*med(c11) can fall below
    # med(c01)^2 (observed det = -2.4e-6 on a bench fixture), and a
    # non-PD init kills EM at iteration 0 — the nearest-code fallback
    # then codes every noise detection. Regularize like the in-loop
    # update; if still not PD, drop the cross terms (the diagonal of
    # variances is PD by construction).
    covs += np.eye(d) * np.abs(np.diagonal(covs[0])).mean() / 10
    if np.linalg.eigvalsh(covs[0]).min() <= 0:
        covs[:] = np.diag(np.maximum(np.diagonal(covs[0]), 1e-10))
    proportions[-1] = 1e-10
    proportions /= proportions.sum()
    span = np.log(X_r.max(axis=0) - X_r.min(axis=0)).sum()

    probs, ok, had_probs = _gmm_em(
        jnp.asarray(X, jnp.float32), jnp.asarray(means, jnp.float32),
        jnp.asarray(covs, jnp.float32),
        jnp.asarray(proportions, jnp.float32), float(span),
    )
    probs = np.asarray(probs)  # sync before stamping the EM stage
    _stamp("gmm_em")
    tag_names = np.append(tag_names, "outlier")
    if not bool(ok):
        # Matches the reference's divergence handling (identify.py:196-199,
        # 224-232): warn, keep the last good posteriors if any iteration
        # succeeded, else fall back to nearest-code assignment.
        print("Warning: Code clustering did not converge.")
    if bool(had_probs):
        final_idxs = np.argmax(np.asarray(probs), axis=1)
    else:
        final_idxs = np.argmin(
            np.linalg.norm(X[:, None] - lattice[None], axis=-1), axis=1
        )
    return assay.assign_coords(tag=(("mark",), tag_names[final_idxs]))


def _coord_list(assay, name):
    return list(assay[name].values.tolist())
