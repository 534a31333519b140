"""Candidate dedupe + perimeter-alignment roundness scoring.

The reference scores every one of its ~5e6 RANSAC proposals by walking each
circle's Bresenham perimeter and summing gradient/radial alignment at edge
pixels (/root/reference/src/magnify/utils.py:225-251, driven per radius at
utils.py:183-188). The score depends only on the *rounded* (row, col, radius)
triple, so this implementation first collapses proposals to unique rounded
triples (a presence scatter over the key raster — no sort, no per-candidate
gather) and scores each unique circle once: an exact optimization that
typically cuts the gather volume by orders of magnitude.

Scoring itself is a fixed-shape gather: per-radius perimeter offset tables
(padded to the longest perimeter) + one (K, L) gather from the padded
gradient-angle and edge images, with the reference's alignment formula
``4*|wrap(|a - e|) - pi/2|/pi - 1`` summed over edge hits and normalized by
perimeter length.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from magnify_tpu.ops.geom import perimeter_tables
from magnify_tpu.ops.ransac import _gather_rows, _pad128

__all__ = ["dedupe_circles", "score_circles"]

_INT32_MAX = np.iinfo(np.int32).max


# Above this many key-space slots the first-occurrence raster would cost too
# much memory; the sort-based fallback handles such (rare, huge-image) cases.
RASTER_KEY_LIMIT = 1 << 28


def raster_key_space(height: int, width: int, min_radius: int,
                     max_radius: int) -> int:
    """Size of the (row, col, radius) dedupe key raster.

    The single source of truth for the key layout shared by
    :func:`dedupe_circles` / :func:`_presence_words` (which scatter into
    it), ``ops.detect.find_circles``'s mesh-routing guard, and
    ``parallel.mesh.sharded_ransac_find_circles``'s limit check — all
    three must agree on when the bitmask raster applies, so none of them
    may reimplement this formula.
    """
    return ((height + 2 * max_radius + 1) * (width + 2 * max_radius + 1)
            * (max_radius - min_radius + 1))


@functools.partial(
    jax.jit, static_argnames=("height", "width", "min_radius", "max_radius", "cap")
)
def dedupe_circles(circles, valid, *, height: int, width: int, min_radius: int,
                   max_radius: int, cap: int):
    """Round, bound-filter, and collapse candidate circles to unique triples.

    Applies the reference's radius and off-image filters (utils.py:155-166)
    then compacts the unique rounded circles into a static (cap, 3) buffer.
    Scoring depends only on the rounded triple, so collapsing duplicates here
    is an exact optimization over the reference's score-everything loop.

    ``circles`` is a 3-tuple of (N,) row/col/radius vectors (the hot path —
    a stacked (N, 3) array is also accepted but its 3-wide minor dim costs a
    relayout at N=5e6) and uniqueness is computed without any sort or
    per-candidate gather: a presence scatter over the (row, col, radius) key
    raster marks occupied triples, the raster is packed into 32-bit bitmask
    words whose popcounts rank them, and one row gather + popcount bisection
    per output slot compacts — the triples are then decoded arithmetically
    from their keys. (The first-owner formulation gathered owner[key] back
    per candidate and cumsummed over the candidate axis — 3 extra
    5e6-element passes, ~2.2x slower in-frame on v5e; a raster-wide cumsum
    + index scatter still paid ~37 ms for the key_space-sized scatter.)

    Returns (unique_circles int32 (cap, 3), unique_valid bool (cap,),
    n_unique int32), the uniques in key-raster (row, col, radius) order —
    the same order the dense detector emits. ``n_unique`` may exceed
    ``cap``; callers detect overflow and retry with a larger cap. Rows past
    ``n_unique`` hold decoded garbage — callers must mask by
    ``unique_valid``.
    """
    row, col, rad, ok = _round_filter(circles, valid, height=height,
                                      width=width, min_radius=min_radius,
                                      max_radius=max_radius)

    key_space = raster_key_space(height, width, min_radius, max_radius)
    if key_space >= _INT32_MAX:
        return _dedupe_sorted(row, col, rad, ok, max_radius, cap)

    # Backend-routed, byte-identical either way: TPU scatters are
    # per-element bound (~41 ms per 5e6) while its VALUE sort runs 9.4 ms,
    # so TPU takes the two-sort compaction; the CPU backend is the exact
    # opposite (cache-resident random scatter 35 ms, XLA CPU sort 659 ms
    # at 5e6 — measured on the anchor host), so CPU keeps the presence-
    # bitmask path.
    if jax.default_backend() == "cpu":
        if key_space > RASTER_KEY_LIMIT:
            # The presence raster (1 B/slot bool + 4 B/slot packed-bits
            # intermediate) would cost GBs past this point — argsort
            # compaction instead, as before the raster path existed.
            return _dedupe_sorted(row, col, rad, ok, max_radius, cap)
        words = _presence_words(row, col, rad, ok, height=height,
                                width=width, min_radius=min_radius,
                                max_radius=max_radius)
        return compact_from_words(words, height=height, width=width,
                                  min_radius=min_radius,
                                  max_radius=max_radius, cap=cap)
    return _dedupe_sort_compact(row, col, rad, ok, height=height,
                                width=width, min_radius=min_radius,
                                max_radius=max_radius, cap=cap)


def _dedupe_sort_compact(row, col, rad, ok, *, height: int, width: int,
                         min_radius: int, max_radius: int, cap: int):
    """Two-VALUE-sort unique compaction over the (row, col, radius) keys.

    Replaces the presence-scatter + bitmask ranking for the single-chip
    path (round-5 task 4: the 41 ms scatter floor). XLA's TPU scatter is
    per-element bound (~122M elem/s: 41 ms for 5e6 candidates,
    scripts/scatter_experiments.py), but a VALUE sort of the same 5e6
    int32 keys runs at 9.4 ms — so uniqueness is computed sort-first:

    1. sort the int32 keys (invalid candidates -> INT32_MAX sentinel);
    2. flag first occurrences elementwise (s[i] != s[i-1]);
    3. replace duplicates with the sentinel and sort AGAIN — the unique
       keys compact to the front IN KEY ORDER, so the (cap,) result is a
       free slice, and no scatter (per-element bound) ever runs.

    Measured chained at 5e6 candidates / 1024^2: 42.7 -> 9.9 ms for the
    whole dedupe, outputs byte-identical to the bitmask path including
    order (both emit ascending key-raster order). The bitmask variant
    (:func:`_presence_words` + :func:`compact_from_words`) remains the
    mesh path — set union is a bitwise OR on presence words, which is
    what makes the sharded RANSAC merge bit-identical by construction.
    ``n_unique`` may exceed ``cap`` (callers grow + retry); rows past
    ``n_unique`` decode the sentinel and must be masked by ``valid``.
    """
    kw = width + 2 * max_radius + 1
    kr_range = max_radius - min_radius + 1
    key = ((row + max_radius) * kw + (col + max_radius)) * kr_range + (
        rad - min_radius
    )
    key = jnp.where(ok, key, _INT32_MAX)
    s = jnp.sort(key)
    uniq = jnp.ones(s.shape, jnp.bool_).at[1:].set(s[1:] != s[:-1])
    uniq &= s < _INT32_MAX
    n_unique = uniq.sum()
    out_key = jnp.sort(jnp.where(uniq, s, _INT32_MAX))
    if out_key.shape[0] < cap:  # fewer candidates than output capacity
        out_key = jnp.pad(out_key, (0, cap - out_key.shape[0]),
                          constant_values=_INT32_MAX)
    else:
        out_key = out_key[:cap]
    rad_u = out_key % kr_range + min_radius
    yx = out_key // kr_range
    col_u = yx % kw - max_radius
    row_u = yx // kw - max_radius
    out = jnp.stack([row_u, col_u, rad_u], axis=1)
    out_valid = jnp.arange(cap) < n_unique
    return out, out_valid, n_unique


def _round_filter(circles, valid, *, height: int, width: int,
                  min_radius: int, max_radius: int):
    """Round candidates to int triples and apply the reference's radius and
    off-image bound filters (utils.py:155-166)."""
    if isinstance(circles, (tuple, list)):
        rowf, colf, radf = circles
    else:
        rowf, colf, radf = circles[:, 0], circles[:, 1], circles[:, 2]
    row = jnp.round(rowf).astype(jnp.int32)
    col = jnp.round(colf).astype(jnp.int32)
    rad = jnp.round(radf).astype(jnp.int32)
    ok = valid
    ok &= (rad >= min_radius) & (rad <= max_radius)
    ok &= (row + rad >= 0) & (col + rad >= 0)
    ok &= (row - rad < height) & (col - rad < width)
    return row, col, rad, ok


def _presence_words(row, col, rad, ok, *, height: int, width: int,
                    min_radius: int, max_radius: int):
    """Presence bitmask over the (row, col, radius) key raster.

    Presence raster, padded to whole 128-lane blocks, then packed into
    32-bit bitmask words. Compaction avoids any key_space-sized scatter
    (a 5.5M-element index scatter measured ~37 ms at 1024^2 — XLA
    scatters are per-INPUT-element bound like gathers) AND any
    (cap, 128)-shaped intermediate (a block-granular variant paid ~31 ms
    in cumsum/select traffic): per-WORD popcounts give each word's
    output offset (one cumsum over key_space/32 words), a scatter-max +
    running max assigns each output slot its source word, and one row
    gather + 5-step popcount bisection picks the slot's bit. Measured
    75 -> 50 ms in-frame at 5e6 candidates (scripts/
    dedupe_substage_time.py: presence scatter 41, rank + compact ~8.5).

    Split from :func:`compact_from_words` so a device mesh can build
    per-chip presence words over disjoint candidate slices and bitwise-OR
    them before one replicated compaction — set union is exactly OR on
    the bitmask, which is what makes the mesh RANSAC path bit-identical
    to single-chip by construction.
    """
    kw = width + 2 * max_radius + 1
    kr_range = max_radius - min_radius + 1
    key_space = raster_key_space(height, width, min_radius, max_radius)
    key = ((row + max_radius) * kw + (col + max_radius)) * kr_range + (
        rad - min_radius
    )
    nb = -(-key_space // 128)
    live = jnp.zeros((nb * 128,), jnp.bool_).at[
        jnp.where(ok, key, nb * 128)
    ].set(True, mode="drop")
    blocks = live.reshape(nb, 128)
    nw = nb * 4
    lanes = jax.lax.broadcasted_iota(jnp.uint32, (nb, 128), 1)
    bits = jnp.where(blocks, jnp.uint32(1) << (lanes & 31), jnp.uint32(0))
    return bits.reshape(nb, 4, 32).sum(axis=2, dtype=jnp.uint32).reshape(nw)


def compact_from_words(words, *, height: int, width: int, min_radius: int,
                       max_radius: int, cap: int):
    """Rank + compact + decode unique circles from presence bitmask words.

    The second half of :func:`dedupe_circles`'s raster path; ``words`` is
    the :func:`_presence_words` bitmask (possibly OR-merged across mesh
    devices). Returns (unique int32 (cap, 3), valid bool (cap,), n_unique).
    """
    kw = width + 2 * max_radius + 1
    kr_range = max_radius - min_radius + 1
    nw = words.shape[0]
    wsum = jax.lax.population_count(words).astype(jnp.int32)
    wcsum = jnp.cumsum(wsum)
    n_unique = wcsum[-1]
    wstart = wcsum - wsum

    # Output slot r lives in the last word whose start is <= r; empty
    # words share their successor's start, so scatter-max of word ids at
    # wstart positions followed by a running max resolves ties to the
    # correct (non-empty) owner.
    wid = jnp.zeros((cap,), jnp.int32).at[wstart].max(
        jnp.arange(nw, dtype=jnp.int32), mode="drop")
    wid = jax.lax.associative_scan(jnp.maximum, wid)

    wstart_pad = jnp.pad(wstart, (0, _pad128(nw) - nw))
    q = jnp.arange(cap, dtype=jnp.int32) - _gather_rows(wstart_pad, wid)
    words_pad = jnp.pad(words, (0, _pad128(nw) - nw))
    w = _gather_rows(words_pad.astype(jnp.int32), wid).astype(jnp.uint32)
    # Position of the q-th set bit: bisect on prefix popcount (the mask
    # wraps to all-ones at pos+b = 32, which is exactly right).
    pos = jnp.zeros((cap,), jnp.int32)
    for b in (16, 8, 4, 2, 1):
        mask = (jnp.uint32(1) << (pos + b).astype(jnp.uint32)) - 1
        c = jax.lax.population_count(w & mask).astype(jnp.int32)
        pos = jnp.where(c <= q, pos + b, pos)
    out_key = wid * 32 + pos
    rad_u = out_key % kr_range + min_radius
    yx = out_key // kr_range
    col_u = yx % kw - max_radius
    row_u = yx // kw - max_radius
    out = jnp.stack([row_u, col_u, rad_u], axis=1)
    out_valid = jnp.arange(cap) < n_unique
    return out, out_valid, n_unique


def _dedupe_sorted(row, col, rad, ok, max_radius, cap):
    """Sort-based unique compaction (two stable passes = lexicographic)."""
    k2 = (col + max_radius) * (max_radius + 1) + rad
    k2 = jnp.where(ok, k2, _INT32_MAX)
    kr = jnp.where(ok, row + max_radius, _INT32_MAX)
    o1 = jnp.argsort(k2, stable=True)
    o2 = jnp.argsort(kr[o1], stable=True)
    order = o1[o2]

    srow, scol, srad = row[order], col[order], rad[order]
    sok = ok[order]
    first = jnp.ones_like(sok)
    first = first.at[1:].set(
        (srow[1:] != srow[:-1]) | (scol[1:] != scol[:-1]) | (srad[1:] != srad[:-1])
    )
    uniq = first & sok
    rank = jnp.cumsum(uniq) - 1
    n_unique = uniq.sum()

    dest = jnp.where(uniq, rank, cap)
    out = jnp.zeros((cap, 3), dtype=jnp.int32)
    out = out.at[dest, 0].set(srow, mode="drop")
    out = out.at[dest, 1].set(scol, mode="drop")
    out = out.at[dest, 2].set(srad, mode="drop")
    out_valid = jnp.arange(cap) < n_unique
    return out, out_valid, n_unique


# Odd harmonics of the pi-periodic triangle alignment wave. The reference's
# per-pixel score 4*|wrap(|a - e|) - pi/2|/pi - 1 equals
# (8/pi^2) * sum_{k odd} cos(2k (a - e)) / k^2, which separates the image
# angle a from the ring angle e — turning perimeter scoring into a
# convolution. MAGNIFY_TPU_HARMONICS=<max odd k> (read at import — the
# tables feed traced code) trades conv channels for truncation error.
# Default k <= 7 (~2.4% worst-case score error, measured 2.60 -> 1.79 ms
# for the 1024^2 folded score stage on v5e — a third of the conv
# channels): the full test suite (every detection count/position fixture,
# conv-vs-gather cross-checks) and the marginal-detection-sensitive noisy
# bench fixtures produce IDENTICAL detection sets at 7 and 11; set
# MAGNIFY_TPU_HARMONICS=11 for the tighter ~1.5% score bound.
_MAX_HARMONIC = int(os.environ.get("MAGNIFY_TPU_HARMONICS", "7"))
_HARMONICS = tuple(k for k in (1, 3, 5, 7, 9, 11) if k <= _MAX_HARMONIC)
_COEFFS = tuple(8.0 / (np.pi**2 * k**2) for k in _HARMONICS)


@functools.lru_cache(maxsize=None)
def _ring_conv_kernel(min_radius: int, max_radius: int) -> np.ndarray:
    """Conv kernel (n_radii, 2*len(H), K, K) for ring-correlation scoring.

    Input channels alternate (edge*cos(2ka), edge*sin(2ka)) per harmonic;
    output channel r_idx accumulates sum_k c_k * [cos term + sin term] over
    the Bresenham ring of radius min_radius + r_idx, normalized by ring
    length (matching mean_grad's 1/L normalization, reference
    utils.py:187).
    """
    from magnify_tpu import utils

    n_radii = max_radius - min_radius + 1
    size = 2 * max_radius + 1
    kernel = np.zeros((n_radii, 2 * len(_HARMONICS), size, size), np.float32)
    for ri in range(n_radii):
        r = min_radius + ri
        ring = utils.circle_points(r)
        angles = np.arctan2(ring[:, 0], ring[:, 1])
        inv_len = 1.0 / len(ring)
        for hi, (k, c) in enumerate(zip(_HARMONICS, _COEFFS)):
            kernel[ri, 2 * hi, max_radius + ring[:, 0],
                   max_radius + ring[:, 1]] += c * inv_len * np.cos(
                       2 * k * angles)
            kernel[ri, 2 * hi + 1, max_radius + ring[:, 0],
                   max_radius + ring[:, 1]] += c * inv_len * np.sin(
                       2 * k * angles)
    return kernel


@functools.lru_cache(maxsize=None)
def _s2d_ring_kernel(min_radius: int, max_radius: int, s: int):
    """Space-to-depth rewrite of the ring kernel.

    The plain formulation convolves 12 -> n_radii channels with a
    (2R+1)^2 kernel: output-channel count ~5 leaves the 128x128 MXU ~4%
    utilized. Folding an s x s spatial block into channels yields an
    equivalent conv with 12*s^2 -> n_radii*s^2 channels and a
    ceil((2R+s)/s)-wide kernel — the same math at MXU-friendly widths.

    Returns (W2, q0) with W2 shaped (n_radii*s*s, C*s*s, nQ, nQ).
    """
    k = _ring_conv_kernel(min_radius, max_radius)
    n_r, c_in, ksz, _ = k.shape
    rpad = max_radius
    q0 = (rpad + s - 1) // s
    nq = 2 * q0 + 1
    w2 = np.zeros((n_r * s * s, c_in * s * s, nq, nq), np.float32)
    oy = np.arange(-rpad, rpad + 1)
    for u in range(s):
        qy = (oy + u) // s
        dy = (oy + u) % s
        for v in range(s):
            qx = (oy + v) // s
            dx = (oy + v) % s
            # For each (r, c): scatter K[r, c, oy, ox] into
            # W2[(r,u,v), (c,dy,dx), qy+q0, qx+q0].
            out_ch = (np.arange(n_r) * s * s + u * s + v)  # (n_r,)
            in_ch = (np.arange(c_in)[:, None, None] * s * s
                     + dy[None, :, None] * s + dx[None, None, :])  # (C,K,K)
            w2[out_ch[:, None, None, None],
               in_ch[None],
               (qy + q0)[None, None, :, None],
               (qx + q0)[None, None, None, :]] = k[:, :, :, :]
    return w2, q0


@functools.lru_cache(maxsize=None)
def _ring_conv_kernel_q8(min_radius: int, max_radius: int):
    """Symmetric per-output-channel int8 quantization of the ring kernel.

    Returns (q int8 (n_radii, C, K, K), scale f32 (n_radii,)) with
    ``w ~= q * scale / 127``. Quantization error is bounded by half a
    quantization step per tap: |score error| <= sum_taps |feat| * s_r/254
    <= C * c_1 / 254 ~= 2.5% worst-case (every tap error aligned and every
    feature at magnitude 1) and ~0.1% RMS in practice — the same order as
    the bf16 input rounding it replaces and well under the k<=7 harmonic
    truncation bound (~2.4%); the int8 MXU path runs at 2x the bf16 rate
    on v5e and its int32 accumulation is EXACT (no reduction-order
    rounding at all).
    """
    k = _ring_conv_kernel(min_radius, max_radius)
    amax = np.abs(k).max(axis=(1, 2, 3))
    scale = np.where(amax > 0, amax, 1.0).astype(np.float32)
    q = np.round(k / scale[:, None, None, None] * 127.0).astype(np.int8)
    return q, scale


@functools.lru_cache(maxsize=None)
def _s2d_ring_kernel_q8(min_radius: int, max_radius: int, s: int):
    """int8 quantization of the folded ring kernel.

    The fold only REDISTRIBUTES taps — output channel (r, u, v) holds
    exactly the taps of unfolded channel r — so quantizing the folded
    kernel with the UNFOLDED per-radius scales makes the folded int8 conv
    bit-identical to the unfolded one (int32 accumulation is exact, the
    dequant multiplies by the same scalar): the same fold-fungibility the
    bf16 path relies on, but now exact by construction. Returns
    (q int8 (n_r*s*s, C*s*s, nq, nq), scale f32 (n_r*s*s,), q0).
    """
    w2, q0 = _s2d_ring_kernel(min_radius, max_radius, s)
    _, rscale = _ring_conv_kernel_q8(min_radius, max_radius)
    scale = np.repeat(rscale, s * s).astype(np.float32)
    q = np.round(w2 / scale[:, None, None, None] * 127.0).astype(np.int8)
    return q, scale, q0


def _space_to_depth(x, s):
    c, h, w = x.shape
    x = x.reshape(c, h // s, s, w // s, s)
    return x.transpose(0, 2, 4, 1, 3).reshape(c * s * s, h // s, w // s)


def _depth_to_space(x, s):
    cs, h, w = x.shape
    c = cs // (s * s)
    x = x.reshape(c, s, s, h, w)
    return x.transpose(0, 3, 1, 4, 2).reshape(c, h * s, w * s)


# MAGNIFY_TPU_SCORE_QUANT is snapshotted at import for the same reason as
# MAGNIFY_TPU_S2D below (the resolution runs at trace time). "int8" routes
# the score conv through the MXU's 2x int8 path; "bf16" is the prior
# behavior. Default: int8 on TPU (gate evidence: identical detection sets
# on the full suite and both noisy bench fixtures, see CHANGELOG 0.5.0),
# bf16 elsewhere.
_SCORE_QUANT_ENV = os.environ.get("MAGNIFY_TPU_SCORE_QUANT")


def _resolve_qmode(qdtype=None) -> str:
    if qdtype is not None:
        mode = qdtype
    elif _SCORE_QUANT_ENV:
        mode = _SCORE_QUANT_ENV
    else:
        mode = "int8" if jax.default_backend() == "tpu" else "bf16"
    if mode not in ("int8", "bf16"):
        raise ValueError(f"unknown score quantization mode {mode!r}")
    return mode


# MAGNIFY_TPU_S2D is snapshotted at import: _resolve_s2d runs inside
# traced code, so a mid-process env change would apply to newly traced
# shapes while already-traced shapes kept the old fold — silently
# half-applied. Reading once makes the knob uniformly process-level (set
# it before importing magnify_tpu); per-call control is the explicit
# ``s2d=`` parameter, which jit treats as part of the trace.
_S2D_ENV = os.environ.get("MAGNIFY_TPU_S2D")


def _resolve_s2d(s2d, shape):
    """Space-to-depth fold for ``score_maps`` given the (padded) plane
    shape. MAGNIFY_TPU_S2D (read at import) overrides (1 disables the
    fold — the unfolded conv is the debugging reference)."""
    if s2d is not None:
        return s2d
    if _S2D_ENV:
        return int(_S2D_ENV)
    if jax.default_backend() == "tpu":
        return 16 if min(shape[-2:]) >= 512 else 8
    return 4


def _cs2_from_grads(dx, dy):
    """(cos(2a), sin(2a)) for a = arctan2(dy, dx) with NO transcendentals.

    Double-angle identities on the unit gradient direction: cos(2a) =
    (dx^2 - dy^2) / g^2 and sin(2a) = 2*dx*dy / g^2 with g^2 = dx^2 + dy^2.
    Zero-gradient pixels get the a = 0 values (1, 0) — exactly
    cos/sin(2*arctan2(0, 0)) — via a safe denominator (no NaN/inf is ever
    formed; those pixels are edge-masked to 0 downstream anyway). Replaces
    three full-plane transcendental passes (arctan2 + cos + sin) in the
    dense detector with a handful of VPU mults; the f32 rounding difference
    vs the transcendental route (~1e-7 relative) vanishes in the bf16 cast
    below.
    """
    g2 = dx * dx + dy * dy
    safe = jnp.where(g2 > 0, g2, 1.0)
    c1 = jnp.where(g2 > 0, (dx * dx - dy * dy) / safe, 1.0)
    s1 = jnp.where(g2 > 0, (2.0 * dx * dy) / safe, 0.0)
    return c1, s1


def _alignment_features(grad_angles, edges, grads=None, qdtype="bf16"):
    """Per-harmonic (edge*cos(2ka), edge*sin(2ka)) channel stack.

    ``grads=(dx, dy)`` supplies the gradient fields directly and skips the
    angle transcendentals entirely (``grad_angles`` may then be None).
    ``qdtype="int8"`` emits ``round(127 * feature)`` int8 values (the
    features live in [-1, 1]; a global 1/127 dequant factor is folded into
    the kernel scales) — one byte per element also halves the
    space-to-depth reshuffle traffic vs bf16.
    """
    e = edges.astype(jnp.float32)
    # Base cos/sin(2a) + a complex-product recurrence generate all
    # cos/sin(2ka) channels: cos(2(k+1)a) = cos(2ka)c1 - sin(2ka)s1 etc.
    # Saves 10 of 12 transcendental plane passes vs direct evaluation; the
    # recurrence's float32 rounding (~1e-6 relative at k=11) is far below
    # the bf16 cast downstream.
    if grads is not None:
        c1, s1 = _cs2_from_grads(grads[0], grads[1])
    else:
        c1 = jnp.cos(2.0 * grad_angles)
        s1 = jnp.sin(2.0 * grad_angles)
    feats = []
    ck, sk = c1, s1
    for k in range(1, max(_HARMONICS) + 1):
        if k in _HARMONICS:
            feats.append(e * ck)
            feats.append(e * sk)
        ck, sk = ck * c1 - sk * s1, sk * c1 + ck * s1
    # bf16 inputs halve MXU time; accumulation stays f32. The feature values
    # are in [-1, 1] and ring sums have ~L terms, so bf16's ~0.4% relative
    # error is far below the harmonic-truncation bound. Casting BEFORE the
    # space-to-depth transpose halves that reshuffle's HBM traffic.
    stacked = jnp.stack(feats)  # (C, Hp, Wp)
    if qdtype == "int8":
        return jnp.round(stacked * 127.0).astype(jnp.int8)
    return stacked.astype(jnp.bfloat16)


def score_maps_folded(grad_angles, edges, *, min_radius: int,
                      max_radius: int, s2d: int | None = None, grads=None,
                      qdtype: str | None = None):
    """Score maps in the space-to-depth FOLDED layout — no unfold transpose.

    Returns (folded, s) where ``folded`` has shape (n_radii * s * s, Hq, Wq)
    and ``folded[(ri*s + u)*s + v, qy, qx]`` is the score of radius
    ``min_radius + ri`` at padded-plane position ``(qy*s + u, qx*s + v)``
    (positions past the input extent carry garbage from the fold padding —
    callers must mask ``qy*s + u < Hp``/``qx*s + v < Wp``). Skipping the
    depth-to-space unfold keeps ~5 plane-sized transpose/copy passes out of
    the dense detector, whose thresholding and compaction are
    layout-agnostic (the survivor set and the (score, unfolded-index) sort
    keys are identical either way). ``s2d`` must resolve to > 1.

    ``edges``/``grads`` may carry a LEADING BATCH DIM ((B, Hp, Wp) inputs
    -> (B, n_radii * s * s, Hq, Wq) output): the conv then runs natively
    at N=B, which on v5e measures 1.34 ms/plane at B=16/1024^2 vs 2.19 for
    ``jax.vmap`` over the single-plane form (vmap's batched transposes and
    per-plane N=1 convs lower worse) and is byte-identical — int8 features
    and int32 accumulation make the maps exact in both shapes
    (scripts/batch_maps_experiment.py).
    """
    batched = edges.ndim == 3
    s2d = _resolve_s2d(s2d, edges.shape)
    if s2d <= 1:
        raise ValueError("score_maps_folded requires an s2d fold > 1")
    qmode = _resolve_qmode(qdtype)
    feats = _alignment_features(grad_angles, edges, grads=grads,
                                qdtype=qmode)  # (C, [B,] Hp, Wp)
    if batched:
        x4 = jnp.moveaxis(feats, 1, 0)  # (B, C, Hp, Wp)
    else:
        x4 = feats[None]
    b, c, hp, wp = x4.shape
    hpad = (-hp) % s2d
    wpad = (-wp) % s2d
    x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, hpad), (0, wpad)))
    hq, wq = (hp + hpad) // s2d, (wp + wpad) // s2d
    # Per-plane index mapping identical to _space_to_depth (channel
    # (c, u, v) -> c*s*s + u*s + v).
    x4 = x4.reshape(b, c, hq, s2d, wq, s2d)
    x = x4.transpose(0, 1, 3, 5, 2, 4).reshape(b, c * s2d * s2d, hq, wq)
    if qmode == "int8":
        qw, scale, q0 = _s2d_ring_kernel_q8(min_radius, max_radius, s2d)
        out = jax.lax.conv_general_dilated(
            x, jnp.asarray(qw), window_strides=(1, 1),
            padding="SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.int32,
        )
        dq = jnp.asarray(scale / (127.0 * 127.0))[None, :, None, None]
        out = out.astype(jnp.float32) * dq
    else:
        w2, q0 = _s2d_ring_kernel(min_radius, max_radius, s2d)
        out = jax.lax.conv_general_dilated(
            x, jnp.asarray(w2, jnp.bfloat16), window_strides=(1, 1),
            padding="SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )
    return (out if batched else out[0]), s2d


def score_maps(grad_angles, edges, *, min_radius: int, max_radius: int,
               s2d: int | None = None, grads=None,
               qdtype: str | None = None):
    """Roundness score for every (center, radius) as one MXU convolution.

    ``grad_angles``/``edges`` must be padded by 2*max_radius (the caller's
    existing contract). Returns (n_radii, Hp, Wp) float32 score maps indexed
    by [radius - min_radius, row + pad, col + pad]. Replaces the per-circle
    perimeter gathers of ``score_circles`` with dense convolutions — cost is
    independent of the candidate count and runs on the systolic array, with
    an s2d channel fold keeping the MXU wide. Default fold on TPU: 16 for
    large planes (12*256 -> 5*256 channels; measured 4.35 ms vs s2d=8's
    4.7 ms at 1024^2 on v5e), 8 below 512^2 where the 16-fold's collapsed
    spatial extent starves the MXU's M dimension; 4 elsewhere.

    Like :func:`score_maps_folded`, inputs may carry a LEADING BATCH DIM
    ((B, Hp, Wp) -> (B, n_radii, Hp, Wp)): the conv runs natively at N=B,
    which lowers far better than ``jax.vmap`` over the single-plane form.
    """
    batched = edges.ndim == 3  # (B, Hp, Wp) -> (B, n_radii, Hp, Wp)
    s2d = _resolve_s2d(s2d, edges.shape)
    hp, wp = edges.shape[-2:]

    if s2d > 1:
        folded, s2d = score_maps_folded(
            grad_angles, edges, min_radius=min_radius,
            max_radius=max_radius, s2d=s2d, grads=grads, qdtype=qdtype)
        if batched:
            maps = jax.vmap(lambda f: _depth_to_space(f, s2d))(folded)
            return maps[..., :hp, :wp]
        maps = _depth_to_space(folded, s2d)
        return maps[:, :hp, :wp]

    qmode = _resolve_qmode(qdtype)
    feats = _alignment_features(grad_angles, edges, grads=grads,
                                qdtype=qmode)
    x = jnp.moveaxis(feats, 1, 0) if batched else feats[None]
    if qmode == "int8":
        qk, scale = _ring_conv_kernel_q8(min_radius, max_radius)
        out = jax.lax.conv_general_dilated(
            x, jnp.asarray(qk), window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.int32,
        )
        dq = jnp.asarray(scale / (127.0 * 127.0))[None, :, None, None]
        out = out.astype(jnp.float32) * dq
    else:
        kernel = jnp.asarray(_ring_conv_kernel(min_radius, max_radius),
                             jnp.bfloat16)
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )
    return out if batched else out[0]


def gather_map_scores(maps, circles, valid, *, min_radius: int):
    """Read per-candidate scores out of the score maps.

    circles: int32 (N, 3) with row/col already shifted by the caller's pad.
    """
    n_radii, hp, wp = maps.shape
    r = jnp.clip(circles[:, 2] - min_radius, 0, n_radii - 1)
    row = jnp.clip(circles[:, 0], 0, hp - 1)
    col = jnp.clip(circles[:, 1], 0, wp - 1)
    flat = maps.reshape(-1)
    idx = (r * hp + row) * wp + col
    scores = flat[idx]
    return jnp.where(valid, scores, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("max_radius",))
def score_circles(grad_angles, edges, circles, valid, *, max_radius: int):
    """Roundness score per circle (reference mean_grad, utils.py:225-251).

    ``grad_angles``/``edges`` must already be padded by 2*max_radius on every
    side and ``circles`` shifted by that pad (mirroring utils.py:171-176).
    Returns float32 scores; invalid rows get -inf.
    """
    offsets, lengths, expected = perimeter_tables(max_radius)
    offsets = jnp.asarray(offsets)
    lengths = jnp.asarray(lengths)
    expected = jnp.asarray(expected)

    hp, wp = edges.shape
    angles_flat = grad_angles.reshape(-1)
    edges_flat = edges.reshape(-1).astype(jnp.float32)
    L = offsets.shape[1]
    pos = jnp.arange(L)

    def one(circle):
        r = jnp.clip(circle[2], 0, max_radius)
        offs = offsets[r]
        n = lengths[r]
        rows = offs[:, 0] + circle[0]
        cols = offs[:, 1] + circle[1]
        idx = jnp.clip(rows * wp + cols, 0, hp * wp - 1)
        actual = angles_flat[idx]
        hit = edges_flat[idx]
        diff = jnp.abs(actual - expected[r])
        diff = jnp.where(diff > jnp.pi, diff - jnp.pi, diff)
        align = 4.0 * jnp.abs(diff - jnp.pi / 2.0) / jnp.pi - 1.0
        live = (pos < n).astype(jnp.float32)
        return jnp.sum(align * hit * live) / n.astype(jnp.float32)

    scores = jax.vmap(one)(circles)
    return jnp.where(valid, scores, -jnp.inf)
