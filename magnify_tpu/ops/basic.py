"""BaSiC-style retrospective shading estimation in JAX.

The model behind the reference's ``basic_correct`` component (reference
preprocess.py:91-115, wrapping basicpy; Peng et al. 2017): a stack of
same-channel tiles is decomposed as

    I_i(x)  ~=  b_i * S(x) + D(x) + R_i(x)

with S the multiplicative flatfield, D the additive darkfield, b_i a
per-image baseline (the rank-1 "low-rank" term), and R_i a robust residual
(image content). Smoothness of S and D is imposed the BaSiC way — sparsity
of their DCT coefficients — and robustness to content via iteratively
reweighted least squares (the IRLS counterpart of basicpy's weighted-L1
objective).

Solver: proximal alternating minimization, fully jitted. Each inner
iteration takes closed-form baseline updates and ISTA steps on S and D
(gradient of the weighted data term, then soft-thresholding in the DCT
domain); the outer loop re-derives the IRLS weights from the residual.
Everything runs at BaSiC's working resolution (128x128; DCTs are two
128x128 matmuls, MXU-friendly) and the fitted fields are resized back to
tile resolution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fit_basic", "basic_transform"]

WORKING_SIZE = 128


@functools.lru_cache(maxsize=2)
def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix C: dct2(X) = C @ X @ C.T."""
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    c = np.cos(np.pi * (x + 0.5) * k / n) * np.sqrt(2.0 / n)
    c[0] /= np.sqrt(2.0)
    return c


def _dct2(x, c):
    return c @ x @ c.T


def _idct2(x, c):
    return c.T @ x @ c


def _shrink_dct(x, thresh, c):
    """Proximal operator of thresh * ||DCT(x)||_1 (orthonormal DCT)."""
    coef = _dct2(x, c)
    coef = jnp.sign(coef) * jnp.maximum(jnp.abs(coef) - thresh, 0.0)
    return _idct2(coef, c)


@functools.partial(
    jax.jit,
    static_argnames=("get_darkfield", "max_iters", "reweight_iters"),
)
def _fit_basic_working(stack, smooth_flat, smooth_dark, *,
                       get_darkfield: bool, max_iters: int,
                       reweight_iters: int):
    """Fit (S, D, b) on the working-resolution stack (n, w, w), mean ~1.

    Identifiability note: with rank-1 content the decomposition carries an
    exact gauge freedom (b_i, S, D) -> (b_i - c, S, D + c*S); every BaSiC
    implementation picks a convention, and the correction
    (I - D)/S is gauge-invariant (the ambiguity only shifts per-image
    brightness by a constant). Here the gauge is pinned by the per-image
    median baselines the alternation starts from.
    """
    n, w, _ = stack.shape
    c = jnp.asarray(_dct_matrix(w), jnp.float32)

    # Baselines pinned from robust per-image levels (the gauge fix): the
    # pixelwise regression below then identifies S (slope) and D
    # (intercept) exactly when baselines vary across the stack.
    b0 = jnp.median(stack.reshape(n, -1), axis=1)
    b0 = b0 / jnp.maximum(b0.mean(), 1e-6)
    s0 = jnp.maximum(stack.mean(axis=0), 0.05)
    d0 = jnp.zeros((w, w), jnp.float32)
    # Robust initial weights from the rank-1 init residual, so content
    # never contaminates the first solve.
    r0 = stack - b0[:, None, None] * s0[None]
    sc0 = jnp.maximum(jnp.abs(r0).mean(), 1e-6)
    w0 = 1.0 / (jnp.abs(r0) / sc0 + 0.1)
    w0 = w0 / w0.mean()

    # DCT thresholds: basicpy scales its smoothness knobs by the data's
    # magnitude; with the stack normalized to mean ~1 a fixed scaling works
    # across inputs. The darkfield is the weaker signal, so its threshold
    # rides a separate knob.
    lam_s = smooth_flat * 1e-3
    lam_d = smooth_dark * 1e-3

    def solve_fields(b, wgt):
        """Exact per-pixel weighted regression of I_i(x) on b_i:
        slope = S(x), intercept = D(x) — 2x2 normal equations."""
        bw = b[:, None, None]
        sw = wgt.sum(axis=0)
        swb = (wgt * bw).sum(axis=0)
        swbb = (wgt * bw * bw).sum(axis=0)
        swi = (wgt * stack).sum(axis=0)
        swbi = (wgt * bw * stack).sum(axis=0)
        if get_darkfield:
            det = swbb * sw - swb * swb
            det = jnp.where(jnp.abs(det) < 1e-8, 1e-8, det)
            s = (sw * swbi - swb * swi) / det
            d = (swbb * swi - swb * swbi) / det
        else:
            s = swbi / jnp.maximum(swbb, 1e-8)
            d = jnp.zeros_like(s)
        return s, d

    def outer(carry, do_reweight):
        s, d, b, wgt = carry
        s, d = solve_fields(b, wgt)
        # Proximal smoothing: soft-threshold the fields' DCT coefficients
        # (BaSiC's smoothness-as-DCT-sparsity), which also scrubs any
        # content leakage (high-frequency, spread thin across coefficients).
        s = jnp.maximum(_shrink_dct(s, lam_s, c), 0.05)
        if get_darkfield:
            d = _shrink_dct(d, lam_d, c)
        # Refit baselines against the smoothed fields (closed-form weighted
        # LS) — keeps b consistent as S/D converge; the robust weights and
        # the pinned start keep the gauge from drifting.
        num = (wgt * (stack - d[None]) * s[None]).sum(axis=(1, 2))
        den = (wgt * (s * s)[None]).sum(axis=(1, 2))
        b = jnp.maximum(num / jnp.maximum(den, 1e-6), 1e-3)
        # IRLS reweighting (basicpy epsilon=0.1): pixels the rank-1 model
        # explains poorly (image content) lose influence. Only on the
        # reweight_iters scheduled rounds; the other iterations refine
        # (solve + prox + baseline) under the current weights.
        resid = stack - b[:, None, None] * s[None] - d[None]
        scale = jnp.maximum(jnp.abs(resid).mean(), 1e-6)
        new_wgt = 1.0 / (jnp.abs(resid) / scale + 0.1)
        wgt = jnp.where(do_reweight, new_wgt / new_wgt.mean(), wgt)
        return (s, d, b, wgt), None

    # max_iters is the TOTAL solver iteration count (basicpy's knob);
    # reweight_iters rounds of them (evenly spaced, starting at iteration
    # 0) refresh the IRLS weights.
    total = max(int(max_iters), 1)
    n_rw = max(min(int(reweight_iters), total), 1)
    rw_at = np.zeros(total, bool)
    rw_at[np.round(np.linspace(0, total - 1, n_rw)).astype(int)] = True
    (s, d, b, _), _ = jax.lax.scan(
        outer, (s0, d0, b0, w0), jnp.asarray(rw_at))

    # basicpy convention: flatfield normalized to unit mean; the scale
    # folds into the baselines.
    s_mean = jnp.maximum(s.mean(), 1e-6)
    return s / s_mean, d, b * s_mean


def fit_basic(images: np.ndarray, get_darkfield: bool = True,
              smoothness_flatfield: float = 1.0,
              smoothness_darkfield: float = 3.0,
              max_iters: int = 40, reweight_iters: int = 8):
    """Fit flatfield/darkfield on a stack of same-channel tiles.

    Drop-in for ``basicpy.BaSiC(get_darkfield=..., smoothness_flatfield=...)
    .fit`` as used by the reference (preprocess.py:98-100): ``images`` is
    (n_tiles, h, w); returns (flatfield (h, w) float32 with mean 1,
    darkfield (h, w) float32) at full tile resolution.

    ``max_iters`` is the total solver iteration count; ``reweight_iters``
    of those rounds (evenly spaced) refresh the IRLS robustness weights —
    the same split of meanings as basicpy's knobs.
    """
    images = np.asarray(images, np.float32)
    n, h, w = images.shape
    work = jax.image.resize(jnp.asarray(images),
                            (n, WORKING_SIZE, WORKING_SIZE), method="linear")
    # Normalize to mean ~1 so the regularization scaling is input-invariant.
    scale = float(np.maximum(images.mean(), 1e-6))
    s, d, _b = _fit_basic_working(
        work / scale, float(smoothness_flatfield),
        float(smoothness_darkfield), get_darkfield=bool(get_darkfield),
        max_iters=int(max_iters), reweight_iters=int(reweight_iters),
    )
    flat = jax.image.resize(s, (h, w), method="linear")
    dark = jax.image.resize(d * scale, (h, w), method="linear")
    if not get_darkfield:
        dark = jnp.zeros_like(dark)
    return np.asarray(flat, np.float32), np.asarray(dark, np.float32)


def basic_transform(images: np.ndarray, flatfield: np.ndarray,
                    darkfield: np.ndarray) -> np.ndarray:
    """Apply the correction the way basicpy's ``transform`` does:
    (image - darkfield) / flatfield."""
    return (np.asarray(images, np.float32) - darkfield) / flatfield
