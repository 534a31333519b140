"""Pallas TPU kernels for ops where XLA's schedule leaves time on the table.

Currently: Canny hysteresis. XLA lowers the dilate-until-fixpoint loop with
its carry in HBM, paying ~16MB of HBM traffic per iteration; edge chains in
microscopy images commonly need tens of iterations. The Pallas kernel keeps
the strong/weak masks resident in VMEM for the whole loop, so each iteration
is pure VPU work.

Kernels run compiled on TPU and in interpreter mode elsewhere, so the same
code path is exercised by the CPU test suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["hysteresis", "pallas_supported"]

# Whole-plane kernel ceiling: the loop keeps cur/weak plus a few shift
# temps live as int32 vectors (Mosaic's dynamic_rotate has no 8-bit path);
# a raised vmem_limit_bytes covers ~8 resident 4MB buffers for a 1024^2
# plane on v5e. Above this the tiled kernel takes over.
_MAX_VMEM_ELEMENTS = 1024 * 1024

# Tiled kernel: VMEM bytes budgeted per scratch block (cur + weak each).
_TILE_BUDGET_BYTES = 2 * 1024 * 1024
_MIN_TILE_ROWS = 8


def _tile_rows_for_width(wp: int) -> int:
    """Rows per VMEM block for a padded width ``wp`` (multiple of 8)."""
    th = _TILE_BUDGET_BYTES // (wp * 4) - 2
    return max(_MIN_TILE_ROWS, min(256, (th // 8) * 8))


def pallas_supported(shape) -> bool:
    h, w = shape
    if h < 8 or w < 128:
        return False
    if h * w <= _MAX_VMEM_ELEMENTS:
        return True
    # Tiled path: needs at least the minimum block rows to fit the budget.
    wp = -(-w // 128) * 128
    return _TILE_BUDGET_BYTES // (wp * 4) - 2 >= _MIN_TILE_ROWS


def _shift_zero(x, dr: int, dc: int):
    """Shift with zero fill using (non-negative) roll + edge masking."""
    h, w = x.shape
    out = pltpu.roll(x, (-dr) % h, axis=0) if dr else x
    out = pltpu.roll(out, (-dc) % w, axis=1) if dc else out
    if dr:
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        valid = rows < h - dr if dr > 0 else rows >= -dr
        out = jnp.where(valid, out, 0)
    if dc:
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        valid = cols < w - dc if dc > 0 else cols >= -dc
        out = jnp.where(valid, out, 0)
    return out


def _hysteresis_kernel(strong_ref, weak_ref, out_ref):
    weak = weak_ref[:]
    cur = strong_ref[:]

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        cur, _ = state
        acc = cur
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                acc = jnp.maximum(acc, _shift_zero(cur, dr, dc))
        grown = jnp.where(weak > 0, acc, 0)
        grown = jnp.maximum(grown, cur)
        changed = jnp.any(grown != cur)
        return grown, changed

    final, _ = jax.lax.while_loop(cond, body, (cur, jnp.asarray(True)))
    out_ref[:] = final


@functools.partial(jax.jit, static_argnames=("interpret",))
def _hysteresis_call(strong, weak, interpret: bool):
    h, w = strong.shape
    return pl.pallas_call(
        _hysteresis_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(strong.astype(jnp.int32), weak.astype(jnp.int32))


def hysteresis(strong, weak):
    """Grow strong seeds through weak pixels (8-connectivity) to fixpoint.

    Drop-in replacement for the XLA while_loop in
    :func:`magnify_tpu.ops.edge.canny`; both masks stay in VMEM for the whole
    iteration. Falls back to interpreter mode off-TPU so tests cover the same
    kernel.
    """
    interpret = jax.default_backend() != "tpu"
    return _hysteresis_call(strong, weak, interpret) > 0
