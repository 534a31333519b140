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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["hysteresis", "pallas_preferred", "pallas_supported"]

# Import-time snapshot (trace-time reads bake per shape; see ops/edge.py).
_PALLAS_ENV = os.environ.get("MAGNIFY_TPU_PALLAS", "1")

# Whole-plane kernel ceiling: the loop keeps cur/weak plus a few shift
# temps live as int32 vectors (Mosaic's dynamic_rotate has no 8-bit path);
# a raised vmem_limit_bytes covers ~8 resident 4MB buffers for a 1024^2
# plane on v5e. Above this the tiled kernel takes over.
_MAX_VMEM_ELEMENTS = 1024 * 1024

# Tiled kernel: VMEM bytes budgeted per scratch block (cur + weak each).
# The doubling-reach body keeps ~2 live block temps per direction pass, so
# 2MB blocks keep the kernel's scoped VMEM well inside the 100MB limit
# (4MB blocks were measured to OOM at 110MB on v5e).
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


def pallas_preferred(shape) -> bool:
    """Whether the Pallas kernel should be the default for this plane.

    Planes that fit VMEM: yes — the whole-plane kernel wins clearly
    (round-2 measurements). Larger planes: the tiled kernel is exact and
    VMEM-frugal but measured slightly SLOWER than XLA's fused dilate
    fixpoint on axon v5e (49-56ms vs 36ms at 4096^2 on a long-chain
    torture mask; the per-iteration HBM traffic XLA pays is not the
    bottleneck at these sizes, while the tiled sweeps pay per-block DMA
    latency). Opt in with MAGNIFY_TPU_PALLAS=tiled (read at import — this
    predicate runs at trace time inside the jitted detection stages, so a
    per-call env read would bake per shape; see the note in ops/edge.py).
    """
    h, w = shape
    if not pallas_supported(shape):
        return False
    if h * w <= _MAX_VMEM_ELEMENTS:
        return True
    return _PALLAS_ENV == "tiled"


def _border_masks(shape):
    """Loop-invariant zero-fill masks for the separable 3x3 max: whether the
    +1/-1 rolled neighbor along each axis is a real pixel (not a wrap)."""
    h, w = shape
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return rows < h - 1, rows >= 1, cols < w - 1, cols >= 1


def _max3x3(x, masks):
    """8-neighbor max (zero border) as two separable 3-tap max passes.

    A 3x3 window max is max_cols(max_rows(x)): 4 rolls + 4 selects + 4
    maxes, vs the naive 8-shift form's 12 rolls (diagonals pay two) with
    per-shift border masking rebuilt from iota every call. Measured on v5e
    at 1024^2 (noisy bench fixture, chained harness): the Canny NMS +
    hysteresis bin went 0.72 -> 0.27 ms (~2.9x on the fixpoint loop), the
    whole edge stack 0.85 -> 0.52 ms, packed detection rows byte-identical
    to the XLA dilate-fixpoint oracle.
    """
    h, w = x.shape
    ok_dn, ok_up, ok_r, ok_l = masks
    dn = jnp.where(ok_dn, pltpu.roll(x, h - 1, axis=0), 0)  # out[i] = x[i+1]
    up = jnp.where(ok_up, pltpu.roll(x, 1, axis=0), 0)  # out[i] = x[i-1]
    v = jnp.maximum(x, jnp.maximum(dn, up))
    r = jnp.where(ok_r, pltpu.roll(v, w - 1, axis=1), 0)
    l = jnp.where(ok_l, pltpu.roll(v, 1, axis=1), 0)
    return jnp.maximum(v, jnp.maximum(r, l))


def _hysteresis_kernel(strong_ref, weak_ref, out_ref):
    weak = weak_ref[:]
    cur = strong_ref[:]
    masks = _border_masks(cur.shape)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        cur, _ = state
        grown = jnp.where(weak > 0, _max3x3(cur, masks), 0)
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


# Guard rows above/below each block window: 8 keeps every DMA offset and
# slice size aligned to the (8, 128) int32 VMEM tiling Mosaic requires.
_GUARD = 8

def _tiled_hysteresis_kernel(cur_in, weak_in, out, curv, weakv, dirty,
                             progressed, sems, *, tile_rows: int,
                             n_blocks: int):
    """Serpentine tiled hysteresis over an HBM-resident plane.

    ``out`` aliases ``cur_in`` (the padded state, ``_GUARD`` zero rows on
    each side). The single-core grid is replaced by in-kernel loops: each
    block of ``tile_rows`` rows (plus guard-row halos) is DMA'd into VMEM,
    grown to a LOCAL fixpoint (halo rows act as fixed seeds), and written
    back. Alternating down/up sweeps propagate chains across blocks; a
    per-block dirty worklist (SMEM) skips blocks whose neighborhood hasn't
    changed since they last converged, so late sweeps only touch the
    frontier. Terminates when no block is dirty — the same least fixpoint
    as the whole-plane dilation (growth is monotone, so stale halo state
    only delays, never corrupts).
    """
    th = tile_rows
    g = _GUARD
    rows = jax.lax.broadcasted_iota(jnp.int32, curv.shape, 0)
    interior = (rows >= g) & (rows < g + th)
    blk_masks = _border_masks(curv.shape)

    def process(idx):
        """Runs under pl.when(is_dirty); communicates via the dirty array
        (unconditional SMEM arithmetic — data-dependent control flow here
        multiplies Mosaic compile time)."""
        cp = pltpu.make_async_copy(out.at[pl.ds(idx * th, th + 2 * g)], curv,
                                   sems.at[0])
        cp.start()
        wp = pltpu.make_async_copy(weak_in.at[pl.ds(idx * th, th + 2 * g)],
                                   weakv, sems.at[1])
        wp.start()
        cp.wait()
        wp.wait()
        blk0 = curv[:]
        wk = weakv[:]

        # Plain 8-neighbor dilation to local fixpoint. (A run-doubling
        # reach body — seeds jumping 2^k cells along all-weak paths — was
        # prototyped and is oracle-exact, but its larger unrolled body
        # multiplies Mosaic compile time past practicality on v5e; the
        # dilation body compiles in seconds and the worklist already skips
        # converged blocks.)
        def lcond(state):
            return state[1]

        def lbody(state):
            cur, _ = state
            grown = jnp.where(wk > 0, _max3x3(cur, blk_masks), 0)
            grown = jnp.maximum(grown, cur)
            # Halo rows belong to neighbor blocks: fixed seeds here.
            grown = jnp.where(interior, grown, blk0)
            return grown, jnp.any(grown != cur)

        final, _ = jax.lax.while_loop(lcond, lbody,
                                      (blk0, jnp.asarray(True)))
        changed = jnp.any(final != blk0).astype(jnp.int32)
        curv[:] = final
        # Unconditional write-back: rewriting an unchanged block is cheaper
        # than a predicated DMA region.
        st = pltpu.make_async_copy(curv.at[pl.ds(g, th)],
                                   out.at[pl.ds(idx * th + g, th)],
                                   sems.at[0])
        st.start()
        st.wait()
        # Growth may now cross into the neighbors: re-mark them (clamped
        # indices make the edge blocks self-mark once; one extra no-change
        # fixpoint, still correct).
        if n_blocks > 1:
            up = jnp.maximum(idx - 1, 0)
            dn = jnp.minimum(idx + 1, n_blocks - 1)
            dirty[up] = jnp.maximum(dirty[up], changed)
            dirty[dn] = jnp.maximum(dirty[dn], changed)
        progressed[0] = progressed[0] + changed

    def sweep(reverse: bool):
        def body(i, _):
            idx = (n_blocks - 1 - i) if reverse else i
            is_dirty = dirty[idx] > 0
            # Clear before processing: process() re-marks on change.
            dirty[idx] = 0

            @pl.when(is_dirty)
            def _():
                process(idx)

            return 0

        return jax.lax.fori_loop(0, n_blocks, body, 0)

    def ocond(ch):
        return ch > 0

    def obody(_ch):
        progressed[0] = 0
        sweep(False)
        sweep(True)
        return progressed[0]

    # Every block starts dirty.
    def init(i, _):
        dirty[i] = 1
        return 0

    jax.lax.fori_loop(0, n_blocks, init, 0)
    jax.lax.while_loop(ocond, obody, jnp.int32(1))


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def _hysteresis_tiled_call(strong, weak, tile_rows: int, interpret: bool):
    if tile_rows % _GUARD:
        raise ValueError(f"tile_rows must be a multiple of {_GUARD}")
    h, w = strong.shape
    g = _GUARD
    wp = -(-w // 128) * 128
    n_blocks = -(-h // tile_rows)
    hp = n_blocks * tile_rows
    # _GUARD zero rows top and bottom make every block's (th + 2g)-row DMA
    # window uniform and 8-aligned; guard/pad pixels have weak == 0 so they
    # never grow.
    s = jnp.zeros((hp + 2 * g, wp), jnp.int32)
    s = s.at[g:g + h, :w].set(strong.astype(jnp.int32))
    wk = jnp.zeros((hp + 2 * g, wp), jnp.int32)
    wk = wk.at[g:g + h, :w].set(weak.astype(jnp.int32))
    out = pl.pallas_call(
        functools.partial(_tiled_hysteresis_kernel, tile_rows=tile_rows,
                          n_blocks=n_blocks),
        out_shape=jax.ShapeDtypeStruct((hp + 2 * g, wp), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((tile_rows + 2 * g, wp), jnp.int32),
            pltpu.VMEM((tile_rows + 2 * g, wp), jnp.int32),
            pltpu.SMEM((n_blocks,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(s, wk)
    return out[g:g + h, :w]


def hysteresis(strong, weak, tile_rows: int | None = None):
    """Grow strong seeds through weak pixels (8-connectivity) to fixpoint.

    Drop-in replacement for the XLA while_loop in
    :func:`magnify_tpu.ops.edge.canny`. Planes that fit VMEM run the
    whole-plane kernel (both masks resident for the entire loop); larger
    planes run the serpentine tiled kernel, which keeps per-iteration
    traffic in VMEM and touches HBM once per block per sweep. Falls back
    to interpreter mode off-TPU so tests cover the same kernels.
    ``tile_rows`` overrides the block height (tests use tiny blocks to
    exercise multi-block sweeps on small planes).
    """
    interpret = jax.default_backend() != "tpu"
    h, w = strong.shape
    if tile_rows is None and h * w <= _MAX_VMEM_ELEMENTS:
        return _hysteresis_call(strong, weak, interpret) > 0
    if tile_rows is None:
        tile_rows = _tile_rows_for_width(-(-w // 128) * 128)
    return _hysteresis_tiled_call(strong, weak, int(tile_rows),
                                  interpret) > 0
