"""
Pallas TPU kernel for the windowed regrid apply (weighted mean).

The XLA path gathers source rows from HBM per (target, window) pair.
This kernel exploits spatial locality instead: targets come in Hilbert/
raster order, so each block of targets reads a *contiguous* source
range.  The kernel DMAs that range into VMEM in (SUB, E) slabs and
resolves the window gathers locally as one-hot matmuls on the MXU — HBM
sees only streaming reads.

The slab loop is *dynamic per block*: each block only pays for
``ceil(span_b / SUB)`` DMA+matmul steps, where ``span_b`` is the actual
index span of its windows, not the worst-case span across all blocks.

Requirements (validated by ``plan_spans``): per-block spans bounded by
``max_tile``.  Plans violating the bound fall back to the XLA kernel
(apply.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: rows per VMEM slab DMA (1 MB at E=128 f32): large enough to amortize
#: DMA issue cost, small enough that partially-used final slabs are cheap.
SUB = 2048


def plan_spans(indices: np.ndarray, block: int):
    """
    Per-block source windows for the tiled kernel.

    Returns (starts (n_blocks,) i32, spans (n_blocks,) i64): the minimum
    source index and the span (max - min + 1, 0 for empty blocks) of
    every block of ``block`` consecutive target rows.
    """
    n = len(indices)
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    idx = indices
    if pad:
        idx = np.concatenate(
            [indices, np.full((pad, indices.shape[1]), -1, indices.dtype)]
        )
    grouped = idx.reshape(n_blocks, block, idx.shape[1])
    valid = grouped >= 0
    big = np.where(valid, grouped, np.iinfo(np.int32).max)
    small = np.where(valid, grouped, np.iinfo(np.int32).min)
    lo = big.reshape(n_blocks, -1).min(axis=1)
    hi = small.reshape(n_blocks, -1).max(axis=1)
    empty = lo > hi
    lo = np.where(empty, 0, lo)
    span = np.where(empty, 0, hi - lo + 1)
    return lo.astype(np.int32), span.astype(np.int64)


def plan_blocks(indices: np.ndarray, block: int, tile: int):
    """
    (starts, ok): slab offsets, and whether every block's window span
    fits within ``tile`` (fall back to the XLA path otherwise).
    """
    starts, spans = plan_spans(indices, block)
    return starts, bool((spans <= tile).all())


def plan_auto(indices: np.ndarray, block: int = 512, max_tile: int = 16384):
    """
    Plan the dynamic slab loop: (starts, n_subs, w_counts) with per-block
    sub-tile counts ``ceil(span / SUB)`` and per-block window-length
    bounds, or None when any span exceeds ``max_tile`` (poor source
    locality — use the XLA path instead).
    """
    n = len(indices)
    if n == 0:
        return None
    starts, spans = plan_spans(indices, block)
    if int(spans.max()) > max_tile:
        return None
    n_subs = -(-spans // SUB)
    # Per-block bound on the number of valid window slots: rows are CSR
    # windows (-1 padded on the right), so the count is the max row
    # length within the block.
    n_blocks = len(starts)
    pad = n_blocks * block - n
    idx = indices
    if pad:
        idx = np.concatenate(
            [indices, np.full((pad, indices.shape[1]), -1, indices.dtype)]
        )
    lengths = (idx >= 0).sum(axis=1).reshape(n_blocks, block)
    w_counts = np.maximum(lengths.max(axis=1), 1)
    return starts, n_subs.astype(np.int32), w_counts.astype(np.int32)


def _kernel(starts_ref, n_subs_ref, w_counts_ref, idx_ref, w_ref, source_hbm,
            out_ref, sub_vmem, sem):
    b = pl.program_id(0)
    start = starts_ref[b]
    n_sub = n_subs_ref[b]
    del w_counts_ref  # see NOTE below: per-block window bounds unused

    idx = idx_ref[...]  # (block, w)
    wts = w_ref[...]
    valid = idx >= 0
    local = jnp.where(valid, idx - start, -1)
    masked_w = jnp.where(valid, wts, 0.0)

    block, w = idx.shape
    sub, E = sub_vmem.shape
    den = jnp.sum(masked_w, axis=1, keepdims=True)

    # Mosaic has no general VMEM gather; instead fold the window into a
    # weighted scatter matrix and resolve it on the MXU:
    #   wmat[t, s] = sum_j wts[t, j] * (local[t, j] - s0 == s)
    #   num += wmat @ slab        (block, sub) x (sub, E)
    # Duplicate indices within a window accumulate their weights, which
    # is exactly the weighted-sum semantics.  The slab loop is dynamic:
    # each block covers only its actual source span.
    iota = jax.lax.broadcasted_iota(jnp.int32, (block, sub), 1)

    def body(k, num):
        s0 = k * sub
        dma = pltpu.make_async_copy(
            source_hbm.at[pl.ds(start + s0, sub)], sub_vmem, sem
        )
        dma.start()
        dma.wait()

        # NOTE: a dynamic per-block window bound (fori over j) is not
        # currently lowerable - Mosaic has no dynamic_slice on the minor
        # axis of a VMEM array - so the window loop stays statically
        # unrolled to the global w_max.
        wmat = jnp.zeros((block, sub), dtype=jnp.float32)
        for j in range(w):
            hit = iota == (local[:, j][:, None] - s0)
            wmat = wmat + jnp.where(hit, masked_w[:, j][:, None], 0.0)
        return num + jax.lax.dot_general(
            wmat,
            sub_vmem[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    num = jax.lax.fori_loop(
        0, n_sub, body, jnp.zeros((block, E), dtype=jnp.float32)
    )
    # Empty windows produce NaN, matching reduce.mean semantics.
    out_ref[...] = jnp.where(
        den > 0.0, num / jnp.where(den == 0.0, 1.0, den), jnp.nan
    )


@partial(jax.jit, static_argnums=(6,), static_argnames=("interpret",))
def pallas_windowed_mean(
    sourceT, indices, weights, starts, n_subs, w_counts, block: int,
    interpret=False,
):
    """
    sourceT: (m_padded, E) f32; indices/weights: (n_padded, w);
    starts/n_subs/w_counts: (n_blocks,) i32 slab offsets, slab counts,
    and window-length bounds.  n_padded = n_blocks * block; m_padded
    must allow reading [start, start + n_sub * SUB) for every block.
    Returns (n_padded, E).
    """
    n_padded = indices.shape[0]
    n_blocks = n_padded // block
    E = sourceT.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (block, indices.shape[1]), lambda b, *_: (b, 0)
            ),
            pl.BlockSpec(
                (block, weights.shape[1]), lambda b, *_: (b, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block, E), lambda b, *_: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((SUB, E), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_padded, E), jnp.float32),
        # The default 16 MB scoped-VMEM budget is conservative; the slab
        # plus per-sub-tile one-hot matrices fit comfortably in the
        # 128 MB VMEM of a v5e core.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(starts, n_subs, w_counts, indices, weights, sourceT)


def pad_for_plan(sourceT: np.ndarray, starts: np.ndarray, n_subs: np.ndarray):
    """Pad sourceT so every block's slab reads stay in bounds and the
    minor dim is 128-lane aligned (Mosaic DMA requirement)."""
    m, E = sourceT.shape
    E_pad = -(-E // 128) * 128
    ends = starts.astype(np.int64) + n_subs.astype(np.int64) * SUB
    m_needed = max(m, int(ends.max()) if len(ends) else m)
    if m_needed > m or E_pad > E:
        padded = np.zeros((m_needed, E_pad), dtype=np.float32)
        padded[:m, :E] = sourceT
        return padded
    return sourceT.astype(np.float32, copy=False)


def apply_windowed_mean_pallas(
    sourceT: np.ndarray,
    indices: np.ndarray,
    weights: np.ndarray,
    block: int = 512,
    tile: int | None = None,
    interpret: bool = False,
):
    """
    Host wrapper: pads, plans slabs, runs the kernel.  ``tile`` bounds
    the acceptable per-block span (default 16384).  Returns None when
    the block-span precondition fails (caller falls back to XLA).
    """
    plan = plan_auto(indices, block, max_tile=tile or 16384)
    if plan is None:
        return None
    starts, n_subs, w_counts = plan
    n = indices.shape[0]
    n_blocks = len(starts)
    n_pad = n_blocks * block - n
    if n_pad:
        indices = np.concatenate(
            [indices, np.full((n_pad, indices.shape[1]), -1, indices.dtype)]
        )
        weights = np.concatenate(
            [weights, np.zeros((n_pad, weights.shape[1]), weights.dtype)]
        )
    E = sourceT.shape[1]
    padded = pad_for_plan(sourceT, starts, n_subs)
    out = pallas_windowed_mean(
        jnp.asarray(padded.astype(np.float32, copy=False)),
        jnp.asarray(indices.astype(np.int32)),
        jnp.asarray(weights.astype(np.float32)),
        jnp.asarray(starts),
        jnp.asarray(n_subs),
        jnp.asarray(w_counts),
        block,
        interpret=interpret,
    )
    return np.asarray(out)[:n, :E]
