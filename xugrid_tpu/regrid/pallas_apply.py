"""
Pallas TPU kernel for the windowed regrid apply (weighted mean).

The XLA path gathers source rows from HBM per (target, window) pair.
This kernel exploits spatial locality instead: targets come in Hilbert/
raster order, so each block of targets reads a *contiguous* source
range.  Per grid step it DMAs that (TILE, E) source slab into VMEM once
and resolves the window gathers locally against the slab — HBM sees
only streaming reads.

Requirements (validated by ``plan_blocks``): within each target block,
``max(idx) - min(idx) < TILE``.  Blocks violating the span bound fall
back to the XLA kernel (apply.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def plan_blocks(indices: np.ndarray, block: int, tile: int):
    """
    Compute per-block source offsets for the tiled kernel.

    Returns (starts (n_blocks,), ok) where ok is False when any block's
    window span exceeds the tile size (fall back to the XLA path).
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
    hi = np.where(empty, 0, hi)
    ok = bool(((hi - lo) < tile).all())
    return lo.astype(np.int32), ok


def plan_auto(indices: np.ndarray, block: int = 512, max_tile: int = 16384):
    """
    Pick the smallest power-of-two tile that covers every block's window
    span.  Returns (starts, tile) or None when the spans exceed
    ``max_tile`` (poor source locality — use the XLA path instead).
    """
    n = len(indices)
    if n == 0:
        return None
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
    hi = np.where(empty, 0, hi)
    span = int((hi - lo).max()) + 1
    tile = max(1024, 1 << int(np.ceil(np.log2(span))))
    if tile > max_tile:
        return None
    return lo.astype(np.int32), tile


def _kernel(starts_ref, idx_ref, w_ref, source_hbm, out_ref, tile_vmem, sem):
    b = pl.program_id(0)
    start = starts_ref[b]
    # DMA the contiguous source slab for this block into VMEM.
    dma = pltpu.make_async_copy(
        source_hbm.at[pl.ds(start, tile_vmem.shape[0])], tile_vmem, sem
    )
    dma.start()
    dma.wait()

    idx = idx_ref[...]  # (block, w)
    wts = w_ref[...]
    valid = idx >= 0
    local = jnp.where(valid, idx - start, -1)

    block, w = idx.shape
    tile = tile_vmem.shape[0]
    E = tile_vmem.shape[1]
    # Mosaic has no general VMEM gather; instead fold the window into a
    # weighted scatter matrix and resolve it on the MXU:
    #   wmat[t, s] = sum_j wts[t, j] * (local[t, j] == s)
    #   num = wmat @ slab        (block, tile) x (tile, E)
    # Duplicate indices within a window accumulate their weights, which
    # is exactly the weighted-sum semantics.  The matmul runs in
    # sub-tiles so the (block, sub) one-hot matrix stays within the
    # scoped-VMEM budget regardless of the slab size.
    sub = min(tile, 2048)
    den = jnp.zeros((block, 1), dtype=jnp.float32)
    for j in range(w):
        den = den + jnp.where(valid[:, j], wts[:, j], 0.0)[:, None]
    num = jnp.zeros((block, E), dtype=jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (block, sub), 1)
    for s0 in range(0, tile, sub):
        wmat = jnp.zeros((block, sub), dtype=jnp.float32)
        for j in range(w):
            wj = jnp.where(valid[:, j], wts[:, j], 0.0)[:, None]
            hit = iota == (local[:, j][:, None] - s0)
            wmat = wmat + jnp.where(hit, wj, 0.0)
        num = num + jax.lax.dot_general(
            wmat,
            tile_vmem[s0 : s0 + sub, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    # Empty windows produce NaN, matching reduce.mean semantics.
    out_ref[...] = jnp.where(
        den > 0.0, num / jnp.where(den == 0.0, 1.0, den), jnp.nan
    )


@partial(jax.jit, static_argnums=(4, 5), static_argnames=("interpret",))
def pallas_windowed_mean(
    sourceT, indices, weights, starts, block: int, tile: int, interpret=False
):
    """
    sourceT: (m_padded, E) f32; indices/weights: (n_padded, w);
    starts: (n_blocks,) i32 slab offsets.  n_padded = n_blocks * block;
    m_padded must allow reading [start, start + tile).
    Returns (n_padded, E).
    """
    n_padded = indices.shape[0]
    n_blocks = n_padded // block
    E = sourceT.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (block, indices.shape[1]), lambda b, starts: (b, 0)
            ),
            pl.BlockSpec(
                (block, weights.shape[1]), lambda b, starts: (b, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block, E), lambda b, starts: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((tile, E), jnp.float32),
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
    )(starts, indices, weights, sourceT)


def apply_windowed_mean_pallas(
    sourceT: np.ndarray,
    indices: np.ndarray,
    weights: np.ndarray,
    block: int = 512,
    tile: int | None = None,
    interpret: bool = False,
):
    """
    Host wrapper: pads, plans slabs, runs the kernel.  ``tile=None``
    auto-sizes the slab from the block spans.  Returns None when the
    block-span precondition fails (caller falls back to XLA).
    """
    if tile is None:
        plan = plan_auto(indices, block)
        if plan is None:
            return None
        starts, tile = plan
    else:
        starts, ok = plan_blocks(indices, block, tile)
        if not ok:
            return None
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
    m, E = sourceT.shape
    # Mosaic DMA slices must be 128-lane aligned on the minor dim.
    E_pad = -(-E // 128) * 128
    m_needed = max(m, int(starts.max()) + tile)
    if m_needed > m or E_pad > E:
        padded = np.zeros((m_needed, E_pad), dtype=np.float32)
        padded[:m, :E] = sourceT
        sourceT = padded
    out = pallas_windowed_mean(
        jnp.asarray(sourceT.astype(np.float32)),
        jnp.asarray(indices.astype(np.int32)),
        jnp.asarray(weights.astype(np.float32)),
        jnp.asarray(starts),
        block,
        tile,
        interpret=interpret,
    )
    return np.asarray(out)[:n, :E]
