"""Row-matmul (MXU) gather engine: O(1) serialized ops per grid step.

The aligned engine (aligned_apply.py) retires one (128-target group,
source chunk) row with one dynamic slab read plus one accumulator
read-modify-write; batching (rb=8) fuses the gathers but the ~190 ns
slab-read/RMW pair per row floors the 1M-config pass at ~3-4 ms.  This
engine removes BOTH per-row serialized ops by turning them into two
one-hot MXU matmuls per grid step of ``r_step`` rows (reference hot
loop being matched: /root/reference/xugrid/regrid/regridder.py:41-69):

- **Chunk-select matmul**: ``(r_step, W) one-hot @ (W, e_sub, 128)
  slab -> (r_step, e_sub, 128)`` replaces ``r_step`` dynamic VMEM slab
  reads with one rank-3 ``dot_general`` (verified on-chip:
  scripts/mxu_probe.py).
- **Scatter matmul**: ``(G, r_step) one-hot @ (r_step, nc*e_sub, 128)
  partials -> (G, nc*e_sub, 128)`` replaces ``r_step`` accumulator
  RMWs with one matmul plus a single static full-accumulator add.
- Mosaic's DEFAULT matmul precision silently rounds f32 inputs to
  bf16; a 3-term hi/mid/lo bf16 split (8+8+8 mantissa bits = f32's 24)
  makes one-hot selection EXACT and scatter sums f32-reorder-accurate,
  at 3 one-pass matmuls instead of HIGHEST's 6.
- MXU matmuls cannot carry NaN payloads (0*NaN poisons whole tiles),
  so NaN sources are staged with a power-of-two **sentinel**
  (bf16-exact, survives the split untouched) and decoded back to NaN
  after the select, before the NaN-aware lane quantities.  Sources
  containing ±inf (or the sentinel itself) reject at staging and fall
  back to the aligned engine.
- Only sum-kind chains scatter through a matmul, and division-derived
  quantities (harmonic/geometric mean) could overflow to inf and
  poison the scatter — the engine covers mean / matvec / sum /
  first_order_conservative / conductance; min/max and the rest stay
  on the aligned engine.

The plan IS an aligned plan (same row structure, wider defaults:
2048-target blocks, 32 rows/step) plus two host-prebuilt one-hot
streams; pad rows carry zero weights/sub-slots so their partials are
exactly zero and need no masking in either matmul.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xugrid_tpu.regrid.aligned_apply import (
    Q_PACK,
    AlignedPlan,
    plan_gather_aligned,
)
from xugrid_tpu.regrid.gather_apply import (
    CHUNK,
    GROUP,
    _chains,
    _finalize,
    _lane_quantities,
    pad_sublanes,
)

#: targets per output block (16 groups -> the scatter matmul's M dim).
M_BLOCK = 2048

#: rows per grid step (the matmuls' shared R dim).
M_RSTEP = 32

#: chunks per resident source window.
M_WCHUNKS = 64

#: NaN staging sentinel: a power of two is exactly bf16-representable,
#: so the 3-term split carries it through the select matmul bit-exact.
NAN_SENTINEL = np.float32(2.0 ** 100)

#: methods this engine covers (all-sum chains, overflow-safe
#: quantities; see module docstring).
MXU_METHODS = (
    "mean",
    "matvec",
    "sum",
    "first_order_conservative",
    "conductance",
)

#: methods with chains not gated by weight==0 need the explicit
#: sub-slot validity mask (mirrors aligned_apply._RAW_VALUE_METHODS).
_RAW_VALUE_METHODS = ("sum",)

_DIMS = (((1,), (0,)), ((), ()))


class MxuPlan(NamedTuple):
    """Aligned plan + prebuilt one-hot matmul streams (all numpy)."""

    base: AlignedPlan
    ohc: np.ndarray   # (nsteps*r_step, 128) bf16 chunk-select one-hot
    ohg: np.ndarray   # (nsteps*n_groups, 128) bf16 scatter one-hot
    wabs_max: float   # max over targets of sum(|w|): staging overflow guard

    @property
    def n(self) -> int:
        return self.base.n


def mxu_supported(method: str, has_nan: bool) -> bool:
    # matvec's lane quantities gate only on weight != 0 (finite-data
    # SpMV contract, gather_apply._lane_quantities): a decoded NaN
    # would enter the scatter matmul where 0*NaN poisons every group
    # in the step — unlike the aligned engine, where it stays on the
    # owning target.  Reject and let the aligned engine take it.
    if method == "matvec" and has_nan:
        return False
    return method in MXU_METHODS


def plan_gather_mxu(
    indices: np.ndarray,
    weights: np.ndarray | None = None,
    block: int = M_BLOCK,
    r_step: int = M_RSTEP,
    w_chunks: int = M_WCHUNKS,
    max_plan_bytes: int = 1_500_000_000,
) -> MxuPlan | None:
    """Aligned plan with MXU-engine defaults plus one-hot streams, or
    None when the aligned planner rejects the shape."""
    base = plan_gather_aligned(
        indices, weights, block, r_step, w_chunks, max_plan_bytes
    )
    if base is None:
        return None
    r_step = base.r_step
    n_groups = base.block // GROUP
    nrows = base.itab.shape[0]
    nsteps = base.nsteps

    # Decode per-row (cid, group) from the packed step meta.  Pad rows
    # decode to (0, 0); their zero weights/sub-slots already make their
    # partials exact zeros, so treating them as real rows is harmless
    # (and keeps the one-hot build branch-free).
    meta16 = np.empty(nrows, np.int64)
    meta = base.meta.astype(np.int64) & 0xFFFFFFFF
    meta16[0::2] = meta & 0xFFFF
    meta16[1::2] = meta >> 16
    cid = (meta16 & 63).astype(np.int64)
    grp = (meta16 >> 6).astype(np.int64)

    ohc32 = np.zeros((nrows, 128), np.float32)
    ohc32[np.arange(nrows), cid] = 1.0
    step = np.arange(nrows) // r_step
    ohg32 = np.zeros((nsteps * n_groups, 128), np.float32)
    ohg32[step * n_groups + grp, np.arange(nrows) % r_step] = 1.0

    # Per-target Σ|w| bound for the staging overflow guard: an inf
    # partial would turn into 0*inf = NaN inside the scatter matmul and
    # corrupt every group in its step (not just the overflowing target
    # as on the aligned engine).
    if weights is None:
        wabs_max = 0.0
    else:
        wabs_max = float(
            np.abs(np.where(indices >= 0, weights, 0.0)).sum(axis=1).max()
        )

    bf16 = jnp.bfloat16
    return MxuPlan(base=base, ohc=ohc32.astype(bf16),
                   ohg=ohg32.astype(bf16), wabs_max=wabs_max)


def _split3(x):
    """Exact 3-term bf16 decomposition of f32 (8+8+8 mantissa bits)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _make_mxu_kernel(
    method: str,
    has_nan: bool,
    e_sub: int,
    block: int,
    r_step: int,
    w_chunks: int,
    interpret: bool,
):
    chains = _chains(method, has_nan)
    nc = len(chains)
    if any(kind != "sum" for _, kind in chains):
        raise ValueError(f"mxu engine: non-sum chains in {method!r}")
    n_groups = block // GROUP
    need_mask = method in _RAW_VALUE_METHODS

    def kernel(
        blkid_ref, wmeta_ref, winc0_ref,          # SMEM prefetch
        itab_ref, wtab_ref, ohc_ref, ohg_ref, rwsum_ref,
        src_hbm, out_ref,
        slabs, acc, sem0, sem1,
    ):
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)
        cur_b = blkid_ref[i]
        prev = blkid_ref[jnp.maximum(i - 1, 0)]
        nxt_b = blkid_ref[jnp.minimum(i + 1, nsteps - 1)]
        is_first = jnp.logical_or(i == 0, prev != cur_b)
        is_last = jnp.logical_or(i == nsteps - 1, nxt_b != cur_b)

        wm = wmeta_ref[i]
        slot = wm & 1
        wchg = ((wm >> 1) & 1) == 1
        nxt_c0 = (wm >> 2) - 1

        # Double-buffered window DMA (identical scheme to the aligned
        # engine: run k computes from slab half k&1 while run k+1
        # streams into the other half).
        @pl.when(i == 0)
        def _boot():
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(winc0_ref[0], w_chunks)],
                slabs.at[pl.ds(0, w_chunks)],
                sem0,
            ).start()

        @pl.when(jnp.logical_and(wchg, slot == 0))
        def _wait0():
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(0, w_chunks)],
                slabs.at[pl.ds(0, w_chunks)],
                sem0,
            ).wait()

        @pl.when(jnp.logical_and(wchg, slot == 1))
        def _wait1():
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(0, w_chunks)],
                slabs.at[pl.ds(w_chunks, w_chunks)],
                sem1,
            ).wait()

        @pl.when(
            jnp.logical_and(wchg, jnp.logical_and(nxt_c0 >= 0, slot == 0))
        )
        def _prefetch1():
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(nxt_c0, w_chunks)],
                slabs.at[pl.ds(w_chunks, w_chunks)],
                sem1,
            ).start()

        @pl.when(
            jnp.logical_and(wchg, jnp.logical_and(nxt_c0 >= 0, slot == 1))
        )
        def _prefetch0():
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(nxt_c0, w_chunks)],
                slabs.at[pl.ds(0, w_chunks)],
                sem0,
            ).start()

        @pl.when(is_first)
        def _init():
            acc[...] = jnp.zeros(
                (n_groups, nc * e_sub, 128), jnp.float32
            )

        # --- chunk-select matmul: r_step slab rows in one op ---------
        slab_cur = slabs[pl.ds(slot * w_chunks, w_chunks)]
        oh = ohc_ref[:, :w_chunks]                    # (R, W) bf16
        sel = jnp.zeros((r_step, e_sub, 128), jnp.float32)
        for part in _split3(slab_cur):
            sel = sel + jax.lax.dot_general(
                oh, part, _DIMS, preferred_element_type=jnp.float32
            )

        # --- fused sub-slot gather over all rows ----------------------
        rowsQ = jnp.broadcast_to(
            sel[:, None], (r_step, Q_PACK, e_sub, 128)
        ).reshape(r_step * Q_PACK * e_sub, 128)
        idxw = itab_ref[...]                          # (R, 128) i32
        idxR = jnp.broadcast_to(
            idxw[:, None, :], (r_step, Q_PACK, 128)
        ).reshape(r_step * Q_PACK, 128)
        bshift = (
            jax.lax.broadcasted_iota(
                jnp.int32, (r_step * Q_PACK, 128), 0
            )
            % Q_PACK
        ) * 8
        byte4 = jnp.right_shift(idxR, bshift) & 255

        def expand(x):
            k = x.shape[0]
            return jnp.broadcast_to(
                x[:, None, :], (k, e_sub, 128)
            ).reshape(k * e_sub, 128)

        idxQ = expand(byte4 & 127)
        val = jnp.take_along_axis(rowsQ, idxQ, axis=1)
        if has_nan:
            val = jnp.where(
                val == NAN_SENTINEL, jnp.float32(jnp.nan), val
            )
        wQ = expand(wtab_ref[...])
        qs = _lane_quantities(method, has_nan, val, wQ)
        if need_mask:
            okQ = expand(byte4 >= 128)
            qs = [jnp.where(okQ, q, 0.0) for q in qs]

        # --- Q-reduce + scatter matmul --------------------------------
        parts = []
        for q in qs:
            x = q.reshape(r_step, Q_PACK * e_sub, 128)
            tot = x[:, :e_sub]
            for k in range(1, Q_PACK):
                tot = tot + x[:, k * e_sub:(k + 1) * e_sub]
            parts.append(tot)                         # (R, e_sub, 128)
        P = jnp.concatenate(parts, axis=1) if nc > 1 else parts[0]
        ohg = ohg_ref[:, :r_step]                     # (G, R) bf16
        scat = jnp.zeros((n_groups, nc * e_sub, 128), jnp.float32)
        for part in _split3(P):
            scat = scat + jax.lax.dot_general(
                ohg, part, _DIMS, preferred_element_type=jnp.float32
            )
        acc[...] = acc[...] + scat

        @pl.when(is_last)
        def _flush():
            for gi in range(n_groups):
                den = rwsum_ref[:, gi * GROUP:(gi + 1) * GROUP]
                stacked = acc[pl.ds(gi, 1)].reshape(nc * e_sub, 128)
                cparts = [
                    stacked[ci * e_sub:(ci + 1) * e_sub]
                    for ci in range(nc)
                ]
                out_ref[:, gi * GROUP:(gi + 1) * GROUP] = _finalize(
                    method, has_nan, cparts, den
                )

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "method", "has_nan", "block", "r_step", "w_chunks",
        "n_blocks", "interpret",
    ),
)
def gather_mxu_apply(
    srcE, blkid, wmeta, winc0, itab, wtab, ohc, ohg, rwsum,
    method: str = "mean",
    has_nan: bool = True,
    block: int = M_BLOCK,
    r_step: int = M_RSTEP,
    w_chunks: int = M_WCHUNKS,
    n_blocks: int = 1,
    interpret: bool = False,
):
    """Row-matmul apply: plan arrays from ``plan_gather_mxu``; srcE
    staged by ``stage_source_mxu`` (NaNs already sentinel-encoded)."""
    e_sub, m_pad = srcE.shape
    ctot = m_pad // CHUNK
    chunks = srcE.reshape(e_sub, ctot, CHUNK).transpose(1, 0, 2)
    nsteps = blkid.shape[0]
    n_pad = n_blocks * block
    n_groups = block // GROUP
    nc = len(_chains(method, has_nan))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((r_step, 128), lambda i, *_: (i, 0)),
            pl.BlockSpec((r_step * Q_PACK, 128), lambda i, *_: (i, 0)),
            pl.BlockSpec((r_step, 128), lambda i, *_: (i, 0)),
            pl.BlockSpec((n_groups, 128), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, block), lambda i, blk, *_: (0, blk[i])),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (e_sub, block), lambda i, blk, *_: (0, blk[i])
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * w_chunks, e_sub, 128), jnp.float32),
            pltpu.VMEM((n_groups, nc * e_sub, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    kernel = _make_mxu_kernel(
        method, has_nan, e_sub, block, r_step, w_chunks, interpret
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_sub, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        blkid, wmeta, winc0, itab, wtab, ohc, ohg,
        rwsum.reshape(1, -1), chunks,
    )


def stage_source_mxu(
    source2d: np.ndarray, plan: MxuPlan, has_nan: bool
) -> np.ndarray | None:
    """(n_extra, m) -> (e_sub, m_pad) staged with NaNs sentinel-encoded,
    or None when the source defeats the matmul path (±inf, or real data
    colliding with the sentinel)."""
    base = plan.base
    n_extra, m = source2d.shape
    e_sub = pad_sublanes(n_extra)
    c_needed = (
        int(base.winc0.max()) + base.w_chunks if len(base.winc0) else 1
    )
    ctot = max(-(-m // CHUNK), c_needed)
    out = np.zeros((e_sub, ctot * CHUNK), np.float32)
    out[:n_extra, :m] = source2d
    if has_nan:
        sl = out[:n_extra, :m]
        nanm = np.isnan(sl)
        if np.isinf(sl).any() or (
            np.abs(sl[~nanm]) >= NAN_SENTINEL
        ).any():
            return None
        vmax = float(np.abs(sl[~nanm]).max()) if (~nanm).any() else 0.0
        sl[nanm] = NAN_SENTINEL
    else:
        if not np.isfinite(source2d).all():
            return None
        vmax = float(np.abs(source2d).max()) if source2d.size else 0.0
    # Overflow guard: a single f32-inf partial (w*val, or a target's
    # running sum) becomes 0*inf = NaN inside the scatter matmul and
    # poisons the whole step.  Σ|w|·max|v| bounds every partial; keep a
    # 8x margin under f32 max.
    if plan.wabs_max * vmax > 3.4e38 / 8.0:
        return None
    return out


def mxu_apply(
    source2d: np.ndarray,
    plan: MxuPlan,
    method: str = "mean",
    has_nan: bool | None = None,
    interpret: bool = False,
) -> np.ndarray | None:
    """Stage + run the row-matmul kernel; returns (n_target, n_extra),
    or None when the method/source needs an engine fallback."""
    if has_nan is None:
        has_nan = bool(np.isnan(source2d).any())
    if not mxu_supported(method, bool(has_nan)):
        return None
    srcE = stage_source_mxu(source2d, plan, bool(has_nan))
    if srcE is None:
        return None
    base = plan.base
    out = gather_mxu_apply(
        jnp.asarray(srcE),
        jnp.asarray(base.blkid),
        jnp.asarray(base.wmeta),
        jnp.asarray(base.winc0),
        jnp.asarray(base.itab),
        jnp.asarray(base.wtab),
        jnp.asarray(plan.ohc),
        jnp.asarray(plan.ohg),
        jnp.asarray(base.rwsum),
        method=method,
        has_nan=bool(has_nan),
        block=base.block,
        r_step=base.r_step,
        w_chunks=base.w_chunks,
        n_blocks=len(base.rwsum) // base.block,
        interpret=interpret,
    )
    return np.asarray(out)[: source2d.shape[0], : base.n].T
