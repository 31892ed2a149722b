"""Row-matmul (MXU) gather engine v2: O(1) serialized ops per step.

The aligned engine (aligned_apply.py) retires one (128-target group,
source chunk) row with one dynamic slab read plus one accumulator
read-modify-write; batching (rb=8) fuses the gathers but the ~190 ns
slab-read/RMW pair per row floors the 1M-config pass at ~3-4 ms.  This
engine removes BOTH per-row serialized ops (reference hot loop being
matched: /root/reference/xugrid/regrid/regridder.py:41-69):

- **Chunk-select matmul**: ``(r_step, W) one-hot @ (W, e_sub, 128)
  slab -> (r_step, e_sub, 128)`` replaces ``r_step`` dynamic VMEM slab
  reads with one rank-3 ``dot_general`` (semantics verified on-chip:
  scripts/mxu_probe.py).  ``Precision.HIGHEST`` makes the select exact
  for f32 payloads (the 6-pass f32 emulation reconstructs one-hot
  selections bit-exactly) with no hi/mid/lo pre-split of the slab —
  the v1 engine re-split the whole resident window EVERY step, which
  is where the matmul formulation lost to the aligned engine.
- **Static scatter**: the planner interleaves rows so step row ``r``
  belongs to target group ``r % n_groups`` ("quads"); the scatter is
  a compile-time ``reshape(qs, n_groups, ...)`` reduction plus ONE
  full-accumulator combine — no per-row RMW, no scatter matmul, and
  exact f32 (v1's bf16 3-term scatter is gone).  This also frees the
  engine from sum-only chains: min/max and the division-derived
  quantities ride the same static reduce with their own combine kind,
  so v2 covers every aligned-engine method.
- The one-hot is built in-kernel from a per-step cid lane vector
  (lane->sublane reshape + iota compare, both verified Mosaic ops) —
  no host one-hot stream.
- MXU matmuls cannot carry NaN payloads (0*NaN poisons whole tiles),
  so NaN sources are staged with a power-of-two **sentinel**
  (survives the select untouched) and decoded back to NaN right after
  the select matmul.  Sources containing ±inf (or the sentinel
  itself) reject at staging and fall back to the aligned engine.
  Quantity overflow (harmonic/geometric inf) stays on the owning
  lane exactly as on the aligned engine — quantities never enter a
  matmul here.

The plan IS an aligned plan (same itab/wtab row payloads, re-grouped
into group-aligned quads) plus the per-step cid vector; pad rows carry
zero weights/sub-slots so every chain's masked quantities are neutral.
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
    _RAW_VALUE_METHODS,
    AlignedPlan,
    _combine,
    _neutral,
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

#: targets per output block.
M_BLOCK = 1024

#: rows per grid step (the chunk-select matmul's M dim; must be a
#: multiple of block//128 and <= 128 for the in-kernel one-hot build).
M_RSTEP = 64

#: window-width candidates for the greedy quad cover (<= 64: the meta
#: cid field is 6 bits).
M_WIDTHS = (16, 32, 64)

#: NaN staging sentinel: a power of two survives the select matmul's
#: f32 emulation bit-exact.
NAN_SENTINEL = np.float32(2.0 ** 100)

#: methods this engine covers — the full aligned-engine set (static
#: scatter: nothing method-specific rides the MXU).
MXU_METHODS = (
    "mean",
    "matvec",
    "sum",
    "first_order_conservative",
    "conductance",
    "harmonic_mean",
    "geometric_mean",
    "min",
    "max",
)

_DIMS = (((1,), (0,)), ((), ()))


class MxuPlan(NamedTuple):
    """Quad-interleaved aligned plan + per-step cid lanes (all numpy)."""

    base: AlignedPlan     # rows group-aligned: step row r -> group
    #                       r % n_groups; plan_triplets decodes as usual
    cidvec: np.ndarray    # (nsteps, 128) i32 window-relative chunk per
    #                       step row (lanes >= r_step unused)

    @property
    def n(self) -> int:
        return self.base.n


def mxu_supported(method: str, has_nan: bool) -> bool:
    # NaN sources are sentinel-staged and decoded before the lane
    # quantities, and the scatter is static — a NaN stays on its owning
    # target for every method, matching the aligned engine.
    return method in MXU_METHODS


def _decode_rows(base: AlignedPlan):
    """Per-row (real, blk, c_abs, grp) from a built aligned plan."""
    nrows = base.itab.shape[0]
    meta16 = np.empty(nrows, np.int64)
    meta = base.meta.astype(np.int64) & 0xFFFFFFFF
    meta16[0::2] = meta & 0xFFFF
    meta16[1::2] = meta >> 16
    cid = meta16 & 63
    grp = meta16 >> 6
    step = np.arange(nrows) // base.r_step
    c_abs = base.winc0.astype(np.int64)[step] + cid
    blk = base.blkid.astype(np.int64)[step]
    real = (base.itab.view(np.uint32) != 0).any(axis=1)
    return real, blk, c_abs, grp


def _quad_cover(blocks, w, n_groups, qs):
    """Greedy quad/run cover at window width ``w``.

    ``blocks``: list of (blk, per-group [sorted (c_abs, rid) arrays]).
    Returns (steps_total, layout) where layout is a list of per-run
    dicts {blk, c0, quads: [members (n_groups,) rid-or--1]} in step
    order.
    """
    layout = []
    steps_total = 0
    for blk, glists in blocks:
        ptr = [0] * n_groups
        rem = sum(len(g) for g in glists)
        c0 = None
        run = None
        while rem:
            if c0 is None:
                c0 = min(
                    int(glists[g][ptr[g]][0])
                    for g in range(n_groups)
                    if ptr[g] < len(glists[g])
                )
                run = {"blk": blk, "c0": c0, "quads": []}
                layout.append(run)
            members = np.full(n_groups, -1, np.int64)
            took = False
            for g in range(n_groups):
                if ptr[g] < len(glists[g]) and (
                    int(glists[g][ptr[g]][0]) < c0 + w
                ):
                    members[g] = int(glists[g][ptr[g]][1])
                    ptr[g] += 1
                    rem -= 1
                    took = True
            if not took:
                c0 = None
                continue
            run["quads"].append(members)
    for run in layout:
        steps_total += -(-len(run["quads"]) // qs)
    return steps_total, layout


def plan_gather_mxu(
    indices: np.ndarray,
    weights: np.ndarray | None = None,
    block: int = M_BLOCK,
    r_step: int = M_RSTEP,
    widths: tuple = M_WIDTHS,
    max_plan_bytes: int = 1_500_000_000,
) -> MxuPlan | None:
    """Quad-interleaved plan via the aligned planner's row payloads, or
    None when the aligned planner rejects the shape."""
    base = plan_gather_aligned(
        indices, weights, block, max(r_step, 16), 64, max_plan_bytes,
        gm=False,  # the quad cover re-sorts rows from chunk-major
    )
    if base is None:
        return None
    block = base.block
    n_groups = block // GROUP
    if r_step % n_groups or not 1 <= r_step <= 128:
        r_step = max(n_groups, min(128, r_step - r_step % n_groups))
        if r_step % n_groups:
            return None
    qs = r_step // n_groups

    real, blk_all, c_all, grp_all = _decode_rows(base)
    rids = np.flatnonzero(real)
    if len(rids) == 0:
        return None
    blk_r = blk_all[rids]
    c_r = c_all[rids]
    grp_r = grp_all[rids]
    # c_abs lookup by ORIGINAL row id (quad members carry rids).
    c_of = np.zeros(base.itab.shape[0], np.int64)
    c_of[rids] = c_r

    n_blocks = len(base.rwsum) // block
    # Per (block, group) sorted row lists.
    order = np.lexsort((rids, c_r, grp_r, blk_r))
    sblk, sgrp, sc, srid = (
        blk_r[order], grp_r[order], c_r[order], rids[order]
    )
    blocks = []
    present = np.zeros(n_blocks, bool)
    bstart = np.flatnonzero(
        np.concatenate(([True], sblk[1:] != sblk[:-1]))
    )
    bend = np.concatenate((bstart[1:], [len(sblk)]))
    for s, e in zip(bstart, bend):
        b = int(sblk[s])
        present[b] = True
        glists = []
        for g in range(n_groups):
            m = sgrp[s:e] == g
            glists.append(
                np.stack([sc[s:e][m], srid[s:e][m]], axis=1)
                if m.any()
                else np.zeros((0, 2), np.int64)
            )
        blocks.append((b, glists))

    # Narrowest width whose step count stays within 15% of the widest's
    # (same rule as the aligned planner's adaptive window).
    cands = {}
    for w in widths:
        cands[w] = _quad_cover(blocks, w, n_groups, qs)
    base_steps = cands[max(widths)][0]
    w_chunks = max(widths)
    for w in sorted(cands):
        if cands[w][0] <= base_steps * 1.15:
            w_chunks = w
            break
    steps_filled, layout = cands[w_chunks]

    missing = np.flatnonzero(~present)
    n_real = steps_filled + len(missing)
    gran = 1 << max(4, n_real.bit_length() - 5)
    nsteps = -(-n_real // gran) * gran
    if nsteps * r_step * (2 + Q_PACK) * 128 * 4 > max_plan_bytes:
        return None

    blkid = np.empty(nsteps, np.int32)
    winc0 = np.empty(nsteps, np.int32)
    wchg = np.zeros(nsteps, bool)
    cidvec = np.zeros((nsteps, 128), np.int32)
    itab = np.zeros((nsteps * r_step, 128), np.int32)
    wtab = np.zeros((nsteps * r_step * Q_PACK, 128), np.float32)
    meta_arr = np.zeros(nsteps * r_step, np.int64)

    s = 0
    run_c0s = []
    run_first_step = []
    for run in layout:
        nq = len(run["quads"])
        nst = -(-nq // qs)
        run_c0s.append(run["c0"])
        run_first_step.append(s)
        blkid[s:s + nst] = run["blk"]
        winc0[s:s + nst] = run["c0"]
        wchg[s] = True
        members = np.full((nst * qs, n_groups), -1, np.int64)
        members[:nq] = np.stack(run["quads"])
        rows = members.reshape(-1)            # step-row order
        slots = np.arange(s * r_step, (s + nst) * r_step)
        realm = rows >= 0
        rr = rows[realm]
        ss = slots[realm]
        itab[ss] = base.itab[rr]
        wq = (
            rr[:, None] * Q_PACK + np.arange(Q_PACK)[None, :]
        ).reshape(-1)
        sq = (
            ss[:, None] * Q_PACK + np.arange(Q_PACK)[None, :]
        ).reshape(-1)
        wtab[sq] = base.wtab[wq]
        # window-relative cid for the one-hot + meta (oracle decode)
        c_abs_rows = np.zeros(len(rows), np.int64)
        c_abs_rows[realm] = c_of[rr]
        cidr = np.where(realm, c_abs_rows - run["c0"], 0)
        cidvec[s:s + nst, :r_step] = cidr.reshape(nst, r_step).astype(
            np.int32
        )
        grp_rows = np.tile(np.arange(n_groups), nst * qs)
        meta_arr[slots] = np.where(
            realm, cidr | (grp_rows << 6), grp_rows << 6
        )
        s += nst
    # Neutral steps for entry-less blocks (flush NaN via zero rwsum).
    prev_c0 = run_c0s[-1] if run_c0s else 0
    for b in missing:
        blkid[s] = b
        winc0[s] = prev_c0
        s += 1
    blkid[s:] = blkid[s - 1]
    winc0[s:] = winc0[s - 1]

    # Double-buffer run bookkeeping (same encoding as the aligned plan).
    runid = np.cumsum(wchg) - 1
    if not wchg.any():
        return None
    run_c0 = winc0[wchg].astype(np.int64)
    nxt = np.full(len(run_c0), -1, np.int64)
    nxt[:-1] = run_c0[1:]
    slot = np.arange(len(run_c0), dtype=np.int64) & 1
    runid = np.maximum(runid, 0)
    wmeta = (
        slot[runid]
        | (wchg.astype(np.int64) << 1)
        | ((nxt[runid] + 1) << 2)
    ).astype(np.int32)

    meta = (meta_arr[0::2] | (meta_arr[1::2] << 16)).astype(np.int32)
    newbase = AlignedPlan(
        blkid=blkid,
        winc0=winc0,
        wmeta=wmeta,
        meta=meta,
        itab=itab,
        wtab=wtab,
        rwsum=base.rwsum,
        n=base.n,
        block=block,
        r_step=r_step,
        w_chunks=w_chunks,
    )
    return MxuPlan(base=newbase, cidvec=cidvec)


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
    kinds = [kind for _, kind in chains]
    n_groups = block // GROUP
    qs = r_step // n_groups
    need_mask = method in _RAW_VALUE_METHODS

    def kernel(
        blkid_ref, wmeta_ref, winc0_ref,          # SMEM prefetch
        cid_ref, itab_ref, wtab_ref, rwsum_ref,
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

        initrow = jnp.concatenate(
            [
                jnp.full((e_sub, 128), _neutral(kind), jnp.float32)
                for kind in kinds
            ],
            axis=0,
        )

        @pl.when(is_first)
        def _init():
            acc[...] = jnp.broadcast_to(
                initrow[None], (n_groups, nc * e_sub, 128)
            )

        # --- in-kernel one-hot + chunk-select matmul ------------------
        cidcol = cid_ref[...].reshape(1, 128).reshape(128, 1)
        #                                             # lane -> sublane
        iota_w = jax.lax.broadcasted_iota(
            jnp.int32, (128, w_chunks), 1
        )
        ohf = (cidcol == iota_w).astype(jnp.float32)[:r_step]
        # 2-D rhs: (R, W) @ (W, e_sub*128) lowers to ONE Mosaic matmul
        # instead of e_sub rank-3 tile passes (scripts/mxu_microbench).
        slab_cur = slabs[pl.ds(slot * w_chunks, w_chunks)].reshape(
            w_chunks, e_sub * 128
        )
        sel = jax.lax.dot_general(
            ohf, slab_cur, _DIMS,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).reshape(r_step, e_sub, 128)                 # (R, e_sub, 128)
        if has_nan:
            sel = jnp.where(
                sel == NAN_SENTINEL, jnp.float32(jnp.nan), sel
            )

        import os as _os

        _probe = _os.environ.get("XUGRID_TPU_MXU_PROBE", "")
        if _probe == "sel":
            # Probe: DMA + one-hot matmul only.
            acc[pl.ds(0, 1)] += jnp.sum(
                sel.reshape(r_step, e_sub, 128), axis=0
            ).reshape(1, e_sub, 128)

            @pl.when(is_last)
            def _pflush():
                out_ref[...] = jnp.zeros(
                    (e_sub, block), jnp.float32
                ) + jnp.sum(acc[0])

            return

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
        if _probe == "gather":
            # Probe: DMA + matmul + gather only.
            acc[pl.ds(0, 1)] += jnp.sum(
                val.reshape(r_step * Q_PACK, e_sub, 128), axis=0
            ).reshape(1, e_sub, 128)

            @pl.when(is_last)
            def _pflush():
                out_ref[...] = jnp.zeros(
                    (e_sub, block), jnp.float32
                ) + jnp.sum(acc[0])

            return
        wQ = expand(wtab_ref[...])
        qlist = _lane_quantities(method, has_nan, val, wQ)
        if need_mask:
            okQ = expand(byte4 >= 128)
            qlist = [
                jnp.where(okQ, q, jnp.float32(_neutral(kind)))
                for q, kind in zip(qlist, kinds)
            ]

        # --- static Q-reduce + quad scatter ---------------------------
        parts = []
        for q, kind in zip(qlist, kinds):
            x = q.reshape(r_step, Q_PACK, e_sub, 128)
            tot = _combine(
                kind,
                _combine(kind, x[:, 0], x[:, 1]),
                _combine(kind, x[:, 2], x[:, 3]),
            )                                         # (R, e_sub, 128)
            quad = tot.reshape(qs, n_groups, e_sub, 128)
            red = quad[0]
            for k in range(1, qs):
                red = _combine(kind, red, quad[k])
            parts.append(red)                         # (G, e_sub, 128)
        scat = jnp.concatenate(parts, axis=1) if nc > 1 else parts[0]

        cur = acc[...]
        if len(set(kinds)) == 1:
            new = _combine(kinds[0], cur, scat)
        else:
            bandc = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (n_groups, nc * e_sub, 128), 1
                )
                // e_sub
            )
            minmask = jnp.zeros((n_groups, nc * e_sub, 128), bool)
            for ci, kind in enumerate(kinds):
                if kind == "min":
                    minmask = jnp.logical_or(minmask, bandc == ci)
            new = jnp.where(
                minmask,
                jnp.minimum(cur, scat),
                jnp.maximum(cur, scat),
            )
        acc[...] = new

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
    srcE, blkid, wmeta, winc0, cidvec, itab, wtab, rwsum,
    method: str = "mean",
    has_nan: bool = True,
    block: int = M_BLOCK,
    r_step: int = M_RSTEP,
    w_chunks: int = 64,
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
            pl.BlockSpec((1, 1, 128), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((r_step, 128), lambda i, *_: (i, 0)),
            pl.BlockSpec(
                (r_step * Q_PACK, 128), lambda i, *_: (i, 0)
            ),
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
        blkid, wmeta, winc0, cidvec.reshape(nsteps, 1, 128),
        itab, wtab, rwsum.reshape(1, -1), chunks,
    )


def stage_source_mxu(
    source2d: np.ndarray, plan: MxuPlan, has_nan: bool
) -> np.ndarray | None:
    """(n_extra, m) -> (e_sub, m_pad) staged with NaNs sentinel-encoded,
    or None when the source defeats the select matmul (±inf, or real
    data colliding with the sentinel: 0*inf = NaN would poison whole
    tiles)."""
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
        sl[nanm] = NAN_SENTINEL
    else:
        if not np.isfinite(source2d).all():
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
        jnp.asarray(plan.cidvec),
        jnp.asarray(base.itab),
        jnp.asarray(base.wtab),
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
