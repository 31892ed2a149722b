"""Target-aligned banded gather engine (round-3 latency attack).

The retired dense quad-packed engine (round 3) spent ~8 serialized
lane-gather ops per row: four sub-slot value gathers plus segment-end
routing gathers per chain, and TPU ``dynamic_gather`` issue overhead
(~20-80 ns/op regardless of sublane count — scripts/gather_microbench)
dominates at bench widths.  This engine restructures the plan so a row
needs ONE gather and ONE accumulator update (reference hot loop:
/root/reference/xugrid/regrid/regridder.py:41-69):

- **Target-aligned lanes**: a row covers one (128-target group, source
  chunk) pair and lane L holds target ``group*128 + L``'s entries from
  that chunk.  The row's partial IS positioned — the accumulator
  update is a direct combine, with no end-lane gather, no segmented
  Hillis-Steele scan, and no seg/ends ptab planes at all.
- **Banded sub-slots**: the up-to-``Q_PACK=4`` entries of one
  (target, chunk) run live in one lane as packed index bytes; the
  kernel broadcasts the chunk row ``Q_PACK``× on the sublane axis and
  resolves all four sub-slots with a single ``take_along_axis`` over
  ``(Q_PACK*e_sub, 128)`` — four gathers collapse into one.
- Runs longer than ``Q_PACK`` spill to extra rows of the same
  (group, chunk) key; the accumulator combine absorbs them, so no
  residual scan exists for ANY input shape.
- Window DMA (double-buffered resident chunk slabs) and the step/grid
  bookkeeping are shared with the dense engine.

On the real 1M-config overlap matrix this plan costs 19.5k rows vs the
dense engine's 13.5k, but each row retires ~3x fewer serialized VMEM
ops; rows interleave groups (sorted chunk-major) so consecutive
accumulator updates hit different groups and pipeline.

Plan arrays are all-numpy and reusable across applies.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xugrid_tpu.regrid.gather_apply import (
    CHUNK,
    GROUP,
    _chains,
    _finalize,
    _lane_quantities,
    pad_sublanes,
)

#: sub-entries packed per lane (one banded gather resolves all four).
Q_PACK = 4

#: chunks per resident source window (<= 64: the meta cid field is 6
#: bits).
W_CHUNKS = 64

#: rows processed per grid step.
R_STEP = 16

#: rows retired per kernel iteration (one fused gather covers all rb).
#: On-chip sweep at the 1M config (E=20): rb=1 ~5.9, rb=4 5.28,
#: rb=8 5.09 ms/pass — the residual bound is the per-row slab read +
#: accumulator read-modify-write, which rb cannot batch.
R_BATCH = 8

#: targets per output block.  Round-5 on-chip sweep at the 1M bench
#: config (scripts/block_sweep.py): 1024 beats 512 and 2048 at both
#: E=20 (1.61 vs 1.80 / 1.65 ms) and E=128 (5.87 vs 6.4 / 6.01 ms) —
#: half the window runs (256 vs 2788) and 2.38x vs 4.1x DMA waste.
A_BLOCK = 1024

#: methods with at least one chain not gated by weight==0 need the
#: explicit bit-7 sub-slot mask (raw-value chains ignore weights).
_RAW_VALUE_METHODS = ("sum", "min", "max", "geometric_mean")


class AlignedPlan(NamedTuple):
    """Target-aligned banded plan (all numpy)."""

    blkid: np.ndarray    # (nsteps,) i32 target block per step
    winc0: np.ndarray    # (nsteps,) i32 absolute first chunk of the
    #                      step's resident source window
    wmeta: np.ndarray    # (nsteps,) i32: bit0 slab parity, bit1
    #                      window-run start, bits 2.. next run's first
    #                      chunk + 1 (0 = no next run)
    meta: np.ndarray     # (nsteps*r_step//2,) i32 packed per-row pairs
    #                      (16 bits each): cid (6) | group-in-block
    #                      (gbits); gm plans add boundary (1) |
    #                      previous-group (gbits) above those
    itab: np.ndarray     # (nsteps*r_step, 128) i32 packed idx bytes
    #                      (bit 7 = sub-slot valid, bits 0..6
    #                      lane-local source idx), lane = target % 128
    wtab: np.ndarray     # (nsteps*r_step*Q_PACK, 128) f32 weights,
    #                      rows 4r..4r+3 = row r's sub-slots
    rwsum: np.ndarray    # (n_pad,) f32 total window weight per target
    n: int
    block: int
    r_step: int
    w_chunks: int
    gm: bool = False     # group-major row order (register-carried
    #                      group accumulator; see plan_gather_aligned)
    qs: int = 0          # >0: packed-superchunk matvec plan with qs
    #                      entry slots per (lane, sublane) cell (see
    #                      plan_gather_matvec); winc0/w_chunks are in
    #                      1024-value superchunk units and itab/wtab
    #                      carry qs*2 words / qs*8 planes per row
    qp: int = Q_PACK     # standard-plan sub-slot pack width (1/2/4):
    #                      entries per (row, lane) cell before spilling
    #                      to an extra row.  The kernel's gather/chain
    #                      shapes scale with qp, so smaller qp trades
    #                      spill rows for ~qp-fold less VPU work on
    #                      mostly-empty slots (real overlap matrices
    #                      fill ~0.9 entries/lane-cell).

    @property
    def nsteps(self) -> int:
        return len(self.blkid)


def _gbits(block: int) -> int:
    n_groups = block // GROUP
    return max(2, int(max(n_groups - 1, 1)).bit_length())


def _seg_propagate(values, starts):
    """Per-element value at the most recent True in ``starts``."""
    pos = np.arange(len(values), dtype=np.int64)
    idx = np.maximum.accumulate(np.where(starts, pos, 0))
    return values[idx]


def plan_gather_aligned(
    indices: np.ndarray,
    weights: np.ndarray | None = None,
    block: int = A_BLOCK,
    r_step: int = R_STEP,
    w_chunks: int = W_CHUNKS,
    max_plan_bytes: int = 1_500_000_000,
    gm: bool | None = None,
    qp: int | None = None,
) -> AlignedPlan | None:
    """Build the target-aligned banded plan, or None when the problem
    shape defeats it (the caller falls back to another engine).

    ``gm`` (group-major) reorders rows (block, group, chunk, spill) so
    every 128-target group's rows are CONTIGUOUS: the kernel then
    carries one register accumulator across a group's rows and touches
    the per-group VMEM accumulator only at group boundaries (~1 per
    ~10 rows on real overlap matrices) instead of issuing the
    serialized dynamic read-modify-write every row — the measured
    ~190 ns/row latency floor of the chunk-major order.  Window runs
    split only BETWEEN groups; a group whose own chunk span exceeds
    every window-width candidate defeats gm and the planner falls back
    to the chunk-major order (gm=False) automatically.  Default from
    XUGRID_TPU_ALIGNED_GM — measured SLOWER on-chip (5.58 vs 4.66
    ms/pass at the 1M E=20 bench; 59.1 vs ~64 GB/s at E=128): the
    per-row boundary select + pl.when flush cost more than the dynamic
    VMEM read-modify-write they replace, so chunk-major stays the
    default and gm is opt-in.
    """
    if gm is None:
        gm = os.environ.get("XUGRID_TPU_ALIGNED_GM", "0") == "1"
    if qp is None:
        try:
            qp = int(os.environ.get("XUGRID_TPU_ALIGNED_QP", Q_PACK))
        except ValueError:
            qp = Q_PACK
    if qp not in (1, 2, 4):
        raise ValueError("aligned engine: qp must be 1, 2, or 4")
    n, _w = indices.shape
    if n == 0:
        return None
    if block & (block - 1) or not GROUP <= block <= 2048:
        raise ValueError("aligned engine: block must be 128..2048 pow2")
    if r_step % 2 or w_chunks > 64:
        raise ValueError("aligned engine: unsupported parameters")
    if weights is None:
        weights = np.zeros(indices.shape, np.float32)
    # Steps floor at one per target block: skip straight to a wider
    # block when the floor alone would blow the SMEM scalar budget.
    while block < 2048 and (
        (3 + r_step // 2) * 4 * (-(-n // block)) + 64 > 900_000
    ):
        block *= 2
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    weights = np.ascontiguousarray(weights, dtype=np.float32)
    n_blocks = -(-n // block)
    n_pad = n_blocks * block
    n_groups = block // GROUP
    gbits = max(2, int(max(n_groups - 1, 1)).bit_length())
    if 6 + gbits > 16:
        return None
    if gm and 7 + 2 * gbits > 16:
        gm = False

    valid = indices >= 0
    ti, _sl = np.nonzero(valid)
    if len(ti) == 0:
        return None
    src = indices[valid]
    wts = weights[valid]
    if src.max() >= (1 << 24) * CHUNK:
        return None

    # Sort entries by (block, chunk, group, lane) — or group-major
    # (block, group, chunk, lane) for gm; stable keeps the input
    # sub-slot order within each (target, chunk) run.
    B = (ti // block).astype(np.int64)
    g = ((ti % block) // GROUP).astype(np.int64)
    lane = (ti % GROUP).astype(np.int64)
    chunk = src >> 7
    cmax = int(chunk.max()) + 1
    if gm:
        key = (((B * n_groups + g) * cmax + chunk) << 7) | lane
    else:
        key = (((B * cmax + chunk) * n_groups + g) << 7) | lane
    order = np.argsort(key, kind="stable")
    key = key[order]
    ew = wts[order]
    idx7 = (src[order] & 127).astype(np.int64)
    del order, ti, src, wts, B, g, lane, chunk
    nnz = len(key)
    pos = np.arange(nnz, dtype=np.int64)

    # Rank within each (target, chunk) run -> sub-slot and spill row.
    newt = np.empty(nnz, bool)
    newt[0] = True
    np.not_equal(key[1:], key[:-1], out=newt[1:])
    rank = pos - np.maximum.accumulate(np.where(newt, pos, 0))
    s_sub = rank % qp
    spill = rank // qp
    n_spill = int(spill.max()) + 1
    if n_spill > 1:
        # Entry order interleaves spill levels within a row's lanes
        # (lane 0's spill-1 entry sits before lane 1's spill-0 entry),
        # which would fragment each spilled row into per-lane pieces —
        # re-sort so every (row, lane) is contiguous.
        order2 = np.argsort(
            (((key >> 7) * n_spill + spill) << 7) | (key & 127),
            kind="stable",
        )
        key = key[order2]
        ew = ew[order2]
        idx7 = idx7[order2]
        s_sub = s_sub[order2]
        spill = spill[order2]
        del order2

    # Rows: unique (block, chunk, group, spill), chunk-major so the
    # window cover sees monotone chunks and consecutive rows usually
    # target different groups (accumulator updates pipeline).
    rowkey = (key >> 7) * n_spill + spill
    newr = np.empty(nnz, bool)
    newr[0] = True
    np.not_equal(rowkey[1:], rowkey[:-1], out=newr[1:])
    rid = np.cumsum(newr) - 1
    n_rows = int(rid[-1]) + 1
    bcg = (key >> 7)[newr]
    if gm:
        B_r = bcg // (n_groups * cmax)
        g_r = (bcg // cmax) % n_groups
        c_r = bcg % cmax
    else:
        B_r = bcg // (cmax * n_groups)
        c_r = (bcg // n_groups) % cmax
        g_r = bcg % n_groups

    # Greedy window cover per block over the rows' chunks (chunks are
    # non-decreasing within a block by construction; in gm order they
    # reset per group, so the gm cover works on group [min, max] spans
    # and splits runs only between groups).
    firstB = np.empty(n_rows, bool)
    firstB[0] = True
    np.not_equal(B_r[1:], B_r[:-1], out=firstB[1:])

    if gm:
        gk = B_r * n_groups + g_r
        firstG = np.empty(n_rows, bool)
        firstG[0] = True
        np.not_equal(gk[1:], gk[:-1], out=firstG[1:])
        idx_first = np.flatnonzero(firstG)
        idx_last = np.append(idx_first[1:], n_rows) - 1
        gmin = c_r[idx_first]
        gmax = c_r[idx_last]
        gfirstB = firstB[idx_first]
        n_gr = len(idx_first)
        gidx_r = np.cumsum(firstG) - 1
        bstart_g = np.flatnonzero(gfirstB)
        bend_g = np.append(bstart_g[1:], n_gr)

    def _cover_gm(w):
        """Group-level greedy run cover: returns (row-start flags,
        per-row window base) or None when a single group's span
        defeats the width."""
        if int((gmax - gmin).max()) >= w:
            return None
        start_g = gfirstB.copy()
        # Whole-block single runs are the common case; only blocks
        # whose total span overflows the window need the greedy walk.
        gblk = np.cumsum(gfirstB) - 1
        nb = int(gblk[-1]) + 1
        bmax = np.full(nb, -1, np.int64)
        np.maximum.at(bmax, gblk, gmax)
        bmin = np.full(nb, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(bmin, gblk, gmin)
        for bi in np.flatnonzero((bmax - bmin) >= w):
            cmin = cmx = None
            for k in range(bstart_g[bi], bend_g[bi]):
                if cmin is None:
                    cmin, cmx = gmin[k], gmax[k]
                    continue
                nmin = min(cmin, gmin[k])
                nmx = max(cmx, gmax[k])
                if nmx - nmin >= w:
                    start_g[k] = True
                    cmin, cmx = gmin[k], gmax[k]
                else:
                    cmin, cmx = nmin, nmx
        runmin = np.minimum.reduceat(gmin, np.flatnonzero(start_g))
        winc0_g = runmin[np.cumsum(start_g) - 1]
        start_rows = np.zeros(n_rows, bool)
        start_rows[idx_first[start_g]] = True
        return start_rows, winc0_g[gidx_r]

    def _cover(w):
        start = firstB.copy()
        while True:
            c0 = _seg_propagate(c_r, start)
            over = (c_r - c0) >= w
            if not over.any():
                break
            cand = over & ~start
            prev_over = np.empty(n_rows, bool)
            prev_over[0] = False
            prev_over[1:] = over[:-1] & ~start[1:]
            newstart = cand & ~prev_over
            start |= newstart
        return start

    # Adaptive window width.  Total window DMA BYTES are width-invariant
    # (runs scale as 1/w while each run streams w chunks), but each run
    # costs ~2 us of issue/wait latency on the double-buffered schedule
    # (measured: scripts/dma_probe.py — the w=16 schedule alone moves
    # 149 MB at only 104 GB/s).  So prefer the width minimizing
    # steps + runs (a run's latency ~ one grid step), not the narrowest
    # window as in round 3.  XUGRID_TPU_ALIGNED_W forces a width.
    def _steps_of(start):
        bucket_start = start | firstB
        bid = np.cumsum(bucket_start) - 1
        rows_b = np.bincount(bid, minlength=int(bid[-1]) + 1)
        return bucket_start, bid, rows_b, int(
            (-(-rows_b // r_step)).sum()
        )

    forced = os.environ.get("XUGRID_TPU_ALIGNED_W", "")
    cands = {}
    for w in (w_chunks, w_chunks // 2, w_chunks // 4):
        if w < 4:
            continue
        if gm:
            res = _cover_gm(w)
            if res is None:
                continue
            start_w, winc0_w = res
        else:
            start_w = _cover(w)
            winc0_w = None
        cands[w] = (start_w, winc0_w, *_steps_of(start_w))
    if gm and not cands:
        # Some group's own chunk span defeats every window width:
        # fall back to the chunk-major order.
        return plan_gather_aligned(
            indices, weights, block, r_step, w_chunks,
            max_plan_bytes, gm=False,
        )
    if forced and int(forced) in cands:
        best_w = int(forced)
    else:
        def _cost(item):
            w, (start_w, _, _, _, _, st) = item
            runs = int(start_w.sum())
            return st + runs
        best_w = min(cands.items(), key=_cost)[0]
    w_chunks = best_w
    start, winc0_gm, bucket_start, bid_r, rows_b, _ = cands[w_chunks]
    winc0_r = winc0_gm if gm else _seg_propagate(c_r, start)
    cid_r = c_r - winc0_r

    # Buckets (rows already (block, window)-sorted): each pads its
    # rows to a multiple of r_step.
    n_buckets = int(bid_r[-1]) + 1
    steps_b = -(-rows_b // r_step)
    B_b = B_r[bucket_start]
    w_b = winc0_r[bucket_start]

    # One neutral step per entry-less block (flushes NaN via the zero
    # rwsum), then pow2-granular grid padding for compile-key reuse.
    present = np.zeros(n_blocks, bool)
    present[B_b] = True
    missing = np.flatnonzero(~present)
    n_filled = int(steps_b.sum())
    n_real = n_filled + len(missing)
    gran = 1 << max(4, n_real.bit_length() - 5)
    nsteps = -(-n_real // gran) * gran
    if nsteps * r_step * (1 + qp) * 128 * 4 > max_plan_bytes:
        return None
    if (3 * nsteps + nsteps * r_step // 2) * 4 + 64 > 900_000:
        # SMEM scalar-prefetch budget (~1 MB per core): retry with
        # wider target blocks (fewer steps).
        if block < 2048:
            return plan_gather_aligned(
                indices, weights, block * 2, r_step, w_chunks,
                max_plan_bytes, gm=gm, qp=qp,
            )
        return None

    blkid = np.empty(nsteps, np.int32)
    winc0 = np.empty(nsteps, np.int32)
    blkid[:n_filled] = np.repeat(B_b, steps_b)
    winc0[:n_filled] = np.repeat(w_b, steps_b)
    blkid[n_filled:n_real] = missing.astype(np.int32)
    winc0[n_filled:n_real] = winc0[n_filled - 1] if n_filled else 0
    blkid[n_real:] = blkid[n_real - 1]
    winc0[n_real:] = winc0[n_real - 1]

    # Window-run bookkeeping for the double-buffered DMA.
    wchg = np.empty(nsteps, bool)
    wchg[0] = True
    np.not_equal(winc0[1:], winc0[:-1], out=wchg[1:])
    runid = np.cumsum(wchg) - 1
    run_c0 = winc0[wchg].astype(np.int64)
    nxt = np.full(len(run_c0), -1, np.int64)
    nxt[:-1] = run_c0[1:]
    slot = np.arange(len(run_c0), dtype=np.int64) & 1
    wmeta = (
        slot[runid]
        | (wchg.astype(np.int64) << 1)
        | ((nxt[runid] + 1) << 2)
    ).astype(np.int32)

    # Row placement: global row slot per (bucket, row-within-bucket).
    step_b0 = np.cumsum(steps_b) - steps_b
    row_in_b = np.arange(n_rows) - _seg_propagate(
        np.arange(n_rows, dtype=np.int64), bucket_start
    )
    rslot = step_b0[bid_r] * r_step + row_in_b

    # meta: per row 16 bits (cid 6 | group), two rows per word; gm
    # rows add boundary (1) | previous-group (gbits).
    mrow = cid_r | (g_r << 6)
    if gm:
        bnd = (firstG & ~firstB).astype(np.int64)
        pvg = np.zeros(n_rows, np.int64)
        pvg[1:] = g_r[:-1]
        mrow = mrow | (bnd << (6 + gbits)) | ((bnd * pvg) << (7 + gbits))
    meta_arr = np.zeros(nsteps * r_step, np.int64)
    meta_arr[rslot] = mrow
    if gm:
        # Pad slots (bucket tails + grid tail) must carry the group of
        # the preceding real row: the kernel's register accumulator
        # rides through pads and the per-block final flush stores it to
        # the LAST row slot's group.
        nslots = nsteps * r_step
        filled = np.zeros(nslots, bool)
        filled[rslot] = True
        gslot = np.zeros(nslots, np.int64)
        gslot[rslot] = g_r
        ff = np.maximum.accumulate(
            np.where(filled, np.arange(nslots), 0)
        )
        meta_arr = np.where(filled, meta_arr, gslot[ff] << 6)
    meta = (meta_arr[0::2] | (meta_arr[1::2] << 16)).astype(np.int32)

    # itab / wtab assembly.
    erow = rslot[rid]
    elane = (key & 127).astype(np.int64)
    itab64 = np.zeros((nsteps * r_step, 128), np.int64)
    np.bitwise_or.at(itab64, (erow, elane), (idx7 | 128) << (8 * s_sub))
    itab = (itab64 & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    del itab64
    wtab = np.zeros((nsteps * r_step * qp, 128), np.float32)
    wtab[erow * qp + s_sub, elane] = ew

    rwsum = np.zeros(n_pad, np.float32)
    rwsum[:n] = np.where(valid, weights, 0.0).sum(axis=1)

    return AlignedPlan(
        blkid=blkid,
        winc0=winc0,
        wmeta=wmeta,
        meta=meta,
        itab=itab,
        wtab=wtab,
        rwsum=rwsum,
        n=n,
        block=block,
        r_step=r_step,
        w_chunks=w_chunks,
        gm=bool(gm),
        qp=qp,
    )


def plan_gather_matvec(
    indices: np.ndarray,
    weights: np.ndarray,
    qs: int = 3,
    block: int = A_BLOCK,
    r_step: int = R_STEP,
    w_sups: int = 8,
    max_plan_bytes: int = 1_500_000_000,
) -> AlignedPlan | None:
    """Packed-superchunk matvec plan (round-4 single-RHS SpMV attack).

    The standard aligned plan wastes a single-RHS matvec twice over:
    the source is staged as 8 identical sublane copies (8x slab DMA and
    gather work for one useful row), and a row only spans one 128-value
    source chunk, so a bandwidth-b graph costs ~b/128 rows per target
    group.  Here the source vector is a PURE RESHAPE ``(n_sup, 8,
    128)`` — one slab read exposes 1024 consecutive values — and a row
    covers one (128-target group, 1024-source superchunk) pair.  Each
    (lane, sublane) cell of a row carries up to ``qs`` packed entry
    bytes; the kernel resolves all ``qs*8`` sub-slots of a row with ONE
    ``take_along_axis`` over ``(qs*8, 128)`` (per-sublane lane gathers,
    no cross-sublane traffic) and reduces over both the slot and
    sublane axes at flush.  On the 1M-node RCM Delaunay system this
    plans 58k rows vs the standard keying's 93k, with 7.6x less slab
    DMA (96 MB vs 731 MB per matvec).

    Single chain only: ``method="matvec"``, ``has_nan=False``, one
    right-hand side.  Reference hot loop parity:
    /root/reference/xugrid/ugrid/interpolate.py:308-317 (scipy spsolve /
    CG); the plan feeds the fused PCG while_loop.
    """
    n, _w = indices.shape
    if n == 0 or qs < 1 or qs * 8 % 4:
        return None
    if block & (block - 1) or not GROUP <= block <= 2048:
        raise ValueError("matvec engine: block must be 128..2048 pow2")
    iw = qs * 2  # itab int32 words per row-lane (qs*8 bytes / 4)
    wp = qs * 8  # wtab f32 planes per plan row
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    weights = np.ascontiguousarray(weights, dtype=np.float32)
    while block < 2048 and (
        (3 + r_step // 2) * 4 * (-(-n // block)) + 64 > 900_000
    ):
        block *= 2
    n_blocks = -(-n // block)
    n_pad = n_blocks * block
    n_groups = block // GROUP
    gbits = max(2, int(max(n_groups - 1, 1)).bit_length())
    if 6 + gbits > 16:
        return None

    valid = indices >= 0
    ti, _sl = np.nonzero(valid)
    if len(ti) == 0:
        return None
    src = indices[valid]
    wts = weights[valid]
    if src.max() >= (1 << 24) * CHUNK:
        return None

    B = (ti // block).astype(np.int64)
    g = ((ti % block) // GROUP).astype(np.int64)
    lane = (ti % GROUP).astype(np.int64)
    sup = src >> 10
    sub = (src >> 7) & 7
    idx7 = (src & 127).astype(np.int64)
    smax = int(sup.max()) + 1
    # Sort (block, superchunk, group, lane, sublane): ranks within a
    # (row, lane, sublane) cell become the packed slot index.
    key = ((((B * smax + sup) * n_groups + g) << 10)
           | (lane << 3) | sub)
    order = np.argsort(key, kind="stable")
    key = key[order]
    ew = wts[order]
    idx7 = idx7[order]
    del order, ti, src, wts, B, g, lane
    nnz = len(key)
    pos = np.arange(nnz, dtype=np.int64)
    newc = np.empty(nnz, bool)
    newc[0] = True
    np.not_equal(key[1:], key[:-1], out=newc[1:])
    rank = pos - np.maximum.accumulate(np.where(newc, pos, 0))
    slot_q = rank % qs
    spill = rank // qs
    n_spill = int(spill.max()) + 1
    if n_spill > 1:
        order2 = np.argsort(
            (((key >> 10) * n_spill + spill) << 10) | (key & 1023),
            kind="stable",
        )
        key = key[order2]
        ew = ew[order2]
        idx7 = idx7[order2]
        slot_q = slot_q[order2]
        spill = spill[order2]
        del order2
    sub_e = key & 7
    lane_e = (key >> 3) & 127

    rowkey = (key >> 10) * n_spill + spill
    newr = np.empty(nnz, bool)
    newr[0] = True
    np.not_equal(rowkey[1:], rowkey[:-1], out=newr[1:])
    rid = np.cumsum(newr) - 1
    n_rows = int(rid[-1]) + 1
    bsg = (key >> 10)[newr]
    B_r = bsg // (smax * n_groups)
    c_r = (bsg // n_groups) % smax  # superchunk per row
    g_r = bsg % n_groups

    firstB = np.empty(n_rows, bool)
    firstB[0] = True
    np.not_equal(B_r[1:], B_r[:-1], out=firstB[1:])

    def _cover(w):
        start = firstB.copy()
        while True:
            c0 = _seg_propagate(c_r, start)
            over = (c_r - c0) >= w
            if not over.any():
                break
            cand = over & ~start
            prev_over = np.empty(n_rows, bool)
            prev_over[0] = False
            prev_over[1:] = over[:-1] & ~start[1:]
            newstart = cand & ~prev_over
            start |= newstart
        return start

    def _steps_of(start):
        bucket_start = start | firstB
        bid = np.cumsum(bucket_start) - 1
        rows_b = np.bincount(bid, minlength=int(bid[-1]) + 1)
        return bucket_start, bid, rows_b, int(
            (-(-rows_b // r_step)).sum()
        )

    cands = {}
    for w in (w_sups, w_sups * 2, w_sups * 4):
        if w > 64:
            continue
        start_w = _cover(w)
        cands[w] = (start_w, *_steps_of(start_w))

    def _cost(item):
        w, (start_w, _, _, _, st) = item
        return st + int(start_w.sum())

    w_sups = min(cands.items(), key=_cost)[0]
    start, bucket_start, bid_r, rows_b, _ = cands[w_sups]
    winc0_r = _seg_propagate(c_r, start)
    cid_r = c_r - winc0_r

    n_buckets = int(bid_r[-1]) + 1
    steps_b = -(-rows_b // r_step)
    B_b = B_r[bucket_start]
    w_b = winc0_r[bucket_start]

    present = np.zeros(n_blocks, bool)
    present[B_b] = True
    missing = np.flatnonzero(~present)
    n_filled = int(steps_b.sum())
    n_real = n_filled + len(missing)
    gran = 1 << max(4, n_real.bit_length() - 5)
    nsteps = -(-n_real // gran) * gran
    if nsteps * r_step * (iw + wp) * 128 * 4 > max_plan_bytes:
        return None
    if (3 * nsteps + nsteps * r_step // 2) * 4 + 64 > 900_000:
        if block < 2048:
            return plan_gather_matvec(
                indices, weights, qs, block * 2, r_step, w_sups,
                max_plan_bytes,
            )
        return None

    blkid = np.empty(nsteps, np.int32)
    winc0 = np.empty(nsteps, np.int32)
    blkid[:n_filled] = np.repeat(B_b, steps_b)
    winc0[:n_filled] = np.repeat(w_b, steps_b)
    blkid[n_filled:n_real] = missing.astype(np.int32)
    winc0[n_filled:n_real] = winc0[n_filled - 1] if n_filled else 0
    blkid[n_real:] = blkid[n_real - 1]
    winc0[n_real:] = winc0[n_real - 1]

    wchg = np.empty(nsteps, bool)
    wchg[0] = True
    np.not_equal(winc0[1:], winc0[:-1], out=wchg[1:])
    runid = np.cumsum(wchg) - 1
    run_c0 = winc0[wchg].astype(np.int64)
    nxt = np.full(len(run_c0), -1, np.int64)
    nxt[:-1] = run_c0[1:]
    slot = np.arange(len(run_c0), dtype=np.int64) & 1
    wmeta = (
        slot[runid]
        | (wchg.astype(np.int64) << 1)
        | ((nxt[runid] + 1) << 2)
    ).astype(np.int32)

    step_b0 = np.cumsum(steps_b) - steps_b
    row_in_b = np.arange(n_rows) - _seg_propagate(
        np.arange(n_rows, dtype=np.int64), bucket_start
    )
    rslot = step_b0[bid_r] * r_step + row_in_b

    mrow = cid_r | (g_r << 6)
    meta_arr = np.zeros(nsteps * r_step, np.int64)
    meta_arr[rslot] = mrow
    meta = (meta_arr[0::2] | (meta_arr[1::2] << 16)).astype(np.int32)

    # itab: per row ``iw`` int32 words; byte k = slot_q*8 + sublane
    # lives in word k//4 byte k%4 (bit 7 = valid, bits 0..6 lane-local
    # source index).  wtab: plane slot_q*8 + sublane of the row.
    erow = rslot[rid]
    kpos = slot_q * 8 + sub_e
    itab64 = np.zeros((nsteps * r_step * iw, 128), np.int64)
    np.bitwise_or.at(
        itab64,
        (erow * iw + (kpos >> 2), lane_e),
        (idx7 | 128) << (8 * (kpos & 3)),
    )
    itab = (itab64 & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    del itab64
    wtab = np.zeros((nsteps * r_step * wp, 128), np.float32)
    wtab[erow * wp + kpos, lane_e] = ew

    rwsum = np.zeros(n_pad, np.float32)

    return AlignedPlan(
        blkid=blkid,
        winc0=winc0,
        wmeta=wmeta,
        meta=meta,
        itab=itab,
        wtab=wtab,
        rwsum=rwsum,
        n=n,
        block=block,
        r_step=r_step,
        w_chunks=w_sups,
        gm=False,
        qs=qs,
    )


def matvec_triplets(plan: AlignedPlan):
    """Decode a packed matvec plan back into (target, source, weight)
    triplets — the round-trip oracle for plan-correctness tests."""
    qs = plan.qs
    iw, wp = qs * 2, qs * 8
    r_step = plan.r_step
    nrows = plan.itab.shape[0] // iw  # = nsteps * r_step
    meta16 = np.empty(nrows, np.int64)
    meta = plan.meta.astype(np.int64) & 0xFFFFFFFF
    meta16[0::2] = meta & 0xFFFF
    meta16[1::2] = meta >> 16
    cid = meta16 & 63
    grp = (meta16 >> 6) & (plan.block // GROUP - 1)
    step = np.arange(nrows) // r_step
    c0 = plan.winc0.astype(np.int64)[step]
    blk = plan.blkid.astype(np.int64)[step]

    idxw = plan.itab.view(np.uint32).astype(np.int64)
    tis, sis, ws = [], [], []
    for k in range(qs * 8):
        q, s = k // 8, k % 8
        byte = (idxw[(k >> 2)::iw] >> (8 * (k & 3))) & 255
        ok = byte >= 128
        r, lane = np.nonzero(ok)
        srcv = ((c0[r] + cid[r]) * 1024 + s * 128
                + (byte[r, lane] & 127))
        tgt = blk[r] * plan.block + grp[r] * GROUP + lane
        w = plan.wtab[r * wp + k, lane]
        tis.append(tgt)
        sis.append(srcv)
        ws.append(w)
    return (
        np.concatenate(tis),
        np.concatenate(sis),
        np.concatenate(ws),
    )


def plan_triplets(plan: AlignedPlan):
    """Decode the plan back into (target, source, weight) triplets —
    the round-trip oracle for plan-correctness tests."""
    r_step = plan.r_step
    nrows = plan.itab.shape[0]
    meta16 = np.empty(nrows, np.int64)
    meta = plan.meta.astype(np.int64) & 0xFFFFFFFF
    meta16[0::2] = meta & 0xFFFF
    meta16[1::2] = meta >> 16
    cid = meta16 & 63
    grp = (meta16 >> 6) & (plan.block // GROUP - 1)
    step = np.arange(nrows) // r_step
    c0 = plan.winc0.astype(np.int64)[step]
    blk = plan.blkid.astype(np.int64)[step]

    idxw = plan.itab.view(np.uint32).astype(np.int64)
    qp = getattr(plan, "qp", Q_PACK)
    tis, sis, ws = [], [], []
    for k in range(qp):
        byte = (idxw >> (8 * k)) & 255
        ok = byte >= 128
        r, lane = np.nonzero(ok)
        src = (c0[r] + cid[r]) * CHUNK + (byte[r, lane] & 127)
        tgt = blk[r] * plan.block + grp[r] * GROUP + lane
        w = plan.wtab[r * qp + k, lane]
        tis.append(tgt)
        sis.append(src)
        ws.append(w)
    return (
        np.concatenate(tis),
        np.concatenate(sis),
        np.concatenate(ws),
    )


def _combine(kind, a, b):
    if kind == "sum":
        return a + b
    if kind == "max":
        return jnp.maximum(a, b)
    return jnp.minimum(a, b)


def _neutral(kind):
    return {"sum": 0.0, "max": -jnp.inf, "min": jnp.inf}[kind]


def _make_aligned_kernel(
    method: str,
    has_nan: bool,
    e_sub: int,
    block: int,
    r_step: int,
    w_chunks: int,
    rb: int,
    gm: bool,
    span_steps: int,
    interpret: bool,
    qs: int = 0,
    qp: int = Q_PACK,
):
    chains = _chains(method, has_nan)
    nc = len(chains)
    kinds = [kind for _, kind in chains]
    n_groups = block // GROUP
    gbits = _gbits(block)
    need_mask = method in _RAW_VALUE_METHODS
    if r_step % rb:
        raise ValueError("aligned engine: r_step must be a multiple of rb")
    if qs and (method != "matvec" or has_nan or gm or e_sub != 8):
        raise ValueError(
            "packed matvec kernel: method='matvec', has_nan=False, "
            "gm=False, e_sub=8 required"
        )
    # itab int32 words / wtab f32 planes per plan row (packed rows
    # carry per-sublane tables; standard rows broadcast one word).
    IW = qs * 2 if qs else 1
    WP = qs * 8 if qs else qp

    def kernel(
        blkid_ref, wmeta_ref, winc0_ref, meta_ref,  # SMEM prefetch
        itab_ref, wtab_ref, rwsum_ref,
        src_hbm, out_ref,
        slabs, acc, *rest,
    ):
        rest = list(rest)
        accg = rest.pop(0) if gm else None
        if span_steps:
            itab_s = rest.pop(0)
            wtab_s = rest.pop(0)
            semA = rest.pop()
            semB = rest.pop()
        sem0, sem1 = rest
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)

        if span_steps:
            # Plan-table span streaming: per-step BlockSpec copies of
            # itab/wtab cost ~2 serialized DMA issues per grid step on
            # the scalar core; one double-buffered DMA per span of
            # ``span_steps`` steps amortizes them away.  Even spans
            # ride semA/buf0, odd spans semB/buf1 (each span's wait
            # matches the semaphore its start used: span 0 starts at
            # boot on semA, span k+1 at span k's rotation).
            sp = i // span_steps
            sslot = sp % 2
            soff = (i % span_steps) * r_step
            n_it = span_steps * r_step * IW
            n_wt = span_steps * r_step * WP

            @pl.when(i == 0)
            def _tab_boot():
                pltpu.make_async_copy(
                    itab_ref.at[pl.ds(0, n_it)], itab_s.at[0], semA
                ).start()
                pltpu.make_async_copy(
                    wtab_ref.at[pl.ds(0, n_wt)], wtab_s.at[0], semA
                ).start()

            at_rot = i % span_steps == 0
            nxt_i = (sp + 1) * n_it

            def _rotate(cur_sem, nxt_sem, cur_buf, nxt_buf):
                pltpu.make_async_copy(
                    itab_ref.at[pl.ds(0, n_it)],
                    itab_s.at[cur_buf], cur_sem,
                ).wait()
                pltpu.make_async_copy(
                    wtab_ref.at[pl.ds(0, n_wt)],
                    wtab_s.at[cur_buf], cur_sem,
                ).wait()

                @pl.when(nxt_i < nsteps * r_step * IW)
                def _pref():
                    pltpu.make_async_copy(
                        itab_ref.at[pl.ds(nxt_i, n_it)],
                        itab_s.at[nxt_buf], nxt_sem,
                    ).start()
                    pltpu.make_async_copy(
                        wtab_ref.at[pl.ds((sp + 1) * n_wt, n_wt)],
                        wtab_s.at[nxt_buf], nxt_sem,
                    ).start()

            @pl.when(jnp.logical_and(at_rot, sslot == 0))
            def _rot_even():
                _rotate(semA, semB, 0, 1)

            @pl.when(jnp.logical_and(at_rot, sslot == 1))
            def _rot_odd():
                _rotate(semB, semA, 1, 0)
        cur_b = blkid_ref[i]
        prev = blkid_ref[jnp.maximum(i - 1, 0)]
        nxt_b = blkid_ref[jnp.minimum(i + 1, nsteps - 1)]
        is_first = jnp.logical_or(i == 0, prev != cur_b)
        is_last = jnp.logical_or(i == nsteps - 1, nxt_b != cur_b)

        wm = wmeta_ref[i]
        slot = wm & 1
        wchg = ((wm >> 1) & 1) == 1
        nxt_c0 = (wm >> 2) - 1

        # Double-buffered window DMA: run k computes from slab half
        # k&1 while run k+1 streams into the other half.
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
            jnp.logical_and(
                wchg, jnp.logical_and(nxt_c0 >= 0, slot == 0)
            )
        )
        def _prefetch1():
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(nxt_c0, w_chunks)],
                slabs.at[pl.ds(w_chunks, w_chunks)],
                sem1,
            ).start()

        @pl.when(
            jnp.logical_and(
                wchg, jnp.logical_and(nxt_c0 >= 0, slot == 1)
            )
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

        if gm:
            # Register-carried group accumulator: rows of one group are
            # contiguous (group-major sort), so combine them here and
            # only touch ``acc`` when the group changes — the per-row
            # dynamic acc read-modify-write of the chunk-major order is
            # the kernel's serialization floor.
            accg_val = jnp.where(is_first, initrow, accg[...])

        sbase = slot * w_chunks
        mbase = i * (r_step // 2)
        # Shift table for rb rows x qp sub-slots (row-major: the
        # j-th batched row's sub-slot bytes sit at rows
        # j*qp..j*qp+qp-1).
        bshift = (
            jax.lax.broadcasted_iota(
                jnp.int32, (rb * qp, 128), 0
            )
            % qp
        ) * 8
        if len(set(kinds)) > 1:
            # Mixed combine kinds (min rides a (min, max) chain pair):
            # select per chain band.  Only {min, max} mixes occur.
            bandc = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (nc * e_sub, 128), 0
                )
                // e_sub
            )
            minmask = jnp.zeros((nc * e_sub, 128), bool)
            for ci, kind in enumerate(kinds):
                if kind == "min":
                    minmask = jnp.logical_or(minmask, bandc == ci)

        def expand(x):
            """(K, 128) -> (K*e_sub, 128): each row repeated e_sub
            times consecutively (band-major)."""
            k = x.shape[0]
            return jnp.broadcast_to(
                x[:, None, :], (k, e_sub, 128)
            ).reshape(k * e_sub, 128)

        # rb rows retire per iteration: their Q_PACK sub-slot bytes,
        # weights, and value gathers fuse into ONE shift/mask chain and
        # ONE take_along_axis over (rb*Q_PACK*e_sub, 128) — the
        # serialized per-row VMEM op count (the latency bound at bench
        # widths) drops ~rb-fold; only the slab reads and the
        # accumulator read-modify-writes stay per-row.
        for r0 in range(0, r_step, rb):
            cids = []
            grps = []
            bnds = []
            pvgs = []
            for j in range(rb):
                r = r0 + j
                mw = meta_ref[mbase + (r >> 1)]
                mrow = (mw >> ((r & 1) * 16)) & 0xFFFF
                cids.append(mrow & 63)
                grps.append((mrow >> 6) & (n_groups - 1))
                if gm:
                    bnds.append((mrow >> (6 + gbits)) & 1)
                    pvgs.append((mrow >> (7 + gbits)) & (n_groups - 1))

            if qs:
                # Packed-superchunk matvec rows: the slab read exposes a
                # whole (8, 128) superchunk; byte k = slot*8 + sublane of
                # a row's ``iw`` itab words indexes lane-locally within
                # sublane k%8, and the per-sublane weights come straight
                # from wtab (no broadcast).  One gather resolves all
                # rb*qs*8 sub-slots.
                rowQ = jnp.concatenate(
                    [
                        jnp.broadcast_to(
                            slabs[pl.ds(sbase + cids[j], 1)].reshape(
                                1, 8, 128
                            ),
                            (qs, 8, 128),
                        ).reshape(qs * 8, 128)
                        for j in range(rb)
                    ],
                    axis=0,
                )
                if span_steps:
                    idxw = itab_s[
                        sslot, pl.ds((soff + r0) * IW, rb * IW), :
                    ]
                    wQ = wtab_s[
                        sslot, pl.ds((soff + r0) * WP, rb * WP), :
                    ]
                else:
                    idxw = itab_ref[r0 * IW:(r0 + rb) * IW, :]
                    wQ = wtab_ref[r0 * WP:(r0 + rb) * WP, :]
                idxR = jnp.broadcast_to(
                    idxw[:, None, :], (rb * IW, 4, 128)
                ).reshape(rb * qs * 8, 128)
                bsh = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (rb * qs * 8, 128), 0
                    )
                    % 4
                ) * 8
                byte4 = jnp.right_shift(idxR, bsh) & 255
                val = jnp.take_along_axis(rowQ, byte4 & 127, axis=1)
                q0 = jnp.where(wQ != 0.0, wQ * val, 0.0)
                for j in range(rb):
                    tot = q0[
                        j * qs * 8:(j + 1) * qs * 8
                    ].reshape(qs, 8, 128).sum(axis=0)
                    cur = acc[pl.ds(grps[j], 1)].reshape(8, 128)
                    acc[pl.ds(grps[j], 1)] = (cur + tot).reshape(
                        1, 8, 128
                    )
                continue

            if span_steps:
                idxw = itab_s[sslot, pl.ds(soff + r0, rb), :]
                wrows = wtab_s[
                    sslot, pl.ds((soff + r0) * qp, rb * qp), :
                ]
            else:
                idxw = itab_ref[r0:r0 + rb, :]        # (rb, 128)
                wrows = wtab_ref[r0 * qp:(r0 + rb) * qp, :]
            idxR = jnp.broadcast_to(
                idxw[:, None, :], (rb, qp, 128)
            ).reshape(rb * qp, 128)
            byte4 = jnp.right_shift(idxR, bshift) & 255
            rowQ = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        slabs[pl.ds(sbase + cids[j], 1)].reshape(
                            1, e_sub, 128
                        ),
                        (qp, e_sub, 128),
                    ).reshape(qp * e_sub, 128)
                    for j in range(rb)
                ],
                axis=0,
            )
            idxQ = expand(byte4 & 127)
            val = jnp.take_along_axis(rowQ, idxQ, axis=1)
            wQ = expand(wrows)
            quants = _lane_quantities(method, has_nan, val, wQ)
            if need_mask:
                okQ = expand(byte4 >= 128)
                quants = [
                    jnp.where(okQ, q, jnp.float32(_neutral(kind)))
                    for q, kind in zip(quants, kinds)
                ]
            for j in range(rb):
                # Band-reduce row j's qp sub-slots, stack chains.
                parts = []
                for q, kind in zip(quants, kinds):
                    x = q[
                        j * qp * e_sub:(j + 1) * qp * e_sub
                    ].reshape(qp, e_sub, 128)
                    while x.shape[0] > 1:
                        h = x.shape[0] // 2
                        x = _combine(kind, x[:h], x[h:])
                    parts.append(x.reshape(e_sub, 128))
                tot = (
                    jnp.concatenate(parts, axis=0)
                    if nc > 1
                    else parts[0]
                )
                if gm:
                    # Group boundary: flush the finished group's
                    # register accumulator (groups are contiguous, so
                    # this is a plain store), then restart from this
                    # row's partial.  Non-boundary rows combine in
                    # registers — no VMEM round trip.
                    bnd_j = bnds[j] == 1

                    @pl.when(bnd_j)
                    def _gflush(av=accg_val, pv=pvgs[j]):
                        acc[pl.ds(pv, 1)] = av.reshape(
                            1, nc * e_sub, 128
                        )

                    if len(set(kinds)) == 1:
                        comb = _combine(kinds[0], accg_val, tot)
                    else:
                        comb = jnp.where(
                            minmask,
                            jnp.minimum(accg_val, tot),
                            jnp.maximum(accg_val, tot),
                        )
                    accg_val = jnp.where(bnd_j, tot, comb)
                else:
                    # Same-group rows within a batch stay correct: the
                    # sequential dynamic-index RMWs below alias through
                    # VMEM and Mosaic orders them.
                    cur = acc[pl.ds(grps[j], 1)].reshape(
                        nc * e_sub, 128
                    )
                    if len(set(kinds)) == 1:
                        new = _combine(kinds[0], cur, tot)
                    else:
                        new = jnp.where(
                            minmask,
                            jnp.minimum(cur, tot),
                            jnp.maximum(cur, tot),
                        )
                    acc[pl.ds(grps[j], 1)] = new.reshape(
                        1, nc * e_sub, 128
                    )

        if gm:
            accg[...] = accg_val

        @pl.when(is_last)
        def _flush():
            if gm:
                # The block's final group only ends at the block end:
                # store the register accumulator to the LAST row slot's
                # group (pad slots carry the preceding real row's
                # group, so tails and missing-block steps stay safe).
                mw_last = meta_ref[mbase + r_step // 2 - 1]
                mrow_last = (mw_last >> 16) & 0xFFFF
                g_last = (mrow_last >> 6) & (n_groups - 1)
                acc[pl.ds(g_last, 1)] = accg_val.reshape(
                    1, nc * e_sub, 128
                )
            for gi in range(n_groups):
                if qs:
                    # Packed matvec: the 8 sublane rows hold per-source-
                    # sublane PARTIAL sums; the result is their sum,
                    # broadcast so any output row is the matvec.
                    part = acc[pl.ds(gi, 1)].reshape(8, 128)
                    tot = jnp.sum(part, axis=0, keepdims=True)
                    out_ref[:, gi * GROUP:(gi + 1) * GROUP] = (
                        jnp.broadcast_to(tot, (8, 128))
                    )
                    continue
                den = rwsum_ref[:, gi * GROUP:(gi + 1) * GROUP]
                stacked = acc[pl.ds(gi, 1)].reshape(nc * e_sub, 128)
                parts = [
                    stacked[ci * e_sub:(ci + 1) * e_sub]
                    for ci in range(nc)
                ]
                out_ref[:, gi * GROUP:(gi + 1) * GROUP] = _finalize(
                    method, has_nan, parts, den
                )

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "method", "has_nan", "block", "r_step", "w_chunks",
        "n_blocks", "rb", "gm", "span_steps", "qs", "qp",
        "interpret",
    ),
)
def gather_aligned_apply(
    srcE, blkid, wmeta, winc0, meta, itab, wtab, rwsum,
    method: str = "mean",
    has_nan: bool = True,
    block: int = A_BLOCK,
    r_step: int = R_STEP,
    w_chunks: int = W_CHUNKS,
    n_blocks: int = 1,
    rb: int = R_BATCH,
    gm: bool = False,
    span_steps: int = 0,
    qs: int = 0,
    qp: int = Q_PACK,
    interpret: bool = False,
):
    """Target-aligned banded apply: plan arrays from
    ``plan_gather_aligned``; srcE staged by ``stage_source_aligned``.

    ``span_steps`` > 0 streams itab/wtab via one manual
    double-buffered DMA per span instead of two per-step BlockSpec
    copies (see _make_aligned_kernel); requires
    nsteps % span_steps == 0 (the planner pads nsteps to a multiple of
    16).

    ``qs`` > 0 runs the packed-superchunk matvec variant (plan from
    ``plan_gather_matvec``): srcE is one (1, m_pad) row with
    m_pad % 1024 == 0, reshaped in place to (m_pad//1024, 8, 128)
    superchunks; every output sublane carries the full matvec."""
    e_sub, m_pad = srcE.shape
    if qs:
        e_sub = 8
        chunks = srcE.reshape(-1, 8, CHUNK)
    else:
        ctot = m_pad // CHUNK
        chunks = srcE.reshape(e_sub, ctot, CHUNK).transpose(1, 0, 2)
    nsteps = blkid.shape[0]
    n_pad = n_blocks * block
    nc = len(_chains(method, has_nan))
    if span_steps and nsteps % span_steps:
        span_steps = 0
    IW = qs * 2 if qs else 1
    WP = qs * 8 if qs else qp

    if span_steps:
        tab_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        tab_scratch = [
            pltpu.VMEM(
                (2, span_steps * r_step * IW, 128), jnp.int32
            ),
            pltpu.VMEM(
                (2, span_steps * r_step * WP, 128), jnp.float32
            ),
        ]
        tab_sems = [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    else:
        tab_specs = [
            pl.BlockSpec((r_step * IW, 128), lambda i, *_: (i, 0)),
            pl.BlockSpec(
                (r_step * WP, 128), lambda i, *_: (i, 0)
            ),
        ]
        tab_scratch = []
        tab_sems = []

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsteps,),
        in_specs=tab_specs + [
            pl.BlockSpec(
                (1, block), lambda i, blk, *_: (0, blk[i])
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (e_sub, block), lambda i, blk, *_: (0, blk[i])
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * w_chunks, e_sub, 128), jnp.float32),
            pltpu.VMEM(
                (block // GROUP, nc * e_sub, 128), jnp.float32
            ),
            *(
                [pltpu.VMEM((nc * e_sub, 128), jnp.float32)]
                if gm
                else []
            ),
            *tab_scratch,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            *tab_sems,
        ],
    )

    kernel = _make_aligned_kernel(
        method, has_nan, e_sub, block, r_step, w_chunks, rb, gm,
        span_steps, interpret, qs=qs, qp=qp,
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
        blkid, wmeta, winc0, meta, itab, wtab,
        rwsum.reshape(1, -1), chunks,
    )


def stage_source_aligned(
    source2d: np.ndarray, plan: AlignedPlan
) -> np.ndarray:
    """(n_extra, m) -> (e_sub, m_pad) staged for the aligned kernel."""
    n_extra, m = source2d.shape
    e_sub = pad_sublanes(n_extra)
    c_needed = (
        int(plan.winc0.max()) + plan.w_chunks if len(plan.winc0) else 1
    )
    ctot = max(-(-m // CHUNK), c_needed)
    out = np.zeros((e_sub, ctot * CHUNK), np.float32)
    out[:n_extra, :m] = source2d
    return out


#: pinned device copies of plan tables, keyed by plan identity: repeat
#: applies of one plan (regridders over time slices, chunked applies)
#: must not re-upload itab/wtab over the remote tunnel every call —
#: measured as the dominant per-call cost on repeat 1M-system solves.
#: Entries pin the plan object, so an id() can never be reused while
#: its entry lives; the cache is bounded like the plan caches.
_PLAN_DEV_CACHE: dict = {}


def _plan_device_arrays(plan: AlignedPlan):
    ent = _PLAN_DEV_CACHE.get(id(plan))
    if ent is not None and ent[0] is plan:
        return ent[1]
    dev = (
        jnp.asarray(plan.blkid), jnp.asarray(plan.wmeta),
        jnp.asarray(plan.winc0), jnp.asarray(plan.meta),
        jnp.asarray(plan.itab), jnp.asarray(plan.wtab),
        jnp.asarray(plan.rwsum),
    )
    if len(_PLAN_DEV_CACHE) > 4:
        _PLAN_DEV_CACHE.clear()
    _PLAN_DEV_CACHE[id(plan)] = (plan, dev)
    return dev


def aligned_apply(
    source2d: np.ndarray,
    plan: AlignedPlan,
    method: str = "mean",
    has_nan: bool | None = None,
    interpret: bool = False,
) -> np.ndarray:
    """Stage + run the aligned kernel; returns (n_target, n_extra)."""
    if has_nan is None:
        # Non-finite (inf as well as NaN) rides the NaN chains: the
        # has_nan=False fast paths assume 0 * v == 0 on pad slots.
        has_nan = not bool(np.isfinite(source2d).all())
    qp = getattr(plan, "qp", Q_PACK)
    srcE = stage_source_aligned(source2d, plan)
    # Narrow-pack plans batch more rows so one fused gather stays near
    # the default (rb * Q_PACK * e_sub, 128) working shape.
    rb = min(plan.r_step, R_BATCH * (Q_PACK // qp))
    while plan.r_step % rb:
        rb -= 1
    out = gather_aligned_apply(
        jnp.asarray(srcE),
        *_plan_device_arrays(plan),
        method=method,
        has_nan=bool(has_nan),
        block=plan.block,
        r_step=plan.r_step,
        w_chunks=plan.w_chunks,
        n_blocks=len(plan.rwsum) // plan.block,
        rb=rb,
        gm=plan.gm,
        span_steps=default_span_steps(),
        qp=qp,
        interpret=interpret,
    )
    return np.asarray(out)[: source2d.shape[0], : plan.n].T


def stage_source_matvec(
    x: np.ndarray, plan: AlignedPlan
) -> np.ndarray:
    """(m,) -> (1, m_pad) staged for the packed matvec kernel: zero-pad
    to a whole number of 1024-value superchunks covering the plan's
    windows (the kernel reshapes in place, no copies)."""
    m = x.shape[-1]
    s_needed = (
        int(plan.winc0.max()) + plan.w_chunks if len(plan.winc0) else 1
    )
    stot = max(-(-m // 1024), s_needed)
    out = np.zeros((1, stot * 1024), np.float32)
    out[0, :m] = x.reshape(-1)
    return out


def matvec_apply(
    x: np.ndarray,
    plan: AlignedPlan,
    interpret: bool = False,
) -> np.ndarray:
    """Stage + run the packed matvec kernel; returns (n,) = A @ x."""
    srcE = stage_source_matvec(np.asarray(x, np.float32), plan)
    out = gather_aligned_apply(
        jnp.asarray(srcE),
        jnp.asarray(plan.blkid),
        jnp.asarray(plan.wmeta),
        jnp.asarray(plan.winc0),
        jnp.asarray(plan.meta),
        jnp.asarray(plan.itab),
        jnp.asarray(plan.wtab),
        jnp.asarray(plan.rwsum),
        method="matvec",
        has_nan=False,
        block=plan.block,
        r_step=plan.r_step,
        w_chunks=plan.w_chunks,
        n_blocks=len(plan.rwsum) // plan.block,
        qs=plan.qs,
        span_steps=default_span_steps(),
        interpret=interpret,
    )
    return np.asarray(out)[0, : plan.n]


def default_span_steps() -> int:
    """Plan-table span streaming width (XUGRID_TPU_ALIGNED_SPAN;
    0 = per-step BlockSpec copies).  The planner pads nsteps to a
    multiple of 16, so 16 always divides; other values fall back to 0
    per-call when they do not divide nsteps."""
    try:
        return int(os.environ.get("XUGRID_TPU_ALIGNED_SPAN", "0"))
    except ValueError:
        return 0
