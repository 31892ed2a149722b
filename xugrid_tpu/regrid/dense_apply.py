"""Dense quad-packed gather engine (the round-3 flagship redesign).

Replaces the stream engine's fixed (block, span-column) superpacket
grid with densely packed rows (reference hot loop:
/root/reference/xugrid/regrid/regridder.py:41-69):

- **Quad sub-slots**: each ptab lane carries up to ``Q_PACK=4``
  consecutive entries of ONE target from ONE source chunk (four
  128-lane gathers + a fused combine per row).  Real overlap windows
  put ~3 entries per (target, chunk), so a whole per-chunk run
  collapses into one lane — the segmented Hillis-Steele scan and its
  masks vanish for typical meshes (``scan_steps == 0``).
- **Dense rows**: every row carries its own window-local chunk id in
  SMEM meta (6 bits) instead of sitting in a fixed span column, so a
  bucket needs ``ceil(rows / r_step)`` steps with no max-over-columns
  skew.  On the 1M bench matrix this is 16.7k row slots / 1.0k grid
  steps vs the stream engine's 32.8k / 4.1k.
- **Two-group tail**: a row's lanes span at most two 128-target
  groups (the planner sub-splits wider rows), so segment-end routing
  is two broadcast gathers + two dynamic accumulator updates instead
  of a broadcast over every group in the block.
- **Manual double-buffered window DMA**: each bucket reads one
  ``w_chunks``-chunk slab at an arbitrary (unaligned) chunk base; the
  next window streams into the other slab while this one computes.

Plan arrays are all-numpy and reusable across applies.
"""

from __future__ import annotations

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
    PAYLOAD,
    _chains,
    _finalize,
    _lane_quantities,
    _roll_lanes,
    pad_sublanes,
)

#: sub-entries packed per ptab lane (gathers per row).
Q_PACK = 4

#: chunks per resident source window (<= 64: the meta cid field is 6
#: bits).
W_CHUNKS = 64

#: rows processed per grid step.
R_STEP = 16

#: targets per output block (4 gather groups).
D_BLOCK = 512

#: methods with at least one chain not gated by weight==0 need the
#: explicit bit-7 sub-slot mask: sum/min/max use raw values, and
#: geometric_mean's negs chain tests ``val < 0`` irrespective of
#: weight (an ungated garbage gather of a chunk's lane-0 value would
#: poison the whole target to NaN).
_RAW_VALUE_METHODS = ("sum", "min", "max", "geometric_mean")


class DensePlan(NamedTuple):
    """Quad-packed dense-row plan (all numpy)."""

    blkid: np.ndarray    # (nsteps,) i32 target block per step
    winc0: np.ndarray    # (nsteps,) i32 absolute first chunk of the
    #                      step's resident source window
    wmeta: np.ndarray    # (nsteps,) i32: bit0 slab parity, bit1
    #                      window-run start, bits 2.. next run's first
    #                      chunk + 1 (0 = no next run)
    meta: np.ndarray     # (nsteps*r_step//2,) i32 packed per-row pairs
    #                      (16 bits each): cid (6) | g0 | g1
    ptab: np.ndarray     # (nsteps*r_step, 8, 128) i32 planes: 0 packed
    #                      idx bytes (bit 7 = sub-slot valid, bits 0..6
    #                      lane-local source idx), 1..4 f32 weight bits
    #                      per sub-slot, 5 ends (g0 end lane | g1 end
    #                      lane << 8; 0 = absent), 6 segment ids
    #                      (-1 pad), 7 unused
    rwsum: np.ndarray    # (n_pad,) f32 total window weight per target
    scan_steps: int      # over PACKED lanes (0 when runs <= Q_PACK)
    n: int
    block: int
    r_step: int
    w_chunks: int

    @property
    def nsteps(self) -> int:
        return len(self.blkid)


def _seg_propagate(values, starts):
    """Per-element value at the most recent True in ``starts``."""
    pos = np.arange(len(values), dtype=np.int64)
    idx = np.maximum.accumulate(np.where(starts, pos, 0))
    return values[idx]


def plan_gather_dense(
    indices: np.ndarray,
    weights: np.ndarray | None = None,
    block: int = D_BLOCK,
    r_step: int = R_STEP,
    w_chunks: int = W_CHUNKS,
    q_pack: int = Q_PACK,
    max_plan_bytes: int = 1_500_000_000,
) -> DensePlan | None:
    """Build the dense quad-packed plan, or None when the problem
    shape defeats it (the caller falls back to the stream engine)."""
    n, _w = indices.shape
    if n == 0:
        return None
    if block & (block - 1) or not GROUP <= block <= 1024:
        raise ValueError("dense engine: block must be 128/256/512/1024")
    if r_step % 2 or w_chunks > 64 or q_pack != 4:
        raise ValueError("dense engine: unsupported packing parameters")
    if weights is None:
        weights = np.zeros(indices.shape, np.float32)
    # Steps floor at one per target block: skip straight to the widest
    # block when the floor alone would blow the SMEM scalar budget
    # (saves a full wasted planning pass at the 10M scale).
    while block < 1024 and (
        (3 + r_step // 2) * 4 * (-(-n // block)) + 64 > 900_000
    ):
        block *= 2
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    weights = np.ascontiguousarray(weights, dtype=np.float32)
    n_blocks = -(-n // block)
    n_pad = n_blocks * block
    n_groups = block // GROUP

    valid = indices >= 0
    ti, _sl = np.nonzero(valid)
    if len(ti) == 0:
        return None
    src = indices[valid]
    wts = weights[valid]
    if src.max() >= (1 << 24) * CHUNK:
        return None

    # Sort entries by (block, chunk, target slot, lane-local idx).
    B = (ti // block).astype(np.int64)
    tslot = (ti % block).astype(np.int64)
    chunk = src >> 7
    key = (((B << 24) | chunk) << 17) | (tslot << 7) | (src & 127)
    order = np.argsort(key)
    key = key[order]
    ew = wts[order]
    del order, ti, src, wts, B, tslot, chunk
    idx7 = (key & 127).astype(np.int64)
    nnz = len(key)
    pos = np.arange(nnz, dtype=np.int64)

    # Target runs within (block, chunk) -> sub-slot and packed lane.
    tkey = key >> 7
    newt = np.empty(nnz, bool)
    newt[0] = True
    np.not_equal(tkey[1:], tkey[:-1], out=newt[1:])
    tstart = np.maximum.accumulate(np.where(newt, pos, 0))
    post = pos - tstart
    s_sub = post % q_pack
    lseq = post // q_pack

    # Lane-level arrays (one element per packed lane, in entry order).
    tid = np.cumsum(newt) - 1
    cnt_t = np.bincount(tid)
    lanes_t = -(-cnt_t // q_pack)
    n_lanes = int(lanes_t.sum())
    lane_base_t = np.cumsum(lanes_t) - lanes_t
    lane_gid = lane_base_t[tid] + lseq        # entry -> global lane id

    t_of_lane = np.repeat(
        np.arange(len(cnt_t), dtype=np.int64), lanes_t
    )
    tkey_t = tkey[newt]
    bc_lane = tkey_t[t_of_lane] >> 10
    ts_lane = tkey_t[t_of_lane] & 0x3FF
    g_lane = ts_lane // GROUP
    lpos = np.arange(n_lanes, dtype=np.int64)

    # First-pass rows: PAYLOAD lanes per (block, chunk).
    newc_l = np.empty(n_lanes, bool)
    newc_l[0] = True
    np.not_equal(bc_lane[1:], bc_lane[:-1], out=newc_l[1:])
    cstart = np.maximum.accumulate(np.where(newc_l, lpos, 0))
    r0 = (lpos - cstart) // PAYLOAD

    # Sub-split rows whose lanes span >2 target groups: bucket lanes
    # by (rank of the lane's distinct group within the row) // 2 —
    # each sub-row then holds at most two distinct groups.
    rowkey = (bc_lane << 14) | r0
    newr = np.empty(n_lanes, bool)
    newr[0] = True
    np.not_equal(rowkey[1:], rowkey[:-1], out=newr[1:])
    gchg = np.empty(n_lanes, bool)
    gchg[0] = True
    np.not_equal(g_lane[1:], g_lane[:-1], out=gchg[1:])
    gchg |= newr
    grank = np.cumsum(gchg) - 1
    grank0 = np.maximum.accumulate(np.where(newr, grank, 0))
    sub = (grank - grank0) // 2

    # Final rows + 1-based lane index (lane 0 is the neutral dummy).
    newf = np.empty(n_lanes, bool)
    newf[0] = True
    newf[1:] = newr[1:] | (sub[1:] != sub[:-1])
    rid_l = np.cumsum(newf) - 1
    rstart = np.maximum.accumulate(np.where(newf, lpos, 0))
    lane_l = lpos - rstart + 1
    n_rows = int(rid_l[-1]) + 1

    # Residual packed-run scan depth (row boundaries split runs).
    tchg_l = np.empty(n_lanes, bool)
    tchg_l[0] = True
    np.not_equal(
        t_of_lane[1:], t_of_lane[:-1], out=tchg_l[1:]
    )
    tchg_l |= newf
    rs = np.maximum.accumulate(np.where(tchg_l, lpos, 0))
    max_run = int((lpos - rs).max()) + 1
    scan_steps = (
        max(0, int(np.ceil(np.log2(max_run)))) if max_run > 1 else 0
    )

    # Per-row block / chunk / group pair.
    B_r = (bc_lane >> 24)[newf]
    c_r = (bc_lane & ((1 << 24) - 1))[newf]
    g0_r = g_lane[newf]
    g1_r = np.zeros(n_rows, np.int64)
    np.maximum.at(g1_r, rid_l, g_lane)

    # Greedy window cover per block over the rows' chunks.
    firstB = np.empty(n_rows, bool)
    firstB[0] = True
    np.not_equal(B_r[1:], B_r[:-1], out=firstB[1:])
    start = firstB.copy()
    while True:
        c0 = _seg_propagate(c_r, start)
        over = (c_r - c0) >= w_chunks
        if not over.any():
            break
        # The first overflowing lane of each covered run starts the
        # next window; recompute until the cover converges.
        cand = over & ~start
        prev_over = np.empty(n_rows, bool)
        prev_over[0] = False
        prev_over[1:] = over[:-1] & ~start[1:]
        newstart = cand & ~prev_over
        start |= newstart
    winc0_r = _seg_propagate(c_r, start)
    cid_r = c_r - winc0_r

    # Buckets (rows already (block, window)-sorted): each pads its
    # rows to a multiple of r_step.
    bucket_start = start | firstB
    bid_r = np.cumsum(bucket_start) - 1
    n_buckets = int(bid_r[-1]) + 1
    rows_b = np.bincount(bid_r, minlength=n_buckets)
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
    if nsteps * r_step * 8 * 128 * 4 > max_plan_bytes:
        return None
    if (3 * nsteps + nsteps * r_step // 2) * 4 + 64 > 900_000:
        # SMEM scalar-prefetch budget (~1 MB per core).  The step count
        # floors at one per 512-target block; >10M-target problems blow
        # the budget at block=512, so retry with 1024-target blocks
        # (the plan key packs target slots in 10 bits, capping block at
        # 1024; the row sub-split keeps rows at <=2 groups regardless).
        if block < 1024:
            return plan_gather_dense(
                indices, weights, block * 2, r_step, w_chunks, q_pack,
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

    # meta: per row 16 bits (cid 6 | g0 | g1), two rows per word.
    gbits = max(2, int(max(n_groups - 1, 1)).bit_length())
    if 6 + 2 * gbits > 16:
        return None
    mrow = cid_r | (g0_r << 6) | (g1_r << (6 + gbits))
    meta_arr = np.zeros(nsteps * r_step, np.int64)
    meta_arr[rslot] = mrow
    meta = (meta_arr[0::2] | (meta_arr[1::2] << 16)).astype(np.int32)

    # ptab assembly.
    ptab = np.zeros((nsteps * r_step, 8, 128), np.int32)
    ptab[:, 6, :] = -1
    erow = rslot[rid_l[lane_gid]]
    elane = lane_l[lane_gid]
    idxw = np.zeros((nsteps * r_step, 128), np.int64)
    np.bitwise_or.at(idxw, (erow, elane), (idx7 | 128) << (8 * s_sub))
    ptab[:, 0, :] = (idxw & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    del idxw
    for k in range(q_pack):
        sel = s_sub == k
        ptab[erow[sel], 1 + k, elane[sel]] = ew[sel].view(np.int32)
    ptab[rslot[rid_l], 6, lane_l] = ts_lane.astype(np.int32)
    # ends: last lane of each (row, target); byte side by group.
    lkey = (rid_l << 10) | ts_lane
    lastl = np.empty(n_lanes, bool)
    lastl[-1] = True
    np.not_equal(lkey[1:], lkey[:-1], out=lastl[:-1])
    r_last = rid_l[lastl]
    t7 = ts_lane[lastl] % GROUP
    side = (g_lane[lastl] != g0_r[r_last]).astype(np.int64)
    np.bitwise_or.at(
        ptab[:, 5, :],
        (rslot[r_last], t7),
        (lane_l[lastl] << (8 * side)).astype(np.int32),
    )

    rwsum = np.zeros(n_pad, np.float32)
    rwsum[:n] = np.where(valid, weights, 0.0).sum(axis=1)

    return DensePlan(
        blkid=blkid,
        winc0=winc0,
        wmeta=wmeta,
        meta=meta,
        ptab=ptab,
        rwsum=rwsum,
        scan_steps=scan_steps,
        n=n,
        block=block,
        r_step=r_step,
        w_chunks=w_chunks,
    )


def plan_triplets(plan: DensePlan):
    """Decode the plan back into (target, source, weight) triplets —
    the round-trip oracle for plan-correctness tests."""
    r_step, W = plan.r_step, plan.w_chunks
    gbits = max(2, int(max(plan.block // GROUP - 1, 1)).bit_length())
    nrows = plan.ptab.shape[0]
    meta16 = np.empty(nrows, np.int64)
    meta = plan.meta.astype(np.int64) & 0xFFFFFFFF
    meta16[0::2] = meta & 0xFFFF
    meta16[1::2] = meta >> 16
    cid = meta16 & 63
    g0 = (meta16 >> 6) & ((1 << gbits) - 1)
    g1 = (meta16 >> (6 + gbits)) & ((1 << gbits) - 1)
    step = np.arange(nrows) // r_step
    c0 = plan.winc0.astype(np.int64)[step]
    blk = plan.blkid.astype(np.int64)[step]

    idxw = plan.ptab[:, 0, :].view(np.uint32).astype(np.int64)
    seg = plan.ptab[:, 6, :].astype(np.int64)
    # Every real lane's target group must be one of the row's two
    # routed groups (validates the g0/g1 meta encoding, not just
    # indices/weights).
    lane_real = seg >= 0
    lane_real[:, 0] = False  # lane 0 is the neutral dummy
    r, lane = np.nonzero(lane_real)
    lane_g = seg[r, lane] // GROUP
    assert ((lane_g == g0[r]) | (lane_g == g1[r])).all(), (
        "plan meta g0/g1 disagree with lane segments"
    )
    tis, sis, ws = [], [], []
    for k in range(Q_PACK):
        byte = (idxw >> (8 * k)) & 255
        ok = byte >= 128
        r, lane = np.nonzero(ok)
        src = (c0[r] + cid[r]) * CHUNK + (byte[r, lane] & 127)
        tgt = blk[r] * plan.block + seg[r, lane]
        w = plan.ptab[:, 1 + k, :].view(np.float32)[r, lane]
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


def _make_dense_kernel(
    method: str,
    has_nan: bool,
    scan_steps: int,
    e_sub: int,
    block: int,
    r_step: int,
    w_chunks: int,
    interpret: bool,
):
    chains = _chains(method, has_nan)
    n_groups = block // GROUP
    gbits = max(2, int(max(n_groups - 1, 1)).bit_length())
    gmask = (1 << gbits) - 1
    # Weight gating in _lane_quantities already neutralizes invalid
    # sub-slots for the weighted chains; raw-value chains need the
    # explicit bit-7 mask.
    need_mask = method in _RAW_VALUE_METHODS

    def kernel(
        blkid_ref, wmeta_ref, winc0_ref, meta_ref,  # SMEM prefetch
        ptab_ref, rwsum_ref,
        src_hbm, out_ref,
        slabs, *scr,
    ):
        accs = scr[: len(chains)]
        sem0, sem1 = scr[len(chains):]
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)
        cur = blkid_ref[i]
        prev = blkid_ref[jnp.maximum(i - 1, 0)]
        nxt_b = blkid_ref[jnp.minimum(i + 1, nsteps - 1)]
        is_first = jnp.logical_or(i == 0, prev != cur)
        is_last = jnp.logical_or(i == nsteps - 1, nxt_b != cur)

        wm = wmeta_ref[i]
        slot = wm & 1
        wchg = ((wm >> 1) & 1) == 1
        nxt_c0 = (wm >> 2) - 1

        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        # Double-buffered window DMA: run k computes from slab half
        # k&1 while run k+1 streams into the other half.  Step 0
        # boots the first window (one synchronous bubble).
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

        @pl.when(is_first)
        def _init():
            for ci, (_, kind) in enumerate(chains):
                accs[ci][...] = jnp.full(
                    (n_groups, e_sub, 128), _neutral(kind), jnp.float32
                )

        tab = ptab_ref[...]                     # (r_step, 8, 128)
        sbase = slot * w_chunks
        mwords = meta_ref
        mbase = i * (r_step // 2)

        for r in range(r_step):
            mw = mwords[mbase + (r >> 1)]
            mrow = (mw >> ((r & 1) * 16)) & 0xFFFF
            cid = mrow & 63
            g0 = (mrow >> 6) & gmask
            g1 = (mrow >> (6 + gbits)) & gmask

            row = slabs[pl.ds(sbase + cid, 1)].reshape(e_sub, 128)
            idxw = tab[r, 0:1, :]               # (1, 128)

            total = [None] * len(chains)
            for k in range(Q_PACK):
                byte = (idxw >> (8 * k)) & 255
                idx = jnp.broadcast_to(byte & 127, (e_sub, 128))
                val = jnp.take_along_axis(row, idx, axis=1)
                w_row = jax.lax.bitcast_convert_type(
                    tab[r, 1 + k:2 + k, :], jnp.float32
                )
                qs = _lane_quantities(method, has_nan, val, w_row)
                if need_mask:
                    ok = byte >= 128
                    qs = [
                        jnp.where(ok, q, jnp.float32(_neutral(kind)))
                        for q, (_, kind) in zip(qs, chains)
                    ]
                for ci, (_, kind) in enumerate(chains):
                    total[ci] = (
                        qs[ci]
                        if total[ci] is None
                        else _combine(kind, total[ci], qs[ci])
                    )
            # Lane 0 is the neutral dummy that absent targets' end
            # routing resolves to.
            total = [
                jnp.where(lanes == 0, jnp.float32(_neutral(kind)), t)
                for t, (_, kind) in zip(total, chains)
            ]

            if scan_steps:
                seg = tab[r, 6:7, :]
                for j in range(scan_steps):
                    s = 1 << j
                    seg_r = _roll_lanes(seg, s, interpret)
                    m = jnp.logical_and(lanes >= s, seg_r == seg)
                    for ci, (_, kind) in enumerate(chains):
                        xr = _roll_lanes(total[ci], s, interpret)
                        if kind == "sum":
                            total[ci] = total[ci] + jnp.where(
                                m, xr, 0.0
                            )
                        else:
                            total[ci] = jnp.where(
                                m,
                                _combine(kind, total[ci], xr),
                                total[ci],
                            )

            e01 = tab[r, 5:6, :]
            e0 = jnp.broadcast_to(e01 & 255, (e_sub, 128))
            e1 = jnp.broadcast_to((e01 >> 8) & 255, (e_sub, 128))
            for ci, (_, kind) in enumerate(chains):
                routed0 = jnp.take_along_axis(total[ci], e0, axis=1)
                cur0 = accs[ci][pl.ds(g0, 1)]
                accs[ci][pl.ds(g0, 1)] = _combine(
                    kind, cur0, routed0.reshape(1, e_sub, 128)
                )
                routed1 = jnp.take_along_axis(total[ci], e1, axis=1)
                cur1 = accs[ci][pl.ds(g1, 1)]
                accs[ci][pl.ds(g1, 1)] = _combine(
                    kind, cur1, routed1.reshape(1, e_sub, 128)
                )

        @pl.when(is_last)
        def _flush():
            for g in range(n_groups):
                den = rwsum_ref[:, g * GROUP:(g + 1) * GROUP]
                parts = [
                    accs[ci][pl.ds(g, 1)].reshape(e_sub, 128)
                    for ci in range(len(chains))
                ]
                out_ref[:, g * GROUP:(g + 1) * GROUP] = _finalize(
                    method, has_nan, parts, den
                )

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "method", "has_nan", "scan_steps", "block", "r_step",
        "w_chunks", "n_blocks", "interpret",
    ),
)
def gather_dense_apply(
    srcE, blkid, wmeta, winc0, meta, ptab, rwsum,
    method: str = "mean",
    has_nan: bool = True,
    scan_steps: int = 0,
    block: int = D_BLOCK,
    r_step: int = R_STEP,
    w_chunks: int = W_CHUNKS,
    n_blocks: int = 1,
    interpret: bool = False,
):
    """Dense quad-packed apply: plan arrays from
    ``plan_gather_dense``; srcE staged by ``stage_source_dense``."""
    e_sub, m_pad = srcE.shape
    ctot = m_pad // CHUNK
    chunks = srcE.reshape(e_sub, ctot, CHUNK).transpose(1, 0, 2)
    nsteps = blkid.shape[0]
    n_pad = n_blocks * block
    chains = _chains(method, has_nan)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(
                (r_step, 8, 128), lambda i, *_: (i, 0, 0)
            ),
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
        ]
        + [
            pltpu.VMEM((block // GROUP, e_sub, 128), jnp.float32)
            for _ in range(len(chains))
        ]
        + [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
    )

    kernel = _make_dense_kernel(
        method, has_nan, scan_steps, e_sub, block, r_step, w_chunks,
        interpret,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_sub, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(blkid, wmeta, winc0, meta, ptab, rwsum.reshape(1, -1), chunks)


def stage_source_dense(
    source2d: np.ndarray, plan: DensePlan
) -> np.ndarray:
    """(n_extra, m) -> (e_sub, m_pad) staged for the dense kernel."""
    n_extra, m = source2d.shape
    e_sub = pad_sublanes(n_extra)
    c_needed = (
        int(plan.winc0.max()) + plan.w_chunks if len(plan.winc0) else 1
    )
    ctot = max(-(-m // CHUNK), c_needed)
    out = np.zeros((e_sub, ctot * CHUNK), np.float32)
    out[:n_extra, :m] = source2d
    return out


def dense_apply(
    source2d: np.ndarray,
    plan: DensePlan,
    method: str = "mean",
    has_nan: bool | None = None,
    interpret: bool = False,
) -> np.ndarray:
    """Stage + run the dense kernel; returns (n_target, n_extra)."""
    if has_nan is None:
        has_nan = bool(np.isnan(source2d).any())
    srcE = stage_source_dense(source2d, plan)
    out = gather_dense_apply(
        jnp.asarray(srcE),
        jnp.asarray(plan.blkid),
        jnp.asarray(plan.wmeta),
        jnp.asarray(plan.winc0),
        jnp.asarray(plan.meta),
        jnp.asarray(plan.ptab),
        jnp.asarray(plan.rwsum),
        method=method,
        has_nan=bool(has_nan),
        scan_steps=plan.scan_steps,
        block=plan.block,
        r_step=plan.r_step,
        w_chunks=plan.w_chunks,
        n_blocks=len(plan.rwsum) // plan.block,
        interpret=interpret,
    )
    return np.asarray(out)[: source2d.shape[0], : plan.n].T
