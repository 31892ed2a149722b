"""
Gather-packet Pallas TPU kernel for the windowed regrid apply.

This replaces the round-2 one-hot scatter-matmul kernel (retired)
as the primary TPU apply path.  That kernel's cost was structural: for
every (512-target block, 512-row slab, window slot) visit it built a
dense (512, 512) scatter matrix on the VPU and resolved it on the MXU —
~250k element-ops per visit for ~9 true nonzeros per target, and the
slab's 128-lane minor axis forced a 6.4x DMA overfetch at 20 slices.

The TPU's ``tpu.dynamic_gather`` (reached via ``jnp.take_along_axis``
inside Pallas) is vreg-local: it gathers along 128 lanes, any sublane
count (measured 0.02-0.08 us per (24, 128) op on v5e; larger lane
extents do not compile).  The kernel is built around that primitive:

* The source is staged chunk-major ``(C, E, 128)`` — 128 consecutive
  source rows on lanes, slices on sublanes.  At 20 slices the slab DMA
  shrinks from 128-lane padding (6.4x waste) to 24-sublane padding
  (1.2x).
* The host plan flattens each 512-target block's window entries,
  sorts them by source index, and splits them into **packets** of 127
  entries sharing one source chunk and one 128-target group (lane 0 of
  every packet is a reserved zero-weight dummy).  Sorted entries are
  dense in source index (~2.4 entries/row at the 1M config), so packets
  stay lane-efficient regardless of the 3.8 rows/target drift that
  makes per-slot chunked gathers waste ~80% of their lanes.
* Per packet the kernel does ONE value gather from the chunk table,
  forms per-lane quantities, runs a segmented Hillis-Steele scan along
  lanes (segment ids = target slots; carries flow to higher lanes
  only), gathers the plan-known segment-end lanes, and accumulates
  into the packet's 128-target group.  Work per packet is ~E/8 vregs
  per op — independent of the target-block width.
* Splitting a target's entries across packets is safe by construction:
  every chain op (sum, min, max) is associative, and partial segment
  results accumulate across packets.

Covered methods: the linear family (mean, sum, first_order_conservative,
conductance, harmonic_mean, geometric_mean) AND the selection pair
min/max (a max-scan instead of a sum-scan — the structure is shared).
mode/median/percentiles still ride the XLA window-gather path: they
need the full window materialized per target, not a streamed scan.

NaN semantics match ``regrid/reduce.py`` (which pins the reference's
numba kernels, xugrid/regrid/reduce.py:16-272): NaN sources are masked
out per slice, targets with no valid contribution yield NaN.  The
apply loop being replaced is the reference's prange-parallel CSR row
loop (xugrid/regrid/regridder.py:41-69).
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

#: targets per kernel block (4 gather groups of 128).
BLOCK = 512

#: target lanes per gather group.
GROUP = 128

#: source rows per chunk (the vreg lane width — fixed by the hardware).
CHUNK = 128

#: payload entries per packet (lane 0 is the reserved dummy).
PAYLOAD = 127

#: engine used when XUGRID_TPU_GATHER_ENGINE is unset — the single
#: source of truth (plan_default, apply_windowed_gather, and the CG
#: plan-cache key in ugrid/interpolate.py all read this).
DEFAULT_ENGINE = "aligned"

#: VMEM budget for the chunk slab (bytes) — bounds MAXC per plan.
_SLAB_BYTES = 6 * 1024 * 1024

#: reductions this kernel covers.
GATHER_METHODS = (
    "mean",
    "sum",
    "first_order_conservative",
    "conductance",
    "harmonic_mean",
    "geometric_mean",
    "min",
    "max",
)


class GatherPlan(NamedTuple):
    """Host-side packet plan (all numpy; reusable across applies)."""

    chunk0: np.ndarray     # (n_blocks,) i32 first source chunk per block
    npk: np.ndarray        # (n_blocks,) i32 packet count per block
    meta: np.ndarray       # (n_blocks*npk_max//2,) i32: TWO packed
    #                        15-bit (c_local << 3) | group entries per
    #                        word (even packet in the low half) — rides
    #                        SMEM scalar prefetch, whose ~1 MB budget a
    #                        10M-face plan would otherwise exceed
    ptab: np.ndarray       # (n_blocks*npk_max, 4, 128) i32 packet lanes:
    #                        row 0 lane-local src idx, row 1 f32 weight
    #                        bits (0 = pad), row 2 segment-end lane per
    #                        target slot (0 = absent), row 3 segment ids
    #                        (-1 dummy/pad) — ONE dynamic load per packet
    page: np.ndarray       # (n_blocks*ptiles*128, 128) i32 lane-
    #                        TRANSPOSED segment ids for the MXU path:
    #                        per block, tile t, lane-in-packet l, packet
    #                        slot p (lanes): the segment id of packet
    #                        t*128+p at lane l, or 255 on dummy/pad
    #                        lanes.  One 128-lane gather broadcasts a
    #                        packet's column; (page == iota) is the
    #                        one-hot scatter matrix for the matmul.
    rwsum: np.ndarray      # (n_pad,) f32 total |window| weight per target
    scan_steps: int        # ceil(log2(max segment run length))
    maxc: int              # chunks per block slab
    npk_max: int           # packets per block (padded)
    n: int                 # true target count
    block: int

    @property
    def pidx(self):
        return self.ptab[:, 0]

    @property
    def pw(self):
        return self.ptab[:, 1].view(np.float32)

    @property
    def pend(self):
        return self.ptab[:, 2]

    @property
    def pseg(self):
        return self.ptab[:, 3]


def plan_gather(
    indices: np.ndarray,
    weights: np.ndarray | None = None,
    block: int = BLOCK,
    max_plan_bytes: int = 1_500_000_000,
) -> GatherPlan | None:
    """
    Build the packet plan, or None when the window structure defeats it
    (block source spans exceeding the VMEM slab budget, or packet
    padding exploding on adversarially scattered indices) — the caller
    falls back to the XLA gather path.
    """
    n, w = indices.shape
    if n == 0:
        return None
    if weights is None:
        weights = np.zeros(indices.shape, np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    weights = np.ascontiguousarray(weights, dtype=np.float32)
    n_blocks = -(-n // block)
    n_pad = n_blocks * block

    valid = indices >= 0
    ti, _sl = np.nonzero(valid)
    if len(ti) == 0:
        return None
    src = indices[valid]
    wts = weights[valid]
    if n > (1 << 21) * block or src.max() >= (1 << 31):
        return None  # packed sort key would overflow

    # Sort entries by (block, chunk, group, target-slot): packets become
    # runs sharing (block, chunk, group), with each target's entries
    # consecutive inside a packet.  ONE packed 61-bit key replaces the
    # 4-key lexsort, and every per-entry field afterwards derives from
    # the sorted key by shifts — no per-field gathers (the planning cost
    # at the 1M config dropped severalfold).
    #   bits [40:61) block  [16:40) chunk  [14:16) group
    #        [7:14) target slot  [0:7) chunk-local source index
    if block // GROUP > 4:
        raise ValueError("block must be at most 4 groups of 128 targets")
    key = (
        ((ti // block).astype(np.int64) << 40)
        | ((src >> 7) << 16)
        | (((ti % block) // GROUP).astype(np.int64) << 14)
        | ((ti % GROUP).astype(np.int64) << 7)
        | (src & 127)
    )
    del ti, src
    order = np.argsort(key)
    key = key[order]
    ew = wts[order]
    del order, wts
    eB = key >> 40
    ec = (key >> 16) & ((1 << 24) - 1)
    eg = (key >> 14) & 3
    et = (key >> 7) & 127
    nnz = len(key)

    # First chunk per block = chunk of the block's first sorted entry.
    newB = np.empty(nnz, bool)
    newB[0] = True
    np.not_equal(eB[1:], eB[:-1], out=newB[1:])
    chunk0 = np.zeros(n_blocks, np.int64)
    chunk0[eB[newB]] = ec[newB]
    # Chunks ascend within a block (sort order), so the block's last
    # entry carries its max chunk.
    block_firsts = np.flatnonzero(newB)
    block_lasts = np.append(block_firsts[1:] - 1, nnz - 1)
    maxc = int((ec[block_lasts] - chunk0[eB[block_lasts]] + 1).max())

    # Bucket = (block, chunk, group) = the key above bit 14; packets
    # split buckets at PAYLOAD.
    bucket = key >> 14
    newb = np.empty(nnz, bool)
    newb[0] = True
    np.not_equal(bucket[1:], bucket[:-1], out=newb[1:])
    pos = np.arange(nnz, dtype=np.int64)
    bucket_start = np.maximum.accumulate(np.where(newb, pos, 0))
    posb = pos - bucket_start
    newpkt = newb | (posb % PAYLOAD == 0)
    pid = np.cumsum(newpkt) - 1
    lane = (posb % PAYLOAD + 1).astype(np.int64)
    npk_total = int(pid[-1]) + 1

    firsts = np.flatnonzero(newpkt)
    pk_B = eB[firsts]
    pk_c = (ec[firsts] - chunk0[pk_B]).astype(np.int64)
    pk_g = eg[firsts].astype(np.int64)

    npk = np.bincount(pk_B, minlength=n_blocks).astype(np.int64)
    # Multiple of 16: the kernel reads packet rows in batches of up to
    # 16 per iteration; the tail batch must stay within the block's
    # (neutral-padded) rows.
    npk_max = -(-int(npk.max()) // 16) * 16
    plan_bytes = n_blocks * npk_max * 128 * 16
    if plan_bytes > max_plan_bytes:
        return None
    e_probe = 32  # sublane estimate for the slab budget gate
    if maxc * e_probe * CHUNK * 4 > _SLAB_BYTES:
        return None

    starts = np.zeros(n_blocks + 1, np.int64)
    np.cumsum(npk, out=starts[1:])
    pslot = np.arange(npk_total, dtype=np.int64) - starts[pk_B]
    prow = pk_B * npk_max + pslot          # packed packet row id
    erow = prow[pid]                        # per entry

    nrows = n_blocks * npk_max
    ptab = np.zeros((nrows, 4, 128), np.int32)
    ptab[:, 3, :] = -1
    meta = np.zeros(nrows, np.int32)

    ptab[erow, 0, lane] = (key & 127).astype(np.int32)
    ptab[erow, 1, lane] = ew.view(np.int32)
    ptab[erow, 3, lane] = et.astype(np.int32)

    # Lane-transposed segment page for the MXU path: packet slots on
    # lanes so the kernel reaches a packet's per-lane segment ids with
    # one 128-lane broadcast gather (sublane-dynamic tile slices only —
    # Mosaic has no dynamic lane slicing).
    ptiles = -(-npk_max // 128)
    page = np.full((n_blocks * ptiles * 128, 128), 255, np.int32)
    pb = erow // npk_max
    pu = erow - pb * npk_max
    page[(pb * ptiles + pu // 128) * 128 + lane, pu % 128] = et
    meta[prow] = ((pk_c << 3) | pk_g).astype(np.int32)
    if (pk_c >= (1 << 12)).any():
        return None  # packed meta would overflow its 15-bit half
    meta = (meta[0::2] | (meta[1::2] << 16)).astype(np.int32)
    if len(meta) * 4 + (2 * n_blocks + 2) * 4 > 900_000:
        return None  # SMEM scalar-prefetch budget (~1 MB per core)

    # Segment ends: the last lane of each (packet, target) run.
    is_last = np.empty(nnz, bool)
    is_last[-1] = True
    np.logical_or(
        pid[1:] != pid[:-1], et[1:] != et[:-1], out=is_last[:-1]
    )
    ptab[erow[is_last], 2, et[is_last]] = lane[is_last].astype(np.int32)

    # Max run length → static scan step count.
    run_start = np.empty(nnz, bool)
    run_start[0] = True
    np.logical_or(
        pid[1:] != pid[:-1], et[1:] != et[:-1], out=run_start[1:]
    )
    rs_pos = np.maximum.accumulate(np.where(run_start, pos, 0))
    max_run = int((pos - rs_pos).max()) + 1
    scan_steps = max(0, int(np.ceil(np.log2(max_run)))) if max_run > 1 else 0

    rwsum = np.zeros(n_pad, np.float32)
    rwsum[:n] = np.where(valid, weights, 0.0).sum(axis=1)

    return GatherPlan(
        chunk0=chunk0.astype(np.int32),
        npk=npk.astype(np.int32),
        meta=meta,
        ptab=ptab,
        page=page,
        rwsum=rwsum,
        scan_steps=scan_steps,
        maxc=maxc,
        npk_max=npk_max,
        n=n,
        block=block,
    )


#: chunks covered by one superpacket loop iteration (span engine) or
#: grid step (stream engine).  Larger spans cut per-iteration fixed
#: cost (~0.4 us per stream grid step) at the price of round-padding
#: across the span's chunks (1M config: eff 0.66 @4, 0.58 @8, 0.50
#: @16; stream sweep: 7.63 ms @4, 6.86 @8, 7.19 @16 at E=20).
SPAN = int(os.environ.get("XUGRID_TPU_SPAN", "8"))


class SpanPlan(NamedTuple):
    """Superpacket plan (span engine).

    One loop iteration covers SPAN consecutive source chunks: the
    gather table is a single contiguous slab slice (no per-packet
    VMEM staging copies), segment ids span the whole 512-target block
    (4x fuller lane payloads than per-group packets), and each
    iteration retires up to SPAN*127 entries with ONE table read, ONE
    gather, ONE scan set and 4 static accumulator updates — the
    per-packet serialized VMEM round trips that latency-bound the
    packet engine amortize across the span.
    """

    chunk0: np.ndarray   # (n_blocks,) i32 span-aligned first chunk
    nsp: np.ndarray      # (n_blocks,) i32 superpackets per block
    meta: np.ndarray     # (n_blocks*nsp_max//2,) i32 packed pairs of
    #                      15-bit slab-local span base chunks
    ptab: np.ndarray     # (n_blocks*nsp_max*span, 8, 128) i32 rows:
    #                      0 lane-local src idx, 1 f32 weight bits,
    #                      2 segment id 0..block-1 (-1 dummy/pad),
    #                      3+g segment-end lane per group-g target
    rwsum: np.ndarray    # (n_pad,) f32 total window weight per target
    scan_steps: int
    maxc: int            # chunks per block slab
    nsp_max: int         # superpackets per block (padded, even)
    span: int
    n: int
    block: int


def plan_gather_span(
    indices: np.ndarray,
    weights: np.ndarray | None = None,
    block: int = BLOCK,
    span: int = SPAN,
    max_plan_bytes: int = 1_500_000_000,
) -> SpanPlan | None:
    """Build the superpacket plan, or None when the window structure
    defeats it (the caller falls back to the packet engine or the XLA
    gather path)."""
    n, _w = indices.shape
    if n == 0:
        return None
    if weights is None:
        weights = np.zeros(indices.shape, np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    weights = np.ascontiguousarray(weights, dtype=np.float32)
    n_blocks = -(-n // block)
    n_pad = n_blocks * block
    if block != 4 * GROUP:
        raise ValueError("span engine assumes 512-target blocks")

    valid = indices >= 0
    ti, _sl = np.nonzero(valid)
    if len(ti) == 0:
        return None
    src = indices[valid]
    wts = weights[valid]
    if n > (1 << 21) * block or src.max() >= (1 << 31):
        return None

    # Sort by (block, chunk, target slot, lane-local idx): each
    # chunk's entries are contiguous with per-target runs inside.
    B = (ti // block).astype(np.int64)
    tslot = (ti % block).astype(np.int64)
    key = (((B << 24) | (src >> 7)) << 16) | (tslot << 7) | (src & 127)
    del ti, tslot
    order = np.argsort(key)
    key = key[order]
    ew = wts[order]
    del order, wts, src
    idx7 = (key & 127).astype(np.int32)
    tslot = (key >> 7) & 511
    chk = (key >> 16) & ((1 << 24) - 1)
    B = key >> 40
    nnz = len(key)
    pos = np.arange(nnz, dtype=np.int64)

    # Rank within (block, chunk) -> round r and lane.
    bc = (B << 24) | chk
    newc = np.empty(nnz, bool)
    newc[0] = True
    np.not_equal(bc[1:], bc[:-1], out=newc[1:])
    cstart = np.maximum.accumulate(np.where(newc, pos, 0))
    posk = pos - cstart
    r = posk // PAYLOAD
    lane = (posk % PAYLOAD + 1).astype(np.int64)

    span_id = chk // span
    k_e = chk - span_id * span

    # Span-aligned slab base and extent per block.
    firsts_b = np.flatnonzero(
        np.concatenate([[True], B[1:] != B[:-1]])
    )
    lasts_b = np.append(firsts_b[1:] - 1, nnz - 1)
    blocks_present = B[firsts_b]
    chunk0 = np.zeros(n_blocks, np.int64)
    chunk0[blocks_present] = span_id[firsts_b] * span
    cmax = np.zeros(n_blocks, np.int64)
    cmax[blocks_present] = (span_id[lasts_b] + 1) * span
    maxc = int((cmax - chunk0).max())

    # Buckets = (block, span); superpackets per bucket = the max
    # round count over the span's chunks.
    lasts_c = np.flatnonzero(np.append(newc[1:], True))
    rounds_c = r[lasts_c] + 1
    bs_c = (B[lasts_c] << 24) | span_id[lasts_c]
    newb_c = np.empty(len(bs_c), bool)
    newb_c[0] = True
    np.not_equal(bs_c[1:], bs_c[:-1], out=newb_c[1:])
    bid_c = np.cumsum(newb_c) - 1
    n_buckets = int(bid_c[-1]) + 1
    Rb = np.zeros(n_buckets, np.int64)
    np.maximum.at(Rb, bid_c, rounds_c)
    bucket_B = B[lasts_c][newb_c]
    bucket_c0 = span_id[lasts_c][newb_c] * span - chunk0[bucket_B]

    nsp_b = np.zeros(n_blocks, np.int64)
    np.add.at(nsp_b, bucket_B, Rb)
    nsp_max = max(2, (-(-int(nsp_b.max()) // 2)) * 2)
    NR = n_blocks * nsp_max * span
    if NR * 8 * 128 * 4 > max_plan_bytes:
        return None
    e_probe = 32
    if maxc * e_probe * CHUNK * 4 > _SLAB_BYTES:
        return None

    # Superpacket base per bucket (block-local).
    csum = np.zeros(n_buckets + 1, np.int64)
    np.cumsum(Rb, out=csum[1:])
    blk_starts = np.zeros(n_blocks + 1, np.int64)
    np.cumsum(nsp_b, out=blk_starts[1:])
    sp_base_local = csum[:-1] - blk_starts[bucket_B]

    # Per-superpacket metadata (slab-local span base chunk).
    # Within-block superpacket index: buckets are (block, span)-sorted,
    # so a superpacket's global position minus its block's first
    # superpacket's global position is its block-local slot.
    total_sp = int(csum[-1])
    spb_B = np.repeat(bucket_B, Rb)
    spb_c0 = np.repeat(bucket_c0, Rb)
    sp_local_all = np.arange(total_sp, dtype=np.int64) - blk_starts[spb_B]
    if (spb_c0 >= (1 << 15)).any():
        return None
    meta_arr = np.zeros(n_blocks * nsp_max, np.int32)
    meta_arr[spb_B * nsp_max + sp_local_all] = spb_c0.astype(np.int32)
    meta = (meta_arr[0::2] | (meta_arr[1::2] << 16)).astype(np.int32)
    if len(meta) * 4 + (2 * n_blocks + 2) * 4 > 900_000:
        return None  # SMEM scalar-prefetch budget

    # Entry placement.
    ci_e = np.cumsum(newc) - 1
    bid_e = bid_c[ci_e]
    sp_e = sp_base_local[bid_e] + r
    erow = (B * nsp_max + sp_e) * span + k_e

    ptab = np.zeros((NR, 8, 128), np.int32)
    ptab[:, 2, :] = -1
    ptab[erow, 0, lane] = idx7
    ptab[erow, 1, lane] = ew.view(np.int32)
    ptab[erow, 2, lane] = tslot.astype(np.int32)

    is_last = np.empty(nnz, bool)
    is_last[-1] = True
    np.logical_or(
        erow[1:] != erow[:-1], tslot[1:] != tslot[:-1],
        out=is_last[:-1],
    )
    g_e = (tslot // GROUP).astype(np.int64)
    t7 = tslot - g_e * GROUP
    ptab[erow[is_last], 3 + g_e[is_last], t7[is_last]] = (
        lane[is_last].astype(np.int32)
    )

    run_start = np.empty(nnz, bool)
    run_start[0] = True
    run_start[1:] = is_last[:-1]
    rs_pos = np.maximum.accumulate(np.where(run_start, pos, 0))
    max_run = int((pos - rs_pos).max()) + 1
    scan_steps = (
        max(0, int(np.ceil(np.log2(max_run)))) if max_run > 1 else 0
    )

    rwsum = np.zeros(n_pad, np.float32)
    rwsum[:n] = np.where(valid, weights, 0.0).sum(axis=1)

    return SpanPlan(
        chunk0=chunk0.astype(np.int32),
        nsp=nsp_b.astype(np.int32),
        meta=meta,
        ptab=ptab,
        rwsum=rwsum,
        scan_steps=scan_steps,
        maxc=maxc,
        nsp_max=nsp_max,
        span=span,
        n=n,
        block=block,
    )


class StreamPlan(NamedTuple):
    """Streamed superpacket plan (stream engine).

    One *grid step* per superpacket: the packet table and the span's
    source chunks arrive as scalar-prefetch-indexed input blocks, so
    Mosaic's grid pipeline double-buffers their DMA behind compute and
    the kernel body has NO dynamic VMEM slices at all (the serialized
    slab/ptab reads were ~60% of the span engine's iteration time).
    Accumulators live in scratch across the block's consecutive steps;
    the output block is written once, on the block's last superpacket.
    Consecutive rounds over one span keep the same source-block index,
    which Mosaic detects and skips the re-fetch — multi-round buckets
    cost one span DMA instead of R.
    """

    blkid: np.ndarray    # (nsteps,) i32 target block per superpacket
    spanblk: np.ndarray  # (nsteps,) i32 span-block index into the
    #                      staged (ctot//span, ...) chunk stream
    ptab: np.ndarray     # (nsteps*span, 8, 128) i32 rows as SpanPlan
    rwsum: np.ndarray    # (n_pad,) f32 total window weight per target
    scan_steps: int
    span: int
    n: int
    block: int


def plan_gather_stream(
    indices: np.ndarray,
    weights: np.ndarray | None = None,
    block: int = BLOCK,
    span: int = SPAN,
    max_plan_bytes: int = 1_500_000_000,
) -> StreamPlan | None:
    """Build the streamed superpacket plan, or None when the window
    structure defeats it (the caller falls back to the span engine or
    the XLA gather path)."""
    n, _w = indices.shape
    if n == 0:
        return None
    if weights is None:
        weights = np.zeros(indices.shape, np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    weights = np.ascontiguousarray(weights, dtype=np.float32)
    n_blocks = -(-n // block)
    n_pad = n_blocks * block
    if block != 4 * GROUP:
        raise ValueError("stream engine assumes 512-target blocks")

    valid = indices >= 0
    ti, _sl = np.nonzero(valid)
    if len(ti) == 0:
        return None
    src = indices[valid]
    wts = weights[valid]
    if n > (1 << 21) * block or src.max() >= (1 << 31):
        return None

    # Sort by (block, chunk, target slot, lane-local idx) — identical
    # entry layout to the span engine.
    B = (ti // block).astype(np.int64)
    tslot = (ti % block).astype(np.int64)
    key = (((B << 24) | (src >> 7)) << 16) | (tslot << 7) | (src & 127)
    del ti, tslot
    order = np.argsort(key)
    key = key[order]
    ew = wts[order]
    del order, wts, src
    idx7 = (key & 127).astype(np.int32)
    tslot = (key >> 7) & 511
    chk = (key >> 16) & ((1 << 24) - 1)
    B = key >> 40
    nnz = len(key)
    pos = np.arange(nnz, dtype=np.int64)

    # Rank within (block, chunk) -> round r and lane.
    bc = (B << 24) | chk
    newc = np.empty(nnz, bool)
    newc[0] = True
    np.not_equal(bc[1:], bc[:-1], out=newc[1:])
    cstart = np.maximum.accumulate(np.where(newc, pos, 0))
    posk = pos - cstart
    r = posk // PAYLOAD
    lane = (posk % PAYLOAD + 1).astype(np.int64)

    span_id = chk // span
    k_e = chk - span_id * span

    # Buckets = (block, span); superpackets per bucket = the max round
    # count over the span's chunks.
    lasts_c = np.flatnonzero(np.append(newc[1:], True))
    rounds_c = r[lasts_c] + 1
    bs_c = (B[lasts_c] << 24) | span_id[lasts_c]
    newb_c = np.empty(len(bs_c), bool)
    newb_c[0] = True
    np.not_equal(bs_c[1:], bs_c[:-1], out=newb_c[1:])
    bid_c = np.cumsum(newb_c) - 1
    n_buckets = int(bid_c[-1]) + 1
    Rb = np.zeros(n_buckets, np.int64)
    np.maximum.at(Rb, bid_c, rounds_c)
    bucket_B = B[lasts_c][newb_c]
    bucket_s0 = span_id[lasts_c][newb_c]

    # Global superpacket base per bucket (buckets are (block, span)-
    # sorted, so a block's superpackets are consecutive grid steps —
    # the output-revisit pattern Mosaic requires).
    csum = np.zeros(n_buckets + 1, np.int64)
    np.cumsum(Rb, out=csum[1:])
    total_sp = int(csum[-1])

    # One dummy superpacket per entry-less block (its sole step is
    # first AND last: accumulators init to neutral and finalize to NaN
    # via the zero rwsum), then pad the grid to a pow2-granular bucket
    # for compile-key stability.  Padding steps extend the final
    # block's run with all-neutral rows and re-point at its last span
    # (same source index -> no re-fetch).
    present = np.zeros(n_blocks, bool)
    present[np.unique(bucket_B)] = True
    missing = np.flatnonzero(~present)
    n_real = total_sp + len(missing)
    gran = 1 << max(6, n_real.bit_length() - 4)
    nsteps = -(-n_real // gran) * gran
    if nsteps * span * 8 * 128 * 4 > max_plan_bytes:
        return None
    if 2 * nsteps * 4 + 64 > 900_000:
        return None  # SMEM scalar-prefetch budget (~1 MB per core)

    blkid = np.empty(nsteps, np.int32)
    spanblk = np.empty(nsteps, np.int32)
    blkid[:total_sp] = np.repeat(bucket_B, Rb).astype(np.int32)
    spanblk[:total_sp] = np.repeat(bucket_s0, Rb).astype(np.int32)
    blkid[total_sp:n_real] = missing.astype(np.int32)
    spanblk[total_sp:n_real] = 0
    blkid[n_real:] = blkid[n_real - 1]
    spanblk[n_real:] = spanblk[n_real - 1]

    # Entry placement: global superpacket id, then span-local chunk row.
    ci_e = np.cumsum(newc) - 1
    gsp_e = csum[bid_c[ci_e]] + r
    erow = gsp_e * span + k_e

    ptab = np.zeros((nsteps * span, 8, 128), np.int32)
    ptab[:, 2, :] = -1
    ptab[erow, 0, lane] = idx7
    ptab[erow, 1, lane] = ew.view(np.int32)
    ptab[erow, 2, lane] = tslot.astype(np.int32)

    is_last = np.empty(nnz, bool)
    is_last[-1] = True
    np.logical_or(
        erow[1:] != erow[:-1], tslot[1:] != tslot[:-1],
        out=is_last[:-1],
    )
    g_e = (tslot // GROUP).astype(np.int64)
    t7 = tslot - g_e * GROUP
    ptab[erow[is_last], 3 + g_e[is_last], t7[is_last]] = (
        lane[is_last].astype(np.int32)
    )

    run_start = np.empty(nnz, bool)
    run_start[0] = True
    run_start[1:] = is_last[:-1]
    rs_pos = np.maximum.accumulate(np.where(run_start, pos, 0))
    max_run = int((pos - rs_pos).max()) + 1
    scan_steps = (
        max(0, int(np.ceil(np.log2(max_run)))) if max_run > 1 else 0
    )

    rwsum = np.zeros(n_pad, np.float32)
    rwsum[:n] = np.where(valid, weights, 0.0).sum(axis=1)

    return StreamPlan(
        blkid=blkid,
        spanblk=spanblk,
        ptab=ptab,
        rwsum=rwsum,
        scan_steps=scan_steps,
        span=span,
        n=n,
        block=block,
    )


class PdotPlan(NamedTuple):
    """One-hot-matmul plan (pdot engine).

    Blocks are 128 targets (one gather group): segment ids ARE target
    lanes 0..127, so the per-k-row segment combine is a single MXU
    matmul against the one-hot matrix ``P_T[t, l] = (seg[l] == t)``
    built in-register from the lane-major segment row — no segmented
    scan, no masks, no per-group segment-end gathers (those were ~60%
    of the span kernel's per-iteration cost).  Sum-kind chains only
    (the linear reduce family + matvec); min/max ride the span engine.
    """

    chunk0: np.ndarray   # (n_blocks,) i32 span-aligned first chunk
    nsp: np.ndarray      # (n_blocks,) i32 superpackets per block
    meta: np.ndarray     # (n_blocks*nsp_max//2,) i32 packed pairs of
    #                      15-bit slab-local span base chunks
    ptab: np.ndarray     # (n_blocks*nsp_max*span, 3, 128) i32 rows:
    #                      0 lane-local src idx, 1 f32 weight bits,
    #                      2 target lane 0..127 (-1 pad)
    rwsum: np.ndarray    # (n_pad,) f32 total window weight per target
    maxc: int            # chunks per block slab
    nsp_max: int         # superpackets per block (padded, even)
    span: int
    n: int
    block: int           # 128


def plan_gather_pdot(
    indices: np.ndarray,
    weights: np.ndarray | None = None,
    span: int = SPAN,
    max_plan_bytes: int = 1_500_000_000,
) -> PdotPlan | None:
    """Build the pdot plan (128-target blocks, full 128-lane payloads
    — no dummy lane: pad lanes carry segment -1, whose one-hot row is
    all-zero), or None when the window structure defeats it."""
    block = GROUP
    n, _w = indices.shape
    if n == 0:
        return None
    if weights is None:
        weights = np.zeros(indices.shape, np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    weights = np.ascontiguousarray(weights, dtype=np.float32)
    n_blocks = -(-n // block)
    n_pad = n_blocks * block

    valid = indices >= 0
    ti, _sl = np.nonzero(valid)
    if len(ti) == 0:
        return None
    src = indices[valid]
    wts = weights[valid]
    if src.max() >= (1 << 25):  # chunk id must fit 18 bits
        return None

    # Sort by (block, chunk, target lane, lane-local idx).
    B = (ti // block).astype(np.int64)
    t7 = (ti % block).astype(np.int64)
    key = (((B << 18) | (src >> 7)) << 14) | (t7 << 7) | (src & 127)
    del ti, t7
    order = np.argsort(key)
    key = key[order]
    ew = wts[order]
    del order, wts, src
    idx7 = (key & 127).astype(np.int32)
    t7 = (key >> 7) & 127
    chk = (key >> 14) & ((1 << 18) - 1)
    B = key >> 32
    nnz = len(key)
    pos = np.arange(nnz, dtype=np.int64)

    # Rank within (block, chunk) -> round r and lane (all 128 lanes
    # are payload).
    bc = (B << 18) | chk
    newc = np.empty(nnz, bool)
    newc[0] = True
    np.not_equal(bc[1:], bc[:-1], out=newc[1:])
    cstart = np.maximum.accumulate(np.where(newc, pos, 0))
    posk = pos - cstart
    r = posk // 128
    lane = posk % 128

    span_id = chk // span
    k_e = chk - span_id * span

    # Span-aligned slab base and extent per block.
    firsts_b = np.flatnonzero(np.concatenate([[True], B[1:] != B[:-1]]))
    lasts_b = np.append(firsts_b[1:] - 1, nnz - 1)
    blocks_present = B[firsts_b]
    chunk0 = np.zeros(n_blocks, np.int64)
    chunk0[blocks_present] = span_id[firsts_b] * span
    cmax = np.zeros(n_blocks, np.int64)
    cmax[blocks_present] = (span_id[lasts_b] + 1) * span
    maxc = int((cmax - chunk0).max())

    # Buckets = (block, span); superpackets per bucket = the max
    # round count over the span's chunks.
    lasts_c = np.flatnonzero(np.append(newc[1:], True))
    rounds_c = r[lasts_c] + 1
    bs_c = (B[lasts_c] << 18) | span_id[lasts_c]
    newb_c = np.empty(len(bs_c), bool)
    newb_c[0] = True
    np.not_equal(bs_c[1:], bs_c[:-1], out=newb_c[1:])
    bid_c = np.cumsum(newb_c) - 1
    n_buckets = int(bid_c[-1]) + 1
    Rb = np.zeros(n_buckets, np.int64)
    np.maximum.at(Rb, bid_c, rounds_c)
    bucket_B = B[lasts_c][newb_c]
    bucket_c0 = span_id[lasts_c][newb_c] * span - chunk0[bucket_B]

    nsp_b = np.zeros(n_blocks, np.int64)
    np.add.at(nsp_b, bucket_B, Rb)
    nsp_max = max(2, (-(-int(nsp_b.max()) // 2)) * 2)
    NR = n_blocks * nsp_max * span
    if NR * 3 * 128 * 4 > max_plan_bytes:
        return None
    e_probe = 32
    if maxc * e_probe * CHUNK * 4 > _SLAB_BYTES:
        return None

    csum = np.zeros(n_buckets + 1, np.int64)
    np.cumsum(Rb, out=csum[1:])
    blk_starts = np.zeros(n_blocks + 1, np.int64)
    np.cumsum(nsp_b, out=blk_starts[1:])
    sp_base_local = csum[:-1] - blk_starts[bucket_B]

    total_sp = int(csum[-1])
    spb_B = np.repeat(bucket_B, Rb)
    spb_c0 = np.repeat(bucket_c0, Rb)
    sp_local_all = np.arange(total_sp, dtype=np.int64) - blk_starts[spb_B]
    if (spb_c0 >= (1 << 15)).any():
        return None
    meta_arr = np.zeros(n_blocks * nsp_max, np.int32)
    meta_arr[spb_B * nsp_max + sp_local_all] = spb_c0.astype(np.int32)
    meta = (meta_arr[0::2] | (meta_arr[1::2] << 16)).astype(np.int32)
    if len(meta) * 4 + (2 * n_blocks + 2) * 4 > 900_000:
        return None  # SMEM scalar-prefetch budget

    ci_e = np.cumsum(newc) - 1
    bid_e = bid_c[ci_e]
    sp_e = sp_base_local[bid_e] + r
    erow = (B * nsp_max + sp_e) * span + k_e

    ptab = np.zeros((NR, 3, 128), np.int32)
    ptab[:, 2, :] = -1
    ptab[erow, 0, lane] = idx7
    ptab[erow, 1, lane] = ew.view(np.int32)
    ptab[erow, 2, lane] = t7.astype(np.int32)

    rwsum = np.zeros(n_pad, np.float32)
    rwsum[:n] = np.where(valid, weights, 0.0).sum(axis=1)

    return PdotPlan(
        chunk0=chunk0.astype(np.int32),
        nsp=nsp_b.astype(np.int32),
        meta=meta,
        ptab=ptab,
        rwsum=rwsum,
        maxc=maxc,
        nsp_max=nsp_max,
        span=span,
        n=n,
        block=block,
    )


def _pdot_supported(method: str, has_nan: bool) -> bool:
    return all(kind == "sum" for _, kind in _chains(method, has_nan))


def _make_pdot_kernel(
    method: str,
    has_nan: bool,
    maxc: int,
    nsp_max: int,
    e_sub: int,
    span: int,
    interpret: bool,
):
    chains = _chains(method, has_nan)
    nc = len(chains)
    assert all(kind == "sum" for _, kind in chains)

    def kernel(
        chunk0_ref, nsp_ref, meta_ref,    # scalar prefetch (SMEM)
        ptab_ref, rwsum_ref,
        src_hbm, out_ref,
        slab, acc, sem,
    ):
        b = pl.program_id(0)
        c0 = chunk0_ref[b]
        nsp = nsp_ref[b]
        base = b * nsp_max

        dma = pltpu.make_async_copy(
            src_hbm.at[pl.ds(c0, maxc)], slab, sem
        )
        dma.start()

        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        acc[...] = jnp.zeros((nc * e_sub, 128), jnp.float32)

        dma.wait()

        def expand(x):
            return jnp.broadcast_to(
                x[:, None, :], (span, e_sub, 128)
            ).reshape(span * e_sub, 128)

        def body(sp, _):
            row = base + sp
            word = meta_ref[row >> 1]
            csp = (word >> ((row & 1) * 16)) & 0x7FFF
            tab = ptab_ref[pl.ds(sp * span, span)]    # (span, 3, 128)
            idx_p = tab[:, 0, :]
            w_p = jax.lax.bitcast_convert_type(tab[:, 1, :], jnp.float32)
            seg_p = tab[:, 2, :]

            table = slab[pl.ds(csp, span)].reshape(span * e_sub, 128)
            val = jnp.take_along_axis(table, expand(idx_p), axis=1)
            qs = _lane_quantities(method, has_nan, val, expand(w_p))
            if method == "sum" and not has_nan:
                # The unweighted value sum has no w-gate: zero the pad
                # lanes explicitly so a non-finite garbage gather can't
                # poison the matmul (0 * inf = nan spreads row-wide).
                qs = (jnp.where(expand(seg_p) >= 0, qs[0], 0.0),)

            for k in range(span):
                # One-hot P_T[t, l] = (seg[l] == t): lane-major seg
                # broadcast down sublanes vs a sublane iota.  Pad
                # lanes (seg -1) match no target row.  The NT matmul
                # res[e, t] = sum_l q[e, l] * P_T[t, l] IS the
                # segmented sum — exact (products are q * 1.0).
                pt = (
                    jnp.broadcast_to(seg_p[k:k + 1, :], (128, 128))
                    == sub_iota
                ).astype(jnp.float32)
                if nc > 1:
                    qk = jnp.concatenate(
                        [
                            qs[ci][k * e_sub:(k + 1) * e_sub]
                            for ci in range(nc)
                        ],
                        axis=0,
                    )
                else:
                    qk = qs[0][k * e_sub:(k + 1) * e_sub]
                res = jax.lax.dot_general(
                    qk, pt, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                acc[...] += res
            return 0

        jax.lax.fori_loop(0, nsp, body, 0)

        den = rwsum_ref[...]                           # (1, 128)
        parts = [
            acc[ci * e_sub:(ci + 1) * e_sub] for ci in range(nc)
        ]
        out_ref[...] = _finalize(method, has_nan, parts, den)

    return kernel


@partial(
    jax.jit,
    static_argnames=("method", "has_nan", "maxc", "span", "interpret"),
)
def gather_pdot_apply(
    srcE, chunk0, nsp, meta, ptab, rwsum,
    method: str = "mean",
    has_nan: bool = True,
    maxc: int = 8,
    span: int = SPAN,
    interpret: bool = False,
):
    """One-hot-matmul apply: plan arrays from ``plan_gather_pdot``;
    srcE staged as for the other engines."""
    e_sub, m_pad = srcE.shape
    ctot = m_pad // CHUNK
    chunks = srcE.reshape(e_sub, ctot, CHUNK).transpose(1, 0, 2)
    n_blocks = chunk0.shape[0]
    nsp_max = ptab.shape[0] // n_blocks // span
    block = GROUP
    n_pad = n_blocks * block
    nc = len(_chains(method, has_nan))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (nsp_max * span, 3, 128), lambda b, *_: (b, 0, 0)
            ),
            pl.BlockSpec((1, block), lambda b, *_: (0, b)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((e_sub, block), lambda b, *_: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((maxc, e_sub, CHUNK), jnp.float32),
            pltpu.VMEM((nc * e_sub, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    kernel = _make_pdot_kernel(
        method, has_nan, maxc, nsp_max, e_sub, span, interpret,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_sub, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(chunk0, nsp, meta, ptab, rwsum.reshape(1, -1), chunks)


def _roll_lanes(x, shift, interpret):
    if interpret:
        return jnp.roll(x, shift, axis=1)
    return pltpu.roll(x, shift, axis=1)


def _chains(method: str, has_nan: bool):
    """Chain specs: (name, kind) where kind is 'sum', 'max' or 'min'.

    The kernel runs one scan per chain; `_lane_quantities` produces the
    per-lane inputs and `_finalize` combines accumulated results.
    """
    if method in ("mean", "first_order_conservative", "conductance"):
        return ("num", "sum"), *((("wfin", "sum"),) if has_nan else ())
    if method == "matvec":
        # Plain weighted sum, no gating: the SpMV for iterative solvers
        # (Laplace PCG) — finite data, possibly negative weights.
        return (("num", "sum"),)
    if method == "sum":
        return ("vsum", "sum"), *((("wfin", "sum"),) if has_nan else ())
    if method == "harmonic_mean":
        return (("inv", "sum"), ("wuse", "sum"))
    if method == "geometric_mean":
        return (("logs", "sum"), ("wuse", "sum"), ("negs", "sum"))
    if method == "min":
        return ("val", "min"), *((("fin", "max"),) if has_nan else ())
    if method == "max":
        return ("val", "max"), *((("fin", "max"),) if has_nan else ())
    raise ValueError(method)


def _make_kernel(
    method: str,
    has_nan: bool,
    scan_steps: int,
    maxc: int,
    npk_max: int,
    e_sub: int,
    block: int,
    batch: int,
    mxu: bool,
    ptiles: int,
    interpret: bool,
):
    chains = _chains(method, has_nan)
    n_groups = block // GROUP

    def kernel(
        chunk0_ref, npk_ref, meta_ref,    # scalar prefetch (SMEM)
        ptab_ref, page_ref, rwsum_ref,
        src_hbm, out_ref,
        slab, stack, *scratch,
    ):
        accs = scratch[:-1]
        sem = scratch[-1]
        b = pl.program_id(0)
        c0 = chunk0_ref[b]
        npk = npk_ref[b]
        base = b * npk_max

        dma = pltpu.make_async_copy(
            src_hbm.at[pl.ds(c0, maxc)], slab, sem
        )
        dma.start()

        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        dma.wait()

        def expand(x):
            """(batch, 128) -> (batch*e_sub, 128): each row repeated
            e_sub times consecutively, matching the p-major stacking of
            the chunk-table scratch."""
            return jnp.broadcast_to(
                x[:, None, :], (batch, e_sub, 128)
            ).reshape(batch * e_sub, 128)

        for ci, (_, kind) in enumerate(chains):
            init = 0.0
            if kind == "min":
                init = jnp.inf
            elif kind == "max":
                init = -jnp.inf
            accs[ci][...] = jnp.full(
                (n_groups, e_sub, 128), init, jnp.float32
            )

        def upd(ci, kind, g, res):
            if kind == "sum":
                accs[ci][pl.ds(g, 1)] += res
            else:
                cur = accs[ci][pl.ds(g, 1)]
                accs[ci][pl.ds(g, 1)] = (
                    jnp.maximum(cur, res)
                    if kind == "max"
                    else jnp.minimum(cur, res)
                )

        # `batch` packets per iteration share ONE gather / scan / fma
        # over (batch*e_sub, 128): the per-packet serialized VMEM round
        # trips (the latency wall of the packet-at-a-time loop) amortize
        # across the batch.  Rows beyond npk are all-padding (weight 0,
        # end 0) and contribute neutrally, so the tail needs no guard.
        def body(q, _):
            q0 = q * batch
            metas = []
            rows = []
            half = (base + q0) // 2  # base and q0 are even (x16 / x4)
            word = None
            for u in range(batch):
                if u % 2 == 0:
                    word = meta_ref[half + u // 2]
                    metas.append(word & 0x7FFF)
                else:
                    metas.append((word >> 16) & 0x7FFF)
                rows.append(ptab_ref[pl.ds(q0 + u, 1), :, :])
                c_u = metas[u] >> 3
                stack[u * e_sub:(u + 1) * e_sub, :] = slab[
                    pl.ds(c_u, 1), :, :
                ].reshape(e_sub, 128)
            tab = jnp.concatenate(rows, axis=0)       # (batch, 4, 128)
            idx_p = tab[:, 0, :]
            w_p = jax.lax.bitcast_convert_type(tab[:, 1, :], jnp.float32)
            end_p = tab[:, 2, :]
            seg_p = tab[:, 3, :]

            table = stack[...]
            val = jnp.take_along_axis(table, expand(idx_p), axis=1)
            qs = _lane_quantities(method, has_nan, val, expand(w_p))

            if mxu:
                # Segment sums on the MXU: broadcast the packet's
                # lane-transposed segment column (one 128-lane gather),
                # form the one-hot scatter matrix M = (seg == lane
                # iota), and resolve every chain's segment sums with a
                # single (nc*e_sub, 128) @ (128, 128) matmul — exact
                # (each output is a plain fp sum of its segment's
                # entries), and it retires the Hillis-Steele scan, the
                # roll masks, and the segment-end gathers the VPU was
                # serializing on.  Dummy/pad lanes carry sentinel 255
                # in the page, so their M rows are all-zero.
                if ptiles > 1:
                    tile0 = (q0 // 128) * 128
                    ptile = page_ref[pl.ds(tile0, 128), :]
                else:
                    ptile = page_ref[...]
                nc = len(chains)
                for u in range(batch):
                    pu = q0 + u
                    if ptiles > 1:
                        pu = jax.lax.rem(pu, 128)
                    colidx = jnp.full((128, 128), 0, jnp.int32) + pu
                    mpre = jnp.take_along_axis(ptile, colidx, axis=1)
                    m1h = (mpre == lanes).astype(jnp.bfloat16)
                    qu = jnp.concatenate(
                        [
                            qs[ci][u * e_sub:(u + 1) * e_sub]
                            for ci in range(nc)
                        ],
                        axis=0,
                    )
                    # Default Mosaic matmul precision silently rounds
                    # f32 inputs to bf16 (see CLAUDE.md); the one-hot
                    # side is exact in bf16, so a 3-way hi/mid/lo split
                    # of the values covers the full 24-bit mantissa
                    # (f32-exact segment sums) at half the cost of
                    # Precision.HIGHEST's six MXU passes.  A 2-way
                    # split leaves ~2^-17 terms that cancelling sums
                    # amplify past the oracle tolerance.
                    qu_hi = qu.astype(jnp.bfloat16)
                    r1 = qu - qu_hi.astype(jnp.float32)
                    qu_mid = r1.astype(jnp.bfloat16)
                    qu_lo = (r1 - qu_mid.astype(jnp.float32)).astype(
                        jnp.bfloat16
                    )
                    res = (
                        jnp.dot(
                            qu_hi, m1h,
                            preferred_element_type=jnp.float32,
                        )
                        + jnp.dot(
                            qu_mid, m1h,
                            preferred_element_type=jnp.float32,
                        )
                        + jnp.dot(
                            qu_lo, m1h,
                            preferred_element_type=jnp.float32,
                        )
                    )
                    for ci in range(nc):
                        upd(
                            ci, "sum", metas[u] & 7,
                            res[ci * e_sub:(ci + 1) * e_sub].reshape(
                                1, e_sub, 128
                            ),
                        )
                return 0

            masks = []
            for j in range(scan_steps):
                s = 1 << j
                seg_r = _roll_lanes(seg_p, s, interpret)
                masks.append(
                    expand(
                        jnp.logical_and(lanes >= s, seg_r == seg_p)
                    )
                )
            end_s = expand(end_p)
            present = expand(end_p >= 1)

            for ci, (_, kind) in enumerate(chains):
                x = qs[ci]
                for j in range(scan_steps):
                    xr = _roll_lanes(x, 1 << j, interpret)
                    if kind == "sum":
                        x = x + jnp.where(masks[j], xr, 0.0)
                    elif kind == "max":
                        x = jnp.where(masks[j], jnp.maximum(x, xr), x)
                    else:
                        x = jnp.where(masks[j], jnp.minimum(x, xr), x)
                res = jnp.take_along_axis(x, end_s, axis=1)
                if kind == "sum":
                    res = jnp.where(present, res, 0.0)
                else:
                    fill = -jnp.inf if kind == "max" else jnp.inf
                    res = jnp.where(present, res, fill)
                for u in range(batch):
                    upd(
                        ci, kind, metas[u] & 7,
                        res[u * e_sub:(u + 1) * e_sub, :].reshape(
                            1, e_sub, 128
                        ),
                    )
            return 0

        n_iter = (npk + batch - 1) // batch
        jax.lax.fori_loop(0, n_iter, body, 0)

        for g in range(n_groups):
            den = rwsum_ref[:, g * GROUP:(g + 1) * GROUP]   # (1, 128)
            parts = [
                accs[ci][pl.ds(g, 1)].reshape(e_sub, 128)
                for ci in range(len(chains))
            ]
            out_ref[:, g * GROUP:(g + 1) * GROUP] = _finalize(
                method, has_nan, parts, den
            )

    return kernel


def _lane_quantities(method, has_nan, val, w_row):
    """Per-lane chain inputs from gathered values and weights.

    Padding/dummy lanes carry weight 0; on NaN paths ``where(ok, ...)``
    also kills 0*NaN poisoning from garbage gathers on those lanes.

    ``has_nan=False`` asserts the staged source is FINITE (no NaN and
    no +-inf): the linear fast paths then rely on ``0 * v == 0`` for
    pad slots and skip the zero-weight guard entirely (~25% of the
    aligned kernel's measured chain ops).  Entry points map any
    non-finite source to ``has_nan=True`` (the dispatch in
    regrid/apply.py rejects inf outright), whose ``w != 0`` gates stay
    inf-safe.
    """
    w = jnp.broadcast_to(w_row, val.shape)
    if method == "matvec":
        return (w * val,)
    if method in ("mean", "first_order_conservative", "conductance"):
        if has_nan:
            ok = jnp.logical_and(w != 0.0, ~jnp.isnan(val))
            return (
                jnp.where(ok, w * val, 0.0),
                jnp.where(ok, w, 0.0),
            )
        return (w * val,)
    if method == "sum":
        # UNWEIGHTED value sum over valid slots (w=0 slots included —
        # reference semantics); weights only gate NaN/empty targets.
        # Pad-lane garbage lives in segment -1 and never reaches a
        # gathered segment end, so no w-mask is needed.
        if has_nan:
            ok = ~jnp.isnan(val)
            return (jnp.where(ok, val, 0.0), jnp.where(ok, w, 0.0))
        return (val,)
    if method == "harmonic_mean":
        # Reference semantics: weights > 0 and values != 0.
        ok = jnp.logical_and(w > 0.0, val != 0.0)
        if has_nan:
            ok = jnp.logical_and(ok, ~jnp.isnan(val))
        safe = jnp.where(ok, val, 1.0)
        return (jnp.where(ok, w / safe, 0.0), jnp.where(ok, w, 0.0))
    if method == "geometric_mean":
        # Unnormalized weights: exp(Σw·log v / Σw) is invariant to the
        # reference's row normalization; gates replicate it exactly.
        okv = w > 0.0
        neg = val < 0.0  # any valid negative value — irrespective of w
        if has_nan:
            fin = ~jnp.isnan(val)
            okv = jnp.logical_and(okv, fin)
            neg = jnp.logical_and(neg, fin)
        use = jnp.logical_and(okv, val > 0.0)
        safe = jnp.where(use, val, 1.0)
        return (
            jnp.where(use, w * jnp.log(safe), 0.0),
            jnp.where(use, w, 0.0),
            neg.astype(jnp.float32),
        )
    if method in ("min", "max"):
        # Valid slots participate irrespective of weight (reference);
        # the per-target gate rides the finalize (rwsum / any-finite).
        fill = jnp.float32(jnp.inf if method == "min" else -jnp.inf)
        if has_nan:
            fin = ~jnp.isnan(val)
            return (
                jnp.where(fin, val, fill),
                fin.astype(jnp.float32),
            )
        return (val,)
    raise ValueError(method)


def _finalize(method, has_nan, parts, den_vec):
    nan = jnp.float32(jnp.nan)
    if method == "matvec":
        return parts[0]
    if method == "mean":
        num = parts[0]
        den = parts[1] if has_nan else den_vec + jnp.zeros_like(num)
        return jnp.where(
            den > 0.0, num / jnp.where(den == 0.0, 1.0, den), nan
        )
    if method in ("first_order_conservative", "conductance"):
        num = parts[0]
        den = parts[1] if has_nan else den_vec + jnp.zeros_like(num)
        return jnp.where(den != 0.0, num, nan)
    if method == "sum":
        vsum = parts[0]
        den = parts[1] if has_nan else den_vec + jnp.zeros_like(vsum)
        return jnp.where(den != 0.0, vsum, nan)
    if method == "harmonic_mean":
        vagg, wsum = parts
        ok = jnp.logical_and(vagg != 0.0, wsum != 0.0)
        return jnp.where(ok, wsum / jnp.where(ok, vagg, 1.0), nan)
    if method == "geometric_mean":
        vagg, wsum, negs = parts
        ok = jnp.logical_and(
            jnp.logical_and(wsum != 0.0, negs == 0.0), den_vec != 0.0
        )
        return jnp.where(
            ok, jnp.exp(vagg / jnp.where(ok, wsum, 1.0)), nan
        )
    if method in ("min", "max"):
        val = parts[0]
        ok = jnp.broadcast_to(den_vec > 0.0, val.shape)
        if has_nan:
            ok = jnp.logical_and(ok, parts[1] > 0.0)
        return jnp.where(ok, val, nan)
    raise ValueError(method)


def pad_sublanes(n_extra: int) -> int:
    """Sublane padding for the staged source (f32 tiles are 8-row)."""
    return max(8, -(-n_extra // 8) * 8)


def _use_mxu(method: str, has_nan: bool, e_sub: int) -> bool:
    """MXU segment-sum path: sum-kind chains only, and wide enough
    sublane stacks that the per-packet one-hot build amortizes (thin
    single-RHS matvecs stay on the scan path)."""
    env = os.environ.get("XUGRID_TPU_GATHER_MXU")
    if env is not None:
        return env == "1"
    chains = _chains(method, has_nan)
    if any(kind != "sum" for _, kind in chains):
        return False
    return e_sub * len(chains) >= 16


@partial(
    jax.jit,
    static_argnames=(
        "method", "has_nan", "scan_steps", "maxc", "block", "mxu",
        "interpret",
    ),
)
def gather_windowed_apply(
    srcE, chunk0, npk, meta, ptab, page, rwsum,
    method: str = "mean",
    has_nan: bool = True,
    scan_steps: int = 7,
    maxc: int = 8,
    block: int = BLOCK,
    mxu: bool | None = None,
    interpret: bool = False,
):
    """
    srcE: (E_sub, m_pad) staged source, m_pad a multiple of 128 with at
    least (max(chunk0) + maxc) * 128 rows.  Plan arrays as produced by
    ``plan_gather``.  Returns (E_sub, n_pad) f32.
    """
    e_sub, m_pad = srcE.shape
    ctot = m_pad // CHUNK
    chunks = srcE.reshape(e_sub, ctot, CHUNK).transpose(1, 0, 2)
    n_blocks = chunk0.shape[0]
    npk_max = ptab.shape[0] // n_blocks
    n_pad = n_blocks * block
    if mxu is None:
        mxu = _use_mxu(method, has_nan, e_sub)
    if mxu:
        ptiles = page.shape[0] // n_blocks // 128
        page_spec = pl.BlockSpec((ptiles * 128, 128), lambda b, *_: (b, 0))
    else:
        # Scan path never touches the page: park it in HBM (no per-
        # block DMA) so thin matvecs can pass a dummy.
        ptiles = 1
        page_spec = pl.BlockSpec(memory_space=pl.ANY)

    # Packets per loop iteration: batched ops amortize the serialized
    # VMEM round trips, so thin sublane counts (few RHS/slices) take
    # bigger batches — (batch * e_sub, 128) stays near vreg-friendly
    # sizes.  Rounded to a multiple of 4 so the common e_sub buckets
    # keep stable compile-cache keys.
    env_batch = os.environ.get("XUGRID_TPU_GATHER_BATCH")
    if env_batch is not None:
        batch = min(16, int(env_batch))
    else:
        batch = min(16, max(4, (128 // e_sub) // 4 * 4))
    batch = max(2, batch // 2 * 2)  # even: packed meta pairs per word
    batch = 1 << (batch.bit_length() - 1)  # divide 128: page tiling
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((npk_max, 4, 128), lambda b, *_: (b, 0, 0)),
            page_spec,
            pl.BlockSpec((1, block), lambda b, *_: (0, b)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((e_sub, block), lambda b, *_: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((maxc, e_sub, CHUNK), jnp.float32),
            pltpu.VMEM((batch * e_sub, CHUNK), jnp.float32),
        ]
        + [
            pltpu.VMEM((block // GROUP, e_sub, 128), jnp.float32)
            for _ in range(len(_chains(method, has_nan)))
        ]
        + [pltpu.SemaphoreType.DMA],
    )

    kernel = _make_kernel(
        method, has_nan, scan_steps, maxc,
        npk_max, e_sub, block, batch, mxu, ptiles, interpret,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_sub, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(chunk0, npk, meta, ptab, page, rwsum.reshape(1, -1), chunks)


def _make_span_kernel(
    method: str,
    has_nan: bool,
    scan_steps: int,
    maxc: int,
    nsp_max: int,
    e_sub: int,
    block: int,
    span: int,
    interpret: bool,
):
    chains = _chains(method, has_nan)
    n_groups = block // GROUP
    # Perf-ablation switch (WRONG numerics — profiling only): skip the
    # segmented scan, the group tail, or the value gather to attribute
    # kernel time to sections.
    ablate = os.environ.get("XUGRID_TPU_SPAN_ABLATE", "")

    def kernel(
        chunk0_ref, nsp_ref, meta_ref,    # scalar prefetch (SMEM)
        ptab_ref, rwsum_ref,
        src_hbm, out_ref,
        slab, *scratch,
    ):
        accs = scratch[:-1]
        sem = scratch[-1]
        b = pl.program_id(0)
        c0 = chunk0_ref[b]
        nsp = nsp_ref[b]
        base = b * nsp_max

        dma = pltpu.make_async_copy(
            src_hbm.at[pl.ds(c0, maxc)], slab, sem
        )
        dma.start()

        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        dma.wait()

        def expand(x):
            """(span, 128) -> (span*e_sub, 128): each chunk row
            repeated e_sub times, matching the slab slice layout."""
            return jnp.broadcast_to(
                x[:, None, :], (span, e_sub, 128)
            ).reshape(span * e_sub, 128)

        for ci, (_, kind) in enumerate(chains):
            init = 0.0
            if kind == "min":
                init = jnp.inf
            elif kind == "max":
                init = -jnp.inf
            accs[ci][...] = jnp.full(
                (n_groups, e_sub, 128), init, jnp.float32
            )

        def body(sp, _):
            row = base + sp
            word = meta_ref[row >> 1]
            csp = (word >> ((row & 1) * 16)) & 0x7FFF
            tab = ptab_ref[pl.ds(sp * span, span)]    # (span, 8, 128)
            idx_p = tab[:, 0, :]
            w_p = jax.lax.bitcast_convert_type(tab[:, 1, :], jnp.float32)
            seg_p = tab[:, 2, :]

            # The gather table IS a contiguous slab slice: superpacket
            # sub-row k reads chunk csp+k — no per-packet staging copy.
            table = slab[pl.ds(csp, span)].reshape(span * e_sub, 128)
            if ablate == "nogather":
                val = table + expand(idx_p).astype(jnp.float32)
            else:
                val = jnp.take_along_axis(table, expand(idx_p), axis=1)
            qs = _lane_quantities(method, has_nan, val, expand(w_p))
            # Neutralize lane 0 (the reserved dummy) per chain: absent
            # end slots hold 0, so the fused tail gathers lane 0 for
            # targets with no entries in a row — it must carry the
            # chain's neutral (not every chain gates w==0 lanes; the
            # unweighted sum and min/max pass raw values through).
            # The scan never updates lane 0 (lanes >= s excludes it).
            neutral = {"sum": 0.0, "max": -jnp.inf, "min": jnp.inf}
            qs = [
                jnp.where(lanes == 0, jnp.float32(neutral[kind]), q)
                for q, (_, kind) in zip(qs, chains)
            ]

            masks = []
            for j in range(scan_steps if ablate != "noscan" else 0):
                s = 1 << j
                seg_r = _roll_lanes(seg_p, s, interpret)
                masks.append(
                    expand(
                        jnp.logical_and(lanes >= s, seg_r == seg_p)
                    )
                )

            xcs = []
            for ci, (_, kind) in enumerate(chains):
                x = qs[ci]
                for j in range(scan_steps if ablate != "noscan" else 0):
                    xr = _roll_lanes(x, 1 << j, interpret)
                    if kind == "sum":
                        x = x + jnp.where(masks[j], xr, 0.0)
                    elif kind == "max":
                        x = jnp.where(masks[j], jnp.maximum(x, xr), x)
                    else:
                        x = jnp.where(masks[j], jnp.minimum(x, xr), x)
                xcs.append(x)

            if ablate == "notail":
                for ci, (_, kind) in enumerate(chains):
                    red = xcs[ci].reshape(span, e_sub, 128).sum(axis=0)
                    accs[ci][...] = accs[ci][...] + jnp.broadcast_to(
                        red, (n_groups, e_sub, 128)
                    )
                return 0

            # Fused tail: ONE gather resolves all groups' segment ends
            # (the old per-group loop serialized 4x gather + mask +
            # reduce + accumulator round trips).  Absent end slots
            # gather lane 0, which carries the chain's neutral — no
            # presence mask needed.
            # NB: no None-in-brackets here — mixed basic/newaxis
            # indexing traces to a >2D lax.gather Mosaic can't lower.
            ends_g = jnp.expand_dims(tab[:, 3:3 + n_groups, :], 2)
            ends_e = jnp.broadcast_to(
                ends_g, (span, n_groups, e_sub, 128)
            ).reshape(span * n_groups * e_sub, 128)
            for ci, (_, kind) in enumerate(chains):
                xt = jnp.broadcast_to(
                    xcs[ci].reshape(span, 1, e_sub, 128),
                    (span, n_groups, e_sub, 128),
                ).reshape(span * n_groups * e_sub, 128)
                res = jnp.take_along_axis(xt, ends_e, axis=1)
                red = res.reshape(span, n_groups * e_sub, 128)
                if kind == "sum":
                    red = red.sum(axis=0)
                elif kind == "max":
                    red = red.max(axis=0)
                else:
                    red = red.min(axis=0)
                red = red.reshape(n_groups, e_sub, 128)
                cur = accs[ci][...]
                if kind == "sum":
                    accs[ci][...] = cur + red
                elif kind == "max":
                    accs[ci][...] = jnp.maximum(cur, red)
                else:
                    accs[ci][...] = jnp.minimum(cur, red)
            return 0

        jax.lax.fori_loop(0, nsp, body, 0)

        for g in range(n_groups):
            den = rwsum_ref[:, g * GROUP:(g + 1) * GROUP]   # (1, 128)
            parts = [
                accs[ci][pl.ds(g, 1)].reshape(e_sub, 128)
                for ci in range(len(chains))
            ]
            out_ref[:, g * GROUP:(g + 1) * GROUP] = _finalize(
                method, has_nan, parts, den
            )

    return kernel


def _make_stream_kernel(
    method: str,
    has_nan: bool,
    scan_steps: int,
    e_sub: int,
    block: int,
    span: int,
    interpret: bool,
):
    chains = _chains(method, has_nan)
    n_groups = block // GROUP

    def kernel(
        blkid_ref, spanblk_ref,           # scalar prefetch (SMEM)
        ptab_ref, rwsum_ref, src_ref,     # per-step input blocks
        out_ref,
        *accs,
    ):
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)
        cur = blkid_ref[i]
        prev = blkid_ref[jnp.maximum(i - 1, 0)]
        nxt = blkid_ref[jnp.minimum(i + 1, nsteps - 1)]
        is_first = jnp.logical_or(i == 0, prev != cur)
        is_last = jnp.logical_or(i == nsteps - 1, nxt != cur)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        @pl.when(is_first)
        def _init():
            for ci, (_, kind) in enumerate(chains):
                init = 0.0
                if kind == "min":
                    init = jnp.inf
                elif kind == "max":
                    init = -jnp.inf
                accs[ci][...] = jnp.full(
                    (n_groups, e_sub, 128), init, jnp.float32
                )

        def expand(x):
            """(span, 128) -> (span*e_sub, 128): each chunk row
            repeated e_sub times, matching the source block layout."""
            return jnp.broadcast_to(
                x[:, None, :], (span, e_sub, 128)
            ).reshape(span * e_sub, 128)

        tab = ptab_ref[...]                       # (span, 8, 128)
        idx_p = tab[:, 0, :]
        w_p = jax.lax.bitcast_convert_type(tab[:, 1, :], jnp.float32)
        seg_p = tab[:, 2, :]

        table = src_ref[...].reshape(span * e_sub, 128)
        val = jnp.take_along_axis(table, expand(idx_p), axis=1)
        qs = _lane_quantities(method, has_nan, val, expand(w_p))
        # Lane 0 (the reserved dummy) carries the chain's neutral: the
        # fused tail gathers lane 0 for targets absent from a row.
        neutral = {"sum": 0.0, "max": -jnp.inf, "min": jnp.inf}
        qs = [
            jnp.where(lanes == 0, jnp.float32(neutral[kind]), q)
            for q, (_, kind) in zip(qs, chains)
        ]

        masks = []
        for j in range(scan_steps):
            s = 1 << j
            seg_r = _roll_lanes(seg_p, s, interpret)
            masks.append(
                expand(jnp.logical_and(lanes >= s, seg_r == seg_p))
            )

        xcs = []
        for ci, (_, kind) in enumerate(chains):
            x = qs[ci]
            for j in range(scan_steps):
                xr = _roll_lanes(x, 1 << j, interpret)
                if kind == "sum":
                    x = x + jnp.where(masks[j], xr, 0.0)
                elif kind == "max":
                    x = jnp.where(masks[j], jnp.maximum(x, xr), x)
                else:
                    x = jnp.where(masks[j], jnp.minimum(x, xr), x)
            xcs.append(x)

        # Fused tail (see _make_span_kernel): ONE gather resolves all
        # groups' segment ends; absent end slots hit neutral lane 0.
        ends_g = jnp.expand_dims(tab[:, 3:3 + n_groups, :], 2)
        ends_e = jnp.broadcast_to(
            ends_g, (span, n_groups, e_sub, 128)
        ).reshape(span * n_groups * e_sub, 128)
        for ci, (_, kind) in enumerate(chains):
            xt = jnp.broadcast_to(
                xcs[ci].reshape(span, 1, e_sub, 128),
                (span, n_groups, e_sub, 128),
            ).reshape(span * n_groups * e_sub, 128)
            res = jnp.take_along_axis(xt, ends_e, axis=1)
            red = res.reshape(span, n_groups * e_sub, 128)
            if kind == "sum":
                red = red.sum(axis=0)
            elif kind == "max":
                red = red.max(axis=0)
            else:
                red = red.min(axis=0)
            red = red.reshape(n_groups, e_sub, 128)
            cur_a = accs[ci][...]
            if kind == "sum":
                accs[ci][...] = cur_a + red
            elif kind == "max":
                accs[ci][...] = jnp.maximum(cur_a, red)
            else:
                accs[ci][...] = jnp.minimum(cur_a, red)

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
        "method", "has_nan", "scan_steps", "span", "block", "n_blocks",
        "interpret",
    ),
)
def gather_stream_apply(
    srcE, blkid, spanblk, ptab, rwsum,
    method: str = "mean",
    has_nan: bool = True,
    scan_steps: int = 7,
    span: int = SPAN,
    block: int = BLOCK,
    n_blocks: int = 1,
    interpret: bool = False,
):
    """Streamed superpacket apply: plan arrays from
    ``plan_gather_stream``; srcE staged as for the other engines (with
    ``m_pad`` a multiple of ``span * CHUNK``)."""
    e_sub, m_pad = srcE.shape
    ctot = m_pad // CHUNK
    chunks = srcE.reshape(e_sub, ctot, CHUNK).transpose(1, 0, 2)
    nsteps = blkid.shape[0]
    n_pad = n_blocks * block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(
                (span, 8, 128), lambda i, blk, spb: (i, 0, 0)
            ),
            pl.BlockSpec(
                (1, block), lambda i, blk, spb: (0, blk[i])
            ),
            pl.BlockSpec(
                (span, e_sub, CHUNK), lambda i, blk, spb: (spb[i], 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (e_sub, block), lambda i, blk, spb: (0, blk[i])
        ),
        scratch_shapes=[
            pltpu.VMEM((block // GROUP, e_sub, 128), jnp.float32)
            for _ in range(len(_chains(method, has_nan)))
        ],
    )

    kernel = _make_stream_kernel(
        method, has_nan, scan_steps, e_sub, block, span, interpret,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_sub, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(blkid, spanblk, ptab, rwsum.reshape(1, -1), chunks)


@partial(
    jax.jit,
    static_argnames=(
        "method", "has_nan", "scan_steps", "maxc", "span", "block",
        "interpret",
    ),
)
def gather_span_apply(
    srcE, chunk0, nsp, meta, ptab, rwsum,
    method: str = "mean",
    has_nan: bool = True,
    scan_steps: int = 7,
    maxc: int = 8,
    span: int = SPAN,
    block: int = BLOCK,
    interpret: bool = False,
):
    """Superpacket (span-engine) apply: plan arrays from
    ``plan_gather_span``; srcE staged as for the packet engine."""
    e_sub, m_pad = srcE.shape
    ctot = m_pad // CHUNK
    chunks = srcE.reshape(e_sub, ctot, CHUNK).transpose(1, 0, 2)
    n_blocks = chunk0.shape[0]
    nsp_max = ptab.shape[0] // n_blocks // span
    n_pad = n_blocks * block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (nsp_max * span, 8, 128), lambda b, *_: (b, 0, 0)
            ),
            pl.BlockSpec((1, block), lambda b, *_: (0, b)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((e_sub, block), lambda b, *_: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((maxc, e_sub, CHUNK), jnp.float32),
        ]
        + [
            pltpu.VMEM((block // GROUP, e_sub, 128), jnp.float32)
            for _ in range(len(_chains(method, has_nan)))
        ]
        + [pltpu.SemaphoreType.DMA],
    )

    kernel = _make_span_kernel(
        method, has_nan, scan_steps, maxc,
        nsp_max, e_sub, block, span, interpret,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_sub, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(chunk0, nsp, meta, ptab, rwsum.reshape(1, -1), chunks)


def stage_source(source2d: np.ndarray, plan: GatherPlan) -> np.ndarray:
    """(n_extra, m) → (E_sub, m_pad) staged for the kernel (f32)."""
    n_extra, m = source2d.shape
    e_sub = pad_sublanes(n_extra)
    if isinstance(plan, StreamPlan):
        # Chunk count padded to whole span blocks (the source streams
        # in (span, e_sub, 128) grid blocks).
        c_needed = (
            (int(plan.spanblk.max()) + 1) * plan.span
            if len(plan.spanblk)
            else plan.span
        )
        ctot = max(-(-m // CHUNK), c_needed)
        m_pad = (-(-ctot // plan.span) * plan.span) * CHUNK
        out = np.zeros((e_sub, m_pad), np.float32)
        out[:n_extra, :m] = source2d
        return out
    c_needed = int(plan.chunk0.max()) + plan.maxc if len(plan.chunk0) else 1
    m_pad = max(-(-m // CHUNK), c_needed) * CHUNK
    out = np.zeros((e_sub, m_pad), np.float32)
    out[:n_extra, :m] = source2d
    return out


def plan_default(
    indices: np.ndarray,
    weights: np.ndarray | None = None,
    block: int = BLOCK,
    for_minmax: bool = False,
) -> GatherPlan | SpanPlan | PdotPlan | None:
    """Plan with the default engine (XUGRID_TPU_GATHER_ENGINE, falling
    back to the stream engine; "pdot" is opt-in — measured slower on
    the 1M config: 11.7 vs 7.4 ms/pass at E=20), with the scan engines
    as fallbacks when planning rejects.  ``for_minmax`` requests a
    scan-capable plan (the pdot engine covers sum-kind chains only)."""
    engine = os.environ.get("XUGRID_TPU_GATHER_ENGINE", DEFAULT_ENGINE)
    if engine == "pdot" and not for_minmax:
        plan = plan_gather_pdot(indices, weights)
        if plan is not None:
            return plan
        engine = "stream"
    if engine == "aligned":
        from xugrid_tpu.regrid.aligned_apply import plan_gather_aligned

        plan = plan_gather_aligned(indices, weights)
        if plan is not None:
            return plan
        engine = "stream"
    if engine == "stream":
        plan = plan_gather_stream(indices, weights, block)
        if plan is not None:
            return plan
        engine = "span"
    if engine in ("span", "pdot"):
        plan = plan_gather_span(indices, weights, block)
        if plan is None:
            plan = plan_gather(indices, weights, block)
        return plan
    return plan_gather(indices, weights, block)


def apply_windowed_gather(
    source2d: np.ndarray,
    indices: np.ndarray,
    weights: np.ndarray,
    method: str = "mean",
    has_nan: bool | None = None,
    block: int = BLOCK,
    plan: GatherPlan | SpanPlan | None = None,
    interpret: bool = False,
    engine: str | None = None,
):
    """
    Host wrapper: plans packets, stages the source, runs the kernel.
    ``source2d`` is (n_extra, m) slice-major.  Returns (n_target,
    n_extra) f32, or None when planning rejects (caller falls back).
    ``engine``: "span" (superpackets) or "packet"; default from
    XUGRID_TPU_GATHER_ENGINE, falling back to "span".
    """
    if method not in GATHER_METHODS:
        return None
    from xugrid_tpu.regrid.aligned_apply import (
        AlignedPlan,
        aligned_apply,
        plan_gather_aligned,
    )
    if plan is not None:
        if isinstance(plan, PdotPlan):
            engine = "pdot"
        elif isinstance(plan, AlignedPlan):
            engine = "aligned"
        elif isinstance(plan, StreamPlan):
            engine = "stream"
        elif isinstance(plan, SpanPlan):
            engine = "span"
        else:
            engine = "packet"
    elif engine is None:
        engine = os.environ.get("XUGRID_TPU_GATHER_ENGINE", DEFAULT_ENGINE)
    if has_nan is None:
        # inf maps to the NaN chains too: has_nan=False fast paths
        # assume a finite staged source (see _lane_quantities).
        has_nan = not bool(np.isfinite(source2d).all())
    if engine == "pdot" and not _pdot_supported(method, bool(has_nan)):
        # min/max chains need the scan engines; replan there.
        engine = "stream"
        plan = None
    if engine == "aligned":
        if plan is None:
            plan = plan_gather_aligned(indices, weights)
        if plan is None:
            engine = "stream"
        else:
            return aligned_apply(
                source2d,
                plan,
                method=method,
                has_nan=bool(has_nan),
                interpret=interpret,
            )
    if engine == "stream":
        if plan is None:
            plan = plan_gather_stream(indices, weights, block)
        if plan is None:
            engine = "span"
        else:
            srcE = stage_source(source2d, plan)
            out = gather_stream_apply(
                jnp.asarray(srcE),
                jnp.asarray(plan.blkid),
                jnp.asarray(plan.spanblk),
                jnp.asarray(plan.ptab),
                jnp.asarray(plan.rwsum),
                method=method,
                has_nan=bool(has_nan),
                scan_steps=plan.scan_steps,
                span=plan.span,
                block=plan.block,
                n_blocks=len(plan.rwsum) // plan.block,
                interpret=interpret,
            )
            return np.asarray(out)[: source2d.shape[0], : plan.n].T
    if engine == "pdot":
        if plan is None:
            plan = plan_gather_pdot(indices, weights)
        if plan is None:
            engine = "span"
        else:
            srcE = stage_source(source2d, plan)
            out = gather_pdot_apply(
                jnp.asarray(srcE),
                jnp.asarray(plan.chunk0),
                jnp.asarray(plan.nsp),
                jnp.asarray(plan.meta),
                jnp.asarray(plan.ptab),
                jnp.asarray(plan.rwsum),
                method=method,
                has_nan=bool(has_nan),
                maxc=plan.maxc,
                span=plan.span,
                interpret=interpret,
            )
            return np.asarray(out)[: source2d.shape[0], : plan.n].T
    if engine == "span":
        if plan is None:
            plan = plan_gather_span(indices, weights, block)
        if plan is None:
            return None
        if has_nan is None:
            has_nan = not bool(np.isfinite(source2d).all())
        srcE = stage_source(source2d, plan)
        out = gather_span_apply(
            jnp.asarray(srcE),
            jnp.asarray(plan.chunk0),
            jnp.asarray(plan.nsp),
            jnp.asarray(plan.meta),
            jnp.asarray(plan.ptab),
            jnp.asarray(plan.rwsum),
            method=method,
            has_nan=bool(has_nan),
            scan_steps=plan.scan_steps,
            maxc=plan.maxc,
            span=plan.span,
            block=plan.block,
            interpret=interpret,
        )
        return np.asarray(out)[: source2d.shape[0], : plan.n].T
    if plan is None:
        plan = plan_gather(indices, weights, block)
    if plan is None:
        return None
    if has_nan is None:
        # inf maps to the NaN chains too: has_nan=False fast paths
        # assume a finite staged source (see _lane_quantities).
        has_nan = not bool(np.isfinite(source2d).all())
    srcE = stage_source(source2d, plan)
    e_sub = srcE.shape[0]
    mxu = _use_mxu(method, bool(has_nan), e_sub)
    out = gather_windowed_apply(
        jnp.asarray(srcE),
        jnp.asarray(plan.chunk0),
        jnp.asarray(plan.npk),
        jnp.asarray(plan.meta),
        jnp.asarray(plan.ptab),
        jnp.asarray(plan.page),
        jnp.asarray(plan.rwsum),
        method=method,
        has_nan=bool(has_nan),
        # The MXU path ignores scan_steps; pin it so one compile key
        # serves every plan that lands on this shape bucket.
        scan_steps=0 if mxu else plan.scan_steps,
        maxc=plan.maxc,
        block=plan.block,
        mxu=mxu,
        interpret=interpret,
    )
    return np.asarray(out)[: source2d.shape[0], : plan.n].T
