"""Quad-packing simulation for the gather engine redesign.

Each ptab lane carries up to Q sub-entries of ONE target from ONE
chunk (Q gathers + Q fma per lane).  Reports row counts, residual
packed-run lengths (scan steps), group spread, and step counts under
(a) the stream structure (span columns, skew) and (b) dense packing
(rows carry their own chunk id; bucket pad to R_STEP).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plan_analysis import load_padded  # noqa: E402

PAYLOAD = 127
GROUP = 128


def quad_stats(indices, Q=4, block=512, span=8, R_STEP=16, W=32):
    n, _w = indices.shape
    valid = indices >= 0
    ti, _sl = np.nonzero(valid)
    src = indices[valid]
    B = (ti // block).astype(np.int64)
    tslot = (ti % block).astype(np.int64)
    chunk = (src >> 7).astype(np.int64)
    nnz = len(ti)

    # lanes: per (B, chunk, target): ceil(cnt/Q)
    key = (((B << 24) | chunk) << 10) | tslot
    key.sort()
    newt = np.empty(nnz, bool)
    newt[0] = True
    np.not_equal(key[1:], key[:-1], out=newt[1:])
    tid = np.cumsum(newt) - 1
    cnt_t = np.bincount(tid)
    lanes_t = -(-cnt_t // Q)  # lanes per (B, chunk, target)
    n_lanes = int(lanes_t.sum())
    # residual packed-run length per target
    maxrun = int(lanes_t.max())
    scan_steps = max(0, int(np.ceil(np.log2(maxrun)))) if maxrun > 1 else 0
    sub_fill = nnz / (n_lanes * Q)

    # per (B, chunk): lanes -> rounds of PAYLOAD
    bc_of_t = key[newt] >> 10
    newc = np.empty(len(bc_of_t), bool)
    newc[0] = True
    np.not_equal(bc_of_t[1:], bc_of_t[:-1], out=newc[1:])
    cid_of_t = np.cumsum(newc) - 1
    lanes_bc = np.bincount(cid_of_t, weights=lanes_t).astype(np.int64)
    rows_bc = -(-lanes_bc // PAYLOAD)
    rows = int(rows_bc.sum())
    lane_fill = n_lanes / (rows * PAYLOAD)

    bc = bc_of_t[newc]
    B_bc = bc >> 24
    c_bc = bc & ((1 << 24) - 1)

    # (a) stream structure: buckets (B, span) x max rounds
    sidb = (B_bc << 24) | (c_bc // span)
    order = np.argsort(sidb)
    sidb_s = sidb[order]
    rows_s = rows_bc[order]
    newb = np.empty(len(sidb_s), bool)
    newb[0] = True
    np.not_equal(sidb_s[1:], sidb_s[:-1], out=newb[1:])
    bid = np.cumsum(newb) - 1
    Rb = np.zeros(int(bid[-1]) + 1, np.int64)
    np.maximum.at(Rb, bid, rows_s)
    sp_stream = int(Rb.sum())
    stream_slots = sp_stream * span * PAYLOAD

    # (b) dense: greedy W-window cover per block, bucket pad to R_STEP
    ordW = np.argsort((B_bc << 24) | c_bc)
    Bw, cw, rw = B_bc[ordW], c_bc[ordW], rows_bc[ordW]
    first = np.empty(len(Bw), bool)
    first[0] = True
    np.not_equal(Bw[1:], Bw[:-1], out=first[1:])
    start = first.copy()
    for _ in range(64):
        c0 = np.where(start, cw, 0)
        np.maximum.accumulate(c0, out=c0)
        over = (cw - c0) >= W
        # first overflow position in each run starts a new window
        cand = over & ~start
        prev_ok = np.empty(len(Bw), bool)
        prev_ok[0] = True
        prev_ok[1:] = ~over[:-1] | start[1:]
        newstart = cand & prev_ok
        if not newstart.any():
            if not over.any():
                break
            start |= newstart
            continue
        start |= newstart
    wid = np.cumsum(start) - 1
    rows_w = np.zeros(int(wid[-1]) + 1, np.int64)
    np.add.at(rows_w, wid, rw)
    steps_dense = int((-(-rows_w // R_STEP)).sum())
    dense_slots = steps_dense * R_STEP * PAYLOAD
    n_buckets = len(rows_w)

    print(
        f"Q={Q} block={block} span={span} R_STEP={R_STEP} W={W}: "
        f"lanes={n_lanes} rows={rows} scan={scan_steps} "
        f"sub_fill={sub_fill:.3f} lane_fill={lane_fill:.3f}"
    )
    print(
        f"  stream: sp={sp_stream} row_slots={sp_stream*span} "
        f"eff={n_lanes*1.0/stream_slots:.3f}"
    )
    print(
        f"  dense : buckets={n_buckets} steps={steps_dense} "
        f"row_slots={steps_dense*R_STEP} "
        f"eff={n_lanes*1.0/dense_slots:.3f}"
    )


def main():
    indices, _ = load_padded()
    for Q in (2, 4):
        for block in (512, 1024, 2048):
            quad_stats(indices, Q=Q, block=block)
    quad_stats(indices, Q=4, block=512, R_STEP=8)
    quad_stats(indices, Q=4, block=1024, R_STEP=8)
    quad_stats(indices, Q=4, block=2048, R_STEP=32, W=64)
    quad_stats(indices, Q=4, block=2048, R_STEP=16, W=64)


if __name__ == "__main__":
    main()
