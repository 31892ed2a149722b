"""Row-floor analysis for the aligned engine restructure (round 3).

Measures, on the real 1M-config overlap matrix:
  (a) current aligned plan: n_rows, nsteps, per-(block,group) row stats
  (b) multi-chunk stream rows: rows keyed by (block, group) with
      Q_PACK=4 per-row chunk streams -> rows = sum ceil(S_g / 4) where
      S_g = sum_c max_lane count(lane, c)
  (c) same-group run batching: #(bucket, group) runs if rows re-sorted
      group-major within each window bucket (acc-RMW count under a
      carry-flush kernel)
Pure numpy; no jax.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plan_analysis import load_padded  # noqa: E402

from xugrid_tpu.regrid.aligned_apply import (  # noqa: E402
    plan_gather_aligned,
    Q_PACK,
)
from xugrid_tpu.regrid.gather_apply import CHUNK, GROUP  # noqa: E402


def main():
    indices, weights = load_padded()
    n, w = indices.shape
    print(f"n={n} window_width={w} nnz={(indices >= 0).sum()}")

    plan = plan_gather_aligned(indices, weights)
    n_rows_slots = plan.itab.shape[0]
    occ = (plan.itab.view(np.uint32) & 0x80808080) != 0
    # count real (non-padding) rows: any sub-slot set
    real_rows = (plan.itab.view(np.uint32) != 0).any(axis=1).sum()
    filled_subslots = (
        ((plan.itab.view(np.uint32) >> 7) & 1).sum()
        + ((plan.itab.view(np.uint32) >> 15) & 1).sum()
        + ((plan.itab.view(np.uint32) >> 23) & 1).sum()
        + ((plan.itab.view(np.uint32) >> 31) & 1).sum()
    )
    print(
        f"(a) current: block={plan.block} w_chunks={plan.w_chunks} "
        f"nsteps={plan.nsteps} row_slots={n_rows_slots} "
        f"real_rows={real_rows} "
        f"subslot_occupancy={filled_subslots / (n_rows_slots * 128 * 4):.3f}"
    )

    # ---- hypothetical (b): multi-chunk stream rows ----
    block = plan.block
    valid = indices >= 0
    ti, _sl = np.nonzero(valid)
    src = indices[valid].astype(np.int64)
    B = ti // block
    g = (ti % block) // GROUP
    lane = ti % GROUP
    chunk = src >> 7
    n_groups = block // GROUP
    gkey = B * n_groups + g

    # per (gkey, chunk, lane): count; stream slots for chunk c in group
    # = max over lanes of that count.
    k1 = ((gkey * (chunk.max() + 1) + chunk) << 7) | lane
    k1s = np.sort(k1)
    new = np.empty(len(k1s), bool)
    new[0] = True
    np.not_equal(k1s[1:], k1s[:-1], out=new[1:])
    starts = np.flatnonzero(new)
    cnt = np.diff(np.append(starts, len(k1s)))  # per (gkey,chunk,lane)
    gc = k1s[new] >> 7  # (gkey, chunk) key per run
    # max over lanes within each (gkey, chunk)
    order = np.argsort(gc, kind="stable")
    gc_s = gc[order]
    cnt_s = cnt[order]
    newgc = np.empty(len(gc_s), bool)
    newgc[0] = True
    np.not_equal(gc_s[1:], gc_s[:-1], out=newgc[1:])
    gcid = np.cumsum(newgc) - 1
    smax = np.zeros(gcid[-1] + 1, np.int64)
    np.maximum.at(smax, gcid, cnt_s)
    # streams per group S_g = sum over chunks of smax
    gk_of_gc = gc_s[newgc] // (chunk.max() + 1)
    S = np.zeros(gkey.max() + 1, np.int64)
    np.add.at(S, gk_of_gc, smax)
    rows_b = np.ceil(S / Q_PACK).astype(np.int64)
    # distinct chunks per group and spread (window feasibility)
    ndc = np.zeros(gkey.max() + 1, np.int64)
    np.add.at(ndc, gk_of_gc, 1)
    cmin = np.full(gkey.max() + 1, 1 << 60, np.int64)
    cmaxg = np.zeros(gkey.max() + 1, np.int64)
    cg = gc_s[newgc] % (chunk.max() + 1)
    np.minimum.at(cmin, gk_of_gc, cg)
    np.maximum.at(cmaxg, gk_of_gc, cg)
    spread = (cmaxg - cmin + 1)[S > 0]
    print(
        f"(b) multi-chunk rows: total={rows_b.sum()} "
        f"mean_S={S[S > 0].mean():.2f} mean_distinct_chunks="
        f"{ndc[S > 0].mean():.2f} "
        f"chunk_spread p50/p90/p99/max="
        f"{np.percentile(spread, [50, 90, 99]).astype(int)}/{spread.max()}"
    )

    # ---- hypothetical (c): same-group runs under current rows ----
    # reconstruct current row keys (block, chunk, group, spill)
    # approximate runs = distinct (bucket, group); bucket ~ (block,
    # window) — upper bound with distinct (block, group) pairs that
    # have >=1 row, scaled by windows/block.
    k2 = np.unique(gkey)
    print(
        f"(c) group-major runs (lower bound on acc RMWs): "
        f"{len(k2)} (distinct (block,group) pairs); "
        f"current real rows {real_rows} -> RMW cut x"
        f"{real_rows / len(k2):.2f}"
    )


if __name__ == "__main__":
    main()
