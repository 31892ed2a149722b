"""Host census: how many rows would the aligned engine need if each of
a row's qp sub-slots could reference its OWN chunk (multi-chunk rows)?

Current keying packs one (group, chunk) pair per row; real overlap
matrices fill only ~0.2 of a row's 512 slot-lanes because a group's
entries scatter over many chunks that each get a private row.  This
census computes, per (block, group): sum over chunks of the per-lane
max occupancy (= slots the chunk needs), packs slots qp-wide into rows
with the window-span cap, and reports the row/step counts vs the
current plan's.

Run: python scripts/mc_census.py   (CPU; knobs BLOCK, QP, WCAP)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from _sweep_common import build_weights  # noqa: E402

BLOCK = int(os.environ.get("BLOCK", "1024"))
QP = int(os.environ.get("QP", "4"))
WCAP = int(os.environ.get("WCAP", "64"))
GROUP = 128
R_STEP = 16


def mc_rows(indices, block=BLOCK, qp=QP, wcap=WCAP):
    valid = indices >= 0
    ti, _ = np.nonzero(valid)
    src = indices[valid].astype(np.int64)
    B = ti // block
    g = (ti % block) // GROUP
    lane = ti % GROUP
    chunk = src >> 7
    cmax = int(chunk.max()) + 1
    n_groups = block // GROUP

    # occupancy rank within (b,g,c,lane)
    key = (((B * n_groups + g) * cmax + chunk) << 7) | lane
    order = np.argsort(key, kind="stable")
    key = key[order]
    nnz = len(key)
    pos = np.arange(nnz)
    newk = np.empty(nnz, bool)
    newk[0] = True
    np.not_equal(key[1:], key[:-1], out=newk[1:])
    rank = pos - np.maximum.accumulate(np.where(newk, pos, 0))

    # chunk-run id over (b,g,c)
    bgc = key >> 7
    newc = np.empty(nnz, bool)
    newc[0] = True
    np.not_equal(bgc[1:], bgc[:-1], out=newc[1:])
    cidx = np.cumsum(newc) - 1
    ncr = int(cidx[-1]) + 1
    s_c = np.zeros(ncr, np.int64)
    np.maximum.at(s_c, cidx, rank + 1)
    c_run = (bgc[newc]) % cmax
    bg_run = bgc[newc] // cmax
    b_run = bg_run // n_groups

    # walk chunk-runs per (b,g), packing slots qp-wide with span cap:
    # vectorized via per-run slot offsets, then simulate row breaks at
    # span overflow with a python loop over the few overflow cases.
    newbg = np.empty(ncr, bool)
    newbg[0] = True
    np.not_equal(bg_run[1:], bg_run[:-1], out=newbg[1:])
    cum = np.cumsum(s_c)
    base = cum - s_c
    bg_base = np.where(newbg, base, 0)
    bg_base = np.maximum.accumulate(bg_base)
    slot0 = base - bg_base          # first slot of run within its group

    # span check: a row mixes chunk-runs; row r of group covers slots
    # [r*qp,(r+1)*qp) -> runs intersecting it.  Quick conservative
    # census: fraction of groups whose TOTAL chunk span exceeds wcap
    # (those need run splits; production planner handles them).
    gspan = np.zeros(int(bg_run.max()) + 1, np.int64)
    np.maximum.at(gspan, bg_run, c_run)
    gmin = np.full(int(bg_run.max()) + 1, 1 << 60, np.int64)
    np.minimum.at(gmin, bg_run, c_run)
    over = (gspan - gmin) >= wcap
    tot_slots = np.zeros(int(bg_run.max()) + 1, np.int64)
    np.add.at(tot_slots, bg_run, s_c)
    rows_g = -(-tot_slots // qp)
    n_rows = int(rows_g.sum())

    # steps: rows bucket per block (window runs ignored in the census —
    # wide groups add a few)
    rows_blk = np.zeros(int(b_run.max()) + 1, np.int64)
    blk_of_g = np.zeros(int(bg_run.max()) + 1, np.int64)
    blk_of_g[bg_run] = b_run
    np.add.at(rows_blk, blk_of_g, rows_g)
    n_steps = int((-(-rows_blk // R_STEP)).sum())
    return n_rows, n_steps, int(over.sum()), len(gspan), int(nnz)


def main():
    t0 = time.perf_counter()
    grid, target, csr, padded = build_weights()
    print(f"# build {time.perf_counter()-t0:.1f}s nnz={csr.nnz}",
          file=sys.stderr)
    idx = padded.indices
    n_rows, n_steps, n_over, n_g, nnz = mc_rows(idx)
    print({
        "qp": QP, "block": BLOCK, "wcap": WCAP,
        "mc_rows": n_rows, "mc_steps": n_steps,
        "groups_over_span": n_over, "groups": n_g,
        "nnz": nnz,
        "fill": round(nnz / (n_rows * 128 * QP), 3),
    })
    from xugrid_tpu.regrid.aligned_apply import plan_gather_aligned

    t0 = time.perf_counter()
    plan = plan_gather_aligned(idx, padded.weights, block=BLOCK)
    print({
        "current_rows": int(plan.itab.shape[0]),
        "current_steps": int(plan.nsteps),
        "plan_s": round(time.perf_counter() - t0, 2),
    })


if __name__ == "__main__":
    main()
