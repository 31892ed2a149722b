"""Host census for the packed-superchunk matvec plan (round 4).

Builds the 1M-node Delaunay Laplace unknown-unknown system exactly as
scripts/laplace_scale_demo.py does (RCM-permuted), then compares the
row counts of:

- the CURRENT aligned plan keying: rows = (128-target group, 128-source
  chunk, spill) — what the CG matvec rides today, and
- the PROPOSED packed keying: rows = (group, 1024-source superchunk,
  spill) where x is staged as 8 SHIFTED sublane copies so one slab read
  exposes 1024 consecutive source values, and each (lane, sublane) slot
  of a row holds up to QS entries.

Per-row serialized cost is ~equal between the two (one slab read + one
accumulator RMW), so the row ratio approximates the matvec speedup.

Run: python scripts/matvec_census.py   (CPU, ~2 min)
Env: SIDE=1000 (mesh scale), QS=1,2 (slots per (lane, sublane)).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

jax.config.update("jax_platforms", "cpu")

import scipy.sparse
from scipy.sparse.csgraph import reverse_cuthill_mckee

import xugrid_tpu as xu
from scipy.spatial import Delaunay


def build_system(n_side):
    rng = np.random.default_rng(11)
    n_pts = (n_side + 1) ** 2
    pts = rng.uniform(0.0, 100.0, (n_pts, 2))
    tri = Delaunay(pts)
    perm = rng.permutation(n_pts)
    inv = np.empty(n_pts, np.int64)
    inv[perm] = np.arange(n_pts)
    grid = xu.Ugrid2d(
        pts[perm][:, 0], pts[perm][:, 1], -1, inv[tri.simplices]
    )
    W = grid.node_node_connectivity.astype(np.float64).tocsr()
    rng2 = np.random.default_rng(7)
    known = rng2.random(grid.n_node) < 0.02
    unknown = np.flatnonzero(~known)
    position = np.full(grid.n_node, -1, np.int64)
    position[unknown] = np.arange(len(unknown))
    sub = W[unknown].tocoo()
    uu = ~known[sub.col]
    rows = sub.row[uu]
    cols = position[sub.col[uu]]
    nu = len(unknown)
    A = scipy.sparse.coo_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=(nu, nu)
    ).tocsr()
    p = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    pinv = np.empty(nu, np.int64)
    pinv[p] = np.arange(nu)
    return pinv[rows], pinv[cols], nu


def census(rows, cols, nu, qs_list=(1, 2)):
    g = rows // 128
    # current aligned keying ------------------------------------------
    chunk = cols // 128
    key = g * (int(chunk.max()) + 1) + chunk
    order = np.argsort(
        key * 128 + (rows % 128), kind="stable"
    )
    k_s = key[order]
    lane_s = (rows % 128)[order]
    pairkey = k_s * 128 + lane_s
    new = np.r_[True, pairkey[1:] != pairkey[:-1]]
    pos = np.arange(len(k_s))
    rank = pos - np.maximum.accumulate(np.where(new, pos, 0))
    cur_rows = len(np.unique(k_s * 64 + np.minimum(rank // 4, 63)))
    print(
        f"current aligned keying: rows={cur_rows} "
        f"({len(rows)} nnz, {len(rows)/cur_rows:.1f}/row, "
        f"occupancy {len(rows)/(cur_rows*512):.2f})"
    )

    # packed superchunk keying ----------------------------------------
    sup = cols // 1024
    s = (cols // 128) % 8
    for qs in qs_list:
        key2 = (g * (int(sup.max()) + 1) + sup)
        slot = key2 * 1024 + (rows % 128) * 8 + s
        order2 = np.argsort(slot, kind="stable")
        sl = slot[order2]
        new2 = np.r_[True, sl[1:] != sl[:-1]]
        pos2 = np.arange(len(sl))
        rank2 = pos2 - np.maximum.accumulate(np.where(new2, pos2, 0))
        spill = rank2 // qs
        rkey = key2[order2] * 64 + np.minimum(spill, 63)
        n_rows = len(np.unique(rkey))
        # table bytes/row: itab (2*qs int32 words x 128) + wtab
        # (8*qs f32 x 128)
        tab_mb = n_rows * (2 * qs + 8 * qs) * 128 * 4 / 1e6
        print(
            f"packed qs={qs}: rows={n_rows} "
            f"({len(rows)/n_rows:.1f}/row, ratio "
            f"{cur_rows/n_rows:.2f}x, tables {tab_mb:.0f} MB, "
            f"spill rows {int((spill>0).sum())} entries beyond slot 0)"
        )


def main():
    n_side = int(os.environ.get("SIDE", "1000"))
    t0 = time.perf_counter()
    rows, cols, nu = build_system(n_side)
    print(
        f"system: nu={nu} nnz={len(rows)} "
        f"(build {time.perf_counter()-t0:.1f}s)"
    )
    bw = int(np.abs(rows - cols).max())
    print(f"RCM bandwidth: {bw}")
    census(rows, cols, nu)


if __name__ == "__main__":
    main()
