"""Host-side plan-locality census for the aligned gather engine.

The aligned engine's pass time is floored by plan ROWS (one serialized
slab read + accumulator RMW each, ~190 ns) and window DMA RUNS.  Both
are pure functions of the (target, source) index layout, so candidate
re-orderings can be scored entirely on the host:

  rows  = unique (target block, source chunk, 128-target group) keys
          plus Q_PACK spill rows
  runs  = greedy w-chunk window cover starts per block

Workloads:
  MODE=regrid    the 1M-face overlap bench matrix (natural, source-
                 Hilbert, target+source Hilbert orderings)
  MODE=laplace   the 1M-node delaunay unknown-unknown system (RCM vs
                 node-Hilbert orderings)

Run: MODE=regrid python scripts/locality_analysis.py   (CPU, no TPU)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

GROUP = 128
CHUNK = 128
Q_PACK = 4


def census(indices: np.ndarray, block: int = 512, label: str = "",
           w_cands=(64, 32, 16, 8)) -> None:
    """Print row/run statistics for an ELL index table."""
    n, _w = indices.shape
    valid = indices >= 0
    ti, _sl = np.nonzero(valid)
    src = indices[valid].astype(np.int64)
    B = ti // block
    g = (ti % block) // GROUP
    chunk = src >> 7
    nnz = len(src)
    key = ((B * (chunk.max() + 1) + chunk) * (block // GROUP) + g)
    lane = ti % GROUP
    full = (key << 7) | lane
    order = np.argsort(full, kind="stable")
    fs = full[order]
    newt = np.empty(nnz, bool)
    newt[0] = True
    np.not_equal(fs[1:], fs[:-1], out=newt[1:])
    pos = np.arange(nnz)
    rank = pos - np.maximum.accumulate(np.where(newt, pos, 0))
    spill = rank // Q_PACK
    rowkey = (fs >> 7) * (spill.max() + 1) + spill
    n_rows = len(np.unique(rowkey))
    # runs: per-block greedy window cover over sorted unique chunks
    kk = np.unique(key)
    B_r = kk // ((chunk.max() + 1) * (block // GROUP))
    c_r = (kk // (block // GROUP)) % (chunk.max() + 1)
    uq = np.unique(B_r * (chunk.max() + 2) + c_r)
    ub = uq // (chunk.max() + 2)
    uc = uq % (chunk.max() + 2)
    firstB = np.empty(len(uq), bool)
    firstB[0] = True
    np.not_equal(ub[1:], ub[:-1], out=firstB[1:])
    for w in w_cands:
        start = firstB.copy()
        while True:
            posr = np.arange(len(uq))
            idx0 = np.maximum.accumulate(np.where(start, posr, 0))
            c0 = uc[idx0]
            over = (uc - c0) >= w
            if not over.any():
                break
            cand = over & ~start
            prev_over = np.empty(len(uq), bool)
            prev_over[0] = False
            prev_over[1:] = over[:-1] & ~start[1:]
            start |= cand & ~prev_over
        runs = int(start.sum())
        print(
            f"  [{label}] block={block} w={w}: rows={n_rows} "
            f"runs={runs} nnz={nnz} "
            f"lane_eff={nnz / (n_rows * 128 * Q_PACK):.3f} "
            f"chunks/group={n_rows / max(len(np.unique(B * 1000000 + g)), 1):.2f}"
        )


def hilbert_perm(xy: np.ndarray) -> np.ndarray:
    from xugrid_tpu.ugrid.partitioning import hilbert_distance

    return np.argsort(hilbert_distance(xy), kind="stable")


def remap(indices, tperm=None, sperm=None):
    out = indices
    if tperm is not None:
        out = out[tperm]
    if sperm is not None:
        m = int(out.max()) + 1
        sinv = np.full(max(m, len(sperm)), -1, np.int64)
        sinv[sperm] = np.arange(len(sperm))
        out = np.where(out >= 0, sinv[np.clip(out, 0, None)], -1)
    return out


def main_regrid():
    from bench import quad_mesh

    import xugrid_tpu as xu
    from xugrid_tpu.core.sparse import MatrixCSR, PaddedCSR

    SIDE, TSIDE = 1000, 512
    rng = np.random.default_rng(42)
    verts, faces = quad_mesh(SIDE, SIDE)
    jitter = rng.uniform(-0.15, 0.15, verts.shape)
    edge = (
        (verts[:, 0] == 0) | (verts[:, 1] == 0)
        | (verts[:, 0] == SIDE) | (verts[:, 1] == SIDE)
    )
    jitter[edge] = 0.0
    verts = verts + jitter
    grid = xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces)
    dx = SIDE / TSIDE
    tverts, tfaces = quad_mesh(TSIDE, TSIDE, dx=dx)
    target = xu.Ugrid2d(tverts[:, 0], tverts[:, 1], -1, tfaces)
    t0 = time.perf_counter()
    ti, si, areas = grid.celltree.intersect_faces(
        target.node_coordinates, target.face_node_connectivity, -1
    )
    csr = MatrixCSR.from_triplet(
        ti, si, areas, n=target.n_face, m=grid.n_face
    )
    padded = PaddedCSR.from_csr(csr, dtype=np.float32)
    print(f"weights in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    idx = padded.indices

    tperm = hilbert_perm(target.centroids)
    sperm = hilbert_perm(grid.centroids)
    for block in (512, 1024, 2048):
        census(idx, block, "natural")
        census(remap(idx, sperm=sperm), block, "srcH")
        census(remap(idx, tperm, sperm), block, "bothH")


def main_laplace():
    import scipy.sparse
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    sys.argv = [sys.argv[0]]
    from scripts.laplace_scale_demo import build_grid

    n_side = int(os.environ.get("LAPLACE_SIDE", "1000"))
    grid = build_grid("delaunay", n_side)
    n = grid.n_node
    W = grid.node_node_connectivity.astype(np.float64)
    W.data = np.ones_like(W.data)
    rng = np.random.default_rng(7)
    known = rng.random(n) < 0.02
    unknown = np.flatnonzero(~known)
    position = np.full(n, -1, np.int64)
    position[unknown] = np.arange(len(unknown))
    sub = W[unknown].tocoo()
    keep = ~known[sub.col]
    rows_uu = sub.row[keep]
    cols_uu = position[sub.col[keep]]
    nu = len(unknown)
    A = scipy.sparse.coo_matrix(
        (np.ones(len(rows_uu)), (rows_uu, cols_uu)), shape=(nu, nu)
    ).tocsr()

    def ell_of(perm):
        pinv = np.empty(nu, np.int64)
        pinv[perm] = np.arange(nu)
        Ap = A[perm][:, perm].tocoo()
        r, c = Ap.row, Ap.col
        r = np.concatenate([r, np.arange(nu)])
        c = np.concatenate([c, np.arange(nu)])
        order = np.argsort(r, kind="stable")
        counts = np.bincount(r, minlength=nu)
        w_max = int(counts.max())
        starts = np.zeros(nu + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        offs = np.arange(len(r)) - starts[r[order]]
        idx = np.full((nu, w_max), -1, np.int32)
        idx[r[order], offs] = c[order]
        return idx

    rcm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    census(ell_of(rcm), 512, "rcm")
    hil = hilbert_perm(
        np.column_stack([grid.node_x, grid.node_y])[unknown]
    )
    census(ell_of(hil), 512, "hilbert")


if __name__ == "__main__":
    if os.environ.get("MODE", "regrid") == "laplace":
        main_laplace()
    else:
        main_regrid()
