"""Host-side packing analysis for the stream gather plan.

Decomposes lane_eff losses (last-round fill vs bucket max-round skew vs
pow2 step padding) on the bench 1M-face overlap matrix, and simulates
packing variants without compiling anything.  Pure numpy.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/bench_csr_1m.npz"


def load_padded():
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return z["indices"], z["weights"]
    import jax

    jax.config.update("jax_platforms", "cpu")
    from bench import quad_mesh
    import xugrid_tpu as xu
    from xugrid_tpu.core.sparse import MatrixCSR, PaddedCSR

    rng = np.random.default_rng(42)
    SIDE, TSIDE = 1000, 512
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
    tree = grid.celltree
    ti, si, areas = tree.intersect_faces(
        target.node_coordinates, target.face_node_connectivity, -1
    )
    csr = MatrixCSR.from_triplet(
        ti, si, areas, n=target.n_face, m=grid.n_face
    )
    padded = PaddedCSR.from_csr(csr, dtype=np.float32)
    np.savez(CACHE, indices=padded.indices, weights=padded.weights)
    return padded.indices, padded.weights


def stream_stats(indices, block=512, span=8, payload=127, group=128,
                 split_groups=False):
    """Replicate plan_gather_stream's packing and report the loss tree."""
    n, _w = indices.shape
    valid = indices >= 0
    ti, _sl = np.nonzero(valid)
    src = indices[valid]
    B = (ti // block).astype(np.int64)
    tslot = (ti % block).astype(np.int64)
    chk = (src >> 7).astype(np.int64)
    nnz = len(ti)

    if split_groups:
        # rounds break at group boundaries: key includes the group
        g = tslot // group
        key = (((B << 26) | (chk << 2) | g) << 16) | (
            (tslot % group) << 7
        ) | (src & 127)
        bc = (B << 26) | (chk << 2) | g
    else:
        key = (((B << 24) | chk) << 16) | (tslot << 7) | (src & 127)
        bc = (B << 24) | chk
    order = np.argsort(key)
    bc = bc[order]
    chk_s = chk[order]
    B_s = B[order]
    pos = np.arange(nnz, dtype=np.int64)
    newc = np.empty(nnz, bool)
    newc[0] = True
    np.not_equal(bc[1:], bc[:-1], out=newc[1:])
    cstart = np.maximum.accumulate(np.where(newc, pos, 0))
    posk = pos - cstart
    r = posk // payload

    span_id = chk_s // span
    lasts_c = np.flatnonzero(np.append(newc[1:], True))
    rounds_c = r[lasts_c] + 1
    # per-(block,chunk[,group]) round count
    bs_c = (B_s[lasts_c] << 26) | span_id[lasts_c]
    newb_c = np.empty(len(bs_c), bool)
    newb_c[0] = True
    np.not_equal(bs_c[1:], bs_c[:-1], out=newb_c[1:])
    bid_c = np.cumsum(newb_c) - 1
    n_buckets = int(bid_c[-1]) + 1
    Rb = np.zeros(n_buckets, np.int64)
    if split_groups:
        # rows of the same (chunk) but different groups stack in the
        # same column: per bucket, column k's rounds = sum over groups
        # of that chunk's rounds.
        colkey = bid_c * span + (chk_s[lasts_c] - span_id[lasts_c] * span)
        colr = np.zeros(n_buckets * span, np.int64)
        np.add.at(colr, colkey, rounds_c)
        np.maximum.at(Rb, bid_c, colr[colkey])
    else:
        np.maximum.at(Rb, bid_c, rounds_c)
    total_sp = int(Rb.sum())

    # loss decomposition
    rows_needed = int(rounds_c.sum())           # chunk-rows actually used
    slots_used = rows_needed * payload
    n_blocks = -(-n // block)
    n_real = total_sp + 0  # ignore missing-block dummies (tiny)
    gran = 1 << max(6, int(n_real).bit_length() - 4)
    nsteps = -(-n_real // gran) * gran
    tot_slots = nsteps * span * payload
    print(
        f"block={block} span={span} payload={payload} "
        f"split_groups={split_groups}"
    )
    print(
        f"  nnz={nnz}  rows={rows_needed}  fill_last_round="
        f"{nnz / slots_used:.3f}"
    )
    print(
        f"  buckets={n_buckets} total_sp={total_sp} "
        f"skew_eff={rows_needed / (total_sp * span):.3f}"
    )
    print(
        f"  n_real={n_real} nsteps={nsteps} pad_eff={n_real / nsteps:.3f}"
    )
    print(f"  lane_eff={nnz / tot_slots:.3f}  steps={nsteps}")
    # group spread per row (how many groups a round's entries span)
    if not split_groups:
        # per (block, chunk, round): count distinct groups
        rk = (bc << 8) | r
        order2 = np.argsort(rk, kind="stable")
        rk2 = rk[order2]
        g2 = (tslot[order][order2] // group)
        newr = np.empty(nnz, bool)
        newr[0] = True
        np.not_equal(rk2[1:], rk2[:-1], out=newr[1:])
        newg = np.empty(nnz, bool)
        newg[0] = True
        np.logical_or(
            newr[1:], g2[1:] != g2[:-1], out=newg[1:]
        )
        rid = np.cumsum(newr) - 1
        ngroups_per_row = np.bincount(rid[newg])
        hist = np.bincount(ngroups_per_row)
        print(f"  groups-per-row hist: {dict(enumerate(hist))}")
    return nsteps


def main():
    t0 = time.perf_counter()
    indices, weights = load_padded()
    print(f"weights loaded in {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    nnz = int((indices >= 0).sum())
    n, w = indices.shape
    print(f"n={n} w_max={w} nnz={nnz} avg_window={nnz/n:.2f}")
    for span in (4, 8, 16):
        stream_stats(indices, span=span)
    stream_stats(indices, span=8, split_groups=True)
    stream_stats(indices, block=1024, span=8)
    stream_stats(indices, block=2048, span=8)


if __name__ == "__main__":
    main()
