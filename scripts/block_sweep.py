"""On-chip sweep of aligned-engine plan variants (round-5 item 1).

Times the REAL ``gather_aligned_apply`` on the bench 1M-config overlap
matrix across target-block sizes (512/1024/2048) and gm on/off, at
E=20 and E=128, with the two-point-slope timer.  Host-side plan
decomposition (scripts/plan_decomp) showed block=1024 halves the slab
DMA (403 -> 201 MB/pass; waste 4.10 -> 2.38) at FEWER grid steps
(1536 -> 1408) — this script answers what that does to wall clock.

Run on the chip:  python scripts/block_sweep.py
Knobs: BLOCKS="512,1024,2048" GMS="0,1" ES="20,128" REPS_LO/HI
Needs /tmp/bench_pidx.npy + /tmp/bench_pw.npy (from plan_decomp) or
rebuilds the bench matrix.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from functools import partial  # noqa: E402

from xugrid_tpu.regrid.aligned_apply import (  # noqa: E402
    gather_aligned_apply,
    plan_gather_aligned,
    stage_source_aligned,
    default_span_steps,
)
from xugrid_tpu.regrid.gather_apply import pad_sublanes  # noqa: E402

REPS_LO = int(os.environ.get("REPS_LO", "20"))
REPS_HI = int(os.environ.get("REPS_HI", "100"))


def slope_time(call):
    call(REPS_LO)
    t_lo = t_hi = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        call(REPS_LO)
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        call(REPS_HI)
        t_hi = min(t_hi, time.perf_counter() - t0)
    return max((t_hi - t_lo) / (REPS_HI - REPS_LO), 1e-9)


def load_matrix():
    try:
        idx = np.load("/tmp/bench_pidx.npy")
        w = np.load("/tmp/bench_pw.npy")
        return idx, w
    except OSError:
        pass
    import xugrid_tpu as xu
    from xugrid_tpu.core.sparse import MatrixCSR, PaddedCSR

    def quad_mesh(nx, ny, dx=1.0):
        x = np.arange(nx + 1) * dx
        y = np.arange(ny + 1) * dx
        X, Y = np.meshgrid(x, y)
        verts = np.column_stack([X.ravel(), Y.ravel()])
        i, j = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        n0 = (i * (nx + 1) + j).ravel()
        faces = np.column_stack([n0, n0 + 1, n0 + nx + 2, n0 + nx + 1])
        return verts, faces

    n_side, t_side = 1000, 512
    rng = np.random.default_rng(42)
    verts, faces = quad_mesh(n_side, n_side)
    jitter = rng.uniform(-0.15, 0.15, verts.shape)
    edge = (
        (verts[:, 0] == 0) | (verts[:, 1] == 0)
        | (verts[:, 0] == n_side) | (verts[:, 1] == n_side)
    )
    jitter[edge] = 0.0
    verts = verts + jitter
    grid = xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces)
    dx = n_side / t_side
    tverts, tfaces = quad_mesh(t_side, t_side, dx=dx)
    target = xu.Ugrid2d(tverts[:, 0], tverts[:, 1], -1, tfaces)
    ti, si, areas = grid.celltree.intersect_faces(
        target.node_coordinates, target.face_node_connectivity, -1
    )
    csr = MatrixCSR.from_triplet(ti, si, areas, n=target.n_face, m=grid.n_face)
    padded = PaddedCSR.from_csr(csr, dtype=np.float32)
    np.save("/tmp/bench_pidx.npy", padded.indices)
    np.save("/tmp/bench_pw.npy", padded.weights)
    return padded.indices, padded.weights


def time_plan(plan, src2d, method="mean"):
    srcE = stage_source_aligned(src2d, plan)
    span = default_span_steps()

    @partial(
        jax.jit,
        static_argnames=(
            "method", "block", "r_step", "w_chunks", "n_blocks", "gm",
            "span_steps",
        ),
    )
    def reps_fn(srcE, blkid, wmeta, winc0, meta, itab, wtab, rw,
                n_reps, method, block, r_step, w_chunks, n_blocks, gm,
                span_steps):
        def body(i, carry):
            src, acc = carry
            out = gather_aligned_apply(
                src, blkid, wmeta, winc0, meta, itab, wtab, rw,
                method=method, has_nan=False, block=block,
                r_step=r_step, w_chunks=w_chunks, n_blocks=n_blocks,
                gm=gm, span_steps=span_steps,
            )
            acc = acc + jnp.nansum(out)
            src = src.at[0, 0].add(src.dtype.type(1e-12))
            return (src, acc)

        _, acc = jax.lax.fori_loop(
            0, n_reps, body, (srcE, jnp.float32(0.0))
        )
        return acc

    args = (
        jnp.asarray(srcE), jnp.asarray(plan.blkid),
        jnp.asarray(plan.wmeta), jnp.asarray(plan.winc0),
        jnp.asarray(plan.meta), jnp.asarray(plan.itab),
        jnp.asarray(plan.wtab), jnp.asarray(plan.rwsum),
    )
    statics = (
        method, plan.block, plan.r_step, plan.w_chunks,
        len(plan.rwsum) // plan.block, plan.gm, span,
    )
    return slope_time(
        lambda r: float(reps_fn(*args, jnp.int32(r), *statics))
    )


def main():
    idx, w = load_matrix()
    n, _ = idx.shape
    m = int(idx.max()) + 1
    rng = np.random.default_rng(7)
    blocks = [int(b) for b in os.environ.get(
        "BLOCKS", "512,1024,2048").split(",")]
    gms = [int(g) for g in os.environ.get("GMS", "0").split(",")]
    es = [int(e) for e in os.environ.get("ES", "20,128").split(",")]
    srcs = {e: rng.normal(size=(e, 1_000_000)).astype(np.float32)
            for e in es}

    # Correctness oracle at E=2 on the first variant only (cheap).
    results = {}
    for block in blocks:
        for gm in gms:
            plan = plan_gather_aligned(idx, w, block=block, gm=bool(gm))
            if plan is None:
                print(f"block={block} gm={gm}: plan None", flush=True)
                continue
            n_runs = int((np.diff(plan.winc0) != 0).sum()) + 1
            for e in es:
                e_sub = pad_sublanes(e)
                slab = n_runs * plan.w_chunks * e_sub * 128 * 4
                tables = (plan.itab.size + plan.wtab.size) * 4
                outb = len(plan.rwsum) * e_sub * 4 + len(plan.rwsum) * 4
                dma = slab + tables + outb
                true_b = (
                    int((idx >= 0).sum()) * 8
                    + (m + n) * e * 4
                )
                t = time_plan(plan, srcs[e])
                key = f"block{block}_gm{gm}_E{e}"
                results[key] = {
                    "s_per_pass": round(t, 5),
                    "gbps_true": round(true_b / t / 1e9, 1),
                    "pct_sol": round(true_b / t / 1e9 / 8.19, 2),
                    "dma_mb": round(dma / 1e6, 1),
                    "waste": round(dma / true_b, 2),
                    "nsteps": plan.nsteps,
                    "runs": n_runs,
                    "w": plan.w_chunks,
                }
                print(key, results[key], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
