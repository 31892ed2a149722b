"""On-chip sweep of the packed-superchunk (super) apply engine at the
1M bench config (VERDICT r4 item 1: dma_waste < 2.5 AND >=15% SoL).

Builds the REAL bench weights once (host BVH + overlap clip), then for
each (qs, block, w_sups, rb, span) variant builds the super plan and
slope-times the full kernel on chip.  Per variant it prints the plan
composition — slab vs table vs output DMA bytes — so the dominating
traffic component is visible next to the measured time.

Run on the chip:  python scripts/super_sweep.py
Knobs: N_SIDE (default 1000), E (default 20), VARIANTS (comma list of
qs:block:w_sups:rb:span tuples; default a built-in sweep).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache"),
)

N_SIDE = int(os.environ.get("N_SIDE", "1000"))
T_SIDE = int(os.environ.get("T_SIDE", "512"))
E = int(os.environ.get("E", "20"))
REPS_LO, REPS_HI = 20, 100


def quad_mesh(nx, ny, dx=1.0):
    x = np.arange(nx + 1.0) * dx
    y = np.arange(ny + 1.0) * dx
    yy, xx = np.meshgrid(y, x, indexing="ij")
    verts = np.column_stack([xx.ravel(), yy.ravel()])
    j, i = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    nid = lambda ii, jj: jj * (nx + 1) + ii  # noqa: E731
    faces = np.stack(
        [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)],
        axis=-1,
    ).reshape(-1, 4)
    return verts, faces


def build_weights():
    import xugrid_tpu as xu
    from xugrid_tpu.core.sparse import MatrixCSR, PaddedCSR

    rng = np.random.default_rng(42)
    verts, faces = quad_mesh(N_SIDE, N_SIDE)
    jitter = rng.uniform(-0.15, 0.15, verts.shape)
    edge = (
        (verts[:, 0] == 0)
        | (verts[:, 1] == 0)
        | (verts[:, 0] == N_SIDE)
        | (verts[:, 1] == N_SIDE)
    )
    jitter[edge] = 0.0
    verts = verts + jitter
    grid = xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces)
    dx = N_SIDE / T_SIDE
    tverts, tfaces = quad_mesh(T_SIDE, T_SIDE, dx=dx)
    target = xu.Ugrid2d(tverts[:, 0], tverts[:, 1], -1, tfaces)
    ti, si, areas = grid.celltree.intersect_faces(
        target.node_coordinates, target.face_node_connectivity, -1
    )
    csr = MatrixCSR.from_triplet(
        ti, si, areas, n=target.n_face, m=grid.n_face
    )
    padded = PaddedCSR.from_csr(csr, dtype=np.float32)
    return grid, target, csr, padded


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


def main():
    from xugrid_tpu.regrid.aligned_apply import (
        gather_aligned_apply,
        plan_gather_super,
        stage_source_aligned,
    )
    from xugrid_tpu.regrid.gather_apply import pad_sublanes

    t0 = time.perf_counter()
    grid, target, csr, padded = build_weights()
    print(f"# weights: nnz={csr.nnz} build={time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    rng = np.random.default_rng(1)
    source = rng.normal(size=(E, grid.n_face)).astype(np.float32)
    e_sub = pad_sublanes(E)
    true_bytes = (
        csr.nnz * 8 + (grid.n_face + target.n_face) * E * 4
    )

    variants = os.environ.get(
        "VARIANTS",
        "2:1024:8:2:0,1:1024:8:4:0,4:1024:8:1:0,2:2048:8:2:0,"
        "2:1024:4:2:0,1:1024:4:4:0,2:1024:8:4:0,1:2048:8:4:0,"
        "2:1024:8:2:16,1:1024:8:4:16",
    )
    oracle = None
    for spec in variants.split(","):
        qs, block, w_sups, rb, span = (int(v) for v in spec.split(":"))
        t0 = time.perf_counter()
        try:
            plan = plan_gather_super(
                padded.indices, padded.weights, qs=qs, block=block,
                w_sups=w_sups,
            )
        except Exception as exc:
            print(json.dumps({"variant": spec, "error": repr(exc)}))
            continue
        plan_s = time.perf_counter() - t0
        if plan is None:
            print(json.dumps({"variant": spec, "error": "plan None"}))
            continue
        while plan.r_step % rb:
            rb -= 1
        n_runs = int((np.diff(plan.winc0) != 0).sum()) + 1
        slab_b = n_runs * plan.w_chunks * e_sub * 128 * 4
        tab_b = (plan.itab.size + plan.wtab.size) * 4
        out_b = len(plan.rwsum) * (e_sub * 4 + 4)
        dma = slab_b + tab_b + out_b
        nsteps = len(plan.blkid)
        srcE = stage_source_aligned(source, plan)

        @partial(
            jax.jit,
            static_argnames=(
                "block", "r_step", "w_chunks", "n_blocks", "rb",
                "sq", "span_steps",
            ),
        )
        def reps_fn(srcE, blkid, wmeta, winc0, meta, itab, wtab, rw,
                    n_reps, block, r_step, w_chunks, n_blocks, rb, sq,
                    span_steps):
            def body(i, carry):
                src, acc = carry
                out = gather_aligned_apply(
                    src, blkid, wmeta, winc0, meta, itab, wtab, rw,
                    method="mean", has_nan=False, block=block,
                    r_step=r_step, w_chunks=w_chunks,
                    n_blocks=n_blocks, rb=rb, sq=sq,
                    span_steps=span_steps,
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
            plan.block, plan.r_step, plan.w_chunks,
            len(plan.rwsum) // plan.block, rb, plan.sq, span,
        )
        try:
            # Parity guard before timing: one apply vs the CSR oracle.
            from xugrid_tpu.regrid.aligned_apply import aligned_apply

            got = aligned_apply(source[:1], plan, method="mean",
                                has_nan=False)
            if oracle is None:
                import scipy.sparse

                W = scipy.sparse.csr_matrix(
                    (csr.data, csr.indices, csr.indptr),
                    shape=(csr.n, csr.m),
                ).astype(np.float64)
                ws = np.asarray(W.sum(axis=1)).ravel()
                ws[ws == 0] = 1.0
                oracle = (W @ source[0].astype(np.float64)) / ws
            rel = np.abs(got[:, 0] - oracle) / np.maximum(
                np.abs(oracle), 1e-6
            )
            max_rel = float(rel.max())
            p = slope_time(
                lambda r: float(reps_fn(*args, jnp.int32(r), *statics))
            )
        except Exception as exc:
            print(json.dumps({"variant": spec, "nsteps": nsteps,
                              "error": repr(exc)[:200]}))
            continue
        print(json.dumps({
            "variant": spec,
            "qs": qs, "block": plan.block, "w_sups": plan.w_chunks // 8,
            "rb": rb, "span": span,
            "nsteps": nsteps, "rows": nsteps * plan.r_step,
            "plan_s": round(plan_s, 2),
            "slab_mb": round(slab_b / 1e6, 1),
            "tab_mb": round(tab_b / 1e6, 1),
            "out_mb": round(out_b / 1e6, 1),
            "dma_waste": round(dma / true_bytes, 2),
            "ms_per_pass": round(p * 1e3, 3),
            "gbps_true": round(true_bytes / p / 1e9, 1),
            "pct_sol": round(100 * true_bytes / p / 1e9 / 819.0, 2),
            "gbps_actual": round(dma / p / 1e9, 1),
            "max_rel_err": max_rel,
        }), flush=True)
        del args, srcE


if __name__ == "__main__":
    main()
