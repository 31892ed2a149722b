"""On-chip sweep of the standard aligned engine's sub-slot pack width
``qp`` (1/2/4) at the 1M bench config.

Motivation (round 5): real overlap matrices fill only ~0.9 entries per
(row, lane) cell, yet Q_PACK=4 makes every gather/multiply/reduce carry
4 slots — ~4x VPU work on empty lanes.  Smaller qp spills over-full
cells to extra rows; this sweep measures the trade on chip.

Run:  python scripts/qp_sweep.py
Knobs: E (default 20), QPS (comma list, default "4,2,1"), BLOCKS
(default "1024"), RBMAX (cap row batch, default r_step).
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

from _sweep_common import build_weights, slope_time  # noqa: E402

E = int(os.environ.get("E", "20"))


def main():
    from xugrid_tpu.regrid.aligned_apply import (
        Q_PACK,
        R_BATCH,
        gather_aligned_apply,
        plan_gather_aligned,
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
    true_bytes = csr.nnz * 8 + (grid.n_face + target.n_face) * E * 4

    import scipy.sparse

    W = scipy.sparse.csr_matrix(
        (csr.data, csr.indices, csr.indptr), shape=(csr.n, csr.m)
    ).astype(np.float64)
    ws = np.asarray(W.sum(axis=1)).ravel()
    ws[ws == 0] = 1.0
    oracle = (W @ source[0].astype(np.float64)) / ws

    qps = [int(v) for v in os.environ.get("QPS", "4,2,1").split(",")]
    blocks = [int(v) for v in os.environ.get("BLOCKS", "1024").split(",")]
    for block in blocks:
        for qp in qps:
            t0 = time.perf_counter()
            plan = plan_gather_aligned(
                padded.indices, padded.weights, block=block, qp=qp
            )
            plan_s = time.perf_counter() - t0
            if plan is None:
                print(json.dumps({"qp": qp, "block": block,
                                  "error": "plan None"}))
                continue
            rb = min(plan.r_step, R_BATCH * (Q_PACK // qp))
            while plan.r_step % rb:
                rb -= 1
            n_runs = int((np.diff(plan.winc0) != 0).sum()) + 1
            slab_b = n_runs * plan.w_chunks * e_sub * 128 * 4
            tab_b = (plan.itab.size + plan.wtab.size) * 4
            out_b = len(plan.rwsum) * (e_sub * 4 + 4)
            dma = slab_b + tab_b + out_b
            srcE = stage_source_aligned(source, plan)

            @partial(
                jax.jit,
                static_argnames=(
                    "block", "r_step", "w_chunks", "n_blocks", "rb",
                    "qp",
                ),
            )
            def reps_fn(srcE, blkid, wmeta, winc0, meta, itab, wtab,
                        rw, n_reps, block, r_step, w_chunks, n_blocks,
                        rb, qp):
                def body(i, carry):
                    src, acc = carry
                    out = gather_aligned_apply(
                        src, blkid, wmeta, winc0, meta, itab, wtab,
                        rw, method="mean", has_nan=False, block=block,
                        r_step=r_step, w_chunks=w_chunks,
                        n_blocks=n_blocks, rb=rb, qp=qp,
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
                len(plan.rwsum) // plan.block, rb, qp,
            )
            try:
                from xugrid_tpu.regrid.aligned_apply import aligned_apply

                got = aligned_apply(source[:1], plan, method="mean",
                                    has_nan=False)
                abs_err = float(np.abs(got[:, 0] - oracle).max())
                p = slope_time(
                    lambda r: float(
                        reps_fn(*args, jnp.int32(r), *statics)
                    )
                )
            except Exception as exc:
                print(json.dumps({"qp": qp, "block": block,
                                  "error": repr(exc)[:300]}),
                      flush=True)
                continue
            print(json.dumps({
                "qp": qp, "block": plan.block, "rb": rb,
                "nsteps": len(plan.blkid),
                "rows": plan.itab.shape[0],
                "plan_s": round(plan_s, 2),
                "slab_mb": round(slab_b / 1e6, 1),
                "tab_mb": round(tab_b / 1e6, 1),
                "out_mb": round(out_b / 1e6, 1),
                "dma_waste": round(dma / true_bytes, 2),
                "ms_per_pass": round(p * 1e3, 3),
                "gbps_true": round(true_bytes / p / 1e9, 1),
                "pct_sol": round(
                    100 * true_bytes / p / 1e9 / 819.0, 2
                ),
                "max_abs_err": abs_err,
            }), flush=True)
            del args, srcE


if __name__ == "__main__":
    main()
