"""Honest (slope-timed) profiling of the CG matvec on the real 1M
Delaunay unknown-unknown system.

Builds the padded-window system exactly as cg_solve does (RCM order,
offdiag+diag), plans the aligned engine, and two-point-slope-times
``gather_aligned_apply(method="matvec")`` at e_sub=8 — the solver's
inner operation — under the usual knobs:

  W=16|32|64   window width (XUGRID_TPU_ALIGNED_W)
  SPAN=0|16    plan-table span streaming
  RB=4|8|16    rows per fused gather
  GM=0|1       group-major row order
  REPS_LO/HI   slope points (default 20/100)

Prereq: /tmp/delaunay_rows.npy + /tmp/delaunay_cols.npy from
scripts/matvec_census.py (or any COO of the unknown-unknown graph).
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache"),
)

REPS_LO = int(os.environ.get("REPS_LO", "20"))
REPS_HI = int(os.environ.get("REPS_HI", "100"))


def main():
    rows = np.load("/tmp/delaunay_rows.npy")
    cols = np.load("/tmp/delaunay_cols.npy")
    nu = int(rows.max()) + 1
    deg = np.bincount(rows, minlength=nu).astype(np.float64)
    # offdiag -1, diag = degree (Laplacian), diag entries appended.
    r_all = np.concatenate([rows, np.arange(nu)])
    c_all = np.concatenate([cols, np.arange(nu)])
    v_all = np.concatenate([-np.ones(len(rows)), deg])

    # Pack into padded windows like cg_solve.
    order = np.argsort(r_all, kind="stable")
    counts = np.bincount(r_all, minlength=nu)
    w_max = 1 << int(max(int(counts.max()), 1) - 1).bit_length()
    starts = np.zeros(nu + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    offs = np.arange(len(r_all)) - starts[r_all[order]]
    idx = np.full((nu, w_max), -1, np.int32)
    wv = np.zeros((nu, w_max), np.float32)
    idx[r_all[order], offs] = c_all[order]
    wv[r_all[order], offs] = v_all[order]

    from xugrid_tpu.regrid.aligned_apply import (
        gather_aligned_apply,
        plan_gather_aligned,
        stage_source_aligned,
    )

    forced_w = os.environ.get("W")
    if forced_w:
        os.environ["XUGRID_TPU_ALIGNED_W"] = forced_w
    t0 = time.perf_counter()
    plan = plan_gather_aligned(
        idx, wv,
        r_step=int(os.environ.get("R_STEP", "16")),
        gm=os.environ.get("GM", "0") == "1",
    )
    assert plan is not None
    nnz = len(v_all)
    runs = int((np.diff(plan.winc0) != 0).sum()) + 1
    print(
        f"plan: {time.perf_counter()-t0:.1f}s nsteps={plan.nsteps} "
        f"rows={plan.itab.shape[0]} block={plan.block} "
        f"r_step={plan.r_step} w={plan.w_chunks} runs={runs} "
        f"nnz={nnz} gm={plan.gm}",
        file=sys.stderr,
    )

    x = np.random.default_rng(0).normal(size=(1, nu)).astype(np.float32)
    srcE = stage_source_aligned(x, plan)
    if os.environ.get("E_SUB", "8") == "1":
        # The (1, N) single-RHS state cg_solve now feeds the kernel:
        # no 8-fold sublane broadcast of the staged vector.
        srcE = np.ascontiguousarray(srcE[:1])
    rb = int(os.environ.get("RB", "8"))
    span = int(os.environ.get("SPAN", "0"))
    n_blocks = len(plan.rwsum) // plan.block

    @partial(jax.jit, static_argnames=(
        "block", "r_step", "w_chunks", "n_blocks", "rb", "gm", "span"))
    def reps_fn(srcE, blkid, wmeta, winc0, meta, itab, wtab, rwsum,
                n_reps, block, r_step, w_chunks, n_blocks, rb, gm,
                span):
        def body(i, carry):
            src, acc = carry
            out = gather_aligned_apply(
                src, blkid, wmeta, winc0, meta, itab, wtab, rwsum,
                method="matvec", has_nan=False,
                block=block, r_step=r_step, w_chunks=w_chunks,
                n_blocks=n_blocks, rb=rb, gm=gm, span_steps=span,
            )
            acc = acc + jnp.nansum(out)
            src = src.at[0, 0].add(jnp.float32(1e-12))
            return (src, acc)

        _, acc = jax.lax.fori_loop(
            0, n_reps, body, (jnp.asarray(srcE), jnp.float32(0.0))
        )
        return acc

    dargs = (
        jnp.asarray(srcE), jnp.asarray(plan.blkid),
        jnp.asarray(plan.wmeta), jnp.asarray(plan.winc0),
        jnp.asarray(plan.meta), jnp.asarray(plan.itab),
        jnp.asarray(plan.wtab), jnp.asarray(plan.rwsum),
    )
    statics = (plan.block, plan.r_step, plan.w_chunks, n_blocks, rb,
               plan.gm, span)
    t0 = time.perf_counter()
    _ = float(reps_fn(*dargs, jnp.int32(REPS_LO), *statics))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    t_lo = t_hi = np.inf
    for _k in range(2):
        t0 = time.perf_counter()
        _ = float(reps_fn(*dargs, jnp.int32(REPS_LO), *statics))
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = float(reps_fn(*dargs, jnp.int32(REPS_HI), *statics))
        t_hi = min(t_hi, time.perf_counter() - t0)
    p = (t_hi - t_lo) / (REPS_HI - REPS_LO)
    n_rows = plan.itab.shape[0]
    print(
        f"matvec [w={plan.w_chunks} rb={rb} gm={plan.gm} span={span} "
        f"rows={n_rows}]: {p*1e3:.2f} ms/matvec "
        f"({p/n_rows*1e9:.0f} ns/row, F={t_lo-REPS_LO*p:.3f}s)"
    )


if __name__ == "__main__":
    main()
