"""Time the gather-packet kernel vs the old slab kernel on the TPU.

Replicates bench.py's 1M-face overlap config. Run on the real chip.
  N_EXTRA=128 python scripts/gather_perf.py   for the lane-packed run.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache"),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import quad_mesh  # noqa: E402

N_EXTRA = int(os.environ.get("N_EXTRA", "20"))
SIDE = int(os.environ.get("SIDE", "1000"))
TSIDE = int(os.environ.get("TSIDE", "512"))
METHOD = os.environ.get("METHOD", "mean")
ENGINE = os.environ.get("ENGINE", "span")


def main():
    import xugrid_tpu as xu
    from xugrid_tpu.core.sparse import MatrixCSR, PaddedCSR

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
    tree = grid.celltree
    ti, si, areas = tree.intersect_faces(
        target.node_coordinates, target.face_node_connectivity, -1
    )
    print(f"weights built in {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    csr = MatrixCSR.from_triplet(
        ti, si, areas, n=target.n_face, m=grid.n_face
    )
    padded = PaddedCSR.from_csr(csr, dtype=np.float32)
    source = rng.normal(size=(N_EXTRA, grid.n_face)).astype(np.float32)
    true_bytes = (
        csr.nnz * 8 + grid.n_face * N_EXTRA * 4 + target.n_face * N_EXTRA * 4
    )

    from xugrid_tpu.regrid.gather_apply import (
        _use_mxu,
        gather_pdot_apply,
        gather_span_apply,
        gather_stream_apply,
        gather_windowed_apply,
        plan_gather,
        plan_gather_pdot,
        plan_gather_span,
        plan_gather_stream,
        stage_source,
    )

    if ENGINE == "select":
        run_select(padded, source, true_bytes)
        return
    if ENGINE == "aligned":
        run_aligned(padded, source, true_bytes, grid)
        return

    t0 = time.perf_counter()
    if ENGINE == "pdot":
        plan = plan_gather_pdot(
            padded.indices, padded.weights,
            span=int(os.environ.get("PD_SPAN", "1")),
        )
    elif ENGINE == "stream":
        plan = plan_gather_stream(padded.indices, padded.weights)
    elif ENGINE == "span":
        plan = plan_gather_span(padded.indices, padded.weights)
    else:
        plan = plan_gather(padded.indices, padded.weights)
    print(f"plan[{ENGINE}]: {time.perf_counter()-t0:.2f}s", file=sys.stderr)
    if plan is None:
        print("PLAN REJECTED")
        return
    if ENGINE == "pdot":
        rows = int(plan.nsp.sum()) * plan.span
        print(
            f"plan: maxc={plan.maxc} nsp_max={plan.nsp_max} "
            f"span={plan.span} nsp_total={int(plan.nsp.sum())} "
            f"nnz={csr.nnz} lane_eff={csr.nnz/(rows*128):.2f}",
            file=sys.stderr,
        )
    elif ENGINE == "stream":
        nsteps = len(plan.blkid)
        print(
            f"plan: nsteps={nsteps} span={plan.span} "
            f"scan_steps={plan.scan_steps} nnz={csr.nnz} "
            f"lane_eff={csr.nnz/(nsteps*plan.span*127):.2f} "
            f"uniq_spanblk_runs="
            f"{int((np.diff(plan.spanblk) != 0).sum()) + 1}",
            file=sys.stderr,
        )
    elif ENGINE == "span":
        print(
            f"plan: maxc={plan.maxc} nsp_max={plan.nsp_max} "
            f"span={plan.span} scan_steps={plan.scan_steps} "
            f"nsp_total={int(plan.nsp.sum())} nnz={csr.nnz} "
            f"lane_eff={csr.nnz/(plan.nsp.sum()*plan.span*127):.2f}",
            file=sys.stderr,
        )
    else:
        print(
            f"plan: maxc={plan.maxc} npk_max={plan.npk_max} "
            f"scan_steps={plan.scan_steps} "
            f"npk_total={int(plan.npk.sum())} "
            f"nnz={csr.nnz} lane_eff={csr.nnz/ (plan.npk.sum()*127):.2f}",
            file=sys.stderr,
        )
    srcE = stage_source(source, plan)

    if ENGINE == "pdot":
        @partial(jax.jit, static_argnames=("method", "maxc", "span",
                                           "n_reps"))
        def pdot_reps(srcE, c0, nsp, meta, ptab, rwsum,
                      method, maxc, span, n_reps):
            def body(i, acc):
                out = gather_pdot_apply(
                    srcE + i.astype(srcE.dtype) * 1e-12,
                    c0, nsp, meta, ptab, rwsum,
                    method=method, has_nan=False,
                    maxc=maxc, span=span,
                )
                return acc + jnp.nansum(out)

            import jax.lax as lax
            return lax.fori_loop(0, n_reps, body, jnp.float32(0.0))

        reps = int(os.environ.get("REPS", "10"))
        dargs = (
            jnp.asarray(srcE), jnp.asarray(plan.chunk0),
            jnp.asarray(plan.nsp), jnp.asarray(plan.meta),
            jnp.asarray(plan.ptab), jnp.asarray(plan.rwsum),
        )
        t0 = time.perf_counter()
        cs = float(pdot_reps(*dargs, METHOD, plan.maxc, plan.span, reps))
        print(f"compile+first: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.perf_counter()
        cs = float(pdot_reps(*dargs, METHOD, plan.maxc, plan.span, reps))
        dt = (time.perf_counter() - t0) / reps
        gbps = true_bytes / dt / 1e9
        print(
            f"pdot kernel [{METHOD} E={N_EXTRA} span={plan.span}]: "
            f"{dt*1e3:.2f} ms/pass  {gbps:.1f} GB/s true  "
            f"{100*gbps/819:.1f}% SoL  checksum={cs:.3f}"
        )
        check_against_xla(source, padded, plan, grid)
        return

    if ENGINE == "stream":
        n_blocks = len(plan.rwsum) // plan.block

        @partial(jax.jit, static_argnames=("method", "scan_steps",
                                           "span", "n_blocks", "n_reps"))
        def stream_reps(srcE, blkid, spanblk, ptab, rwsum,
                        method, scan_steps, span, n_blocks, n_reps):
            def body(i, acc):
                out = gather_stream_apply(
                    srcE + i.astype(srcE.dtype) * 1e-12,
                    blkid, spanblk, ptab, rwsum,
                    method=method, has_nan=False,
                    scan_steps=scan_steps, span=span,
                    n_blocks=n_blocks,
                )
                return acc + jnp.nansum(out)

            import jax.lax as lax
            return lax.fori_loop(0, n_reps, body, jnp.float32(0.0))

        reps = int(os.environ.get("REPS", "10"))
        dargs = (
            jnp.asarray(srcE), jnp.asarray(plan.blkid),
            jnp.asarray(plan.spanblk), jnp.asarray(plan.ptab),
            jnp.asarray(plan.rwsum),
        )
        t0 = time.perf_counter()
        cs = float(stream_reps(*dargs, METHOD, plan.scan_steps,
                               plan.span, n_blocks, reps))
        print(f"compile+first: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.perf_counter()
        cs = float(stream_reps(*dargs, METHOD, plan.scan_steps,
                               plan.span, n_blocks, reps))
        dt = (time.perf_counter() - t0) / reps
        gbps = true_bytes / dt / 1e9
        print(
            f"stream kernel [{METHOD} E={N_EXTRA} span={plan.span}]: "
            f"{dt*1e3:.2f} ms/pass  {gbps:.1f} GB/s true  "
            f"{100*gbps/819:.1f}% SoL  checksum={cs:.3f}"
        )
        check_against_xla(source, padded, plan, grid)
        return

    if ENGINE == "span":
        @partial(jax.jit, static_argnames=("method", "scan_steps", "maxc",
                                           "span", "n_reps"))
        def span_reps(srcE, c0, nsp, meta, ptab, rwsum,
                      method, scan_steps, maxc, span, n_reps):
            def body(i, acc):
                out = gather_span_apply(
                    srcE + i.astype(srcE.dtype) * 1e-12,
                    c0, nsp, meta, ptab, rwsum,
                    method=method, has_nan=False,
                    scan_steps=scan_steps, maxc=maxc, span=span,
                )
                return acc + jnp.nansum(out)

            import jax.lax as lax
            return lax.fori_loop(0, n_reps, body, jnp.float32(0.0))

        reps = int(os.environ.get("REPS", "10"))
        dargs = (
            jnp.asarray(srcE), jnp.asarray(plan.chunk0),
            jnp.asarray(plan.nsp), jnp.asarray(plan.meta),
            jnp.asarray(plan.ptab), jnp.asarray(plan.rwsum),
        )
        t0 = time.perf_counter()
        cs = float(span_reps(*dargs, METHOD, plan.scan_steps, plan.maxc,
                             plan.span, reps))
        print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        t0 = time.perf_counter()
        cs = float(span_reps(*dargs, METHOD, plan.scan_steps, plan.maxc,
                             plan.span, reps))
        dt = (time.perf_counter() - t0) / reps
        gbps = true_bytes / dt / 1e9
        print(
            f"span kernel [{METHOD} E={N_EXTRA} span={plan.span}]: "
            f"{dt*1e3:.2f} ms/pass  {gbps:.1f} GB/s true  "
            f"{100*gbps/819:.1f}% SoL  checksum={cs:.3f}"
        )
        check_against_xla(source, padded, plan, grid)
        return

    reps = int(os.environ.get("REPS", "10"))

    mxu = _use_mxu(METHOD, False, srcE.shape[0])
    scan_steps = 0 if mxu else plan.scan_steps
    page = plan.page if mxu else np.zeros((8, 128), np.int32)
    print(f"mxu={mxu}", file=sys.stderr)

    @partial(jax.jit, static_argnames=("method", "scan_steps", "maxc",
                                       "mxu", "n_reps"))
    def gather_reps(srcE, c0, npk, meta, ptab, page, rwsum,
                    method, scan_steps, maxc, mxu, n_reps):
        def body(i, acc):
            out = gather_windowed_apply(
                srcE + i.astype(srcE.dtype) * 1e-12,
                c0, npk, meta, ptab, page, rwsum,
                method=method, has_nan=False,
                scan_steps=scan_steps, maxc=maxc, mxu=mxu,
            )
            return acc + jnp.nansum(out)

        import jax.lax as lax
        return lax.fori_loop(0, n_reps, body, jnp.float32(0.0))

    dargs = (
        jnp.asarray(srcE), jnp.asarray(plan.chunk0), jnp.asarray(plan.npk),
        jnp.asarray(plan.meta), jnp.asarray(plan.ptab), jnp.asarray(page),
        jnp.asarray(plan.rwsum),
    )
    t0 = time.perf_counter()
    cs = float(gather_reps(*dargs, METHOD, scan_steps, plan.maxc, mxu, reps))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    cs = float(gather_reps(*dargs, METHOD, scan_steps, plan.maxc, mxu, reps))
    dt = (time.perf_counter() - t0) / reps
    gbps = true_bytes / dt / 1e9
    print(
        f"gather kernel [{METHOD} E={N_EXTRA}]: {dt*1e3:.2f} ms/pass  "
        f"{gbps:.1f} GB/s true  {100*gbps/819:.1f}% SoL  checksum={cs:.3f}"
    )

    check_against_xla(source, padded, plan, grid)



def run_aligned(padded, source, true_bytes, grid):
    """Time the target-aligned banded engine.  Env knobs for on-chip
    sweeps (each combo is one kernel compile):
      ABLOCK=512|1024|2048  R_STEP=8|16|32  WCHUNKS=16|32|64  RB=1|2|4
    """
    from xugrid_tpu.regrid.aligned_apply import (
        gather_aligned_apply,
        plan_gather_aligned,
        stage_source_aligned,
    )

    t0 = time.perf_counter()
    plan = plan_gather_aligned(
        padded.indices, padded.weights,
        block=int(os.environ.get("ABLOCK", "512")),
        r_step=int(os.environ.get("R_STEP", "16")),
        w_chunks=int(os.environ.get("WCHUNKS", "64")),
        gm=os.environ.get("GM", "1") != "0",
    )
    print(f"plan[aligned]: {time.perf_counter()-t0:.2f}s",
          file=sys.stderr)
    if plan is None:
        print("PLAN REJECTED")
        return
    nnz = int((padded.indices >= 0).sum())
    runs = int((np.diff(plan.winc0) != 0).sum()) + 1
    print(
        f"plan: nsteps={plan.nsteps} block={plan.block} "
        f"r_step={plan.r_step} w_chunks={plan.w_chunks} gm={plan.gm} "
        f"runs={runs} nnz={nnz} "
        f"lane_eff={nnz/(plan.nsteps*plan.r_step*128*4):.2f}",
        file=sys.stderr,
    )
    srcE = stage_source_aligned(source, plan)
    n_blocks = len(plan.rwsum) // plan.block
    rb = int(os.environ.get("RB", "4"))
    span = int(os.environ.get("SPAN", "0"))

    @partial(jax.jit, static_argnames=(
        "method", "block", "r_step", "w_chunks", "n_blocks", "rb",
        "gm", "span", "n_reps"))
    def aligned_reps(srcE, blkid, wmeta, winc0, meta, itab, wtab,
                     rwsum, method, block, r_step, w_chunks, n_blocks,
                     rb, gm, span, n_reps):
        def body(i, acc):
            out = gather_aligned_apply(
                srcE + i.astype(srcE.dtype) * 1e-12,
                blkid, wmeta, winc0, meta, itab, wtab, rwsum,
                method=method, has_nan=False,
                block=block, r_step=r_step, w_chunks=w_chunks,
                n_blocks=n_blocks, rb=rb, gm=gm, span_steps=span,
            )
            return acc + jnp.nansum(out)

        import jax.lax as lax
        return lax.fori_loop(0, n_reps, body, jnp.float32(0.0))

    reps = int(os.environ.get("REPS", "10"))
    dargs = (
        jnp.asarray(srcE), jnp.asarray(plan.blkid),
        jnp.asarray(plan.wmeta), jnp.asarray(plan.winc0),
        jnp.asarray(plan.meta), jnp.asarray(plan.itab),
        jnp.asarray(plan.wtab), jnp.asarray(plan.rwsum),
    )
    statics = (METHOD, plan.block, plan.r_step, plan.w_chunks,
               n_blocks, rb, plan.gm, span)
    t0 = time.perf_counter()
    cs = float(aligned_reps(*dargs, *statics, reps))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    cs = float(aligned_reps(*dargs, *statics, reps))
    dt = (time.perf_counter() - t0) / reps
    gbps = true_bytes / dt / 1e9
    print(
        f"aligned kernel [{METHOD} E={N_EXTRA} block={plan.block} "
        f"r_step={plan.r_step} w={plan.w_chunks} rb={rb} "
        f"gm={plan.gm} span={span}]: "
        f"{dt*1e3:.2f} ms/pass  {gbps:.1f} GB/s true  "
        f"{100*gbps/819:.1f}% SoL  checksum={cs:.3f}"
    )
    check_against_xla(source, padded, plan, grid)


def run_select(padded, source, true_bytes):
    """Time the selection kernel (mode/median/p*) and cross-check vs
    the XLA reduce-registry oracle."""
    from xugrid_tpu.regrid.select_apply import (
        gather_select_apply,
        plan_gather_select,
    )
    from xugrid_tpu.regrid.gather_apply import CHUNK, pad_sublanes

    t0 = time.perf_counter()
    plan = plan_gather_select(padded.indices, padded.weights)
    print(f"plan[select]: {time.perf_counter()-t0:.2f}s", file=sys.stderr)
    if plan is None:
        print("PLAN REJECTED")
        return
    nsteps = len(plan.blkid)
    nnz = int((padded.indices >= 0).sum())
    print(
        f"plan: nsteps={nsteps} dmax={plan.dmax} pair={plan.pair} "
        f"span={plan.span} nnz={nnz} "
        f"lane_eff={nnz/(nsteps*12*128):.2f}",
        file=sys.stderr,
    )

    n_extra, m = source.shape
    e_sub = pad_sublanes(n_extra)
    c_needed = int(plan.bases.max()) + 1 if len(plan.bases) else 1
    m_pad = max(-(-m // CHUNK), c_needed) * CHUNK
    srcE = np.zeros((e_sub, m_pad), np.float32)
    srcE[:n_extra, :m] = source

    n_blocks = len(plan.rwsum) // plan.block

    @partial(jax.jit, static_argnames=("method", "dmax", "pair", "span",
                                       "n_blocks", "n_reps"))
    def select_reps(srcE, blkid, bases, ptab, rwsum,
                    method, dmax, pair, span, n_blocks, n_reps):
        def body(i, acc):
            out = gather_select_apply(
                srcE + i.astype(srcE.dtype) * 1e-12,
                blkid, bases, ptab, rwsum,
                method=method, has_nan=False,
                dmax=dmax, pair=pair, span=span, n_blocks=n_blocks,
            )
            return acc + jnp.nansum(out)

        import jax.lax as lax
        return lax.fori_loop(0, n_reps, body, jnp.float32(0.0))

    reps = int(os.environ.get("REPS", "10"))
    gate = plan.rwsum if METHOD == "mode" else plan.rwraw
    dargs = (
        jnp.asarray(srcE), jnp.asarray(plan.blkid),
        jnp.asarray(plan.bases), jnp.asarray(plan.ptab),
        jnp.asarray(gate),
    )
    t0 = time.perf_counter()
    cs = float(select_reps(*dargs, METHOD, plan.dmax, plan.pair,
                           plan.span, n_blocks, reps))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    cs = float(select_reps(*dargs, METHOD, plan.dmax, plan.pair,
                           plan.span, n_blocks, reps))
    dt = (time.perf_counter() - t0) / reps
    gbps = true_bytes / dt / 1e9
    print(
        f"select kernel [{METHOD} E={N_EXTRA} dmax={plan.dmax}]: "
        f"{dt*1e3:.2f} ms/pass  {gbps:.1f} GB/s true  "
        f"{100*gbps/819:.1f}% SoL  checksum={cs:.3f}"
    )

    # correctness: first 4096 targets vs the reduce-registry oracle
    from xugrid_tpu.regrid import reduce as red
    from xugrid_tpu.regrid.apply import _apply_windowed_T, _pad_minor
    from xugrid_tpu.regrid.select_apply import apply_windowed_select

    got = apply_windowed_select(
        source, padded.indices, padded.weights, METHOD,
        has_nan=False, plan=plan,
    )
    fn = {"mode": red.mode, "median": red.median}.get(METHOD)
    if fn is None:
        fn = red.create_percentile_method(float(METHOD[1:]))
    E = _pad_minor(N_EXTRA)
    sourceT = np.zeros((m, E), np.float32)
    sourceT[:, :N_EXTRA] = source.T
    want = np.asarray(
        _apply_windowed_T(
            jnp.asarray(sourceT), jnp.asarray(padded.indices[:4096]),
            jnp.asarray(padded.weights[:4096]), fn,
        )
    )[:, :N_EXTRA]
    err = np.nanmax(
        np.abs(got[:4096] - want) / np.maximum(np.abs(want), 1e-3)
    )
    print(f"max rel err vs XLA path (first 4096 targets): {err:.2e}")


def check_against_xla(source, padded, plan, grid):
    # correctness spot-check vs XLA path on device
    from xugrid_tpu.regrid.gather_apply import apply_windowed_gather
    got = apply_windowed_gather(
        source[:, :], padded.indices, padded.weights, METHOD,
        has_nan=False, plan=plan,
    )
    from xugrid_tpu.regrid import reduce as red
    from xugrid_tpu.regrid.apply import _apply_windowed_T, _pad_minor
    E = _pad_minor(N_EXTRA)
    sourceT = np.zeros((grid.n_face, E), np.float32)
    sourceT[:, :N_EXTRA] = source.T
    fn = {"mean": red.mean, "min": red.minimum, "max": red.maximum,
          "sum": red.sum}[METHOD]
    want = np.asarray(
        _apply_windowed_T(
            jnp.asarray(sourceT), jnp.asarray(padded.indices[:4096]),
            jnp.asarray(padded.weights[:4096]), fn,
        )
    )[:, :N_EXTRA]
    err = np.nanmax(
        np.abs(got[:4096] - want)
        / np.maximum(np.abs(want), 1e-3)
    )
    print(f"max rel err vs XLA path (first 4096 targets): {err:.2e}")


if __name__ == "__main__":
    main()
