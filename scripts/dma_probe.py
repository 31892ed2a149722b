"""Isolate the aligned engine's cost components on the real chip.

Variants (PROBE=):
  dma      — the double-buffered window DMA schedule alone (per-step
             work is one scalar touch of the slab): measures the
             sustained HBM rate of the aligned window stream.
  plan     — DMA + full plan streams (itab/wtab blocks) touched but no
             gather/accumulate: adds the plan-stream cost.
  full     — the real aligned kernel (baseline, same as ENGINE=aligned).

Run on the chip:  PROBE=dma python scripts/dma_probe.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache"),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import quad_mesh  # noqa: E402

N_EXTRA = int(os.environ.get("N_EXTRA", "20"))
SIDE = int(os.environ.get("SIDE", "1000"))
TSIDE = int(os.environ.get("TSIDE", "512"))
PROBE = os.environ.get("PROBE", "dma")


def build_plan():
    import xugrid_tpu as xu
    from xugrid_tpu.core.sparse import MatrixCSR, PaddedCSR
    from xugrid_tpu.regrid.aligned_apply import (
        plan_gather_aligned,
        stage_source_aligned,
    )

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
    ti, si, areas = grid.celltree.intersect_faces(
        target.node_coordinates, target.face_node_connectivity, -1
    )
    csr = MatrixCSR.from_triplet(ti, si, areas, n=target.n_face, m=grid.n_face)
    padded = PaddedCSR.from_csr(csr, dtype=np.float32)
    plan = plan_gather_aligned(padded.indices, padded.weights)
    source = rng.normal(size=(N_EXTRA, grid.n_face)).astype(np.float32)
    srcE = stage_source_aligned(source, plan)
    true_bytes = (
        csr.nnz * 8 + grid.n_face * N_EXTRA * 4 + target.n_face * N_EXTRA * 4
    )
    return plan, srcE, true_bytes


def make_probe_kernel(e_sub, r_step, w_chunks, with_plan):
    def kernel(
        blkid_ref, wmeta_ref, winc0_ref, meta_ref,
        itab_ref, wtab_ref, rwsum_ref,
        src_hbm, out_ref,
        slabs, acc, sem0, sem1,
    ):
        i = pl.program_id(0)
        wm = wmeta_ref[i]
        slot = wm & 1
        wchg = ((wm >> 1) & 1) == 1
        nxt_c0 = (wm >> 2) - 1

        @pl.when(i == 0)
        def _boot():
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(winc0_ref[0], w_chunks)],
                slabs.at[pl.ds(0, w_chunks)],
                sem0,
            ).start()

        @pl.when(jnp.logical_and(wchg, slot == 0))
        def _wait0():
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(0, w_chunks)],
                slabs.at[pl.ds(0, w_chunks)],
                sem0,
            ).wait()

        @pl.when(jnp.logical_and(wchg, slot == 1))
        def _wait1():
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(0, w_chunks)],
                slabs.at[pl.ds(w_chunks, w_chunks)],
                sem1,
            ).wait()

        @pl.when(jnp.logical_and(wchg, jnp.logical_and(nxt_c0 >= 0, slot == 0)))
        def _pre1():
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(nxt_c0, w_chunks)],
                slabs.at[pl.ds(w_chunks, w_chunks)],
                sem1,
            ).start()

        @pl.when(jnp.logical_and(wchg, jnp.logical_and(nxt_c0 >= 0, slot == 1)))
        def _pre0():
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(nxt_c0, w_chunks)],
                slabs.at[pl.ds(0, w_chunks)],
                sem0,
            ).start()

        touch = slabs[pl.ds(slot * w_chunks, 1)].reshape(e_sub, 128)
        if with_plan:
            it = itab_ref[...].astype(jnp.float32)  # (r_step, 128)
            wt = wtab_ref[...]                      # (r_step*4, 128)
            touch = touch + jnp.sum(it) + jnp.sum(wt)
        acc[...] = acc[...] + touch[:, :128]

        @pl.when(i == pl.num_programs(0) - 1)
        def _out():
            out_ref[...] = acc[...]

    return kernel


@partial(jax.jit, static_argnames=("e_sub", "r_step", "w_chunks",
                                   "with_plan", "n_reps"))
def probe_reps(srcE, blkid, wmeta, winc0, meta, itab, wtab, rwsum,
               e_sub, r_step, w_chunks, with_plan, n_reps):
    m_pad = srcE.shape[1]
    ctot = m_pad // 128
    chunks = srcE.reshape(e_sub, ctot, 128).transpose(1, 0, 2)
    nsteps = blkid.shape[0]

    kernel = make_probe_kernel(e_sub, r_step, w_chunks, with_plan)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((r_step, 128), lambda i, *_: (i, 0)),
            pl.BlockSpec((r_step * 4, 128), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, 128), lambda i, *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((e_sub, 128), lambda i, *_: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2 * w_chunks, e_sub, 128), jnp.float32),
            pltpu.VMEM((e_sub, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_sub, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )

    def body(i, acc):
        out = call(blkid, wmeta, winc0, meta, itab, wtab,
                   rwsum.reshape(1, -1)[:, :128], chunks)
        return acc + jnp.sum(out) + i.astype(jnp.float32) * 0.0

    return jax.lax.fori_loop(0, n_reps, body, jnp.float32(0.0))


def main():
    plan, srcE, true_bytes = build_plan()
    e_sub = srcE.shape[0]
    nsteps = plan.nsteps
    runs = int((np.diff(plan.winc0) != 0).sum()) + 1
    dma_bytes = runs * plan.w_chunks * e_sub * 128 * 4
    plan_bytes = (
        plan.itab.nbytes + plan.wtab.nbytes + plan.meta.nbytes
    )
    print(
        f"nsteps={nsteps} runs={runs} w={plan.w_chunks} "
        f"dma={dma_bytes/1e6:.0f}MB plan={plan_bytes/1e6:.0f}MB "
        f"true={true_bytes/1e6:.0f}MB",
        file=sys.stderr,
    )
    with_plan = PROBE == "plan"
    dargs = (
        jnp.asarray(srcE), jnp.asarray(plan.blkid),
        jnp.asarray(plan.wmeta), jnp.asarray(plan.winc0),
        jnp.asarray(plan.meta), jnp.asarray(plan.itab),
        jnp.asarray(plan.wtab), jnp.asarray(plan.rwsum),
    )
    statics = (e_sub, plan.r_step, plan.w_chunks, with_plan)
    reps = 20
    t0 = time.perf_counter()
    cs = float(probe_reps(*dargs, *statics, reps))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    cs = float(probe_reps(*dargs, *statics, reps))
    dt = (time.perf_counter() - t0) / reps
    moved = dma_bytes + (plan_bytes if with_plan else 0)
    print(
        f"probe[{PROBE}] {dt*1e3:.2f} ms/pass — schedule moves "
        f"{moved/1e6:.0f} MB -> {moved/dt/1e9:.0f} GB/s sustained "
        f"(checksum {cs:.1f})"
    )


if __name__ == "__main__":
    main()
