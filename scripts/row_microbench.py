"""Microbenchmark the candidate per-payload-row op sequences for the
gather apply kernels, on the real TPU.

Each "row" is one 128-lane payload resolving <=127 window entries for
one 128-target group.  Candidate inner loops per row:

  gather   take_along_axis(table (E,128), idx (1,128) broadcast)
  build    one-hot P_T[t,l] = (seg[l] == t)  (128,128) from the seg row
  matmul   (E,128) @ (128,128)^T contraction over lanes (MXU)
  scan     segmented 2-step Hillis-Steele + 4-group fused-tail gather
  tabread  dynamic (1, 4, 128) slice from a resident ptab block
  slabread dynamic (E, 128) sublane-block slice from a resident slab

Variants time stacked subsets so per-piece costs fall out by
subtraction.  Run: python scripts/row_microbench.py  (on the TPU);
E=128 ROWS=4096 ITERS=... to vary.
"""

from __future__ import annotations

import os
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache"),
)

E = int(os.environ.get("E", "128"))
ROWS = int(os.environ.get("ROWS", "256"))   # resident distinct rows
ITERS = int(os.environ.get("ITERS", "20000"))


def make_kernel(variant: str, iters: int, e: int, rows: int):
    def kernel(tab_ref, slab_ref, o_ref, acc):
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        acc[...] = jnp.zeros((e, 128), jnp.float32)
        table0 = slab_ref[pl.ds(0, 1)].reshape(e, 128)

        def body(i, _):
            r = jax.lax.rem(i, rows)
            row = tab_ref[pl.ds(r, 1)].reshape(4, 128)  # tabread
            idx = row[0:1, :]
            seg = row[2:3, :]
            if variant == "tabread":
                acc[...] += idx.astype(jnp.float32)
                return 0
            if "slabread" in variant:
                table = slab_ref[pl.ds(jax.lax.rem(i, 8), 1)].reshape(
                    e, 128
                )
            else:
                table = table0
            val = jnp.take_along_axis(
                table, jnp.broadcast_to(idx, (e, 128)), axis=1
            )
            if variant in ("gather", "slabread+gather"):
                acc[...] += val
                return 0
            if variant == "gather+build":
                pt = (jnp.broadcast_to(seg, (128, 128)) == sub_iota)
                acc[...] += val + pt.astype(jnp.float32)[:e]
                return 0
            if variant == "gather+build+matmul":
                pt = (
                    jnp.broadcast_to(seg, (128, 128)) == sub_iota
                ).astype(jnp.float32)
                res = jax.lax.dot_general(
                    val, pt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc[...] += res
                return 0
            if variant == "gather+scan2+tail":
                x = val
                for j in range(2):
                    s = 1 << j
                    segr = pltpu.roll(seg, s, axis=1)
                    m = jnp.broadcast_to(
                        jnp.logical_and(lanes >= s, segr == seg),
                        (e, 128),
                    )
                    xr = pltpu.roll(x, s, axis=1)
                    x = x + jnp.where(m, xr, 0.0)
                ends = jnp.broadcast_to(row[3:4, :], (e, 128))
                res = jnp.take_along_axis(x, ends, axis=1)
                acc[...] += res
                return 0
            raise ValueError(variant)

        jax.lax.fori_loop(0, iters, body, 0)
        o_ref[...] = acc[...]

    return kernel


@partial(jax.jit, static_argnames=("variant", "iters", "e", "rows"))
def run(tab, slab, variant, iters, e, rows):
    return pl.pallas_call(
        make_kernel(variant, iters, e, rows),
        out_shape=jax.ShapeDtypeStruct((e, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((e, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(tab, slab)


def main():
    rng = np.random.default_rng(0)
    tab = np.zeros((ROWS, 4, 128), np.int32)
    tab[:, 0] = rng.integers(0, 128, size=(ROWS, 128))
    tab[:, 2] = np.sort(rng.integers(0, 128, size=(ROWS, 128)), axis=1)
    tab[:, 3] = rng.integers(0, 128, size=(ROWS, 128))
    slab = rng.normal(size=(8, E, 128)).astype(np.float32)
    tab_d = jnp.asarray(tab)
    slab_d = jnp.asarray(slab)

    for variant in (
        "tabread",
        "gather",
        "slabread+gather",
        "gather+build",
        "gather+build+matmul",
        "gather+scan2+tail",
    ):
        _ = np.asarray(run(tab_d, slab_d, variant, ITERS, E, ROWS))
        t0 = time.perf_counter()
        _ = np.asarray(run(tab_d, slab_d, variant, ITERS, E, ROWS))
        dt = time.perf_counter() - t0
        print(f"{variant:22s} E={E}: {dt / ITERS * 1e9:8.1f} ns/row")


if __name__ == "__main__":
    main()
