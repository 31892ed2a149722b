"""Mosaic per-op cost microbench for the dense gather-engine design.

Times the primitive ops the dense engine would lean on, inside one
Pallas kernel with an in-kernel fori_loop (so per-launch and tunnel
overhead amortize away):

  OP=dynread    per-row dynamic VMEM read (1,E,128) + stack write
  OP=ctgread    contiguous (R,E,128) read + reshape (baseline)
  OP=gather_b   batched take_along_axis on (R*E,128), bcast idx
  OP=gather_r   R per-row take_along_axis on (E,128)
  OP=rmw        dynamic-index accumulator read-modify-write (1,E,128)
  OP=scan2      2-step masked Hillis-Steele on (R*E,128)
  OP=tailg      per-row 2x ends-gather (E,128) + 2x dynamic rmw
  OP=noop       loop overhead floor

Each iteration processes R=16 rows of (E=24,128) f32 — the dense
engine's step shape.  Reports ns/iter and ns/row.
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

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

R = int(os.environ.get("R", "16"))
E = int(os.environ.get("E", "24"))
W = int(os.environ.get("W", "32"))
ITERS = int(os.environ.get("ITERS", "20000"))
OP = os.environ.get("OP", "noop")


def make_kernel(op):
    def kernel(slab_ref, tab_ref, out_ref, stack, acc):
        def body(i, carry):
            base = jax.lax.rem(i, W - R)
            tab = tab_ref[...]                      # (R, 4, 128)
            if op == "noop":
                pass
            elif op == "dynread":
                for r in range(R):
                    cid = base + r  # traced, distinct per row
                    stack[pl.ds(r, 1)] = slab_ref[pl.ds(cid, 1)]
            elif op == "ctgread":
                stack[...] = slab_ref[pl.ds(base, R)]
            elif op == "gather_b":
                table = stack[...].reshape(R * E, 128)
                idx = jnp.broadcast_to(
                    tab[:, 0, None, :], (R, E, 128)
                ).reshape(R * E, 128)
                val = jnp.take_along_axis(table, idx, axis=1)
                acc[...] = val[: E]
            elif op == "gather_r":
                for r in range(R):
                    row = stack[pl.ds(r, 1)].reshape(E, 128)
                    idx = jnp.broadcast_to(tab[r, 0:1, :], (E, 128))
                    val = jnp.take_along_axis(row, idx, axis=1)
                    acc[...] = val
            elif op == "rmw":
                upd = stack[pl.ds(0, 1)].reshape(E, 128)
                for r in range(R):
                    g = jax.lax.rem(base + r, 4)
                    cur = acc[pl.ds(g, 1)].reshape(E, 128)
                    acc[pl.ds(g, 1)] = (cur + upd).reshape(1, E, 128)
            elif op == "scan2":
                x = stack[...].reshape(R * E, 128)
                seg = tab[:, 1, :]
                lanes = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 128), 1
                )
                for j in range(2):
                    s = 1 << j
                    seg_r = pltpu.roll(seg, s, axis=1)
                    m = jnp.broadcast_to(
                        jnp.logical_and(lanes >= s, seg_r == seg)[
                            :, None, :
                        ],
                        (R, E, 128),
                    ).reshape(R * E, 128)
                    xr = pltpu.roll(x, s, axis=1)
                    x = x + jnp.where(m, xr, 0.0)
                acc[...] = x[: E]
            elif op == "tailg":
                for r in range(R):
                    x = stack[pl.ds(r, 1)].reshape(E, 128)
                    for slot in (2, 3):
                        ends = jnp.broadcast_to(
                            tab[r, slot:slot + 1, :], (E, 128)
                        )
                        routed = jnp.take_along_axis(x, ends, axis=1)
                        g = jax.lax.rem(base + r + slot, 4)
                        cur = acc[pl.ds(g, 1)].reshape(E, 128)
                        acc[pl.ds(g, 1)] = (cur + routed).reshape(
                            1, E, 128
                        )
            return carry

        jax.lax.fori_loop(0, ITERS, body, 0)
        out_ref[...] = acc[pl.ds(0, 1)].reshape(E, 128)

    return kernel


@partial(jax.jit, static_argnames=("op",))
def run(slab, tab, op):
    return pl.pallas_call(
        make_kernel(op),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((E, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R, E, 128), jnp.float32),
            pltpu.VMEM((4, E, 128), jnp.float32),
        ],
    )(slab, tab)


def main():
    rng = np.random.default_rng(0)
    slab = rng.normal(size=(W, E, 128)).astype(np.float32)
    tab = rng.integers(0, 128, size=(R, 4, 128)).astype(np.int32)
    tab[:, 1, :] = np.sort(tab[:, 1, :], axis=1)  # seg monotone
    slab_d, tab_d = jnp.asarray(slab), jnp.asarray(tab)

    ops = (
        OP.split(",")
        if OP != "all"
        else [
            "noop", "ctgread", "dynread", "gather_b", "gather_r",
            "rmw", "scan2", "tailg",
        ]
    )
    base_ns = None
    for op in ops:
        t0 = time.perf_counter()
        run(slab_d, tab_d, op).block_until_ready()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(slab_d, tab_d, op).block_until_ready()
        dt = time.perf_counter() - t0
        ns_iter = dt / ITERS * 1e9
        if op == "noop":
            base_ns = ns_iter
        extra = ns_iter - (base_ns or 0.0)
        print(
            f"{op:9s} {ns_iter:9.1f} ns/iter  "
            f"(+{extra:8.1f} over noop, {extra / R:6.1f} ns/row)  "
            f"[compile {compile_s:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
