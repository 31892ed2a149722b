"""Microbenchmark tpu.dynamic_gather (jnp.take_along_axis) in Pallas.

Questions this answers, on the real TPU over the tunnel:
  1. Does take_along_axis compile inside a Pallas TPU kernel (axis=0/1)?
  2. How does per-op cost scale with the gathered-dimension extent M?
     (vreg-local shuffle vs select-tree: cost flat in M vs linear in M)
  3. Throughput in gathers/s for the shapes the regrid apply kernel needs.

Run: python scripts/gather_microbench.py            (on the TPU)
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


def gather_kernel(axis: int, reps: int):
    """Kernel: repeated same-shape take_along_axis, accumulate to defeat CSE."""

    def kernel(x_ref, idx_ref, o_ref):
        x = x_ref[...]
        idx = idx_ref[...]
        acc = jnp.zeros_like(x)

        def body(i, acc):
            g = jnp.take_along_axis(x, idx + i, axis=axis)
            return acc + g

        acc = jax.lax.fori_loop(0, reps, body, acc)
        o_ref[...] = acc

    return kernel


@partial(jax.jit, static_argnums=(2, 3))
def run(x, idx, axis, reps):
    return pl.pallas_call(
        gather_kernel(axis, reps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, idx)


def bench(shape, axis, reps=1000):
    rng = np.random.default_rng(0)
    M = shape[axis]
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, M, size=shape).astype(np.int32))
    try:
        out = run(x, idx, axis, reps)
        out.block_until_ready()
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"shape={shape} axis={axis}: FAIL {msg}")
        return
    t0 = time.perf_counter()
    out = run(x, idx, axis, reps)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    per_op_us = dt / reps * 1e6
    elems = shape[0] * shape[1]
    print(
        f"shape={shape} axis={axis}: {per_op_us:8.2f} us/op  "
        f"({elems / (dt / reps) / 1e9:7.2f} Gelem/s)"
    )


def main():
    print("device:", jax.devices()[0])
    # correctness probe (tiny): lane gather
    x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, size=(8, 256)).astype(np.int32)
    )
    try:
        got = run(x, idx, 1, 1)
        want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
        print("axis=1 correctness (M=256):", np.array_equal(np.asarray(got), want))
    except Exception as e:  # noqa: BLE001
        print("axis=1 M=256 probe failed:", str(e).split("\n")[0][:160])

    x2 = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
    idx2 = jnp.asarray(
        np.random.default_rng(2).integers(0, 256, size=(256, 128)).astype(np.int32)
    )
    try:
        got = run(x2, idx2, 0, 1)
        want = np.take_along_axis(np.asarray(x2), np.asarray(idx2), axis=0)
        print("axis=0 correctness (M=256):", np.array_equal(np.asarray(got), want))
    except Exception as e:  # noqa: BLE001
        print("axis=0 M=256 probe failed:", str(e).split("\n")[0][:160])

    # lane-gather (axis=1) scaling in M = lane extent
    for lanes in (128, 256, 512, 1024, 3072):
        bench((24, lanes), axis=1)
    # sublane-gather (axis=0) scaling in M = sublane extent
    for subs in (8, 32, 128, 512, 3072):
        bench((subs, 128), axis=0)
    # the shapes the regrid kernel would actually use
    bench((24, 128), axis=1, reps=3000)   # chunked slab gather
    bench((32, 128), axis=1, reps=3000)
    bench((8, 128), axis=1, reps=3000)


if __name__ == "__main__":
    main()
