"""Per-op cost microbench for the row-matmul (mxu) gather engine.

Times each primitive the engine's grid step leans on, inside one
Pallas kernel with an in-kernel fori_loop (per-launch and tunnel
overhead amortize away).  Dynamic-slice reads keyed on the loop index
plus accumulator writes keep XLA/Mosaic from hoisting work out.

  OP=noop      loop floor
  OP=split3    3-term bf16 split of the (W,E,128) slab
  OP=mm1sel    1x rank-3 select dot_general (R,W)@(W,E,128)
  OP=mm3sel    split3 + 3x rank-3 select dot_general
  OP=mm3sel2d  split3 + 3x 2-D select dot (R,W)@(W,E*128)
  OP=retile    (R,E*128) -> (R*E,128) in-kernel reshape
  OP=qgather   fused take_along_axis on (R*Q*E,128)
  OP=mm3scat   split3 + 3x rank-3 scatter dot (G,R)@(R,2E,128) + acc
  OP=rmwR      R dynamic-index accumulator RMWs (the aligned floor)

Defaults match the engine's 1M-config shape: R=32 E=8 W=32 G=16 Q=4.
"""

from __future__ import annotations

import os
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

R = int(os.environ.get("R", "32"))
E = int(os.environ.get("E", "8"))
W = int(os.environ.get("W", "32"))
G = int(os.environ.get("G", "16"))
Q = 4
ITERS = int(os.environ.get("ITERS", "20000"))
OP = os.environ.get("OP", "all")
DIMS = (((1,), (0,)), ((), ()))


def _split3(x):
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def make_kernel(op):
    def kernel(slab_ref, slab2_ref, oh_ref, ohg_ref, idx_ref,
               out_ref, acc, acc2):
        def body(i, carry):
            base = jax.lax.rem(i, 8)
            if op == "noop":
                pass
            elif op == "split3":
                x = slab_ref[pl.ds(base, W)]
                h, m, lo = _split3(x)
                acc[...] = acc[...] + (
                    h.astype(jnp.float32)[:R]
                    + m.astype(jnp.float32)[:R]
                    + lo.astype(jnp.float32)[:R]
                )
            elif op == "mm1sel":
                x = slab_ref[pl.ds(base, W)].astype(jnp.bfloat16)
                sel = jax.lax.dot_general(
                    oh_ref[...], x, DIMS,
                    preferred_element_type=jnp.float32,
                )
                acc[...] = acc[...] + sel
            elif op == "mmHsel":
                # f32 HIGHEST-precision rank-3 select (6 passes).
                x = slab_ref[pl.ds(base, W)]
                sel = jax.lax.dot_general(
                    oh_ref[...].astype(jnp.float32), x, DIMS,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                acc[...] = acc[...] + sel
            elif op == "mmHsel2d":
                x = slab2_ref[pl.ds(base, W)]
                sel = jax.lax.dot_general(
                    oh_ref[...].astype(jnp.float32), x, DIMS,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                acc2[...] = acc2[...] + sel.reshape(1, R, E * 128)
            elif op == "mm3sel":
                x = slab_ref[pl.ds(base, W)]
                sel = jnp.zeros((R, E, 128), jnp.float32)
                for part in _split3(x):
                    sel = sel + jax.lax.dot_general(
                        oh_ref[...], part, DIMS,
                        preferred_element_type=jnp.float32,
                    )
                acc[...] = acc[...] + sel
            elif op == "mm3sel2d":
                x = slab2_ref[pl.ds(base, W)]
                sel = jnp.zeros((R, E * 128), jnp.float32)
                for part in _split3(x):
                    sel = sel + jax.lax.dot_general(
                        oh_ref[...], part, DIMS,
                        preferred_element_type=jnp.float32,
                    )
                acc2[...] = acc2[...] + sel.reshape(1, R, E * 128)
            elif op == "ohbuild":
                # in-kernel one-hot build: lane->sublane reshape of a
                # (1,128) cid vector + iota compare (the engine's
                # current formulation).
                cid = (idx_ref[pl.ds(base, 1)] + 0).reshape(128, 1)
                iw = jax.lax.broadcasted_iota(jnp.int32, (128, W), 1)
                ohf = (cid == iw).astype(jnp.float32)[:R]
                acc[pl.ds(0, 1)] = acc[pl.ds(0, 1)] + jnp.sum(
                    ohf
                ).reshape(1, 1, 1)
            elif op == "ohmmH":
                # one-hot build + HIGHEST select matmul (full current
                # select stage minus DMA).
                cid = (idx_ref[pl.ds(base, 1)] + 0).reshape(128, 1)
                iw = jax.lax.broadcasted_iota(jnp.int32, (128, W), 1)
                ohf = (cid == iw).astype(jnp.float32)[:R]
                x = slab_ref[pl.ds(0, W)]
                sel = jax.lax.dot_general(
                    ohf, x, DIMS,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                acc[...] = acc[...] + sel
            elif op == "retile":
                x = slab2_ref[pl.ds(base, R)]      # (R, E*128)
                acc[...] = acc[...] + x.reshape(R, E, 128)
            elif op == "qgather":
                x = slab_ref[pl.ds(base, R)]       # (R, E, 128)
                rowsQ = jnp.broadcast_to(
                    x[:, None], (R, Q, E, 128)
                ).reshape(R * Q * E, 128)
                idx = jnp.broadcast_to(
                    idx_ref[...][:, None, :], (R * Q, E, 128)
                ).reshape(R * Q * E, 128)
                val = jnp.take_along_axis(rowsQ, idx, axis=1)
                acc[...] = acc[...] + val.reshape(R, Q * E, 128)[:, :E]
            elif op == "mm3scat":
                x = slab_ref[pl.ds(base, R)]
                p = jnp.concatenate([x, x], axis=1)  # (R, 2E, 128)
                scat = jnp.zeros((G, 2 * E, 128), jnp.float32)
                for part in _split3(p):
                    scat = scat + jax.lax.dot_general(
                        ohg_ref[...], part, DIMS,
                        preferred_element_type=jnp.float32,
                    )
                acc[pl.ds(0, G)] = acc[pl.ds(0, G)] + scat[:, :E]
            elif op == "rmwR":
                upd = slab_ref[pl.ds(base, 1)].reshape(E, 128)
                for r in range(R):
                    g = jax.lax.rem(base + r, G)
                    cur = acc[pl.ds(g, 1)].reshape(E, 128)
                    acc[pl.ds(g, 1)] = (cur + upd).reshape(1, E, 128)
            return carry

        jax.lax.fori_loop(0, ITERS, body, 0)
        out_ref[...] = acc[pl.ds(0, 1)].reshape(E, 128)

    return kernel


@partial(jax.jit, static_argnames=("op",))
def run(slab, slab2, oh, ohg, idx, op):
    return pl.pallas_call(
        make_kernel(op),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_shape=jax.ShapeDtypeStruct((E, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((max(R, G, W), E, 128), jnp.float32),
            pltpu.VMEM((1, R, E * 128), jnp.float32),
        ],
    )(slab, slab2, oh, ohg, idx)


def main():
    rng = np.random.default_rng(0)
    slab = rng.normal(size=(W + 8, E, 128)).astype(np.float32)
    slab2 = rng.normal(size=(W + 8, E * 128)).astype(np.float32)
    oh = np.zeros((R, W), np.float32)
    oh[np.arange(R), rng.integers(0, W, R)] = 1.0
    ohg = np.zeros((G, R), np.float32)
    ohg[rng.integers(0, G, R), np.arange(R)] = 1.0
    idx = rng.integers(0, 128, size=(R * Q, 128)).astype(np.int32)
    args = (
        jnp.asarray(slab), jnp.asarray(slab2),
        jnp.asarray(oh, jnp.bfloat16), jnp.asarray(ohg, jnp.bfloat16),
        jnp.asarray(idx),
    )

    ops = (
        OP.split(",")
        if OP != "all"
        else [
            "noop", "split3", "mm1sel", "mm3sel", "mm3sel2d",
            "retile", "qgather", "mm3scat", "rmwR",
        ]
    )
    base_ns = None
    for op in ops:
        try:
            t0 = time.perf_counter()
            float(jnp.sum(run(*args, op)))   # scalar fetch: axon's
            compile_s = time.perf_counter() - t0  # block_until_ready
            t0 = time.perf_counter()              # does not force exec
            float(jnp.sum(run(*args, op)))
            dt = time.perf_counter() - t0
        except Exception as exc:
            print(f"{op:9s} ERROR {exc!r}"[:240], flush=True)
            continue
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
