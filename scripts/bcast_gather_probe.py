"""Probe Mosaic broadcast semantics the planned aligned-chain rewrite
depends on (round 5, VERDICT #1):

1. take_along_axis with BROADCAST indices: idx (K, 1, 128) over table
   (K, e, 128) on axis=2 — one gather resolving all e sublanes of each
   band from one 128-lane index row (kills the idxQ expand copy).
2. Double broadcast: table (rb, 1, e, 128) with idx (rb, qp, 1, 128)
   on axis=3 (kills BOTH the qp-fold rowQ slab replication and the
   idxQ expand).
3. Broadcast multiply: (rb*qp, e, 128) * (rb*qp, 1, 128) fused (kills
   the wQ expand copy).

Each probe checks numerics against numpy AND slope-times the op inside
a fori_loop against the materialized-expand baseline at bench-like
widths (rb=8, qp=4, e=24).  Run on the real TPU.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache"),
)

RB, QP, E = 8, 4, 24


def run(name, kernel, args, out_shape, want):
    try:
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32)
        )(*args)
        out = np.asarray(out)
        ok = np.allclose(out, want, atol=1e-6)
        print(f"{name}: {'PASS' if ok else 'FAIL (numerics)'}")
        return ok
    except Exception as exc:
        print(f"{name}: FAIL (compile) {type(exc).__name__}: {exc}"[:300])
        return False


def main():
    rng = np.random.default_rng(0)
    # Table: RB slabs of (E, 128); idx: per (row j, sub-slot q) one
    # 128-lane index row.
    tab = rng.normal(size=(RB, E, 128)).astype(np.float32)
    idx = rng.integers(0, 128, size=(RB, QP, 128)).astype(np.int32)
    w = rng.normal(size=(RB * QP, 128)).astype(np.float32)

    want_val = np.take_along_axis(
        tab[:, None, :, :],                      # (RB, 1, E, 128)
        np.broadcast_to(idx[:, :, None, :], (RB, QP, 1, 128)),
        axis=3,
    )                                            # (RB, QP, E, 128)

    # --- probe 1: idx broadcast over sublanes (3D) -------------------
    def k1(t_ref, i_ref, o_ref):
        val = jnp.take_along_axis(
            t_ref[...],                          # (RB*QP, E, 128)
            i_ref[...].reshape(RB * QP, 1, 128),
            axis=2,
        )
        o_ref[...] = val.reshape(RB * QP * E, 128)

    tab_rep = np.broadcast_to(
        tab[:, None], (RB, QP, E, 128)
    ).reshape(RB * QP, E, 128).copy()
    run(
        "p1 idx-broadcast 3D gather",
        k1, (tab_rep, idx.reshape(RB * QP, 128)),
        (RB * QP * E, 128), want_val.reshape(RB * QP * E, 128),
    )

    # --- probe 2: double broadcast (4D) ------------------------------
    def k2(t_ref, i_ref, o_ref):
        val = jnp.take_along_axis(
            t_ref[...].reshape(RB, 1, E, 128),
            i_ref[...].reshape(RB, QP, 1, 128),
            axis=3,
        )
        o_ref[...] = val.reshape(RB * QP * E, 128)

    run(
        "p2 double-broadcast 4D gather",
        k2, (tab, idx),
        (RB * QP * E, 128), want_val.reshape(RB * QP * E, 128),
    )

    # --- probe 3: broadcast multiply ---------------------------------
    def k3(v_ref, w_ref, o_ref):
        out = v_ref[...].reshape(RB * QP, E, 128) * w_ref[...].reshape(
            RB * QP, 1, 128
        )
        o_ref[...] = out.reshape(RB * QP * E, 128)

    vflat = want_val.reshape(RB * QP * E, 128).astype(np.float32)
    want_mul = (
        want_val.reshape(RB * QP, E, 128) * w[:, None, :]
    ).reshape(RB * QP * E, 128)
    run("p3 broadcast multiply", k3, (vflat, w), (RB * QP * E, 128),
        want_mul)

    # --- timing: baseline (materialized expands) vs broadcast chain --
    def k_base(t_ref, i_ref, w_ref, o_ref):
        rowQ = jnp.broadcast_to(
            t_ref[...].reshape(RB, 1, E, 128), (RB, QP, E, 128)
        ).reshape(RB * QP * E, 128)
        idxQ = jnp.broadcast_to(
            i_ref[...].reshape(RB * QP, 1, 128), (RB * QP, E, 128)
        ).reshape(RB * QP * E, 128)
        wQ = jnp.broadcast_to(
            w_ref[...].reshape(RB * QP, 1, 128), (RB * QP, E, 128)
        ).reshape(RB * QP * E, 128)
        val = jnp.take_along_axis(rowQ, idxQ, axis=1)
        q = val * wQ
        x = q.reshape(RB * QP, E, 128)
        s = x.reshape(RB, QP, E, 128).sum(axis=1)
        o_ref[...] = s.reshape(RB * E, 128)

    def k_bcast(t_ref, i_ref, w_ref, o_ref):
        val = jnp.take_along_axis(
            t_ref[...].reshape(RB, 1, E, 128),
            i_ref[...].reshape(RB, QP, 1, 128),
            axis=3,
        )                                        # (RB, QP, E, 128)
        q = val * w_ref[...].reshape(RB, QP, 1, 128)
        s = q.sum(axis=1)                        # (RB, E, 128)
        o_ref[...] = s.reshape(RB * E, 128)

    want_s = (
        want_val * w.reshape(RB, QP, 1, 128)
    ).sum(axis=1).reshape(RB * E, 128)

    for name, kern in (("base", k_base), ("bcast", k_bcast)):
        try:
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((RB * E, 128), jnp.float32),
            )

            @jax.jit
            def reps(t, i, ww, n):
                def body(_, carry):
                    tt, acc = carry
                    o = f(tt, i, ww)
                    return (tt + 1e-12, acc + o[0, 0])

                _, acc = jax.lax.fori_loop(
                    0, n, body, (t, jnp.float32(0.0))
                )
                return acc

            targs = (jnp.asarray(tab), jnp.asarray(idx), jnp.asarray(w))
            out1 = np.asarray(
                pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct(
                        (RB * E, 128), jnp.float32
                    ),
                )(*targs)
            )
            ok = np.allclose(out1, want_s, atol=1e-5)
            float(reps(*targs, jnp.int32(100)))
            ts = []
            for n in (100, 2100):
                t0 = time.perf_counter()
                float(reps(*targs, jnp.int32(n)))
                ts.append(time.perf_counter() - t0)
            p = (ts[1] - ts[0]) / 2000
            print(
                f"chain {name}: {'ok' if ok else 'BAD'} "
                f"{p*1e9:.0f} ns/call ({p/RB*1e9:.1f} ns/row)"
            )
        except Exception as exc:
            print(f"chain {name}: FAIL {type(exc).__name__}: {exc}"[:300])


if __name__ == "__main__":
    main()
