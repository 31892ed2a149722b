"""Probe Mosaic semantics the row-matmul (mxu) gather engine needs:
1. dot_general with a rank-3 rhs: (R, W) @ (W, e, 128) -> (R, e, 128)
   (the chunk-select matmul straight off the aligned slab layout)
2. the same for the scatter matmul: (G, R) @ (R, ce, 128)
3. fallback: in-kernel reshape (R, e*128) -> (R*e, 128)
4. 3-term bf16 split exactness of a one-hot select (f32 ulp match)
Run on the real TPU; prints PASS/FAIL per probe.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache"),
)

DIMS = (((1,), (0,)), ((), ()))


def _split3(x):
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def probe_rank3_select(R=32, W=64, e=8):
    def kernel(oh_ref, slab_ref, o_ref):
        oh = oh_ref[...]
        out = jnp.zeros((R, e, 128), jnp.float32)
        for part in _split3(slab_ref[...]):
            out = out + jax.lax.dot_general(
                oh, part, DIMS, preferred_element_type=jnp.float32
            )
        o_ref[...] = out

    rng = np.random.default_rng(0)
    cid = rng.integers(0, W, size=R)
    oh = np.zeros((R, W), np.float32)
    oh[np.arange(R), cid] = 1.0
    slab = rng.normal(size=(W, e, 128)).astype(np.float32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, e, 128), jnp.float32),
        )(oh.astype(jnp.bfloat16), slab)
        want = slab[cid]
        ok = np.array_equal(np.asarray(out), want)
        print(f"rank3 select matmul R={R} W={W} e={e}: "
              f"{'PASS' if ok else 'FAIL'}")
        if not ok:
            d = np.abs(np.asarray(out) - want)
            print("  max abs err:", d.max())
    except Exception as exc:
        print(f"rank3 select matmul R={R} W={W} e={e}: ERROR {exc!r}"[:300])


def probe_rank3_scatter(G=16, R=32, ce=16):
    def kernel(oh_ref, p_ref, o_ref):
        oh = oh_ref[...]
        out = jnp.zeros((G, ce, 128), jnp.float32)
        for part in _split3(p_ref[...]):
            out = out + jax.lax.dot_general(
                oh, part, DIMS, preferred_element_type=jnp.float32
            )
        o_ref[...] = out

    rng = np.random.default_rng(1)
    grp = rng.integers(0, G, size=R)
    oh = np.zeros((G, R), np.float32)
    oh[grp, np.arange(R)] = 1.0
    p = rng.normal(size=(R, ce, 128)).astype(np.float32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((G, ce, 128), jnp.float32),
        )(oh.astype(jnp.bfloat16), p)
        want = np.zeros((G, ce, 128), np.float32)
        h = p.astype(jnp.bfloat16)
        r1 = p - np.asarray(h, np.float32)
        m = r1.astype(jnp.bfloat16)
        lo = (r1 - np.asarray(m, np.float32)).astype(jnp.bfloat16)
        for name in (h, m, lo):
            part = np.asarray(name, np.float32)
            for r in range(R):
                want[grp[r]] += part[r]
        got = np.asarray(out)
        ok = np.allclose(got, want, rtol=2e-6, atol=1e-6)
        print(f"rank3 scatter matmul G={G} R={R}: {'PASS' if ok else 'FAIL'}")
        if not ok:
            print("  max abs err:", np.abs(got - want).max())
    except Exception as exc:
        print(f"rank3 scatter matmul G={G} R={R}: ERROR {exc!r}"[:300])


def probe_retile_reshape(R=32, e=8):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(R * e, 128)

    x = np.arange(R * e * 128, dtype=np.float32).reshape(R, e * 128)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R * e, 128), jnp.float32),
        )(x)
        want = x.reshape(R * e, 128)
        ok = np.array_equal(np.asarray(out), want)
        print(f"retile reshape ({R},{e * 128})->({R * e},128): "
              f"{'PASS' if ok else 'FAIL'}")
    except Exception as exc:
        print(f"retile reshape: ERROR {exc!r}"[:300])


if __name__ == "__main__":
    probe_rank3_select()
    probe_rank3_scatter()
    probe_retile_reshape()
