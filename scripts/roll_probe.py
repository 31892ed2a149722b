"""Probe Mosaic semantics the select kernel depends on:
1. pltpu.roll on (12, 128) i32 (sublane count NOT a multiple of 8)
2. pltpu.roll with shift 128-d (negative-roll emulation)
3. take_along_axis on a sublane-broadcast table
Run on the real TPU; prints PASS/FAIL per probe.
"""

import os

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


def probe_roll(rows, shift):
    def kernel(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], shift, axis=1)

    x = np.arange(rows * 128, dtype=np.int32).reshape(rows, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
    )(x)
    want = np.roll(x, shift, axis=1)
    ok = np.array_equal(np.asarray(out), want)
    print(f"roll rows={rows} shift={shift}: {'PASS' if ok else 'FAIL'}")
    if not ok:
        bad = np.argwhere(np.asarray(out) != want)
        print("  first mismatches:", bad[:5].tolist())


def probe_gather_broadcast():
    def kernel(t_ref, i_ref, o_ref):
        table = jnp.broadcast_to(
            t_ref[...].reshape(1, 8, 128), (4, 8, 128)
        ).reshape(32, 128)
        o_ref[...] = jnp.take_along_axis(table, i_ref[...], axis=1)

    rng = np.random.default_rng(0)
    t = rng.normal(size=(8, 128)).astype(np.float32)
    idx = rng.integers(0, 128, size=(32, 128)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
    )(t, idx)
    table = np.broadcast_to(t.reshape(1, 8, 128), (4, 8, 128)).reshape(32, 128)
    want = np.take_along_axis(table, idx, axis=1)
    ok = np.allclose(np.asarray(out), want)
    print(f"gather broadcast-table: {'PASS' if ok else 'FAIL'}")




def probe_lane_to_sublane_reshape():
    """The select kernel's one-hot build: seg row (lanes) reshaped to a
    (128, 1) column (sublanes) then compared against a lane iota."""
    def kernel(s_ref, o_ref):
        seg = s_ref[...]                       # (1, 128)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (128, 512), 1)
        ph = (
            jnp.broadcast_to(seg.reshape(128, 1), (128, 512)) == iota_b
        ).astype(jnp.float32)
        o_ref[...] = ph

    rng = np.random.default_rng(1)
    seg = rng.integers(-1, 512, size=(1, 128)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 512), jnp.float32),
    )(seg)
    want = (seg.reshape(128, 1) == np.arange(512)[None, :]).astype(np.float32)
    ok = np.array_equal(np.asarray(out), want)
    print(f"lane->sublane reshape one-hot: {'PASS' if ok else 'FAIL'}")
    if not ok:
        diff = np.argwhere(np.asarray(out) != want)
        print("  mismatches:", len(diff), "first:", diff[:5].tolist())


def probe_expand_reshape():
    """expand(): (12,128) -> broadcast (12,24,128) -> reshape (288,128)."""
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jnp.broadcast_to(
            x[:, None, :], (12, 24, 128)
        ).reshape(288, 128)

    x = np.arange(12 * 128, dtype=np.int32).reshape(12, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((288, 128), jnp.int32),
    )(x)
    want = np.broadcast_to(x[:, None, :], (12, 24, 128)).reshape(288, 128)
    ok = np.array_equal(np.asarray(out), want)
    print(f"expand broadcast-reshape: {'PASS' if ok else 'FAIL'}")


if __name__ == "__main__":
    probe_roll(12, 3)
    probe_roll(12, 125)       # 128 - 3: negative-roll emulation
    probe_roll(16, 3)
    probe_roll(16, 125)
    probe_gather_broadcast()
    probe_lane_to_sublane_reshape()
    probe_expand_reshape()
