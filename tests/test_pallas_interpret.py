"""
Pallas slab-kernel numerics in interpret mode (CPU).

The tiled regrid kernel (regrid/pallas_apply.py) only engages on real
TPU hardware, so without this suite its numerics would never run in CI.
``interpret=True`` executes the same kernel body on CPU; each supported
reduction method is compared against the XLA windowed-gather oracle
(regrid/apply.py:_apply_windowed_T) on NaN-free and NaN-bearing
sources.  Reference semantics: xugrid/regrid/reduce.py:16-272.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from xugrid_tpu.regrid import reduce as reductions
from xugrid_tpu.regrid.apply import _apply_windowed_T
from xugrid_tpu.regrid.pallas_apply import (
    PALLAS_METHODS,
    pad_for_plan,
    pallas_windowed_apply,
    plan_auto,
)

_ORACLE = {
    "mean": reductions.mean,
    "sum": reductions.sum,
    "first_order_conservative": reductions.first_order_conservative,
    "conductance": reductions.first_order_conservative,
    "harmonic_mean": reductions.harmonic_mean,
    "geometric_mean": reductions.geometric_mean,
}


def _make_problem(has_nan, seed=5, n=700, m=2000, w=5, E=16):
    rng = np.random.default_rng(seed)
    # locality: windows reference a sliding source range (plan_auto
    # rejects scattered indices)
    base = np.linspace(0, m - w - 1, n).astype(np.int32)
    idx = base[:, None] + np.arange(w, dtype=np.int32)[None, :]
    wts = rng.uniform(0.1, 1.0, idx.shape).astype(np.float32)
    drop = rng.random(idx.shape) < 0.25
    idx = np.where(drop, -1, idx).astype(np.int32)
    wts = np.where(drop, 0.0, wts).astype(np.float32)
    src = rng.uniform(0.5, 3.0, (m, E)).astype(np.float32)
    if has_nan:
        src[rng.random(src.shape) < 0.1] = np.nan
    return idx, wts, src


@pytest.mark.parametrize("method", PALLAS_METHODS)
@pytest.mark.parametrize("has_nan", [False, True])
def test_interpret_matches_xla_oracle(method, has_nan):
    idx, wts, src = _make_problem(has_nan)
    n, E = len(idx), src.shape[1]
    plan = plan_auto(idx, wts)
    assert plan is not None
    # 128-lane padded source, as the TPU dispatch path prepares it.
    src_lanes = np.zeros((src.shape[0], 128), np.float32)
    src_lanes[:, :E] = src
    srcT = pad_for_plan(src_lanes, plan)
    out = np.asarray(
        pallas_windowed_apply(
            jnp.asarray(srcT),
            jnp.asarray(plan.indices),
            jnp.asarray(plan.weights),
            jnp.asarray(plan.starts),
            jnp.asarray(plan.n_subs),
            jnp.asarray(plan.j_lo),
            jnp.asarray(plan.j_hi),
            plan.block,
            method,
            has_nan,
            interpret=True,
        )
    )[:n, :E]
    expected = np.asarray(
        _apply_windowed_T(
            jnp.asarray(src), jnp.asarray(idx), jnp.asarray(wts),
            _ORACLE[method],
        )
    )
    # bf16 3-pass split: ~1.5e-5 worst-case relative error.
    np.testing.assert_allclose(out, expected, rtol=5e-5, atol=5e-5)
    nan_frac = np.isnan(expected).mean()
    assert np.array_equal(np.isnan(out), np.isnan(expected)), (
        f"NaN pattern mismatch ({nan_frac:.2%} NaN expected)"
    )
