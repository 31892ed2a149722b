"""
Interpret-mode numerics tests for the row-matmul (MXU) gather engine
against the reduce-registry oracle — the same pattern as the aligned /
select engine suites (ADVICE r3: the engine previously had no unit
coverage).  Covers every MXU_METHODS entry, NaN sources (sentinel
staging), spill rows (per-(target, chunk) runs longer than Q_PACK),
multi-block plans, the staging rejection paths, and bit-exactness vs
the aligned engine (v2's static scatter and Precision.HIGHEST select
must reproduce the aligned combine order exactly).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from xugrid_tpu.regrid import reduce as reductions
from xugrid_tpu.regrid.aligned_apply import (
    aligned_apply,
    plan_gather_aligned,
    plan_triplets,
)
from xugrid_tpu.regrid.mxu_apply import (
    MXU_METHODS,
    NAN_SENTINEL,
    mxu_apply,
    mxu_supported,
    plan_gather_mxu,
    stage_source_mxu,
)

ORACLES = {
    "mean": reductions.mean,
    "sum": reductions.sum,
    "first_order_conservative": reductions.first_order_conservative,
    "conductance": reductions.conductance,
    "harmonic_mean": reductions.harmonic_mean,
    "geometric_mean": reductions.geometric_mean,
    "min": reductions.minimum,
    "max": reductions.maximum,
}


def make_case(n=700, m=900, w=6, n_extra=5, seed=0, nan_frac=0.0,
              spread=15):
    rng = np.random.default_rng(seed)
    base = (np.arange(n) * m) // n
    offs = rng.integers(-spread, spread + 1, size=(n, w))
    indices = np.clip(base[:, None] + offs, 0, m - 1).astype(np.int32)
    keep = rng.integers(1, w + 1, size=n)
    mask = np.arange(w)[None, :] < keep[:, None]
    indices = np.where(mask, indices, -1)
    empty = rng.random(n) < 0.02
    indices[empty] = -1
    weights = rng.uniform(0.1, 2.0, size=(n, w)).astype(np.float32)
    weights[~mask] = 0.0
    source = rng.normal(size=(n_extra, m)).astype(np.float32)
    if nan_frac:
        source[rng.random(source.shape) < nan_frac] = np.nan
    return indices, weights, source


def oracle_apply(method, indices, weights, source):
    if method == "matvec":
        vals = np.where(
            indices[None] >= 0, source[:, np.maximum(indices, 0)], 0.0
        )
        return np.einsum("enw,nw->ne", vals, weights)
    pad = indices < 0
    vals = source[:, np.maximum(indices, 0)]
    vals = np.where(pad[None], np.nan, vals)
    out = ORACLES[method](
        jnp.asarray(np.moveaxis(vals, 0, 1)),
        jnp.asarray(weights[:, None, :]),
    )
    return np.asarray(out)


@pytest.mark.parametrize("method", MXU_METHODS)
@pytest.mark.parametrize("nan_frac", [0.0, 0.15])
def test_mxu_matches_oracle(method, nan_frac):
    indices, weights, source = make_case(
        nan_frac=nan_frac, seed=hash(method) % 1000
    )
    plan = plan_gather_mxu(indices, weights)
    assert plan is not None
    assert mxu_supported(method, bool(nan_frac))
    got = mxu_apply(source, plan, method, interpret=True)
    assert got is not None
    if method == "matvec" and nan_frac:
        # NaN stays on its owning targets (static scatter — no
        # cross-target poisoning); compare against the aligned engine,
        # whose matvec chain has the same finite-data contract.
        ap = plan_gather_aligned(indices, weights)
        want = aligned_apply(source, ap, method, interpret=True)
        np.testing.assert_array_equal(
            np.isnan(got), np.isnan(want)
        )
        np.testing.assert_allclose(
            np.nan_to_num(got), np.nan_to_num(want), rtol=0, atol=0
        )
        return
    want = oracle_apply(method, indices, weights, source)
    # The reciprocal chain of harmonic_mean amplifies f32 rounding
    # (observed 2.8e-5 rel err on hosts whose XLA:CPU codegen differs
    # from the compile-cache machine); the f64 oracle is exact.
    rtol = 5e-5 if method == "harmonic_mean" else 2e-5
    np.testing.assert_allclose(got, want, rtol=rtol, atol=1e-5)


@pytest.mark.parametrize("method", MXU_METHODS)
def test_mxu_bitexact_vs_aligned(method):
    # The select matmul (one-hot, Precision.HIGHEST) and static quad
    # scatter must reproduce the aligned engine's f32 results exactly:
    # both engines combine the same per-(target, chunk) partials.
    indices, weights, source = make_case(seed=42, nan_frac=0.1)
    mplan = plan_gather_mxu(indices, weights)
    aplan = plan_gather_aligned(indices, weights)
    got = mxu_apply(source, mplan, method, interpret=True)
    want = aligned_apply(source, aplan, method, interpret=True)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_array_equal(
        np.nan_to_num(got), np.nan_to_num(want)
    )


def test_mxu_plan_roundtrip():
    # The quad-interleaved plan must decode back to the exact triplet
    # set (plan_triplets is the oracle for row re-grouping bugs).
    indices, weights, _ = make_case(seed=5)
    plan = plan_gather_mxu(indices, weights)
    ti, si, ws = plan_triplets(plan.base)
    order = np.lexsort((ws, si, ti))
    got = np.stack([ti[order], si[order]], axis=1)
    t_ref, s_ref, w_ref = [], [], []
    for t in range(len(indices)):
        for j in range(indices.shape[1]):
            if indices[t, j] >= 0:
                t_ref.append(t)
                s_ref.append(indices[t, j])
                w_ref.append(weights[t, j])
    t_ref = np.asarray(t_ref)
    s_ref = np.asarray(s_ref)
    w_ref = np.asarray(w_ref, np.float32)
    order2 = np.lexsort((w_ref, s_ref, t_ref))
    np.testing.assert_array_equal(
        got, np.stack([t_ref[order2], s_ref[order2]], axis=1)
    )
    np.testing.assert_array_equal(ws[order], w_ref[order2])


def test_mxu_spill_rows():
    # w=12 > Q_PACK=4 forces per-(target, chunk) runs to spill extra
    # rows; zero spread piles every entry of a target into one chunk.
    indices, weights, source = make_case(w=12, spread=2, seed=7)
    plan = plan_gather_mxu(indices, weights)
    assert plan is not None
    got = mxu_apply(source, plan, "mean", interpret=True)
    want = oracle_apply("mean", indices, weights, source)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_mxu_multi_block_plan():
    # n > the MXU block: multiple output blocks, including entirely
    # empty ones flushed NaN.
    indices, weights, source = make_case(n=5000, m=4000, seed=11,
                                         nan_frac=0.1)
    indices[2048:4096] = -1
    weights[2048:4096] = 0.0
    plan = plan_gather_mxu(indices, weights)
    assert plan is not None
    got = mxu_apply(source, plan, "mean", interpret=True)
    assert got is not None
    assert np.isnan(got[2048:4096]).all()
    want = oracle_apply("mean", indices, weights, source)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_mxu_staging_rejections():
    indices, weights, source = make_case(seed=3, nan_frac=0.1)
    plan = plan_gather_mxu(indices, weights)
    assert plan is not None

    # ±inf rejects with or without NaN (0*inf = NaN inside the select
    # matmul would poison whole tiles).
    s_inf = source.copy()
    s_inf[0, 0] = np.inf
    assert stage_source_mxu(s_inf, plan, True) is None
    s_inf2 = np.nan_to_num(source, nan=0.0)
    s_inf2[0, 1] = -np.inf
    assert stage_source_mxu(s_inf2, plan, False) is None

    # Real data at the sentinel magnitude rejects.
    s_sent = source.copy()
    s_sent[0, 2] = float(NAN_SENTINEL)
    assert stage_source_mxu(s_sent, plan, True) is None

    # Large finite data is FINE in v2 (quantities never enter a
    # matmul; overflow stays on the owning lane as on aligned).
    s_big = np.nan_to_num(source, nan=0.0) * np.float32(1e30)
    assert stage_source_mxu(s_big, plan, False) is not None


def test_mxu_sentinel_roundtrip_exact():
    # The sentinel (a power of two) must survive the Precision.HIGHEST
    # select matmul bit-exact so the decode-to-NaN comparison fires:
    # staged NaNs come back as NaN in the output when they own the
    # whole window.
    indices = np.array([[0, 1], [2, -1]], np.int32)
    weights = np.array([[1.0, 1.0], [1.0, 0.0]], np.float32)
    source = np.array([[np.nan, np.nan, 5.0]], np.float32)
    plan = plan_gather_mxu(indices, weights)
    assert plan is not None
    got = mxu_apply(source, plan, "mean", interpret=True)
    assert np.isnan(got[0, 0])
    np.testing.assert_allclose(got[1, 0], 5.0)
