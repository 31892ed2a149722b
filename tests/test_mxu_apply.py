"""
Interpret-mode numerics tests for the row-matmul (MXU) gather engine
against the reduce-registry oracle — the same pattern as the aligned /
select engine suites (ADVICE r3: the engine previously had no unit
coverage).  Covers every MXU_METHODS entry, NaN sources (sentinel
staging), spill rows (per-(target, chunk) runs longer than Q_PACK),
multi-block plans, and the staging rejection paths.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from xugrid_tpu.regrid import reduce as reductions
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
    got = mxu_apply(source, plan, method, interpret=True)
    if method == "matvec" and nan_frac:
        # NaN matvec is rejected (scatter matmul would spread the NaN
        # to unrelated targets); callers fall back to the aligned
        # engine.
        assert got is None
        assert not mxu_supported("matvec", True)
        return
    assert got is not None
    want = oracle_apply(method, indices, weights, source)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


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
    # n > the 2048-target MXU block: multiple output blocks, including
    # an entirely empty one (targets 2048..4095) flushed NaN.
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

    # ±inf rejects with or without NaN.
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

    # Σ|w|·max|v| near f32 max rejects (an inf partial would poison
    # the scatter matmul step).
    s_big = np.nan_to_num(source, nan=0.0) * np.float32(1e37)
    assert stage_source_mxu(s_big, plan, False) is None
    assert mxu_apply(s_big, plan, "mean", interpret=True) is None


def test_mxu_sentinel_roundtrip_exact():
    # The sentinel must survive the 3-term bf16 split bit-exact so the
    # decode-to-NaN comparison fires: staged NaNs come back as NaN in
    # the output when they own the whole window.
    indices = np.array([[0, 1], [2, -1]], np.int32)
    weights = np.array([[1.0, 1.0], [1.0, 0.0]], np.float32)
    source = np.array([[np.nan, np.nan, 5.0]], np.float32)
    plan = plan_gather_mxu(indices, weights)
    assert plan is not None
    got = mxu_apply(source, plan, "mean", interpret=True)
    assert np.isnan(got[0, 0])
    np.testing.assert_allclose(got[1, 0], 5.0)
