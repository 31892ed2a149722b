"""
Numerics tests for the selection-reduction Pallas kernel (mode /
median / percentiles), run in interpret mode on CPU against the
reduce-registry oracle (which pins the reference's numba kernels).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from xugrid_tpu.regrid import reduce as reductions
from xugrid_tpu.regrid.select_apply import (
    SELECT_METHODS,
    apply_windowed_select,
    plan_gather_select,
)

ORACLES = {"mode": reductions.mode, "median": reductions.median}
for _p in (5, 10, 25, 50, 75, 90, 95):
    ORACLES[f"p{_p}"] = reductions.create_percentile_method(_p)


def make_case(n=700, m=900, w=6, n_extra=5, seed=0, nan_frac=0.0,
              few_values=False):
    rng = np.random.default_rng(seed)
    base = (np.arange(n) * m) // n
    offs = rng.integers(-15, 16, size=(n, w))
    indices = np.clip(base[:, None] + offs, 0, m - 1).astype(np.int32)
    keep = rng.integers(1, w + 1, size=n)
    mask = np.arange(w)[None, :] < keep[:, None]
    indices = np.where(mask, indices, -1)
    empty = rng.random(n) < 0.02
    indices[empty] = -1
    weights = rng.uniform(0.1, 2.0, size=(n, w)).astype(np.float32)
    weights[~mask] = 0.0
    source = rng.normal(size=(n_extra, m)).astype(np.float32)
    if few_values:
        # Coarse quantization: many exact duplicates inside windows
        # (exercises mode tie-breaking and rank tie order).
        source = np.round(source * 2.0) / 2.0
    if nan_frac:
        source[rng.random(source.shape) < nan_frac] = np.nan
    return indices, weights, source


def oracle_apply(method, indices, weights, source):
    pad = indices < 0
    vals = source[:, np.maximum(indices, 0)]
    vals = np.where(pad[None], np.nan, vals)
    out = ORACLES[method](
        jnp.asarray(np.moveaxis(vals, 0, 1)),
        jnp.asarray(weights[:, None, :]),
    )
    return np.asarray(out)


@pytest.mark.parametrize("method", SELECT_METHODS)
@pytest.mark.parametrize("nan_frac", [0.0, 0.15])
def test_select_kernel_matches_oracle(method, nan_frac):
    indices, weights, source = make_case(
        nan_frac=nan_frac, seed=abs(hash(method)) % 1000,
        few_values=(method == "mode"),
    )
    got = apply_windowed_select(
        source, indices, weights, method, interpret=True
    )
    assert got is not None, "plan unexpectedly rejected"
    want = oracle_apply(method, indices, weights, source)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_select_duplicate_window_entries_and_ties():
    """Windows with repeated source indices (duplicate values) and
    equal weights: mode must sum duplicate weights and tie-break to
    the larger value exactly like the oracle."""
    rng = np.random.default_rng(11)
    n, m, w = 600, 300, 8
    indices = rng.integers(0, m, size=(n, w)).astype(np.int32)
    indices[:, -2:] = indices[:, :2]  # force duplicates
    weights = np.ones((n, w), np.float32)
    source = np.round(
        rng.normal(size=(3, m)) * 1.5
    ).astype(np.float32)
    for method in ("mode", "median", "p25"):
        got = apply_windowed_select(
            source, indices, weights, method, interpret=True
        )
        want = oracle_apply(method, indices, weights, source)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5,
                                   err_msg=method)


def test_select_empty_blocks_and_all_nan_windows():
    rng = np.random.default_rng(3)
    n, m, w = 2100, 1500, 5
    base = (np.arange(n) * m) // n
    indices = np.clip(
        base[:, None] + rng.integers(-9, 10, size=(n, w)), 0, m - 1
    ).astype(np.int32)
    weights = rng.uniform(0.1, 2.0, size=(n, w)).astype(np.float32)
    indices[512:1536] = -1
    weights[512:1536] = 0.0
    source = rng.normal(size=(3, m)).astype(np.float32)
    source[:, indices[1700, 0]] = np.nan  # poke some NaNs
    for method in ("median", "mode", "p90"):
        got = apply_windowed_select(
            source, indices, weights, method, interpret=True
        )
        assert np.isnan(got[512:1536]).all()
        want = oracle_apply(method, indices, weights, source)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5,
                                   err_msg=method)


def test_select_dispatch_recognizes_reductions(monkeypatch):
    """apply_weights routes mode/median/percentiles to the selection
    kernel on TPU backends (recognition test: backend mocked)."""
    import jax

    from xugrid_tpu.regrid import apply as apply_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        jax.config, "read",
        lambda name: False if name == "jax_enable_x64"
        else jax.config.read(name),
    )
    src = np.ones((2, 10), np.float64)
    name, has_nan = apply_mod._select_method(reductions.mode, src)
    assert name == "mode" and has_nan is False
    name, _ = apply_mod._select_method(reductions.median, src)
    assert name in ("median", "p50")
    p33 = reductions.create_percentile_method(33)
    name, _ = apply_mod._select_method(p33, src)
    assert name == "p33"
    # Linear reductions are NOT select methods.
    assert apply_mod._select_method(reductions.mean, src)[0] is None
    # inf defeats the masked matmul -> fall back.
    bad = src.copy()
    bad[0, 0] = np.inf
    assert apply_mod._select_method(reductions.mode, bad)[0] is None


def test_select_plan_rejects_wide_windows():
    n, m, w = 64, 4000, 40
    rng = np.random.default_rng(0)
    indices = rng.integers(0, m, size=(n, w)).astype(np.int32)
    weights = np.ones((n, w), np.float32)
    assert plan_gather_select(indices, weights) is None


@pytest.mark.parametrize("method", ["median", "mode", "p25"])
def test_select_structural_edge_shapes(method):
    """Width-1 windows, sub-block target counts, and a single source
    slice: shapes that stress plan padding rather than numerics."""
    for n, w, n_extra, seed in [(5, 1, 1, 10), (130, 1, 1, 11),
                                (513, 3, 2, 12)]:
        rng = np.random.default_rng(seed)
        m = 4 * n + 8
        base = (np.arange(n) * m) // n
        indices = np.clip(
            base[:, None] + rng.integers(-3, 4, size=(n, w)), 0, m - 1
        ).astype(np.int32)
        weights = rng.uniform(0.5, 1.5, size=(n, w)).astype(np.float32)
        source = rng.normal(size=(n_extra, m)).astype(np.float32)
        if method == "mode":
            source = np.round(source)
        got = apply_windowed_select(
            source, indices, weights, method, interpret=True
        )
        if got is None:
            # plan may reject degenerate shapes; that's a legal outcome
            continue
        want = oracle_apply(method, indices, weights, source)
        np.testing.assert_allclose(
            got, want, rtol=2e-5, atol=1e-5,
            err_msg=f"{method} n={n} w={w} E={n_extra}",
        )


def test_select_seed_sweep_median_vs_oracle():
    """Randomized sweep: jittered localities, ragged windows, NaN
    speckle — median and p75 against the registry oracle."""
    for seed in range(6):
        indices, weights, source = make_case(
            n=420, m=600, w=5, n_extra=3, seed=100 + seed,
            nan_frac=0.1 * (seed % 3),
        )
        for method in ("median", "p75"):
            got = apply_windowed_select(
                source, indices, weights, method, interpret=True
            )
            assert got is not None
            want = oracle_apply(method, indices, weights, source)
            np.testing.assert_allclose(
                got, want, rtol=2e-5, atol=1e-5,
                err_msg=f"seed={seed} {method}",
            )


class TestSplitPlan:
    def _tail_case(self, seed=0, nan_frac=0.0):
        # 2000 targets with 4-6 entry windows plus a ~1% tail of
        # 17-20 entry windows: the planner must split at a padding
        # class instead of taxing every step with the tail's dmax.
        rng = np.random.default_rng(seed)
        n, m = 2000, 2600
        w_wide = 20
        base = (np.arange(n) * m) // n
        offs = rng.integers(-12, 13, size=(n, w_wide))
        indices = np.clip(base[:, None] + offs, 0, m - 1).astype(np.int32)
        keep = rng.integers(4, 7, size=n)
        wide = rng.random(n) < 0.01
        keep[wide] = rng.integers(17, w_wide + 1, size=wide.sum())
        mask = np.arange(w_wide)[None, :] < keep[:, None]
        # wide windows must have distinct slots (duplicates are fine
        # for the kernel; keep it simple)
        indices = np.where(mask, indices, -1)
        weights = rng.uniform(0.1, 2.0, size=(n, w_wide)).astype(np.float32)
        weights[~mask] = 0.0
        source = rng.normal(size=(3, m)).astype(np.float32)
        if nan_frac:
            source[rng.random(source.shape) < nan_frac] = np.nan
        return indices, weights, source

    @pytest.mark.parametrize("method", ["median", "mode", "p90"])
    @pytest.mark.parametrize("nan_frac", [0.0, 0.2])
    def test_split_matches_oracle(self, method, nan_frac):
        from xugrid_tpu.regrid.select_apply import SplitSelectPlan

        indices, weights, source = self._tail_case(
            seed=hash(method) % 100, nan_frac=nan_frac
        )
        plan = plan_gather_select(indices, weights)
        assert isinstance(plan, SplitSelectPlan), "split expected"
        assert plan.small.dmax < plan.big.dmax
        got = apply_windowed_select(
            source, indices, weights, method, plan=plan, interpret=True
        )
        assert got is not None
        want = oracle_apply(method, indices, weights, source)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)

    def test_split_disabled_by_env(self, monkeypatch):
        from xugrid_tpu.regrid.select_apply import SelectPlan

        monkeypatch.setenv("XUGRID_TPU_SELECT_SPLIT", "0")
        indices, weights, _ = self._tail_case()
        plan = plan_gather_select(indices, weights)
        assert isinstance(plan, SelectPlan)
