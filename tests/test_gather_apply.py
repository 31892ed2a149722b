"""
Numerics tests for the gather-packet Pallas apply kernel, run in
interpret mode on CPU against the reduce-registry oracle (which pins
the reference's numba kernels — see tests/test_golden.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from xugrid_tpu.regrid import reduce as reductions
from xugrid_tpu.regrid.gather_apply import (
    GATHER_METHODS,
    apply_windowed_gather,
    plan_gather,
)

ORACLES = {
    "max_overlap": reductions.max_overlap,
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
              positive=False):
    rng = np.random.default_rng(seed)
    base = (np.arange(n) * m) // n
    offs = rng.integers(-15, 16, size=(n, w))
    indices = np.clip(base[:, None] + offs, 0, m - 1).astype(np.int32)
    # ragged windows: pad a random suffix of each row
    keep = rng.integers(1, w + 1, size=n)
    mask = np.arange(w)[None, :] < keep[:, None]
    indices = np.where(mask, indices, -1)
    # a few empty rows
    empty = rng.random(n) < 0.02
    indices[empty] = -1
    weights = rng.uniform(0.1, 2.0, size=(n, w)).astype(np.float32)
    weights[~mask] = 0.0
    source = rng.normal(size=(n_extra, m)).astype(np.float32)
    if positive:
        source = np.abs(source) + 0.1
    if nan_frac:
        nan_mask = rng.random(source.shape) < nan_frac
        source[nan_mask] = np.nan
    return indices, weights, source


def oracle_apply(method, indices, weights, source):
    n, w = indices.shape
    pad = indices < 0
    vals = source[:, np.maximum(indices, 0)]          # (E, n, w)
    vals = np.where(pad[None], np.nan, vals)
    out = ORACLES[method](
        jnp.asarray(np.moveaxis(vals, 0, 1)),          # (n, E, w)
        jnp.asarray(weights[:, None, :]),
    )
    return np.asarray(out)                             # (n, E)


@pytest.mark.parametrize(
    "engine", ["packet", "span", "pdot", "stream", "dense", "aligned"]
)
@pytest.mark.parametrize("method", GATHER_METHODS)
@pytest.mark.parametrize("nan_frac", [0.0, 0.15])
def test_gather_kernel_matches_oracle(method, nan_frac, engine):
    positive = method in ("harmonic_mean", "geometric_mean")
    indices, weights, source = make_case(
        nan_frac=nan_frac, positive=positive, seed=hash(method) % 1000
    )
    got = apply_windowed_gather(
        source, indices, weights, method, interpret=True, engine=engine
    )
    assert got is not None, "plan unexpectedly rejected"
    want = oracle_apply(method, indices, weights, source)
    np.testing.assert_allclose(got, want.T[: len(got[0])].T, rtol=2e-5,
                               atol=1e-5)


@pytest.mark.parametrize("engine", ["stream", "dense", "aligned"])
@pytest.mark.parametrize("method", ["mean", "min"])
def test_engine_empty_blocks(method, engine):
    """Whole 512-target blocks without any window entry ride dummy
    steps (appended after the real blocks) and must come out NaN,
    without disturbing neighbouring blocks."""
    rng = np.random.default_rng(3)
    n, m, w = 2100, 1500, 5
    base = (np.arange(n) * m) // n
    indices = np.clip(
        base[:, None] + rng.integers(-9, 10, size=(n, w)), 0, m - 1
    ).astype(np.int32)
    weights = rng.uniform(0.1, 2.0, size=(n, w)).astype(np.float32)
    # Empty out blocks 1 and 2 entirely (targets 512..1535).
    indices[512:1536] = -1
    weights[512:1536] = 0.0
    source = rng.normal(size=(3, m)).astype(np.float32)
    got = apply_windowed_gather(
        source, indices, weights, method, interpret=True, engine=engine
    )
    assert got is not None
    assert np.isnan(got[512:1536]).all()
    want = oracle_apply(method, indices, weights, source)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize(
    "shape", ["sparse_random", "longrun_spill", "wide_window"]
)
def test_aligned_engine_adversarial_shapes(shape):
    """Aligned-engine parity on its hard structural paths: sparse
    targets per chunk (low lane occupancy), per-(target, chunk) runs
    longer than Q_PACK (spill rows accumulated through the combine),
    and windows straddling more chunks than one resident slab."""
    from xugrid_tpu.regrid.aligned_apply import (
        aligned_apply,
        plan_gather_aligned,
    )

    rng = np.random.default_rng(11)
    if shape == "sparse_random":
        n, m, w = 1400, 9000, 10
        indices = rng.integers(0, m, (n, w))
        keep = np.arange(w)[None] < rng.integers(0, w + 1, n)[:, None]
        indices = np.where(keep, indices, -1)
        weights = np.where(
            keep, rng.uniform(0.1, 2, (n, w)), 0
        ).astype(np.float32)
    elif shape == "longrun_spill":
        n, m, w = 600, 5000, 40
        base = rng.integers(0, m // 128 - 1, n) * 128
        offs = np.argsort(rng.random((n, w)), axis=1)
        indices = base[:, None] + offs
        weights = rng.uniform(0.1, 1, (n, w)).astype(np.float32)
    else:
        n, w = 900, 90
        indices = (
            np.arange(w)[None] * (128 * 3)
            + rng.integers(0, 100, (n, 1))
        )
        m = int(indices.max()) + 1
        weights = rng.uniform(0.1, 1, (n, w)).astype(np.float32)

    src = rng.normal(size=(3, m)).astype(np.float32) + 2
    src[rng.random(src.shape) < 0.12] = np.nan
    plan = plan_gather_aligned(indices, weights)
    assert plan is not None
    for method in ("mean", "min"):
        got = aligned_apply(src, plan, method, has_nan=True,
                            interpret=True)
        want = oracle_apply(method, indices, weights, src)
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_aligned_geometric_mean_ignores_unselected_negatives():
    """Invalid sub-slots gather lane-local index 0 of their chunk;
    geometric_mean's negs chain is not weight-gated, so those garbage
    gathers must be masked explicitly (mirror of the dense-engine
    regression)."""
    from xugrid_tpu.regrid.aligned_apply import (
        aligned_apply,
        plan_gather_aligned,
    )

    indices = np.array([[3], [4], [5], [6]])
    weights = np.ones((4, 1), np.float32)
    src = np.arange(1, 129, dtype=np.float32)[None]
    src[0, 0] = -5.0
    plan = plan_gather_aligned(indices, weights)
    got = aligned_apply(
        src, plan, "geometric_mean", has_nan=False, interpret=True
    )
    np.testing.assert_allclose(
        got.ravel(), [4.0, 5.0, 6.0, 7.0], rtol=1e-5
    )


def test_aligned_matvec_block_1024():
    """The aligned engine must honor non-default plan block widths
    (plans auto-widen past the SMEM step floor)."""
    from xugrid_tpu.regrid.aligned_apply import (
        aligned_apply,
        plan_gather_aligned,
    )

    rng = np.random.default_rng(4)
    n, m, w = 2100, 2600, 5
    base = (np.arange(n) * m) // n
    indices = np.clip(
        base[:, None] + rng.integers(-8, 9, (n, w)), 0, m - 1
    )
    weights = rng.uniform(-1, 2, (n, w)).astype(np.float32)
    src = rng.normal(size=(2, m)).astype(np.float32)
    plan = plan_gather_aligned(indices, weights, block=1024)
    assert plan is not None and plan.block == 1024
    got = aligned_apply(src, plan, "matvec", has_nan=False,
                        interpret=True)
    want = np.einsum(
        "nw,enw->ne", weights, src[:, np.maximum(indices, 0)]
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_aligned_plan_roundtrip():
    """The aligned plan decodes back to exactly the input (target,
    source, weight) triplet set."""
    from xugrid_tpu.regrid.aligned_apply import (
        plan_gather_aligned,
        plan_triplets,
    )

    indices, weights, _ = make_case(n=2100, m=2500, w=8, seed=5)
    plan = plan_gather_aligned(indices, weights)
    assert plan is not None
    ti, si, wi = plan_triplets(plan)
    got = sorted(zip(ti.tolist(), si.tolist(), wi.tolist()))
    rows, cols = np.nonzero(indices >= 0)
    want = sorted(
        zip(
            rows.tolist(),
            indices[rows, cols].tolist(),
            weights[rows, cols].tolist(),
        )
    )
    assert got == want



@pytest.mark.parametrize("force", ["0", "1"])
@pytest.mark.parametrize("method", ["mean", "sum", "geometric_mean"])
def test_gather_kernel_mxu_vs_scan_paths(monkeypatch, method, force):
    """Both reduction engines (MXU one-hot matmul / segmented lane
    scan) must agree with the oracle regardless of the heuristic."""
    monkeypatch.setenv("XUGRID_TPU_GATHER_MXU", force)
    positive = method == "geometric_mean"
    indices, weights, source = make_case(
        nan_frac=0.1, positive=positive, seed=21, n_extra=3
    )
    got = apply_windowed_gather(
        source, indices, weights, method, interpret=True
    )
    want = oracle_apply(method, indices, weights, source)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_gather_kernel_negative_values_geometric():
    indices, weights, source = make_case(seed=7)
    # geometric mean with any negative contribution -> NaN
    got = apply_windowed_gather(
        source, indices, weights, "geometric_mean", interpret=True
    )
    want = oracle_apply("geometric_mean", indices, weights, source)
    # NaN patterns must agree exactly
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))


def test_plan_rejects_scattered_indices():
    rng = np.random.default_rng(3)
    n, m, w = 2048, 40_000_000, 4
    indices = rng.integers(0, m, size=(n, w)).astype(np.int32)
    weights = np.ones((n, w), np.float32)
    assert plan_gather(indices, weights) is None


def test_plan_packet_invariants():
    indices, weights, _ = make_case(n=600, m=700)
    plan = plan_gather(indices, weights)
    assert plan is not None
    # lane 0 is the dummy: weight 0 and segment -1 everywhere
    assert (plan.pw[:, 0] == 0.0).all()
    assert (plan.pseg[:, 0] == -1).all()
    # every real entry's local index is within its chunk
    assert plan.pidx[:, 1:].min() >= 0
    assert plan.pidx[:, 1:].max() < 128
    # total weight mass is preserved
    valid = indices >= 0
    np.testing.assert_allclose(
        plan.pw[:, 1:].sum(), weights[valid].sum(), rtol=1e-5
    )
    # end lanes point at entries of the right segment
    rows, taus = np.nonzero(plan.pend)
    lanes = plan.pend[rows, taus]
    assert (plan.pseg[rows, lanes] == taus).all()
    # the lane-transposed page mirrors pseg: column p of a block's
    # tile holds packet p's per-lane segment ids (255 on dummy/pad)
    n_blocks = len(plan.chunk0)
    ptiles = plan.page.shape[0] // n_blocks // 128
    pg = plan.page.reshape(n_blocks, ptiles, 128, 128)
    seg = plan.pseg.reshape(n_blocks, plan.npk_max, 128)
    for b in range(n_blocks):
        for u in range(plan.npk_max):
            want = np.where(seg[b, u] >= 0, seg[b, u], 255)
            np.testing.assert_array_equal(
                pg[b, u // 128, :, u % 128], want
            )


def test_empty_and_full_rows():
    # all-empty target rows yield NaN; full rows exact
    m = 300
    indices = np.array([[0, 1, 2], [-1, -1, -1], [10, 11, -1]], np.int32)
    indices = np.tile(indices, (200, 1))[:520]
    weights = np.where(indices >= 0, 1.0, 0.0).astype(np.float32)
    source = np.arange(m, dtype=np.float32)[None] * 0.5
    got = apply_windowed_gather(
        source, indices, weights, "mean", interpret=True
    )
    want = oracle_apply("mean", indices, weights, source)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_wide_sublane_batch_path():
    """n_extra large enough to select the small packet batch (the
    lane-packed bench configuration's code path)."""
    indices, weights, source = make_case(n=600, m=700, n_extra=40, seed=11)
    got = apply_windowed_gather(
        source, indices, weights, "mean", interpret=True
    )
    want = oracle_apply("mean", indices, weights, source)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_max_overlap_filter_rides_max_chain():
    """max_overlap = plan-side filter to max-weight entries + the max
    chain (regrid/apply.py _max_overlap_filter); must match the
    max_overlap oracle exactly on NaN-free data, including weight ties
    (larger value wins) and all-zero-weight targets (NaN)."""
    from xugrid_tpu.regrid.apply import _max_overlap_filter

    indices, weights, source = make_case(seed=33)
    # force some exact weight ties and an all-zero-weight target
    weights[5, :] = np.where(indices[5] >= 0, 0.5, 0.0)
    weights[9, :] = 0.0
    fidx, fw = _max_overlap_filter(indices, weights)
    got = apply_windowed_gather(
        source, fidx, fw, "max", has_nan=False, interpret=True
    )
    assert got is not None
    want = oracle_apply("max_overlap", indices, weights, source)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("gm", [False, True])
@pytest.mark.parametrize(
    "method", ["mean", "sum", "min", "max", "harmonic_mean",
               "geometric_mean"]
)
def test_aligned_gm_mode_matches_oracle(method, gm):
    """Group-major (gm) plans — register-carried group accumulator with
    boundary flushes — must agree with the chunk-major order and the
    oracle for every method, including NaN sources."""
    from xugrid_tpu.regrid.aligned_apply import (
        aligned_apply,
        plan_gather_aligned,
    )

    positive = method in ("harmonic_mean", "geometric_mean")
    indices, weights, source = make_case(
        n=2100, m=2500, w=8, nan_frac=0.1, positive=positive,
        seed=len(method),
    )
    plan = plan_gather_aligned(indices, weights, gm=gm)
    assert plan is not None and plan.gm is gm
    got = aligned_apply(source, plan, method, has_nan=True,
                        interpret=True)
    want = oracle_apply(method, indices, weights, source)
    np.testing.assert_allclose(got, want.T[: len(got[0])].T,
                               rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize(
    "shape", ["sparse_random", "longrun_spill", "wide_window",
              "multi_run_block", "tail_pad"]
)
def test_aligned_gm_adversarial_shapes(shape):
    """gm parity on the structural hard paths: spill rows riding the
    register accumulator, window runs splitting between groups, grid
    tail pads carrying the final group through the last flush, and
    automatic chunk-major fallback when a single group's chunk span
    defeats every window width."""
    from xugrid_tpu.regrid.aligned_apply import (
        aligned_apply,
        plan_gather_aligned,
    )

    rng = np.random.default_rng(23)
    if shape == "sparse_random":
        # group spans >> 64 chunks: gm must fall back to chunk-major
        n, m, w = 1400, 9000, 10
        indices = rng.integers(0, m, (n, w))
        weights = rng.uniform(0.1, 2, (n, w)).astype(np.float32)
    elif shape == "longrun_spill":
        n, m, w = 600, 5000, 40
        base = rng.integers(0, m // 128 - 1, n) * 128
        indices = base[:, None] + np.argsort(rng.random((n, w)), axis=1)
        weights = rng.uniform(0.1, 1, (n, w)).astype(np.float32)
    elif shape == "wide_window":
        n, w = 900, 60
        indices = (
            np.arange(w)[None] * 96 + rng.integers(0, 90, (n, 1))
        )
        m = int(indices.max()) + 1
        weights = rng.uniform(0.1, 1, (n, w)).astype(np.float32)
    elif shape == "multi_run_block":
        # per-block span > 64 chunks but each group's span is small:
        # gm holds, runs split between groups
        n, w = 1024, 6
        gidx = np.arange(n) // 128
        base = gidx * 128 * 30          # 30 chunks apart per group
        indices = base[:, None] + rng.integers(0, 200, (n, w))
        m = int(indices.max()) + 1
        weights = rng.uniform(0.1, 1, (n, w)).astype(np.float32)
    else:  # tail_pad
        n, w = 513, 5
        indices = rng.integers(0, 4000, (n, w) )
        indices[256:512] = -1
        m = 4000
        weights = np.where(
            indices >= 0, rng.uniform(0.1, 2, (n, w)), 0.0
        ).astype(np.float32)

    src = rng.normal(size=(3, m)).astype(np.float32) + 2
    src[rng.random(src.shape) < 0.1] = np.nan
    plan = plan_gather_aligned(indices, weights, gm=True)
    assert plan is not None
    if shape == "sparse_random":
        assert plan.gm is False          # fallback fired
    if shape == "multi_run_block":
        assert plan.gm is True
        assert len(np.unique(plan.winc0)) > 1    # runs actually split
    for method in ("mean", "min"):
        got = aligned_apply(src, plan, method, has_nan=True,
                            interpret=True)
        want = oracle_apply(method, indices, weights, src)
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_aligned_gm_plan_roundtrip():
    """gm plans decode back to exactly the input triplet set (the
    boundary/prev-group meta bits must not leak into the group)."""
    from xugrid_tpu.regrid.aligned_apply import (
        plan_gather_aligned,
        plan_triplets,
    )

    indices, weights, _ = make_case(n=2100, m=2500, w=8, seed=5)
    plan = plan_gather_aligned(indices, weights, gm=True)
    assert plan is not None and plan.gm
    ti, si, wi = plan_triplets(plan)
    got = sorted(zip(ti.tolist(), si.tolist(), wi.tolist()))
    rows, cols = np.nonzero(indices >= 0)
    want = sorted(
        zip(
            rows.tolist(),
            indices[rows, cols].tolist(),
            weights[rows, cols].tolist(),
        )
    )
    assert got == want


@pytest.mark.parametrize("span", [8, 16])
@pytest.mark.parametrize("method", ["mean", "sum", "min"])
def test_aligned_span_streaming_matches_oracle(method, span, monkeypatch):
    """Span-streamed plan tables (manual double-buffered DMA of
    itab/wtab, XUGRID_TPU_ALIGNED_SPAN) must reproduce the per-step
    BlockSpec path exactly — including spans that do not divide nsteps
    (per-call fallback to 0) and NaN sources."""
    from xugrid_tpu.regrid.aligned_apply import (
        aligned_apply,
        plan_gather_aligned,
    )

    indices, weights, source = make_case(
        n=2100, m=2500, w=8, nan_frac=0.1, seed=span * 7 + len(method),
    )
    plan = plan_gather_aligned(indices, weights)
    assert plan is not None
    assert plan.nsteps % 16 == 0  # the planner's pow2 padding contract
    monkeypatch.setenv("XUGRID_TPU_ALIGNED_SPAN", str(span))
    got = aligned_apply(source, plan, method, has_nan=True,
                        interpret=True)
    want = oracle_apply(method, indices, weights, source)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_cg_gather_handles_gm_plan(monkeypatch):
    """The fused PCG matvec must accept a group-major aligned plan
    (the gm static flows through the solve jit).  cg_solve plans
    internally via plan_default, so the scenario is pinned through the
    engine env vars (the established pattern from
    test_review_regressions.TestRound3ReviewFindings)."""
    monkeypatch.setenv("XUGRID_TPU_CG", "windowed")
    monkeypatch.setenv("XUGRID_TPU_CG_GATHER", "force")
    monkeypatch.setenv("XUGRID_TPU_GATHER_ENGINE", "aligned")
    monkeypatch.setenv("XUGRID_TPU_ALIGNED_GM", "1")
    from xugrid_tpu.regrid.aligned_apply import AlignedPlan
    from xugrid_tpu.ugrid.interpolate import _GATHER_PLANS, cg_solve

    rng = np.random.default_rng(7)
    n = 700
    # SPD diag-dominant path-graph Laplacian in the COO layout cg_solve
    # requires: [offdiag..., diag...] with the diagonal at the tail.
    lo = np.arange(1, n)
    hi = np.arange(n - 1)
    rows = np.concatenate([lo, hi, np.arange(n)])
    cols = np.concatenate([lo - 1, hi + 1, np.arange(n)])
    vals = np.concatenate(
        [np.full(n - 1, -1.0), np.full(n - 1, -1.0), np.full(n, 4.0)]
    )
    diag = np.full(n, 4.0)
    b = rng.normal(size=n)
    _GATHER_PLANS.clear()
    x, iters = cg_solve(
        rows, cols, vals, diag, b, np.zeros(n),
        rtol=1e-6, atol=0.0, maxiter=300,
    )
    # The internally cached plan must actually be the gm variant
    # (cache entries are dicts since the round-5 device-table cache).
    (entry,) = _GATHER_PLANS.values()
    plan = entry["plan"]
    assert isinstance(plan, AlignedPlan) and plan.gm
    # residual check against the dense operator
    A = np.zeros((n, n))
    A[rows, cols] += vals
    assert np.linalg.norm(A @ x - b) <= 1e-3 * np.linalg.norm(b)


def make_matvec_case(n, m, w, seed=0, band=None):
    """Random sparse (n, m) window system with signed weights, ragged
    rows, a few empty rows, and (optionally) banded columns so the
    packed planner sees realistic superchunk locality."""
    rng = np.random.default_rng(seed)
    if band is None:
        cols = rng.integers(0, m, size=(n, w))
    else:
        base = (np.arange(n) * m) // n
        cols = np.clip(
            base[:, None] + rng.integers(-band, band + 1, (n, w)),
            0, m - 1,
        )
    # dedupe within a row (duplicate (row, col) pairs are legal for
    # the plan, but a unique set makes the dense oracle trivial)
    keep = rng.integers(1, w + 1, size=n)
    mask = np.arange(w)[None, :] < keep[:, None]
    empty = rng.random(n) < 0.03
    mask[empty] = False
    indices = np.where(mask, cols, -1).astype(np.int64)
    weights = np.where(
        mask, rng.normal(size=(n, w)), 0.0
    ).astype(np.float32)
    return indices, weights


def dense_matvec_oracle(indices, weights, x):
    n, w = indices.shape
    out = np.zeros(n, np.float64)
    r, c = np.nonzero(indices >= 0)
    np.add.at(
        out, r, weights[r, c].astype(np.float64) * x[indices[r, c]]
    )
    return out


@pytest.mark.parametrize("qs", [1, 2, 3])
@pytest.mark.parametrize(
    "shape",
    [
        (700, 900, 5, None),      # scattered columns, spills at qs=1
        (2100, 2600, 7, 40),      # banded, multi-block
        (513, 5000, 3, None),     # wide source, window splits
    ],
)
def test_packed_matvec_matches_oracle(qs, shape):
    """The packed-superchunk matvec kernel (one (1, N) source row
    reshaped to (N//1024, 8, 128) superchunks; per-sublane tables)
    must reproduce the dense SpMV, spills and empty blocks included."""
    from xugrid_tpu.regrid.aligned_apply import (
        matvec_apply,
        plan_gather_matvec,
    )

    n, m, w, band = shape
    indices, weights = make_matvec_case(n, m, w, seed=qs, band=band)
    plan = plan_gather_matvec(indices, weights, qs=qs)
    assert plan is not None and plan.qs == qs
    rng = np.random.default_rng(1)
    x = rng.normal(size=m).astype(np.float32)
    got = matvec_apply(x, plan, interpret=True)
    want = dense_matvec_oracle(indices, weights, x)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_packed_matvec_plan_roundtrip():
    """matvec_triplets decodes the packed plan back to exactly the
    input (target, source, weight) triplet multiset."""
    from xugrid_tpu.regrid.aligned_apply import (
        matvec_triplets,
        plan_gather_matvec,
    )

    indices, weights = make_matvec_case(1500, 3000, 9, seed=11)
    plan = plan_gather_matvec(indices, weights, qs=2)
    assert plan is not None
    ti, si, wi = matvec_triplets(plan)
    keep = ti < 1500
    got = sorted(
        zip(ti[keep].tolist(), si[keep].tolist(), wi[keep].tolist())
    )
    r, c = np.nonzero(indices >= 0)
    want = sorted(
        zip(r.tolist(), indices[r, c].tolist(), weights[r, c].tolist())
    )
    assert got == want


def test_packed_matvec_span_streaming(monkeypatch):
    """Span-streamed plan tables must match the per-step BlockSpec
    path on a system large enough that nsteps is a span multiple."""
    from xugrid_tpu.regrid.aligned_apply import (
        matvec_apply,
        plan_gather_matvec,
    )

    indices, weights = make_matvec_case(4200, 4200, 6, seed=3, band=60)
    plan = plan_gather_matvec(indices, weights, qs=2)
    assert plan is not None and plan.nsteps % 16 == 0
    x = np.random.default_rng(2).normal(size=4200).astype(np.float32)
    monkeypatch.setenv("XUGRID_TPU_ALIGNED_SPAN", "0")
    base = matvec_apply(x, plan, interpret=True)
    monkeypatch.setenv("XUGRID_TPU_ALIGNED_SPAN", "16")
    spanned = matvec_apply(x, plan, interpret=True)
    np.testing.assert_allclose(spanned, base, rtol=1e-6, atol=1e-6)


def test_cg_gather_handles_packed_plan(monkeypatch):
    """Single-RHS cg_solve must build the packed matvec plan (qs > 0)
    when OPTED IN via XUGRID_TPU_CG_PACKED=1 (it measured 3.3x slower
    than the plain aligned plan on chip, so auto-dispatch never picks
    it) and converge; an explicit engine pin must keep winning
    (covered by test_cg_gather_handles_gm_plan)."""
    monkeypatch.setenv("XUGRID_TPU_CG", "windowed")
    monkeypatch.setenv("XUGRID_TPU_CG_GATHER", "force")
    monkeypatch.setenv("XUGRID_TPU_CG_PACKED", "1")
    monkeypatch.delenv("XUGRID_TPU_GATHER_ENGINE", raising=False)
    from xugrid_tpu.regrid.aligned_apply import AlignedPlan
    from xugrid_tpu.ugrid.interpolate import _GATHER_PLANS, cg_solve

    rng = np.random.default_rng(9)
    n = 1300
    lo = np.arange(1, n)
    hi = np.arange(n - 1)
    rows = np.concatenate([lo, hi, np.arange(n)])
    cols = np.concatenate([lo - 1, hi + 1, np.arange(n)])
    vals = np.concatenate(
        [np.full(n - 1, -1.0), np.full(n - 1, -1.0), np.full(n, 4.0)]
    )
    diag = np.full(n, 4.0)
    b = rng.normal(size=n)
    _GATHER_PLANS.clear()
    x, iters = cg_solve(
        rows, cols, vals, diag, b, np.zeros(n),
        rtol=1e-6, atol=0.0, maxiter=300,
    )
    (entry,) = _GATHER_PLANS.values()
    plan = entry["plan"]
    assert isinstance(plan, AlignedPlan) and plan.qs > 0
    A = np.zeros((n, n))
    A[rows, cols] += vals
    assert np.linalg.norm(A @ x - b) <= 1e-3 * np.linalg.norm(b)
    # Multi-RHS systems must keep the standard (sublane-batched) plan.
    _GATHER_PLANS.clear()
    b2 = rng.normal(size=(3, n))
    x2, _ = cg_solve(
        rows, cols, vals, diag, b2, np.zeros((3, n)),
        rtol=1e-6, atol=0.0, maxiter=300,
    )
    (entry2,) = _GATHER_PLANS.values()
    plan2 = entry2["plan"]
    assert getattr(plan2, "qs", 0) == 0
    assert np.linalg.norm(A @ x2[0] - b2[0]) <= 1e-3 * np.linalg.norm(
        b2[0]
    )
