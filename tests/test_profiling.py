"""Observability: timing registry and the Pallas apply kernel.

The reference has no profiling layer (SURVEY.md §5 green-field); these
tests cover the TimingRegistry plumbing and the interpret-mode
correctness of the tiled Pallas regrid-apply kernel.
"""

import numpy as np
import pytest

from xugrid_tpu.utils.profiling import TimingRegistry, timings


def test_timing_registry():
    reg = TimingRegistry()
    with reg.timed("stage.a"):
        pass
    with reg.timed("stage.a"):
        pass
    reg.record("stage.b", 0.5)
    summary = reg.summary()
    assert summary["stage.a"]["count"] == 2
    assert summary["stage.b"]["total_s"] == 0.5
    report = reg.report()
    assert "stage.a" in report and "stage.b" in report
    reg.reset()
    assert reg.summary() == {}


def test_global_registry_instrumented_by_grid_hash():
    from xugrid_tpu.spatial.grid_hash import GridHash

    timings.reset()
    boxes = np.array([[0.0, 0.0, 1.0, 1.0], [1.0, 0.0, 2.0, 1.0]])
    gh = GridHash(boxes)
    gh.query_points(np.array([[0.5, 0.5]]))
    gh.query_boxes(np.array([[0.0, 0.0, 2.0, 1.0]]))
    summary = timings.summary()
    assert "grid_hash.build" in summary
    assert "grid_hash.query_points" in summary
    assert "grid_hash.query_boxes" in summary
    timings.reset()


def test_native_grid_hash_matches_numpy():
    """Native counting-sort binning must be bit-identical to numpy."""
    from xugrid_tpu.spatial.grid_hash import GridHash
    from xugrid_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(3)
    lo = rng.uniform(0, 100, (500, 2))
    size = rng.uniform(0.1, 3.0, (500, 2))
    boxes = np.column_stack([lo, lo + size])

    gh_native = GridHash(boxes)
    lib = native._LIB
    native._LIB = None
    try:
        gh_numpy = GridHash(boxes)
    finally:
        native._LIB = lib
    np.testing.assert_array_equal(gh_native.bin_start, gh_numpy.bin_start)
    np.testing.assert_array_equal(gh_native.bin_prims, gh_numpy.bin_prims)

    queries = np.column_stack(
        [rng.uniform(0, 100, (200, 2)), rng.uniform(0, 100, (200, 2))]
    )
    queries = np.column_stack(
        [
            np.minimum(queries[:, :2], queries[:, 2:]),
            np.maximum(queries[:, :2], queries[:, 2:]),
        ]
    )
    q1, p1 = gh_native.query_boxes(queries)
    q2, p2 = gh_numpy.query_boxes(queries)
    np.testing.assert_array_equal(q1, q2)
    np.testing.assert_array_equal(p1, p2)

    # Point queries: native path emits in bin order, numpy path sorted;
    # compare as sets of pairs, with a tolerance that straddles cells.
    pts = rng.uniform(-1, 101, (300, 2))
    pts[7] = np.nan
    for tol in (0.0, 0.05, 2.0):
        q1, p1 = gh_native.query_points(pts, tol)
        native._LIB = None
        try:
            q2, p2 = gh_numpy.query_points(pts, tol)
        finally:
            native._LIB = lib
        key1 = np.sort(q1.astype(np.int64) * len(boxes) + p1)
        key2 = np.sort(q2.astype(np.int64) * len(boxes) + p2)
        np.testing.assert_array_equal(key1, key2)


def test_native_face_bbox_matches_numpy():
    from xugrid_tpu.spatial.bvh import face_bounding_boxes
    from xugrid_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(4)
    nodes = rng.uniform(0, 10, (50, 2))
    faces = rng.integers(0, 50, (30, 4)).astype(np.int64)
    faces[::3, 3] = -1  # triangles
    got = face_bounding_boxes(faces, nodes[:, 0], nodes[:, 1])
    lib = native._LIB
    native._LIB = None
    try:
        want = face_bounding_boxes(faces, nodes[:, 0], nodes[:, 1])
    finally:
        native._LIB = lib
    np.testing.assert_allclose(got, want)


class TestPallasApply:
    def _case(self, n=2048, w=7, m=3000, E=8, seed=0):
        rng = np.random.default_rng(seed)
        sourceT = rng.normal(size=(m, E)).astype(np.float32)
        base = (np.arange(n) * (m / n)).astype(np.int64)
        indices = np.clip(
            base[:, None] + rng.integers(-20, 20, size=(n, w)), 0, m - 1
        ).astype(np.int32)
        indices[rng.random((n, w)) < 0.2] = -1
        weights = rng.random((n, w)).astype(np.float32)
        weights[indices < 0] = 0.0
        return sourceT, indices, weights

    def _reference(self, sourceT, indices, weights):
        m = sourceT.shape[0]
        valid = indices >= 0
        wv = np.where(valid, weights, 0.0)
        num = np.einsum("nw,nwe->ne", wv, sourceT[np.clip(indices, 0, m - 1)])
        den = wv.sum(axis=1, keepdims=True)
        return np.where(den > 0, num / np.where(den == 0, 1.0, den), np.nan)

    def test_plan_blocks(self):
        from xugrid_tpu.regrid.pallas_apply import plan_auto, plan_blocks

        sourceT, indices, weights = self._case()
        starts, ok = plan_blocks(indices, 256, 512)
        assert ok
        assert len(starts) == 2048 // 256
        # Tile smaller than the block span: must report not-ok.
        _, ok_small = plan_blocks(indices, 2048, 64)
        assert not ok_small
        # Auto planner: per-block slab counts and per-slab slot ranges.
        plan = plan_auto(indices, weights, block=256)
        assert plan is not None
        assert len(plan.starts) == len(starts)
        assert (plan.n_subs >= 1).all()
        assert plan.j_lo.shape == plan.j_hi.shape
        assert plan.j_lo.shape[0] == len(starts)
        assert (plan.j_hi >= plan.j_lo).all()
        assert (plan.j_hi <= indices.shape[1]).all()
        # Windows are re-sorted by source index inside the plan.
        key = np.where(plan.indices < 0, np.iinfo(np.int32).max, plan.indices)
        assert (np.diff(key, axis=1) >= 0).all()
        # Scattered indices (no locality): auto planner declines.
        rng = np.random.default_rng(1)
        scattered = rng.integers(0, 10**6, size=(2048, 7)).astype(np.int32)
        assert plan_auto(scattered, block=256) is None

    def test_plan_sort_keeps_pairs(self):
        from xugrid_tpu.regrid.pallas_apply import plan_auto

        _, indices, weights = self._case()
        plan = plan_auto(indices, weights, block=256)
        # (index, weight) pairs survive the per-row sort.
        orig = {
            (r, int(i), float(w))
            for r, (ri, rw) in enumerate(zip(indices, weights))
            for i, w in zip(ri, rw)
            if i >= 0
        }
        new = {
            (r, int(i), float(w))
            for r, (ri, rw) in enumerate(zip(plan.indices, plan.weights))
            for i, w in zip(ri, rw)
            if i >= 0
        }
        assert orig == new

    def test_interpret_matches_reference(self):
        from xugrid_tpu.regrid.pallas_apply import apply_windowed_mean_pallas

        sourceT, indices, weights = self._case()
        out = apply_windowed_mean_pallas(
            sourceT, indices, weights, block=256, interpret=True
        )
        assert out is not None
        ref = self._reference(sourceT, indices, weights)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_duplicate_indices_accumulate(self):
        from xugrid_tpu.regrid.pallas_apply import apply_windowed_mean_pallas

        sourceT, indices, weights = self._case(n=256, w=4, m=400)
        indices[:, 1] = indices[:, 0]  # duplicate slot
        weights[indices < 0] = 0.0
        out = apply_windowed_mean_pallas(
            sourceT, indices, weights, block=128, tile=512, interpret=True
        )
        ref = self._reference(sourceT, indices, weights)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_poor_locality_returns_none(self):
        from xugrid_tpu.regrid.pallas_apply import apply_windowed_mean_pallas

        rng = np.random.default_rng(5)
        m = 500_000
        sourceT = rng.normal(size=(64, 8)).astype(np.float32)
        indices = rng.integers(0, m, size=(2048, 7)).astype(np.int32)
        weights = rng.random((2048, 7)).astype(np.float32)
        out = apply_windowed_mean_pallas(
            sourceT, indices, weights, block=256, interpret=True
        )
        assert out is None


class TestPallasMethods:
    """Equivalence of every Pallas reduction method vs the XLA path,
    including NaN-bearing sources (the masked-matmul formulation)."""

    METHODS = {
        "mean": "mean",
        "sum": "sum",
        "first_order_conservative": "first_order_conservative",
        "conductance": "conductance",
        "harmonic_mean": "harmonic_mean",
        "geometric_mean": "geometric_mean",
    }

    def _case(self, n=1024, w=6, m=1500, E=8, seed=7, nan_frac=0.15,
              positive=False):
        rng = np.random.default_rng(seed)
        if positive:
            sourceT = rng.uniform(0.5, 4.0, size=(m, E)).astype(np.float32)
        else:
            sourceT = rng.normal(size=(m, E)).astype(np.float32)
        sourceT[rng.random((m, E)) < nan_frac] = np.nan
        base = (np.arange(n) * (m / n)).astype(np.int64)
        indices = np.clip(
            base[:, None] + rng.integers(-15, 15, size=(n, w)), 0, m - 1
        ).astype(np.int32)
        indices[rng.random((n, w)) < 0.25] = -1
        # Left-justify windows (PaddedCSR contract: right-padded rows).
        order = np.argsort(indices < 0, axis=1, kind="stable")
        indices = np.take_along_axis(indices, order, axis=1)
        weights = rng.random((n, w)).astype(np.float32)
        weights[indices < 0] = 0.0
        return sourceT, indices, weights

    def _xla_reference(self, sourceT, indices, weights, method):
        import jax.numpy as jnp

        from xugrid_tpu.regrid import reduce as reductions
        from xugrid_tpu.regrid.apply import _apply_windowed_T

        fn = getattr(reductions, {"sum": "sum"}.get(method, method))
        out = _apply_windowed_T(
            jnp.asarray(sourceT.astype(np.float64)),
            jnp.asarray(indices),
            jnp.asarray(weights.astype(np.float64)),
            fn,
        )
        return np.asarray(out)

    @pytest.mark.parametrize("method", sorted(METHODS))
    def test_method_matches_xla_with_nans(self, method):
        from xugrid_tpu.regrid.pallas_apply import apply_windowed_pallas

        sourceT, indices, weights = self._case(
            positive=(method in ("harmonic_mean", "geometric_mean"))
        )
        out = apply_windowed_pallas(
            sourceT, indices, weights, method,
            block=256, interpret=True,
        )
        assert out is not None
        ref = self._xla_reference(sourceT, indices, weights, method)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=5e-5)

    def test_geometric_mean_negative_values_nan(self):
        from xugrid_tpu.regrid.pallas_apply import apply_windowed_pallas

        sourceT, indices, weights = self._case(positive=True)
        sourceT[40, :] = -2.0  # a negative value poisons its windows
        out = apply_windowed_pallas(
            sourceT, indices, weights, "geometric_mean",
            block=256, interpret=True,
        )
        ref = self._xla_reference(sourceT, indices, weights, "geometric_mean")
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=5e-5)

    def test_all_nan_window_is_nan(self):
        from xugrid_tpu.regrid.pallas_apply import apply_windowed_pallas

        sourceT, indices, weights = self._case()
        sourceT[:50] = np.nan  # rows 0..n use sources near their index
        out = apply_windowed_pallas(
            sourceT, indices, weights, "mean",
            block=256, interpret=True,
        )
        ref = self._xla_reference(sourceT, indices, weights, "mean")
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=5e-5)
        assert np.isnan(out).any()

    def test_unknown_method_returns_none(self):
        from xugrid_tpu.regrid.pallas_apply import apply_windowed_pallas

        sourceT, indices, weights = self._case()
        assert (
            apply_windowed_pallas(sourceT, indices, weights, "median")
            is None
        )
