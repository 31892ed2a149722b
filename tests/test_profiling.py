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



