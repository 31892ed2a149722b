"""
Native/fallback equivalence: every csrc kernel must agree exactly with
its numpy/device fallback.  Guards the dual-path design of the spatial
layer (grid hash, exact tests, clip areas, padding).
"""

import numpy as np
import pytest

import xugrid_tpu.utils.native as native_mod
from xugrid_tpu.spatial.celltree import CellTree2d
from xugrid_tpu.spatial.grid_hash import GridHash


@pytest.fixture
def no_native(monkeypatch):
    """Disable every native entry point (forces fallbacks)."""
    for name in [
        "pad_and_bbox_native",
        "face_bbox_native",
        "kd_order_native",
        "grid_hash_bins_native",
        "grid_hash_query_points_native",
        "grid_hash_query_boxes_native",
        "polygon_clip_areas_native",
        "polygon_clip_areas_conn_native",
        "points_in_polygons_native",
        "clip_segments_by_faces_native",
        "locate_points_hash_native",
        "mean_value_weights_native",
    ]:
        monkeypatch.setattr(native_mod, name, lambda *a, **k: None)
    yield


def jittered_mesh(n_side=12, seed=3):
    rng = np.random.default_rng(seed)
    x = np.arange(n_side + 1.0)
    yy, xx = np.meshgrid(x, x, indexing="ij")
    verts = np.column_stack([xx.ravel(), yy.ravel()])
    jitter = rng.uniform(-0.2, 0.2, verts.shape)
    edge = (
        (verts[:, 0] == 0)
        | (verts[:, 1] == 0)
        | (verts[:, 0] == n_side)
        | (verts[:, 1] == n_side)
    )
    jitter[edge] = 0.0
    verts = verts + jitter
    j, i = np.meshgrid(np.arange(n_side), np.arange(n_side), indexing="ij")
    nid = lambda ii, jj: jj * (n_side + 1) + ii  # noqa: E731
    faces = np.stack(
        [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)], axis=-1
    ).reshape(-1, 4)
    return verts, faces


pytestmark = pytest.mark.skipif(
    native_mod.get_lib() is None, reason="native library unavailable"
)


class TestNativeFallbackEquivalence:
    def test_locate_points(self, no_native):
        verts, faces = jittered_mesh()
        rng = np.random.default_rng(0)
        pts = rng.uniform(-0.5, 12.5, (500, 2))
        fallback_tree = CellTree2d(verts, faces)
        fallback = fallback_tree.locate_points(pts)
        # Fresh modules with native enabled.
        native_tree = _native_tree(verts, faces)
        native = native_tree.locate_points(pts)
        np.testing.assert_array_equal(fallback, native)

    def test_intersect_edges(self, no_native):
        verts, faces = jittered_mesh()
        rng = np.random.default_rng(1)
        edges = rng.uniform(0.0, 12.0, (60, 2, 2))
        fallback_tree = CellTree2d(verts, faces)
        fe, ff, fx = fallback_tree.intersect_edges(edges)
        native_tree = _native_tree(verts, faces)
        ne, nf, nx = native_tree.intersect_edges(edges)
        f_key = np.lexsort((ff, fe))
        n_key = np.lexsort((nf, ne))
        np.testing.assert_array_equal(fe[f_key], ne[n_key])
        np.testing.assert_array_equal(ff[f_key], nf[n_key])
        np.testing.assert_allclose(fx[f_key], nx[n_key], atol=1e-12)

    def test_intersect_faces(self, no_native):
        verts, faces = jittered_mesh()
        qverts, qfaces = jittered_mesh(6, seed=9)
        qverts = qverts * 2.0  # cover the domain with bigger cells
        fallback_tree = CellTree2d(verts, faces)
        fq, fp, fa = fallback_tree.intersect_faces(qverts, qfaces, -1)
        native_tree = _native_tree(verts, faces)
        nq, npp, na = native_tree.intersect_faces(qverts, qfaces, -1)
        f_key = np.lexsort((fp, fq))
        n_key = np.lexsort((npp, nq))
        np.testing.assert_array_equal(fq[f_key], nq[n_key])
        np.testing.assert_array_equal(fp[f_key], npp[n_key])
        # The SH clip and the angle-sort shoelace take different FP paths;
        # degenerate slivers can differ at ~1e-9 relative.
        np.testing.assert_allclose(fa[f_key], na[n_key], rtol=1e-6, atol=1e-12)

    def test_barycentric_weights(self, no_native):
        verts, faces = jittered_mesh()
        rng = np.random.default_rng(4)
        pts = rng.uniform(0.5, 11.5, (200, 2))
        fallback_tree = CellTree2d(verts, faces)
        ff, fw = fallback_tree.compute_barycentric_weights(pts)
        native_tree = _native_tree(verts, faces)
        nf, nw = native_tree.compute_barycentric_weights(pts)
        np.testing.assert_array_equal(ff, nf)
        np.testing.assert_allclose(fw, nw, atol=1e-10)

    def test_grid_hash_query_boxes(self, no_native):
        verts, faces = jittered_mesh()
        fallback_tree = CellTree2d(verts, faces)
        rng = np.random.default_rng(2)
        c = rng.uniform(0, 12, (200, 2))
        w = rng.uniform(0.1, 1.5, (200, 2))
        boxes = np.column_stack([c - w, c + w])
        fq, fp = fallback_tree.grid_hash.query_boxes(boxes)
        native_tree = _native_tree(verts, faces)
        nq, npp = native_tree.grid_hash.query_boxes(boxes)
        n_prim = fallback_tree.n_face
        f_key = np.sort(fq.astype(np.int64) * n_prim + fp)
        n_key = np.sort(nq.astype(np.int64) * n_prim + npp)
        np.testing.assert_array_equal(f_key, n_key)

    def test_pad_and_bbox_degenerate_face(self):
        # An all-fill face row must yield a NaN bbox (no OOB read) like
        # the pure-numpy face_bbox path.
        importlib_reload_native()
        x = np.array([0.0, 1.0, 1.0, 0.0])
        y = np.array([0.0, 0.0, 1.0, 1.0])
        faces = np.array([[0, 1, 2, 3], [-1, -1, -1, -1]])
        out = native_mod.pad_and_bbox_native(faces, x, y)
        assert out is not None
        poly, bbox = out
        np.testing.assert_allclose(bbox[0], [0.0, 0.0, 1.0, 1.0])
        assert np.isnan(bbox[1]).all()
        assert (poly[1] == 0.0).all()

    def test_clip_areas_vertex_cap_guard(self):
        # Combined vertex count beyond the native kernel's working
        # buffer must fall back (return None) instead of silently
        # truncating the clip polygon.
        importlib_reload_native()
        q = np.zeros((1, 60, 2))
        t = np.zeros((1, 60, 2))
        out = native_mod.polygon_clip_areas_native(
            np.array([0]), np.array([0]), q, t
        )
        assert out is None
        out = native_mod.polygon_clip_areas_native(
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
            np.zeros((1, 48, 2)),
            np.zeros((1, 48, 2)),
        )
        assert out is not None


def importlib_reload_native():
    """Restore the real native module functions (undo monkeypatching)."""
    import importlib

    importlib.reload(native_mod)


def _native_tree(verts, faces):
    """CellTree2d built with the real native module functions."""
    importlib_reload_native()
    return CellTree2d(verts, faces)
