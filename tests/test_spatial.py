"""Spatial index (BVH celltree) tests against analytic grids."""

import numpy as np
import pytest

from xugrid_tpu.spatial import CellTree2d, EdgeCellTree2d, build_bvh
from xugrid_tpu.spatial.bvh import face_bounding_boxes, morton_order


def quad_grid(nx, ny, dx=1.0, x0=0.0, y0=0.0):
    """Regular quad mesh; returns (vertices (n,2), faces (nx*ny, 4))."""
    x = x0 + np.arange(nx + 1) * dx
    y = y0 + np.arange(ny + 1) * dx
    yy, xx = np.meshgrid(y, x, indexing="ij")
    vertices = np.column_stack([xx.ravel(), yy.ravel()])

    def nid(i, j):
        return j * (nx + 1) + i

    faces = np.array(
        [
            [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)]
            for j in range(ny)
            for i in range(nx)
        ]
    )
    return vertices, faces


class TestBVH:
    def test_build_shapes(self):
        vertices, faces = quad_grid(4, 4)
        boxes = face_bounding_boxes(faces, vertices[:, 0], vertices[:, 1])
        bvh = build_bvh(boxes, leaf_size=2)
        assert bvh.n_leaves == 8
        assert bvh.n_nodes == 15
        # root covers everything
        assert np.allclose(bvh.node_bbox[0], [0, 0, 4, 4])
        # all prims present exactly once
        prims = bvh.prim_index[bvh.prim_index >= 0]
        assert sorted(prims) == list(range(16))

    def test_skip_links(self):
        vertices, faces = quad_grid(2, 2)
        boxes = face_bounding_boxes(faces, vertices[:, 0], vertices[:, 1])
        bvh = build_bvh(boxes, leaf_size=1)
        # skip[root] == sentinel; left child's skip is the right sibling
        assert bvh.skip[0] == bvh.n_nodes
        assert bvh.skip[1] == 2
        assert bvh.skip[2] == bvh.n_nodes

    def test_morton_order_locality(self):
        rng = np.random.default_rng(0)
        xy = rng.uniform(0, 100, (1000, 2))
        order = morton_order(xy)
        sorted_xy = xy[order]
        jumps = np.linalg.norm(np.diff(sorted_xy, axis=0), axis=1)
        random_jumps = np.linalg.norm(np.diff(xy, axis=0), axis=1)
        assert jumps.mean() < 0.5 * random_jumps.mean()


class TestCellTree2d:
    @pytest.fixture(scope="class")
    def tree(self):
        vertices, faces = quad_grid(10, 10)
        return CellTree2d(vertices, faces, -1)

    def test_locate_points_inside(self, tree):
        # centers of cells (i, j) -> face j*10 + i
        points = np.array([[0.5, 0.5], [5.5, 0.5], [9.5, 9.5], [2.5, 7.5]])
        expected = np.array([0, 5, 99, 72])
        assert np.array_equal(tree.locate_points(points), expected)

    def test_locate_points_outside(self, tree):
        points = np.array([[-1.0, 5.0], [11.0, 5.0], [5.0, -0.5]])
        assert np.array_equal(tree.locate_points(points), [-1, -1, -1])

    def test_locate_points_on_boundary(self, tree):
        # A node point: belongs to some face (tolerance catches it)
        points = np.array([[5.0, 5.0]])
        result = tree.locate_points(points)
        assert result[0] != -1

    def test_locate_many_random(self, tree):
        rng = np.random.default_rng(42)
        pts = rng.uniform(0.001, 9.999, (5000, 2))
        found = tree.locate_points(pts)
        expected = np.floor(pts[:, 1]).astype(int) * 10 + np.floor(
            pts[:, 0]
        ).astype(int)
        assert np.array_equal(found, expected)

    def test_intersect_edges(self, tree):
        # horizontal line through the middle of row 3
        edges = np.array([[[-1.0, 3.5], [11.0, 3.5]]])
        edge_index, face_index, xy = tree.intersect_edges(edges)
        assert (edge_index == 0).all()
        assert sorted(face_index) == list(range(30, 40))
        # each clipped segment has length 1 (cell width)
        lengths = np.linalg.norm(xy[:, 1] - xy[:, 0], axis=1)
        assert np.allclose(lengths, 1.0)

    def test_intersect_edges_diagonal(self, tree):
        edges = np.array([[[0.0, 0.0], [10.0, 10.0]]])
        _, face_index, xy = tree.intersect_edges(edges)
        # the diagonal passes through the 10 diagonal cells
        diag = set(range(0, 100, 11))
        assert diag <= set(face_index)
        lengths = np.linalg.norm(xy[:, 1] - xy[:, 0], axis=1)
        total = lengths.sum()
        assert np.isclose(total, np.sqrt(2) * 10, atol=1e-6)

    def test_intersect_faces(self, tree):
        # Offset grid by 0.5 in x and y: every interior query cell
        # overlaps 4 tree cells with area 0.25 each.
        vertices, faces = quad_grid(2, 2, x0=3.5, y0=3.5)
        qi, ti, area = tree.intersect_faces(vertices, faces, -1)
        assert np.allclose(area, 0.25)
        assert len(qi) == 4 * 4
        # total overlap equals total query area
        assert np.isclose(area.sum(), 4.0)

    def test_intersect_faces_identity(self, tree):
        vertices, faces = quad_grid(10, 10)
        qi, ti, area = tree.intersect_faces(vertices, faces, -1)
        exact = qi == ti
        assert np.allclose(area[exact], 1.0)
        assert np.isclose(area.sum(), 100.0)

    def test_barycentric_weights(self, tree):
        # Linear precision: interpolating f(x, y) = 2x + 3y + 1 from the
        # vertices must be exact.
        rng = np.random.default_rng(1)
        pts = rng.uniform(0.01, 9.99, (100, 2))
        face_index, weights = tree.compute_barycentric_weights(pts)
        assert (face_index >= 0).all()
        f = lambda xy: 2 * xy[..., 0] + 3 * xy[..., 1] + 1
        conn = tree.faces[face_index]
        corner_values = f(tree.vertices)[np.where(conn == -1, 0, conn)]
        corner_values = np.where(conn == -1, 0.0, corner_values)
        interpolated = (weights * corner_values).sum(axis=1)
        assert np.allclose(interpolated, f(pts), atol=1e-9)

    def test_triangles(self):
        vertices = np.array(
            [[0.0, 0.0], [2.0, 0.0], [1.0, 2.0], [3.0, 2.0]]
        )
        faces = np.array([[0, 1, 2], [1, 3, 2]])
        tree = CellTree2d(vertices, faces, -1)
        assert np.array_equal(
            tree.locate_points(np.array([[1.0, 0.5], [2.0, 1.5], [0.1, 1.9]])),
            [0, 1, -1],
        )
        fi, w = tree.compute_barycentric_weights(np.array([[1.0, 2.0 / 3.0]]))
        # centroid of triangle 0: equal weights
        assert fi[0] == 0
        assert np.allclose(w[0], [1 / 3, 1 / 3, 1 / 3], atol=1e-9)


class TestEdgeCellTree2d:
    @pytest.fixture(scope="class")
    def tree(self):
        # zigzag network: (0,0) -> (1,1) -> (2,0) -> (3,1)
        vertices = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0], [3.0, 1.0]])
        edges = np.array([[0, 1], [1, 2], [2, 3]])
        return EdgeCellTree2d(vertices, edges)

    def test_locate_points(self, tree):
        points = np.array([[0.5, 0.5], [1.5, 0.5], [2.5, 0.5], [0.5, 0.6]])
        result = tree.locate_points(points, tolerance=1e-9)
        assert np.array_equal(result, [0, 1, 2, -1])

    def test_intersect_edges(self, tree):
        # vertical line at x = 0.5 crosses edge 0 at (0.5, 0.5)
        segs = np.array([[[0.5, -1.0], [0.5, 2.0]]])
        qi, ti, pts = tree.intersect_edges(segs)
        assert np.array_equal(ti, [0])
        assert np.allclose(pts, [[0.5, 0.5]])

    def test_intersect_edges_multi(self, tree):
        # horizontal line at y = 0.5 crosses all three edges
        segs = np.array([[[-1.0, 0.5], [4.0, 0.5]]])
        qi, ti, pts = tree.intersect_edges(segs)
        assert sorted(ti) == [0, 1, 2]
        assert np.allclose(sorted(pts[:, 0]), [0.5, 1.5, 2.5])


class TestMixedScaleOverlap:
    def test_small_face_overlap_survives_large_face_tolerance(self):
        # A mesh mixing a 1000-unit face with a 1e-3-unit face: the
        # sliver threshold must scale per pair, not with the global max
        # bbox diagonal (which would discard the tiny face's entire
        # ~1e-6 overlap area).
        vertices = np.array(
            [
                [0.0, 0.0],
                [1000.0, 0.0],
                [1000.0, 1000.0],
                [0.0, 1000.0],
                [2000.0, 2000.0],
                [2000.001, 2000.0],
                [2000.001, 2000.001],
                [2000.0, 2000.001],
            ]
        )
        faces = np.array([[0, 1, 2, 3], [4, 5, 6, 7]])
        tree = CellTree2d(vertices, faces)
        qi, ti, area = tree.intersect_faces(vertices, faces[1:], -1)
        assert 1 in ti
        pair_area = area[ti == 1]
        # f64 clipping at coordinate magnitude ~2000 rounds the 1e-6
        # area at the ~1e-10 level.
        np.testing.assert_allclose(pair_area, [1e-6], rtol=1e-3)
