"""
Voronoi tessellation test suite.

Mirrors the reference scenarios (reference tests/test_voronoi.py: exact
exterior/interior centroid selection, projected exterior vertices,
topology assembly with/without exterior, degenerate projections,
isolated faces, concave handling) against xugrid_tpu/ugrid/voronoi.py.
"""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu.ugrid import connectivity, voronoi


def rowsort(a):
    return a[np.lexsort(a.T)]


def polygon_area(p):
    area = 0.0
    n = len(p)
    for i in range(n):
        v0 = p[i]
        v1 = p[(i + 1) % n]
        area += v0[0] * v1[1] - v0[1] * v1[0]
    return area


def mesh_area(vertices, faces):
    return 0.5 * abs(
        sum(polygon_area(vertices[face[face != -1]]) for face in faces)
    )


def test_angle_sort_rows():
    # A square's corners plus padding must come back CCW-sorted with
    # padding at the row tail.
    coords = np.array(
        [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]]
    )
    cand = np.array([[2, 0, -1, 3, 1]])
    anchors = np.zeros((1, 2))
    out = voronoi.angle_sort_rows(cand, coords, anchors)
    assert out.shape == (1, 5)
    assert np.array_equal(out[0], [3, 0, 1, 2, -1])


def test_angle_sort_rows_device_matches_host(monkeypatch):
    rng = np.random.default_rng(5)
    coords = rng.normal(size=(64, 2))
    cand = rng.integers(-1, 64, (32, 6))
    anchors = rng.normal(scale=0.01, size=(32, 2))
    monkeypatch.setenv("XUGRID_TPU_VORONOI", "host")
    host = voronoi.angle_sort_rows(cand, coords, anchors)
    monkeypatch.setenv("XUGRID_TPU_VORONOI", "device")
    device = voronoi.angle_sort_rows(cand, coords, anchors)
    assert np.array_equal(host, device)


def test_padded_row_areas():
    coords = np.array(
        [[0.0, 0.0], [2.0, 0.0], [2.0, 1.0], [0.0, 1.0]]
    )
    ids = np.array([[0, 1, 2, 3, -1], [0, 1, 2, -1, -1]])
    areas = voronoi.padded_row_areas(ids, coords)
    assert np.allclose(areas, [2.0, 1.0])


class TestVoronoi:
    """2-row, 3-column rectangular mesh; every expected array enumerated."""

    @pytest.fixture(autouse=True)
    def setup(self):
        self.vertices = np.array(
            [
                [0.0, 0.0],
                [1.0, 0.0],
                [2.0, 0.0],
                [3.0, 0.0],
                [0.0, 1.0],
                [1.0, 1.0],
                [2.0, 1.0],
                [3.0, 1.0],
                [0.0, 2.0],
                [1.0, 2.0],
                [2.0, 2.0],
                [3.0, 2.0],
            ]
        )
        self.face_node_connectivity = np.array(
            [
                [0, 1, 5, 4],
                [1, 2, 6, 5],
                [2, 3, 7, 6],
                [4, 5, 9, 8],
                [5, 6, 10, 9],
                [6, 7, 11, 10],
            ]
        )
        self.node_face_connectivity = connectivity.invert_dense_to_sparse(
            self.face_node_connectivity
        )
        (
            self.edge_node_connectivity,
            face_edge_connectivity,
        ) = connectivity.edge_connectivity(self.face_node_connectivity)
        self.edge_face_connectivity = connectivity.invert_dense(
            face_edge_connectivity
        )
        self.centroids = np.array(
            [
                [0.5, 0.5],
                [1.5, 0.5],
                [2.5, 0.5],
                [0.5, 1.5],
                [1.5, 1.5],
                [2.5, 1.5],
            ]
        )
        self.expected_vertices = rowsort(self.centroids)
        self.exterior_vertices = rowsort(
            np.array(
                [
                    [0.0, 0.5],
                    [0.0, 1.5],
                    [3.0, 0.5],
                    [3.0, 1.5],
                    [0.5, 0.0],
                    [1.5, 0.0],
                    [2.5, 0.0],
                    [0.5, 2.0],
                    [1.5, 2.0],
                    [2.5, 2.0],
                ]
            )
        )
        self.additional_vertices = rowsort(
            np.array(
                [
                    [0.0, 0.0],
                    [1.0, 0.0],
                    [2.0, 0.0],
                    [3.0, 0.0],
                    [0.0, 1.0],
                    [3.0, 1.0],
                    [0.0, 2.0],
                    [1.0, 2.0],
                    [2.0, 2.0],
                    [3.0, 2.0],
                ]
            )
        )

    def test_boundary_projections(self):
        bp = voronoi.boundary_projections(
            self.edge_face_connectivity,
            self.edge_node_connectivity,
            self.vertices,
            self.centroids,
        )
        # 10 boundary edges, each yielding one distinct projection.
        assert bp["proj"].shape == (10, 2)
        assert bp["keep"].all()
        assert np.allclose(rowsort(bp["proj"]), self.exterior_vertices)
        assert np.isin(np.arange(6), bp["face"]).all()
        # 10 boundary nodes (all but the interior 5 and 6), 2 slots each.
        expected_boundary = np.ones(12, dtype=bool)
        expected_boundary[[5, 6]] = False
        assert np.array_equal(bp["is_boundary_node"], expected_boundary)
        assert bp["node_slots"].shape == (12, 2)
        slots = bp["node_slots"]
        assert (slots[expected_boundary] >= 0).all()
        assert (slots[~expected_boundary] == -1).all()
        # Each projection is assigned to exactly its two endpoint nodes.
        counts = np.bincount(slots[slots >= 0], minlength=10)
        assert (counts == 2).all()

    def test_voronoi_topology_interior_only(self):
        vertices, faces, face_i, _ = voronoi.voronoi_topology(
            self.node_face_connectivity,
            self.vertices,
            self.centroids,
        )
        # Only the two interior nodes (5, 6) have >= 3 faces.
        assert faces.shape == (2, 4)
        assert np.allclose(rowsort(vertices), self.expected_vertices)
        assert np.array_equal(face_i, [0, 1, 2, 3, 4, 5])
        assert np.allclose(mesh_area(vertices, faces), 2.0)

    def test_voronoi_topology__add_exterior(self):
        with pytest.raises(
            ValueError, match="must be provided if add_exterior is True"
        ):
            voronoi.voronoi_topology(
                self.node_face_connectivity,
                self.vertices,
                self.centroids,
                add_exterior=True,
            )

        vertices, faces, face_i, _ = voronoi.voronoi_topology(
            self.node_face_connectivity,
            self.vertices,
            self.centroids,
            self.edge_face_connectivity,
            self.edge_node_connectivity,
            add_exterior=True,
        )
        expected = rowsort(
            np.concatenate([self.expected_vertices, self.exterior_vertices])
        )
        assert faces.shape == (12, 4)
        assert np.allclose(rowsort(vertices), expected)
        assert (face_i != -1).all()
        assert np.allclose(mesh_area(vertices, faces), 5.5)

    def test_voronoi_topology__add_exterior_and_vertices(self):
        vertices, faces, face_i, _ = voronoi.voronoi_topology(
            self.node_face_connectivity,
            self.vertices,
            self.centroids,
            self.edge_face_connectivity,
            self.edge_node_connectivity,
            add_exterior=True,
            add_vertices=True,
        )
        expected = rowsort(
            np.concatenate(
                [
                    self.expected_vertices,
                    self.exterior_vertices,
                    self.additional_vertices,
                ]
            )
        )
        # Original boundary vertices introduce hanging nodes.
        assert faces.shape == (12, 5)
        assert np.allclose(rowsort(vertices), expected)
        assert (face_i == -1).sum() == 10
        # Full original mesh area is recovered.
        assert np.allclose(mesh_area(vertices, faces), 6.0)


def test_projected_vertices_on_edge():
    # Circumcenter projections falling exactly on an edge must not create
    # zero-length edges (reference tests/test_voronoi.py:249-289).
    nodes = np.array(
        [
            [0.0, 0.0],
            [0.0, 2.0],
            [2.0, 2.0],
            [0.0, 2.0],
            [1.0, 1.0],
        ]
    )
    faces = np.array(
        [
            [0, 1, 4],
            [1, 2, 4],
            [2, 3, 4],
            [3, 0, 4],
        ]
    )
    grid = xu.Ugrid2d(nodes[:, 0], nodes[:, 1], -1, faces)
    voronoi_grid = grid.tesselate_circumcenter_voronoi()
    assert voronoi_grid.n_face == 5


def test_isolated_face():
    # A face attached to the rest of the mesh through a single node: its
    # corner nodes with < 3 faces cannot form interior voronoi cells.
    nodes = np.array(
        [
            [0.0, 0.0],
            [1.0, 0.0],
            [2.0, 0.0],
            [3.0, 0.0],
            [0.0, 1.0],
            [1.0, 1.0],
            [2.0, 1.0],
            [3.0, 1.0],
            [2.0, -1.0],
            [3.0, -1.0],
            [2.0, 2.0],
            [3.0, 2.0],
        ]
    )
    faces = np.array(
        [
            [0, 1, 5, 4],
            [1, 2, 6, 5],
            [2, 3, 7, 6],
            [8, 9, 3, 2],
            [6, 7, 11, 10],
        ]
    )
    grid = xu.Ugrid2d(nodes[:, 0], nodes[:, 1], -1, faces)
    voronoi_grid = grid.tesselate_centroidal_voronoi(False, False)
    assert voronoi_grid.n_face == 2
    assert voronoi_grid.n_node == 4


def test_concave_voronoi():
    # Adding original boundary vertices may create concave cells;
    # skip_concave keeps the convex substitute, enlarging total area.
    vertices = np.array(
        [
            [0.0, 0.0],
            [3.0, 0.0],
            [1.0, 1.0],
            [0.0, 2.0],
            [3.0, 2.0],
        ]
    )
    faces = np.array(
        [
            [0, 1, 2],
            [0, 2, 3],
            [2, 4, 3],
        ]
    )
    grid = xu.Ugrid2d(*vertices.T, -1, faces)
    voronoi_0 = grid.tesselate_centroidal_voronoi(skip_concave=False)
    voronoi_1 = grid.tesselate_centroidal_voronoi(skip_concave=True)
    assert voronoi_0.n_face == voronoi_1.n_face
    assert voronoi_0.n_node == voronoi_1.n_node
    assert voronoi_0.area.sum() < voronoi_1.area.sum()


def test_voronoi_matches_grid_method():
    # grid.voronoi_topology must agree with the functional path.
    grid = xu.data.disk().grids[0]
    vertices, faces, face_i = grid.voronoi_topology
    assert vertices.shape[1] == 2
    assert faces.ndim == 2
    assert (face_i < grid.n_face).all()
