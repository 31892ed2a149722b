"""
Vector-burning kernel tests that run WITHOUT shapely/geopandas: the
array-level polygon location path (_locate_polygon: earcut triangulation
-> BVH face join -> centroid-in-triangle filter) and the polygonize
region classifier.  The geodataframe surface is covered by the gated
tests in test_ops.py.  Reference strategy: tests/test_burn.py:81-127,
tests/test_polygonize.py.
"""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu import xdata
from xugrid_tpu.ugrid.burn import _locate_polygon, _triangulate_polygon
from xugrid_tpu.ugrid.polygonize import _classify


def quad_grid(nx, ny):
    x = np.arange(nx + 1.0)
    y = np.arange(ny + 1.0)
    yy, xx = np.meshgrid(y, x, indexing="ij")
    verts = np.column_stack([xx.ravel(), yy.ravel()])
    j, i = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    nid = lambda ii, jj: jj * (nx + 1) + ii  # noqa: E731
    faces = np.stack(
        [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)], axis=-1
    ).reshape(-1, 4)
    return xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces)


def square(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64
    )


class TestLocatePolygon:
    @pytest.fixture
    def grid(self):
        return quad_grid(4, 4)

    def test_exact_cover(self, grid):
        # A polygon exactly covering faces (1,1)-(2,2).
        exterior = square(1.0, 1.0, 3.0, 3.0)
        located = _locate_polygon(grid, exterior, [], all_touched=False)
        expected = np.array([5, 6, 9, 10])  # row-major 4x4
        np.testing.assert_array_equal(np.sort(located), expected)

    def test_centroid_filter_vs_all_touched(self, grid):
        # Partial-cell overhang (strictly left of the grazed column's
        # centroids): centroid mode keeps only covered centroids,
        # all_touched also includes the grazed column.
        exterior = square(1.0, 1.0, 2.4, 3.0)
        centroid_mode = _locate_polygon(grid, exterior, [], all_touched=False)
        np.testing.assert_array_equal(np.sort(centroid_mode), [5, 9])
        touched = _locate_polygon(grid, exterior, [], all_touched=True)
        np.testing.assert_array_equal(np.sort(touched), [5, 6, 9, 10])

    def test_hole_excluded(self):
        grid = quad_grid(6, 6)
        exterior = square(0.0, 0.0, 6.0, 6.0)
        hole = square(2.0, 2.0, 4.0, 4.0)
        located = _locate_polygon(grid, exterior, [hole], all_touched=False)
        holes = {14, 15, 20, 21}  # faces (2..3, 2..3) row-major 6x6
        assert holes.isdisjoint(set(located.tolist()))
        assert len(located) == 36 - 4

    def test_outside_returns_empty(self, grid):
        exterior = square(10.0, 10.0, 12.0, 12.0)
        located = _locate_polygon(grid, exterior, [], all_touched=False)
        assert located.size == 0

    def test_triangulate_polygon_area(self):
        exterior = square(0.0, 0.0, 2.0, 2.0)
        hole = square(0.5, 0.5, 1.5, 1.5)
        vertices, triangles = _triangulate_polygon(exterior, [hole])
        tri = vertices[triangles]
        a = tri[:, 1] - tri[:, 0]
        b = tri[:, 2] - tri[:, 0]
        area = 0.5 * np.abs(a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]).sum()
        assert np.isclose(area, 4.0 - 1.0)


class TestClassify:
    def test_two_regions(self):
        grid = quad_grid(2, 2)
        efc = grid.edge_face_connectivity
        i, j = efc[:, 0], efc[:, 1]
        # Bottom row 1.0, top row 2.0 -> two connected regions.
        values = np.array([1.0, 1.0, 2.0, 2.0])
        n, labels = _classify(i, j, values)
        assert n == 2
        assert labels[0] == labels[1]
        assert labels[2] == labels[3]
        assert labels[0] != labels[2]

    def test_checkerboard_isolated(self):
        grid = quad_grid(2, 2)
        efc = grid.edge_face_connectivity
        i, j = efc[:, 0], efc[:, 1]
        # Checkerboard: no two edge-adjacent faces share a value.
        values = np.array([1.0, 2.0, 2.0, 1.0])
        n, labels = _classify(i, j, values)
        assert n == 4

    def test_polygonize_rejects_extra_dims(self):
        grid = quad_grid(2, 2)
        da = xdata.DataArray(
            np.zeros((2, grid.n_face)),
            dims=("layer", grid.face_dimension),
        )
        uda = xu.UgridDataArray(da, grid)
        from xugrid_tpu.ugrid.polygonize import polygonize

        with pytest.raises(ValueError, match="Cannot polygonize"):
            polygonize(uda)
