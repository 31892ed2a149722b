"""
Conversion test suite: structured bounds/breaks inference, xy-coordinate
inference, 2D-bounds -> topology, and (shapely-gated) geometry round
trips.  Mirrors reference tests/test_conversion.py scenarios.
"""

import numpy as np
import pytest

from tests import requires_shapely
from xugrid_tpu import conversion as cv
from xugrid_tpu.xdata import DataArray, Dataset


def test_is_monotonic_and_increasing():
    with pytest.raises(ValueError):
        cv._is_monotonic_and_increasing([0.0, -1.0, 2.0])
    with pytest.raises(ValueError):
        cv._is_monotonic_and_increasing([2.0, 0.0, 1.0])
    assert cv._is_monotonic_and_increasing([0.0, 1.0, 2.0])
    assert not cv._is_monotonic_and_increasing([2.0, 1.0, 0.0])

    ascending = np.arange(9.0).reshape(3, 3)
    descending = ascending[::-1, ::-1]
    assert cv._is_monotonic_and_increasing(ascending, axis=0)
    assert cv._is_monotonic_and_increasing(ascending, axis=1)
    assert not cv._is_monotonic_and_increasing(descending, axis=0)
    assert not cv._is_monotonic_and_increasing(descending, axis=1)


def test_infer_interval_breaks():
    assert np.allclose([-0.5, 0.5, 1.5], cv.infer_interval_breaks([0, 1]))
    assert np.allclose(
        [-0.5, 0.5, 5.0, 9.5, 10.5], cv.infer_interval_breaks([0, 1, 9, 10])
    )

    # 2D curvilinear: breaks of the breaks recover the vertex lattice.
    xref, yref = np.meshgrid(np.arange(6), np.arange(5))
    cx = (xref[1:, 1:] + xref[:-1, :-1]) / 2
    cy = (yref[1:, 1:] + yref[:-1, :-1]) / 2
    x = cv.infer_interval_breaks(cx, axis=1)
    x = cv.infer_interval_breaks(x, axis=0)
    y = cv.infer_interval_breaks(cy, axis=1)
    y = cv.infer_interval_breaks(y, axis=0)
    np.testing.assert_allclose(xref, x)
    np.testing.assert_allclose(yref, y)

    with pytest.raises(ValueError):
        cv.infer_interval_breaks(np.array([0, 2, 1]), check_monotonic=True)


class TestInferBreaks1d:
    @pytest.fixture
    def ds_ascending(self):
        ds = Dataset()
        ds["a"] = DataArray(
            np.zeros((3, 4)), dims=("y", "x"),
        )
        ds = ds.assign_coords(
            x=DataArray(np.array([0.5, 1.5, 2.5, 3.5]), dims=("x",)),
            y=DataArray(np.array([0.5, 1.5, 2.5]), dims=("y",)),
        )
        return ds

    def test_implicit_spacing(self, ds_ascending):
        np.testing.assert_allclose(
            cv.infer_interval_breaks1d(ds_ascending, "x"),
            [0.0, 1.0, 2.0, 3.0, 4.0],
        )

    def test_scalar_spacing(self, ds_ascending):
        ds = ds_ascending.assign_coords(dx=DataArray(np.array(1.0)))
        np.testing.assert_allclose(
            cv.infer_interval_breaks1d(ds, "x"), [0.0, 1.0, 2.0, 3.0, 4.0]
        )
        bad = ds_ascending.assign_coords(dx=DataArray(np.array(2.0)))
        with pytest.raises(ValueError, match="spacing of x does not match"):
            cv.infer_interval_breaks1d(bad, "x")

    def test_array_spacing(self, ds_ascending):
        ds = ds_ascending.assign_coords(
            dx=DataArray(np.ones(4), dims=("x",))
        )
        np.testing.assert_allclose(
            cv.infer_interval_breaks1d(ds, "x"), [0.0, 1.0, 2.0, 3.0, 4.0]
        )
        bad = ds_ascending.assign_coords(
            dx=DataArray(np.ones(3), dims=("y",))
        )
        with pytest.raises(ValueError, match="size of x does not match"):
            cv.infer_interval_breaks1d(bad, "x")

    def test_descending(self, ds_ascending):
        ds = Dataset()
        ds["a"] = DataArray(np.zeros((3, 4)), dims=("y", "x"))
        ds = ds.assign_coords(
            x=DataArray(np.array([3.5, 2.5, 1.5, 0.5]), dims=("x",)),
            dx=DataArray(np.array(1.0)),
        )
        np.testing.assert_allclose(
            cv.infer_interval_breaks1d(ds, "x"), [4.0, 3.0, 2.0, 1.0, 0.0]
        )

    def test_size_one_requires_spacing(self):
        ds = Dataset()
        ds["a"] = DataArray(np.zeros((1,)), dims=("x",))
        ds = ds.assign_coords(x=DataArray(np.array([0.5]), dims=("x",)))
        with pytest.raises(ValueError, match="1-sized coordinate"):
            cv.infer_interval_breaks1d(ds, "x")
        ds = ds.assign_coords(dx=DataArray(np.array(1.0)))
        np.testing.assert_allclose(
            cv.infer_interval_breaks1d(ds, "x"), [0.0, 1.0]
        )


def test_bounds1d_to_vertices():
    with pytest.raises(ValueError, match="Bounds are not monotonic"):
        cv.bounds1d_to_vertices(
            np.array([[0.0, 1.0], [2.0, 3.0], [1.0, 2.0]])
        )
    x_vertices = np.array([1.0, 3.0, 5.0, 7.0, 9.0])
    x_bounds = np.column_stack((x_vertices[:-1], x_vertices[1:]))
    np.testing.assert_allclose(cv.bounds1d_to_vertices(x_bounds), x_vertices)
    xrev = x_vertices[::-1]
    x_bounds = np.column_stack((xrev[1:], xrev[:-1]))
    np.testing.assert_allclose(cv.bounds1d_to_vertices(x_bounds), xrev)


class TestBounds2dToTopology2d:
    def bounds(self):
        x_bounds = np.array(
            [[[0.0, 0.0, 1.0, 1.0], [2.0, 2.0, 3.0, 3.0], [4.0, 4.0, 5.0, 5.0]]]
        )
        y_bounds = np.array(
            [[[0.0, 1.0, 1.0, 0.0], [2.0, 3.0, 3.0, 2.0], [4.0, 5.0, 5.0, 4.0]]]
        )
        return x_bounds, y_bounds

    def test_clockwise_made_ccw(self):
        x_bounds, y_bounds = self.bounds()
        x, y, faces, index = cv.bounds2d_to_topology2d(x_bounds, y_bounds)
        assert index.all()
        assert faces.shape == (3, 4)
        first = np.column_stack((x, y))[faces[0]]
        expected = np.array(
            [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]
        )
        # CCW, any rotation of the expected ring.
        start = np.flatnonzero((first == expected[0]).all(axis=1))[0]
        np.testing.assert_allclose(np.roll(first, -start, axis=0), expected)

    def test_nan_coordinate_dropped(self):
        x_bounds, y_bounds = self.bounds()
        x_bounds = x_bounds.copy()
        x_bounds[0, 0, 0] = np.nan
        with pytest.warns(UserWarning, match="three unique non-collinear"):
            _, _, faces, index = cv.bounds2d_to_topology2d(x_bounds, y_bounds)
        assert not index[0]
        assert index[1:].all()
        assert faces.shape == (2, 4)

    def test_bad_bounds(self):
        # Points and lines are invalid; triangles are allowed.
        x_bounds = np.array(
            [
                [
                    [0.0, 0.0, 0.0, 0.0],   # point
                    [1.0, 2.0, 2.0, 1.0],   # quad
                    [2.0, 3.0, 3.0, 2.0],   # triangle (repeated corner)
                    [2.0, 2.0, 3.0, 3.0],   # line
                ]
            ]
        )
        y_bounds = np.array(
            [
                [
                    [0.0, 0.0, 0.0, 0.0],
                    [0.0, 0.0, 1.0, 1.0],
                    [0.0, 0.0, 0.0, 1.0],
                    [0.0, 0.0, 1.0, 1.0],
                ]
            ]
        )
        with pytest.warns(UserWarning, match="three unique non-collinear"):
            x, _, faces, index = cv.bounds2d_to_topology2d(x_bounds, y_bounds)
        assert np.array_equal(index, [False, True, True, False])
        assert faces.shape == (2, 4)
        # The triangle face carries the fill value in its last slot.
        assert faces[1, -1] == -1

    def test_collinear_vertices_dropped(self):
        x_bounds = np.array(
            [[[0.0, 0.33, 0.67, 1.0], [2.0, 2.0, 3.0, 3.0], [4.0, 4.0, 5.0, 5.0]]]
        )
        y_bounds = np.array(
            [[[0.5, 0.5, 0.5, 0.5], [2.0, 3.0, 3.0, 2.0], [4.0, 5.0, 5.0, 4.0]]]
        )
        with pytest.warns(UserWarning, match="three unique non-collinear"):
            _, _, faces, index = cv.bounds2d_to_topology2d(x_bounds, y_bounds)
        assert len(faces) == 2
        assert np.array_equal(index, [False, True, True])


def test_infer_xy_coords():
    da = DataArray(np.array([[1.0]]), dims=("y", "x"))
    da = da.assign_coords(
        x=DataArray(np.array([1.0]), dims=("x",)),
        y=DataArray(np.array([1.0]), dims=("y",)),
    )
    assert cv.infer_xy_coords(da) == ("x", "y")

    da = DataArray(np.array([[1.0]]), dims=("latitude", "longitude"))
    da = da.assign_coords(
        longitude=DataArray(np.array([1.0]), dims=("longitude",)),
        latitude=DataArray(np.array([1.0]), dims=("latitude",)),
    )
    assert cv.infer_xy_coords(da) == ("longitude", "latitude")

    da = DataArray(np.array([[1.0]]), dims=("lat", "lon"))
    da = da.assign_coords(
        lon=DataArray(np.array([1.0]), dims=("lon",)),
        lat=DataArray(np.array([1.0]), dims=("lat",)),
    )
    assert cv.infer_xy_coords(da) == (None, None)

    lon = DataArray(np.array([1.0]), dims=("lon",), attrs={"axis": "X"})
    lat = DataArray(np.array([1.0]), dims=("lat",), attrs={"axis": "Y"})
    da = DataArray(np.array([[1.0]]), dims=("lat", "lon"))
    da = da.assign_coords(lon=lon, lat=lat)
    assert cv.infer_xy_coords(da) == ("lon", "lat")

    lon = DataArray(
        np.array([1.0]), dims=("lon",), attrs={"standard_name": "longitude"}
    )
    lat = DataArray(
        np.array([1.0]), dims=("lat",), attrs={"standard_name": "latitude"}
    )
    da = DataArray(np.array([[1.0]]), dims=("lat", "lon"))
    da = da.assign_coords(lon=lon, lat=lat)
    assert cv.infer_xy_coords(da) == ("lon", "lat")


@requires_shapely
class TestShapelyRoundtrip:
    def test_nodes(self):
        x = np.array([0.0, 1.0, 2.0])
        y = np.array([3.0, 4.0, 5.0])
        points = cv.nodes_to_points(x, y)
        back_x, back_y = cv.points_to_nodes(points)
        np.testing.assert_allclose(back_x, x)
        np.testing.assert_allclose(back_y, y)

    def test_edges(self):
        x = np.array([0.0, 1.0, 2.0])
        y = np.array([0.0, 1.0, 0.0])
        edges = np.array([[0, 1], [1, 2]])
        lines = cv.edges_to_linestrings(x, y, edges)
        bx, by, bedges = cv.linestrings_to_edges(lines)
        # Node order may differ after dedup; compare segment coordinates.
        orig = np.sort(
            np.column_stack([x[edges], y[edges]]).reshape(-1, 4), axis=0
        )
        back = np.sort(
            np.column_stack([bx[bedges], by[bedges]]).reshape(-1, 4), axis=0
        )
        np.testing.assert_allclose(orig, back)

    def test_faces_triangle(self):
        x = np.array([0.0, 1.0, 1.0, 0.0])
        y = np.array([0.0, 0.0, 1.0, 1.0])
        faces = np.array([[0, 1, 2, -1], [0, 2, 3, -1]])
        polygons = cv.faces_to_polygons(x, y, faces)
        bx, by, bfaces = cv.polygons_to_faces(polygons)
        assert bfaces.shape == (2, 3)
        assert len(bx) == 4

    def test_faces_mixed(self):
        x = np.array([0.0, 1.0, 2.0, 2.0, 0.0])
        y = np.array([0.0, 0.0, 0.0, 1.0, 1.0])
        faces = np.array([[0, 1, 4, -1], [1, 2, 3, 4]])
        polygons = cv.faces_to_polygons(x, y, faces)
        bx, by, bfaces = cv.polygons_to_faces(polygons)
        assert bfaces.shape == (2, 4)
        assert (bfaces[0] == -1).sum() == 1
