"""
Ugrid2d extras: scenarios from the reference suite not covered by the
main topology tests (reference tests/test_ugrid2d.py) — start_index
round trips, transposed connectivity, structured constructors,
bounds/exteriors, nearest queries, selection dispatch, coordinate
assignment, and no-mutation guarantees.
"""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu import xdata
from xugrid_tpu.xdata import DataArray

# 4-face mixed mesh: two quads + two triangles.
VERTICES = np.array(
    [
        [0.0, 0.0],
        [1.0, 0.0],
        [2.0, 0.0],
        [0.0, 1.0],
        [1.0, 1.0],
        [2.0, 1.0],
        [1.0, 2.0],
    ]
)
FACES = np.array(
    [
        [0, 1, 4, 3],
        [1, 2, 5, 4],
        [3, 4, 6, -1],
        [4, 5, 6, -1],
    ]
)


@pytest.fixture
def grid():
    return xu.Ugrid2d(VERTICES[:, 0], VERTICES[:, 1], -1, FACES)


class TestDatasetRoundtrips:
    def test_start_index_one(self, grid):
        ds = grid.to_dataset()
        conn_name = f"{grid.name}_face_nodes"
        conn = np.asarray(ds[conn_name].data).copy()
        shifted = np.where(conn != -1, conn + 1, -1)
        ds[conn_name] = DataArray(
            shifted,
            dims=ds[conn_name].dims,
            attrs={**dict(ds[conn_name].attrs), "start_index": 1},
        )
        back = xu.Ugrid2d.from_dataset(ds)
        np.testing.assert_array_equal(
            back.face_node_connectivity, grid.face_node_connectivity
        )
        # The user's start_index is preserved for write-side parity.
        assert back.start_index == 1
        out = back.to_dataset()
        conn_out = np.asarray(out[conn_name].data)
        np.testing.assert_array_equal(conn_out, shifted)

    def test_custom_fill_value(self, grid):
        ds = grid.to_dataset()
        conn_name = f"{grid.name}_face_nodes"
        conn = np.asarray(ds[conn_name].data).copy()
        refilled = np.where(conn == -1, 999, conn)
        ds[conn_name] = DataArray(
            refilled,
            dims=ds[conn_name].dims,
            attrs={**dict(ds[conn_name].attrs), "_FillValue": 999},
        )
        back = xu.Ugrid2d.from_dataset(ds)
        np.testing.assert_array_equal(
            back.face_node_connectivity, grid.face_node_connectivity
        )

    def test_transposed_connectivity(self, grid):
        ds = grid.to_dataset()
        conn_name = f"{grid.name}_face_nodes"
        var = ds[conn_name]
        ds[conn_name] = DataArray(
            np.asarray(var.data).T,
            dims=tuple(reversed(var.dims)),
            attrs=dict(var.attrs),
        )
        back = xu.Ugrid2d.from_dataset(ds)
        np.testing.assert_array_equal(
            back.face_node_connectivity, grid.face_node_connectivity
        )

    def test_no_mutation(self, grid):
        ds = grid.to_dataset()
        conn_name = f"{grid.name}_face_nodes"
        before = np.asarray(ds[conn_name].data).copy()
        _ = xu.Ugrid2d.from_dataset(ds)
        np.testing.assert_array_equal(np.asarray(ds[conn_name].data), before)


class TestStructuredConstructors:
    def test_from_structured_intervals1d(self):
        grid = xu.Ugrid2d.from_structured_intervals1d(
            np.array([0.0, 1.0, 2.0]), np.array([0.0, 1.0])
        )
        assert grid.n_face == 2
        np.testing.assert_allclose(np.sort(grid.area), [1.0, 1.0])

    def test_from_structured_intervals2d(self):
        x = np.array([[0.0, 1.0, 2.0], [0.0, 1.0, 2.0], [0.0, 1.0, 2.0]])
        y = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [2.0, 2.0, 2.0]])
        grid = xu.Ugrid2d.from_structured_intervals2d(x, y)
        assert grid.n_face == 4
        np.testing.assert_allclose(grid.area, 1.0)

    def test_from_structured_bounds(self):
        x_bounds = np.array([[0.0, 1.0], [1.0, 2.0]])
        y_bounds = np.array([[0.0, 1.0]])
        grid = xu.Ugrid2d.from_structured_bounds(x_bounds, y_bounds)
        assert grid.n_face == 2
        np.testing.assert_allclose(grid.area, 1.0)

    def test_from_structured_bounds_nan_masked(self):
        # Curvilinear (n, m, 4) bounds with one NaN cell dropped.
        x_bounds = np.array(
            [[[0.0, 1.0, 1.0, 0.0], [1.0, 2.0, 2.0, 1.0]]]
        )
        y_bounds = np.array(
            [[[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0]]]
        )
        x_nan = x_bounds.copy()
        x_nan[0, 1] = np.nan
        with pytest.warns(UserWarning):
            grid, index = xu.Ugrid2d.from_structured_bounds(
                x_nan, y_nan := y_bounds, return_index=True
            )
        assert grid.n_face == 1
        assert index.tolist() == [True, False]

    def test_from_structured(self):
        da = DataArray(
            np.zeros((2, 3)),
            dims=("y", "x"),
            coords={"x": np.arange(3.0), "y": np.arange(2.0)},
        )
        grid = xu.Ugrid2d.from_structured(da)
        assert grid.n_face == 6


class TestGeometryProperties:
    def test_edge_and_face_bounds(self, grid):
        eb = grid.edge_bounds
        assert eb.shape == (grid.n_edge, 4)
        fb = grid.face_bounds
        assert fb.shape == (grid.n_face, 4)
        np.testing.assert_allclose(fb[0], [0.0, 0.0, 1.0, 1.0])

    def test_exteriors(self, grid):
        # All faces touch the exterior in this small mesh.
        assert set(grid.exterior_faces.tolist()) == {0, 1, 2, 3}
        efc = grid.edge_face_connectivity
        n_boundary = int((efc[:, 1] == -1).sum())
        assert len(grid.exterior_edges) == n_boundary

    def test_bounding_polygon(self, grid):
        pytest.importorskip("shapely")
        poly = grid.bounding_polygon()
        # Closed ring over the hull-ish outline; area equals mesh area.
        xy = np.asarray(poly) if not hasattr(poly, "exterior") else None
        if xy is not None:
            x, y = xy[:, 0], xy[:, 1]
            area = 0.5 * abs(
                np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
            )
            np.testing.assert_allclose(area, grid.area.sum())

    def test_centroid_triangulation(self, grid):
        (cx, cy, tris), face_index = grid.centroid_triangulation
        assert tris.ndim == 2 and tris.shape[1] == 3
        assert (face_index < grid.n_face).all()

    def test_equals(self, grid):
        assert grid.equals(
            xu.Ugrid2d(VERTICES[:, 0], VERTICES[:, 1], -1, FACES)
        )
        assert not grid.equals(42)

    def test_get_coordinates(self, grid):
        for dim, n in [
            (grid.node_dimension, grid.n_node),
            (grid.edge_dimension, grid.n_edge),
            (grid.face_dimension, grid.n_face),
        ]:
            coords = grid.get_coordinates(dim)
            assert coords.shape == (n, 2)
        with pytest.raises(ValueError):
            grid.get_coordinates("bogus")


class TestQueriesAndSelection:
    def test_locate_nearest(self, grid):
        node = grid.locate_nearest_node([[0.1, 0.1]])
        assert node[0] == 0
        face = grid.locate_nearest_face([[0.4, 0.4]])
        assert face[0] == 0

    def test_nearest_interpolate(self, grid):
        data = np.array([1.0, np.nan, 3.0, np.nan])
        uda = xu.UgridDataArray(
            DataArray(data, dims=(grid.face_dimension,), name="z"), grid
        )
        out = np.asarray(uda.ugrid.interpolate_na(method="nearest").values)
        assert not np.isnan(out).any()
        assert out[0] == 1.0 and out[2] == 3.0

    def test_sel_scalar_pair(self, grid):
        uda = xu.UgridDataArray(
            DataArray(
                np.arange(4.0), dims=(grid.face_dimension,), name="z"
            ),
            grid,
        )
        out = uda.ugrid.sel(x=0.5, y=0.5)
        np.testing.assert_allclose(np.asarray(out.values), [0.0])

    def test_sel_slice_and_scalar(self, grid):
        uda = xu.UgridDataArray(
            DataArray(
                np.arange(4.0), dims=(grid.face_dimension,), name="z"
            ),
            grid,
        )
        # y scalar + x slice -> horizontal cross-section.
        out = uda.ugrid.sel(x=slice(None, None), y=0.5)
        values = np.asarray(out.values)
        np.testing.assert_allclose(np.sort(values), [0.0, 1.0])

    def test_intersect_line_error(self, grid):
        uda = xu.UgridDataArray(
            DataArray(
                np.arange(4.0), dims=(grid.face_dimension,), name="z"
            ),
            grid,
        )
        with pytest.raises(ValueError, match="length two"):
            uda.ugrid.intersect_line(start=(0.0,), end=(1.0, 1.0, 2.0))

    def test_sel_points_out_of_bounds_modes(self, grid):
        uda = xu.UgridDataArray(
            DataArray(
                np.arange(4.0), dims=(grid.face_dimension,), name="z"
            ),
            grid,
        )
        with pytest.raises(ValueError):
            uda.ugrid.sel_points(x=[9.0], y=[9.0], out_of_bounds="raise")
        with pytest.warns(UserWarning):
            out = uda.ugrid.sel_points(
                x=[0.5, 9.0], y=[0.5, 9.0], out_of_bounds="warn"
            )
        values = np.asarray(out.values)
        assert values[0] == 0.0 and np.isnan(values[1])
        dropped = uda.ugrid.sel_points(
            x=[0.5, 9.0], y=[0.5, 9.0], out_of_bounds="drop"
        )
        assert len(np.asarray(dropped.values)) == 1


class TestCoordinateAssignment:
    def test_assign_coords(self, grid):
        uda = xu.UgridDataArray(
            DataArray(
                np.arange(4.0), dims=(grid.face_dimension,), name="z"
            ),
            grid,
        )
        with_face = grid.assign_face_coords(uda.obj)
        assert f"{grid.name}_face_x" in with_face.coords
        with_edge = grid.assign_edge_coords(
            DataArray(
                np.arange(grid.n_edge, dtype=float),
                dims=(grid.edge_dimension,),
            )
        )
        assert f"{grid.name}_edge_x" in with_edge.coords

    def test_create_data_array(self, grid):
        uda = grid.create_data_array(np.arange(4.0), facet="face")
        assert uda.dims == (grid.face_dimension,)
        with pytest.raises(ValueError):
            grid.create_data_array(np.arange(3.0), facet="face")
