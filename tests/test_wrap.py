"""
Wrapper layer: UgridDataArray / UgridDataset forwarding, alignment,
top-level helpers (reference test strategy: tests/test_ugrid_dataset.py).
"""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu import xdata
from xugrid_tpu.xdata import DataArray, Dataset


@pytest.fixture
def grid():
    nx = ny = 4
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


@pytest.fixture
def uda(grid):
    values = np.arange(grid.n_face, dtype=float)
    return xu.UgridDataArray(
        DataArray(values, dims=(grid.face_dimension,), name="a"), grid
    )


@pytest.fixture
def uds(uda):
    return uda.to_dataset()


class TestUgridDataArray:
    def test_init_and_properties(self, uda, grid):
        assert uda.ugrid.grid is grid
        assert uda.grids == [grid]
        assert uda.name == "a"
        assert uda.dims == (grid.face_dimension,)
        assert len(uda) == grid.n_face

    def test_init_rejects_bad_types(self, grid):
        with pytest.raises(TypeError):
            xu.UgridDataArray(np.zeros(3), grid)

    def test_arithmetic_preserves_grid(self, uda):
        out = uda + 1.0
        assert isinstance(out, xu.UgridDataArray)
        assert out.ugrid.grid is uda.ugrid.grid
        np.testing.assert_allclose(
            np.asarray(out.values), np.asarray(uda.values) + 1.0
        )
        out2 = uda * uda
        np.testing.assert_allclose(
            np.asarray(out2.values), np.asarray(uda.values) ** 2
        )
        out3 = 2.0 - uda  # reflexive
        np.testing.assert_allclose(
            np.asarray(out3.values), 2.0 - np.asarray(uda.values)
        )

    def test_forwarded_reduction_drops_grid(self, uda):
        m = uda.mean()
        assert float(m.values) == pytest.approx(7.5)

    def test_forwarded_where(self, uda):
        out = uda.where(uda > 5.0)
        assert isinstance(out, xu.UgridDataArray)
        vals = np.asarray(out.values)
        assert np.isnan(vals[:6]).all()
        assert (vals[6:] == np.arange(6, 16)).all()

    def test_isel_subsets_grid(self, uda, grid):
        sub = uda.isel({grid.face_dimension: np.array([0, 1, 2])})
        assert isinstance(sub, xu.UgridDataArray)
        assert sub.ugrid.grid.n_face == 3
        assert sub.ugrid.grid is not grid

    def test_numpy_protocol(self, uda):
        arr = np.asarray(uda)
        assert arr.shape == (16,)
        single = uda.isel({uda.ugrid.grid.face_dimension: 3})
        assert float(single) == 3.0
        assert int(single) == 3

    def test_to_dataset(self, uda):
        ds = uda.to_dataset()
        assert isinstance(ds, xu.UgridDataset)
        assert "a" in ds

    def test_from_data(self, grid):
        uda = xu.UgridDataArray.from_data(
            np.ones(grid.n_node), grid, facet="node"
        )
        assert uda.dims == (grid.node_dimension,)
        with pytest.raises(ValueError):
            xu.UgridDataArray.from_data(np.ones(3), grid, facet="face")

    def test_from_structured2d(self):
        da = DataArray(
            np.arange(12, dtype=float).reshape(3, 4),
            dims=("y", "x"),
            coords={"y": np.arange(3.0), "x": np.arange(4.0)},
            name="z",
        )
        uda = xu.UgridDataArray.from_structured2d(da)
        assert isinstance(uda, xu.UgridDataArray)
        assert uda.ugrid.grid.n_face == 12
        np.testing.assert_allclose(
            np.sort(np.asarray(uda.values)), np.arange(12.0)
        )

    def test_getitem_on_extra_dim(self, grid):
        values = np.zeros((3, grid.n_face))
        uda = xu.UgridDataArray(
            DataArray(
                values,
                dims=("time", grid.face_dimension),
                coords={"time": np.arange(3)},
            ),
            grid,
        )
        first = uda.isel(time=0)
        assert isinstance(first, xu.UgridDataArray)
        assert first.dims == (grid.face_dimension,)


class TestUgridDataset:
    def test_init_strips_topology(self, uds, grid):
        # The wrapped dataset must not carry topology/connectivity vars.
        assert "a" in uds
        for name in uds.obj.data_vars:
            assert grid.name not in name or name == "a"

    def test_grid_property(self, uds, grid):
        assert uds.grid.name == grid.name
        assert len(uds.grids) == 1

    def test_getitem_returns_uda(self, uds):
        uda = uds["a"]
        assert isinstance(uda, xu.UgridDataArray)

    def test_setitem_plain_array(self, uds, grid):
        uds["b"] = xdata.DataArray(
            np.ones(grid.n_face), dims=(grid.face_dimension,)
        )
        assert "b" in uds
        assert isinstance(uds["b"], xu.UgridDataArray)

    def test_setitem_uda_appends_grid(self, uds, grid):
        # A variable on a different (renamed) grid is a second topology.
        other = grid.rename("net")
        uds2 = xu.UgridDataset(grids=[grid])
        uds2["c"] = xu.UgridDataArray(
            DataArray(np.ones(other.n_face), dims=(other.face_dimension,)),
            other,
        )
        assert len(uds2.grids) == 2

    def test_forwarding(self, uds):
        out = uds.isel({uds.grid.face_dimension: np.arange(4)})
        assert isinstance(out, xu.UgridDataset)
        assert out.grid.n_face == 4

    def test_from_structured2d(self):
        ds = Dataset(
            {
                "z": DataArray(
                    np.zeros((2, 3, 4)),
                    dims=("time", "y", "x"),
                    coords={"y": np.arange(3.0), "x": np.arange(4.0)},
                )
            }
        )
        uds = xu.UgridDataset.from_structured2d(ds)
        assert uds.grid.n_face == 12
        assert uds["z"].dims[0] == "time"


class TestTopLevelHelpers:
    def test_full_like_family(self, uda):
        ones = xu.ones_like(uda)
        zeros = xu.zeros_like(uda)
        full = xu.full_like(uda, 3.5)
        for out, val in ((ones, 1.0), (zeros, 0.0), (full, 3.5)):
            assert isinstance(out, xu.UgridDataArray)
            assert (np.asarray(out.values) == val).all()
            assert out.ugrid.grid is uda.ugrid.grid

    def test_concat(self, uda):
        stacked = xu.concat([uda, uda + 1.0], dim="time")
        assert isinstance(stacked, xu.UgridDataArray)
        assert stacked.sizes["time"] == 2

    def test_merge(self, uda):
        b = (uda + 1.0).rename("b")
        merged = xu.merge([uda.to_dataset(), b.to_dataset()])
        assert isinstance(merged, xu.UgridDataset)
        assert set(["a", "b"]) <= set(merged.obj.data_vars)
        assert len(merged.grids) == 1  # identical grids deduped

    def test_netcdf_roundtrip(self, uda, tmp_path):
        path = tmp_path / "wrap_roundtrip.nc"
        uda.ugrid.to_netcdf(path)
        back = xu.open_dataset(path)
        assert isinstance(back, xu.UgridDataset)
        assert back.grid.n_face == uda.ugrid.grid.n_face
        np.testing.assert_allclose(
            np.asarray(back["a"].values), np.asarray(uda.values)
        )

    def test_open_dataset_without_topology_raises(self, tmp_path):
        path = tmp_path / "plain.nc"
        ds = Dataset({"x": DataArray(np.arange(3.0), dims=("i",))})
        xdata.io_netcdf.to_netcdf(ds, path)
        with pytest.raises(ValueError):
            xu.open_dataset(path)


class TestAccessorWorkflows:
    def test_sel_box(self, uda):
        sub = uda.ugrid.sel(x=slice(0.0, 2.0), y=slice(0.0, 2.0))
        assert isinstance(sub, xu.UgridDataArray)
        assert sub.ugrid.grid.n_face == 4

    def test_clip_box(self, uda):
        sub = uda.ugrid.clip_box(0.0, 0.0, 2.0, 2.0)
        assert sub.ugrid.grid.n_face == 4

    def test_sel_points(self, uda):
        out = uda.ugrid.sel_points(x=[0.5, 3.5], y=[0.5, 3.5])
        np.testing.assert_allclose(np.asarray(out.values), [0.0, 15.0])

    def test_partition_roundtrip(self, uda):
        parts = uda.ugrid.partition(n_part=2)
        assert len(parts) == 2
        assert sum(p.ugrid.grid.n_face for p in parts) == 16
        merged = xu.merge_partitions(parts)
        assert merged.grid.n_face == 16

    def test_rasterize(self, uda):
        raster = uda.ugrid.rasterize(resolution=1.0)
        assert raster.dims == ("y", "x")
        assert raster.shape == (4, 4)

    def test_total_bounds(self, uda):
        assert tuple(uda.ugrid.total_bounds) == (0.0, 0.0, 4.0, 4.0)

    def test_to_node_face_remaps(self, uda):
        # Reference semantics (dataarray_accessor.py:346-368): a new
        # "nmax" dim holds the contributing faces per node.
        node = uda.ugrid.to_node()
        assert node.dims == (uda.ugrid.grid.node_dimension, "nmax")
        mean = node.mean("nmax")
        # Interior node (1,1) touches faces 0, 1, 4, 5.
        interior = np.flatnonzero(
            (uda.ugrid.grid.node_coordinates == [1.0, 1.0]).all(axis=1)
        )[0]
        assert float(np.asarray(mean.values)[interior]) == pytest.approx(
            np.mean([0, 1, 4, 5])
        )


class TestDatasetAccessor:
    @pytest.fixture
    def multi_uds(self, grid):
        # Two topologies in one dataset.
        nodes = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]])
        net = xu.Ugrid1d(
            nodes[:, 0], nodes[:, 1], -1, np.array([[0, 1], [1, 2]])
        )
        ds = xdata.Dataset()
        ds["a"] = DataArray(
            np.arange(grid.n_face, dtype=float), dims=(grid.face_dimension,)
        )
        ds["q"] = DataArray(
            np.arange(net.n_edge, dtype=float), dims=(net.edge_dimension,)
        )
        return xu.UgridDataset(ds, grids=[grid, net])

    def test_grids_property(self, multi_uds):
        assert len(multi_uds.grids) == 2
        names = {g.name for g in multi_uds.grids}
        assert names == {"mesh2d", "network1d"}

    def test_grid_raises_on_multiple(self, multi_uds):
        with pytest.raises(ValueError):
            multi_uds.grid

    def test_sel_multi_topology(self, multi_uds):
        out = multi_uds.ugrid.sel(x=slice(0.0, 2.0), y=slice(0.0, 2.0))
        assert isinstance(out, xu.UgridDataset)
        assert len(out.grids) == 2

    def test_rename_topology(self, multi_uds):
        renamed = multi_uds.ugrid.rename({"mesh2d": "renamed"})
        names = {g.name for g in renamed.grids}
        assert "renamed" in names
        assert "network1d" in names
        # Data variable dims followed the rename.
        assert "renamed_nFaces" in renamed["a"].dims

    def test_bounds(self, multi_uds):
        bounds = multi_uds.ugrid.bounds
        assert set(bounds) == {"mesh2d", "network1d"}
        total = multi_uds.ugrid.total_bounds
        assert total == (0.0, 0.0, 4.0, 4.0)

    def test_to_dataset_roundtrip(self, multi_uds):
        ds = multi_uds.ugrid.to_dataset()
        back = xu.UgridDataset(ds)
        assert len(back.grids) == 2
        assert set(back.data_vars) == {"a", "q"}


class TestAccessorOps:
    def test_intersect_line(self, uda):
        section = uda.ugrid.intersect_line(
            start=(0.0, 2.1), end=(4.0, 2.1)
        )
        values = np.asarray(section.values)
        np.testing.assert_allclose(values, [8.0, 9.0, 10.0, 11.0])
        s = np.asarray(section.coords["mesh2d_s"].data)
        assert (np.diff(s) > 0).all()

    def test_intersect_linestring(self, uda):
        # Plain vertex-array linestrings work without shapely.
        line = np.array([[0.0, 0.5], [4.0, 0.5], [4.0, 2.5]])
        section = uda.ugrid.intersect_linestring(line)
        values = np.asarray(section.values)
        # First leg crosses the bottom row (faces 0-3), second leg climbs
        # the right column.
        np.testing.assert_allclose(values[:4], [0.0, 1.0, 2.0, 3.0])
        s = np.asarray(section.coords["mesh2d_s"].data)
        assert (np.diff(s) > 0).all()
        with pytest.raises(ValueError, match="shape"):
            uda.ugrid.intersect_linestring(np.zeros((3, 3)))

    def test_connected_components(self, uda):
        labels = uda.ugrid.connected_components()
        assert (np.asarray(labels.values) == 0).all()

    def test_reverse_cuthill_mckee(self, uda):
        out = uda.ugrid.reverse_cuthill_mckee()
        assert isinstance(out, xu.UgridDataArray)
        np.testing.assert_allclose(
            np.sort(np.asarray(out.values)),
            np.sort(np.asarray(uda.values)),
        )

    def test_to_periodic_nonperiodic(self, uda):
        periodic = uda.ugrid.to_periodic()
        assert isinstance(periodic, xu.UgridDataArray)
        back = periodic.ugrid.to_nonperiodic(xmax=4.0)
        assert back.grid.n_face == uda.grid.n_face

    def test_to_edge_and_node(self, uda):
        # Facet remaps keep a trailing dim of contributing entities
        # (reference dataarray_accessor.py:300-344).
        on_edge = uda.ugrid.to_edge()
        assert on_edge.dims == (uda.grid.edge_dimension, "nmax")
        values = np.asarray(on_edge.values)
        # Boundary edges have one contributing face; the other is NaN.
        assert np.isnan(values).any()
        efc = uda.grid.edge_face_connectivity
        interior = (efc >= 0).all(axis=1)
        assert not np.isnan(values[interior]).any()

        on_node = uda.ugrid.to_node()
        assert on_node.dims == (uda.grid.node_dimension, "nmax")
        with pytest.raises(ValueError, match="already face-associated"):
            uda.ugrid.to_face()

    def test_assign_coords_accessors(self, uda):
        with_face = uda.ugrid.assign_face_coords()
        assert "mesh2d_face_x" in with_face.coords
        with_node = uda.ugrid.assign_node_coords()
        assert "mesh2d_node_x" in with_node.coords


class TestZarrIO:
    def test_zarr_roundtrip(self, uda, tmp_path):
        path = tmp_path / "store.zarr"
        uda.ugrid.to_zarr(path)
        back = xu.open_zarr(path)
        assert isinstance(back, xu.UgridDataset)
        assert back.grid.equals(uda.grid)
        np.testing.assert_allclose(
            np.asarray(back["a"].values), np.asarray(uda.values)
        )

    def test_load_dataset(self, uda, tmp_path):
        path = tmp_path / "data.nc"
        uda.ugrid.to_netcdf(path)
        uds = xu.load_dataset(path)
        assert isinstance(uds, xu.UgridDataset)
        np.testing.assert_allclose(
            np.asarray(uds["a"].values), np.asarray(uda.values)
        )

    def test_open_dataarray(self, uda, tmp_path):
        path = tmp_path / "data.nc"
        uda.ugrid.to_netcdf(path)
        back = xu.open_dataarray(path)
        assert isinstance(back, xu.UgridDataArray)
        assert back.name == "a"


class TestRasterizeAndReindex:
    def test_rasterize_like(self, uda):
        raster = uda.ugrid.rasterize(resolution=1.0)
        like = uda.ugrid.rasterize_like(raster)
        np.testing.assert_allclose(
            np.asarray(raster.values), np.asarray(like.values), equal_nan=True
        )

    def test_dataset_rasterize(self, uds):
        raster = uds.ugrid.rasterize(resolution=1.0)
        assert "a" in raster.data_vars
        assert "x" in raster.coords and "y" in raster.coords

    def test_reindex_like_dataset(self, uda, grid):
        # Shuffle the face order; reindex back onto the original.
        order = np.random.default_rng(0).permutation(grid.n_face)
        shuffled_grid = grid.topology_subset(order)
        shuffled = xu.UgridDataArray(
            DataArray(
                np.asarray(uda.values)[order],
                dims=(shuffled_grid.face_dimension,),
                name="a",
            ),
            shuffled_grid,
        )
        back = shuffled.ugrid.reindex_like(uda.grid)
        np.testing.assert_allclose(
            np.asarray(back.values), np.asarray(uda.values)
        )
