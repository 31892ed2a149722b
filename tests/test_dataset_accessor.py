"""
UgridDatasetAccessor surface tests (reference:
tests/test_ugrid_dataset.py dataset-accessor sections): per-topology
dispatch, coordinate assignment, selection, rasterization, periodic
conversion, and reindexing on multi-variable datasets.
"""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu import xdata
from xugrid_tpu.xdata import DataArray, Dataset


def quad_grid(nx=4, dx=1.0, name="mesh2d"):
    x = np.arange(nx + 1.0) * dx
    yy, xx = np.meshgrid(x, x, indexing="ij")
    verts = np.column_stack([xx.ravel(), yy.ravel()])
    j, i = np.meshgrid(np.arange(nx), np.arange(nx), indexing="ij")
    nid = lambda a, b: b * (nx + 1) + a  # noqa: E731
    faces = np.stack(
        [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)], axis=-1
    ).reshape(-1, 4)
    return xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces, name=name)


@pytest.fixture
def uds():
    grid = quad_grid()
    ds = Dataset()
    ds["fz"] = DataArray(
        np.arange(grid.n_face, dtype=float), dims=(grid.face_dimension,)
    )
    ds["nz"] = DataArray(
        np.hypot(grid.node_x, grid.node_y), dims=(grid.node_dimension,)
    )
    return xu.UgridDataset(ds, [grid])


class TestBasics:
    def test_topology_and_bounds(self, uds):
        topo = uds.ugrid.topology
        assert set(topo) == {"mesh2d"}
        b = uds.ugrid.bounds["mesh2d"]
        assert b == (0.0, 0.0, 4.0, 4.0)
        assert uds.ugrid.total_bounds == (0.0, 0.0, 4.0, 4.0)
        assert uds.ugrid.name == "mesh2d"
        assert uds.ugrid.names == ["mesh2d"]

    def test_assign_coords_all_facets(self, uds):
        out = uds.ugrid.assign_node_coords()
        assert "mesh2d_node_x" in out.coords
        out = out.ugrid.assign_face_coords()
        assert "mesh2d_face_x" in out.coords
        out = out.ugrid.assign_edge_coords()
        assert "mesh2d_edge_x" in out.coords

    def test_set_node_coords(self, uds):
        with_coords = uds.ugrid.assign_node_coords()
        renamed = with_coords.rename(
            {"mesh2d_node_x": "lon", "mesh2d_node_y": "lat"}
        )
        out = renamed.ugrid.set_node_coords("lon", "lat")
        assert out is None or out  # mutates/returns per implementation


class TestSelection:
    def test_sel_box(self, uds):
        out = uds.ugrid.sel(x=slice(0, 2), y=slice(0, 2))
        assert out.grids[0].n_face == 4
        assert out["fz"].shape == (4,)
        # node-associated variables subset consistently too
        assert out["nz"].shape == (out.grids[0].n_node,)

    def test_sel_points(self, uds):
        out = uds.ugrid.sel_points(
            x=np.array([0.5, 3.5]), y=np.array([0.5, 3.5])
        )
        np.testing.assert_allclose(np.asarray(out["fz"].values), [0.0, 15.0])

    def test_intersect_line(self, uds):
        out = uds.ugrid.intersect_line(start=(0.0, 0.5), end=(4.0, 0.5))
        # Crosses the bottom row: 4 faces.
        assert np.asarray(out["fz"].values).shape == (4,)
        np.testing.assert_allclose(
            np.sort(np.asarray(out["fz"].values)), [0.0, 1.0, 2.0, 3.0]
        )


class TestRasterize:
    def test_rasterize_resolution(self, uds):
        out = uds.ugrid.rasterize(resolution=0.5)
        assert isinstance(out, xdata.Dataset)
        assert out["fz"].shape == (8, 8)
        # Raster convention: y descends, so row 0 is the TOP row.
        assert float(np.asarray(out["fz"].data)[0, 0]) == 12.0
        assert float(np.asarray(out["fz"].data)[-1, 0]) == 0.0
        # Node-dim variables pass through untouched (isel semantics).
        assert out["nz"].shape == (25,)

    def test_rasterize_like(self, uds):
        template = uds.ugrid.rasterize(resolution=1.0)
        out = uds.ugrid.rasterize_like(template)
        assert out["fz"].shape == (4, 4)
        np.testing.assert_allclose(
            np.asarray(out["fz"].data)[::-1].ravel(), np.arange(16.0)
        )


class TestPeriodic:
    def test_roundtrip(self):
        # A global-wrap grid: to_periodic merges the seam, to_nonperiodic
        # restores it.
        grid = quad_grid(nx=6, dx=60.0)  # 0..360
        ds = Dataset()
        ds["fz"] = DataArray(
            np.arange(grid.n_face, dtype=float), dims=(grid.face_dimension,)
        )
        uds = xu.UgridDataset(ds, [grid])
        per = uds.ugrid.to_periodic()
        assert per.grids[0].n_node < grid.n_node  # seam nodes merged
        back = per.ugrid.to_nonperiodic(xmax=360.0)
        assert back.grids[0].n_face == grid.n_face


class TestReindex:
    def test_reindex_like_shuffled(self, uds):
        grid = uds.grids[0]
        rng = np.random.default_rng(0)
        perm = rng.permutation(grid.n_face)
        ds2 = Dataset()
        ds2["fz"] = DataArray(
            np.asarray(uds["fz"].values)[perm], dims=(grid.face_dimension,)
        )
        shuffled_grid = xu.Ugrid2d(
            grid.node_x, grid.node_y, -1,
            grid.face_node_connectivity[perm], name="mesh2d",
        )
        shuffled = xu.UgridDataset(ds2, [shuffled_grid])
        out = shuffled.ugrid.reindex_like(uds)
        np.testing.assert_allclose(
            np.asarray(out["fz"].values), np.asarray(uds["fz"].values)
        )


class TestMultiTopologyDispatch:
    def test_single_grid_methods_raise_on_multi(self):
        g1 = quad_grid(name="a")
        g2 = quad_grid(name="b", dx=2.0)
        ds = Dataset()
        ds["va"] = DataArray(
            np.zeros(g1.n_face), dims=(g1.face_dimension,)
        )
        # Distinct face dims per topology name.
        uds = xu.UgridDataset(ds, [g1])
        uds["vb"] = xu.UgridDataArray(
            DataArray(np.zeros(g2.n_face), dims=(g2.face_dimension,)), g2
        )
        with pytest.raises(ValueError):
            _ = uds.ugrid.grid  # ambiguous

    def test_to_dataset_roundtrip_with_attrs(self, uds):
        flat = uds.ugrid.to_dataset(optional_attributes=True)
        back = xu.UgridDataset(flat)
        assert back.grids[0].n_face == uds.grids[0].n_face
        assert set(back.data_vars) == set(uds.data_vars)
