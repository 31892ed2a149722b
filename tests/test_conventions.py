"""
UGRID conventions discovery + CRS attrs (reference test strategy:
tests/test_conventions.py, tests/test_crs.py).
"""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu.ugrid import conventions
from xugrid_tpu.ugrid.crs import crs_from_attrs, crs_to_attrs
from xugrid_tpu.xdata import DataArray, Dataset


@pytest.fixture
def ugrid_ds():
    grid = xu.Ugrid2d(
        np.array([0.0, 1.0, 1.0, 0.0]),
        np.array([0.0, 0.0, 1.0, 1.0]),
        -1,
        np.array([[0, 1, 2, 3]]),
    )
    ds = grid.to_dataset()
    ds["data"] = DataArray(np.ones(1), dims=(grid.face_dimension,))
    return grid, ds


class TestUgridRoles:
    def test_topology_discovery(self, ugrid_ds):
        grid, ds = ugrid_ds
        roles = xu.ugrid_roles(ds)
        assert roles.topology == [grid.name]

    def test_coordinates(self, ugrid_ds):
        grid, ds = ugrid_ds
        coords = xu.ugrid_roles(ds).coordinates
        node_x, node_y = coords[grid.name]["node_coordinates"]
        assert node_x == [f"{grid.name}_node_x"]
        assert node_y == [f"{grid.name}_node_y"]

    def test_dimensions(self, ugrid_ds):
        grid, ds = ugrid_ds
        dims = xu.ugrid_roles(ds).dimensions[grid.name]
        assert dims["node_dimension"] == grid.node_dimension
        assert dims["face_dimension"] == grid.face_dimension

    def test_connectivity(self, ugrid_ds):
        grid, ds = ugrid_ds
        conn = xu.ugrid_roles(ds).connectivity[grid.name]
        assert (
            conn["face_node_connectivity"]
            == f"{grid.name}_face_nodes"
        )

    def test_getitem_and_repr(self, ugrid_ds):
        grid, ds = ugrid_ds
        roles = xu.ugrid_roles(ds)
        per_topology = roles[grid.name]
        assert per_topology["face_dimension"] == grid.face_dimension
        assert (
            per_topology["face_node_connectivity"]
            == f"{grid.name}_face_nodes"
        )
        with pytest.raises(KeyError):
            roles["not_a_topology"]
        text = repr(roles)
        assert "UGRID" in text or grid.name in text

    def test_no_topology(self):
        ds = Dataset({"x": DataArray(np.arange(3.0), dims=("i",))})
        assert xu.ugrid_roles(ds).topology == []

    def test_default_topology_attrs(self):
        attrs1 = conventions.default_topology_attrs("net", 1)
        assert attrs1["cf_role"] == "mesh_topology"
        assert attrs1["topology_dimension"] == 1
        assert "edge_dimension" in attrs1
        attrs2 = conventions.default_topology_attrs("mesh2d", 2)
        assert attrs2["topology_dimension"] == 2
        assert "face_dimension" in attrs2
        assert attrs2["face_node_connectivity"] == "mesh2d_face_nodes"

    def test_orientation_fix(self, ugrid_ds):
        # A transposed connectivity (nmax, nface) must still infer the
        # face dimension correctly from the declared coordinates.
        grid, ds = ugrid_ds
        dims = xu.ugrid_roles(ds).dimensions[grid.name]
        fn = ds[f"{grid.name}_face_nodes"]
        assert dims["face_dimension"] in fn.dims


class TestCrsAttrs:
    def test_roundtrip(self):
        pyproj = pytest.importorskip("pyproj")
        crs = pyproj.CRS.from_epsg(28992)
        attrs = crs_to_attrs(crs)
        assert "crs_wkt" in attrs
        back = crs_from_attrs(attrs)
        assert back.to_epsg() == 28992

    def test_from_epsg_code_attr(self):
        pyproj = pytest.importorskip("pyproj")
        attrs = {"epsg": 4326}
        crs = crs_from_attrs(attrs)
        assert crs.to_epsg() == 4326

    def test_grid_set_crs(self, ugrid_ds):
        pyproj = pytest.importorskip("pyproj")
        grid, _ = ugrid_ds
        grid.set_crs(epsg=4326)
        assert grid.crs.to_epsg() == 4326
        # Overriding without allow_override must raise.
        with pytest.raises(ValueError):
            grid.set_crs(epsg=28992)
        grid.set_crs(epsg=28992, allow_override=True)
        assert grid.crs.to_epsg() == 28992

    def test_to_crs_transforms(self, ugrid_ds):
        pyproj = pytest.importorskip("pyproj")
        grid, _ = ugrid_ds
        grid.set_crs(epsg=4326)
        out = grid.to_crs(epsg=3857)
        assert out.crs.to_epsg() == 3857
        assert not np.allclose(out.node_x, grid.node_x)

    def test_write_grid_mapping(self, ugrid_ds):
        pyproj = pytest.importorskip("pyproj")
        grid, _ = ugrid_ds
        grid.set_crs(epsg=4326)
        ds = grid.to_dataset()
        names = [
            name
            for name in ds.data_vars
            if "grid_mapping_name" in ds[name].attrs
            or "crs_wkt" in ds[name].attrs
        ]
        assert names  # a grid-mapping variable was written


class TestMultiTopologyRoles:
    @pytest.fixture
    def multi_ds(self):
        import xugrid_tpu as xu

        grid2d = xu.Ugrid2d(
            np.array([0.0, 1.0, 1.0, 0.0]),
            np.array([0.0, 0.0, 1.0, 1.0]),
            -1,
            np.array([[0, 1, 2, 3]]),
            name="mesh2d",
        )
        grid1d = xu.Ugrid1d(
            np.array([0.0, 1.0]),
            np.array([0.0, 1.0]),
            -1,
            np.array([[0, 1]]),
            name="network1d",
        )
        ds = grid2d.to_dataset()
        ds.update(grid1d.to_dataset())
        return ds

    def test_topology_discovery(self, multi_ds):
        from xugrid_tpu.ugrid.conventions import ugrid_roles

        roles = ugrid_roles(multi_ds)
        assert set(roles.topology) == {"mesh2d", "network1d"}

    def test_dimensions_per_topology(self, multi_ds):
        from xugrid_tpu.ugrid.conventions import ugrid_roles

        dims = ugrid_roles(multi_ds).dimensions
        assert "mesh2d" in dims and "network1d" in dims
        assert dims["mesh2d"]["face_dimension"] == "mesh2d_nFaces"
        assert "face_dimension" not in dims["network1d"]

    def test_repr_lists_both(self, multi_ds):
        from xugrid_tpu.ugrid.conventions import ugrid_roles

        text = repr(ugrid_roles(multi_ds))
        assert "mesh2d" in text and "network1d" in text

    def test_dataset_wraps_both(self, multi_ds):
        import xugrid_tpu as xu

        uds = xu.UgridDataset(multi_ds)
        assert len(uds.grids) == 2
