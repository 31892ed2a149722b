"""Sample-data registry + loaders (reference test strategy:
tests/test_data.py exercises the pooch registry; here the local-dir
registry with synthetic fallbacks)."""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu.data import registry


class TestRegistry:
    def test_unknown_file_raises(self):
        with pytest.raises(ValueError, match="Unknown sample file"):
            registry.fetch("bogus.nc")

    def test_missing_returns_none(self, monkeypatch, tmp_path):
        monkeypatch.setenv("XUGRID_DATA_DIR", str(tmp_path))
        monkeypatch.delenv("XUGRID_TPU_ALLOW_DOWNLOAD", raising=False)
        assert registry.fetch("elevation_nl.nc") is None

    def test_data_dir_priority(self, monkeypatch, tmp_path):
        monkeypatch.setenv("XUGRID_DATA_DIR", str(tmp_path))
        p = tmp_path / "xoxo_vertices.txt"
        p.write_text("0.0 0.0\n1.0 0.0\n0.0 1.0\n")
        assert registry.fetch("xoxo_vertices.txt") == str(p)


class TestLoaders:
    def test_xoxo_real_files(self, monkeypatch, tmp_path):
        monkeypatch.setenv("XUGRID_DATA_DIR", str(tmp_path))
        (tmp_path / "xoxo_vertices.txt").write_text(
            "0.0 0.0\n1.0 0.0\n1.0 1.0\n0.0 1.0\n"
        )
        (tmp_path / "xoxo_triangles.txt").write_text("0 1 2\n0 2 3\n")
        grid = xu.data.xoxo()
        assert grid.n_face == 2
        assert grid.n_node == 4

    def test_real_netcdf_sample(self, monkeypatch, tmp_path):
        # A real (locally written) UGRID netCDF file takes priority over
        # the synthetic stand-in in elevation_nl.
        from xugrid_tpu.xdata import DataArray

        x = np.arange(4.0)
        grid = xu.Ugrid2d.from_structured_intervals1d(x, x)
        uda = xu.UgridDataArray(
            DataArray(
                np.arange(grid.n_face, dtype=float),
                dims=(grid.face_dimension,),
                name="elevation",
            ),
            grid,
        )
        monkeypatch.setenv("XUGRID_DATA_DIR", str(tmp_path))
        uda.ugrid.to_netcdf(tmp_path / "elevation_nl.nc")
        out = xu.data.elevation_nl()
        assert out.name == "elevation"
        assert out.ugrid.grid.n_face == 9

    def test_synthetic_fallbacks(self, monkeypatch, tmp_path):
        monkeypatch.setenv("XUGRID_DATA_DIR", str(tmp_path))
        assert xu.data.xoxo().n_face > 100  # synthetic
        uda = xu.data.elevation_nl(n_points=2000)
        assert uda.name == "elevation"
        uds = xu.data.adh_san_diego(n_times=3)
        assert len(uds.data_vars) > 0

    def test_disk_facets(self):
        uds = xu.data.disk()
        assert {"node_z", "edge_z", "face_z"} <= set(uds.data_vars)
        grid = uds.grids[0]
        assert uds["face_z"].shape == (grid.n_face,)
