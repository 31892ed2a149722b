"""
Out-of-core (lazy) open + regrid: the xdata analog of the reference's
dask laziness (xugrid/regrid/regridder.py:167-186).
"""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu import xdata
from xugrid_tpu.xdata import DataArray, Dataset
from xugrid_tpu.xdata.lazy import LazyArray, is_lazy, max_single_load


def make_mesh(nx=8):
    xs, ys = np.meshgrid(np.arange(nx + 1.0), np.arange(nx + 1.0))
    nid = lambda i, j: j * (nx + 1) + i  # noqa: E731
    i, j = np.meshgrid(np.arange(nx), np.arange(nx), indexing="xy")
    faces = np.stack(
        [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)], -1
    ).reshape(-1, 4)
    return xu.Ugrid2d(xs.ravel(), ys.ravel(), -1, faces)


def write_time_face_nc(path, grid, n_time=40, scale=None):
    rng = np.random.default_rng(7)
    data = rng.normal(size=(n_time, grid.n_face))
    da = DataArray(
        data,
        dims=("time", grid.face_dimension),
        name="depth",
        coords={"time": np.arange(n_time)},
    )
    uda = xu.UgridDataArray(da, grid)
    ds = uda.ugrid.to_dataset()
    if scale is not None:
        packed = np.round(data / scale).astype(np.int32)
        ds["depth"] = DataArray(
            packed, dims=("time", grid.face_dimension),
            attrs={"scale_factor": scale},
        )
        data = packed * scale
    ds.to_netcdf(path)
    return data


class TestLazyArray:
    def test_slicing_composition(self):
        base = np.arange(600.0).reshape(30, 20)
        log = []
        arr = LazyArray(lambda s, e: base[s:e], base.shape, base.dtype, log)
        sub = arr[5:25]
        assert is_lazy(sub)
        sub2 = sub[2:10]
        np.testing.assert_array_equal(np.asarray(sub2), base[7:15])
        # only the requested rows were read
        assert max(log) == base[7:15].nbytes
        np.testing.assert_array_equal(arr[3], base[3])
        np.testing.assert_array_equal(
            np.asarray(arr[4:8, 2:5]), base[4:8, 2:5]
        )

    def test_materialize_matches(self):
        base = np.arange(24.0).reshape(6, 4)
        arr = LazyArray(lambda s, e: base[s:e], base.shape, base.dtype)
        np.testing.assert_array_equal(np.asarray(arr), base)


class TestLazyNetcdf:
    def test_open_lazy_matches_eager(self, tmp_path, monkeypatch):
        import xugrid_tpu.xdata.lazy as lazy_mod

        monkeypatch.setattr(lazy_mod, "LAZY_MIN_BYTES", 1024)
        grid = make_mesh()
        p = tmp_path / "d.nc"
        data = write_time_face_nc(p, grid)
        eager = xdata.open_dataset(p, engine="scipy")
        lazy = xdata.open_dataset(p, engine="scipy", lazy=True)
        assert is_lazy(lazy["depth"].data)
        np.testing.assert_allclose(
            np.asarray(lazy["depth"].data), np.asarray(eager["depth"].data)
        )
        np.testing.assert_allclose(np.asarray(lazy["depth"].data), data)

    def test_cf_decode_per_block(self, tmp_path, monkeypatch):
        import xugrid_tpu.xdata.lazy as lazy_mod

        monkeypatch.setattr(lazy_mod, "LAZY_MIN_BYTES", 1024)
        grid = make_mesh()
        p = tmp_path / "packed.nc"
        data = write_time_face_nc(p, grid, scale=0.01)
        lazy = xdata.open_dataset(p, engine="scipy", lazy=True)
        assert is_lazy(lazy["depth"].data)
        block = np.asarray(lazy["depth"].data[3:7])
        np.testing.assert_allclose(block, data[3:7], rtol=1e-12)

    def test_isel_stays_lazy(self, tmp_path, monkeypatch):
        import xugrid_tpu.xdata.lazy as lazy_mod

        monkeypatch.setattr(lazy_mod, "LAZY_MIN_BYTES", 1024)
        grid = make_mesh()
        p = tmp_path / "d.nc"
        data = write_time_face_nc(p, grid)
        lazy = xdata.open_dataset(p, engine="scipy", lazy=True)
        sub = lazy["depth"].isel(time=slice(10, 20))
        assert is_lazy(sub.data)
        np.testing.assert_allclose(np.asarray(sub.data), data[10:20])


class TestLazyZarr:
    def test_open_lazy_matches_eager(self, tmp_path, monkeypatch):
        import xugrid_tpu.xdata.lazy as lazy_mod

        monkeypatch.setattr(lazy_mod, "LAZY_MIN_BYTES", 1024)
        ds = Dataset()
        rng = np.random.default_rng(3)
        ds["v"] = DataArray(
            rng.normal(size=(20, 500)), dims=("t", "x")
        )
        store = tmp_path / "s.zarr"
        ds.to_zarr(store)
        lazy = xdata.open_zarr(store, lazy=True)
        assert is_lazy(lazy["v"].data)
        np.testing.assert_allclose(
            np.asarray(lazy["v"].data), np.asarray(ds["v"].data)
        )
        np.testing.assert_allclose(
            np.asarray(lazy["v"].data[4:9]), np.asarray(ds["v"].data)[4:9]
        )


class TestLazyRegrid:
    def test_chunked_regrid_streams(self, tmp_path, monkeypatch):
        """Open lazily and regrid with a working-set budget far below
        the dataset size: results match the eager path and no single
        store read materializes more than ~one chunk."""
        import xugrid_tpu.xdata.lazy as lazy_mod

        monkeypatch.setattr(lazy_mod, "LAZY_MIN_BYTES", 1024)
        grid = make_mesh(10)
        p = tmp_path / "big.nc"
        write_time_face_nc(p, grid, n_time=64)

        uds_eager = xu.open_dataset(p)
        uds_lazy = xu.open_dataset(p, lazy=True)
        target = make_mesh(5)
        # scale the target mesh onto the source extent
        tgt = xu.Ugrid2d(
            target.node_x * 2.0, target.node_y * 2.0, -1,
            target.face_node_connectivity,
        )
        regridder = xu.OverlapRegridder(
            uds_eager["depth"], xu.UgridDataArray(
                DataArray(
                    np.zeros(tgt.n_face), dims=(tgt.face_dimension,)
                ), tgt,
            ),
        )
        want = regridder.regrid(uds_eager["depth"])

        # tiny budget: one chunk = a handful of time slices
        full_bytes = 64 * grid.n_face * 8
        monkeypatch.setenv(
            "XUGRID_TPU_APPLY_CHUNK_BYTES", str(full_bytes // 8)
        )
        lazy_da = uds_lazy["depth"]
        assert is_lazy(lazy_da.data)
        got = regridder.regrid(lazy_da)
        np.testing.assert_allclose(
            np.asarray(got.data), np.asarray(want.data), rtol=1e-6
        )
        assert max_single_load(lazy_da.data) < full_bytes / 2
