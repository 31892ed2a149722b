"""
Randomized round-trip properties: structured regrids under coordinate
flips, NetCDF/zarr dataset round trips over the dtype zoo, and UGRID
convention round trips with nonstandard start_index/_FillValue.
Complements the fixed-fixture suites with the irregular parameter space
they miss.  Reference strategy: tests/test_regrid/test_structured.py
(flipping), xarray's backend round-trip tests.
"""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu import xdata

pytest.importorskip("scipy.spatial")
from scipy.spatial import Delaunay  # noqa: E402


class TestFlippedStructuredRegrid:
    @pytest.mark.parametrize("flip_x", [False, True])
    @pytest.mark.parametrize("flip_y", [False, True])
    def test_centroid_locator_matches_brute_force(self, flip_x, flip_y):
        rng = np.random.default_rng(53 + 2 * flip_x + flip_y)
        nx, ny = int(rng.integers(4, 10)), int(rng.integers(4, 10))
        x = np.cumsum(rng.uniform(0.5, 2.0, nx)) + 1.0
        y = np.cumsum(rng.uniform(0.5, 2.0, ny)) + 1.0
        dxs = np.diff(
            np.concatenate(
                [[x[0] - (x[1] - x[0]) / 2], (x[:-1] + x[1:]) / 2,
                 [x[-1] + (x[-1] - x[-2]) / 2]]
            )
        )
        dys = np.diff(
            np.concatenate(
                [[y[0] - (y[1] - y[0]) / 2], (y[:-1] + y[1:]) / 2,
                 [y[-1] + (y[-1] - y[-2]) / 2]]
            )
        )
        vals = rng.normal(size=(ny, nx))
        xs = x[::-1] if flip_x else x
        ys = y[::-1] if flip_y else y
        vs = vals[:, ::-1] if flip_x else vals
        vs = vs[::-1, :] if flip_y else vs
        dxv = dxs[::-1] if flip_x else dxs
        dyv = dys[::-1] if flip_y else dys
        src = xdata.DataArray(
            vs,
            dims=("y", "x"),
            coords={"y": ys, "x": xs, "dx": ("x", dxv), "dy": ("y", dyv)},
            name="v",
        )
        tx = np.linspace(x[0], x[-1], max(3, nx // 2))
        ty = np.linspace(y[0], y[-1], max(3, ny // 2))
        tgt = xdata.DataArray(
            np.zeros((len(ty), len(tx))),
            dims=("y", "x"),
            coords={"y": ty, "x": tx},
            name="t",
        )
        out = np.asarray(
            xu.CentroidLocatorRegridder(src, target=tgt).regrid(src).data
        )
        xb = np.concatenate([[x[0] - dxs[0] / 2], x + dxs / 2])
        yb = np.concatenate([[y[0] - dys[0] / 2], y + dys / 2])
        TY, TX = np.meshgrid(ty, tx, indexing="ij")
        ix = np.clip(np.searchsorted(xb, TX.ravel(), "right") - 1, 0, nx - 1)
        iy = np.clip(np.searchsorted(yb, TY.ravel(), "right") - 1, 0, ny - 1)
        expect = vals[iy, ix].reshape(out.shape)
        m = ~np.isnan(out)
        assert m.any()
        np.testing.assert_allclose(out[m], expect[m])


class TestDatasetRoundTripDtypes:
    @pytest.mark.parametrize("seed", [17, 18])
    def test_random_datasets(self, seed, tmp_path):
        rng = np.random.default_rng(seed)
        DTYPES = [
            np.float64, np.float32, np.int64, np.int32, np.int16,
            np.uint8, np.bool_,
        ]
        coerced = {
            np.dtype(np.int64): np.dtype(np.int32),
            np.dtype(np.uint8): np.dtype(np.int16),
            np.dtype(np.bool_): np.dtype(np.int8),
        }
        for trial in range(8):
            ds = xdata.Dataset()
            ndim = int(rng.integers(0, 4))
            dims = [f"d{k}" for k in range(ndim)]
            sizes = {d: int(rng.integers(1, 6)) for d in dims}
            for v in range(int(rng.integers(1, 5))):
                k = int(rng.integers(0, ndim + 1))
                vdims = (
                    tuple(rng.choice(dims, k, replace=False)) if k else ()
                )
                shape = tuple(sizes[d] for d in vdims)
                dt = DTYPES[int(rng.integers(0, len(DTYPES)))]
                if dt == np.bool_:
                    data = rng.random(shape) > 0.5
                elif np.issubdtype(dt, np.floating):
                    data = rng.normal(size=shape).astype(dt)
                    if rng.random() < 0.3 and data.size:
                        data.flat[0] = np.nan
                else:
                    data = rng.integers(0, 100, shape).astype(dt)
                ds[f"v{v}"] = (vdims, data, {"units": "m"})
            for d in dims:
                if rng.random() < 0.7:
                    ds = ds.assign_coords(
                        {d: np.arange(sizes[d], dtype=np.float64) * 1.5}
                    )
            ds.attrs["title"] = f"trial {trial}"

            ncp = tmp_path / f"t{trial}.nc"
            ds.to_netcdf(ncp)
            back = xdata.open_dataset(ncp)
            for v in ds.data_vars:
                a = np.asarray(ds[v].data)
                b = np.asarray(back[v].data)
                if a.dtype != b.dtype:
                    assert coerced.get(a.dtype) == b.dtype, (a.dtype, b.dtype)
                eq_nan = np.issubdtype(a.dtype, np.floating)
                assert np.array_equal(a, b, equal_nan=eq_nan), v
                assert ds[v].dims == back[v].dims
            assert back.attrs["title"] == ds.attrs["title"]

            zp = tmp_path / f"t{trial}.zarr"
            ds.to_zarr(zp)
            backz = xdata.open_zarr(zp)
            for v in ds.data_vars:
                a = np.asarray(ds[v].data)
                b = np.asarray(backz[v].data)
                eq_nan = np.issubdtype(a.dtype, np.floating)
                assert np.array_equal(a, b, equal_nan=eq_nan), v


class TestConventionRoundTrips:
    @pytest.mark.parametrize("seed", [41, 42])
    def test_start_index_and_fill(self, seed, tmp_path):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(20, 60))
        pts = rng.uniform(0, 10, (n, 2))
        grid = xu.Ugrid2d(
            pts[:, 0], pts[:, 1], -1,
            Delaunay(pts).simplices.astype(np.int64),
            name=f"mesh{seed}",
        )
        ds = grid.to_dataset()
        conn_name = next(
            c for c in ds.data_vars if c.endswith("face_nodes")
        )
        conn = np.asarray(ds[conn_name].data).copy()
        fill_mask = conn == -1
        conn = conn + 1
        conn[fill_mask] = 999
        attrs = dict(ds[conn_name].attrs)
        attrs["start_index"] = 1
        attrs["_FillValue"] = 999
        ds[conn_name] = (ds[conn_name].dims, conn, attrs)
        back = xu.Ugrid2d.from_dataset(ds)
        assert back.n_face == grid.n_face
        assert back.n_node == grid.n_node
        np.testing.assert_allclose(
            np.sort(back.area), np.sort(grid.area)
        )

        # full file round trip keeps topology name, areas, and data
        uds = xu.UgridDataset(grids=[grid])
        uds["v"] = xdata.DataArray(
            rng.normal(size=grid.n_face), dims=(grid.face_dimension,)
        )
        p = tmp_path / "m.nc"
        uds.ugrid.to_netcdf(p)
        back2 = xu.open_dataset(p)
        g2 = back2.ugrid.grids[0]
        assert g2.name == grid.name
        np.testing.assert_allclose(np.sort(g2.area), np.sort(grid.area))
        np.testing.assert_allclose(
            np.asarray(back2["v"].obj.data), np.asarray(uds["v"].obj.data)
        )
