"""Tests for the xdata labeled-array core."""

import numpy as np
import pytest

from xugrid_tpu import xdata
from xugrid_tpu.xdata import DataArray, Dataset, Variable


@pytest.fixture
def da():
    return DataArray(
        np.arange(12.0).reshape(3, 4),
        coords={"time": [10, 20, 30], "x": [0.0, 1.0, 2.0, 3.0]},
        dims=("time", "x"),
        name="v",
        attrs={"units": "m"},
    )


class TestVariable:
    def test_basic(self):
        v = Variable(("a", "b"), np.zeros((2, 3)))
        assert v.shape == (2, 3)
        assert v.sizes == {"a": 2, "b": 3}
        with pytest.raises(ValueError, match="dimensions"):
            Variable(("a",), np.zeros((2, 3)))

    def test_isel_outer_indexing(self):
        v = Variable(("a", "b"), np.arange(12).reshape(3, 4))
        out = v.isel({"a": np.array([0, 2]), "b": np.array([1, 3])})
        # outer (orthogonal) indexing: 2x2 result, not pointwise
        assert out.shape == (2, 2)
        assert np.array_equal(out.data, [[1, 3], [9, 11]])

    def test_broadcast(self):
        a = Variable(("x",), np.array([1.0, 2.0]))
        b = Variable(("y",), np.array([10.0, 20.0, 30.0]))
        a2, b2 = xdata.broadcast_variables(a, b)
        assert a2.dims == ("x", "y")
        assert a2.shape == (2, 3)

    def test_transpose(self):
        v = Variable(("a", "b"), np.arange(6).reshape(2, 3))
        assert v.transpose("b", "a").shape == (3, 2)


class TestDataArray:
    def test_construction(self, da):
        assert da.dims == ("time", "x")
        assert da.shape == (3, 4)
        assert da.name == "v"
        assert da.attrs["units"] == "m"
        assert list(da.coords) == ["time", "x"]

    def test_isel(self, da):
        out = da.isel(time=0)
        assert out.dims == ("x",)
        assert np.array_equal(out.values, [0, 1, 2, 3])
        # scalar coord retained
        assert out.coords["time"].values == 10
        out2 = da.isel(x=[0, 2])
        assert out2.shape == (3, 2)
        assert np.array_equal(out2.coords["x"].values, [0.0, 2.0])

    def test_isel_missing_dim_raises(self, da):
        with pytest.raises(ValueError, match="do not exist"):
            da.isel(bogus=0)

    def test_sel_scalar(self, da):
        out = da.sel(time=20)
        assert out.dims == ("x",)
        assert np.array_equal(out.values, [4, 5, 6, 7])

    def test_sel_slice(self, da):
        out = da.sel(x=slice(1.0, 2.5))
        assert out.shape == (3, 2)
        assert np.array_equal(out.coords["x"].values, [1.0, 2.0])

    def test_sel_array(self, da):
        out = da.sel(time=[10, 30])
        assert out.shape == (2, 4)

    def test_sel_nearest(self, da):
        out = da.sel(x=1.2, method="nearest")
        assert np.array_equal(out.values, da.isel(x=1).values)

    def test_sel_missing_raises(self, da):
        with pytest.raises(KeyError):
            da.sel(time=15)

    def test_arithmetic_broadcast(self, da):
        weights = DataArray([1.0, 2.0, 3.0, 4.0], coords={"x": da.coords["x"].values}, dims=("x",))
        out = da * weights
        assert out.dims == ("time", "x")
        assert np.array_equal(out.values[0], [0, 2, 6, 12])

    def test_arithmetic_scalar(self, da):
        out = da + 1
        assert out.values[0, 0] == 1.0
        out = 2 * da
        assert out.values[0, 1] == 2.0

    def test_comparison(self, da):
        mask = da > 5
        assert mask.dtype == bool
        assert mask.values.sum() == 6

    def test_reductions(self, da):
        assert da.mean().values == 5.5
        m = da.mean(dim="time")
        assert m.dims == ("x",)
        assert np.allclose(m.values, [4, 5, 6, 7])

    def test_reduction_skipna(self):
        arr = DataArray([1.0, np.nan, 3.0], dims=("x",))
        assert arr.mean().values == 2.0
        assert np.isnan(arr.mean(skipna=False).values)

    def test_where(self, da):
        out = da.where(da > 5)
        assert np.isnan(out.values[0, 0])
        assert out.values[2, 3] == 11.0
        out2 = da.where(da > 5, -1)
        assert out2.values[0, 0] == -1

    def test_where_drop(self, da):
        cond = da.coords["time"] > 10
        out = da.where(cond, drop=True)
        assert out.sizes["time"] == 2

    def test_fillna_notnull(self):
        arr = DataArray([1.0, np.nan], dims=("x",))
        assert np.array_equal(arr.fillna(0.0).values, [1.0, 0.0])
        assert np.array_equal(arr.notnull().values, [True, False])
        assert np.array_equal(arr.isnull().values, [False, True])

    def test_rename(self, da):
        out = da.rename("w")
        assert out.name == "w"
        out2 = da.rename({"x": "lon"})
        assert out2.dims == ("time", "lon")
        assert "lon" in out2._coords

    def test_transpose(self, da):
        out = da.transpose("x", "time")
        assert out.shape == (4, 3)

    def test_squeeze_expand(self, da):
        e = da.expand_dims("layer")
        assert e.dims == ("layer", "time", "x")
        s = e.squeeze("layer", drop=True)
        assert s.dims == ("time", "x")

    def test_assign_coords(self, da):
        out = da.assign_coords(y=("x", [9.0, 8.0, 7.0, 6.0]))
        assert "y" in out._coords
        assert out.coords["y"].dims == ("x",)

    def test_getitem_coord(self, da):
        t = da["time"]
        assert isinstance(t, DataArray)
        assert np.array_equal(t.values, [10, 20, 30])

    def test_equals_identical(self, da):
        assert da.equals(da.copy())
        assert da.identical(da.copy())
        assert not da.equals(da + 1)
        renamed = da.rename("other")
        assert renamed.equals(da)
        assert not renamed.identical(da)

    def test_to_dataset(self, da):
        ds = da.to_dataset()
        assert "v" in ds
        assert ds["v"].equals(da)

    def test_diff(self, da):
        out = da.diff("x")
        assert out.shape == (3, 3)
        assert np.allclose(out.values, 1.0)

    def test_stack_dims(self):
        arr = DataArray(np.arange(24).reshape(2, 3, 4), dims=("t", "y", "x"))
        out = arr.stack_dims("face", ["y", "x"])
        assert out.dims == ("t", "face")
        assert out.shape == (2, 12)
        assert np.array_equal(out.values[0], np.arange(12))


class TestDataset:
    @pytest.fixture
    def ds(self, da):
        ds = da.to_dataset()
        ds["w"] = (("x",), np.array([1.0, 2.0, 3.0, 4.0]))
        ds.attrs["title"] = "test"
        return ds

    def test_basic(self, ds):
        assert set(ds.data_vars) == {"v", "w"}
        assert set(ds.coords) == {"time", "x"}
        assert ds.sizes == {"time": 3, "x": 4}

    def test_getitem_list(self, ds):
        sub = ds[["v"]]
        assert set(sub.data_vars) == {"v"}
        assert set(sub.coords) == {"time", "x"}

    def test_isel_sel(self, ds):
        out = ds.isel(time=0)
        assert out["v"].dims == ("x",)
        assert out["w"].dims == ("x",)
        out2 = ds.sel(x=slice(0, 1.5))
        assert out2.sizes["x"] == 2

    def test_drop_rename(self, ds):
        assert set(ds.drop_vars("w").data_vars) == {"v"}
        r = ds.rename({"v": "vv", "x": "lon"})
        assert "vv" in r
        assert r["vv"].dims == ("time", "lon")

    def test_merge(self, ds):
        other = Dataset({"q": (("time",), np.zeros(3))})
        merged = ds.merge(other)
        assert set(merged.data_vars) == {"v", "w", "q"}
        conflicting = Dataset({"w": (("x",), np.zeros(4))})
        with pytest.raises(ValueError, match="conflicting"):
            ds.merge(conflicting)

    def test_concat(self, ds):
        c = xdata.concat([ds, ds], dim="time")
        assert c.sizes["time"] == 6
        # w has no time dim and equal values: not concatenated
        assert c["w"].dims == ("x",)

    def test_map(self, ds):
        out = ds.map(lambda a: a * 2)
        assert np.array_equal(out["w"].values, [2, 4, 6, 8])

    def test_to_dataframe(self, ds):
        df = ds.to_dataframe()
        assert set(df.columns) == {"v", "w"}
        assert len(df) == 12

    def test_to_dataframe_dim_order(self, ds):
        default = ds.to_dataframe()
        reordered = ds.to_dataframe(dim_order=list(default.index.names)[::-1])
        assert list(reordered.index.names) == list(default.index.names)[::-1]
        # same values, addressed with swapped key order
        key = default.index[0]
        assert (
            reordered.loc[tuple(reversed(key)), "v"]
            == default.loc[key, "v"]
        )
        with pytest.raises(ValueError, match="dim_order"):
            ds.to_dataframe(dim_order=[default.index.names[0]])

    def test_full_like(self, ds):
        f = xdata.full_like(ds, 7.0)
        assert (f["v"].values == 7.0).all()
        assert np.array_equal(f.coords["x"].values, [0, 1, 2, 3])


class TestIO:
    def test_netcdf_roundtrip(self, da, tmp_path):
        ds = da.to_dataset()
        ds["conn"] = (
            ("face", "nmax"),
            np.array([[0, 1, 2, -1], [1, 2, 3, -1]], dtype=np.int32),
            {"_FillValue": -1, "start_index": 0},
        )
        path = tmp_path / "test.nc"
        ds.to_netcdf(path)
        back = xdata.open_dataset(path)
        assert set(back.data_vars) == {"v", "conn"}
        assert np.allclose(back["v"].values, da.values)
        assert back["v"].attrs["units"] == "m"
        # integer var with _FillValue stays integer; attr moved to encoding
        assert back["conn"].dtype.kind == "i"
        assert back["conn"].encoding["_FillValue"] == -1
        assert np.array_equal(back.coords["x"].values, [0, 1, 2, 3])

    def test_attr_coercion_roundtrip(self, tmp_path):
        # numpy-typed attributes crashed scipy (int64 typecode missing)
        # and json (np.bool_); float attrs silently dropped to f32.
        attrs = {
            "np_int": np.int64(7),
            "np_bool": np.True_,
            "precise": 0.1234567890123456789,
            "iarr64": np.array([1, 2], np.int64),
            "text": "hello",
        }
        ds = xdata.Dataset()
        ds["v"] = (("x",), np.arange(3.0), dict(attrs))
        ds.attrs["gattr"] = np.int64(3)

        p = tmp_path / "attrs.nc"
        ds.to_netcdf(p)
        back = xdata.open_dataset(p)
        a = dict(back["v"].attrs)
        assert a["np_int"] == 7
        assert a["np_bool"] == 1
        assert abs(float(a["precise"]) - attrs["precise"]) < 1e-15
        assert list(np.asarray(a["iarr64"])) == [1, 2]
        assert back.attrs["gattr"] == 3

        z = tmp_path / "attrs.zarr"
        ds.to_zarr(z)
        backz = xdata.open_zarr(z)
        az = dict(backz["v"].attrs)
        assert az["np_int"] == 7
        assert az["np_bool"] in (True, 1)
        assert abs(float(az["precise"]) - attrs["precise"]) < 1e-15

    def test_netcdf_string_roundtrip(self, tmp_path):
        # Strings were silently DROPPED on the NetCDF3 path; now they
        # use the CF char-array encoding (trailing string{N} dim).
        ds = xdata.Dataset()
        ds["names"] = (("x",), np.array(["alpha", "be", "gamma!"], "U"))
        ds["codes"] = (("x",), np.array([b"ab", b"c", b"de"], "S2"))
        ds["title_var"] = ((), np.str_("hello"))
        path = tmp_path / "strings.nc"
        ds.to_netcdf(path)
        back = xdata.open_dataset(path)
        assert list(np.asarray(back["names"].data)) == [
            b"alpha", b"be", b"gamma!",
        ]
        assert back["names"].dims == ("x",)
        assert list(np.asarray(back["codes"].data)) == [b"ab", b"c", b"de"]
        assert np.asarray(back["title_var"].data)[()] == b"hello"

    def test_zarr_zero_length_roundtrip(self, tmp_path):
        # Zero-length dims previously crashed the chunk-grid math with
        # ZeroDivisionError; zarr requires chunk lengths >= 1.
        ds = xdata.Dataset()
        ds["empty"] = (("x",), np.zeros((0,), np.float64))
        ds["e2"] = (("x", "y"), np.zeros((0, 3), np.int32))
        ds["v"] = (("y",), np.arange(3.0))
        store = tmp_path / "e.zarr"
        ds.to_zarr(store)
        back = xdata.open_zarr(store)
        assert np.asarray(back["empty"].data).shape == (0,)
        assert np.asarray(back["e2"].data).shape == (0, 3)
        np.testing.assert_allclose(np.asarray(back["v"].data), [0, 1, 2])

    def test_zarr_consolidated_metadata(self, da, tmp_path):
        # xarray's open_zarr reads .zmetadata by default
        # (consolidated=True); the writer must emit it.
        import json

        store = tmp_path / "c.zarr"
        da.to_dataset().to_zarr(store)
        meta = json.loads((store / ".zmetadata").read_text())
        assert meta["zarr_consolidated_format"] == 1
        assert "v/.zarray" in meta["metadata"]
        assert ".zgroup" in meta["metadata"]
        # entries mirror the on-disk files
        on_disk = json.loads((store / "v" / ".zarray").read_text())
        assert meta["metadata"]["v/.zarray"] == on_disk

    def test_zarr_foreign_store_features(self, tmp_path):
        # Legal zarr v2 features our writer never emits but readers of
        # foreign stores hit: absent chunks (= fill_value), string-coded
        # NaN fills, uncompressed chunks, big-endian dtypes, and F-order
        # (must raise, not silently transpose).
        import json
        import zlib

        store = tmp_path / "foreign.zarr"
        store.mkdir()
        (store / ".zgroup").write_text(json.dumps({"zarr_format": 2}))

        d = store / "sparse"
        d.mkdir()
        (d / ".zarray").write_text(json.dumps({
            "zarr_format": 2, "shape": [4, 4], "chunks": [2, 2],
            "dtype": "<f8", "compressor": {"id": "zlib", "level": 1},
            "fill_value": "NaN", "order": "C", "filters": None,
        }))
        (d / ".zattrs").write_text(
            json.dumps({"_ARRAY_DIMENSIONS": ["y", "x"]})
        )
        chunk = np.arange(4.0).reshape(2, 2)
        (d / "0.0").write_bytes(zlib.compress(chunk.tobytes()))

        d2 = store / "intfill"
        d2.mkdir()
        (d2 / ".zarray").write_text(json.dumps({
            "zarr_format": 2, "shape": [3], "chunks": [2],
            "dtype": ">i4", "compressor": None, "fill_value": -9,
            "order": "C", "filters": None,
        }))
        (d2 / ".zattrs").write_text(
            json.dumps({"_ARRAY_DIMENSIONS": ["x"]})
        )
        (d2 / "0").write_bytes(np.array([5, 6], ">i4").tobytes())

        ds = xdata.open_zarr(store)
        s = np.asarray(ds["sparse"].data)
        np.testing.assert_allclose(s[:2, :2], chunk)
        assert np.isnan(s[2:, :]).all() and np.isnan(s[:2, 2:]).all()
        assert list(np.asarray(ds["intfill"].data)) == [5, 6, -9]

        d3 = store / "forder"
        d3.mkdir()
        (d3 / ".zarray").write_text(json.dumps({
            "zarr_format": 2, "shape": [2], "chunks": [2],
            "dtype": "<i4", "compressor": None, "fill_value": 0,
            "order": "F", "filters": None,
        }))
        (d3 / "0").write_bytes(np.array([1, 2], "<i4").tobytes())
        with pytest.raises(NotImplementedError, match="order='F'"):
            xdata.open_zarr(store)

    def test_netcdf_uint8_widened(self, tmp_path):
        # NC_BYTE is signed and scipy writes raw uint8 as a char array
        # (read back as |S1 with corrupted values): the writer must
        # widen uint8 to int16.
        ds = xdata.Dataset()
        ds["flags"] = (("x",), np.array([0, 1, 127, 128, 255], np.uint8))
        path = tmp_path / "u8.nc"
        ds.to_netcdf(path)
        back = xdata.open_dataset(path)
        assert back["flags"].dtype == np.int16
        np.testing.assert_array_equal(
            back["flags"].values, [0, 1, 127, 128, 255]
        )

    def test_zarr_roundtrip(self, da, tmp_path):
        ds = da.to_dataset()
        store = tmp_path / "test.zarr"
        ds.to_zarr(store)
        back = xdata.open_zarr(store)
        assert np.allclose(back["v"].values, da.values)
        assert back["v"].dims == ("time", "x")
        assert np.array_equal(back.coords["time"].values, [10, 20, 30])


class TestApplyUfunc:
    def test_simple(self, da):
        out = xdata.apply_ufunc(np.square, da)
        assert out.dims == da.dims
        assert np.array_equal(out.values, da.values**2)

    def test_core_dims_reduce(self, da):
        out = xdata.apply_ufunc(
            lambda x: x.sum(axis=-1),
            da,
            input_core_dims=[["x"]],
            output_core_dims=[[]],
        )
        assert out.dims == ("time",)
        assert np.allclose(out.values, da.values.sum(axis=1))


class TestDataArrayMethods:
    """Method-surface coverage of the forwarded xarray-subset API."""

    @pytest.fixture
    def da(self):
        return DataArray(
            np.array([[1.0, 2.0, np.nan], [4.0, -5.0, 6.0]]),
            dims=("y", "x"),
            coords={"y": [10, 20], "x": [0.0, 1.0, 2.0]},
            name="v",
        )

    def test_argminmax(self, da):
        assert int(da.fillna(0.0).argmax()) == 5
        assert int(da.fillna(0.0).argmin()) == 4

    def test_clip(self, da):
        out = da.clip(0.0, 4.0)
        v = np.asarray(out.data)
        assert np.nanmin(v) >= 0.0 and np.nanmax(v) <= 4.0

    def test_cumsum(self, da):
        out = da.fillna(0.0).cumsum("x")
        np.testing.assert_allclose(
            np.asarray(out.data), [[1, 3, 3], [4, -1, 5]]
        )

    def test_isin(self, da):
        out = da.isin([1.0, 6.0])
        np.testing.assert_array_equal(
            np.asarray(out.data),
            [[True, False, False], [False, False, True]],
        )

    def test_astype_and_item(self, da):
        out = da.fillna(0.0).astype(np.int32)
        assert out.dtype == np.int32
        single = da.isel(y=0, x=0)
        assert single.item() == 1.0

    def test_broadcast_like(self, da):
        row = DataArray(np.array([1.0, 2.0, 3.0]), dims=("x",))
        out = row.broadcast_like(da)
        assert out.dims == ("y", "x")
        assert out.shape == (2, 3)

    def test_expand_squeeze(self, da):
        out = da.expand_dims("t")
        assert out.dims == ("t", "y", "x")
        assert out.squeeze("t").dims == ("y", "x")

    def test_get_index(self, da):
        idx = da.get_index("x")
        np.testing.assert_allclose(np.asarray(idx), [0.0, 1.0, 2.0])

    def test_dropna(self, da):
        out = da.dropna("x")
        # Column with NaN removed.
        assert out.shape == (2, 2)

    def test_interpolate_na(self):
        da = DataArray(
            np.array([[1.0, np.nan, 3.0, np.nan]]),
            dims=("y", "x"),
            coords={"x": [0.0, 1.0, 2.0, 3.0]},
        )
        out = da.interpolate_na(dim="x")
        v = np.asarray(out.data)[0]
        np.testing.assert_allclose(v[:3], [1.0, 2.0, 3.0])
        assert np.isnan(v[3])  # trailing NaN: no extrapolation
        out = da.interpolate_na(dim="x", fill_value="extrapolate")
        np.testing.assert_allclose(
            np.asarray(out.data)[0], [1.0, 2.0, 3.0, 4.0]
        )
        out = da.interpolate_na(dim="x", method="nearest")
        v = np.asarray(out.data)[0]
        assert v[1] in (1.0, 3.0)

    def test_interpolate_na_nearest_keeps_edge_nans(self):
        # Leading/trailing NaNs must survive method="nearest" unless
        # fill_value="extrapolate" (scipy/xarray semantics).
        da = DataArray(
            np.array([np.nan, 1.0, np.nan, 3.0, np.nan]),
            dims=("x",),
            coords={"x": [0.0, 1.0, 2.0, 3.0, 4.0]},
        )
        v = np.asarray(da.interpolate_na(dim="x", method="nearest").data)
        assert np.isnan(v[0]) and np.isnan(v[4])
        assert v[2] in (1.0, 3.0)
        v = np.asarray(
            da.interpolate_na(
                dim="x", method="nearest", fill_value="extrapolate"
            ).data
        )
        np.testing.assert_allclose(v, [1.0, 1.0, v[2], 3.0, 3.0])

    def test_copy_is_deep_for_data(self, da):
        out = da.copy()
        np.asarray(out.data)[0, 0] = 99.0
        assert np.asarray(da.data)[0, 0] == 1.0

    def test_chunk_compute_noops(self, da):
        # dask-API stand-ins: lazy chunking does not exist (XLA executes
        # eagerly with async dispatch) but the API forwards.
        assert da.chunk({"x": 2}).equals(da)
        assert da.compute().equals(da)
        assert da.load().equals(da)


class TestApplyUfunc:
    def test_elementwise(self):
        from xugrid_tpu.xdata import apply_ufunc

        a = DataArray(np.arange(3.0), dims=("x",))
        b = DataArray(np.arange(3.0) * 2, dims=("x",))
        out = apply_ufunc(np.add, a, b)
        np.testing.assert_allclose(np.asarray(out.data), [0.0, 3.0, 6.0])

    def test_reduce_core_dim(self):
        from xugrid_tpu.xdata import apply_ufunc

        a = DataArray(np.arange(6.0).reshape(2, 3), dims=("y", "x"))
        out = apply_ufunc(
            lambda v: v.sum(axis=-1),
            a,
            input_core_dims=[["x"]],
        )
        np.testing.assert_allclose(np.asarray(out.data), [3.0, 12.0])


def test_copy_with_data():
    # xarray parity: copy(data=...) replaces values, keeps structure.
    da = DataArray(
        np.arange(6.0).reshape(2, 3), dims=("t", "x"), name="v"
    ).assign_coords(x=[10.0, 20.0, 30.0])
    new = da.copy(data=np.ones((2, 3)))
    assert new.dims == ("t", "x")
    assert new.name == "v"
    np.testing.assert_array_equal(np.asarray(new.values), 1.0)
    np.testing.assert_array_equal(np.asarray(da.values).ravel(), np.arange(6.0))
    np.testing.assert_array_equal(np.asarray(new["x"].values), [10.0, 20.0, 30.0])
    with pytest.raises(ValueError, match="shape"):
        da.copy(data=np.ones(5))


class TestCFTimeEncoding:
    """datetime64 variables CF-encode on write and decode on read
    (NetCDF/zarr have no native datetime type; xarray parity)."""

    def _time_ds(self):
        ds = Dataset()
        times = np.array(
            ["2020-01-01", "2020-01-02T06:30:00", "NaT"],
            dtype="datetime64[ns]",
        )
        ds["v"] = DataArray(
            np.arange(3.0), dims=("time",)
        ).assign_coords(time=times)
        return ds, times

    def test_netcdf_roundtrip(self, tmp_path):
        ds, times = self._time_ds()
        p = tmp_path / "t.nc"
        ds.to_netcdf(p)
        back = xdata.open_dataset(p)
        t = np.asarray(back["time"].data)
        assert np.issubdtype(t.dtype, np.datetime64)
        assert np.isnat(t[2])
        np.testing.assert_array_equal(t[:2], times[:2])
        assert "time" in back.coords

    def test_zarr_roundtrip(self, tmp_path):
        ds, times = self._time_ds()
        p = tmp_path / "t.zarr"
        ds.to_zarr(p)
        back = xdata.open_zarr(p)
        t = np.asarray(back["time"].data)
        assert np.issubdtype(t.dtype, np.datetime64)
        assert np.isnat(t[2])
        np.testing.assert_array_equal(t[:2], times[:2])

    def test_decode_foreign_units(self, tmp_path):
        # Files written by other tools use e.g. 'days since ...'.
        from scipy.io import netcdf_file

        p = tmp_path / "f.nc"
        with netcdf_file(str(p), "w") as f:
            f.createDimension("time", 3)
            v = f.createVariable("time", np.float64, ("time",))
            v[:] = np.array([0.0, 1.5, 3.0])
            v.units = "days since 2000-01-01 12:00:00"
        back = xdata.open_dataset(p)
        t = np.asarray(back["time"].data)
        assert t[0] == np.datetime64("2000-01-01T12:00:00")
        assert t[1] == np.datetime64("2000-01-03T00:00:00")

    def test_timedelta_roundtrip(self, tmp_path):
        ds = Dataset()
        ds["dt"] = DataArray(
            np.array([1, 2], dtype="timedelta64[s]"), dims=("x",)
        )
        p = tmp_path / "d.nc"
        ds.to_netcdf(p)
        back = xdata.open_dataset(p)
        t = np.asarray(back["dt"].data)
        assert np.issubdtype(t.dtype, np.timedelta64)
        np.testing.assert_array_equal(
            t, np.array([1, 2], dtype="timedelta64[s]")
        )


class TestPolyfitAndFriends:
    """Former declared non-goals now covered: polyfit/polyval,
    multi-dim rolling, nearest-method interp."""

    def test_polyfit_polyval_roundtrip(self):
        x = np.linspace(0.0, 5.0, 40)
        da = DataArray(
            np.stack([2 * x**2 + 1, -x**2 + 3 * x]),
            dims=("r", "t"),
            coords={"t": x},
        )
        fit = da.polyfit("t", 2)
        coeffs = fit["polyfit_coefficients"]
        assert coeffs.dims == ("degree", "r")
        np.testing.assert_allclose(
            np.asarray(coeffs.data)[:, 0], [2.0, 0.0, 1.0], atol=1e-8
        )
        ev = xdata.polyval(
            DataArray(x, dims=("t",), coords={"t": x}), coeffs
        )
        np.testing.assert_allclose(
            np.asarray(ev.data), np.asarray(da.data).T, atol=1e-7
        )

    def test_polyfit_skipna(self):
        x = np.linspace(0.0, 5.0, 25)
        y = 4.0 * x - 7.0
        y[3] = np.nan
        da = DataArray(y, dims=("t",), coords={"t": x})
        fit = da.polyfit("t", 1)
        np.testing.assert_allclose(
            np.asarray(fit["polyfit_coefficients"].data), [4.0, -7.0],
            atol=1e-8,
        )

    def test_rolling_multi_dim(self):
        da = DataArray(np.arange(24.0).reshape(4, 6), dims=("y", "x"))
        out = da.rolling(y=2, x=3).mean()
        assert out.shape == (4, 6)
        assert np.isnan(out.values[0]).all()  # incomplete y windows
        np.testing.assert_allclose(
            out.values[1, 2], np.mean([[0, 1, 2], [6, 7, 8]])
        )
        partial = da.rolling(y=2, x=3, min_periods=1).mean()
        # trailing windows: the corner window holds only element (0, 0)
        np.testing.assert_allclose(partial.values[0, 0], 0.0)
        np.testing.assert_allclose(partial.values[0, 1], 0.5)

    def test_interp_nearest(self):
        da = DataArray(
            np.array([1.0, 2.0, 4.0]), dims=("x",),
            coords={"x": [0.0, 1.0, 2.0]},
        )
        out = da.interp(x=[0.4, 0.6, 1.6], method="nearest")
        np.testing.assert_allclose(out.values, [1.0, 2.0, 4.0])
        assert np.isnan(
            da.interp(x=[2.5], method="nearest").values
        ).all()


class TestInterpSplineKinds:
    def test_cubic_matches_scipy(self):
        from scipy.interpolate import interp1d
        from xugrid_tpu.xdata import DataArray

        x = np.array([0.0, 1.0, 2.5, 4.0, 5.0, 7.0])
        y = np.sin(x)
        da = DataArray(y, dims=("x",), coords={"x": x})
        newx = np.linspace(-0.5, 7.5, 17)
        out = da.interp(x=newx, method="cubic")
        want = interp1d(x, y, kind="cubic", bounds_error=False,
                        fill_value=np.nan)(newx)
        np.testing.assert_allclose(out.values, want, rtol=1e-12,
                                   equal_nan=True)
        # out-of-range -> NaN, exactly like xarray's scipy path
        assert np.isnan(out.values[0]) and np.isnan(out.values[-1])

    def test_quadratic_2d_and_unsorted_coord(self):
        from xugrid_tpu.xdata import DataArray

        x = np.array([3.0, 0.0, 1.0, 2.0])  # unsorted
        data = np.stack([x ** 2, 2 * x ** 2])
        da = DataArray(data, dims=("b", "x"), coords={"x": x})
        out = da.interp(x=[0.5, 1.5], method="quadratic")
        np.testing.assert_allclose(
            out.values, [[0.25, 2.25], [0.5, 4.5]], atol=1e-10
        )

    def test_slinear_matches_linear(self):
        from xugrid_tpu.xdata import DataArray

        rng = np.random.default_rng(0)
        x = np.sort(rng.uniform(0, 10, 9))
        da = DataArray(rng.normal(size=9), dims=("x",), coords={"x": x})
        newx = rng.uniform(0, 10, 20)
        np.testing.assert_allclose(
            da.interp(x=newx, method="slinear").values,
            da.interp(x=newx, method="linear").values,
            rtol=1e-12,
        )
