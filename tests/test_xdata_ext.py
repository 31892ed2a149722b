"""
xarray-parity extension methods on the xdata layer: count/quantile/
rank/shift/roll/sortby/ffill/bfill/integrate/differentiate/dot,
stack/unstack, reindex/interp, groupby/rolling/coarsen/weighted/
resample, and the Dataset counterparts.  A reference (xugrid) user
forwards these through the UGRID wrappers, so they must exist and
match xarray semantics on the subset exercised here.
"""

import numpy as np
import pytest

from xugrid_tpu import xdata


@pytest.fixture
def da():
    return xdata.DataArray(
        np.array([[1.0, np.nan, 3.0], [4.0, 5.0, np.nan]]),
        dims=("t", "x"),
        coords={"t": [0, 1], "x": [10, 20, 30]},
        name="v",
    )


@pytest.fixture
def ds():
    out = xdata.Dataset()
    out["v"] = (("t", "x"), np.array([[1.0, np.nan, 3.0], [4.0, 5.0, 6.0]]))
    out["w"] = (("x",), np.array([10.0, 20.0, 30.0]))
    return out.assign_coords(t=[0, 1], x=[100, 200, 300])


class TestSimpleMethods:
    def test_count(self, da):
        assert list(np.asarray(da.count("x").data)) == [2, 2]
        assert int(da.count()) == 4

    def test_quantile(self, da):
        q = da.quantile(0.5, dim="x")
        assert q.dims == ("t",)
        np.testing.assert_allclose(np.asarray(q.data), [2.0, 4.5])
        qq = da.quantile([0.25, 0.75], dim="x")
        assert qq.dims == ("quantile", "t")
        np.testing.assert_allclose(
            np.asarray(qq.coords["quantile"].data), [0.25, 0.75]
        )

    def test_cumprod(self):
        cp = xdata.DataArray(np.array([1.0, 2.0, 3.0]), dims=("x",))
        assert list(np.asarray(cp.cumprod("x").data)) == [1, 2, 6]

    def test_rank(self):
        r = xdata.DataArray(
            np.array([3.0, 1.0, np.nan, 2.0]), dims=("x",)
        ).rank("x")
        v = np.asarray(r.data)
        np.testing.assert_allclose(v[[0, 1, 3]], [3, 1, 2])
        assert np.isnan(v[2])

    def test_shift_and_roll(self, da):
        s = da.shift(x=1)
        assert np.isnan(np.asarray(s.data)[:, 0]).all()
        assert np.asarray(s.data)[0, 1] == 1.0
        # coords NOT shifted
        assert list(np.asarray(s.coords["x"].data)) == [10, 20, 30]
        ro = da.roll(x=1, roll_coords=True)
        assert np.asarray(ro.data)[0, 0] == 3.0
        assert list(np.asarray(ro.coords["x"].data)) == [30, 10, 20]

    def test_sortby(self, da):
        sb = da.sortby("x", ascending=False)
        assert list(np.asarray(sb.coords["x"].data)) == [30, 20, 10]
        assert np.asarray(sb.data)[0, 0] == 3.0

    def test_ffill_bfill(self):
        f = xdata.DataArray(
            np.array([np.nan, 1.0, np.nan, np.nan, 2.0]), dims=("x",)
        )
        ff = np.asarray(f.ffill("x").data)
        assert np.isnan(ff[0]) and list(ff[1:]) == [1, 1, 1, 2]
        bf = np.asarray(f.bfill("x").data)
        assert list(bf[:3]) == [1, 1, 2]
        fl = np.asarray(f.ffill("x", limit=1).data)
        assert fl[2] == 1.0 and np.isnan(fl[3])

    def test_integrate_differentiate(self):
        g = xdata.DataArray(
            np.array([0.0, 1.0, 4.0]), dims=("x",),
            coords={"x": [0.0, 1.0, 2.0]},
        )
        assert abs(float(g.integrate("x").data) - 3.0) < 1e-12
        np.testing.assert_allclose(
            np.asarray(g.differentiate("x").data), [1.0, 2.0, 3.0]
        )

    def test_dot(self):
        a = xdata.DataArray(np.arange(6.0).reshape(2, 3), dims=("i", "j"))
        b = xdata.DataArray(np.arange(3.0), dims=("j",))
        d = a.dot(b)
        assert d.dims == ("i",)
        np.testing.assert_allclose(np.asarray(d.data), [5.0, 14.0])

    def test_assign_attrs_and_map_blocks(self, da):
        aa = da.assign_attrs(units="m")
        assert aa.attrs["units"] == "m" and "units" not in da.attrs
        mb = da.map_blocks(lambda x: x * 2)
        assert np.nanmax(np.asarray(mb.data)) == 10.0


class TestStackReindexInterp:
    def test_stack_unstack(self):
        da = xdata.DataArray(
            np.arange(6.0).reshape(2, 3), dims=("y", "x"),
            coords={"y": [0, 1], "x": [10, 20, 30]}, name="v",
        )
        st = da.stack(z=("y", "x"))
        assert st.dims == ("z",) and st.sizes["z"] == 6
        assert list(np.asarray(st.coords["y"].data)) == [0, 0, 0, 1, 1, 1]
        assert list(np.asarray(st.coords["x"].data)) == [10, 20, 30] * 2
        un = st.unstack("z")
        assert un.dims == ("y", "x")
        np.testing.assert_allclose(np.asarray(un.data), np.asarray(da.data))
        assert list(np.asarray(un.coords["x"].data)) == [10, 20, 30]

    def test_reindex(self):
        da = xdata.DataArray(
            np.arange(6.0).reshape(2, 3), dims=("y", "x"),
            coords={"y": [0, 1], "x": [10, 20, 30]}, name="v",
        )
        r = da.reindex(x=[20, 40, 10])
        v = np.asarray(r.data)
        assert v[0, 0] == 1.0 and np.isnan(v[0, 1]) and v[0, 2] == 0.0
        rn = da.reindex(x=[12, 29], method="nearest", tolerance=5)
        assert np.asarray(rn.data)[0, 0] == 0.0
        assert np.asarray(rn.data)[0, 1] == 2.0
        other = xdata.DataArray(
            np.zeros((2, 2)), dims=("y", "x"),
            coords={"y": [0, 1], "x": [30, 10]},
        )
        rl = da.reindex_like(other)
        assert list(np.asarray(rl.coords["x"].data)) == [30, 10]

    def test_reindex_datetime(self):
        times = np.array(
            ["2020-01-01", "2020-01-05", "2020-01-10"],
            dtype="datetime64[ns]",
        )
        da = xdata.DataArray(
            np.array([1.0, 2.0, 3.0]), dims=("time",),
            coords={"time": times}, name="v",
        )
        new = np.array(
            ["2020-01-05", "2020-01-07"], dtype="datetime64[ns]"
        )
        v = np.asarray(da.reindex(time=new).data)
        assert v[0] == 2.0 and np.isnan(v[1])
        rn = da.reindex(time=new, method="nearest")
        assert list(np.asarray(rn.data)) == [2.0, 2.0]
        rt = da.reindex(
            time=new, method="nearest", tolerance=np.timedelta64(1, "D")
        )
        vt = np.asarray(rt.data)
        assert vt[0] == 2.0 and np.isnan(vt[1])
        iv = da.interp(
            time=np.array(["2020-01-03"], dtype="datetime64[ns]")
        )
        np.testing.assert_allclose(np.asarray(iv.data), [1.5])

    def test_interp(self):
        g = xdata.DataArray(
            np.array([0.0, 10.0, 20.0]), dims=("x",),
            coords={"x": [0.0, 1.0, 2.0]},
        )
        iv = np.asarray(g.interp(x=[0.5, 1.5, 3.0]).data)
        np.testing.assert_allclose(iv[:2], [5.0, 15.0])
        assert np.isnan(iv[2])
        assert abs(float(g.interp(x=0.25).data) - 2.5) < 1e-12


class TestGrouped:
    def test_groupby(self):
        gb = xdata.DataArray(
            np.array([1.0, 2.0, 3.0, 4.0]), dims=("x",),
            coords={"x": [0, 1, 2, 3], "label": ("x", ["a", "b", "a", "b"])},
            name="v",
        )
        m = gb.groupby("label").mean()
        assert list(np.asarray(m.coords["label"].data)) == ["a", "b"]
        np.testing.assert_allclose(np.asarray(m.data), [2.0, 3.0])
        np.testing.assert_allclose(
            np.asarray(gb.groupby("label").sum().data), [4.0, 6.0]
        )
        assert list(np.asarray(gb.groupby("label").count().data)) == [2, 2]
        items = dict(iter(gb.groupby("label")))
        np.testing.assert_allclose(np.asarray(items["a"].data), [1.0, 3.0])
        mapped = gb.groupby("label").map(lambda s: s.max())
        np.testing.assert_allclose(np.asarray(mapped.data), [3.0, 4.0])

    def test_rolling(self):
        rr = xdata.DataArray(np.array([1.0, 2.0, 3.0, 4.0]), dims=("x",))
        rm = np.asarray(rr.rolling(x=2).mean().data)
        assert np.isnan(rm[0])
        np.testing.assert_allclose(rm[1:], [1.5, 2.5, 3.5])
        rc = np.asarray(
            rr.rolling(x=3, center=True, min_periods=1).sum().data
        )
        np.testing.assert_allclose(rc, [3.0, 6.0, 9.0, 7.0])

    def test_coarsen(self):
        cc = xdata.DataArray(
            np.arange(6.0), dims=("x",), coords={"x": np.arange(6.0)}
        )
        cm = cc.coarsen(x=2).mean()
        np.testing.assert_allclose(np.asarray(cm.data), [0.5, 2.5, 4.5])
        np.testing.assert_allclose(
            np.asarray(cm.coords["x"].data), [0.5, 2.5, 4.5]
        )
        ct = xdata.DataArray(np.arange(7.0), dims=("x",)).coarsen(
            x=2, boundary="trim"
        ).sum()
        np.testing.assert_allclose(np.asarray(ct.data), [1.0, 5.0, 9.0])
        with pytest.raises(ValueError, match="not a multiple"):
            xdata.DataArray(np.arange(7.0), dims=("x",)).coarsen(x=2).mean()
        # pad keeps data and coord sizes consistent
        cp = xdata.DataArray(
            np.arange(7.0), dims=("x",), coords={"x": np.arange(7.0)}
        ).coarsen(x=2, boundary="pad").mean()
        d = np.asarray(cp.data)
        c = np.asarray(cp.coords["x"].data)
        assert len(d) == len(c) == 4
        assert c[3] == 6.0

    def test_weighted(self):
        w = xdata.DataArray(np.array([1.0, 3.0]), dims=("x",))
        v = xdata.DataArray(np.array([2.0, 4.0]), dims=("x",))
        assert abs(float(v.weighted(w).mean("x").data) - 3.5) < 1e-12
        assert abs(float(v.weighted(w).sum("x").data) - 14.0) < 1e-12
        assert abs(float(v.weighted(w).sum_of_weights("x").data) - 4.0) < 1e-12
        # NaN values get zero weight
        v2 = xdata.DataArray(np.array([2.0, np.nan]), dims=("x",))
        assert abs(float(v2.weighted(w).mean("x").data) - 2.0) < 1e-12

    def test_resample(self):
        times = np.array(
            ["2020-01-01", "2020-01-02", "2020-02-01", "2020-02-15"],
            dtype="datetime64[ns]",
        )
        tr = xdata.DataArray(
            np.array([1.0, 3.0, 5.0, 7.0]), dims=("time",),
            coords={"time": times}, name="v",
        )
        rm = tr.resample(time="M").mean()
        np.testing.assert_allclose(np.asarray(rm.data), [2.0, 6.0])


class TestPandasOracle:
    @pytest.mark.parametrize("seed", [91, 92])
    def test_semantics_match_pandas(self, seed):
        # pandas implements the same nan-aware semantics xarray uses for
        # these ops; cross-validate on random NaN-bearing series.
        import pandas as pd

        rng = np.random.default_rng(seed)
        for _ in range(8):
            n = int(rng.integers(5, 40))
            vals = rng.normal(size=n)
            vals[rng.random(n) < 0.2] = np.nan
            s = pd.Series(vals)
            da = xdata.DataArray(
                vals, dims=("x",), coords={"x": np.arange(n)}, name="v"
            )
            labels = rng.integers(0, 4, n)
            da2 = xdata.DataArray(
                vals, dims=("x",),
                coords={"x": np.arange(n), "g": ("x", labels)}, name="v",
            )
            for op in ("mean", "sum", "min", "max"):
                mine = getattr(da2.groupby("g"), op)()
                theirs = getattr(s.groupby(labels), op)()
                np.testing.assert_array_equal(
                    np.asarray(mine.coords["g"].data),
                    theirs.index.to_numpy(),
                )
                np.testing.assert_allclose(
                    np.asarray(mine.data), theirs.to_numpy(),
                    equal_nan=True,
                )
            for op in ("ffill", "bfill"):
                np.testing.assert_allclose(
                    np.asarray(getattr(da, op)("x").data),
                    getattr(s, op)().to_numpy(),
                    equal_nan=True,
                )
            np.testing.assert_allclose(
                np.asarray(da.rank("x").data),
                s.rank(method="average").to_numpy(),
                equal_nan=True,
            )
            k = int(rng.integers(1, 3))
            np.testing.assert_allclose(
                np.asarray(da.shift(x=k).data),
                s.shift(k).to_numpy(),
                equal_nan=True,
            )
            q = float(rng.uniform(0.1, 0.9))
            mine_q = float(da.quantile(q).data)
            theirs_q = s.quantile(q)
            assert np.isnan(mine_q) == bool(np.isnan(theirs_q))
            if not np.isnan(mine_q):
                assert abs(mine_q - theirs_q) < 1e-12


class TestDatasetExtensions:
    def test_where_fillna(self, ds):
        wh = ds.where(ds["v"] > 2.0)
        assert np.isnan(np.asarray(wh["v"].data)[0, 0])
        fn = ds.fillna(0.0)
        assert np.asarray(fn["v"].data)[0, 1] == 0.0

    def test_where_drop(self):
        ds = xdata.Dataset()
        ds["v"] = (("t", "x"), np.arange(12.0).reshape(4, 3))
        ds["w"] = (("x",), np.array([10.0, 20.0, 30.0]))
        ds = ds.assign_coords(t=[0, 1, 2, 3], x=[100, 200, 300])
        out = ds.where(ds["v"] > 6.0, drop=True)
        assert out.sizes["t"] == 2
        v = np.asarray(out["v"].data)
        assert np.isnan(v[0, 0]) and v[0, 1] == 7.0
        assert list(np.asarray(out.coords["t"].data)) == [2, 3]
        # a var with a subset of cond dims broadcasts against cond
        # (xarray semantics) and is masked where cond fails
        w = np.asarray(out["w"].data)
        assert w.shape == (3, 2)
        assert np.isnan(w[0, 0]) and w[1, 0] == 20.0

    def test_count_quantile(self, ds):
        ct = ds.count("x")
        assert list(np.asarray(ct["v"].data)) == [2, 3]
        qt = ds.quantile(0.5, dim="x")
        assert qt["v"].dims == ("t",)

    def test_diff_shift_roll(self, ds):
        assert ds.diff("x")["v"].sizes["x"] == 2
        sh = ds.shift(x=1)
        assert np.isnan(np.asarray(sh["w"].data)[0])
        rl = ds.roll(x=1)
        assert np.asarray(rl["w"].data)[0] == 30.0

    def test_sortby_dropna(self, ds):
        sb = ds.sortby("x", ascending=False)
        assert list(np.asarray(sb.coords["x"].data)) == [300, 200, 100]
        assert ds.dropna("x").sizes["x"] == 2

    def test_to_array(self, ds):
        ta = ds.to_array()
        assert ta.dims == ("variable", "t", "x")
        assert list(np.asarray(ta.coords["variable"].data)) == ["v", "w"]

    def test_stack_unstack(self, ds):
        st = ds.stack(z=("t", "x"))
        assert st["v"].dims == ("z",) and st["w"].dims == ("z",)
        # partial variable broadcast over the product
        assert list(np.asarray(st["w"].data)) == [10.0, 20.0, 30.0] * 2
        un = st.unstack()
        np.testing.assert_allclose(
            np.asarray(un["v"].data), np.asarray(ds["v"].data),
            equal_nan=True,
        )

    def test_reindex_interp(self, ds):
        ri = ds.reindex(x=[200, 400])
        assert np.asarray(ri["w"].data)[0] == 20.0
        assert np.isnan(np.asarray(ri["w"].data)[1])
        ii = ds.interp(x=[150.0, 250.0])
        np.testing.assert_allclose(np.asarray(ii["w"].data), [15.0, 25.0])

    def test_groupby(self):
        ds2 = xdata.Dataset()
        ds2["v"] = (("x",), np.array([1.0, 2.0, 3.0, 4.0]))
        ds2 = ds2.assign_coords(x=[0, 1, 2, 3], lab=("x", ["a", "b", "a", "b"]))
        gm = ds2.groupby("lab").mean()
        np.testing.assert_allclose(np.asarray(gm["v"].data), [2.0, 3.0])
        items = dict(iter(ds2.groupby("lab")))
        np.testing.assert_allclose(
            np.asarray(items["b"]["v"].data), [2.0, 4.0]
        )

    def test_windowed(self):
        ds = xdata.Dataset()
        ds["v"] = (("t", "x"), np.arange(12.0).reshape(4, 3))
        ds["w"] = (("x",), np.array([10.0, 20.0, 30.0]))
        ds = ds.assign_coords(
            t=np.array(
                ["2020-01-01", "2020-01-02", "2020-02-01", "2020-02-02"],
                dtype="datetime64[ns]",
            )
        )
        rm = ds.rolling(t=2).mean()
        assert np.isnan(np.asarray(rm["v"].data)[0]).all()
        np.testing.assert_allclose(
            np.asarray(rm["w"].data), [10.0, 20.0, 30.0]
        )
        cm = ds.coarsen(t=2).mean()
        assert cm["v"].sizes["t"] == 2
        rs = ds.resample(t="M").mean()
        assert rs["v"].sizes["t"] == 2
        np.testing.assert_allclose(
            np.asarray(rs["v"].data)[0], [1.5, 2.5, 3.5]
        )
        ap = ds.apply(lambda a: a * 0 + 1)
        np.testing.assert_allclose(np.asarray(ap["v"].data), 1.0)


class TestResampleFrequencies:
    """Offset-alias coverage: anchored and sub-daily frequencies that
    the old to_period binning rejected, plus legacy-alias spelling."""

    def _series(self, n=48, step="37min"):
        import pandas as pd

        times = pd.date_range("2020-01-01", periods=n, freq=step)
        return xdata.DataArray(
            np.arange(n, dtype=float), dims=("time",),
            coords={"time": times.values}, name="v",
        ), times

    @pytest.mark.parametrize("freq", ["2h", "2H", "15T", "15min", "QS", "W"])
    def test_matches_pandas_resample(self, freq):
        import warnings

        import pandas as pd

        da, times = self._series()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out = da.resample(time=freq).mean()
            legacy = {"H": "h", "T": "min"}
            import re
            m = re.match(r"^(\d*)([A-Za-z]+)(-\w+)?$", freq)
            pfreq = (m.group(1) or "") + legacy.get(m.group(2), m.group(2)) + (
                m.group(3) or ""
            )
            # full bin range, NaN for empty bins (no dropna): pandas/
            # xarray resample semantics
            want = pd.Series(np.arange(len(times), dtype=float),
                             index=times).resample(pfreq).mean()
        np.testing.assert_allclose(np.asarray(out.data), want.values)
        np.testing.assert_array_equal(
            np.asarray(out.coords["time"].data),
            want.index.values,
        )

    def test_month_end_labels(self):
        da, _ = self._series(n=60, step="1D")
        out = da.resample(time="M").mean()
        labels = np.asarray(out.coords["time"].data)
        # pandas/xarray convention: "M"/"ME" labels at month END
        assert str(labels[0]).startswith("2020-01-31")


class TestStackedMultiIndexLite:
    """MultiIndex-style selection/unstack on stacked dims: tuple labels,
    level-name sel, and sparse (post-subset) unstack with fill."""

    def _da(self):
        data = np.arange(12.0).reshape(3, 4)
        return xdata.DataArray(
            data, dims=("y", "x"),
            coords={"y": [10, 20, 30], "x": [1, 2, 3, 4]}, name="v",
        )

    def test_sel_full_tuple_label(self):
        s = self._da().stack(z=("y", "x"))
        out = s.sel(z=(20, 3))
        assert float(out.data) == 6.0
        assert "z" not in out.dims  # scalar selection drops the dim
        assert int(out.coords["y"].data) == 20
        assert int(out.coords["x"].data) == 3

    def test_sel_list_of_tuples(self):
        s = self._da().stack(z=("y", "x"))
        out = s.sel(z=[(10, 1), (30, 4), (20, 2)])
        np.testing.assert_allclose(np.asarray(out.data), [0.0, 11.0, 5.0])

    def test_sel_level_name(self):
        s = self._da().stack(z=("y", "x"))
        out = s.sel(y=20)
        assert out.sizes["z"] == 4
        np.testing.assert_allclose(np.asarray(out.data), [4, 5, 6, 7])
        np.testing.assert_array_equal(np.asarray(out.coords["x"].data),
                                      [1, 2, 3, 4])
        # two level selections intersect
        out2 = s.sel(y=20, x=[2, 4])
        np.testing.assert_allclose(np.asarray(out2.data), [5, 7])

    def test_sel_missing_tuple_raises(self):
        s = self._da().stack(z=("y", "x"))
        with pytest.raises(KeyError):
            s.sel(z=(99, 1))

    def test_unstack_after_subset_fills(self):
        s = self._da().stack(z=("y", "x"))
        sub = s.isel(z=[0, 1, 5, 11])  # (10,1) (10,2) (20,2) (30,4)
        back = sub.unstack("z")
        assert back.sizes == {"y": 3, "x": 3}  # unique levels, sorted
        np.testing.assert_array_equal(np.asarray(back.coords["y"].data),
                                      [10, 20, 30])
        np.testing.assert_array_equal(np.asarray(back.coords["x"].data),
                                      [1, 2, 4])
        got = np.asarray(back.data)
        assert got[0, 0] == 0.0 and got[0, 1] == 1.0
        assert got[1, 1] == 5.0 and got[2, 2] == 11.0
        assert np.isnan(got[1, 0]) and np.isnan(got[2, 0])

    def test_unstack_full_product_roundtrip_unchanged(self):
        da = self._da()
        back = da.stack(z=("y", "x")).unstack("z")
        np.testing.assert_allclose(np.asarray(back.data),
                                   np.asarray(da.data))
        np.testing.assert_array_equal(np.asarray(back.coords["x"].data),
                                      np.asarray(da.coords["x"].data))

    def test_dataset_sel_level_name(self):
        ds = xdata.Dataset({"v": self._da()})
        s = ds.stack(z=("y", "x"))
        out = s.sel(x=3)
        np.testing.assert_allclose(np.asarray(out["v"].data), [2, 6, 10])
        np.testing.assert_array_equal(np.asarray(out["y"].data),
                                      [10, 20, 30])

    def test_set_index_multi_coord_tuple_sel_and_unstack(self):
        # set_index(z=[...]) records the level order: tuple sel and
        # sparse unstack work without a stack() call.
        z_y = np.array([10, 10, 20, 20, 30])
        z_x = np.array([1, 2, 1, 2, 1])
        da = xdata.DataArray(
            np.arange(5.0), dims=("z",),
            coords={"yy": ("z", z_y), "xx": ("z", z_x)}, name="v",
        )
        mi = da.set_index(z=["yy", "xx"])
        assert float(mi.sel(z=(20, 2)).data) == 3.0
        back = mi.unstack("z")
        assert back.sizes == {"yy": 3, "xx": 2}
        got = np.asarray(back.data)
        assert got[2, 0] == 4.0 and np.isnan(got[2, 1])

    def test_indexes_returns_pandas_multiindex(self):
        # Stacked dims must surface REAL pandas MultiIndex objects
        # (xarray round-trip parity: users inspect .indexes/.get_index
        # and feed them back to pandas).
        import pandas as pd

        s = self._da().stack(z=("y", "x"))
        mi = s.indexes["z"]
        assert isinstance(mi, pd.MultiIndex)
        assert mi.names == ["y", "x"]
        expect = pd.MultiIndex.from_product(
            [[10, 20, 30], [1, 2, 3, 4]], names=["y", "x"]
        )
        assert mi.equals(expect)
        assert s.get_index("z").equals(expect)
        # subsetting keeps the MultiIndex in sync
        sub = s.isel(z=[0, 5, 11])
        assert list(sub.indexes["z"]) == [(10, 1), (20, 2), (30, 4)]

    def test_to_pandas_stacked_gives_multiindexed_series(self):
        import pandas as pd

        s = self._da().stack(z=("y", "x"))
        ser = s.to_pandas()
        assert isinstance(ser.index, pd.MultiIndex)
        assert ser.loc[(20, 3)] == 6.0

    def test_reset_index_stacked_keeps_level_coords(self):
        s = self._da().stack(z=("y", "x"))
        r = s.reset_index("z")
        assert "z" not in r.indexes  # MultiIndex forgotten
        # level coords survive as plain (z,) coords
        np.testing.assert_array_equal(
            np.asarray(r.coords["y"].data),
            np.repeat([10, 20, 30], 4),
        )
        with pytest.raises(ValueError, match="cannot unstack"):
            r.unstack("z")
        dropped = s.reset_index("z", drop=True)
        assert "y" not in dropped._coords and "x" not in dropped._coords

    def test_reset_index_plain_dim_coordinate(self):
        da = self._da()
        r = da.reset_index("x")
        assert "x" not in r.indexes
        np.testing.assert_array_equal(
            np.asarray(r.coords["x_"].data), [1, 2, 3, 4]
        )

    def test_reorder_levels_swaps_unstack_order(self):
        s = self._da().stack(z=("y", "x"))
        r = s.reorder_levels(z=["x", "y"])
        assert r.indexes["z"].names == ["x", "y"]
        back = r.unstack("z")
        assert tuple(back.dims) == ("x", "y")
        np.testing.assert_allclose(
            np.asarray(back.data), np.asarray(self._da().data).T
        )
        with pytest.raises(ValueError, match="permutation"):
            s.reorder_levels(z=["x", "x"])

    def test_dataset_multiindex_surface(self):
        import pandas as pd

        ds = xdata.Dataset({"v": self._da()})
        s = ds.stack(z=("y", "x"))
        mi = s.indexes["z"]
        assert isinstance(mi, pd.MultiIndex) and mi.names == ["y", "x"]
        r = s.reset_index("z")
        assert "z" not in r.indexes
        ro = s.reorder_levels(z=["x", "y"])
        assert ro.indexes["z"].names == ["x", "y"]
        back = ro.unstack("z")
        assert tuple(back["v"].dims) == ("x", "y")
