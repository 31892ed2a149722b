"""
End-to-end integration suite: full workflow chains through the public
surface, modeled on the reference's wrapper/dataset integration tests
(reference tests/test_ugrid_dataset.py:1-1976): file round trips with
UGRID conventions, forwarded-op chains with grid alignment,
multi-topology datasets, partition pipelines through files, facet
remaps, and regrid chains.
"""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu import xdata
from xugrid_tpu.xdata import DataArray, Dataset


def quad_grid(nx=4, ny=4, dx=1.0, x0=0.0, y0=0.0, name="mesh2d"):
    x = np.arange(nx + 1.0) * dx + x0
    y = np.arange(ny + 1.0) * dx + y0
    yy, xx = np.meshgrid(y, x, indexing="ij")
    verts = np.column_stack([xx.ravel(), yy.ravel()])
    j, i = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    nid = lambda ii, jj: jj * (nx + 1) + ii  # noqa: E731
    faces = np.stack(
        [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)], axis=-1
    ).reshape(-1, 4)
    return xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces, name=name)


def network_grid(name="network1d"):
    # A small Y-shaped channel network.
    node_x = np.array([0.0, 1.0, 2.0, 2.0, 3.0])
    node_y = np.array([0.0, 0.0, 1.0, -1.0, 1.0])
    edges = np.array([[0, 1], [1, 2], [1, 3], [2, 4]])
    return xu.Ugrid1d(node_x, node_y, -1, edges, name=name)


@pytest.fixture
def rich_uds():
    """A dataset with face, node, edge, and time-dependent variables."""
    grid = quad_grid()
    rng = np.random.default_rng(0)
    face = DataArray(
        rng.normal(size=grid.n_face), dims=(grid.face_dimension,), name="fz"
    )
    node = DataArray(
        np.hypot(grid.node_x, grid.node_y),
        dims=(grid.node_dimension,),
        name="nz",
    )
    edge = DataArray(
        np.arange(grid.n_edge, dtype=float),
        dims=(grid.edge_dimension,),
        name="ez",
    )
    tface = DataArray(
        rng.normal(size=(3, grid.n_face)),
        dims=("time", grid.face_dimension),
        name="tfz",
    ).assign_coords(time=np.array([0.0, 0.5, 1.0]))
    ds = Dataset()
    for da in (face, node, edge, tface):
        ds[da.name] = da
    return xu.UgridDataset(ds, [grid])


class TestFileWorkflows:
    def test_netcdf_ops_zarr_chain(self, tmp_path, rich_uds):
        """netCDF write -> reopen -> select -> compute -> zarr -> reopen."""
        p1 = tmp_path / "mesh.nc"
        rich_uds.ugrid.to_netcdf(p1)
        back = xu.open_dataset(p1)
        assert set(back.data_vars) == {"fz", "nz", "ez", "tfz"}
        grid = back.grids[0]
        assert grid.n_face == 16 and grid.n_node == 25

        # Box selection subsets every facet-dim variable consistently.
        sel = back.ugrid.sel(x=slice(0.0, 2.0), y=slice(0.0, 2.0))
        sgrid = sel.grids[0]
        assert sgrid.n_face == 4
        assert sel["fz"].shape == (4,)
        assert sel["tfz"].shape == (3, 4)

        # Forwarded compute keeps the topology attached.
        sel["mean_tfz"] = sel["tfz"].mean("time")
        assert sel.grids[0].n_face == 4

        p2 = tmp_path / "mesh.zarr"
        sel.ugrid.to_zarr(p2)
        again = xu.open_zarr(p2)
        np.testing.assert_allclose(
            np.asarray(again["mean_tfz"].values),
            np.asarray(sel["mean_tfz"].values),
        )
        assert again.grids[0].n_face == 4

    def test_ugrid_roles_discoverable(self, tmp_path, rich_uds):
        p = tmp_path / "roles.nc"
        rich_uds.ugrid.to_netcdf(p)
        raw = xdata.open_dataset(p)
        roles = xu.ugrid_roles(raw)
        assert "mesh2d" in roles.topology
        dims = roles.dimensions["mesh2d"]
        assert dims["face_dimension"] == "mesh2d_nFaces"
        coords = roles.coordinates["mesh2d"]
        assert "node_coordinates" in coords

    def test_start_index_one_roundtrip(self, tmp_path):
        """1-based connectivity on disk is normalized and restored."""
        grid = quad_grid()
        uda = xu.UgridDataArray(
            DataArray(
                np.arange(grid.n_face, dtype=float),
                dims=(grid.face_dimension,),
                name="v",
            ),
            grid,
        )
        ds = uda.ugrid.to_dataset()
        conn_name = "mesh2d_face_nodes"
        conn = np.asarray(ds[conn_name].data).copy()
        fill = conn < 0
        conn = conn + 1
        conn[fill] = -999
        ds[conn_name] = (ds[conn_name].dims, conn)
        ds[conn_name].attrs.update(start_index=1, _FillValue=-999)
        p = tmp_path / "one_based.nc"
        ds.to_netcdf(p)

        back = xu.open_dataset(p)
        bgrid = back.grids[0]
        assert bgrid.n_face == grid.n_face
        np.testing.assert_array_equal(
            np.sort(bgrid.face_node_connectivity, axis=1),
            np.sort(grid.face_node_connectivity, axis=1),
        )
        # Geometry math is unaffected by the on-disk convention.
        np.testing.assert_allclose(bgrid.area, grid.area)


class TestMultiTopology:
    @pytest.fixture
    def multi(self):
        g2 = quad_grid()
        g1 = network_grid()
        ds = Dataset()
        ds["face_z"] = DataArray(
            np.arange(g2.n_face, dtype=float), dims=(g2.face_dimension,)
        )
        ds["discharge"] = DataArray(
            np.array([1.0, 0.6, 0.4, 0.6]), dims=(g1.edge_dimension,)
        )
        return xu.UgridDataset(ds, [g2, g1])

    def test_roundtrip_and_per_topology_ops(self, tmp_path, multi):
        p = tmp_path / "multi.nc"
        multi.ugrid.to_netcdf(p)
        back = xu.open_dataset(p)
        assert len(back.grids) == 2
        names = {g.name for g in back.grids}
        assert names == {"mesh2d", "network1d"}

        # Selection applies per topology; the network edges intersecting
        # the box are kept.
        sel = back.ugrid.sel(x=slice(0.0, 2.0), y=slice(-2.0, 2.0))
        assert {g.name for g in sel.grids} == {"mesh2d", "network1d"}

        renamed = back.ugrid.rename({"mesh2d": "grid"})
        assert {g.name for g in renamed.grids} == {"grid", "network1d"}
        assert "grid_face_z" not in renamed.data_vars  # vars keep names
        assert "face_z" in renamed.data_vars

    def test_getitem_picks_matching_grid(self, multi):
        fz = multi["face_z"]
        assert fz.ugrid.grid.name == "mesh2d"
        q = multi["discharge"]
        assert q.ugrid.grid.name == "network1d"


class TestPartitionPipeline:
    def test_partition_files_merge(self, tmp_path, rich_uds):
        """partition -> write each part -> read back -> merge == original."""
        parts = rich_uds.ugrid.partition(n_part=4)
        paths = []
        for k, part in enumerate(parts):
            p = tmp_path / f"part_{k}.nc"
            part.ugrid.to_netcdf(p)
            paths.append(p)

        reread = [xu.open_dataset(p) for p in paths]
        merged = xu.merge_partitions(reread)
        mgrid = merged.grids[0]
        ogrid = rich_uds.grids[0]
        assert mgrid.n_face == ogrid.n_face
        assert mgrid.n_node == ogrid.n_node

        # Face values survive (modulo face reordering): match by centroid.
        from xugrid_tpu.ugrid.connectivity import index_like

        idx = index_like(mgrid.centroids, ogrid.centroids)
        np.testing.assert_allclose(
            np.asarray(merged["fz"].values)[idx],
            np.asarray(rich_uds["fz"].values),
        )
        np.testing.assert_allclose(
            np.asarray(merged["tfz"].values)[:, idx],
            np.asarray(rich_uds["tfz"].values),
        )

    def test_partition_by_label_roundtrip(self, rich_uds):
        grid = rich_uds.grids[0]
        labels = xu.UgridDataArray(
            DataArray(
                (grid.centroids[:, 0] > 2.0).astype(np.int64),
                dims=(grid.face_dimension,),
            ),
            grid,
        )
        parts = rich_uds.ugrid.partition_by_label(labels)
        assert len(parts) == 2
        merged = xu.merge_partitions(parts)
        assert merged.grids[0].n_face == grid.n_face


class TestFacetChains:
    def test_face_to_node_to_face(self, rich_uds):
        # Facet remap semantics mirror the reference
        # (dataarray_accessor.py:300-344): the new trailing dim holds
        # the contributing entities per target facet.
        fz = rich_uds["fz"]
        on_node = fz.ugrid.to_node()
        assert on_node.dims == ("mesh2d_nNodes", "nmax")
        # A constant field is preserved exactly through a remap
        # round trip (reduce the contributor dim between hops).
        grid = rich_uds.grids[0]
        const = xu.UgridDataArray(
            DataArray(
                np.full(grid.n_face, 3.25), dims=(grid.face_dimension,)
            ),
            grid,
        )
        at_nodes = const.ugrid.to_node()
        node_mean = xu.UgridDataArray(
            DataArray(
                np.nanmean(np.asarray(at_nodes.values), axis=-1),
                dims=(grid.node_dimension,),
            ),
            grid,
        )
        back = node_mean.ugrid.to_face()
        assert back.dims == ("mesh2d_nFaces", "nmax")
        np.testing.assert_allclose(
            np.nanmean(np.asarray(back.values), axis=-1), 3.25
        )

    def test_morphology_chain(self, rich_uds):
        grid = rich_uds.grids[0]
        seed = np.zeros(grid.n_face, dtype=bool)
        seed[5] = True
        uda = xu.UgridDataArray(
            DataArray(seed, dims=(grid.face_dimension,)), grid
        )
        grown = uda.ugrid.binary_dilation(iterations=1)
        shrunk = grown.ugrid.binary_erosion(iterations=1)
        g = np.asarray(grown.values)
        assert g.sum() > 1
        assert np.asarray(shrunk.values).sum() <= g.sum()

    def test_laplace_then_regrid(self, rich_uds):
        """Interpolate gaps, then conservative-regrid to a coarser mesh."""
        grid = rich_uds.grids[0]
        vals = np.asarray(rich_uds["fz"].values).copy()
        vals[::3] = np.nan
        holey = xu.UgridDataArray(
            DataArray(vals, dims=(grid.face_dimension,), name="fz"), grid
        )
        filled = holey.ugrid.laplace_interpolate(direct_solve=True)
        assert np.isfinite(np.asarray(filled.values)).all()

        target = quad_grid(2, 2, dx=2.0)
        tda = xu.UgridDataArray.from_data(
            np.zeros(target.n_face), target, facet="face"
        )
        rg = xu.OverlapRegridder(filled, tda, method="mean")
        out = rg.regrid(filled)
        ov = np.asarray(out.values)
        assert ov.shape == (4,)
        fv = np.asarray(filled.values)
        assert ov.min() >= fv.min() - 1e-12 and ov.max() <= fv.max() + 1e-12


class TestForwardingDepth:
    def test_chained_arithmetic_and_alignment(self, rich_uds):
        fz = rich_uds["fz"]
        tfz = rich_uds["tfz"]
        anomaly = tfz - fz  # broadcast over time
        assert anomaly.dims == ("time", "mesh2d_nFaces")
        assert anomaly.ugrid.grid.n_face == 16

        # isel on the UGRID dim subsets the grid too.
        half = anomaly.isel({"mesh2d_nFaces": np.arange(8)})
        assert half.ugrid.grid.n_face == 8

        # Reduction over the UGRID dim drops to plain xdata.
        collapsed = anomaly.mean("mesh2d_nFaces")
        assert not isinstance(collapsed, xu.UgridDataArray)

    def test_where_and_fillna_chain(self, rich_uds):
        fz = rich_uds["fz"]
        masked = fz.where(fz > 0)
        filled = masked.fillna(0.0)
        assert isinstance(filled, xu.UgridDataArray)
        v = np.asarray(filled.values)
        assert (v >= 0).all()

    def test_transpose_keeps_grid(self, rich_uds):
        tfz = rich_uds["tfz"]
        t = tfz.transpose("mesh2d_nFaces", "time")
        assert isinstance(t, xu.UgridDataArray)
        assert t.shape == (16, 3)

    def test_full_like_concat_merge_chain(self, rich_uds):
        fz = rich_uds["fz"]
        ones = xu.ones_like(fz)
        both = xu.concat(
            [fz.expand_dims("layer"), ones.expand_dims("layer")], dim="layer"
        )
        assert both.shape == (2, 16)
        assert both.ugrid.grid.n_face == 16

    def test_assign_and_drop_coords(self, rich_uds):
        tfz = rich_uds["tfz"]
        tagged = tfz.assign_coords(run=3)
        assert isinstance(tagged, xu.UgridDataArray)
        assert "run" in tagged.coords


class TestErrorSurfaces:
    def test_sel_points_out_of_bounds_modes(self, rich_uds):
        fz = rich_uds["fz"]
        x = np.array([0.5, 99.0])
        y = np.array([0.5, 99.0])
        with pytest.raises(ValueError):
            fz.ugrid.sel_points(x=x, y=y, out_of_bounds="raise")
        dropped = fz.ugrid.sel_points(x=x, y=y, out_of_bounds="drop")
        assert dropped.shape == (1,)
        kept = fz.ugrid.sel_points(x=x, y=y, out_of_bounds="ignore")
        assert kept.shape == (2,)

    def test_merge_partitions_type_errors(self, rich_uds):
        with pytest.raises(ValueError, match="zero partitions"):
            xu.merge_partitions([])
        with pytest.raises(TypeError):
            xu.merge_partitions([rich_uds, np.zeros(3)])

    def test_open_mfdataset_merges_variables(self, tmp_path, rich_uds):
        # Variables split across files on the same topology recombine.
        a = rich_uds[["fz"]]
        b = rich_uds[["nz"]]
        pa, pb = tmp_path / "a.nc", tmp_path / "b.nc"
        a.ugrid.to_netcdf(pa)
        b.ugrid.to_netcdf(pb)
        merged = xu.open_mfdataset([str(pa), str(pb)])
        assert {"fz", "nz"}.issubset(set(merged.data_vars))
        assert merged.grids[0].n_face == rich_uds.grids[0].n_face


class TestAnalysisWorkflow:
    def test_seasonal_regrid_pipeline(self, tmp_path):
        """A realistic postprocessing chain: time series on a mesh ->
        calendar resample -> weighted spatial stats -> structured regrid
        -> file round trip."""
        import xugrid_tpu.data as data

        base = data.disk()["face_z"]
        grid = base.ugrid.grid
        times = np.array(
            ["2020-01-05", "2020-01-20", "2020-02-05",
             "2020-02-20", "2020-03-05", "2020-03-20"],
            dtype="datetime64[ns]",
        )
        vals = np.stack(
            [np.asarray(base.obj.data) * (1 + 0.1 * i) for i in range(6)]
        )
        uda = xu.UgridDataArray(
            DataArray(
                vals, dims=("time", grid.face_dimension),
                coords={"time": times}, name="z",
            ),
            grid,
        )

        # monthly means (resample) then a monthly anomaly (groupby-like)
        monthly = uda.resample(time="M").mean()
        mobj = monthly.obj if hasattr(monthly, "obj") else monthly
        assert mobj.sizes["time"] == 3
        np.testing.assert_allclose(
            np.asarray(mobj.data)[0], vals[:2].mean(axis=0)
        )

        # area-weighted spatial mean per month
        w = xu.UgridDataArray(
            DataArray(grid.area, dims=(grid.face_dimension,)), grid
        )
        sp = mobj if not hasattr(mobj, "weighted") else mobj
        spatial = xu.UgridDataArray(mobj, grid).weighted(w).mean(
            grid.face_dimension
        )
        sobj = spatial.obj if hasattr(spatial, "obj") else spatial
        expect0 = np.sum(vals[:2].mean(axis=0) * grid.area) / grid.area.sum()
        np.testing.assert_allclose(np.asarray(sobj.data)[0], expect0)

        # regrid the first monthly field to a structured grid
        first = xu.UgridDataArray(
            mobj.isel(time=0), grid
        )
        xs = np.linspace(2.0, 8.0, 9)
        ys = np.linspace(2.0, 8.0, 8)
        tgt = DataArray(
            np.zeros((8, 9)), dims=("y", "x"),
            coords={"y": ys, "x": xs}, name="t",
        )
        rg = xu.OverlapRegridder(first, target=tgt, method="mean")
        out = rg.regrid(first)
        assert np.isfinite(np.asarray(out.data)).any()

        # write the monthly series and reopen
        uds = xu.UgridDataset(grids=[grid])
        uds["z_monthly"] = mobj
        p = tmp_path / "monthly.nc"
        uds.ugrid.to_netcdf(p)
        back = xu.open_dataset(p)
        bobj = back["z_monthly"].obj
        assert bobj.sizes["time"] == 3
        assert np.asarray(bobj.coords["time"].data).dtype.kind == "M"
        np.testing.assert_allclose(
            np.asarray(bobj.data), np.asarray(mobj.data)
        )
