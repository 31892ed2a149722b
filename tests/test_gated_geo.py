"""
Vector-geometry code paths exercised WITHOUT shapely/geopandas.

burn_vector_geometry, snap_to_grid, polygonize, and the GeoDataFrame
conversions are gated on shapely/geopandas and would otherwise never run
in this environment.  ``tests/fake_geo.py`` provides numpy-backed
stand-ins for the narrow API surface they touch, so the full production
control flow runs end to end.  Reference behavior: xugrid
tests/test_ugrid_dataset.py (geodataframe round trips), tests/
test_snap.py, tests/test_polygonize.py.
"""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu import xdata

from . import fake_geo


@pytest.fixture
def geo(monkeypatch):
    shp, gpd = fake_geo.install(monkeypatch)
    return shp, gpd


def quad_grid(nx, ny, dx=1.0):
    x = np.arange(nx + 1.0) * dx
    y = np.arange(ny + 1.0) * dx
    yy, xx = np.meshgrid(y, x, indexing="ij")
    verts = np.column_stack([xx.ravel(), yy.ravel()])
    j, i = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    nid = lambda ii, jj: jj * (nx + 1) + ii  # noqa: E731
    faces = np.stack(
        [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)],
        axis=-1,
    ).reshape(-1, 4)
    return xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces)


class TestBurnVectorGeometry:
    def test_mixed_geometry(self, geo):
        shp, gpd = geo
        grid = quad_grid(8, 8)
        polygon = shp.Polygon(
            [[1.0, 1.0], [5.0, 1.0], [5.0, 5.0], [1.0, 5.0]],
            holes=[[[2.0, 2.0], [2.0, 4.0], [4.0, 4.0], [4.0, 2.0]]],
        )
        point = shp.Point(6.5, 6.5)
        line = shp.LineString([[0.5, 7.5], [7.5, 7.5]])
        gdf = gpd.GeoDataFrame(
            {"v": [2.0, 5.0, 9.0]}, geometry=[polygon, point, line]
        )
        out = xu.burn_vector_geometry(gdf, grid, column="v")
        values = np.asarray(out.obj.data)
        v = values.reshape(8, 8)
        # polygon: faces with centroid in [1,5]x[1,5] minus hole [2,4]^2
        ring = v[1:5, 1:5].copy()
        ring[1:3, 1:3] = np.nan  # mask the hole
        assert np.nansum(ring == 2.0) == 12
        assert v[1, 1] == 2.0 and v[4, 4] == 2.0
        assert np.isnan(v[2, 2]) and np.isnan(v[3, 3])  # hole
        assert v[6, 6] == 5.0  # point
        assert (v[7, 1:7] == 9.0).all()  # line row
        assert np.isnan(v[0, 0])

    def test_column_default_and_fill(self, geo):
        shp, gpd = geo
        grid = quad_grid(4, 4)
        gdf = gpd.GeoDataFrame(
            geometry=[shp.Polygon([[0, 0], [2, 0], [2, 2], [0, 2]])]
        )
        out = xu.burn_vector_geometry(gdf, grid, fill=-1.0)
        v = np.asarray(out.obj.data).reshape(4, 4)
        assert (v[:2, :2] == 1.0).all()
        assert (v[2:, :] == -1.0).all()

    def test_all_touched(self, geo):
        shp, gpd = geo
        grid = quad_grid(4, 4)
        gdf = gpd.GeoDataFrame(
            geometry=[
                shp.Polygon([[0.0, 0.0], [1.4, 0.0], [1.4, 1.4], [0.0, 1.4]])
            ]
        )
        v0 = np.asarray(
            xu.burn_vector_geometry(gdf, grid, all_touched=False).obj.data
        ).reshape(4, 4)
        v1 = np.asarray(
            xu.burn_vector_geometry(gdf, grid, all_touched=True).obj.data
        ).reshape(4, 4)
        assert np.nansum(v0) == 1.0  # only face (0,0) has its centroid in
        assert np.nansum(v1) == 4.0  # 2x2 faces overlapped

    def test_type_errors(self, geo):
        shp, gpd = geo
        grid = quad_grid(2, 2)
        with pytest.raises(TypeError, match="gdf must be GeoDataFrame"):
            xu.burn_vector_geometry("nope", grid)
        gdf = gpd.GeoDataFrame(geometry=[shp.Point(0.5, 0.5)])
        with pytest.raises(TypeError, match="Like must be Ugrid2d"):
            xu.burn_vector_geometry(gdf, "nope")


class TestGeoDataFrameConversion:
    def test_ugrid2d_from_geodataframe(self, geo):
        shp, gpd = geo
        # two unit squares sharing an edge
        p1 = shp.Polygon([[0, 0], [1, 0], [1, 1], [0, 1]])
        p2 = shp.Polygon([[1, 0], [2, 0], [2, 1], [1, 1]])
        gdf = gpd.GeoDataFrame(geometry=[p1, p2], crs=None)
        grid = xu.Ugrid2d.from_geodataframe(gdf)
        assert grid.n_face == 2
        assert grid.n_node == 6
        np.testing.assert_allclose(np.sort(grid.area), [1.0, 1.0])

    def test_ugrid1d_from_geodataframe(self, geo):
        shp, gpd = geo
        l1 = shp.LineString([[0, 0], [1, 0], [2, 0]])
        l2 = shp.LineString([[2, 0], [2, 1]])
        gdf = gpd.GeoDataFrame(geometry=[l1, l2])
        grid = xu.Ugrid1d.from_geodataframe(gdf)
        assert grid.n_edge == 3
        assert grid.n_node == 4

    def test_grid_from_geodataframe_dispatch(self, geo):
        shp, gpd = geo
        from xugrid_tpu.conversion import grid_from_geodataframe

        poly_gdf = gpd.GeoDataFrame(
            geometry=[shp.Polygon([[0, 0], [1, 0], [1, 1], [0, 1]])]
        )
        assert isinstance(grid_from_geodataframe(poly_gdf), xu.Ugrid2d)
        line_gdf = gpd.GeoDataFrame(
            geometry=[shp.LineString([[0, 0], [1, 1]])]
        )
        assert isinstance(grid_from_geodataframe(line_gdf), xu.Ugrid1d)
        mixed = gpd.GeoDataFrame(
            geometry=[
                shp.Polygon([[0, 0], [1, 0], [1, 1], [0, 1]]),
                shp.LineString([[0, 0], [1, 1]]),
            ]
        )
        with pytest.raises(ValueError, match="Multiple geometry types"):
            grid_from_geodataframe(mixed)
        with pytest.raises(TypeError, match="expected a GeoDataFrame"):
            grid_from_geodataframe([1, 2])

    def test_to_geodataframe_roundtrip(self, geo):
        shp, gpd = geo
        grid = quad_grid(3, 2)
        uda = xu.UgridDataArray(
            xdata.DataArray(
                np.arange(grid.n_face, dtype=float),
                dims=(grid.face_dimension,),
                name="depth",
            ),
            grid,
        )
        gdf = uda.ugrid.to_geodataframe()
        assert len(gdf) == grid.n_face
        np.testing.assert_allclose(
            gdf["depth"].to_numpy(), np.arange(grid.n_face, dtype=float)
        )
        # geometry rows are unit-square polygons over the faces
        geoms = gdf.geometry.to_numpy()
        assert all(g.type_id == shp.GeometryType.POLYGON for g in geoms)
        back = xu.Ugrid2d.from_geodataframe(gpd.GeoDataFrame(gdf))
        assert back.n_face == grid.n_face
        np.testing.assert_allclose(back.area.sum(), grid.area.sum())

    def test_dataset_to_geodataframe(self, geo):
        shp, gpd = geo
        grid = quad_grid(2, 2)
        uds = xu.UgridDataset(grids=[grid])
        uds["a"] = xdata.DataArray(
            np.arange(grid.n_face, dtype=float),
            dims=(grid.face_dimension,),
        )
        gdf = uds.ugrid.to_geodataframe()
        assert len(gdf) == grid.n_face
        np.testing.assert_allclose(gdf["a"].to_numpy(), [0, 1, 2, 3])


class TestToShapely:
    def test_facets(self, geo):
        shp, gpd = geo
        grid = quad_grid(2, 2)
        faces = grid.to_shapely(grid.face_dimension)
        assert len(faces) == 4
        assert all(g.type_id == shp.GeometryType.POLYGON for g in faces)
        edges = grid.to_shapely(grid.edge_dimension)
        assert len(edges) == grid.n_edge
        nodes = grid.to_shapely(grid.node_dimension)
        assert len(nodes) == grid.n_node
        assert all(g.type_id == shp.GeometryType.POINT for g in nodes)


class TestSnapToGrid:
    def test_snap_line(self, geo):
        shp, gpd = geo
        grid = quad_grid(4, 4)
        # a line running along y=2 across the grid, slightly offset
        line = shp.LineString([[0.0, 2.2], [4.0, 2.2]])
        gdf = gpd.GeoDataFrame({"w": [3.5]}, geometry=[line])
        uds, snapped = xu.snap_to_grid(gdf, grid, max_snap_distance=0.5)
        li = np.asarray(uds["line_index"].obj.data)
        hit = ~np.isnan(li)
        assert hit.sum() == 4  # four horizontal edges along y=2
        # snapped edges all lie on y == 2
        edge_y = grid.edge_coordinates[hit][:, 1]
        np.testing.assert_allclose(edge_y, 2.0)
        # attribute column carried through
        w = np.asarray(uds["w"].obj.data)
        np.testing.assert_allclose(w[hit], 3.5)
        assert len(snapped) == 4
        assert all(
            g.type_id == shp.GeometryType.LINESTRING
            for g in snapped.geometry
        )

    def test_create_snap_dataframe(self, geo):
        shp, gpd = geo
        from xugrid_tpu.ugrid.snapping import create_snap_to_grid_dataframe

        grid = quad_grid(3, 3)
        line = shp.LineString([[0.0, 1.1], [3.0, 1.1]])
        gdf = gpd.GeoDataFrame({"k": [1]}, geometry=[line])
        df = create_snap_to_grid_dataframe(gdf, grid, max_snap_distance=0.3)
        assert {"line_index", "edge_index", "length"} <= set(df.columns)
        assert (df["line_index"] == 0).all()
        assert len(df) > 0

    def test_coerce_geometry_rejects_points(self, geo):
        shp, gpd = geo
        from xugrid_tpu.ugrid.snapping import coerce_geometry

        gdf = gpd.GeoDataFrame(geometry=[shp.Point(0, 0)])
        with pytest.raises(ValueError, match="LineString"):
            coerce_geometry(gdf)


class TestSyntheticGeoData:
    def test_provinces_nl(self, geo):
        shp, gpd = geo
        from xugrid_tpu.data.synthetic import provinces_nl

        gdf = provinces_nl()
        assert len(gdf) == 12
        assert all(
            g.type_id == shp.GeometryType.POLYGON for g in gdf.geometry
        )
        assert list(gdf["id"].to_numpy()) == list(range(12))

    def test_hydamo_network(self, geo):
        shp, gpd = geo
        from xugrid_tpu.data.synthetic import hydamo_network

        objects, points, profiles = hydamo_network()
        assert len(objects) >= 1
        assert all(
            g.type_id == shp.GeometryType.LINESTRING
            for g in objects.geometry
        )
        assert all(
            g.type_id == shp.GeometryType.POINT for g in points.geometry
        )
        assert all(
            g.type_id == shp.GeometryType.LINESTRING
            for g in profiles.geometry
        )


class TestPolygonize:
    def test_two_regions(self, geo):
        shp, gpd = geo
        grid = quad_grid(4, 2)
        values = np.zeros(grid.n_face)
        values[grid.face_coordinates[:, 0] > 2.0] = 1.0
        uda = xu.UgridDataArray(
            xdata.DataArray(values, dims=(grid.face_dimension,)),
            grid,
        )
        gdf = xu.polygonize(uda)
        assert len(gdf) == 2
        vals = np.sort(gdf["values"].to_numpy())
        np.testing.assert_allclose(vals, [0.0, 1.0])
        areas = []
        for g in gdf.geometry:
            c = g.exterior.coords
            x, y = c[:-1, 0], c[:-1, 1]
            areas.append(
                abs(
                    0.5
                    * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
                )
            )
        np.testing.assert_allclose(sorted(areas), [4.0, 4.0])
