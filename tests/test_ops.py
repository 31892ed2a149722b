"""Tests for snapping, earcut, burn, polygonize, and sample data."""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu import xdata
from xugrid_tpu.ops.earcut import earcut_triangulate
from xugrid_tpu.ugrid import snapping

from . import has_geopandas, requires_geopandas, requires_shapely


def quad_grid(nx, ny, dx=1.0):
    x = np.arange(nx + 1.0) * dx
    y = np.arange(ny + 1.0) * dx
    yy, xx = np.meshgrid(y, x, indexing="ij")
    verts = np.column_stack([xx.ravel(), yy.ravel()])

    def nid(i, j):
        return j * (nx + 1) + i

    faces = np.array(
        [
            [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)]
            for j in range(ny)
            for i in range(nx)
        ]
    )
    return xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces)


class TestEarcut:
    @staticmethod
    def _area(vertices, triangles):
        a = vertices[triangles[:, 0]]
        b = vertices[triangles[:, 1]]
        c = vertices[triangles[:, 2]]
        return 0.5 * np.abs(
            (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
            - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
        )

    def test_square(self):
        vertices = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
        tris = earcut_triangulate(vertices, np.array([4]))
        assert len(tris) == 2
        assert np.isclose(self._area(vertices, tris).sum(), 1.0)

    def test_concave(self):
        # L-shape
        vertices = np.array(
            [[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], dtype=float
        )
        tris = earcut_triangulate(vertices, np.array([6]))
        assert len(tris) == 4
        assert np.isclose(self._area(vertices, tris).sum(), 3.0)

    def test_clockwise_input(self):
        vertices = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]])
        tris = earcut_triangulate(vertices, np.array([4]))
        assert np.isclose(self._area(vertices, tris).sum(), 1.0)

    def test_with_hole(self):
        outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
        hole = np.array([[1, 1], [1, 2], [2, 2], [2, 1]], dtype=float)
        vertices = np.vstack([outer, hole])
        tris = earcut_triangulate(vertices, np.array([4, 8]))
        assert np.isclose(self._area(vertices, tris).sum(), 16.0 - 1.0)

    def test_irregular_polygon(self):
        rng = np.random.default_rng(0)
        angles = np.sort(rng.uniform(0, 2 * np.pi, 12))
        radius = rng.uniform(1.0, 2.0, 12)
        vertices = np.column_stack(
            [radius * np.cos(angles), radius * np.sin(angles)]
        )
        tris = earcut_triangulate(vertices, np.array([12]))
        assert len(tris) == 10
        # total area equals shoelace area
        x, y = vertices.T
        shoelace = 0.5 * abs(
            np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        )
        assert np.isclose(self._area(vertices, tris).sum(), shoelace)

    @staticmethod
    def _signed_area(vertices, triangles):
        a = vertices[triangles[:, 0]]
        b = vertices[triangles[:, 1]]
        c = vertices[triangles[:, 2]]
        return 0.5 * (
            (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
            - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
        )

    def test_multi_hole_grid(self):
        # Rectangular holes in a grid: many holes bridge to shared
        # vertices, exercising the locally-inside occurrence choice.
        for gx, gy in [(2, 1), (3, 2), (4, 3)]:
            w, h = 10.0, 8.0
            outer = np.array([[0, 0], [w, 0], [w, h], [0, h]], float)
            holes = []
            for i in range(gx):
                for j in range(gy):
                    x0, x1 = (i + 0.25) * w / gx, (i + 0.75) * w / gx
                    y0, y1 = (j + 0.25) * h / gy, (j + 0.75) * h / gy
                    holes.append(
                        np.array(
                            [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
                        )[::-1]
                    )
            vertices = np.vstack([outer] + holes)
            rings = np.cumsum([4] + [4] * len(holes))
            tris = earcut_triangulate(vertices, rings)
            areas = self._signed_area(vertices, tris)
            expect = w * h - sum(
                abs(
                    0.5
                    * np.sum(
                        r[:, 0] * np.roll(r[:, 1], -1)
                        - np.roll(r[:, 0], -1) * r[:, 1]
                    )
                )
                for r in holes
            )
            assert (areas > 0).all()
            assert np.isclose(areas.sum(), expect)

    def test_multi_hole_fuzz(self):
        # Random star outers with random rectangular holes; every
        # triangle must be CCW and the total area exact.  Regression for
        # the weakly-simple ear-clip failures (convex in-triangle
        # blockers, chains through corner-coincident duplicates, and
        # self-crossings AT a shared bridge vertex).
        rng = np.random.default_rng(7)

        def pip(p, ring):
            c = False
            m = len(ring)
            for i in range(m):
                a, b = ring[i], ring[(i + 1) % m]
                if (a[1] > p[1]) != (b[1] > p[1]):
                    xi = a[0] + (p[1] - a[1]) / (b[1] - a[1]) * (
                        b[0] - a[0]
                    )
                    if p[0] < xi:
                        c = not c
            return c

        for _ in range(60):
            n = int(rng.integers(5, 12))
            while True:
                ang = np.sort(rng.uniform(0, 2 * np.pi, n))
                gaps = np.diff(
                    np.concatenate([ang, [ang[0] + 2 * np.pi]])
                )
                if gaps.max() < np.pi:
                    break
            rad = rng.uniform(4.0, 8.0, n)
            outer = np.column_stack(
                [rad * np.cos(ang), rad * np.sin(ang)]
            )
            holes, boxes = [], []
            want = int(rng.integers(1, 4))
            for _t in range(60):
                if len(holes) >= want:
                    break
                cx, cy = rng.uniform(-3, 3, 2)
                hw, hh = rng.uniform(0.3, 1.2, 2)
                x0, x1, y0, y1 = cx - hw, cx + hw, cy - hh, cy + hh
                box = np.array(
                    [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
                )
                if not all(pip(p, outer) for p in box):
                    continue
                clear = True
                for i in range(n):
                    a, b = outer[i], outer[(i + 1) % n]
                    lo, hi = np.minimum(a, b), np.maximum(a, b)
                    if not (
                        hi[0] < x0
                        or lo[0] > x1
                        or hi[1] < y0
                        or lo[1] > y1
                    ):
                        clear = False
                        break
                if not clear:
                    continue
                if any(
                    not (x1 < b0 or b1 < x0 or y1 < b2 or b3 < y0)
                    for b0, b1, b2, b3 in boxes
                ):
                    continue
                boxes.append((x0, x1, y0, y1))
                holes.append(box[::-1])
            vertices = np.vstack([outer] + holes)
            rings = np.cumsum([n] + [4] * len(holes))
            tris = earcut_triangulate(vertices, rings)
            areas = self._signed_area(vertices, tris)
            x, y = outer.T
            expect = 0.5 * abs(
                np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
            ) - sum(
                4.0 * hw_ * hh_
                for (hw_, hh_) in [
                    ((b1 - b0) / 2, (b3 - b2) / 2)
                    for b0, b1, b2, b3 in boxes
                ]
            )
            assert (areas > -1e-9).all()
            assert np.isclose(areas.sum(), expect)

    def test_concave_holes(self):
        # Concave holes (L-shapes, stars, triangles) exercise reflex
        # hole chains through the bridge machinery.
        rng = np.random.default_rng(71)
        L = np.array(
            [[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], float
        )
        star_ang = np.linspace(0, 2 * np.pi, 10, endpoint=False)
        star_r = np.where(np.arange(10) % 2 == 0, 1.0, 0.45)
        star = np.column_stack(
            [5.0 + star_r * np.cos(star_ang), 5.0 + star_r * np.sin(star_ang)]
        )
        for trial in range(20):
            outer = np.array(
                [[-4, -4], [12, -4], [12, 12], [-4, 12]], float
            )
            cx, cy = rng.uniform(0, 2, 2)
            holes = [
                (L + [cx, cy])[::-1],
                star[::-1],
                np.array([[8, 0], [10, 0], [9, 2]], float)[::-1],
            ]
            verts = np.vstack([outer] + holes)
            rings = np.cumsum([4] + [len(h) for h in holes])
            tris = earcut_triangulate(verts, rings)
            areas = self._signed_area(verts, tris)

            def ring_area(r):
                x, y = r[:, 0], r[:, 1]
                return 0.5 * np.sum(
                    x * np.roll(y, -1) - np.roll(x, -1) * y
                )

            expect = abs(ring_area(outer)) - sum(
                abs(ring_area(h)) for h in holes
            )
            assert (areas > -1e-9).all()
            assert np.isclose(areas.sum(), expect)

    def test_hole_outside_outer_dropped(self):
        # A hole lying entirely outside the outer ring is invalid input;
        # it must be ignored instead of corrupting the triangulation.
        outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
        hole = np.array([[10, 1], [10, 2], [11, 2], [11, 1]], float)
        vertices = np.vstack([outer, hole])
        tris = earcut_triangulate(vertices, np.array([4, 8]))
        areas = self._signed_area(vertices, tris)
        assert (areas > 0).all()
        assert np.isclose(areas.sum(), 16.0)


class TestSnapping:
    def test_snap_nodes(self):
        x = np.array([0.0, 0.05, 1.0, 2.0])
        y = np.array([0.0, 0.0, 0.0, 0.0])
        inverse, xs, ys = snapping.snap_nodes(x, y, max_snap_distance=0.1)
        assert len(xs) == 3
        assert inverse is not None
        assert inverse[0] == inverse[1]

    def test_snap_nodes_nothing_to_snap(self):
        x = np.array([0.0, 1.0, 2.0])
        y = np.zeros(3)
        inverse, xs, ys = snapping.snap_nodes(x, y, max_snap_distance=0.1)
        assert inverse is None
        assert np.array_equal(xs, x)

    def test_snap_to_nodes(self):
        x = np.array([0.04, 0.96, 5.0])
        y = np.array([0.0, 0.0, 0.0])
        to_x = np.array([0.0, 1.0, 2.0])
        to_y = np.zeros(3)
        xs, ys = snapping.snap_to_nodes(x, y, to_x, to_y, max_distance=0.1)
        assert np.allclose(xs, [0.0, 1.0, 5.0])

    def test_snap_to_nodes_tie(self):
        x = np.array([0.5])
        y = np.array([0.0])
        to_x = np.array([0.0, 1.0])
        to_y = np.zeros(2)
        with pytest.raises(ValueError, match="Ties detected"):
            snapping.snap_to_nodes(x, y, to_x, to_y, max_distance=0.6)
        xs, ys = snapping.snap_to_nodes(
            x, y, to_x, to_y, max_distance=0.6, tiebreaker="nearest"
        )
        assert xs[0] in (0.0, 1.0)

    def test_snap_to_edges(self):
        # Horizontal segment through the middle of row 1 of a 4x4 grid
        # separates centroids of row 0/1 from row 1/2... the segment
        # within face (i, 1) separates centroid (i, 1) from (i, 0) and
        # (i, 2)? No: it separates across edges it crosses between.
        grid = quad_grid(4, 4)
        segments = np.array(
            [[[0.0, 1.5], [1.0, 1.5]], [[1.0, 1.5], [2.0, 1.5]]]
        )
        # Each segment lies fully in one face: faces 4 and 5.
        face_indices = np.array([4, 5])
        edge_index, segment_index = snapping.snap_to_edges(
            face_indices,
            segments,
            grid.face_edge_connectivity,
            grid.edge_face_connectivity,
            grid.centroids,
            tolerance=1e-12,
        )
        # A mid-cell horizontal segment separates no centroids (it is
        # parallel to and between rows): centroids of left/right
        # neighbors are not separated; top/bottom are. Each face has a
        # top and bottom neighbor -> but the separating edge must cross
        # the centroid-to-centroid line.
        assert len(edge_index) == 0 or (edge_index >= 0).all()

    def test_snap_to_edges_vertical(self):
        grid = quad_grid(2, 2)
        # vertical segment inside face 0 near its right edge
        segments = np.array([[[0.9, 0.1], [0.9, 0.9]]])
        face_indices = np.array([0])
        edge_index, segment_index = snapping.snap_to_edges(
            face_indices,
            segments,
            grid.face_edge_connectivity,
            grid.edge_face_connectivity,
            grid.centroids,
            tolerance=1e-6,
        )
        # separates centroid (0.5, 0.5) from (1.5, 0.5): the shared edge
        expected_edge = None
        efc = grid.edge_face_connectivity
        for e in range(grid.n_edge):
            pair = set(efc[e])
            if pair == {0, 1}:
                expected_edge = e
        assert len(edge_index) == 1
        assert edge_index[0] == expected_edge


class TestData:
    def test_disk(self):
        uds = xu.data.disk()
        assert {"node_z", "face_z", "edge_z"} <= set(uds.obj.data_vars)
        grid = uds.grid
        assert grid.n_face == 384
        assert np.isclose(grid.area.sum(), np.pi * 5**2, rtol=0.05)

    def test_elevation_nl(self):
        uda = xu.data.elevation_nl(n_points=2000)
        assert uda.obj.name == "elevation"
        assert uda.grid.n_face > 1000

    def test_adh_san_diego(self):
        uds = xu.data.adh_san_diego(n_times=3)
        assert uds["depth"].obj.dims[0] == "time"
        assert uds["depth"].obj.sizes["time"] == 3

    def test_xoxo(self):
        grid = xu.data.xoxo()
        import scipy.sparse.csgraph

        n_components, _ = scipy.sparse.csgraph.connected_components(
            grid.face_face_connectivity
        )
        assert n_components >= 2


@requires_geopandas
class TestBurn:
    def test_burn_polygon(self):
        import geopandas as gpd
        import shapely

        from xugrid_tpu.ugrid.burn import burn_vector_geometry

        grid = quad_grid(10, 10)
        square = shapely.Polygon(
            [(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0)]
        )
        gdf = gpd.GeoDataFrame({"value": [7.0]}, geometry=[square])
        burned = burn_vector_geometry(gdf, grid, column="value")
        values = np.asarray(burned.values).reshape(10, 10)
        assert np.allclose(values[2:6, 2:6], 7.0)
        assert np.isnan(values[0, 0])
        assert np.isnan(values[8:, 8:]).all()

    def test_burn_polygon_with_hole(self):
        import geopandas as gpd
        import shapely

        from xugrid_tpu.ugrid.burn import burn_vector_geometry

        grid = quad_grid(10, 10)
        poly = shapely.Polygon(
            [(1, 1), (9, 1), (9, 9), (1, 9)],
            holes=[[(4, 4), (4, 6), (6, 6), (6, 4)]],
        )
        gdf = gpd.GeoDataFrame({"value": [1.0]}, geometry=[poly])
        burned = burn_vector_geometry(gdf, grid, column="value")
        values = np.asarray(burned.values).reshape(10, 10)
        assert np.allclose(values[2, 2], 1.0)
        assert np.isnan(values[4:6, 4:6]).all()  # the hole

    def test_burn_points_and_lines(self):
        import geopandas as gpd
        import shapely

        from xugrid_tpu.ugrid.burn import burn_vector_geometry

        grid = quad_grid(4, 4)
        geoms = [
            shapely.Point(0.5, 0.5),
            shapely.LineString([(0.0, 3.5), (4.0, 3.5)]),
        ]
        gdf = gpd.GeoDataFrame({"value": [5.0, 9.0]}, geometry=geoms)
        burned = burn_vector_geometry(gdf, grid, column="value")
        values = np.asarray(burned.values).reshape(4, 4)
        assert values[0, 0] == 5.0
        assert np.allclose(values[3], 9.0)

    def test_earcut_triangulate_polygons(self):
        import geopandas as gpd
        import shapely

        from xugrid_tpu.ugrid.burn import earcut_triangulate_polygons

        squares = [
            shapely.Polygon([(0, 0), (1, 0), (1, 1), (0, 1)]),
            shapely.Polygon([(2, 0), (3, 0), (3, 1), (2, 1)]),
        ]
        gdf = gpd.GeoDataFrame({"value": [1.0, 2.0]}, geometry=squares)
        uda = earcut_triangulate_polygons(gdf, column="value")
        assert uda.grid.n_face == 4
        assert np.allclose(np.sort(np.asarray(uda.values)), [1, 1, 2, 2])

    def test_polygonize(self):
        from xugrid_tpu.ugrid.polygonize import polygonize

        grid = quad_grid(4, 4)
        values = np.zeros(16)
        values[:8] = 1.0  # bottom two rows
        uda = xu.UgridDataArray(
            xdata.DataArray(values, dims=(grid.face_dimension,)), grid
        )
        gdf = polygonize(uda)
        assert len(gdf) == 2
        areas = gdf.geometry.area.to_numpy()
        assert np.allclose(np.sort(areas), [8.0, 8.0])

    def test_snap_to_grid(self):
        import geopandas as gpd
        import shapely

        from xugrid_tpu.ugrid.snapping import snap_to_grid

        grid = quad_grid(4, 4)
        line = shapely.LineString([(0.0, 2.1), (4.0, 2.1)])
        gdf = gpd.GeoDataFrame({"q": [3.0]}, geometry=[line])
        uds, out_gdf = snap_to_grid(gdf, grid, max_snap_distance=0.2)
        line_index = np.asarray(uds["line_index"].values)
        snapped_edges = np.flatnonzero(~np.isnan(line_index))
        # The line snaps onto the horizontal edges at y=2
        mid = grid.edge_coordinates[snapped_edges]
        assert np.allclose(mid[:, 1], 2.0)
        assert len(snapped_edges) == 4


@requires_geopandas
def test_hydamo_network_sample():
    objects, points, profiles = xu.data.hydamo_network()
    assert len(objects) == 9  # main + 8 branches
    assert len(points) == 2 * len(objects)
    assert len(profiles) == len(objects)
    assert objects.geometry.geom_type.eq("LineString").all()
    assert points.geometry.geom_type.eq("Point").all()


class TestSnappingInternals:
    def test_lines_as_edges(self):
        from xugrid_tpu.ugrid.snapping import lines_as_edges

        coords = np.array(
            [[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [5.0, 5.0], [6.0, 5.0]]
        )
        index = np.array([0, 0, 0, 1, 1])
        edges, edge_line = lines_as_edges(coords, index)
        # Two segments from line 0, one from line 1; the cross-line pair
        # (2.0,0.0)-(5.0,5.0) is dropped.
        assert edges.shape == (3, 2, 2)
        np.testing.assert_array_equal(edge_line, [0, 0, 1])
        np.testing.assert_allclose(edges[2, 0], [5.0, 5.0])

    def test_left_of(self):
        from xugrid_tpu.ugrid.snapping import _left_of

        p = np.array([0.0, 0.0])
        u = np.array([1.0, 0.0])  # ray along +x
        assert bool(_left_of(np.array([0.5, 1.0]), p, u))
        assert not bool(_left_of(np.array([0.5, -1.0]), p, u))

    def test_edges_from_arrays_snaps_vertices(self):
        from xugrid_tpu.ugrid.snapping import _edges_from_arrays

        grid = quad_grid(4, 4)
        line_coords = np.array([[0.05, 2.02], [3.96, 2.04]])
        line_index = np.array([0, 0])
        edges, edge_line = _edges_from_arrays(
            line_coords, line_index, grid, max_snap_distance=0.1
        )
        # Endpoints snapped onto the nearest grid nodes.
        np.testing.assert_allclose(edges[0, 0], [0.0, 2.0])
        np.testing.assert_allclose(edges[0, 1], [4.0, 2.0])
