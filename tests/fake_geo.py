"""
Minimal numpy-backed shapely/geopandas stand-ins.

shapely/geopandas are absent in this environment, so the vector-geometry
suites (burn, snapping, polygonize, geodataframe conversion) would never
run.  These fakes implement exactly the narrow API surface the
production code touches — the flat-coordinate constructors and accessors
of shapely 2.x plus a DataFrame-with-geometry — so those code paths are
exercised for real.  Install with the ``fake_geo`` fixture from
``tests/test_gated_geo.py``.
"""

import enum
import types

import numpy as np
import pandas as pd


class GeometryType(enum.IntEnum):
    POINT = 0
    LINESTRING = 1
    LINEARRING = 2
    POLYGON = 3
    MULTIPOINT = 4
    MULTILINESTRING = 5
    MULTIPOLYGON = 6
    GEOMETRYCOLLECTION = 7


class _Geometry:
    type_id = -1

    @property
    def bounds(self):
        xy = self._xy()
        return (
            float(xy[:, 0].min()),
            float(xy[:, 1].min()),
            float(xy[:, 0].max()),
            float(xy[:, 1].max()),
        )

    def _xy(self):
        raise NotImplementedError


class Point(_Geometry):
    type_id = int(GeometryType.POINT)

    def __init__(self, x, y=None):
        if y is None:
            xy = np.asarray(x, dtype=np.float64).reshape(2)
        else:
            xy = np.array([x, y], dtype=np.float64)
        self.coords = xy[None, :]
        self.x, self.y = float(xy[0]), float(xy[1])

    def _xy(self):
        return self.coords


class LineString(_Geometry):
    type_id = int(GeometryType.LINESTRING)

    def __init__(self, coords):
        self.coords = np.asarray(coords, dtype=np.float64).reshape(-1, 2)

    def _xy(self):
        return self.coords

    def interpolate(self, distance, normalized=False):
        xy = self.coords
        seg = np.linalg.norm(np.diff(xy, axis=0), axis=1)
        cum = np.concatenate([[0.0], np.cumsum(seg)])
        total = cum[-1] if cum[-1] > 0 else 1.0
        d = float(distance) * total if normalized else float(distance)
        d = min(max(d, 0.0), cum[-1])
        i = int(np.searchsorted(cum, d, side="right") - 1)
        i = min(i, len(seg) - 1)
        t = (d - cum[i]) / seg[i] if seg[i] > 0 else 0.0
        p = xy[i] + t * (xy[i + 1] - xy[i])
        return Point(p)


class LinearRing(LineString):
    type_id = int(GeometryType.LINEARRING)

    def __init__(self, coords):
        xy = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
        # GEOS rings repeat the first vertex at the end.
        if len(xy) and not np.array_equal(xy[0], xy[-1]):
            xy = np.vstack([xy, xy[:1]])
        self.coords = xy


class Polygon(_Geometry):
    type_id = int(GeometryType.POLYGON)

    def __init__(self, shell, holes=()):
        self.exterior = (
            shell if isinstance(shell, LinearRing) else LinearRing(shell)
        )
        self.interiors = [
            h if isinstance(h, LinearRing) else LinearRing(h)
            for h in (holes or ())
        ]

    def _xy(self):
        return self.exterior.coords


class GeometryCollection(_Geometry):
    type_id = int(GeometryType.GEOMETRYCOLLECTION)

    def __init__(self, geoms):
        self.geoms = list(geoms)


def _as_geom_list(geometry):
    if isinstance(geometry, _Geometry):
        return [geometry]
    if hasattr(geometry, "to_numpy") and not isinstance(
        geometry, (list, tuple, np.ndarray)
    ):
        geometry = geometry.to_numpy()
    return list(np.asarray(geometry, dtype=object).ravel())


def get_type_id(geometry):
    geoms = _as_geom_list(geometry)
    out = np.array([g.type_id for g in geoms], dtype=np.int64)
    if isinstance(geometry, _Geometry):
        return int(out[0])
    return out


def _geom_coordinates(g):
    if isinstance(g, Polygon):
        parts = [g.exterior.coords] + [r.coords for r in g.interiors]
        return parts
    return [np.asarray(g.coords, dtype=np.float64)]


def get_coordinates(geometry, return_index=False):
    geoms = _as_geom_list(geometry)
    chunks = []
    index = []
    for i, g in enumerate(geoms):
        for part in _geom_coordinates(g):
            chunks.append(part)
            index.append(np.full(len(part), i, dtype=np.int64))
    if chunks:
        xy = np.concatenate(chunks, axis=0)
        idx = np.concatenate(index)
    else:
        xy = np.empty((0, 2), dtype=np.float64)
        idx = np.empty(0, dtype=np.int64)
    if return_index:
        return xy, idx
    return xy


def points(x, y=None):
    if y is None:
        xy = np.asarray(x, dtype=np.float64).reshape(-1, 2)
    else:
        xy = np.column_stack([x, y]).astype(np.float64)
    out = np.empty(len(xy), dtype=object)
    for i, row in enumerate(xy):
        out[i] = Point(row)
    return out


def _split(xy, indices, cls):
    xy = np.asarray(xy, dtype=np.float64).reshape(-1, 2)
    if indices is None:
        return np.array([cls(xy)], dtype=object)
    indices = np.asarray(indices)
    uniq = np.unique(indices)
    out = np.empty(len(uniq), dtype=object)
    for k, u in enumerate(uniq):
        out[k] = cls(xy[indices == u])
    return out


def linestrings(xy, y=None, indices=None):
    if y is not None:
        xy = np.column_stack([xy, y])
    return _split(xy, indices, LineString)


def linearrings(xy, y=None, indices=None):
    if y is not None:
        xy = np.column_stack([xy, y])
    return _split(xy, indices, LinearRing)


def polygons(rings, indices=None):
    rings = _as_geom_list(rings)
    out = np.empty(len(rings), dtype=object)
    for i, r in enumerate(rings):
        out[i] = Polygon(r)
    return out


def polygonize(lines):
    """Trace closed rings from a soup of line segments (simple cases:
    every node has even degree; rings are vertex-disjoint loops)."""
    segs = []
    for g in _as_geom_list(lines):
        c = np.asarray(g.coords)
        for i in range(len(c) - 1):
            segs.append((tuple(c[i]), tuple(c[i + 1])))
    adj = {}
    for a, b in segs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    used = set()
    rings = []
    for a, b in segs:
        if (a, b) in used or (b, a) in used:
            continue
        ring = [a, b]
        used.add((a, b))
        while ring[-1] != ring[0]:
            cur, prev = ring[-1], ring[-2]
            nxt = None
            for cand in adj[cur]:
                if cand == prev:
                    continue
                if (cur, cand) in used or (cand, cur) in used:
                    continue
                nxt = cand
                break
            if nxt is None:
                break
            used.add((cur, nxt))
            ring.append(nxt)
        if ring[-1] == ring[0] and len(ring) > 3:
            rings.append(Polygon(np.asarray(ring[:-1], dtype=np.float64)))
    return GeometryCollection(rings)


def _make_shapely_module():
    mod = types.ModuleType("shapely")
    mod.GeometryType = GeometryType
    mod.Point = Point
    mod.LineString = LineString
    mod.LinearRing = LinearRing
    mod.Polygon = Polygon
    mod.GeometryCollection = GeometryCollection
    mod.points = points
    mod.linestrings = linestrings
    mod.linearrings = linearrings
    mod.polygons = polygons
    mod.polygonize = polygonize
    mod.get_coordinates = get_coordinates
    mod.get_type_id = get_type_id
    return mod


# -- geopandas ---------------------------------------------------------------
_TYPE_NAMES = {
    0: "Point",
    1: "LineString",
    2: "LinearRing",
    3: "Polygon",
}


class GeoSeries:
    def __init__(self, data):
        arr = np.empty(len(_as_geom_list(data)), dtype=object)
        for i, g in enumerate(_as_geom_list(data)):
            arr[i] = g
        self._data = arr

    def to_numpy(self):
        return self._data

    def __len__(self):
        return len(self._data)

    def __iter__(self):
        return iter(self._data)

    def __getitem__(self, item):
        out = self._data[item]
        if isinstance(out, np.ndarray):
            return GeoSeries(out)
        return out

    @property
    def exterior(self):
        return GeoSeries([g.exterior for g in self._data])

    @property
    def interiors(self):
        return [list(g.interiors) for g in self._data]


class _Loc:
    def __init__(self, frame):
        self._frame = frame

    def __getitem__(self, mask):
        mask = np.asarray(mask)
        df = self._frame._df.loc[mask].reset_index(drop=True)
        geometry = self._frame.geometry.to_numpy()[mask]
        return GeoDataFrame(df, geometry=geometry, crs=self._frame.crs)


class GeoDataFrame:
    def __init__(self, data=None, geometry=None, crs=None):
        if isinstance(data, GeoDataFrame):
            df = data._df.copy()
            if geometry is None:
                geometry = data.geometry.to_numpy()
        elif data is None:
            df = pd.DataFrame(index=range(len(_as_geom_list(geometry))))
        else:
            df = pd.DataFrame(data)
        if geometry is None and "geometry" in df.columns:
            geometry = df["geometry"].to_numpy()
            df = df.drop(columns="geometry")
        self._df = df.reset_index(drop=True)
        self.geometry = GeoSeries(geometry if geometry is not None else [])
        self.crs = crs

    def __len__(self):
        return len(self.geometry)

    def __getitem__(self, column):
        return self._df[column]

    def __setitem__(self, column, value):
        self._df[column] = value

    def __contains__(self, column):
        return column in self._df.columns

    @property
    def columns(self):
        return list(self._df.columns) + ["geometry"]

    @property
    def loc(self):
        return _Loc(self)

    @property
    def geom_type(self):
        return pd.Series(
            [_TYPE_NAMES.get(g.type_id, "?") for g in self.geometry]
        )

    def drop(self, columns):
        cols = [columns] if isinstance(columns, str) else list(columns)
        df = self._df.drop(columns=[c for c in cols if c in self._df.columns])
        if "geometry" in cols:
            return df
        return GeoDataFrame(df, geometry=self.geometry.to_numpy(), crs=self.crs)

    @property
    def iloc(self):
        return self._df.iloc


def _make_geopandas_module():
    mod = types.ModuleType("geopandas")
    mod.GeoDataFrame = GeoDataFrame
    mod.GeoSeries = GeoSeries
    return mod


def install(monkeypatch):
    """Register fake shapely/geopandas in sys.modules and rebind the
    module-level fallbacks that were captured at import time."""
    import sys

    import xugrid_tpu.conversion as conv
    import xugrid_tpu.ugrid.burn as burn

    shp = _make_shapely_module()
    gpd = _make_geopandas_module()
    monkeypatch.setitem(sys.modules, "shapely", shp)
    monkeypatch.setitem(sys.modules, "geopandas", gpd)
    monkeypatch.setattr(conv, "shapely", shp)
    monkeypatch.setattr(burn, "shapely", shp)
    return shp, gpd
