"""
Polygonize: vector polygons for connected same-valued face regions.

Parity: xugrid/ugrid/polygonize.py:13-127 (connected components over the
reduced face adjacency, boundary edge extraction per label, shapely
polygonize, largest-bbox polygon selection).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy import sparse

from xugrid_tpu.constants import FILL_VALUE, IntArray


def _bbox_area(bounds):
    return (bounds[2] - bounds[0]) * (bounds[3] - bounds[1])


def _classify(i: IntArray, j: IntArray, face_values) -> Tuple[int, IntArray]:
    """Label connected regions of faces sharing a value across edges."""
    vi = face_values[i]
    vj = face_values[j]
    n = face_values.size
    is_connection = (i != FILL_VALUE) & (j != FILL_VALUE) & (vi == vj)
    i = i[is_connection]
    j = j[is_connection]
    ij = np.concatenate([i, j])
    ji = np.concatenate([j, i])
    coo = sparse.coo_matrix((ji, (ij, ji)), shape=(n, n))
    return sparse.csgraph.connected_components(coo)


def polygonize(uda):
    """
    Create polygons for every connected region of faces sharing a value.

    The DataArray may only have the face dimension; NaN faces are
    dropped.  Meant for data with few unique values (classifications);
    use ``to_geodataframe`` for per-face polygons.

    Returns
    -------
    polygonized: geopandas.GeoDataFrame with a "values" column.
    """
    facedim = uda.grid.face_dimension
    if tuple(uda.obj.dims) != (facedim,):
        raise ValueError(
            "Cannot polygonize non-face dimensions. Expected only "
            f"({facedim},), but received {tuple(uda.obj.dims)}."
        )

    import geopandas as gpd
    import shapely

    values = np.asarray(uda.obj.data)
    notnull = ~np.isnan(values)
    if notnull.all():
        grid = uda.grid
        face_values = values
    else:
        sub = uda.isel({facedim: np.flatnonzero(notnull)})
        grid = sub.grid
        face_values = np.asarray(sub.obj.data)

    i, j = grid.edge_face_connectivity.T
    n_polygon, polygon_id = _classify(i, j, face_values)

    coordinates = grid.node_coordinates
    data_i = face_values[i]
    vi = polygon_id[i]
    vj = polygon_id[np.where(j == FILL_VALUE, 0, j)]
    vi = np.where(i == FILL_VALUE, FILL_VALUE, vi)
    vj = np.where(j == FILL_VALUE, FILL_VALUE, vj)
    boundary = vi != vj

    polygons = []
    out_values = []
    for label in range(n_polygon):
        keep = ((vi == label) | (vj == label)) & boundary
        edges = grid.edge_node_connectivity[keep]
        collection = shapely.polygonize(
            shapely.linestrings(
                coordinates[edges].reshape(-1, 2),
                indices=np.repeat(np.arange(len(edges)), 2),
            )
        )
        # Holes appear both as holes and as standalone polygons; the
        # region itself is the largest-bbox polygon.
        polygon = max(collection.geoms, key=lambda g: _bbox_area(g.bounds))
        out_values.append(data_i[keep.argmax()])
        polygons.append(polygon)

    return gpd.GeoDataFrame({"values": out_values}, geometry=polygons)
