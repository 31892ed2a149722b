"""
Unstructured grid adapter for regridding.

Parity: xugrid/regrid/unstructured.py:60-221.  Weight builds run on the
BVH celltree (device kernels); the barycentric exterior-weight
redistribution is vectorized numpy instead of the reference's serial
numba loop (unstructured.py:17-57).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from xugrid_tpu import xdata
from xugrid_tpu.constants import FloatDType
from xugrid_tpu.ugrid import voronoi
from xugrid_tpu.ugrid.ugrid2d import Ugrid2d


def replace_interpolated_weights(
    vertices,
    faces,
    face_index,
    weights,
    node_to_node_map,
    node_index_threshold,
):
    """
    Redistribute the barycentric weight of interpolated exterior vertices
    to the two projection nodes they were interpolated from, by inverse
    distance.  Mutates ``weights`` in place.  Vectorized equivalent of
    the reference's per-row numba loop.
    """
    n, m = weights.shape
    face_nodes = faces[face_index]  # (n, m) voronoi node ids per point
    is_interp = (face_nodes >= node_index_threshold) & (weights > 0)
    if not is_interp.any():
        return

    rows, cols = np.nonzero(is_interp)
    p = face_nodes[rows, cols]
    qr = node_to_node_map[p - node_index_threshold]
    q, r = qr[:, 0], qr[:, 1]
    pxy = vertices[p]
    d_q = np.linalg.norm(vertices[q] - pxy, axis=1)
    d_r = np.linalg.norm(vertices[r] - pxy, axis=1)
    total = d_q + d_r
    w = weights[rows, cols]
    weight_q = (d_r / total) * w
    weight_r = (d_q / total) * w
    weights[rows, cols] = 0.0

    # Scatter-add onto the slots holding q and r within each row.
    row_nodes = face_nodes[rows]  # (k, m)
    match_q = row_nodes == q[:, None]
    match_r = row_nodes == r[:, None]
    np.add.at(weights, (np.repeat(rows, m), np.tile(np.arange(m), len(rows))),
              (match_q * weight_q[:, None] + match_r * weight_r[:, None]).ravel())


class UnstructuredGrid2d:
    """Weight-building adapter around a Ugrid2d topology."""

    def __init__(self, obj):
        from xugrid_tpu.core.wrap import UgridDataArray, UgridDataset

        if isinstance(obj, (UgridDataArray, UgridDataset)):
            self.ugrid_topology = obj.grid
        elif isinstance(obj, Ugrid2d):
            self.ugrid_topology = obj
        else:
            options = {"Ugrid2d", "UgridDataArray", "UgridDataset"}
            raise TypeError(
                f"Expected one of {options}, received: {type(obj).__name__}"
            )

    @property
    def ndim(self):
        return 1

    @property
    def dims(self):
        return (self.ugrid_topology.face_dimension,)

    @property
    def shape(self):
        return (self.ugrid_topology.n_face,)

    @property
    def size(self):
        return self.ugrid_topology.n_face

    @property
    def area(self):
        return self.ugrid_topology.area

    def convert_to(self, matched_type):
        if isinstance(self, matched_type):
            return self
        raise TypeError(
            f"Cannot convert UnstructuredGrid2d to {matched_type.__name__}"
        )

    def overlap(self, other, relative: bool):
        """
        Area-of-overlap join (self = source; tree on the source grid).

        Returns (source_index, target_index, weights).
        """
        (
            target_index,
            source_index,
            weights,
        ) = self.ugrid_topology.celltree.intersect_faces(
            vertices=other.ugrid_topology.node_coordinates,
            faces=other.ugrid_topology.face_node_connectivity,
            fill_value=other.ugrid_topology.fill_value,
        )
        if relative:
            weights = weights / self.area[source_index]
        return source_index, target_index, weights

    def locate_centroids(self, other, tolerance: Optional[float] = None):
        """Locate target centroids in the source grid."""
        tree = self.ugrid_topology.celltree
        source_index = tree.locate_points(
            other.ugrid_topology.centroids, tolerance
        )
        inside = source_index != -1
        source_index = source_index[inside]
        target_index = np.arange(other.size, dtype=source_index.dtype)[inside]
        weight_values = np.ones_like(source_index, dtype=FloatDType)
        return source_index, target_index, weight_values

    def barycentric(self, other, tolerance: Optional[float] = None):
        """
        Barycentric (smooth) interpolation weights at target centroids via
        the source's centroidal voronoi tessellation.
        """
        points = other.ugrid_topology.centroids
        grid = self.ugrid_topology

        (
            vertices,
            faces,
            node_to_face_index,
            node_to_node_map,
        ) = voronoi.voronoi_topology(
            grid.node_face_connectivity,
            grid.node_coordinates,
            grid.centroids,
            edge_face_connectivity=grid.edge_face_connectivity,
            edge_node_connectivity=grid.edge_node_connectivity,
            add_exterior=True,
            add_vertices=True,
            skip_concave=True,
        )
        voronoi_grid = Ugrid2d(vertices[:, 0], vertices[:, 1], -1, faces)
        face_index, weights = voronoi_grid.compute_barycentric_weights(
            points, tolerance
        )
        weights = np.array(weights)  # mutable copy (kernel output is read-only)

        n_interpolated = (
            len(node_to_node_map) if node_to_node_map is not None else 0
        )
        if n_interpolated:
            replace_interpolated_weights(
                vertices=vertices,
                faces=faces,
                face_index=face_index,
                weights=weights,
                node_to_node_map=node_to_node_map,
                node_index_threshold=len(vertices) - n_interpolated,
            )

        # Discard zero weights and points outside the original grid.
        outside = grid.locate_points(points) == -1
        weights[outside] = 0
        keep = weights.ravel() > 0
        source_index = node_to_face_index[
            np.where(
                voronoi_grid.face_node_connectivity[face_index] == -1,
                0,
                voronoi_grid.face_node_connectivity[face_index],
            )
        ].ravel()[keep]

        n_points, n_max_node = weights.shape
        target_index = np.repeat(np.arange(n_points), n_max_node)[keep]
        weights = weights.ravel()[keep]
        order = np.argsort(target_index, kind="stable")
        return source_index[order], target_index[order], weights[order]

    def intersection_length(self, other, relative: bool):
        """
        Length-of-intersection join with a 1D network (self's celltree is
        built on the 2D faces; queries are the network edges).

        Returns (network_edge_index, face_index, length).
        """
        (
            edge_index,
            face_index,
            intersections,
        ) = self.ugrid_topology.celltree.intersect_edges(
            other.ugrid_topology.edge_node_coordinates
        )
        length = np.linalg.norm(
            np.diff(intersections, axis=1)[:, 0, :], axis=-1
        )
        if relative:
            length = length / other.length[edge_index]
        order = np.argsort(edge_index, kind="stable")
        return edge_index[order], face_index[order], length[order]

    def to_dataset(self, name: str):
        ds = self.ugrid_topology.rename(name).to_dataset()
        ds[name + "_type"] = ((), np.int64(-1), {"type": "UnstructuredGrid2d"})
        return ds


class Network1d:
    """Weight-building adapter around a Ugrid1d network."""

    def __init__(self, obj):
        from xugrid_tpu.core.wrap import UgridDataArray, UgridDataset
        from xugrid_tpu.ugrid.ugrid1d import Ugrid1d

        if isinstance(obj, (UgridDataArray, UgridDataset)):
            self.ugrid_topology = obj.grid
        elif isinstance(obj, Ugrid1d):
            self.ugrid_topology = obj
        else:
            options = {"Ugrid1d", "UgridDataArray", "UgridDataset"}
            raise TypeError(
                f"Expected one of {options}, received: {type(obj).__name__}"
            )

    @property
    def ndim(self):
        return 1

    @property
    def dims(self):
        return (self.ugrid_topology.edge_dimension,)

    @property
    def shape(self):
        return (self.ugrid_topology.n_edge,)

    @property
    def size(self):
        return self.ugrid_topology.n_edge

    @property
    def length(self):
        return self.ugrid_topology.edge_length

    def to_dataset(self, name: str):
        ds = self.ugrid_topology.rename(name).to_dataset()
        ds[name + "_type"] = ((), np.int64(-1), {"type": "Network1d"})
        return ds
