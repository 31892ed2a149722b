"""
Centroidal voronoi tessellation from a mesh of convex cells.

The interior is straightforward (invert face_node_connectivity, sort the
connected centroids counter-clockwise around every node); the exterior is
handled by projecting centroids onto boundary edges and optionally
substituting interpolated points for the original (possibly concavity-
introducing) boundary vertices.  Semantics follow the reference
(xugrid/ugrid/voronoi.py:33-458) including the three exterior modes
(add_exterior × add_vertices × skip_concave).

Everything is vectorized numpy: group-by via bincount/segment sums,
ordering via lexsort on polar angles.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy import sparse

from xugrid_tpu.constants import FILL_VALUE, X_EPSILON, FloatArray, IntArray
from xugrid_tpu.ugrid.connectivity import (
    area_from_coordinates,
    close_polygons,
    ragged_index,
    renumber,
)


def dot_product2d(U: FloatArray, V: FloatArray) -> FloatArray:
    return U[:, 0] * V[:, 0] + U[:, 1] * V[:, 1]


def compute_centroid(i: IntArray, x: FloatArray, y: FloatArray):
    """Mean x/y per group id i (ids need not be contiguous)."""
    uniques, inverse = np.unique(i, return_inverse=True)
    inverse = inverse.ravel()
    counts = np.bincount(inverse)
    x_mean = np.bincount(inverse, weights=x) / counts
    y_mean = np.bincount(inverse, weights=y) / counts
    return x_mean, y_mean


def _assemble_face_node_connectivity(i: IntArray, j: IntArray) -> IntArray:
    """Pack grouped (i, j) pairs into a padded dense connectivity."""
    n_vertex = np.bincount(i)
    n_vertex = n_vertex[n_vertex > 0]
    n = len(n_vertex)
    m = int(n_vertex.max())
    index = ragged_index(n, m, n_vertex)
    out = np.full((n, m), FILL_VALUE, dtype=np.int64)
    out[index] = j
    return out


def exterior_centroids(node_face_connectivity: sparse.csr_matrix):
    """Nodes participating in exactly one face: that face's centroid is
    reused for the exterior."""
    n, _ = node_face_connectivity.shape
    is_exterior_only = node_face_connectivity.getnnz(axis=1) == 1
    j = node_face_connectivity[is_exterior_only].indices
    i = np.arange(n)[is_exterior_only]
    return i, j


def interior_centroids(
    node_face_connectivity: sparse.csr_matrix,
    edge_face_connectivity: IntArray,
    edge_node_connectivity: IntArray,
):
    """Exterior nodes participating in more than one face: all their
    face centroids contribute."""
    is_exterior = edge_face_connectivity[:, 1] == FILL_VALUE
    exterior_nodes = np.unique(edge_node_connectivity[is_exterior].ravel())
    m_per_node = node_face_connectivity.getnnz(axis=1)
    selected = exterior_nodes[m_per_node[exterior_nodes] > 1]
    selection = node_face_connectivity[selected]
    j = selection.indices
    i = np.repeat(selected, repeats=selection.getnnz(axis=1))
    return i, j


def _project_centroid_on_edge(edge_vertices, centroid_vertices):
    a = edge_vertices[:, 0, :]
    b = edge_vertices[:, 1, :]
    V = b - a
    U = centroid_vertices - a
    t = dot_product2d(U, V) / dot_product2d(V, V)
    return a + t[:, np.newaxis] * V


def exterior_vertices(
    edge_face_connectivity: IntArray,
    edge_node_connectivity: IntArray,
    vertices: FloatArray,
    centroids: FloatArray,
    add_vertices: bool,
):
    """
    Project the centroid of each boundary face onto its boundary edge(s),
    producing the "intersected infinite ray" vertices of the exterior.
    Optionally add midpoint substitutes for the original boundary
    vertices (see exterior_topology).
    """
    is_exterior = edge_face_connectivity[:, 1] == FILL_VALUE
    exterior_nodes = edge_node_connectivity[is_exterior]
    edge_vertices = vertices[exterior_nodes]
    face_i = edge_face_connectivity[is_exterior, 0]
    centroid_vertices = centroids[face_i]
    projected = _project_centroid_on_edge(edge_vertices, centroid_vertices)

    # Discard projections that coincide with the centroid itself (e.g.
    # circumcenters already on the edge).
    keep = np.linalg.norm(projected - centroid_vertices, axis=1) > (
        X_EPSILON * X_EPSILON
    )
    kept_vertices = projected[keep]
    kept_face_i = face_i[keep]
    i = exterior_nodes[keep].ravel()

    n_centroid = len(centroids)
    n = n_centroid + len(kept_vertices)
    j = np.repeat(np.arange(n_centroid, n), 2)
    n_interpolated = 0
    interpolation_map = None
    out_vertices = kept_vertices
    out_face_i = kept_face_i

    if add_vertices:
        # Substitute vertex per original boundary node: the midpoint of
        # its two adjacent projections (guaranteed convex placement).
        n_proj = len(projected)
        flat_nodes = exterior_nodes.ravel()
        order = np.argsort(flat_nodes, kind="stable")
        proj_of_pair = np.repeat(np.arange(n_proj), 2)[order]
        pair = projected[proj_of_pair]
        interpolated = 0.5 * (pair[::2] + pair[1::2])
        i_new = flat_nodes[order][::2]
        j_new = np.arange(n, n + len(interpolated))
        interpolation_map = proj_of_pair.reshape((-1, 2)) + n_centroid
        n_interpolated = len(interpolated)
        i = np.concatenate([i, i_new])
        j = np.concatenate([j, j_new])
        out_vertices = np.concatenate([kept_vertices, interpolated])
        # Interpolated exterior vertices belong to two original faces:
        # mark with -1.
        out_face_i = np.concatenate([kept_face_i, np.full(n_interpolated, -1)])

    return i, j, out_vertices, out_face_i, n_interpolated, interpolation_map


def choose_convex(
    i: IntArray,
    j: IntArray,
    nodes: FloatArray,
    original_vertices: FloatArray,
    n_interpolated: int,
) -> None:
    """
    Replace interpolated substitutes by the original boundary vertices
    only where doing so keeps the face convex (the concave variant has a
    smaller area).  Mutates ``nodes`` in place.
    """
    faces = _assemble_face_node_connectivity(i, j)
    closed, _ = close_polygons(faces)
    modified_nodes = nodes.copy()
    modified_nodes[-n_interpolated:] = original_vertices

    convex_area = area_from_coordinates(nodes[closed])
    modified_area = area_from_coordinates(modified_nodes[closed])
    original_is_convex = (modified_area >= convex_area)[:, np.newaxis]
    is_interpolated = faces >= len(nodes) - n_interpolated
    use_original = faces[original_is_convex & is_interpolated]
    nodes[use_original] = modified_nodes[use_original]


def exterior_topology(
    edge_face_connectivity: IntArray,
    edge_node_connectivity: IntArray,
    node_face_connectivity: sparse.csr_matrix,
    vertices: FloatArray,
    centroids: FloatArray,
    add_vertices: bool,
    skip_concave: bool,
):
    """
    Assemble the exterior voronoi polygons: per exterior node, gather its
    face centroids plus the ray projections (and optionally the original
    or interpolated boundary vertex), then angle-sort counter-clockwise.
    """
    i0, j0 = interior_centroids(
        node_face_connectivity, edge_face_connectivity, edge_node_connectivity
    )
    i1, j1 = exterior_centroids(node_face_connectivity)
    (
        i2,
        j2,
        projected_vertices,
        face_i,
        n_interpolated,
        interpolation_map,
    ) = exterior_vertices(
        edge_face_connectivity,
        edge_node_connectivity,
        vertices,
        centroids,
        add_vertices,
    )

    i = np.concatenate([i0, i1, i2])
    j = np.concatenate([j0, j1, j2])
    _, n_face = node_face_connectivity.shape
    vor_vertices = np.concatenate([centroids, projected_vertices])
    face_i = np.concatenate([np.arange(n_face), face_i])
    orig_vertices = vertices[i][len(i) - n_interpolated :]

    # Counter-clockwise ordering by polar angle around the group mean.
    xy = vor_vertices[j]
    cx, cy = compute_centroid(i, xy[:, 0], xy[:, 1])
    group = renumber(i)
    angle = np.arctan2(xy[:, 1] - cy[group], xy[:, 0] - cx[group])
    order = np.lexsort((angle, i))
    i = i[order]
    j = j[order]

    if add_vertices and n_interpolated > 0:
        if skip_concave:
            choose_convex(i, j, vor_vertices, orig_vertices, n_interpolated)
        else:
            vor_vertices[-n_interpolated:] = orig_vertices

    return vor_vertices, i, j, face_i, interpolation_map


def voronoi_topology(
    node_face_connectivity: sparse.csr_matrix,
    vertices: FloatArray,
    centroids: FloatArray,
    edge_face_connectivity: Optional[IntArray] = None,
    edge_node_connectivity: Optional[IntArray] = None,
    add_exterior: bool = False,
    add_vertices: bool = False,
    skip_concave: bool = False,
) -> Tuple[FloatArray, IntArray, IntArray, Optional[IntArray]]:
    """
    Centroidal voronoi tessellation of a mesh of convex cells.

    Parameters
    ----------
    node_face_connectivity: csr_matrix
    vertices: (n_vertex, 2)
    centroids: (n_centroid, 2)
    edge_face_connectivity, edge_node_connectivity: required when
        add_exterior is True.
    add_exterior: include exterior edges (ray projections).
    add_vertices: include the original exterior vertices (may produce
        concave cells).
    skip_concave: with add_vertices, keep the convex substitute where the
        original vertex would create a concave cell.

    Returns
    -------
    nodes: (n_vor_vertex, 2)
    face_node_connectivity: padded dense int array
    face_index: (n_vor_vertex,) original face per voronoi node (-1 for
        exterior vertices belonging to two faces)
    interpolation_map: (n_interpolated, 2) or None
    """
    if add_exterior:
        if edge_face_connectivity is None or edge_node_connectivity is None:
            raise ValueError(
                "edge_face_connectivity, edge_node_connectivity must be "
                "provided if add_exterior is True."
            )

    # Interior polygons: all faces around a node. When the exterior is
    # handled separately, skip exterior nodes here; otherwise require at
    # least a triangle.
    ncol_per_row = node_face_connectivity.getnnz(axis=1)
    if add_exterior:
        is_exterior = edge_face_connectivity[:, 1] == FILL_VALUE
        exterior_nodes = edge_node_connectivity[is_exterior]
        valid = np.full(len(vertices), True)
        valid[exterior_nodes.ravel()] = False
        valid = np.repeat(valid, ncol_per_row)
    else:
        valid = np.repeat(ncol_per_row >= 3, ncol_per_row)

    coo = node_face_connectivity.tocoo()
    node_i = coo.row[valid]
    face_i = coo.col[valid]
    anchor = vertices[node_i]
    ring = centroids[face_i]
    angle = np.arctan2(ring[:, 1] - anchor[:, 1], ring[:, 0] - anchor[:, 0])
    order = np.lexsort((angle, node_i))
    j = face_i[order]

    if add_exterior:
        (
            vor_vertices,
            exterior_i,
            exterior_j,
            face_i,
            interpolation_map,
        ) = exterior_topology(
            edge_face_connectivity,
            edge_node_connectivity,
            node_face_connectivity,
            vertices,
            centroids,
            add_vertices,
            skip_concave,
        )
        offset = node_i.max() + 1 if len(node_i) > 0 else 0
        i = np.concatenate([node_i, exterior_i + offset])
        j = np.concatenate([j, exterior_j])
    else:
        interpolation_map = None
        vor_vertices = centroids[np.unique(face_i)]
        face_i = np.arange(int(face_i.max()) + 1)
        i = node_i
        j = renumber(j)

    face_node_connectivity = _assemble_face_node_connectivity(i, j)
    return vor_vertices, face_node_connectivity, face_i, interpolation_map
