"""
CellTree2d / EdgeCellTree2d: the spatial index facade.

API-compatible with the numba_celltree classes the reference delegates to
(SURVEY.md §2.9: locate_points, intersect_edges, intersect_faces,
compute_barycentric_weights), but implemented as a host-built flat BVH
(spatial/bvh.py) with batched jitted JAX query kernels
(spatial/queries.py).  All query methods accept/return numpy arrays —
dynamic result sizes live at this host boundary; everything inside is
static-shape device compute.

Convention: joins return ``(query_index, tree_index, payload)``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from xugrid_tpu.spatial import queries as q
from xugrid_tpu.spatial.bvh import (
    BVH,
    build_bvh,
    edge_bounding_boxes,
    face_bounding_boxes,
)
from xugrid_tpu.spatial.geometry import pad_polygons


def _batch_size(n: int) -> int:
    # pad to >= 8: tiny vmapped while-loop batches compile pathologically
    return max(8, q.next_pow2(n))


def _pad_queries(arr: np.ndarray, axis0_to: int, fill=0.0) -> np.ndarray:
    n = arr.shape[0]
    if n == axis0_to:
        return arr
    pad_shape = (axis0_to - n,) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)])


class CellTree2d:
    """Spatial index over the faces of a 2D unstructured grid."""

    def __init__(
        self,
        vertices: np.ndarray,
        faces: np.ndarray,
        fill_value: int = -1,
        leaf_size: int = 8,
    ):
        vertices = np.asarray(vertices, dtype=np.float64)
        faces = np.asarray(faces)
        if fill_value != -1:
            faces = np.where(faces == fill_value, -1, faces)
        self.vertices = vertices
        self.faces = faces
        self.n_face = len(faces)
        self.bb_coords = face_bounding_boxes(faces, vertices[:, 0], vertices[:, 1])
        self.bvh: BVH = build_bvh(self.bb_coords, leaf_size=leaf_size)
        self._tree = q.bvh_to_device(self.bvh)
        self._prim_bbox = jnp.asarray(self.bb_coords)
        self._poly_xy = pad_polygons(faces, vertices[:, 0], vertices[:, 1])

    # -- infrastructure -----------------------------------------------------
    @property
    def bb_distances(self) -> np.ndarray:
        """dx, dy, diagonal of every primitive bounding box."""
        dx = self.bb_coords[:, 2] - self.bb_coords[:, 0]
        dy = self.bb_coords[:, 3] - self.bb_coords[:, 1]
        return np.column_stack([dx, dy, np.hypot(dx, dy)])

    @property
    def bounds(self):
        box = self.bvh.node_bbox[0]
        return tuple(box)

    def default_tolerance(self) -> float:
        return float(np.nanmax(self.bb_distances[:, 2])) * 1e-12

    def _tol(self, tolerance: Optional[float]) -> float:
        return self.default_tolerance() if tolerance is None else float(tolerance)

    # -- queries ------------------------------------------------------------
    FRONTIER = 8

    @property
    def _depth(self) -> int:
        return self.bvh.n_leaves.bit_length() - 1

    def locate_points(
        self, points: np.ndarray, tolerance: Optional[float] = None
    ) -> np.ndarray:
        """Index of the face containing each point (-1 if none)."""
        points = np.atleast_2d(np.asarray(points, dtype=np.float64))
        n = len(points)
        tol = self._tol(tolerance)
        out = np.empty(n, dtype=np.int32)
        overflow = np.empty(n, dtype=bool)
        for start in range(0, n, self.CHUNK):
            stop = min(start + self.CHUNK, n)
            n_chunk = stop - start
            padded = _pad_queries(points[start:stop], _batch_size(n_chunk), fill=np.nan)
            out_c, ov_c = q.locate_points_kernel(
                jnp.asarray(padded),
                self._tree,
                self._poly_xy,
                self.bvh.n_internal,
                self.bvh.leaf_size,
                self._depth,
                self.FRONTIER,
                tol,
            )
            out[start:stop] = np.asarray(out_c)[:n_chunk]
            overflow[start:stop] = np.asarray(ov_c)[:n_chunk]
        if overflow.any():
            # More containing nodes than the frontier held at some level:
            # escalate those queries with a 4x frontier, then fall back to
            # the exact while-loop kernel for any still overflowing.
            redo = np.flatnonzero(overflow)
            redo_pts = _pad_queries(points[redo], _batch_size(len(redo)), fill=np.nan)
            redone, still = q.locate_points_kernel(
                jnp.asarray(redo_pts),
                self._tree,
                self._poly_xy,
                self.bvh.n_internal,
                self.bvh.leaf_size,
                self._depth,
                4 * self.FRONTIER,
                tol,
            )
            out[redo] = np.array(redone)[: len(redo)]
            still = np.asarray(still)[: len(redo)]
            if still.any():
                redo2 = redo[still]
                redo2_pts = _pad_queries(
                    points[redo2], _batch_size(len(redo2)), fill=np.nan
                )
                exact = q.locate_points_while_kernel(
                    jnp.asarray(redo2_pts),
                    self._tree,
                    self._poly_xy,
                    self.bvh.n_internal,
                    self.bvh.leaf_size,
                    tol,
                )
                out[redo2] = np.asarray(exact)[: len(redo2)]
        return out

    #: queries per kernel launch: bounds device memory and per-launch
    #: runtime (long launches can trip remote-TPU watchdogs).
    CHUNK = 1 << 16

    def _frontier_candidates(self, query_boxes: np.ndarray, frontier: int):
        """One frontier-descent candidate pass over (chunked) queries."""
        n = len(query_boxes)
        out_rows = []
        overflow_rows = []
        for start in range(0, n, self.CHUNK):
            chunk = query_boxes[start : start + self.CHUNK]
            n_chunk = len(chunk)
            padded = _pad_queries(chunk, _batch_size(n_chunk), fill=np.nan)
            padded[n_chunk:] = [np.inf, np.inf, -np.inf, -np.inf]
            cands, overflow = q.box_candidates_kernel(
                jnp.asarray(padded),
                self._tree,
                self._prim_bbox,
                self.bvh.n_internal,
                self.bvh.leaf_size,
                self._depth,
                frontier,
            )
            out_rows.append(np.asarray(cands)[:n_chunk])
            overflow_rows.append(np.asarray(overflow)[:n_chunk])
        return np.concatenate(out_rows), np.concatenate(overflow_rows)

    def _twopass_candidates(self, query_boxes: np.ndarray):
        """Exact two-pass (count then emit) join; final fallback for
        queries overlapping very many nodes (e.g. long segments)."""
        n = len(query_boxes)
        n_pad = _batch_size(n)
        padded = _pad_queries(query_boxes, n_pad, fill=np.nan)
        padded[n:] = [np.inf, np.inf, -np.inf, -np.inf]
        boxes = jnp.asarray(padded)
        counts = np.asarray(
            q.count_box_overlaps_kernel(
                boxes, self._tree, self._prim_bbox, self.bvh.n_internal, self.bvh.leaf_size
            )
        )
        max_count = int(counts.max()) if n else 0
        if max_count == 0:
            return np.full((n, 1), -1, dtype=np.int32)
        capacity = max(8, q.next_pow2(max_count))
        out, _ = q.emit_box_overlaps_kernel(
            boxes,
            self._tree,
            self._prim_bbox,
            self.bvh.n_internal,
            self.bvh.leaf_size,
            capacity,
        )
        return np.asarray(out)[:n]

    def _candidates(self, query_boxes: np.ndarray):
        """
        Candidate join: (query_index, tree_index) pairs of potentially
        overlapping boxes.  Frontier descent first (dense, fast),
        escalating frontier width for overflowing queries, with the
        two-pass while-loop join as the exact fallback.
        """
        n = len(query_boxes)
        if n == 0:
            empty = np.empty(0, dtype=np.int64)
            return empty, empty
        out, overflow = self._frontier_candidates(query_boxes, self.FRONTIER * 2)
        rows = [out]
        row_queries = [np.arange(n)[~overflow] if overflow.any() else np.arange(n)]
        if overflow.any():
            rows[0] = out[~overflow]
            redo = np.flatnonzero(overflow)
            out2, overflow2 = self._frontier_candidates(
                query_boxes[redo], self.FRONTIER * 8
            )
            if overflow2.any():
                rows.append(out2[~overflow2])
                row_queries.append(redo[~overflow2])
                redo2 = redo[overflow2]
                out3 = self._twopass_candidates(query_boxes[redo2])
                rows.append(out3)
                row_queries.append(redo2)
            else:
                rows.append(out2)
                row_queries.append(redo)

        query_index_parts = []
        tree_index_parts = []
        for block, queries in zip(rows, row_queries):
            valid = block >= 0
            query_index_parts.append(
                np.broadcast_to(queries[:, None], block.shape)[valid]
            )
            tree_index_parts.append(block[valid])
        query_index = np.concatenate(query_index_parts).astype(np.int64)
        tree_index = np.concatenate(tree_index_parts).astype(np.int64)
        order = np.lexsort((tree_index, query_index))
        return query_index[order], tree_index[order]

    def intersect_edges(self, edges: np.ndarray):
        """
        Intersect line segments with the grid faces.

        Parameters
        ----------
        edges: (n_edge, 2, 2) float array of segment endpoints.

        Returns
        -------
        edge_index: (n,) query segment indices
        face_index: (n,) tree face indices
        intersections: (n, 2, 2) clipped segment coordinates per face
        """
        edges = np.asarray(edges, dtype=np.float64)
        boxes = np.concatenate(
            [edges.min(axis=1), edges.max(axis=1)], axis=1
        )
        edge_index, face_index = self._candidates(boxes)
        if len(edge_index) == 0:
            return (
                edge_index,
                face_index,
                np.empty((0, 2, 2), dtype=np.float64),
            )
        n = len(edge_index)
        valid = np.empty(n, dtype=bool)
        t0 = np.empty(n, dtype=np.float64)
        t1 = np.empty(n, dtype=np.float64)
        for start in range(0, n, self.CHUNK):
            stop = min(start + self.CHUNK, n)
            n_chunk = stop - start
            n_pad = _batch_size(n_chunk)
            p0 = _pad_queries(edges[edge_index[start:stop], 0], n_pad)
            p1 = _pad_queries(edges[edge_index[start:stop], 1], n_pad)
            cands = _pad_queries(
                face_index[start:stop].astype(np.int32)[:, None], n_pad, fill=-1
            )
            v_c, t0_c, t1_c = q.clip_segments_by_faces_kernel(
                jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(cands), self._poly_xy
            )
            valid[start:stop] = np.asarray(v_c)[:n_chunk, 0]
            t0[start:stop] = np.asarray(t0_c)[:n_chunk, 0]
            t1[start:stop] = np.asarray(t1_c)[:n_chunk, 0]
        keep = valid
        edge_index = edge_index[keep]
        face_index = face_index[keep]
        a = edges[edge_index, 0]
        d = edges[edge_index, 1] - a
        start = a + t0[keep][:, None] * d
        end = a + t1[keep][:, None] * d
        intersections = np.stack([start, end], axis=1)
        return edge_index, face_index, intersections

    def intersect_faces(
        self,
        vertices: np.ndarray,
        faces: np.ndarray,
        fill_value: int = -1,
    ):
        """
        Area-of-overlap join between the query polygons and tree faces.

        Returns
        -------
        query_face_index: (n,) indices into ``faces``
        tree_face_index: (n,) indices into this tree's faces
        area: (n,) overlap areas
        """
        vertices = np.asarray(vertices, dtype=np.float64)
        faces = np.asarray(faces)
        if fill_value != -1:
            faces = np.where(faces == fill_value, -1, faces)
        boxes = face_bounding_boxes(faces, vertices[:, 0], vertices[:, 1])
        query_index, tree_index = self._candidates(boxes)
        if len(query_index) == 0:
            return query_index, tree_index, np.empty(0, dtype=np.float64)
        query_xy = pad_polygons(faces, vertices[:, 0], vertices[:, 1])
        n = len(query_index)
        areas = np.empty(n, dtype=np.float64)
        for start in range(0, n, self.CHUNK):
            stop = min(start + self.CHUNK, n)
            n_chunk = stop - start
            n_pad = _batch_size(n_chunk)
            qi = _pad_queries(query_index[start:stop].astype(np.int32), n_pad, fill=-1)
            ti = _pad_queries(tree_index[start:stop].astype(np.int32), n_pad, fill=-1)
            areas[start:stop] = np.asarray(
                q.polygon_overlap_areas_kernel(
                    jnp.asarray(qi), jnp.asarray(ti), query_xy, self._poly_xy
                )
            )[:n_chunk]
        keep = areas > 0.0
        return query_index[keep], tree_index[keep], areas[keep]

    def locate_faces(self, vertices: np.ndarray, faces: np.ndarray, fill_value: int = -1):
        """
        Find (query polygon, tree face) pairs with positive overlap.

        Returns (query_face_index, tree_face_index).
        """
        qi, ti, _ = self.intersect_faces(vertices, faces, fill_value)
        return qi, ti

    def compute_barycentric_weights(
        self, points: np.ndarray, tolerance: Optional[float] = None
    ):
        """
        Locate points and compute generalized barycentric (mean value)
        weights for the vertices of the containing face.

        Returns
        -------
        face_index: (n_points,)
        weights: (n_points, n_max_node)
        """
        points = np.atleast_2d(np.asarray(points, dtype=np.float64))
        face_index = self.locate_points(points, tolerance)
        n = len(points)
        n_pad = _batch_size(n)
        pts = _pad_queries(points, n_pad, fill=0.0)
        fi = _pad_queries(face_index.astype(np.int32), n_pad, fill=-1)
        weights = np.asarray(
            q.barycentric_weights_kernel(
                jnp.asarray(pts),
                jnp.asarray(fi),
                self._poly_xy,
                self._tol(tolerance),
            )
        )[:n]
        return face_index, weights


class EdgeCellTree2d:
    """Spatial index over the edges of a 1D network."""

    def __init__(
        self,
        vertices: np.ndarray,
        edge_node_connectivity: np.ndarray,
        leaf_size: int = 8,
    ):
        vertices = np.asarray(vertices, dtype=np.float64)
        conn = np.asarray(edge_node_connectivity)
        self.vertices = vertices
        self.edges = conn
        self.n_edge = len(conn)
        self.bb_coords = edge_bounding_boxes(conn, vertices[:, 0], vertices[:, 1])
        self.bvh: BVH = build_bvh(self.bb_coords, leaf_size=leaf_size)
        self._tree = q.bvh_to_device(self.bvh)
        self._prim_bbox = jnp.asarray(self.bb_coords)
        self._edge_xy = jnp.asarray(vertices[conn])  # (n_edge, 2, 2)

    @property
    def bb_distances(self) -> np.ndarray:
        dx = self.bb_coords[:, 2] - self.bb_coords[:, 0]
        dy = self.bb_coords[:, 3] - self.bb_coords[:, 1]
        return np.column_stack([dx, dy, np.hypot(dx, dy)])

    def default_tolerance(self) -> float:
        return float(np.nanmax(self.bb_distances[:, 2])) * 1e-12

    def _tol(self, tolerance: Optional[float]) -> float:
        return self.default_tolerance() if tolerance is None else float(tolerance)

    FRONTIER = 8

    @property
    def _depth(self) -> int:
        return self.bvh.n_leaves.bit_length() - 1

    def locate_points(
        self, points: np.ndarray, tolerance: Optional[float] = None
    ) -> np.ndarray:
        """Index of an edge each point lies on (-1 if none)."""
        points = np.atleast_2d(np.asarray(points, dtype=np.float64))
        n = len(points)
        padded = _pad_queries(points, _batch_size(n), fill=np.nan)
        out, _overflow = q.locate_points_on_edges_kernel(
            jnp.asarray(padded),
            self._tree,
            self._edge_xy,
            self.bvh.n_internal,
            self.bvh.leaf_size,
            self._depth,
            self.FRONTIER,
            self._tol(tolerance),
        )
        return np.asarray(out)[:n]

    def intersect_edges(self, edges: np.ndarray):
        """
        Intersect query segments with network edges.

        Returns
        -------
        edge_index: (n,) query segment indices
        tree_edge_index: (n,) network edge indices
        intersections: (n, 2) intersection points
        """
        edges = np.asarray(edges, dtype=np.float64)
        boxes = np.concatenate([edges.min(axis=1), edges.max(axis=1)], axis=1)
        query_index, tree_index = self._candidates(boxes)
        if len(query_index) == 0:
            return query_index, tree_index, np.empty((0, 2), dtype=np.float64)
        p0 = edges[query_index, 0]
        p1 = edges[query_index, 1]
        tree_xy = np.asarray(self._edge_xy)
        q0 = tree_xy[tree_index, 0]
        q1 = tree_xy[tree_index, 1]
        hits, pts = _segment_intersections(p0, p1, q0, q1)
        keep = hits
        return query_index[keep], tree_index[keep], pts[keep]

    # share candidate machinery with CellTree2d
    CHUNK = CellTree2d.CHUNK
    _candidates = CellTree2d._candidates
    _frontier_candidates = CellTree2d._frontier_candidates
    _twopass_candidates = CellTree2d._twopass_candidates


def _segment_intersections(p0, p1, q0, q1):
    """Vectorized numpy segment-segment intersection (host-side finish)."""
    r = p1 - p0
    s = q1 - q0
    denom = r[:, 0] * s[:, 1] - r[:, 1] * s[:, 0]
    qp = q0 - p0
    t_num = qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]
    u_num = qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]
    parallel = denom == 0.0
    safe = np.where(parallel, 1.0, denom)
    t = t_num / safe
    u = u_num / safe
    hit = ~parallel & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
    return hit, p0 + t[:, None] * r
