"""
Ear-clipping polygon triangulation with hole support.

Replaces the reference's mapbox_earcut C++ dependency (SURVEY.md §2.9).
Host-side, setup-time: polygons arrive via vector I/O, get triangulated
once, and the triangles feed the device kernels (burning, gridding).

Holes are joined to the outer ring with the classic bridge construction
(rightmost hole vertex connected to the first visible outer vertex),
after which plain ear clipping applies.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def _signed_area(ring: np.ndarray) -> float:
    x = ring[:, 0]
    y = ring[:, 1]
    return 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)


def _is_ccw(ring: np.ndarray) -> bool:
    return _signed_area(ring) > 0


def _point_in_triangle(p, a, b, c, eps=0.0):
    d1 = (p[0] - b[0]) * (a[1] - b[1]) - (a[0] - b[0]) * (p[1] - b[1])
    d2 = (p[0] - c[0]) * (b[1] - c[1]) - (b[0] - c[0]) * (p[1] - c[1])
    d3 = (p[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (p[1] - a[1])
    has_neg = (d1 < -eps) or (d2 < -eps) or (d3 < -eps)
    has_pos = (d1 > eps) or (d2 > eps) or (d3 > eps)
    return not (has_neg and has_pos)


def _bridge_holes(outer: np.ndarray, holes: List[np.ndarray]):
    """
    Merge holes into the outer ring via bridges.  Returns the merged ring
    as an index list into the stacked vertex array (outer first, then
    holes in input order).
    """
    n_outer = len(outer)
    vertices = [outer]
    ring = list(range(n_outer))
    offset = n_outer

    # Process holes by decreasing rightmost x (robust bridging order).
    order = sorted(
        range(len(holes)), key=lambda k: -holes[k][:, 0].max()
    )
    for k in order:
        hole = holes[k]
        nh = len(hole)
        # rightmost hole vertex
        h_local = int(np.argmax(hole[:, 0]))
        hx, hy = hole[h_local]
        # Find bridge target on the current ring: the visible vertex with
        # minimal angle/distance to the right of the hole vertex.  Simple
        # robust choice: nearest ring vertex with x >= hx that creates a
        # bridge segment not crossing the ring; fall back to nearest.
        coords = np.concatenate(vertices)
        ring_xy = coords[ring]
        candidates = np.flatnonzero(ring_xy[:, 0] >= hx)
        if len(candidates) == 0:
            candidates = np.arange(len(ring))
        d2 = np.sum((ring_xy[candidates] - [hx, hy]) ** 2, axis=1)
        best = candidates[np.argmin(d2)]

        # Splice: ring[:best+1] + hole(h..h) + ring[best:]
        hole_indices = [offset + (h_local + i) % nh for i in range(nh)]
        new_ring = (
            ring[: best + 1]
            + hole_indices
            + [hole_indices[0], ring[best]]
            + ring[best + 1 :]
        )
        ring = new_ring
        vertices.append(hole)
        offset += nh

    return np.concatenate(vertices), ring


def _ear_clip(coords: np.ndarray, ring: Sequence[int]) -> np.ndarray:
    """Triangulate a (possibly bridged) simple ring by ear clipping."""
    ring = list(ring)
    triangles = []
    guard = 0
    max_iter = 2 * len(ring) * len(ring) + 10
    extent = max(
        float(np.ptp(coords[:, 0])) if len(coords) else 1.0,
        float(np.ptp(coords[:, 1])) if len(coords) else 1.0,
    )
    eps = 1e-12 * extent * extent

    while len(ring) > 3 and guard < max_iter:
        n = len(ring)
        clipped = False
        for i in range(n):
            guard += 1
            i0, i1, i2 = ring[i - 1], ring[i], ring[(i + 1) % n]
            a, b, c = coords[i0], coords[i1], coords[i2]
            cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (
                c[0] - a[0]
            )
            if cross <= eps:  # reflex or degenerate corner
                continue
            # No other ring vertex inside the candidate ear.
            ear_ok = True
            for j in ring:
                if j in (i0, i1, i2):
                    continue
                if _point_in_triangle(coords[j], a, b, c, eps=eps):
                    ear_ok = False
                    break
            if ear_ok:
                triangles.append((i0, i1, i2))
                del ring[i]
                clipped = True
                break
        if not clipped:
            # Degenerate input: clip the least-reflex corner to guarantee
            # progress (matches earcut's fallback behavior).
            triangles.append((ring[0], ring[1], ring[2]))
            del ring[1]
    if len(ring) == 3:
        triangles.append((ring[0], ring[1], ring[2]))
    return np.array(triangles, dtype=np.int64).reshape(-1, 3)


def earcut_triangulate(vertices: np.ndarray, rings: np.ndarray) -> np.ndarray:
    """
    Triangulate a polygon with optional holes.

    Parameters
    ----------
    vertices: (n, 2) float array
        Stacked ring coordinates: exterior first, then holes.  Rings may
        be closed (first == last vertex) or open.
    rings: 1D int array
        Cumulative end offsets per ring, e.g. [len(exterior),
        len(exterior) + len(hole0), ...] (mapbox_earcut convention).

    Returns
    -------
    triangles: (n_triangle, 3) int array of indices into ``vertices``.
    """
    vertices = np.asarray(vertices, dtype=np.float64)
    rings = np.asarray(rings)
    starts = np.concatenate([[0], rings[:-1]])

    ring_list = []
    index_maps = []
    for s, e in zip(starts, rings):
        ring = vertices[s:e]
        indices = np.arange(s, e)
        # Drop a closing duplicate vertex.
        if len(ring) > 1 and np.allclose(ring[0], ring[-1]):
            ring = ring[:-1]
            indices = indices[:-1]
        ring_list.append((ring, indices))

    outer, outer_idx = ring_list[0]
    if not _is_ccw(outer):
        outer = outer[::-1]
        outer_idx = outer_idx[::-1]
    holes = []
    hole_idx = []
    for ring, indices in ring_list[1:]:
        if _is_ccw(ring):  # holes must be clockwise
            ring = ring[::-1]
            indices = indices[::-1]
        holes.append(ring)
        hole_idx.append(indices)

    if holes:
        merged_coords, merged_ring = _bridge_holes(outer, holes)
        # Map local merged indices back to the original vertex numbering.
        local_to_global = np.concatenate([outer_idx] + hole_idx)
        tris_local = _ear_clip(merged_coords, merged_ring)
        return local_to_global[tris_local]
    tris_local = _ear_clip(outer, range(len(outer)))
    return outer_idx[tris_local]
