"""
Batched BVH queries as jitted JAX kernels.

Traversal is stack-free: each query walks the complete heap-ordered tree
with skip links (see spatial/bvh.py), expressed as a ``lax.while_loop``
and vmapped over the query batch.  Dynamic result counts use the
two-pass count→emit pattern (XLA needs static shapes; SURVEY.md §7
"Hard parts").

Query batches are padded to power-of-two sizes by the celltree facade to
bound the number of distinct compilations.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from xugrid_tpu.spatial import geometry as geo
from xugrid_tpu.spatial.bvh import BVH


class DeviceBVH(NamedTuple):
    node_bbox: jax.Array  # (n_nodes, 4)
    skip: jax.Array  # (n_nodes,) i32
    prim_index: jax.Array  # (n_leaves * leaf_size,) i32


def bvh_to_device(bvh: BVH, dtype=None) -> DeviceBVH:
    box = bvh.node_bbox if dtype is None else bvh.node_bbox.astype(dtype)
    return DeviceBVH(
        node_bbox=jnp.asarray(box),
        skip=jnp.asarray(bvh.skip),
        prim_index=jnp.asarray(bvh.prim_index),
    )


def _bbox_contains_point(bbox, p, tol):
    return (
        (p[0] >= bbox[0] - tol)
        & (p[0] <= bbox[2] + tol)
        & (p[1] >= bbox[1] - tol)
        & (p[1] <= bbox[3] + tol)
    )


def _bbox_overlaps_box(bbox, qbox, tol):
    return (
        (bbox[0] <= qbox[2] + tol)
        & (bbox[2] >= qbox[0] - tol)
        & (bbox[1] <= qbox[3] + tol)
        & (bbox[3] >= qbox[1] - tol)
    )


def _traverse(tree: DeviceBVH, n_internal: int, leaf_size: int, hit_fn, leaf_fn, init):
    """
    Generic skip-link traversal for ONE query.

    hit_fn(node_bbox_row) -> bool: does the query overlap this node?
    leaf_fn(prim_ids (leaf_size,), active: bool, carry) -> (carry, done)
        Called every iteration; must mask its own work by ``active``
        (branchless: under vmap a cond would become a select anyway, and
        lax.cond inside vmapped while_loop compiles pathologically for
        small batches).
    """
    n_nodes = tree.node_bbox.shape[0]

    def cond(state):
        node, carry, done = state
        return (node < n_nodes) & ~done

    def body(state):
        node, carry, done = state
        bbox = tree.node_bbox[node]
        hit = hit_fn(bbox)
        is_leaf = node >= n_internal

        leaf_id = jnp.maximum(node - n_internal, 0)
        prim_ids = jax.lax.dynamic_slice(
            tree.prim_index, (leaf_id * leaf_size,), (leaf_size,)
        )
        active = hit & is_leaf
        prim_ids = jnp.where(active, prim_ids, -1)
        carry, leaf_done = leaf_fn(prim_ids, active, carry)

        next_node = jnp.where(hit & ~is_leaf, 2 * node + 1, tree.skip[node])
        return next_node, carry, done | (leaf_done & active)

    _, carry, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), init, False))
    return carry


# ---------------------------------------------------------------------------
# Point location: frontier descent
# ---------------------------------------------------------------------------
# The hot path. A while-loop traversal executes its (expensive) leaf body
# on every lock-stepped iteration for the whole batch; instead we descend
# the complete tree level-by-level with a bounded frontier of candidate
# nodes per query (lax.scan over the static depth — no data-dependent
# control flow at all), then run the exact point-in-polygon tests as one
# dense vectorized pass per frontier slot.  A per-query overflow flag is
# raised when more than `frontier` nodes contain the point at some level;
# the facade re-runs those queries through the (slow, exact) while-loop
# kernel.


def _descend_frontier(hit_fn, node_bbox, depth, frontier):
    """
    Generic frontier descent for ONE query: level-by-level expansion of
    the complete tree keeping up to ``frontier`` overlapping nodes.
    hit_fn(bboxes (k, 4)) -> (k,) bool.
    Returns (leaf-level node ids (frontier,), overflow flag).
    """
    f0 = jnp.full((frontier,), -1, dtype=jnp.int32).at[0].set(0)

    def level_step(carry, _):
        f, ov = carry
        valid = f >= 0
        children = jnp.stack(
            [2 * f + 1, 2 * f + 2], axis=-1
        ).reshape(2 * frontier)
        cvalid = jnp.repeat(valid, 2)
        bbox = node_bbox[jnp.maximum(children, 0)]
        hit = cvalid & hit_fn(bbox)
        n_hit = jnp.sum(hit)
        # Pack hit children left via cumsum offsets; extra slot absorbs
        # non-hits and capacity overflow (cheaper than a sort).
        pos = jnp.cumsum(hit) - 1
        target = jnp.where(hit & (pos < frontier), pos, frontier)
        new_f = (
            jnp.full((frontier + 1,), -1, dtype=jnp.int32)
            .at[target]
            .set(jnp.where(hit, children, -1), mode="drop")[:frontier]
        )
        return (new_f, ov | (n_hit > frontier)), None

    (f, overflow), _ = jax.lax.scan(level_step, (f0, False), None, length=depth)
    return f, overflow


def _descend_to_leaves(p, node_bbox, depth, frontier, tolerance):
    """Candidate leaf-level node ids for one point; -1 padded."""

    def hit_fn(bbox):
        return jax.vmap(lambda b: _bbox_contains_point(b, p, tolerance))(bbox)

    return _descend_frontier(hit_fn, node_bbox, depth, frontier)


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def box_candidates_kernel(
    query_boxes, tree: DeviceBVH, prim_bbox, n_internal, leaf_size, depth, frontier
):
    """
    Frontier-descent candidate join for box queries: for each query box,
    the primitives whose AABB overlaps it, in a dense
    (n_q, frontier * leaf_size) buffer (-1 padded), plus overflow flags.
    Replaces the two-pass while-loop join on the hot path: no
    data-dependent control flow at all.
    """

    def descend(qbox):
        def hit_fn(bbox):
            return jax.vmap(lambda b: _bbox_overlaps_box(b, qbox, 0.0))(bbox)

        leaves, overflow = _descend_frontier(
            hit_fn, tree.node_bbox, depth, frontier
        )
        leaf_ids = jnp.where(leaves >= 0, leaves - n_internal, -1)
        starts = jnp.maximum(leaf_ids, 0) * leaf_size
        window = starts[:, None] + jnp.arange(leaf_size)[None, :]
        prim_ids = tree.prim_index[window.reshape(-1)]
        prim_ids = jnp.where(
            jnp.repeat(leaf_ids >= 0, leaf_size), prim_ids, -1
        )
        boxes = prim_bbox[jnp.maximum(prim_ids, 0)]
        ok = (prim_ids >= 0) & jax.vmap(
            lambda b: _bbox_overlaps_box(b, qbox, 0.0)
        )(boxes)
        return jnp.where(ok, prim_ids, -1), overflow

    return jax.vmap(descend)(query_boxes)


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def locate_points_kernel(
    points, tree: DeviceBVH, poly_xy, n_internal, leaf_size, depth, frontier, tolerance
):
    """
    For every point, the index of the containing face (-1 if none), plus
    an overflow flag marking queries whose candidate set was truncated.

    points: (n_q, 2); poly_xy: (n_face, n_max, 2) padded polygons.
    """

    def descend(p):
        leaves, overflow = _descend_to_leaves(
            p, tree.node_bbox, depth, frontier, tolerance
        )
        return jnp.where(leaves >= 0, leaves - n_internal, -1), overflow

    leaf_ids, overflow = jax.vmap(descend)(points)  # (n_q, frontier)

    def test_slot(found, slot_leaves):
        # slot_leaves: (n_q,) leaf ids for this frontier slot
        start = jnp.maximum(slot_leaves, 0) * leaf_size
        prim_ids = jax.vmap(
            lambda s: jax.lax.dynamic_slice(tree.prim_index, (s,), (leaf_size,))
        )(start)
        prim_ids = jnp.where((slot_leaves >= 0)[:, None], prim_ids, -1)
        polys = poly_xy[jnp.maximum(prim_ids, 0)]  # (n_q, leaf_size, n_max, 2)
        inside = jax.vmap(
            jax.vmap(geo.point_in_polygon, in_axes=(None, 0, None)),
            in_axes=(0, 0, None),
        )(points, polys, tolerance)
        inside = inside & (prim_ids >= 0)
        any_in = jnp.any(inside, axis=1)
        first = jnp.argmax(inside, axis=1)
        hit_prim = jnp.take_along_axis(prim_ids, first[:, None], axis=1)[:, 0]
        return jnp.where((found < 0) & any_in, hit_prim, found), None

    found = jnp.full(points.shape[0], -1, dtype=jnp.int32)
    found, _ = jax.lax.scan(test_slot, found, leaf_ids.T)
    return found, overflow


@partial(jax.jit, static_argnums=(3, 4))
def locate_points_while_kernel(
    points, tree: DeviceBVH, poly_xy, n_internal, leaf_size, tolerance
):
    """Exact while-loop fallback for frontier-overflow queries."""

    def one(p):
        def hit_fn(bbox):
            return _bbox_contains_point(bbox, p, tolerance)

        def leaf_fn(prim_ids, active, found):
            polys = poly_xy[jnp.maximum(prim_ids, 0)]  # (leaf_size, n_max, 2)
            inside = jax.vmap(lambda poly: geo.point_in_polygon(p, poly, tolerance))(
                polys
            )
            inside = inside & (prim_ids >= 0)
            any_in = jnp.any(inside)
            first = jnp.argmax(inside)
            found = jnp.where(any_in, prim_ids[first], found)
            return found, any_in

        return _traverse(tree, n_internal, leaf_size, hit_fn, leaf_fn, jnp.int32(-1))

    return jax.vmap(one)(points)


# ---------------------------------------------------------------------------
# Point location on edges (1D networks)
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def locate_points_on_edges_kernel(
    points, tree: DeviceBVH, edge_xy, n_internal, leaf_size, depth, frontier, tolerance
):
    """
    For every point, the index of an edge within tolerance (-1 if none),
    plus a frontier-overflow flag.  edge_xy: (n_edge, 2, 2).
    """

    def descend(p):
        leaves, overflow = _descend_to_leaves(
            p, tree.node_bbox, depth, frontier, tolerance
        )
        return jnp.where(leaves >= 0, leaves - n_internal, -1), overflow

    leaf_ids, overflow = jax.vmap(descend)(points)

    def test_slot(found, slot_leaves):
        start = jnp.maximum(slot_leaves, 0) * leaf_size
        prim_ids = jax.vmap(
            lambda s: jax.lax.dynamic_slice(tree.prim_index, (s,), (leaf_size,))
        )(start)
        prim_ids = jnp.where((slot_leaves >= 0)[:, None], prim_ids, -1)
        segs = edge_xy[jnp.maximum(prim_ids, 0)]  # (n_q, leaf_size, 2, 2)
        on, _ = jax.vmap(
            jax.vmap(
                lambda p, s: geo.point_on_segment_param(p, s[0], s[1], tolerance),
                in_axes=(None, 0),
            )
        )(points, segs)
        on = on & (prim_ids >= 0)
        any_on = jnp.any(on, axis=1)
        first = jnp.argmax(on, axis=1)
        hit_prim = jnp.take_along_axis(prim_ids, first[:, None], axis=1)[:, 0]
        return jnp.where((found < 0) & any_on, hit_prim, found), None

    found = jnp.full(points.shape[0], -1, dtype=jnp.int32)
    found, _ = jax.lax.scan(test_slot, found, leaf_ids.T)
    return found, overflow


# ---------------------------------------------------------------------------
# Box-overlap counting / emission (two-pass pattern)
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnums=(3, 4))
def count_box_overlaps_kernel(query_boxes, tree: DeviceBVH, prim_bbox, n_internal, leaf_size):
    """Count primitives whose own AABB overlaps each query box."""

    def one(qbox):
        def hit_fn(bbox):
            return _bbox_overlaps_box(bbox, qbox, 0.0)

        def leaf_fn(prim_ids, active, count):
            boxes = prim_bbox[jnp.maximum(prim_ids, 0)]
            ok = (prim_ids >= 0) & jax.vmap(
                lambda b: _bbox_overlaps_box(b, qbox, 0.0)
            )(boxes)
            return count + jnp.sum(ok, dtype=jnp.int32), False

        return _traverse(tree, n_internal, leaf_size, hit_fn, leaf_fn, jnp.int32(0))

    return jax.vmap(one)(query_boxes)


@partial(jax.jit, static_argnums=(3, 4, 5))
def emit_box_overlaps_kernel(
    query_boxes, tree: DeviceBVH, prim_bbox, n_internal, leaf_size, capacity
):
    """
    For each query box: indices of primitives whose AABB overlaps it,
    written into a fixed (n_q, capacity) buffer padded with -1.
    """

    def one(qbox):
        def hit_fn(bbox):
            return _bbox_overlaps_box(bbox, qbox, 0.0)

        def leaf_fn(prim_ids, active, carry):
            out, n = carry
            boxes = prim_bbox[jnp.maximum(prim_ids, 0)]
            ok = (prim_ids >= 0) & jax.vmap(
                lambda b: _bbox_overlaps_box(b, qbox, 0.0)
            )(boxes)
            offs = n + jnp.cumsum(ok.astype(jnp.int32)) - ok.astype(jnp.int32)
            pos = jnp.where(ok & (offs < capacity), offs, capacity)
            out = out.at[pos].set(jnp.where(ok, prim_ids, -1), mode="drop")
            return (out, n + jnp.sum(ok, dtype=jnp.int32)), False

        init = (jnp.full((capacity,), -1, dtype=jnp.int32), jnp.int32(0))
        (out, n) = _traverse(tree, n_internal, leaf_size, hit_fn, leaf_fn, init)
        return out, n

    return jax.vmap(one)(query_boxes)


# ---------------------------------------------------------------------------
# Exact geometry passes over candidate sets
# ---------------------------------------------------------------------------
@jax.jit
def clip_segments_by_faces_kernel(p0, p1, candidates, poly_xy):
    """
    Clip segments against candidate convex faces.

    p0, p1: (n_q, 2); candidates: (n_q, capacity) face ids (-1 padded).
    Returns (valid (n_q, capacity), t0, t1) parameter intervals.
    """

    def one(a, b, cands):
        def per_face(face):
            poly = poly_xy[jnp.maximum(face, 0)]
            valid, t0, t1 = geo.clip_segment_by_convex_polygon(a, b, poly)
            return valid & (face >= 0), t0, t1

        return jax.vmap(per_face)(cands)

    return jax.vmap(one)(p0, p1, candidates)


@jax.jit
def polygon_overlap_areas_kernel(subject_ids, clip_ids, subject_xy, clip_xy):
    """
    Area of overlap for candidate (subject, clip) polygon pairs.

    subject_ids, clip_ids: (n_pairs,) indices; subject_xy/clip_xy padded
    polygon buffers.  Returns (n_pairs,) areas.
    """

    def one(si, ci):
        s = subject_xy[jnp.maximum(si, 0)]
        c = clip_xy[jnp.maximum(ci, 0)]
        area = geo.convex_overlap_area(s, c)
        return jnp.where((si >= 0) & (ci >= 0), area, 0.0)

    return jax.vmap(one)(subject_ids, clip_ids)


@jax.jit
def barycentric_weights_kernel(points, face_index, poly_xy, tolerance):
    """
    Mean-value coordinates of each point within its located face.

    Returns (n_q, n_max) weights; zero rows for face_index == -1.
    """

    def one(p, fi):
        poly = poly_xy[jnp.maximum(fi, 0)]
        w = geo.mean_value_weights(p, poly, tolerance)
        return jnp.where(fi >= 0, w, jnp.zeros_like(w))

    return jax.vmap(one)(points, face_index)


@jax.jit
def points_in_polygons_kernel(points, face_index, poly_xy, tolerance):
    """Pairwise exact test: is points[i] inside poly_xy[face_index[i]]?"""

    def one(p, fi):
        poly = poly_xy[jnp.maximum(fi, 0)]
        inside = geo.point_in_polygon(p, poly, tolerance)
        return inside & (fi >= 0)

    return jax.vmap(one)(points, face_index)


@jax.jit
def points_in_triangles_kernel(points, triangle_index, tri_xy, tolerance):
    """points: (n, 2); triangle_index: (n,); tri_xy: (n_tri, 3, 2)."""

    def one(p, ti):
        tri = tri_xy[jnp.maximum(ti, 0)]
        inside = geo.point_in_polygon(p, tri, tolerance)
        return inside & (ti >= 0)

    return jax.vmap(one)(points, triangle_index)


def default_tolerance(bounds, dtype=np.float64) -> float:
    """Tolerance heuristic: bbox diagonal scaled by dtype epsilon."""
    xmin, ymin, xmax, ymax = bounds
    diag = float(np.hypot(xmax - xmin, ymax - ymin))
    eps = 1e-12 if np.dtype(dtype) == np.float64 else 1e-6
    return diag * eps


def next_pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1)).bit_length()
