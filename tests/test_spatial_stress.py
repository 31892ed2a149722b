"""
Spatial-index stress suite: BVH query kernels validated against
brute-force geometry on randomized meshes (the celltree is THE
correctness risk the SURVEY flags; unit fixtures alone cannot cover
the traversal corner cases that jittered meshes produce).
"""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu.spatial.celltree import CellTree2d


def jittered_quads(ns, seed=0, jitter=0.22):
    rng = np.random.default_rng(seed)
    x = np.arange(ns + 1.0)
    yy, xx = np.meshgrid(x, x, indexing="ij")
    verts = np.column_stack([xx.ravel(), yy.ravel()])
    j = rng.uniform(-jitter, jitter, verts.shape)
    edge = (
        (verts[:, 0] == 0) | (verts[:, 1] == 0)
        | (verts[:, 0] == ns) | (verts[:, 1] == ns)
    )
    j[edge] = 0.0
    verts = verts + j
    jj, ii = np.meshgrid(np.arange(ns), np.arange(ns), indexing="ij")
    nid = lambda a, b: b * (ns + 1) + a  # noqa: E731
    faces = np.stack(
        [nid(ii, jj), nid(ii + 1, jj), nid(ii + 1, jj + 1), nid(ii, jj + 1)],
        axis=-1,
    ).reshape(-1, 4)
    return verts, faces


def point_in_polygon(p, poly):
    """Ray-casting with on-edge tolerance."""
    x, y = p
    inside = False
    n = len(poly)
    for k in range(n):
        x0, y0 = poly[k]
        x1, y1 = poly[(k + 1) % n]
        # on-edge check
        cross = (x1 - x0) * (y - y0) - (y1 - y0) * (x - x0)
        dot = (x - x0) * (x1 - x0) + (y - y0) * (y1 - y0)
        L2 = (x1 - x0) ** 2 + (y1 - y0) ** 2
        if abs(cross) < 1e-12 * max(L2, 1.0) and 0 <= dot <= L2:
            return True
        if (y0 > y) != (y1 > y):
            xint = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
            if x < xint:
                inside = not inside
    return inside


def brute_locate(points, verts, faces):
    out = np.full(len(points), -1, dtype=np.int64)
    for qi, p in enumerate(points):
        for fi, face in enumerate(faces):
            poly = verts[face[face >= 0]]
            if point_in_polygon(p, poly):
                out[qi] = fi
                break
    return out


class TestLocateStress:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_random_points_match_bruteforce(self, seed):
        ns = 12
        verts, faces = jittered_quads(ns, seed=seed)
        tree = CellTree2d(verts, faces, -1)
        rng = np.random.default_rng(seed + 100)
        pts = rng.uniform(-0.5, ns + 0.5, (300, 2))
        got = tree.locate_points(pts)
        expected = brute_locate(pts, verts, faces)
        # Points on shared edges may legitimately resolve to either
        # neighbor; for strictly-interior hits the indices must agree.
        disagreement = got != expected
        if disagreement.any():
            for qi in np.flatnonzero(disagreement):
                # Accept only if the point is on the boundary of the
                # returned face too (tie), or both report a containing
                # face whose polygon contains the point.
                gi = got[qi]
                assert gi >= 0 and expected[qi] >= 0, (
                    f"hit/miss mismatch at {pts[qi]}: "
                    f"tree={gi} brute={expected[qi]}"
                )
                poly = verts[faces[gi][faces[gi] >= 0]]
                assert point_in_polygon(pts[qi], poly)

    def test_degenerate_queries(self):
        verts, faces = jittered_quads(4, seed=9)
        tree = CellTree2d(verts, faces, -1)
        nodes = verts[:8]  # exactly on mesh nodes
        got = tree.locate_points(nodes)
        for qi, gi in enumerate(got):
            assert gi >= 0
            poly = verts[faces[gi][faces[gi] >= 0]]
            assert point_in_polygon(nodes[qi], poly)

    def test_far_outside_all_miss(self):
        verts, faces = jittered_quads(4, seed=5)
        tree = CellTree2d(verts, faces, -1)
        pts = np.array([[-50.0, -50.0], [100.0, 3.0], [2.0, 1e6]])
        assert (tree.locate_points(pts) == -1).all()


def seg_intersects_poly(a, b, poly):
    """Does segment a-b intersect the (closed convex-ish) polygon?"""
    # Any endpoint inside, or any edge-pair intersection.
    if point_in_polygon(a, poly) or point_in_polygon(b, poly):
        return True

    def cross2(u, v):
        return u[0] * v[1] - u[1] * v[0]

    def seg_seg(p0, p1, q0, q1):
        d1 = cross2(np.subtract(p1, p0), np.subtract(q0, p0))
        d2 = cross2(np.subtract(p1, p0), np.subtract(q1, p0))
        d3 = cross2(np.subtract(q1, q0), np.subtract(p0, q0))
        d4 = cross2(np.subtract(q1, q0), np.subtract(p1, q0))
        return (d1 * d2 <= 0) and (d3 * d4 <= 0)

    n = len(poly)
    for k in range(n):
        if seg_seg(a, b, poly[k], poly[(k + 1) % n]):
            return True
    return False


class TestIntersectEdgesStress:
    @pytest.mark.parametrize("seed", [4, 7])
    def test_random_segments_match_bruteforce(self, seed):
        ns = 8
        verts, faces = jittered_quads(ns, seed=seed)
        tree = CellTree2d(verts, faces, -1)
        rng = np.random.default_rng(seed)
        starts = rng.uniform(-1, ns + 1, (40, 2))
        ends = starts + rng.uniform(-3, 3, (40, 2))
        edges = np.stack([starts, ends], axis=1)
        qi, fi, _ = tree.intersect_edges(edges)
        got = set(zip(qi.tolist(), fi.tolist()))
        for q in range(len(edges)):
            for f in range(len(faces)):
                poly = verts[faces[f][faces[f] >= 0]]
                expected = seg_intersects_poly(starts[q], ends[q], poly)
                if expected and (q, f) not in got:
                    # Grazing contact may fall under the sliver
                    # tolerance; require a real crossing to fail.
                    mid = 0.5 * (starts[q] + ends[q])
                    if point_in_polygon(mid, poly):
                        raise AssertionError(
                            f"missing intersection: edge {q} face {f}"
                        )
                if not expected:
                    assert (q, f) not in got, (
                        f"spurious intersection: edge {q} face {f}"
                    )


class TestOverlapConservation:
    @pytest.mark.parametrize("seed", [11, 13])
    def test_total_overlap_equals_covered_area(self, seed):
        # Conservation: summed clip areas over all pairs == the area of
        # the intersection region.  Target strictly inside the source
        # mesh -> totals must match the full target area.
        ns = 10
        verts, faces = jittered_quads(ns, seed=seed)
        tree = CellTree2d(verts, faces, -1)
        tv, tf = jittered_quads(4, seed=seed + 1, jitter=0.0)
        tv = tv * 1.5 + 2.0  # [2, 8] x [2, 8], inside [0, 10]
        ti, si, areas = tree.intersect_faces(tv, tf, -1)
        total = areas.sum()
        assert np.isclose(total, 6.0 * 6.0, rtol=1e-10)
        # Per-target conservation too.
        per_target = np.zeros(len(tf))
        np.add.at(per_target, ti, areas)
        np.testing.assert_allclose(per_target, 1.5 * 1.5, rtol=1e-10)

    def test_identity_overlap(self):
        verts, faces = jittered_quads(6, seed=21)
        tree = CellTree2d(verts, faces, -1)
        ti, si, areas = tree.intersect_faces(verts, faces, -1)
        grid = xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces)
        # Self-overlap must recover each face's own area on the diagonal.
        diag = ti == si
        per_face = np.zeros(grid.n_face)
        np.add.at(per_face, ti[diag], areas[diag])
        np.testing.assert_allclose(per_face, grid.area, rtol=1e-8)


class TestClipAreaOracle:
    @staticmethod
    def _sh_clip_area(subj, clip):
        def signed(p):
            x, y = p[:, 0], p[:, 1]
            return 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)

        if signed(clip) < 0:
            clip = clip[::-1]
        if signed(subj) < 0:
            subj = subj[::-1]
        out = [tuple(p) for p in subj]
        for e in range(len(clip)):
            a, b = clip[e], clip[(e + 1) % len(clip)]
            dx, dy = b[0] - a[0], b[1] - a[1]
            inp = out
            out = []
            if not inp:
                break
            for i in range(len(inp)):
                P, Q = inp[i], inp[(i + 1) % len(inp)]
                dP = dx * (P[1] - a[1]) - dy * (P[0] - a[0])
                dQ = dx * (Q[1] - a[1]) - dy * (Q[0] - a[0])
                if dP >= 0:
                    out.append(P)
                if (dP > 0 and dQ < 0) or (dP < 0 and dQ > 0):
                    t = dP / (dP - dQ)
                    out.append(
                        (P[0] + t * (Q[0] - P[0]), P[1] + t * (Q[1] - P[1]))
                    )
        if len(out) < 3:
            return 0.0
        return abs(signed(np.array(out)))

    @pytest.mark.parametrize("seed", [73, 74])
    def test_pairwise_areas_match_sutherland_hodgman(self, seed):
        # The flagship weight path: every reported (target, source) clip
        # area must match a pure-python Sutherland-Hodgman oracle on
        # irregular triangle meshes.
        pytest.importorskip("scipy.spatial")
        from scipy.spatial import Delaunay

        rng = np.random.default_rng(seed)
        ps = rng.uniform(0, 10, (int(rng.integers(30, 80)), 2))
        sf = Delaunay(ps).simplices.astype(np.int64)
        tree = CellTree2d(ps, sf, -1)
        pt = rng.uniform(1, 9, (int(rng.integers(20, 50)), 2))
        tf = Delaunay(pt).simplices.astype(np.int64)
        ti, si, areas = tree.intersect_faces(pt, tf, -1)
        assert len(ti) > 0
        for k in rng.choice(len(ti), min(len(ti), 120), replace=False):
            expect = self._sh_clip_area(pt[tf[ti[k]]], ps[sf[si[k]]])
            assert abs(areas[k] - expect) <= 1e-9 * max(1.0, expect)


class TestBarycentricStress:
    def test_weights_reproduce_linear_field(self):
        verts, faces = jittered_quads(6, seed=31)
        grid = xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces)
        tri = grid.triangulate()
        tree = CellTree2d(
            tri.node_coordinates, tri.face_node_connectivity, -1
        )
        rng = np.random.default_rng(3)
        pts = rng.uniform(0.5, 5.5, (200, 2))
        fi, w = tree.compute_barycentric_weights(pts)
        w = np.asarray(w)
        inside = fi >= 0
        assert inside.mean() > 0.95
        np.testing.assert_allclose(w[inside].sum(axis=1), 1.0, atol=1e-6)
        f = lambda xy: 3.0 * xy[:, 0] - 2.0 * xy[:, 1] + 0.5  # noqa: E731
        node_vals = f(tri.node_coordinates)
        nodes = tri.face_node_connectivity[fi[inside]]
        interp = (node_vals[nodes] * w[inside][:, : nodes.shape[1]]).sum(
            axis=1
        )
        np.testing.assert_allclose(interp, f(pts[inside]), atol=1e-8)


class TestNearestPoints:
    """Device distance-matmul NN vs scipy KDTree."""

    def _problem(self, seed=0, m=500, p=300):
        rng = np.random.default_rng(seed)
        sources = rng.uniform(0, 100, (m, 2))
        queries = rng.uniform(-10, 110, (p, 2))
        return sources, queries

    def test_device_matches_kdtree(self, monkeypatch):
        from xugrid_tpu.spatial import nearest

        sources, queries = self._problem()
        monkeypatch.setenv("XUGRID_TPU_NEAREST", "host")
        host = nearest.nearest_points(sources, queries)
        monkeypatch.setenv("XUGRID_TPU_NEAREST", "device")
        dev = nearest.nearest_points(sources, queries)
        # f32 device distances may tie-break differently at 1e-7; the
        # chosen neighbor must then be equidistant.
        diff = host != dev
        if diff.any():
            d_host = np.linalg.norm(
                sources[host[diff]] - queries[diff], axis=1
            )
            d_dev = np.linalg.norm(
                sources[dev[diff]] - queries[diff], axis=1
            )
            np.testing.assert_allclose(d_host, d_dev, rtol=1e-5)

    def test_max_distance(self, monkeypatch):
        from xugrid_tpu.spatial import nearest

        sources = np.array([[0.0, 0.0], [10.0, 0.0]])
        queries = np.array([[0.1, 0.0], [50.0, 50.0]])
        for mode in ("host", "device"):
            monkeypatch.setenv("XUGRID_TPU_NEAREST", mode)
            idx = nearest.nearest_points(sources, queries, max_distance=5.0)
            assert idx[0] == 0
            assert idx[1] == -1

    def test_multi_tile(self, monkeypatch):
        from xugrid_tpu.spatial import nearest

        # More sources than one TILE: the scan must track indices
        # across tile boundaries.
        rng = np.random.default_rng(5)
        sources = rng.uniform(0, 1000, (nearest.TILE * 2 + 37, 2))
        queries = sources[::97] + 1e-4  # near-exact hits
        monkeypatch.setenv("XUGRID_TPU_NEAREST", "device")
        idx = nearest.nearest_points(sources, queries)
        np.testing.assert_array_equal(idx, np.arange(0, len(sources), 97))

    def test_grid_wrappers(self, monkeypatch):
        verts, faces = jittered_quads(5, seed=2)
        grid = xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces)
        pts = np.array([[0.01, 0.01], [2.5, 2.5]])
        for mode in ("host", "device"):
            monkeypatch.setenv("XUGRID_TPU_NEAREST", mode)
            nodes = grid.locate_nearest_node(pts)
            assert nodes[0] == 0  # corner node
            faces_found = grid.locate_nearest_face(pts)
            assert (faces_found >= 0).all()
