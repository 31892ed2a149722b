"""
Golden-fixture generator: runs the REFERENCE implementation's numeric
cores on seeded inputs and records their outputs as .npz files.

The reference package (/root/reference/xugrid) cannot be imported whole
here (xarray/numba are not installed), but its numeric-core modules are
pure numpy/pandas/scipy with a built-in numba fallback
(xugrid/constants.py:60-87).  This script loads exactly those modules
through namespace-package stubs — nothing of the reference is copied
into this repo; only its *outputs* on enumerated inputs are committed.

Covered (VERDICT r1 item 8):
- every reduction method (xugrid/regrid/reduce.py:16-272), NaN-bearing
  and NaN-free windows, zero weights, all-NaN rows;
- overlap_1d interval joins (xugrid/regrid/overlap_1d.py);
- Laplace interpolation, direct solve (xugrid/ugrid/interpolate.py:207);
- connectivity derivations on the canonical mixed tri/quad mesh and a
  seeded jittered mesh (xugrid/ugrid/connectivity.py);
- voronoi tessellations, all three exterior modes, canonicalized
  (xugrid/ugrid/voronoi.py:330-458).

Run ONCE (the .npz outputs are committed):
    python tests/golden/generate_goldens.py
"""

from __future__ import annotations

import importlib
import os
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference/xugrid"


def load_reference_modules():
    """Import the reference's numeric-core submodules standalone."""
    for name, path in [
        ("xugrid", REF),
        ("xugrid.regrid", os.path.join(REF, "regrid")),
        ("xugrid.ugrid", os.path.join(REF, "ugrid")),
        ("xugrid.core", os.path.join(REF, "core")),
    ]:
        mod = types.ModuleType(name)
        mod.__path__ = [path]
        sys.modules[name] = mod
    # interpolate.py imports xarray at module level but the functions
    # exercised here never touch it.
    sys.modules.setdefault("xarray", types.ModuleType("xarray"))
    return {
        "reduce": importlib.import_module("xugrid.regrid.reduce"),
        "overlap_1d": importlib.import_module("xugrid.regrid.overlap_1d"),
        "connectivity": importlib.import_module("xugrid.ugrid.connectivity"),
        "voronoi": importlib.import_module("xugrid.ugrid.voronoi"),
        "interpolate": importlib.import_module("xugrid.ugrid.interpolate"),
        "sparse": importlib.import_module("xugrid.core.sparse"),
    }


def golden_reductions(ref):
    rng = np.random.default_rng(1234)
    n, w = 96, 7
    values = rng.normal(size=(n, w)) * 10.0
    weights = rng.uniform(0.0, 2.0, (n, w))
    # Edge cases: NaNs, all-NaN rows, zero weights, all-zero-weight rows,
    # repeated values (mode ties), negatives (geometric_mean).
    values[rng.random((n, w)) < 0.2] = np.nan
    values[5] = np.nan
    weights[rng.random((n, w)) < 0.15] = 0.0
    weights[7] = 0.0
    values[11] = np.round(values[11])  # duplicates for mode
    values[13, :3] = values[13, 3]
    clean_values = np.where(np.isnan(values), 1.5, values)

    methods = dict(ref["reduce"].ABSOLUTE_OVERLAP_METHODS)
    methods.update(ref["reduce"].RELATIVE_OVERLAP_METHODS)
    out = {"values": values, "weights": weights, "clean_values": clean_values}
    for name, fn in methods.items():
        for tag, vals in (("nan", values), ("clean", clean_values)):
            expected = np.empty(n)
            for i in range(n):
                workspace = np.zeros(w)
                expected[i] = fn(vals[i].copy(), weights[i].copy(), workspace)
            out[f"expected_{name}_{tag}"] = expected
    np.savez(os.path.join(HERE, "reductions.npz"), **out)
    print(f"reductions.npz: {len(methods)} methods x 2 variants, n={n}")


def golden_overlap_1d(ref):
    rng = np.random.default_rng(99)

    def bounds_from_breaks(breaks):
        return np.column_stack([breaks[:-1], breaks[1:]])

    cases = {}
    # Non-uniform, partial overlap.
    sb = bounds_from_breaks(np.cumsum(np.r_[0.0, rng.uniform(0.5, 2.0, 40)]))
    tb = bounds_from_breaks(
        np.cumsum(np.r_[5.0, rng.uniform(0.8, 3.0, 17)])
    )
    cases["a"] = (sb, tb)
    # Target wider than source, exact-touch boundaries.
    sb2 = bounds_from_breaks(np.arange(0.0, 11.0))
    tb2 = bounds_from_breaks(np.array([-2.0, 0.0, 2.5, 5.0, 10.0, 14.0]))
    cases["b"] = (sb2, tb2)
    out = {}
    for tag, (sb, tb) in cases.items():
        src, tgt, olap = ref["overlap_1d"].overlap_1d(sb, tb)
        out[f"{tag}_source_bounds"] = sb
        out[f"{tag}_target_bounds"] = tb
        out[f"{tag}_source_index"] = src
        out[f"{tag}_target_index"] = tgt
        out[f"{tag}_overlap"] = olap
    np.savez(os.path.join(HERE, "overlap_1d.npz"), **out)
    print(f"overlap_1d.npz: {len(cases)} cases")


def golden_laplace(ref):
    import scipy.sparse

    rng = np.random.default_rng(7)
    n_side = 12
    n = n_side * n_side
    idx = np.arange(n).reshape(n_side, n_side)
    r = np.concatenate([idx[:, :-1].ravel(), idx[:-1, :].ravel()])
    c = np.concatenate([idx[:, 1:].ravel(), idx[1:, :].ravel()])
    rr = np.concatenate([r, c])
    cc = np.concatenate([c, r])
    wdata = rng.uniform(0.5, 2.0, len(r))
    wsym = np.concatenate([wdata, wdata])
    W = scipy.sparse.coo_matrix((wsym, (rr, cc)), shape=(n, n)).tocsr()
    truth = np.sin(np.linspace(0, 5, n)) * 4.0 + 2.0
    known = rng.random(n) < 0.3
    data = np.where(known, truth, np.nan)

    from scipy.sparse.csgraph import connected_components

    _, labels = connected_components(W, directed=False)
    filled = ref["interpolate"].laplace_interpolate(
        data, W, labels, use_weights=True, direct_solve=True
    )
    filled_unweighted = ref["interpolate"].laplace_interpolate(
        data, W, labels, use_weights=False, direct_solve=True
    )
    np.savez(
        os.path.join(HERE, "laplace.npz"),
        w_data=W.data, w_indices=W.indices, w_indptr=W.indptr, n=n,
        data=data,
        expected_weighted=filled,
        expected_unweighted=filled_unweighted,
    )
    print(f"laplace.npz: n={n}, unknowns={int((~known).sum())}")


def _mixed_mesh(rng=None):
    """The canonical 4-face tri/quad fixture plus a jittered variant."""
    vertices = np.array(
        [
            [0.0, 0.0], [1.0, 0.0], [2.0, 0.0],
            [0.0, 1.0], [1.0, 1.0], [2.0, 1.0],
            [1.0, 2.0],
        ]
    )
    faces = np.array(
        [
            [0, 1, 4, 3],
            [1, 2, 5, 4],
            [3, 4, 6, -1],
            [4, 5, 6, -1],
        ]
    )
    if rng is not None:
        vertices = vertices + rng.uniform(-0.08, 0.08, vertices.shape)
    return vertices, faces


def golden_connectivity(ref):
    conn = ref["connectivity"]
    rng = np.random.default_rng(21)
    out = {}
    for tag, (vertices, faces) in (
        ("canon", _mixed_mesh()),
        ("jitter", _mixed_mesh(rng)),
    ):
        edge_node, face_edge = conn.edge_connectivity(faces)
        edge_face = conn.invert_dense(face_edge)
        if edge_face.shape[1] == 1:
            edge_face = np.column_stack(
                [edge_face, np.full(len(edge_face), -1)]
            )
        ff = conn.face_face_connectivity(edge_face, len(faces)).toarray()
        cent = conn.centroids(faces, vertices[:, 0], vertices[:, 1])
        area = conn.area(faces, vertices[:, 0], vertices[:, 1])
        perim = conn.perimeter(faces, vertices[:, 0], vertices[:, 1])
        tri, tri_face = conn.triangulate(faces)
        out[f"{tag}_vertices"] = vertices
        out[f"{tag}_faces"] = faces
        out[f"{tag}_edge_node"] = edge_node
        out[f"{tag}_face_edge"] = face_edge
        out[f"{tag}_face_face_dense"] = ff
        out[f"{tag}_centroids"] = cent
        out[f"{tag}_area"] = area
        out[f"{tag}_perimeter"] = perim
        out[f"{tag}_triangles"] = tri
        out[f"{tag}_triangle_face"] = tri_face
    np.savez(os.path.join(HERE, "connectivity.npz"), **out)
    print("connectivity.npz: 2 meshes")


def golden_voronoi(ref):
    conn = ref["connectivity"]
    vor = ref["voronoi"]
    # A 3x2 rectangular quad mesh: interior + exterior + substitutes.
    nx_, ny_ = 3, 2
    x = np.arange(nx_ + 1.0)
    y = np.arange(ny_ + 1.0)
    yy, xx = np.meshgrid(y, x, indexing="ij")
    vertices = np.column_stack([xx.ravel(), yy.ravel()])
    j, i = np.meshgrid(np.arange(ny_), np.arange(nx_), indexing="ij")
    nid = lambda ii, jj: jj * (nx_ + 1) + ii  # noqa: E731
    faces = np.stack(
        [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)], -1
    ).reshape(-1, 4)
    rng = np.random.default_rng(3)
    vertices = vertices + rng.uniform(-0.1, 0.1, vertices.shape)

    edge_node, face_edge = conn.edge_connectivity(faces)
    edge_face = conn.invert_dense(face_edge)
    if edge_face.shape[1] == 1:
        edge_face = np.column_stack(
            [edge_face, np.full(len(edge_face), -1)]
        )
    node_face = conn.invert_dense_to_sparse(faces)
    cent = conn.centroids(faces, vertices[:, 0], vertices[:, 1])

    out = {
        "vertices": vertices,
        "faces": faces,
        "centroids": cent,
    }
    modes = {
        "interior": dict(add_exterior=False, add_vertices=False),
        "exterior": dict(add_exterior=True, add_vertices=False),
        "vertices": dict(add_exterior=True, add_vertices=True),
        "skipconcave": dict(
            add_exterior=True, add_vertices=True, skip_concave=True
        ),
    }
    for tag, kw in modes.items():
        if kw.get("add_exterior"):
            nodes, cells, face_index, _ = vor.voronoi_topology(
                node_face, vertices, cent,
                edge_face_connectivity=edge_face,
                edge_node_connectivity=edge_node,
                **kw,
            )
        else:
            nodes, cells, face_index, _ = vor.voronoi_topology(
                node_face, vertices, cent
            )
        # Canonical form: row-sorted vertex set; per-cell polygon areas
        # sorted; face_index multiset.
        if hasattr(cells, "todense"):
            cells = conn.to_dense(cells)
        cells = np.asarray(cells)
        order = np.lexsort(nodes.T)
        areas = []
        for row in cells:
            ids = row[row >= 0]
            p = nodes[ids]
            x0, y0 = p[:, 0], p[:, 1]
            areas.append(
                0.5 * np.abs(np.dot(x0, np.roll(y0, -1)) - np.dot(y0, np.roll(x0, -1)))
            )
        out[f"{tag}_nodes_sorted"] = nodes[order]
        out[f"{tag}_cell_areas_sorted"] = np.sort(np.asarray(areas))
        out[f"{tag}_n_cells"] = np.int64(
            cells.shape[0] if hasattr(cells, "shape") else len(cells)
        )
        out[f"{tag}_face_index_sorted"] = np.sort(np.asarray(face_index))
    np.savez(os.path.join(HERE, "voronoi.npz"), **out)
    print("voronoi.npz: 4 modes")


def golden_graph_morphology(ref):
    """DAG sort/contraction and binary morphology on enumerated graphs
    (xugrid/ugrid/connectivity.py:162-258, 791-877)."""
    import scipy.sparse

    conn = ref["connectivity"]
    rng = np.random.default_rng(17)
    out = {}

    # A random DAG: edges only from lower to higher ids (shuffled labels).
    n = 24
    perm = rng.permutation(n)
    edges = []
    for a in range(n):
        for b_ in range(a + 1, n):
            if rng.random() < 0.15:
                edges.append((perm[a], perm[b_]))
    edges = np.array(edges)
    A = scipy.sparse.coo_matrix(
        (np.ones(len(edges)), (edges[:, 0], edges[:, 1])), shape=(n, n)
    ).tocsr()
    order = conn.topological_sort_by_dfs(A)
    out["dag_edges"] = edges
    out["dag_n"] = np.int64(n)
    out["dag_order"] = order

    # Vertex contraction: a chain with branches, keep every 3rd vertex.
    m = 15
    chain = np.array([[i, i + 1] for i in range(m - 1)])
    C = scipy.sparse.coo_matrix(
        (np.ones(len(chain)), (chain[:, 0], chain[:, 1])), shape=(m, m)
    ).tocsr()
    keep = np.arange(0, m, 3)
    contracted = conn.contract_vertices(C, keep)
    out["chain_m"] = np.int64(m)
    out["chain_keep"] = keep
    out["chain_edges"] = np.asarray(contracted)

    # Binary morphology on the face adjacency of a quad patch.
    ns = 8
    j, i = np.meshgrid(np.arange(ns), np.arange(ns), indexing="ij")
    fid = (j * ns + i).ravel()
    pairs = []
    for jj in range(ns):
        for ii in range(ns):
            f = jj * ns + ii
            if ii + 1 < ns:
                pairs.append((f, f + 1))
            if jj + 1 < ns:
                pairs.append((f, f + ns))
    pairs = np.array(pairs)
    rowcol = np.concatenate([pairs, pairs[:, ::-1]])
    FF = scipy.sparse.coo_matrix(
        (np.ones(len(rowcol)), (rowcol[:, 0], rowcol[:, 1])),
        shape=(ns * ns, ns * ns),
    ).tocsr()
    exterior = np.flatnonzero(
        (i.ravel() == 0) | (i.ravel() == ns - 1)
        | (j.ravel() == 0) | (j.ravel() == ns - 1)
    )
    blob = np.zeros(ns * ns, dtype=bool)
    blob[fid.reshape(ns, ns)[2:6, 2:6].ravel()] = True
    out["morph_input"] = blob
    out["morph_exterior"] = exterior
    out["morph_eroded"] = conn.binary_erosion(
        FF, blob, iterations=1, exterior=exterior
    )
    out["morph_eroded2"] = conn.binary_erosion(
        FF, blob, iterations=2, exterior=exterior
    )
    out["morph_dilated"] = conn.binary_dilation(FF, blob, iterations=1)
    full = np.ones(ns * ns, dtype=bool)
    out["morph_border_erode"] = conn.binary_erosion(
        FF, full, iterations=1, exterior=exterior, border_value=False
    )

    # structured_connectivity on a masked active grid.
    active = np.ones((5, 6), dtype=bool)
    active[1, 2] = active[3, 3] = active[0, 0] = False
    adj = conn.structured_connectivity(active)
    dense_adj = np.full((adj.n, 4), -1, dtype=np.int64)
    for v in range(adj.n):
        neigh = np.sort(adj.indices[adj.indptr[v]: adj.indptr[v + 1]])
        dense_adj[v, : len(neigh)] = neigh
    out["struct_active"] = active
    out["struct_adjacency"] = dense_adj

    np.savez(os.path.join(HERE, "graph_morphology.npz"), **out)
    print("graph_morphology.npz: DAG sort, contraction, morphology")


def golden_sparse(ref):
    """MatrixCOO/CSR construction and conversion semantics
    (xugrid/core/sparse.py:22-158): duplicates are PRESERVED (not
    coalesced) and row order must be respected by to_csr."""
    rng = np.random.default_rng(41)
    n, m, nnz = 9, 7, 40
    row = np.sort(rng.integers(0, n, nnz))  # to_csr requires row-sorted
    col = rng.integers(0, m, nnz)
    data = rng.uniform(0.5, 2.0, nnz)
    coo = ref["sparse"].MatrixCOO.from_triplet(row, col, data)
    csr = ref["sparse"].MatrixCSR.from_triplet(row, col, data, n=n, m=m)
    back = csr.to_coo()
    np.savez(
        os.path.join(HERE, "sparse.npz"),
        row=row, col=col, data=data, n=n, m=m,
        coo_n=np.int64(coo.n), coo_m=np.int64(coo.m),
        csr_indptr=csr.indptr, csr_indices=csr.indices, csr_data=csr.data,
        csr_n=np.int64(csr.n), csr_m=np.int64(csr.m),
        csr_nnz=np.int64(csr.nnz),
        back_row=back.row, back_col=back.col, back_data=back.data,
    )
    print("sparse.npz: COO/CSR construction")


if __name__ == "__main__":
    ref = load_reference_modules()
    golden_reductions(ref)
    golden_overlap_1d(ref)
    golden_laplace(ref)
    golden_connectivity(ref)
    golden_voronoi(ref)
    golden_graph_morphology(ref)
    golden_sparse(ref)
    print("done")
