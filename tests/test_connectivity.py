"""
Connectivity kernel tests against a fully enumerated 4-face mixed mesh.

Mesh layout (2 quads below, 2 triangles above):

    6
    | \\
 3--4--5     nodes: 0:(0,0) 1:(1,0) 2:(2,0) 3:(0,1)
 |f0|f1|            4:(1,1) 5:(2,1) 6:(1,2)
 0--1--2     faces: f0=[0,1,4,3] f1=[1,2,5,4] f2=[3,4,6] f3=[4,5,6]
"""

import numpy as np
import pytest
from scipy import sparse

from xugrid_tpu.constants import FILL_VALUE
from xugrid_tpu.ugrid import connectivity as cn

NODE_X = np.array([0.0, 1.0, 2.0, 0.0, 1.0, 2.0, 1.0])
NODE_Y = np.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 2.0])
FACES = np.array(
    [
        [0, 1, 4, 3],
        [1, 2, 5, 4],
        [3, 4, 6, -1],
        [4, 5, 6, -1],
    ]
)
EDGE_NODES = np.array(
    [
        [0, 1],
        [0, 3],
        [1, 2],
        [1, 4],
        [2, 5],
        [3, 4],
        [3, 6],
        [4, 5],
        [4, 6],
        [5, 6],
    ]
)
FACE_EDGES = np.array(
    [
        [0, 3, 5, 1],
        [2, 4, 7, 3],
        [5, 8, 6, -1],
        [7, 9, 8, -1],
    ]
)
EDGE_FACES = np.array(
    [
        [0, -1],
        [0, -1],
        [1, -1],
        [0, 1],
        [1, -1],
        [0, 2],
        [2, -1],
        [1, 3],
        [2, 3],
        [3, -1],
    ]
)
CENTROIDS = np.array(
    [
        [0.5, 0.5],
        [1.5, 0.5],
        [2.0 / 3.0, 4.0 / 3.0],
        [4.0 / 3.0, 4.0 / 3.0],
    ]
)
AREAS = np.array([1.0, 1.0, 0.5, 0.5])


def test_cross2d():
    a = np.array([[1.0, 0.0]])
    b = np.array([[0.0, 1.0]])
    assert np.allclose(cn.cross2d(a, b), [1.0])


def test_argsort_rows():
    arr = np.array([[2, 1], [0, 5], [0, 2], [2, 0]])
    expected = np.array([2, 1, 0, 3])[np.argsort([2, 1, 3, 0])]
    sorter = cn.argsort_rows(arr)
    assert np.array_equal(arr[sorter], np.array([[0, 2], [0, 5], [2, 0], [2, 1]]))


def test_index_like():
    xy_a = np.column_stack([NODE_X, NODE_Y])
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(xy_a))
    xy_b = xy_a[perm]
    index = cn.index_like(xy_a, xy_b, tolerance=0.0)
    assert np.allclose(xy_a[index], xy_b)
    # with tolerance and jitter
    jittered = xy_b + rng.uniform(-1e-8, 1e-8, xy_b.shape)
    index = cn.index_like(xy_a, jittered, tolerance=1e-6)
    assert np.allclose(xy_a[index], xy_b)
    with pytest.raises(ValueError, match="shape"):
        cn.index_like(xy_a, xy_a[:3], tolerance=0.0)


def test_ragged_index():
    actual = cn.ragged_index(3, 4, np.array([1, 2, 3]))
    expected = np.array(
        [
            [True, False, False, False],
            [True, True, False, False],
            [True, True, True, False],
        ]
    )
    assert np.array_equal(actual, expected)


def test_to_sparse_to_dense_roundtrip():
    csr = cn.to_sparse(FACES)
    assert isinstance(csr, sparse.csr_matrix)
    assert csr.nnz == 14
    back = cn.to_dense(csr)
    # sorted indices: each row holds the same nodes (sorted)
    for row_a, row_b in zip(FACES, back):
        assert set(row_a[row_a != FILL_VALUE]) == set(row_b[row_b != FILL_VALUE])


def test_to_sparse_preserves_ccw_order():
    csr = cn.to_sparse(FACES, sort_indices=False)
    back = cn.to_dense(csr)
    assert np.array_equal(back, FACES)


def test_to_dense_n_columns():
    csr = cn.to_sparse(FACES, sort_indices=False)
    wide = cn.to_dense(csr, n_columns=6)
    assert wide.shape == (4, 6)
    assert np.array_equal(wide[:, :4], FACES)
    assert (wide[:, 4:] == FILL_VALUE).all()
    with pytest.raises(ValueError, match="too small"):
        cn.to_dense(csr, n_columns=2)


def test_invert_dense():
    node_face = cn.invert_dense(FACES)
    # node 4 participates in all 4 faces
    assert set(node_face[4]) == {0, 1, 2, 3}
    # node 0 only in face 0
    assert node_face[0][0] == 0
    assert (node_face[0][1:] == FILL_VALUE).all()


def test_invert_sparse():
    csr = cn.to_sparse(FACES)
    inv = cn.invert_sparse(csr)
    assert inv.shape == (7, 4)
    dense_inv = cn.invert_sparse_to_dense(csr)
    assert set(dense_inv[4][dense_inv[4] != FILL_VALUE]) == {0, 1, 2, 3}


def test_renumber():
    a = np.array([[10, 40, 30], [30, -1, 10]])
    out = cn.renumber(a)
    assert np.array_equal(out, np.array([[0, 2, 1], [1, -1, 0]]))


def test_close_polygons():
    closed, isfill = cn.close_polygons(FACES)
    assert closed.shape == (4, 5)
    assert np.array_equal(closed[0], [0, 1, 4, 3, 0])
    assert np.array_equal(closed[2], [3, 4, 6, 3, 3])
    assert isfill[2, 3] and isfill[2, 4]
    assert not isfill[0].any() or isfill[0, 4]


def test_reverse_orientation():
    rev = cn.reverse_orientation(FACES)
    assert np.array_equal(rev[0], [3, 4, 1, 0])
    assert np.array_equal(rev[2], [6, 4, 3, -1])


def test_counterclockwise():
    nodes = np.column_stack([NODE_X, NODE_Y])
    cw = FACES.copy()
    cw[0] = [3, 4, 1, 0]  # clockwise quad
    fixed = cn.counterclockwise(cw, nodes)
    assert np.array_equal(fixed[0], [0, 1, 4, 3])
    # Already-ccw rows untouched
    assert np.array_equal(fixed[1:], FACES[1:])


def test_edge_connectivity():
    edge_nodes, face_edges = cn.edge_connectivity(FACES)
    assert np.array_equal(edge_nodes, EDGE_NODES)
    assert np.array_equal(face_edges, FACE_EDGES)


def test_edge_connectivity_with_prior():
    # Permute the edges; numbering must be preserved.
    perm = np.array([3, 0, 2, 1, 4, 6, 5, 8, 7, 9])
    prior = EDGE_NODES[perm]
    edge_nodes, face_edges = cn.edge_connectivity(FACES, prior)
    assert np.array_equal(edge_nodes, prior)
    inverse_perm = np.argsort(perm)
    assert np.array_equal(
        face_edges, np.where(FACE_EDGES == -1, -1, inverse_perm[FACE_EDGES])
    )


def test_edge_connectivity_invalid_prior():
    bad = EDGE_NODES.copy()
    bad[0] = [0, 6]  # not an edge of any face
    with pytest.raises(ValueError, match="Invalid edge_node_connectivity"):
        cn.edge_connectivity(FACES, bad)


def test_validate_edge_node_connectivity():
    with_extra = np.vstack([EDGE_NODES, [[0, 4]], [[0, 1]]])
    valid = cn.validate_edge_node_connectivity(FACES, with_extra)
    assert valid[:10].all()
    assert not valid[10]  # undefined edge
    assert not valid[11]  # duplicate
    with pytest.raises(ValueError, match="defines only"):
        cn.validate_edge_node_connectivity(FACES, EDGE_NODES[:5])


def test_boundary_node_connectivity():
    bnc = cn.boundary_node_connectivity(EDGE_FACES, EDGE_NODES)
    expected = EDGE_NODES[[0, 1, 2, 4, 6, 9]]
    assert np.array_equal(bnc, expected)


def test_face_face_connectivity():
    ff = cn.face_face_connectivity(EDGE_FACES, n_face=4)
    assert ff.shape == (4, 4)
    assert set(ff[0].indices) == {1, 2}
    assert set(ff[3].indices) == {1, 2}
    # data carries the connecting edge
    row0 = dict(zip(ff[0].indices, ff[0].data))
    assert row0[1] == 3 and row0[2] == 5


def test_node_node_connectivity():
    nn = cn.node_node_connectivity(EDGE_NODES)
    assert set(nn[4].indices) == {1, 3, 5, 6}
    assert set(nn[0].indices) == {1, 3}


def test_directed_node_node_connectivity():
    dnn = cn.directed_node_node_connectivity(EDGE_NODES)
    assert set(dnn[0].indices) == {1, 3}
    assert dnn[6].nnz == 0  # node 6 is never a source


def test_edge_edge_connectivity():
    node_edge = cn.invert_dense_to_sparse(EDGE_NODES)
    ee = cn.edge_edge_connectivity(EDGE_NODES, node_edge)
    # edge 0 = (0,1): shares node 0 with edge 1; node 1 with edges 2, 3
    assert set(ee[0].indices) == {1, 2, 3}


def test_directed_edge_edge_connectivity():
    enc = np.array([[0, 1], [1, 2], [2, 3], [1, 4]])
    node_edge = cn.invert_dense_to_sparse(enc)
    dee = cn.directed_edge_edge_connectivity(enc, node_edge)
    assert set(dee[0].indices) == {1, 3}
    assert set(dee[1].indices) == {2}
    assert dee[2].nnz == 0


def test_structured_connectivity():
    active = np.array([[True, True], [True, False]])
    adj = cn.structured_connectivity(active)
    assert adj.n == 3
    assert set(cn.neighbors(adj, 0)) == {1, 2}
    assert set(cn.neighbors(adj, 1)) == {0}
    assert set(cn.neighbors(adj, 2)) == {0}


def test_area():
    assert np.allclose(cn.area(FACES, NODE_X, NODE_Y), AREAS)


def test_perimeter():
    expected = np.array([4.0, 4.0, 2 + np.sqrt(2), 2 + np.sqrt(2)])
    assert np.allclose(cn.perimeter(FACES, NODE_X, NODE_Y), expected)


def test_centroids():
    assert np.allclose(cn.centroids(FACES, NODE_X, NODE_Y), CENTROIDS)


def test_centroids_triangular():
    tris = np.array([[3, 4, 6], [4, 5, 6]])
    out = cn.centroids(tris, NODE_X, NODE_Y)
    assert np.allclose(out, CENTROIDS[2:])


def test_circumcenters():
    tris = np.array([[0, 1, 4]])
    out = cn.circumcenters(tris, NODE_X, NODE_Y)
    # circumcenter of (0,0),(1,0),(1,1) is (0.5, 0.5)
    assert np.allclose(out, [[0.5, 0.5]])
    with pytest.raises(NotImplementedError):
        cn.circumcenters(FACES, NODE_X, NODE_Y)


def test_triangulate_dense():
    triangles, tri_face = cn.triangulate(FACES)
    expected = np.array(
        [
            [0, 1, 4],
            [0, 4, 3],
            [1, 2, 5],
            [1, 5, 4],
            [3, 4, 6],
            [4, 5, 6],
        ]
    )
    assert np.array_equal(triangles, expected)
    assert np.array_equal(tri_face, [0, 0, 1, 1, 2, 3])


def test_triangulate_already_triangular():
    tris = np.array([[3, 4, 6], [4, 5, 6]])
    out, tri_face = cn.triangulate(tris)
    assert np.array_equal(out, tris)
    assert out is not tris
    assert np.array_equal(tri_face, [0, 1])


def test_triangulate_coo():
    coo = cn.to_sparse(FACES, sort_indices=False).tocoo()
    # emulate (row=i, col=j) layout expected by triangulate_coo
    coo2 = sparse.coo_matrix(
        (coo.data, (np.repeat(np.arange(4), [4, 4, 3, 3]), coo.indices))
        if False
        else (coo.data, (coo.row, coo.col))
    )
    triangles, tri_face = cn.triangulate_coo(coo2.tocoo())
    assert triangles.shape == (6, 3)
    assert np.array_equal(tri_face, [0, 0, 1, 1, 2, 3])


def test_topological_sort_by_dfs():
    # 0 → 1 → 2, 0 → 3 → 2
    enc = np.array([[0, 1], [1, 2], [0, 3], [3, 2]])
    A = cn.directed_node_node_connectivity(enc)
    order = cn.topological_sort_by_dfs(A)
    pos = np.argsort(order)
    assert pos[0] < pos[1] < pos[2]
    assert pos[0] < pos[3] < pos[2]


def test_topological_sort_cycle_raises():
    enc = np.array([[0, 1], [1, 2], [2, 0]])
    A = cn.directed_node_node_connectivity(enc)
    with pytest.raises(ValueError, match="cycle"):
        cn.topological_sort_by_dfs(A)


def test_contract_vertices():
    # chain 0 → 1 → 2 → 3 → 4; keep {0, 2, 4}
    enc = np.array([[0, 1], [1, 2], [2, 3], [3, 4]])
    A = cn.directed_node_node_connectivity(enc)
    edges = cn.contract_vertices(A, np.array([0, 2, 4]))
    edge_set = {tuple(e) for e in edges}
    assert edge_set == {(0, 2), (2, 4)}


def test_binary_erosion_dilation():
    ff = cn.face_face_connectivity(EDGE_FACES, n_face=4)
    data = np.array([True, True, True, True])
    exterior = np.array([0, 1, 2, 3])  # all faces touch the exterior
    eroded = cn.binary_erosion(ff, data, exterior=exterior, border_value=False)
    assert not eroded.any()

    seed = np.array([True, False, False, False])
    dilated = cn.binary_dilation(ff, seed)
    assert dilated[0] and dilated[1] and dilated[2]
    assert not dilated[3]
    dilated2 = cn.binary_dilation(ff, seed, iterations=2)
    assert dilated2.all()

    with pytest.raises(TypeError, match="bool"):
        cn.binary_dilation(ff, seed.astype(int))
    with pytest.raises(ValueError, match="single"):
        cn.binary_dilation(ff, seed[np.newaxis])


def test_binary_dilation_mask():
    ff = cn.face_face_connectivity(EDGE_FACES, n_face=4)
    seed = np.array([True, False, False, False])
    mask = np.array([False, True, False, False])
    dilated = cn.binary_dilation(ff, seed, mask=mask)
    assert not dilated[1]
