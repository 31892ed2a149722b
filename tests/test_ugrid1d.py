"""Ugrid1d network topology tests."""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu import xdata

# zigzag network: 0:(0,0) 1:(1,1) 2:(2,0) 3:(3,1); chain edges
NODE_X = np.array([0.0, 1.0, 2.0, 3.0])
NODE_Y = np.array([0.0, 1.0, 0.0, 1.0])
EDGES = np.array([[0, 1], [1, 2], [2, 3]])


@pytest.fixture
def network():
    return xu.Ugrid1d(NODE_X, NODE_Y, -1, EDGES)


class TestTopology:
    def test_basic(self, network):
        assert network.n_node == 4
        assert network.n_edge == 3
        assert network.topology_dimension == 1
        assert network.core_dimension == "network1d_nEdges"
        assert network.dims == {"network1d_nNodes", "network1d_nEdges"}
        assert np.allclose(network.edge_length, np.sqrt(2))
        assert network.bounds == (0.0, 0.0, 3.0, 1.0)

    def test_connectivity(self, network):
        nn = network.node_node_connectivity
        assert set(nn[1].indices) == {0, 2}
        dnn = network.directed_node_node_connectivity
        assert set(dnn[0].indices) == {1}

    def test_dataset_roundtrip(self, network):
        ds = network.to_dataset()
        back = xu.Ugrid1d.from_dataset(ds)
        assert network.equals(back)

    def test_netcdf_roundtrip(self, network, tmp_path):
        path = tmp_path / "net.nc"
        uda = xu.UgridDataArray(
            xdata.DataArray(
                np.arange(3.0), dims=(network.edge_dimension,), name="q"
            ),
            network,
        )
        uda.ugrid.to_netcdf(path)
        uds = xu.open_dataset(path)
        assert uds.grid.equals(network)
        assert np.allclose(np.asarray(uds["q"].values), [0, 1, 2])

    def test_is_cyclic(self, network):
        assert not network.is_cyclic
        cyclic = xu.Ugrid1d(
            NODE_X[:3], NODE_Y[:3], -1, np.array([[0, 1], [1, 2], [2, 0]])
        )
        assert cyclic.is_cyclic

    def test_topological_sort(self, network):
        order = network.topological_sort_by_dfs()
        pos = np.argsort(order)
        assert pos[0] < pos[1] < pos[2] < pos[3]

    def test_contract_vertices(self, network):
        contracted = network.contract_vertices(np.array([0, 3]))
        assert contracted.n_edge == 1
        assert contracted.n_node == 2

    def test_remove_self_loops(self):
        grid = xu.Ugrid1d(
            NODE_X, NODE_Y, -1, np.array([[0, 1], [1, 1], [1, 2]])
        )
        cleaned = grid.remove_self_loops()
        assert cleaned.n_edge == 2

    def test_refine_by_vertices(self, network):
        refined = network.refine_by_vertices(np.array([[0.5, 0.5]]))
        assert refined.n_edge == 4
        assert refined.n_node == 5
        # Refuse points off the network
        with pytest.raises(ValueError, match="not located"):
            network.refine_by_vertices(np.array([[0.5, 0.9]]))

    def test_topology_subset(self, network):
        sub = network.topology_subset(np.array([0, 1]))
        assert sub.n_edge == 2
        assert sub.n_node == 3

    def test_sel(self, network):
        da = xdata.DataArray(
            np.arange(3.0), dims=(network.edge_dimension,), name="q"
        )
        obj, grid = network.sel(da, x=slice(0.0, 1.6), y=slice(None, None))
        # edge midpoints at x = 0.5, 1.5, 2.5 -> first two
        assert grid.n_edge == 2
        assert np.allclose(np.asarray(obj.data), [0, 1])

    def test_locate_points(self, network):
        result = network.locate_points(
            np.array([[0.5, 0.5], [2.5, 0.5], [0.0, 1.0]])
        )
        assert np.array_equal(result, [0, 2, -1])


class TestInterpolation:
    def test_nearest_interpolate_nodes(self, network):
        data = np.array([1.0, np.nan, np.nan, 4.0])
        filled = network._nearest_interpolate(
            data, network.node_dimension, np.inf
        )
        assert np.allclose(filled, [1, 1, 4, 4])

    def test_nearest_interpolate_edges(self, network):
        data = np.array([1.0, np.nan, 3.0])
        filled = network._nearest_interpolate(
            data, network.edge_dimension, np.inf
        )
        assert filled[1] in (1.0, 3.0)

    def test_max_distance(self, network):
        data = np.array([1.0, np.nan, np.nan, np.nan])
        filled = network._nearest_interpolate(
            data, network.node_dimension, max_distance=1.5
        )
        assert filled[1] == 1.0
        assert np.isnan(filled[3])


class TestPartitionMerge:
    def test_merge_partitions(self, network):
        uda = xu.UgridDataArray(
            xdata.DataArray(
                np.arange(3.0), dims=(network.edge_dimension,), name="q"
            ),
            network,
        )
        parts = [
            uda.isel({network.edge_dimension: np.array([0, 1])}),
            uda.isel({network.edge_dimension: np.array([1, 2])}),
        ]
        merged = xu.merge_partitions(parts)
        assert merged.grid.n_edge == 3
        assert merged.grid.n_node == 4


class TestNamingAndFormat:
    """Reference scenarios: rename propagation, equals, data-array and
    connectivity-format helpers (reference tests/test_ugrid1d.py:601-790)."""

    def test_rename(self, network):
        renamed = network.rename("network")
        assert renamed.name == "network"
        assert renamed.node_dimension == "network_nNodes"
        assert renamed.edge_dimension == "network_nEdges"
        # Original untouched.
        assert network.name == "network1d"

    def test_rename_return_name_dict(self, network):
        renamed, name_dict = network.rename("net", return_name_dict=True)
        assert renamed.name == "net"
        assert isinstance(name_dict, dict)
        assert name_dict.get("network1d") == "net"
        assert name_dict.get("network1d_nNodes") == "net_nNodes"
        assert name_dict.get("network1d_nEdges") == "net_nEdges"

    def test_equals(self, network):
        other = xu.Ugrid1d(NODE_X, NODE_Y, -1, EDGES)
        assert network.equals(other)
        assert not network.equals("not a grid")
        moved = xu.Ugrid1d(NODE_X + 1.0, NODE_Y, -1, EDGES)
        assert not network.equals(moved)

    def test_create_data_array(self, network):
        uda = network.create_data_array(np.arange(3.0), facet="edge")
        assert isinstance(uda, xu.UgridDataArray)
        assert uda.dims == (network.edge_dimension,)
        uda = network.create_data_array(np.arange(4.0), facet="node")
        assert uda.dims == (network.node_dimension,)
        with pytest.raises(ValueError):
            network.create_data_array(np.arange(3.0), facet="face")
        with pytest.raises(ValueError):
            network.create_data_array(np.arange(99.0), facet="edge")

    def test_format_connectivity(self, network):
        sparse_nn = network.node_node_connectivity
        dense = xu.Ugrid1d.format_connectivity_as_dense(sparse_nn)
        assert dense.ndim == 2
        assert dense.shape[0] == network.n_node
        back = xu.Ugrid1d.format_connectivity_as_sparse(dense)
        # Same sparsity pattern (data holds edge indices incl. zero).
        pattern = sparse_nn.copy()
        pattern.data = np.ones_like(pattern.data)
        back.data = np.ones_like(back.data)
        assert (back != pattern).nnz == 0

    def test_get_coordinates(self, network):
        nodes = network.get_coordinates(network.node_dimension)
        assert nodes.shape == (4, 2)
        edges = network.get_coordinates(network.edge_dimension)
        assert edges.shape == (3, 2)
        np.testing.assert_allclose(edges[:, 0], [0.5, 1.5, 2.5])
        with pytest.raises(ValueError):
            network.get_coordinates("nonsense")

    def test_get_connectivity_matrix(self, network):
        matrix = network.get_connectivity_matrix(
            network.node_dimension, xy_weights=True
        )
        assert matrix.shape == (4, 4)
        # Weights are mean-normalized inverse distances; the zigzag's
        # edges are all sqrt(2) long, so every weight is exactly 1.
        assert np.allclose(matrix.data, 1.0)

        # Unequal edge lengths: weights proportional to 1/distance.
        stretched = xu.Ugrid1d(
            np.array([0.0, 1.0, 3.0]),
            np.zeros(3),
            -1,
            np.array([[0, 1], [1, 2]]),
        )
        m = stretched.get_connectivity_matrix(
            stretched.node_dimension, xy_weights=True
        )
        row1 = m[1].toarray().ravel()
        assert np.isclose(row1[0] / row1[2], 2.0)

    def test_edge_bounds(self, network):
        eb = network.edge_bounds
        assert eb.shape == (3, 4)
        np.testing.assert_allclose(eb[0], [0.0, 0.0, 1.0, 1.0])

    def test_assign_coords(self, network):
        da = xdata.DataArray(
            np.arange(3.0), dims=(network.edge_dimension,), name="q"
        )
        with_edge = network.assign_edge_coords(da)
        assert f"{network.name}_edge_x" in with_edge.coords
        da2 = xdata.DataArray(
            np.arange(4.0), dims=(network.node_dimension,), name="p"
        )
        with_node = network.assign_node_coords(da2)
        assert f"{network.name}_node_x" in with_node.coords


class TestLineIntersection:
    def test_intersect_line(self, network):
        uda = xu.UgridDataArray(
            xdata.DataArray(
                np.arange(3.0), dims=(network.edge_dimension,), name="q"
            ),
            network,
        )
        section = uda.ugrid.intersect_line(
            start=(0.0, 0.5), end=(3.0, 0.5)
        )
        values = np.asarray(section.values)
        # The horizontal line at y=0.5 crosses all three zigzag edges.
        np.testing.assert_allclose(np.sort(values), [0.0, 1.0, 2.0])
        # Distance coordinate "s" is ascending along the line.
        s = np.asarray(section.coords[f"{network.name}_s"].data)
        assert (np.diff(s) > 0).all()

    def test_sel_points(self, network):
        uda = xu.UgridDataArray(
            xdata.DataArray(
                np.arange(3.0), dims=(network.edge_dimension,), name="q"
            ),
            network,
        )
        # Points on the first and last edges.
        out = uda.ugrid.sel_points(
            x=[0.5, 2.5], y=[0.5, 0.5], out_of_bounds="drop"
        )
        np.testing.assert_allclose(np.asarray(out.values), [0.0, 2.0])


class TestReindexLike:
    def test_roundtrip(self, network):
        # A re-ordered copy of the same network.
        order = np.array([2, 1, 0])
        shuffled = xu.Ugrid1d(
            NODE_X, NODE_Y, -1, EDGES[order]
        )
        uda = xu.UgridDataArray(
            xdata.DataArray(
                np.arange(3.0)[order],
                dims=(shuffled.edge_dimension,),
                name="q",
            ),
            shuffled,
        )
        out = uda.ugrid.reindex_like(network)
        np.testing.assert_allclose(np.asarray(out.values), [0.0, 1.0, 2.0])
