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
