"""Multi-device sharding tests (8 virtual CPU devices via conftest)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from xugrid_tpu.core.sparse import MatrixCSR, PaddedCSR
from xugrid_tpu.parallel import (
    ShardedRegrid,
    partition_order,
    sharded_laplace_smooth,
)

requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)


@requires_8_devices
class TestShardedRegrid:
    def test_matches_host_mean(self):
        rng = np.random.default_rng(0)
        n_target, m, w = 64, 256, 4
        rows = np.repeat(np.arange(n_target), w)
        cols = rng.integers(0, m, n_target * w)
        weights = rng.uniform(0.5, 1.5, n_target * w)
        csr = MatrixCSR.from_triplet(rows, cols, weights, n=n_target, m=m)
        padded = PaddedCSR.from_csr(csr)

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("x",))
        plan = ShardedRegrid(mesh, padded)
        source = rng.normal(size=m)
        out = plan.gather(plan(source))

        expected = np.empty(n_target)
        for t in range(n_target):
            sl = slice(csr.indptr[t], csr.indptr[t + 1])
            v = source[csr.indices[sl]]
            wts = csr.data[sl]
            expected[t] = (v * wts).sum() / wts.sum()
        assert np.allclose(out, expected)

    def test_smoothing_converges(self):
        rng = np.random.default_rng(1)
        n = 128
        neighbors = np.column_stack([np.arange(n) - 1, np.arange(n) + 1])
        neighbors[0, 0] = -1
        neighbors[-1, 1] = -1
        values = rng.normal(size=n)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("x",))
        out = sharded_laplace_smooth(mesh, neighbors, values, n_steps=4)
        assert np.isfinite(out).all()
        assert out.var() < values.var()

    def test_partition_order_locality(self):
        rng = np.random.default_rng(2)
        xy = rng.uniform(0, 100, (4096, 2))
        order = partition_order(xy)
        shards = np.array_split(xy[order], 8)
        # Each shard's bounding box should be much smaller than the domain
        areas = [
            (s[:, 0].ptp() if hasattr(s[:, 0], "ptp") else np.ptp(s[:, 0]))
            * np.ptp(s[:, 1])
            for s in shards
        ]
        assert np.mean(areas) < 0.5 * 100 * 100


@requires_8_devices
def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_forward():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 65536)
    assert not np.isnan(np.asarray(out)).any()


class TestNeighborExchangePlan:
    def _mesh_and_adjacency(self, n_side=8):
        import jax
        from jax.sharding import Mesh

        import xugrid_tpu as xu
        from xugrid_tpu.parallel import partition_order

        x = np.arange(n_side + 1.0)
        yy, xx = np.meshgrid(x, x, indexing="ij")
        verts = np.column_stack([xx.ravel(), yy.ravel()])
        j, i = np.meshgrid(np.arange(n_side), np.arange(n_side), indexing="ij")
        nid = lambda ii, jj: jj * (n_side + 1) + ii  # noqa: E731
        faces = np.stack(
            [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)], -1
        ).reshape(-1, 4)
        grid = xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces)
        order = partition_order(grid.centroids)
        remap = np.empty(len(order), dtype=np.int64)
        remap[order] = np.arange(len(order))
        neighbors = grid.format_connectivity_as_dense(
            grid.face_face_connectivity
        )[order]
        neighbors = np.where(
            neighbors >= 0, remap[np.maximum(neighbors, 0)], -1
        )
        devices = np.array(jax.devices()[:8])
        mesh = Mesh(devices, ("faces",))
        values = np.sin(grid.centroids[order, 0]) + grid.centroids[order, 1]
        return mesh, neighbors, values

    def test_halo_matches_allgather(self):
        from xugrid_tpu.parallel import sharded_laplace_smooth

        mesh, neighbors, values = self._mesh_and_adjacency()
        out_halo = sharded_laplace_smooth(
            mesh, neighbors, values, n_steps=3, method="halo"
        )
        out_full = sharded_laplace_smooth(
            mesh, neighbors, values, n_steps=3, method="allgather"
        )
        np.testing.assert_allclose(out_halo, out_full, rtol=1e-12)

    def test_remote_fraction_is_small(self):
        from xugrid_tpu.parallel import NeighborExchangePlan

        mesh, neighbors, values = self._mesh_and_adjacency(16)
        plan = NeighborExchangePlan(mesh, neighbors)
        # Hilbert layout: remote references are a perimeter fraction.
        total_refs = (neighbors >= 0).sum()
        assert plan.n_remote < 0.5 * total_refs
        assert plan.n_remote > 0  # but the exchange is exercised

    def test_bad_method(self):
        from xugrid_tpu.parallel import sharded_laplace_smooth

        mesh, neighbors, values = self._mesh_and_adjacency()
        with pytest.raises(ValueError, match="halo"):
            sharded_laplace_smooth(mesh, neighbors, values, method="bogus")
