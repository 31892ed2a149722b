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
