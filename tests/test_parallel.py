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

    def _overlap_problem(self, n_side=32, t_side=8):
        """Hilbert-ordered source quads -> raster target overlap weights."""
        import xugrid_tpu as xu
        from xugrid_tpu.regrid.unstructured import UnstructuredGrid2d

        def quads(ns, dx=1.0):
            x = np.arange(ns + 1.0) * dx
            yy, xx = np.meshgrid(x, x, indexing="ij")
            verts = np.column_stack([xx.ravel(), yy.ravel()])
            j, i = np.meshgrid(np.arange(ns), np.arange(ns), indexing="ij")
            nid = lambda ii, jj: jj * (ns + 1) + ii  # noqa: E731
            return verts, np.stack(
                [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)],
                -1,
            ).reshape(-1, 4)

        sverts, sfaces = quads(n_side)
        tverts, tfaces = quads(t_side, dx=n_side / t_side)
        # Jitter interior source nodes: windows must straddle device
        # block boundaries so the exchange is actually exercised.
        rng = np.random.default_rng(11)
        jitter = rng.uniform(-0.2, 0.2, sverts.shape)
        edge = (
            (sverts[:, 0] == 0)
            | (sverts[:, 1] == 0)
            | (sverts[:, 0] == n_side)
            | (sverts[:, 1] == n_side)
        )
        jitter[edge] = 0.0
        sverts = sverts + jitter
        source_grid = xu.Ugrid2d(sverts[:, 0], sverts[:, 1], -1, sfaces)
        target_grid = xu.Ugrid2d(tverts[:, 0], tverts[:, 1], -1, tfaces)
        si, ti, w = UnstructuredGrid2d(source_grid).overlap(
            UnstructuredGrid2d(target_grid), relative=False
        )
        # Hilbert-order BOTH sides so device blocks align spatially.
        sorder = partition_order(source_grid.centroids)
        torder = partition_order(target_grid.centroids)
        sremap = np.empty(len(sorder), np.int64)
        sremap[sorder] = np.arange(len(sorder))
        tremap = np.empty(len(torder), np.int64)
        tremap[torder] = np.arange(len(torder))
        csr = MatrixCSR.from_triplet(
            tremap[ti], sremap[si], w,
            n=target_grid.n_face, m=source_grid.n_face,
        )
        padded = PaddedCSR.from_csr(csr, dtype=np.float32)
        field = np.sin(source_grid.centroids[sorder, 0]).astype(np.float32)
        return padded, field

    def test_halo_regrid_matches_allgather(self):
        padded, field = self._overlap_problem()
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("x",))
        halo = ShardedRegrid(mesh, padded, method="halo")
        full = ShardedRegrid(mesh, padded, method="allgather")
        out_halo = halo.gather(halo(field))
        out_full = full.gather(full(field))
        assert halo.method == "halo" and halo.plan is not None
        assert halo.plan.n_unique_remote > 0  # exchange actually exercised
        assert full.method == "allgather"
        np.testing.assert_allclose(out_halo, out_full, rtol=1e-6)

    def test_auto_picks_halo_when_aligned(self):
        padded, field = self._overlap_problem(n_side=64, t_side=16)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("x",))
        plan = ShardedRegrid(mesh, padded, method="auto")
        # Spatially aligned blocks: the exchange payload must be far
        # below a full gather of the source field.
        assert plan.method == "halo"
        assert plan.exchanged_bytes < plan.m_padded * 4
        out = plan.gather(plan(field))
        assert np.isfinite(out).all()

    def test_auto_falls_back_on_scattered_refs(self):
        rng = np.random.default_rng(3)
        n_target, m, w = 64, 4096, 6
        rows = np.repeat(np.arange(n_target), w)
        cols = rng.integers(0, m, n_target * w)  # no locality at all
        weights = rng.uniform(0.5, 1.5, n_target * w)
        csr = MatrixCSR.from_triplet(rows, cols, weights, n=n_target, m=m)
        padded = PaddedCSR.from_csr(csr)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("x",))
        plan = ShardedRegrid(mesh, padded, method="auto")
        source = rng.normal(size=m)
        out = plan.gather(plan(source))
        expected = ShardedRegrid(mesh, padded, method="allgather")
        np.testing.assert_allclose(
            out, expected.gather(expected(source)), rtol=1e-12
        )

    def test_bad_regrid_method(self):
        padded, _ = self._overlap_problem(8, 4)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("x",))
        with pytest.raises(ValueError, match="method"):
            ShardedRegrid(mesh, padded, method="bogus")

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
@requires_8_devices
class TestShardedCG:
    def _system(self, nx=24, ny=18, seed=0):
        # Laplacian + identity over a raster adjacency: SPD, windowed.
        import scipy.sparse as sp

        idx = np.arange(nx * ny).reshape(ny, nx)
        pairs = np.concatenate([
            np.column_stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()]),
            np.column_stack([idx[:-1, :].ravel(), idx[1:, :].ravel()]),
        ])
        i = np.concatenate([pairs[:, 0], pairs[:, 1]])
        j = np.concatenate([pairs[:, 1], pairs[:, 0]])
        n = nx * ny
        W = sp.coo_matrix((np.ones(len(i)), (i, j)), shape=(n, n)).tocsr()
        deg = np.asarray(W.sum(axis=1)).ravel()
        rng = np.random.default_rng(seed)
        b = rng.normal(size=n)
        # Windowed off-diagonal layout: (n, w_max) global indices, -1 pad.
        w_max = int(np.diff(W.indptr).max())
        indices = np.full((n, w_max), -1, np.int64)
        weights = np.zeros((n, w_max), np.float64)
        for r in range(n):
            sl = slice(W.indptr[r], W.indptr[r + 1])
            k = sl.stop - sl.start
            indices[r, :k] = W.indices[sl]
            weights[r, :k] = -W.data[sl]
        diag = deg + 1.0  # Laplacian + I
        A = sp.diags(diag) - W
        return indices, weights, diag, b, A

    def test_matches_scipy(self):
        from scipy.sparse.linalg import spsolve

        from xugrid_tpu.parallel import sharded_cg_solve

        indices, weights, diag, b, A = self._system()
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("x",))
        x, k = sharded_cg_solve(
            mesh, indices, weights, diag, b, atol=1e-10, maxiter=2000
        )
        expected = spsolve(A.tocsr(), b)
        assert 0 < k < 2000
        np.testing.assert_allclose(x, expected, rtol=1e-6, atol=1e-8)

    def test_moves_only_boundary_rows(self):
        # Row-contiguous partitions of a raster: the exchange volume per
        # matvec must be far below a full all_gather of the field.
        from xugrid_tpu.parallel import NeighborExchangePlan

        indices, weights, diag, b, A = self._system(nx=40, ny=40)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("x",))
        plan = NeighborExchangePlan(mesh, indices)
        allgather_bytes = 8 * len(b) * 4
        assert plan.exchanged_bytes_f32 < allgather_bytes / 4


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

    def test_vectorized_plan_matches_bruteforce(self):
        """The sort/group-by dedup reproduces a reference dict-loop plan."""
        from xugrid_tpu.parallel import NeighborExchangePlan

        rng = np.random.default_rng(7)
        n_devices = 8
        n, m, k = 96, 64, 5
        idx = rng.integers(-1, m, (n, k)).astype(np.int64)
        mesh = Mesh(np.array(jax.devices()[:n_devices]), ("x",))
        plan = NeighborExchangePlan(mesh, idx, source_size=m)

        block = -(-m // n_devices)
        req_block = -(-n // n_devices)
        lookup = np.asarray(plan.lookup)
        send = np.asarray(plan.send_slots).reshape(n_devices, n_devices, -1)
        # Emulate the runtime: extended = [local | recv], check every
        # reference resolves to the right global source row.
        for d in range(n_devices):
            rows = slice(d * req_block, (d + 1) * req_block)
            for rr, cc in zip(*np.nonzero(idx[: min(n, (d + 1) * req_block)][rows] >= 0)):
                g = idx[rows][rr, cc]
                lk = lookup[rows][rr, cc]
                if lk < block:  # local
                    assert g // block == d and g % block == lk
                else:  # remote: recv[o * R + p] = owner o's p-th row
                    o, p = divmod(lk - block, plan.R)
                    assert g // block == o
                    assert send[o, d, p] == g % block

    def test_plan_source_size_decoupled(self):
        """Requester rows may index a differently-sized source array."""
        from xugrid_tpu.parallel import NeighborExchangePlan

        mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
        idx = np.array([[0, 15], [8, -1], [3, 12]], dtype=np.int64)
        plan = NeighborExchangePlan(mesh, idx, source_size=16)
        assert plan.m == 16
        assert plan.block == 2
        assert plan.req_block == 1  # 3 rows padded over 8 devices

    def test_bad_method(self):
        from xugrid_tpu.parallel import sharded_laplace_smooth

        mesh, neighbors, values = self._mesh_and_adjacency()
        with pytest.raises(ValueError, match="halo"):
            sharded_laplace_smooth(mesh, neighbors, values, method="bogus")


@requires_8_devices
def test_sharded_from_regridder():
    """The public bridge: a built OverlapRegridder sharded over a mesh
    reproduces the single-device regrid."""
    import xugrid_tpu as xu
    from xugrid_tpu.xdata import DataArray

    def quads(ns, dx=1.0):
        x = np.arange(ns + 1.0) * dx
        yy, xx = np.meshgrid(x, x, indexing="ij")
        verts = np.column_stack([xx.ravel(), yy.ravel()])
        j, i = np.meshgrid(np.arange(ns), np.arange(ns), indexing="ij")
        nid = lambda ii, jj: jj * (ns + 1) + ii  # noqa: E731
        return verts, np.stack(
            [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)], -1
        ).reshape(-1, 4)

    sv, sf = quads(16)
    grid = xu.Ugrid2d(sv[:, 0], sv[:, 1], -1, sf)
    rng = np.random.default_rng(0)
    vals = rng.normal(size=grid.n_face)
    src = xu.UgridDataArray(
        DataArray(vals, dims=(grid.face_dimension,), name="v"), grid
    )
    tv, tf = quads(4, dx=4.0)
    target = xu.UgridDataArray.from_data(
        np.zeros(16), xu.Ugrid2d(tv[:, 0], tv[:, 1], -1, tf), facet="face"
    )
    rg = xu.OverlapRegridder(src, target, method="mean")
    expected = np.asarray(rg.regrid(src).values)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("x",))
    plan = ShardedRegrid.from_regridder(mesh, rg)
    out = plan.gather(plan(vals.astype(np.float32)))
    np.testing.assert_allclose(out, expected, rtol=1e-5)


@requires_8_devices
def test_multi_axis_mesh():
    """Sharding over one axis of a 2-axis mesh uses that axis's size
    (review regression: devices.size broke multi-axis meshes)."""
    padded_field = None
    rng = np.random.default_rng(4)
    n_target, m, w = 32, 256, 4
    rows = np.repeat(np.arange(n_target), w)
    cols = rng.integers(0, m, n_target * w)
    weights = rng.uniform(0.5, 1.5, n_target * w)
    csr = MatrixCSR.from_triplet(rows, cols, weights, n=n_target, m=m)
    padded = PaddedCSR.from_csr(csr)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("x", "y"))
    plan = ShardedRegrid(mesh, padded, axis="x", method="allgather")
    source = rng.normal(size=m)
    out = plan.gather(plan(source))
    expected = np.empty(n_target)
    for t in range(n_target):
        sl = slice(csr.indptr[t], csr.indptr[t + 1])
        v = source[csr.indices[sl]]
        wts = csr.data[sl]
        expected[t] = (v * wts).sum() / wts.sum()
    np.testing.assert_allclose(out, expected, rtol=1e-12)


@requires_8_devices
def test_halo_zero_is_noop():
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from xugrid_tpu.parallel.sharding import halo_exchange

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("x",))
    vals = np.arange(64.0)

    @partial(
        shard_map, mesh=mesh, in_specs=(P("x"),), out_specs=P("x"),
        check_rep=False,
    )
    def f(v):
        return halo_exchange(mesh, "x", v, halo=0)

    out = np.asarray(jax.jit(f)(vals))
    np.testing.assert_array_equal(out, vals)


class TestHilbertLayout:
    """hilbert_layout: fused native PaddedCSR layout == the general
    remap + stable-sort + pad pipeline (exact)."""

    def _triplets(self, rng, n_target, n_source, groups=True):
        counts = rng.integers(0, 7, n_target)
        tindex = np.repeat(np.arange(n_target), counts)
        nnz = len(tindex)
        sindex = rng.integers(0, n_source, nnz)
        w = rng.random(nnz)
        if not groups:
            perm = rng.permutation(nnz)
            tindex, sindex, w = tindex[perm], sindex[perm], w[perm]
        return tindex, sindex, w

    def _reference(self, sc, tc, tindex, sindex, w):
        from xugrid_tpu.parallel import partition_order

        sorder = partition_order(sc)
        torder = partition_order(tc)
        sremap = np.empty(len(sorder), np.int64)
        sremap[sorder] = np.arange(len(sorder))
        tremap = np.empty(len(torder), np.int64)
        tremap[torder] = np.arange(len(torder))
        csr = MatrixCSR.from_triplet(
            tremap[tindex], sremap[sindex], w, n=len(tc), m=len(sc)
        )
        return sorder, torder, PaddedCSR.from_csr(csr, dtype=np.float32)

    @pytest.mark.parametrize("grouped", [True, False])
    def test_matches_general_pipeline(self, grouped):
        from xugrid_tpu.parallel import hilbert_layout

        rng = np.random.default_rng(3)
        n_target, n_source = 500, 800
        sc = rng.random((n_source, 2)) * 50
        tc = rng.random((n_target, 2)) * 50
        tindex, sindex, w = self._triplets(
            rng, n_target, n_source, groups=grouped
        )
        so, to, padded = hilbert_layout(sc, tc, tindex, sindex, w)
        so_r, to_r, ref = self._reference(sc, tc, tindex, sindex, w)
        np.testing.assert_array_equal(so, so_r)
        np.testing.assert_array_equal(to, to_r)
        assert padded.w_max == ref.w_max
        if grouped:
            # Grouped triplets keep within-row entry order exactly.
            np.testing.assert_array_equal(padded.indices, ref.indices)
            np.testing.assert_array_equal(padded.weights, ref.weights)
        else:
            # Ungrouped input falls back to the sort pipeline: rows
            # hold the same entry sets (order is sort-stability
            # defined either way).
            for r in range(n_target):
                got = sorted(zip(padded.indices[r], padded.weights[r]))
                want = sorted(zip(ref.indices[r], ref.weights[r]))
                assert got == want

    def test_empty_rows_and_single_entry(self):
        from xugrid_tpu.parallel import hilbert_layout

        sc = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.5]])
        tc = np.array([[0.5, 0.5], [1.5, 0.5]])
        tindex = np.array([1])
        sindex = np.array([2])
        w = np.array([0.7])
        so, to, padded = hilbert_layout(sc, tc, tindex, sindex, w)
        assert padded.n == 2 and padded.m == 3
        sremap = np.empty(3, np.int64)
        sremap[so] = np.arange(3)
        row = int(np.where(to == 1)[0][0])
        assert padded.indices[row, 0] == sremap[2]
        assert padded.weights[row, 0] == np.float32(0.7)
        other = 1 - row
        assert (padded.indices[other] == -1).all()
