"""Shared helpers for the on-chip aligned-engine sweeps.

Extracted from the (deleted) super_sweep.py so qp_sweep.py and future
sweeps keep a single copy of the 1M bench-config weight build and the
two-point slope timer (cancels the ~26-31 ms remote-tunnel dispatch
cost per call; see bench.py for the same method).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache"),
)

N_SIDE = int(os.environ.get("N_SIDE", "1000"))
T_SIDE = int(os.environ.get("T_SIDE", "512"))
REPS_LO, REPS_HI = 20, 100


def quad_mesh(nx, ny, dx=1.0):
    x = np.arange(nx + 1.0) * dx
    y = np.arange(ny + 1.0) * dx
    yy, xx = np.meshgrid(y, x, indexing="ij")
    verts = np.column_stack([xx.ravel(), yy.ravel()])
    j, i = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    nid = lambda ii, jj: jj * (nx + 1) + ii  # noqa: E731
    faces = np.stack(
        [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)],
        axis=-1,
    ).reshape(-1, 4)
    return verts, faces


def build_weights():
    import xugrid_tpu as xu
    from xugrid_tpu.core.sparse import MatrixCSR, PaddedCSR

    rng = np.random.default_rng(42)
    verts, faces = quad_mesh(N_SIDE, N_SIDE)
    jitter = rng.uniform(-0.15, 0.15, verts.shape)
    edge = (
        (verts[:, 0] == 0)
        | (verts[:, 1] == 0)
        | (verts[:, 0] == N_SIDE)
        | (verts[:, 1] == N_SIDE)
    )
    jitter[edge] = 0.0
    verts = verts + jitter
    grid = xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces)
    dx = N_SIDE / T_SIDE
    tverts, tfaces = quad_mesh(T_SIDE, T_SIDE, dx=dx)
    target = xu.Ugrid2d(tverts[:, 0], tverts[:, 1], -1, tfaces)
    ti, si, areas = grid.celltree.intersect_faces(
        target.node_coordinates, target.face_node_connectivity, -1
    )
    csr = MatrixCSR.from_triplet(
        ti, si, areas, n=target.n_face, m=grid.n_face
    )
    padded = PaddedCSR.from_csr(csr, dtype=np.float32)
    return grid, target, csr, padded


def slope_time(call):
    call(REPS_LO)
    t_lo = t_hi = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        call(REPS_LO)
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        call(REPS_HI)
        t_hi = min(t_hi, time.perf_counter() - t0)
    return max((t_hi - t_lo) / (REPS_HI - REPS_LO), 1e-9)
