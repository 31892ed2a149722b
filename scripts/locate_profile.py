"""Profile the fused native locate_points at the 10M-face scale.

VERDICT r5 item 5: 10M locate runs at 3.31M q/s vs 6.8M at 1M faces.
This reproduces the BENCH_XL locate workload (1M queries on the
10M-face jittered quad mesh) with XUGRID_NATIVE_PROF=1 phase timing
(bin_pass / counting_sort / query_scan) to find the cliff.

Run:  XUGRID_NATIVE_PROF=1 python scripts/locate_profile.py
Knobs: SIDE=3163 (mesh side), NQ=1000000 (queries)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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


def main():
    import xugrid_tpu as xu

    n_side = int(os.environ.get("SIDE", "3163"))
    n_points = int(os.environ.get("NQ", "1000000"))
    rng = np.random.default_rng(42)
    t0 = time.perf_counter()
    verts, faces = quad_mesh(n_side, n_side)
    jitter = rng.uniform(-0.15, 0.15, verts.shape)
    edge = (
        (verts[:, 0] == 0)
        | (verts[:, 1] == 0)
        | (verts[:, 0] == n_side)
        | (verts[:, 1] == n_side)
    )
    jitter[edge] = 0.0
    verts = verts + jitter
    grid = xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces)
    print(f"mesh: {grid.n_face} faces {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    tree = grid.celltree
    tree.locate_points(np.array([[0.5, 0.5]]))  # force builds
    print(f"tree: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    gh = tree.grid_hash
    print(
        f"hash: nx={gh.nx} ny={gh.ny} cells={gh.nx*gh.ny} "
        f"prims={len(gh.bin_prims)} oversize={len(gh.oversize)}",
        file=sys.stderr,
    )

    pts = rng.uniform(0.5, n_side - 0.5, (n_points, 2))
    best = np.inf
    for rep in range(5):
        t0 = time.perf_counter()
        found = tree.locate_points(pts)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"rep {rep}: {dt:.3f}s  {n_points/dt/1e6:.2f}M q/s",
              file=sys.stderr)
    hit = float((found >= 0).mean())
    print(
        f"BEST {best:.3f}s {n_points/best/1e6:.2f}M q/s hit={hit:.4f}"
    )


if __name__ == "__main__":
    main()
