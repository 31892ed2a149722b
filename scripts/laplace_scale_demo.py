"""
Scale demo: 1M-node Laplace-CG fill (VERDICT r1 item 7).

Builds a ~1M-node triangulated mesh (the xoxo workload scaled up),
knocks out 98% of the node values, and solves the Laplace fill with the
Chebyshev-Jacobi PCG at several polynomial degrees — recording
iteration counts, wall time, and effective nodes/s.

Run:  python scripts/laplace_scale_demo.py          (defaults to CPU x64)
      LAPLACE_TPU=1 python scripts/laplace_scale_demo.py   (f32 on TPU)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax  # noqa: E402

if os.environ.get("LAPLACE_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import xugrid_tpu as xu  # noqa: E402
from xugrid_tpu.ugrid import interpolate  # noqa: E402


def build_grid(kind: str, n_side: int):
    if kind == "delaunay":
        # Genuinely unstructured: random points, scipy Delaunay, node
        # order shuffled so no incidental bandedness survives — the
        # solver must earn its locality (RCM) itself.
        from scipy.spatial import Delaunay

        rng = np.random.default_rng(11)
        n_pts = (n_side + 1) ** 2
        pts = rng.uniform(0.0, 100.0, (n_pts, 2))
        tri = Delaunay(pts)
        perm = rng.permutation(n_pts)
        inv = np.empty(n_pts, np.int64)
        inv[perm] = np.arange(n_pts)
        shuffled = pts[perm]
        faces = inv[tri.simplices]
        return xu.Ugrid2d(shuffled[:, 0], shuffled[:, 1], -1, faces)
    x = np.linspace(0.0, 100.0, n_side + 1)
    quad = xu.Ugrid2d.from_structured_intervals1d(x, x)
    return quad.triangulate()


def main():
    n_side = int(os.environ.get("LAPLACE_SIDE", "1000"))
    mesh_kind = os.environ.get("LAPLACE_MESH", "structured")
    grid = build_grid(mesh_kind, n_side)
    n = grid.n_node
    W = grid.node_node_connectivity.astype(np.float64)
    W.data = np.ones_like(W.data, dtype=np.float64)

    rng = np.random.default_rng(7)
    truth = (
        np.sin(grid.node_x / 17.0) * np.cos(grid.node_y / 23.0) * 10.0 + 5.0
    )
    known = rng.random(n) < 0.02
    vals = np.where(known, truth, np.nan)

    results = {}
    for degree in (1, 4):
        interpolate.laplace_interpolate(  # warm the compile
            vals, W, maxiter=2000, atol=1e-6, rtol=0.0,
            precondition_degree=degree,
        )
        t0 = time.perf_counter()
        out = interpolate.laplace_interpolate(
            vals, W, maxiter=2000, atol=1e-6, rtol=0.0,
            precondition_degree=degree,
        )
        dt = time.perf_counter() - t0
        info = dict(interpolate.last_solve_info)
        err = float(np.nanmax(np.abs(out - truth)))
        results[f"degree_{degree}"] = {
            "solve_s": round(dt, 3),
            "iterations": info["iterations"],
            "nodes_per_s": round(info["n_unknown"] / dt, 1),
            "max_err_vs_truth": round(err, 4),
            "mode": info.get("mode"),
            "matvec_plan": info.get("matvec_plan"),
        }
        assert np.isfinite(out).all()

    # Multi-RHS amortization: 20 time slices sharing one NaN pattern
    # batch on the sublane axis and reuse plan + assembly — one solve.
    if os.environ.get("LAPLACE_MULTI_RHS") == "1":
        n_extra = 20
        scales = 1.0 + 0.05 * np.arange(n_extra)
        stack = np.where(known[None, :], truth[None, :] * scales[:, None],
                         np.nan)
        interpolate.laplace_interpolate(  # warm
            stack, W, maxiter=2000, atol=1e-6, rtol=0.0,
            precondition_degree=4,
        )
        t0 = time.perf_counter()
        out = interpolate.laplace_interpolate(
            stack, W, maxiter=2000, atol=1e-6, rtol=0.0,
            precondition_degree=4,
        )
        dt = time.perf_counter() - t0
        assert np.isfinite(out).all()
        single = results["degree_4"]["solve_s"]
        results["multi_rhs_20"] = {
            "solve_s": round(dt, 3),
            "slices": n_extra,
            "s_per_slice": round(dt / n_extra, 4),
            "amortization_vs_single_x20": round(single * n_extra / dt, 2),
        }

    print(json.dumps({
        "mesh": mesh_kind,
        "n_node": int(n),
        "n_unknown": int((~known).sum()),
        "device": str(jax.devices()[0]),
        **results,
    }))


if __name__ == "__main__":
    main()
