"""
Scale demo: sharded overlap-regrid apply on 8 virtual devices.

Validates the scalable halo path (VERDICT r1 item 4): builds the
BASELINE north-star mesh (default 10M faces; SCALE_SMALL=1 for 1M),
computes real overlap weights, Hilbert-orders both sides, and runs the
ShardedRegrid halo apply over an 8-device mesh — measuring the ICI
payload of the halo all_to_all against a full source all_gather and
checking the results agree.

Run:  python scripts/sharded_scale_demo.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

from __graft_entry__ import _ensure_devices, _quad_mesh  # noqa: E402

jax = _ensure_devices(8)

from jax.sharding import Mesh  # noqa: E402

import xugrid_tpu as xu  # noqa: E402
from xugrid_tpu.parallel import ShardedRegrid, hilbert_layout  # noqa: E402
from xugrid_tpu.regrid.unstructured import UnstructuredGrid2d  # noqa: E402


def main():
    if os.environ.get("SCALE_SMALL") == "1":
        n_side, t_side = 1000, 512
    else:
        n_side, t_side = 3163, 1024  # BASELINE.json north-star config

    rng = np.random.default_rng(42)
    verts, faces = _quad_mesh(n_side, n_side)
    # Jitter interior nodes (same recipe as bench.py): overlap windows
    # must straddle device block boundaries for a non-trivial exchange.
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
    tverts, tfaces = _quad_mesh(t_side, t_side, dx=n_side / t_side)
    target = xu.Ugrid2d(tverts[:, 0], tverts[:, 1], -1, tfaces)

    t0 = time.perf_counter()
    si = UnstructuredGrid2d(grid)
    ti = UnstructuredGrid2d(target)
    source_index, target_index, w = si.overlap(ti, relative=False)
    build_s = time.perf_counter() - t0

    # Hilbert-order both sides: device blocks become spatially compact
    # and aligned, so remote references are a perimeter fraction.  The
    # fused native layout builder writes padded rows directly in
    # Hilbert order (no 18M-triplet sort/remap/scatter passes).
    t0 = time.perf_counter()
    sorder, torder, padded = hilbert_layout(
        grid.centroids, target.centroids, target_index, source_index, w
    )
    layout_s = time.perf_counter() - t0
    nnz = int((padded.indices >= 0).sum())

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("faces",))
    t0 = time.perf_counter()
    halo = ShardedRegrid(mesh, padded, method="auto")
    plan_s = time.perf_counter() - t0
    assert halo.method == "halo", (
        f"auto did not pick halo (R={halo.plan.R if halo.plan else None})"
    )

    field = np.sin(grid.centroids[sorder, 0]).astype(np.float32)
    out_halo = halo.gather(halo(field))
    t0 = time.perf_counter()
    out_halo = halo.gather(halo(field))
    halo_apply_s = time.perf_counter() - t0

    full = ShardedRegrid(mesh, padded, method="allgather")
    out_full = full.gather(full(field))
    assert np.allclose(out_halo, out_full, rtol=1e-5, atol=1e-6, equal_nan=True)

    # O(perimeter) check: rows exchanged vs one device block of sources.
    block = halo.plan.block
    perimeterish = 8 * 2 * int(np.sqrt(block))  # 8 blocks x ~2 boundary rows
    print(json.dumps({
        "n_source_faces": grid.n_face,
        "n_target_faces": target.n_face,
        "nnz": nnz,
        "weight_build_s": round(build_s, 2),
        "layout_s": round(layout_s, 2),
        "plan_build_s": round(plan_s, 2),
        "halo_apply_s": round(halo_apply_s, 4),
        "method": halo.method,
        "exchanged_bytes_halo": int(halo.exchanged_bytes),
        "exchanged_bytes_allgather": int(full.exchanged_bytes),
        "reduction_factor": round(
            full.exchanged_bytes / halo.exchanged_bytes, 1
        ),
        "unique_remote_rows": halo.plan.n_unique_remote,
        "block_rows_per_device": block,
        "perimeter_rows_scale": perimeterish,
    }))


if __name__ == "__main__":
    main()
