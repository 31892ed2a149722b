"""
Benchmark: 1M-face overlap regrid (weight build + apply) and celltree
point location, per BASELINE.json.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

The primary metric is the regrid apply throughput (effective GB/s of
weight/value traffic through the windowed apply kernel).  vs_baseline is
measured against a scipy CSR matvec on the host CPU — the same
C-compiled sparse apply the reference's numba loop approximates.

Environment: runs on whatever jax.devices() provides (the driver runs it
on one real TPU chip).  Set BENCH_SMALL=1 for a quick local sanity run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache"),
)

SMALL = os.environ.get("BENCH_SMALL") == "1"


def quad_mesh(nx, ny, dx=1.0):
    x = np.arange(nx + 1.0) * dx
    y = np.arange(ny + 1.0) * dx
    yy, xx = np.meshgrid(y, x, indexing="ij")
    verts = np.column_stack([xx.ravel(), yy.ravel()])
    j, i = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    nid = lambda ii, jj: jj * (nx + 1) + ii  # noqa: E731
    faces = np.stack(
        [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)], axis=-1
    ).reshape(-1, 4)
    return verts, faces


def main():
    import xugrid_tpu as xu
    from xugrid_tpu.core.sparse import MatrixCSR, PaddedCSR
    from xugrid_tpu.regrid import reduce as reductions
    from xugrid_tpu.regrid.apply import _apply_windowed_T, _pad_minor

    if SMALL:
        n_side, t_side, n_extra, n_points = 100, 64, 4, 4096
    elif os.environ.get("BENCH_XL") == "1":
        # BASELINE.json north star: 10M-face mesh, national-scale raster.
        n_side, t_side, n_extra, n_points = 3163, 1024, 20, 1_000_000
    else:
        n_side, t_side, n_extra, n_points = 1000, 512, 20, 1_000_000

    rng = np.random.default_rng(42)

    # --- source mesh: n_side^2 quads, jittered interior nodes ----------
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
    mesh_build_s = time.perf_counter() - t0

    # --- weight build: overlap with a t_side^2 raster -------------------
    dx = n_side / t_side
    tx = np.arange(t_side + 1.0) * dx
    tverts, tfaces = quad_mesh(t_side, t_side, dx=dx)
    target = xu.Ugrid2d(tverts[:, 0], tverts[:, 1], -1, tfaces)

    t0 = time.perf_counter()
    tree = grid.celltree  # BVH build
    bvh_build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    ti, si, areas = tree.intersect_faces(
        target.node_coordinates, target.face_node_connectivity, -1
    )
    weight_build_s = time.perf_counter() - t0
    csr = MatrixCSR.from_triplet(ti, si, areas, n=target.n_face, m=grid.n_face)
    padded = PaddedCSR.from_csr(csr, dtype=np.float32)

    # --- apply: n_extra time slices, steady state -----------------------
    # Slice-minor layout: the extra dimension on the lane axis so every
    # gather fetches a contiguous row (see regrid/apply.py).
    source = rng.normal(size=(n_extra, grid.n_face)).astype(np.float32)
    E = _pad_minor(n_extra)
    sourceT = np.zeros((grid.n_face, E), dtype=np.float32)
    sourceT[:, :n_extra] = source.T
    src_d = jnp.asarray(sourceT)

    # Chunk the target dimension so the (n, w, E) gather intermediate
    # stays within HBM at the 10M-face scale.
    n_chunks = max(1, -(-padded.n * padded.w_max * E // 200_000_000))
    rows = -(-padded.n // n_chunks)
    n_pad_rows = n_chunks * rows
    idx_p = np.full((n_pad_rows, padded.w_max), -1, padded.indices.dtype)
    idx_p[: padded.n] = padded.indices
    w_p = np.zeros((n_pad_rows, padded.w_max), padded.weights.dtype)
    w_p[: padded.n] = padded.weights
    idx_d = jnp.asarray(idx_p.reshape(n_chunks, rows, padded.w_max))
    w_d = jnp.asarray(w_p.reshape(n_chunks, rows, padded.w_max))

    # Loop the passes inside one jit call: the remote-relay round trip
    # (~100ms) would otherwise dominate per-pass timing.
    reps = 5 if SMALL else 10
    from functools import partial

    @partial(jax.jit, static_argnums=(3, 4))
    def apply_reps(srcT, idx, w, reduction, n_reps):
        def body(i, acc):
            # Perturb the input per iteration to defeat loop-invariant
            # hoisting of the apply.
            perturbed = srcT + i.astype(srcT.dtype) * 1e-12

            def chunk_body(c, acc2):
                out = _apply_windowed_T(
                    perturbed, idx[c], w[c], reduction
                )
                return acc2 + jnp.nansum(out)

            return jax.lax.fori_loop(0, idx.shape[0], chunk_body, acc)

        return jax.lax.fori_loop(0, n_reps, body, jnp.float32(0.0))

    checksum = float(apply_reps(src_d, idx_d, w_d, reductions.mean, reps))
    t0 = time.perf_counter()
    checksum = float(apply_reps(src_d, idx_d, w_d, reductions.mean, reps))
    apply_s = (time.perf_counter() - t0) / reps

    # effective traffic: gathered values + weights + indices + output
    nnz_padded = padded.n * padded.w_max
    bytes_per_slice = nnz_padded * (4 + 4 + 4) + padded.n * 4
    apply_gbps = n_extra * bytes_per_slice / apply_s / 1e9

    # --- Pallas tiled apply (one-hot MXU matmul over VMEM slabs) --------
    pallas_apply_s = None
    try:
        from xugrid_tpu.regrid.pallas_apply import (
            SUB,
            pallas_windowed_mean,
            plan_auto,
        )

        plan = plan_auto(padded.indices)
        if plan is not None and jax.default_backend() == "tpu":
            starts, n_subs, w_counts = plan
            block = 512
            n_blocks = len(starts)
            n_pad = n_blocks * block
            idx_p = np.full((n_pad, padded.w_max), -1, np.int32)
            idx_p[: padded.n] = padded.indices
            w_p = np.zeros((n_pad, padded.w_max), np.float32)
            w_p[: padded.n] = padded.weights
            E_pad = 128
            ends = starts.astype(np.int64) + n_subs.astype(np.int64) * SUB
            m_needed = max(grid.n_face, int(ends.max()))
            srcT_p = np.zeros((m_needed, E_pad), np.float32)
            srcT_p[: grid.n_face, :n_extra] = source.T

            @partial(jax.jit, static_argnums=(6, 7))
            def pallas_reps(srcT, idx, w, st, ns, wc, blk, n_reps):
                def body(i, acc):
                    out = pallas_windowed_mean(
                        srcT + i.astype(srcT.dtype) * 1e-12,
                        idx, w, st, ns, wc, blk,
                    )
                    return acc + jnp.nansum(out)

                return jax.lax.fori_loop(0, n_reps, body, jnp.float32(0.0))

            dsrc = jnp.asarray(srcT_p)
            didx = jnp.asarray(idx_p)
            dw = jnp.asarray(w_p)
            dst = jnp.asarray(starts)
            dns = jnp.asarray(n_subs)
            dwc = jnp.asarray(w_counts)
            _ = float(pallas_reps(dsrc, didx, dw, dst, dns, dwc, block, reps))
            t0 = time.perf_counter()
            _ = float(pallas_reps(dsrc, didx, dw, dst, dns, dwc, block, reps))
            pallas_apply_s = (time.perf_counter() - t0) / reps
    except Exception as exc:  # pragma: no cover - perf fallback only
        print(f"pallas path unavailable: {exc!r}", file=sys.stderr)

    best_apply_s = apply_s
    if pallas_apply_s is not None and pallas_apply_s < apply_s:
        best_apply_s = pallas_apply_s
    apply_gbps = n_extra * bytes_per_slice / best_apply_s / 1e9

    # --- celltree locate throughput -------------------------------------
    # Free the apply's device buffers first: at the 10M-face scale the
    # (m, 128) f32 source slab is ~5 GB of HBM and the locate kernels
    # need headroom.
    import gc

    del src_d, idx_d, w_d
    try:
        del dsrc, didx, dw, dst, dns
    except NameError:
        pass
    gc.collect()

    pts = rng.uniform(0.5, n_side - 0.5, (n_points, 2))
    found = tree.locate_points(pts)  # compile + warm
    t0 = time.perf_counter()
    found = tree.locate_points(pts)
    locate_s = time.perf_counter() - t0
    locate_qps = n_points / locate_s
    hit_rate = float((found >= 0).mean())

    # --- host CPU baseline: scipy CSR matvec (the C-speed equivalent of
    # the reference's numba apply loop) ----------------------------------
    import scipy.sparse

    W = scipy.sparse.csr_matrix(
        (csr.data, csr.indices, csr.indptr), shape=(csr.n, csr.m)
    ).astype(np.float32)
    wsum = np.asarray(W.sum(axis=1)).ravel()
    wsum[wsum == 0] = 1.0
    src64 = source
    _ = W @ src64[0]  # warm
    t0 = time.perf_counter()
    for k in range(n_extra):
        _ = (W @ src64[k]) / wsum
    cpu_apply_s = time.perf_counter() - t0
    cpu_bytes = n_extra * (csr.nnz * (4 + 4 + 4) + csr.n * 4)
    cpu_gbps = cpu_bytes / cpu_apply_s / 1e9

    result = {
        "metric": f"{grid.n_face}-face overlap regrid apply throughput",
        "value": round(apply_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(apply_gbps / cpu_gbps, 3),
        "weight_build_s": round(weight_build_s, 3),
        "bvh_build_s": round(bvh_build_s, 3),
        "apply_s_per_pass": round(apply_s, 4),
        "pallas_apply_s_per_pass": (
            round(pallas_apply_s, 4) if pallas_apply_s is not None else None
        ),
        "cpu_csr_gbps": round(cpu_gbps, 3),
        "locate_queries_per_s": round(locate_qps, 1),
        "locate_hit_rate": round(hit_rate, 4),
        "nnz": int(csr.nnz),
        "n_extra": n_extra,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
