"""
Benchmark: 1M-face overlap regrid (weight build + apply) and celltree
point location, per BASELINE.json.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

The primary metric is the regrid apply throughput in **true** GB/s: the
minimal traffic a perfect kernel must move (window indices + weights
once, the source field once, the output once — no padding, no one-hot
expansion, no re-streamed overlap).  ``hbm_sol_pct`` relates it to the
~819 GB/s HBM bandwidth of one v5e chip.  ``vs_baseline`` compares
against a scipy CSR matvec on the local host CPU — a 1-vCPU proxy for
(not a measurement of) the reference's multithreaded numba apply; see
the ``baseline_note`` field.

Environment: runs on whatever jax.devices() provides (the driver runs it
on one real TPU chip).  Set BENCH_SMALL=1 for a quick local sanity run,
BENCH_XL=1 for the 10M-face north-star config.
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

if os.environ.get("BENCH_CPU") == "1":
    # The axon sitecustomize pins the platform before env vars are
    # read; jax.config is the only way to force CPU post-import.
    jax.config.update("jax_platforms", "cpu")

SMALL = os.environ.get("BENCH_SMALL") == "1"
XL = os.environ.get("BENCH_XL") == "1"


def best_of(fn, n=2):
    """Run ``fn`` ``n`` times, return (best_seconds, last_result).

    The bench host has 1 vCPU with heavy steal-time noise (2-4x swings);
    the min over a couple of runs is the stable measure of host phases.
    """
    best = np.inf
    out = None
    for _ in range(1 if SMALL else n):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out

#: HBM bandwidth of one v5e chip (speed-of-light reference).
HBM_GBPS = 819.0

#: Two-point rep counts for the slope timer.  Low/high must share ONE
#: compiled executable (n_reps is a dynamic fori_loop bound), so the
#: ~25-30 ms per-dispatch fixed cost F (remote-tunnel RTT + dispatch +
#: scalar fetch; measured round 4 via a REPS sweep: 4.83 ms/pass at
#: reps=10 vs a 2.0 ms true slope) cancels exactly:
#:   per_pass = (T_hi - T_lo) / (hi - lo).
REPS_LO, REPS_HI = (2, 8) if SMALL else ((10, 40) if XL else (20, 100))


def slope_time(call):
    """Per-pass seconds via the two-point slope estimator.

    ``call(n_reps)`` must run n_reps passes inside ONE jit dispatch and
    block on the result; n_reps must be a dynamic (non-static) argument
    so both points share one executable.  Returns
    (per_pass_s, dispatch_overhead_s); each point is best-of-2 against
    the 1-vCPU host's steal-time noise.
    """
    call(REPS_LO)  # compile + warm
    t_lo = t_hi = np.inf
    for _ in range(1 if SMALL else 2):
        t0 = time.perf_counter()
        call(REPS_LO)
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        call(REPS_HI)
        t_hi = min(t_hi, time.perf_counter() - t0)
    p = (t_hi - t_lo) / (REPS_HI - REPS_LO)
    return max(p, 1e-9), max(t_lo - REPS_LO * p, 0.0)


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


def _host_calibration():
    """Memcpy GB/s + random-access ns, measured BEFORE any big
    allocations: bench hosts get swapped between rounds and their
    memory subsystems differ up to ~5x (measured 2026-08-20: 1.7 vs
    ~8 GB/s memcpy, 379 vs ~90 ns random access).  Every host-bound
    number (merge, locate, bvh build, weight build, cpu_csr baseline)
    scales with these; recording them lets cross-round artifact
    comparisons normalize instead of reading phantom regressions.
    The vCPU is credit-throttled in BURSTS (measured 2026-08-20: the
    same memcpy varies 0.03-1.7 GB/s within a minute), so single-shot
    numbers are meaningless: report the BEST of several short trials
    (the unthrottled capability) plus the median (what a long run
    actually experiences)."""
    cal = np.arange(12_500_000, dtype=np.int64)   # 100 MB
    ridx = np.random.default_rng(0).integers(0, len(cal), 1_000_000)
    copies, gathers = [], []
    for _ in range(6):
        t0 = time.perf_counter()
        _ = cal.copy()
        copies.append(cal.nbytes / (time.perf_counter() - t0) / 1e9)
        t0 = time.perf_counter()
        _ = cal[ridx]
        gathers.append((time.perf_counter() - t0) / len(ridx) * 1e9)
    return (
        round(max(copies), 2), round(float(np.median(copies)), 2),
        round(min(gathers), 1), round(float(np.median(gathers)), 1),
    )


def main():
    (host_memcpy_best, host_memcpy_med,
     host_gather_best, host_gather_med) = _host_calibration()
    import xugrid_tpu as xu
    from xugrid_tpu.core.sparse import MatrixCSR, PaddedCSR
    from xugrid_tpu.regrid import reduce as reductions
    from xugrid_tpu.regrid.apply import _apply_windowed_T, _pad_minor

    if SMALL:
        n_side, t_side, n_extra, n_points = 100, 64, 4, 4096
    elif XL:
        # BASELINE.json north star: 10M-face mesh, national-scale raster.
        n_side, t_side, n_extra, n_points = 3163, 1024, 20, 1_000_000
    else:
        n_side, t_side, n_extra, n_points = 1000, 512, 20, 1_000_000

    rng = np.random.default_rng(42)

    # --- source mesh: n_side^2 quads, jittered interior nodes ----------
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

    # --- weight build: overlap with a t_side^2 raster -------------------
    dx = n_side / t_side
    tverts, tfaces = quad_mesh(t_side, t_side, dx=dx)
    target = xu.Ugrid2d(tverts[:, 0], tverts[:, 1], -1, tfaces)

    def build_tree():
        grid._celltree = None
        return grid.celltree

    bvh_build_s, tree = best_of(build_tree)

    weight_build_s, (ti, si, areas) = best_of(
        lambda: tree.intersect_faces(
            target.node_coordinates, target.face_node_connectivity, -1
        )
    )
    csr = MatrixCSR.from_triplet(ti, si, areas, n=target.n_face, m=grid.n_face)
    padded = PaddedCSR.from_csr(csr, dtype=np.float32)

    # --- true per-pass traffic (all n_extra slices ride one pass) -------
    # indices+weights once, source once, output once; no padding.
    true_bytes = (
        csr.nnz * (4 + 4)
        + grid.n_face * n_extra * 4
        + target.n_face * n_extra * 4
    )

    source = rng.normal(size=(n_extra, grid.n_face)).astype(np.float32)

    # --- XLA window-gather apply (the general path) ----------------------
    # Slice-minor layout: the extra dimension on the lane axis so every
    # gather fetches a contiguous row (see regrid/apply.py).
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
    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def apply_reps(srcT, idx, w, reduction, n_reps):
        def body(i, carry):
            src, acc = carry

            def chunk_body(c, acc2):
                out = _apply_windowed_T(src, idx[c], w[c], reduction)
                return acc2 + jnp.nansum(out)

            acc = jax.lax.fori_loop(0, idx.shape[0], chunk_body, acc)
            # Carry the source and touch ONE element per rep: defeats
            # loop-invariant hoisting of the apply without re-streaming
            # the whole array (the old +i*1e-12 full-array perturbation
            # added a spurious HBM read+write per rep).
            src = src.at[0, 0].add(jnp.float32(1e-12))
            return (src, acc)

        _, acc = jax.lax.fori_loop(
            0, n_reps, body, (srcT, jnp.float32(0.0))
        )
        return acc

    checksum = float(
        apply_reps(src_d, idx_d, w_d, reductions.mean, jnp.int32(REPS_LO))
    )
    xla_apply_s, _ = slope_time(
        lambda r: float(
            apply_reps(src_d, idx_d, w_d, reductions.mean, jnp.int32(r))
        )
    )

    # --- Pallas gather-packet apply (the primary TPU kernel) ------------
    gather_apply_s = None
    gather_min_s = None
    gather_e128_s = None
    dma_bytes = None
    try:
        from xugrid_tpu.regrid.gather_apply import (
            gather_windowed_apply,
            pad_sublanes,
            plan_gather,
            stage_source,
        )

        gplan = plan_gather(padded.indices, padded.weights)
        if gplan is not None and jax.default_backend() == "tpu":
            # Actual DMA traffic per pass (for the padding-waste factor
            # next to true_bytes): chunk slabs + packet tables + output.
            e_sub = pad_sublanes(n_extra)
            n_blocks = len(gplan.chunk0)
            dma_bytes = int(
                n_blocks * gplan.maxc * e_sub * 128 * 4   # chunk slabs
                + gplan.ptab.size * 4                      # packet lanes
                + gplan.page.size * 4                      # seg pages
                + n_blocks * 512 * e_sub * 4               # output
            )

            def time_gather(src2d, method):
                from xugrid_tpu.regrid.gather_apply import _use_mxu

                srcE = stage_source(src2d, gplan)
                mxu = _use_mxu(method, False, srcE.shape[0])

                @partial(
                    jax.jit,
                    static_argnames=(
                        "method", "scan_steps", "maxc", "mxu"
                    ),
                )
                def reps_fn(srcE, c0, npk, meta, ptab, page, rw,
                            n_reps, method, scan_steps, maxc, mxu):
                    def body(i, carry):
                        src, acc = carry
                        out = gather_windowed_apply(
                            src, c0, npk, meta, ptab, page, rw,
                            method=method, has_nan=False,
                            scan_steps=scan_steps, maxc=maxc, mxu=mxu,
                        )
                        acc = acc + jnp.nansum(out)
                        src = src.at[0, 0].add(src.dtype.type(1e-12))
                        return (src, acc)

                    _, acc = jax.lax.fori_loop(
                        0, n_reps, body, (srcE, jnp.float32(0.0))
                    )
                    return acc

                page = (
                    gplan.page if mxu else np.zeros((8, 128), np.int32)
                )
                dargs = (
                    jnp.asarray(srcE), jnp.asarray(gplan.chunk0),
                    jnp.asarray(gplan.npk), jnp.asarray(gplan.meta),
                    jnp.asarray(gplan.ptab), jnp.asarray(page),
                    jnp.asarray(gplan.rwsum),
                )
                scan_steps = 0 if mxu else gplan.scan_steps
                p, _f = slope_time(
                    lambda r: float(
                        reps_fn(*dargs, jnp.int32(r), method,
                                scan_steps, gplan.maxc, mxu)
                    )
                )
                return p

            gather_apply_s = time_gather(source, "mean")
            gather_min_s = time_gather(source, "min")
            # Lane-packed variant: 128 slices through the SAME weights —
            # proves whether the kernel is lane-limited or
            # overhead-limited (per-packet cost is slice-independent).
            # Skipped at the 10M XL scale: the (128, n_face) source plus
            # the loop's anti-hoisting copy would exceed v5e HBM.
            if grid.n_face * 128 * 4 * 3 < 8e9:
                try:
                    src128 = rng.normal(size=(128, grid.n_face)).astype(
                        np.float32
                    )
                    gather_e128_s = time_gather(src128, "mean")
                except Exception as exc:  # pragma: no cover
                    print(f"e128 variant unavailable: {exc!r}",
                          file=sys.stderr)
    except Exception as exc:  # pragma: no cover - perf fallback only
        print(f"gather path unavailable: {exc!r}", file=sys.stderr)

    # --- Pallas target-aligned banded apply (round-3 latency attack) ----
    aligned_apply_s = None
    aligned_min_s = None
    aligned_e128_s = None
    aligned_dma_bytes = None
    dispatch_overhead_s = None
    try:
        from xugrid_tpu.regrid.aligned_apply import (
            Q_PACK as _QP,
            gather_aligned_apply,
            plan_gather_aligned,
            stage_source_aligned,
        )
        from xugrid_tpu.regrid.gather_apply import (
            pad_sublanes as _pad_sub_a,
        )

        aplan = plan_gather_aligned(padded.indices, padded.weights)
        if aplan is not None and jax.default_backend() == "tpu":
            e_sub_a = _pad_sub_a(n_extra)
            n_runs_a = int((np.diff(aplan.winc0) != 0).sum()) + 1
            aligned_dma_bytes = int(
                n_runs_a * aplan.w_chunks * e_sub_a * 128 * 4  # slabs
                + (aplan.itab.size + aplan.wtab.size) * 4      # tables
                + len(aplan.rwsum) * e_sub_a * 4               # output
                + len(aplan.rwsum) * 4                         # rwsum
            )

            def time_aligned(src2d, method):
                srcE = stage_source_aligned(src2d, aplan)

                @partial(
                    jax.jit,
                    static_argnames=(
                        "method", "block", "r_step", "w_chunks",
                        "n_blocks",
                    ),
                )
                def reps_fn(srcE, blkid, wmeta, winc0, meta, itab,
                            wtab, rw, n_reps, method, block, r_step,
                            w_chunks, n_blocks):
                    def body(i, carry):
                        src, acc = carry
                        out = gather_aligned_apply(
                            src, blkid, wmeta, winc0, meta, itab,
                            wtab, rw, method=method, has_nan=False,
                            block=block, r_step=r_step,
                            w_chunks=w_chunks, n_blocks=n_blocks,
                        )
                        acc = acc + jnp.nansum(out)
                        src = src.at[0, 0].add(src.dtype.type(1e-12))
                        return (src, acc)

                    _, acc = jax.lax.fori_loop(
                        0, n_reps, body, (srcE, jnp.float32(0.0))
                    )
                    return acc

                aargs = (
                    jnp.asarray(srcE), jnp.asarray(aplan.blkid),
                    jnp.asarray(aplan.wmeta), jnp.asarray(aplan.winc0),
                    jnp.asarray(aplan.meta), jnp.asarray(aplan.itab),
                    jnp.asarray(aplan.wtab), jnp.asarray(aplan.rwsum),
                )
                statics = (
                    method, aplan.block, aplan.r_step, aplan.w_chunks,
                    len(aplan.rwsum) // aplan.block,
                )
                p, f = slope_time(
                    lambda r: float(
                        reps_fn(*aargs, jnp.int32(r), *statics)
                    )
                )
                return p, f

            aligned_apply_s, dispatch_overhead_s = time_aligned(
                source, "mean"
            )
            aligned_min_s, _ = time_aligned(source, "min")
            if grid.n_face * 128 * 4 * 3 < 8e9:
                try:
                    src128a = rng.normal(
                        size=(128, grid.n_face)
                    ).astype(np.float32)
                    aligned_e128_s, _ = time_aligned(src128a, "mean")
                    del src128a
                except Exception as exc:  # pragma: no cover
                    print(
                        f"aligned e128 variant unavailable: {exc!r}",
                        file=sys.stderr,
                    )
    except Exception as exc:  # pragma: no cover - perf fallback only
        print(f"aligned path unavailable: {exc!r}", file=sys.stderr)

    # --- Pallas selection kernel (median: order-statistic family) -------
    select_median_s = None
    try:
        from xugrid_tpu.regrid.select_apply import (
            gather_select_apply,
            plan_gather_select,
        )
        from xugrid_tpu.regrid.gather_apply import CHUNK as _CHUNK
        from xugrid_tpu.regrid.gather_apply import (
            pad_sublanes as _pad_sub,
        )

        splan = plan_gather_select(padded.indices, padded.weights)
        # A SplitSelectPlan runs two kernels per apply (typical-dmax +
        # wide-tail); time each and report the sum.
        subplans = (
            list(splan.plans())
            if splan is not None and hasattr(splan, "plans")
            else ([splan] if splan is not None else [])
        )
        if subplans and jax.default_backend() == "tpu":
            e_sub_s = _pad_sub(n_extra)
            c_needed = max(
                int(sp.bases.max()) + 1 if len(sp.bases) else 1
                for sp in subplans
            )
            m_pad = max(-(-grid.n_face // _CHUNK), c_needed) * _CHUNK
            srcE_s = np.zeros((e_sub_s, m_pad), np.float32)
            srcE_s[:n_extra, : grid.n_face] = source

            @partial(
                jax.jit,
                static_argnames=(
                    "method", "dmax", "pair", "span", "rows", "n_blocks",
                ),
            )
            def select_reps(srcE, blkid, bases, ptab, rw, n_reps,
                            method, dmax, pair, span, rows, n_blocks):
                def body(i, carry):
                    src, acc = carry
                    out = gather_select_apply(
                        src, blkid, bases, ptab, rw,
                        method=method, has_nan=False, dmax=dmax,
                        rows_per_step=rows, pair=pair, span=span,
                        n_blocks=n_blocks,
                    )
                    acc = acc + jnp.nansum(out)
                    src = src.at[0, 0].add(jnp.float32(1e-12))
                    return (src, acc)

                _, acc = jax.lax.fori_loop(
                    0, n_reps, body, (srcE, jnp.float32(0.0))
                )
                return acc

            select_median_s = 0.0
            for sp in subplans:
                sargs = (
                    jnp.asarray(srcE_s), jnp.asarray(sp.blkid),
                    jnp.asarray(sp.bases), jnp.asarray(sp.ptab),
                    jnp.asarray(sp.rwraw),  # percentile-family gate
                )
                n_blk_s = len(sp.rwsum) // sp.block
                p, _f = slope_time(
                    lambda r: float(
                        select_reps(*sargs, jnp.int32(r), "median",
                                    sp.dmax, sp.pair, sp.span, sp.rows,
                                    n_blk_s)
                    )
                )
                select_median_s += p
                del sargs
            del srcE_s
    except Exception as exc:  # pragma: no cover - perf fallback only
        select_median_s = None  # a partial sum is not a measurement
        print(f"select path unavailable: {exc!r}", file=sys.stderr)

    best_apply_s = xla_apply_s
    for cand in (gather_apply_s, aligned_apply_s):
        if cand is not None and cand < best_apply_s:
            best_apply_s = cand
    if aligned_apply_s is not None and aligned_apply_s == best_apply_s:
        dma_bytes = aligned_dma_bytes
    apply_gbps = true_bytes / best_apply_s / 1e9

    # --- celltree locate throughput -------------------------------------
    # Free the apply's device buffers first: at the 10M-face scale the
    # source slabs are GBs of HBM and the locate kernels need headroom.
    import gc

    del src_d, idx_d, w_d
    try:
        del dargs
    except NameError:
        pass
    gc.collect()

    pts = rng.uniform(0.5, n_side - 0.5, (n_points, 2))
    found = tree.locate_points(pts)  # compile + warm
    # Best-of-5: the 1-vCPU host sees heavy steal-time noise; the min is
    # the stable measure of the pipeline's true cost.
    best_locate_s = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        found = tree.locate_points(pts)
        best_locate_s = min(best_locate_s, time.perf_counter() - t0)
    locate_qps = n_points / best_locate_s
    hit_rate = float((found >= 0).mean())

    # --- 4-way partition/merge round trip (sort-based dedup kernel) ----
    from xugrid_tpu.ugrid.partitioning import labels_to_indices, partition_labels

    labels = partition_labels(grid.centroids, 4)
    parts = [
        grid.topology_subset(index)
        for index in labels_to_indices(labels)
    ]
    merge_s, (merged_grid, _) = best_of(
        lambda: parts[0].merge_partitions(parts)
    )
    assert merged_grid.n_face == grid.n_face

    # --- host CPU baseline: scipy CSR matvec (the C-speed equivalent of
    # the reference's numba apply loop, on THIS host's single vCPU) ------
    import scipy.sparse

    W = scipy.sparse.csr_matrix(
        (csr.data, csr.indices, csr.indptr), shape=(csr.n, csr.m)
    ).astype(np.float32)
    wsum = np.asarray(W.sum(axis=1)).ravel()
    wsum[wsum == 0] = 1.0
    _ = W @ source[0]  # warm
    t0 = time.perf_counter()
    for k in range(n_extra):
        _ = (W @ source[k]) / wsum
    cpu_apply_s = time.perf_counter() - t0
    cpu_gbps = true_bytes / cpu_apply_s / 1e9

    result = {
        "metric": f"{grid.n_face}-face overlap regrid apply throughput",
        "value": round(apply_gbps, 3),
        "unit": "GB/s (true bytes)",
        "vs_baseline": round(apply_gbps / cpu_gbps, 3),
        "baseline_note": (
            "vs_baseline is measured against scipy CSR matvec on this "
            "1-vCPU bench host, a proxy for (not a measurement of) the "
            "reference's multithreaded numba apply on a many-core node"
        ),
        # NOTE: a FRACTION expressed in percent (1.0 == 1% of HBM SoL).
        "pct_of_hbm_sol": round(100.0 * apply_gbps / HBM_GBPS, 2),
        "true_bytes_per_pass": int(true_bytes),
        "actual_dma_bytes_per_pass": dma_bytes,
        "dma_waste_factor": (
            round(dma_bytes / true_bytes, 2) if dma_bytes else None
        ),
        "apply_s_per_pass": round(best_apply_s, 4),
        "xla_apply_s_per_pass": round(xla_apply_s, 4),
        "gather_apply_s_per_pass": (
            round(gather_apply_s, 4) if gather_apply_s is not None else None
        ),
        "gather_min_s_per_pass": (
            round(gather_min_s, 4) if gather_min_s is not None else None
        ),
        "gather_e128_s_per_pass": (
            round(gather_e128_s, 4) if gather_e128_s is not None else None
        ),
        "gather_e128_gbps_true": (
            round(
                (csr.nnz * 8 + (grid.n_face + target.n_face) * 128 * 4)
                / gather_e128_s / 1e9, 1,
            )
            if gather_e128_s is not None
            else None
        ),
        "aligned_apply_s_per_pass": (
            round(aligned_apply_s, 4)
            if aligned_apply_s is not None
            else None
        ),
        "aligned_min_s_per_pass": (
            round(aligned_min_s, 4)
            if aligned_min_s is not None
            else None
        ),
        "aligned_e128_s_per_pass": (
            round(aligned_e128_s, 4)
            if aligned_e128_s is not None
            else None
        ),
        "aligned_e128_gbps_true": (
            round(
                (csr.nnz * 8 + (grid.n_face + target.n_face) * 128 * 4)
                / aligned_e128_s / 1e9, 1,
            )
            if aligned_e128_s is not None
            else None
        ),
        "select_median_s_per_pass": (
            round(select_median_s, 4)
            if select_median_s is not None
            else None
        ),
        "weight_build_s": round(weight_build_s, 3),
        "bvh_build_s": round(bvh_build_s, 3),
        "cpu_csr_gbps_true": round(cpu_gbps, 3),
        "locate_queries_per_s": round(locate_qps, 1),
        "locate_hit_rate": round(hit_rate, 4),
        "merge_4way_s": round(merge_s, 3),
        "host_memcpy_gbps_best": host_memcpy_best,
        "host_memcpy_gbps_median": host_memcpy_med,
        "host_random_access_ns_best": host_gather_best,
        "host_random_access_ns_median": host_gather_med,
        "nnz": int(csr.nnz),
        "n_extra": n_extra,
        "checksum": checksum,
        "timing_method": (
            f"two-point slope over one executable (reps {REPS_LO}/"
            f"{REPS_HI}); cancels the per-dispatch fixed cost"
        ),
        "dispatch_overhead_s": (
            round(dispatch_overhead_s, 4)
            if dispatch_overhead_s is not None
            else None
        ),
        "sol_floor_note": (
            "Measured round-5 floor analysis (scripts/aligned_probe.py"
            ", CLAUDE.md): three full-fidelity inner-loop "
            "reorganizations (per-row reduce tree, q-major big-add "
            "layout, static-group slotting with one static full-acc "
            "RMW per batch) all measure 59-60 ns/row on chip — the "
            "kernel is issue-bound on the (Q_PACK*e_sub, 128) "
            "gather+multiply+combine data flow.  Fill (~0.21) is "
            "capped by the 128-lane dynamic_gather extent (a row's "
            "lanes share one source chunk; real overlap cells are "
            "~40 lanes x depth ~3.3); multi-chunk slot pooling, "
            "Hilbert/mean-source permutations censused equal or "
            "worse.  15% of HBM SoL at E=20 needs <=43 ns/row at "
            "current rows — below the measured marginal data cost, so "
            "the honest ceiling of this design is ~9-10% at E=20 "
            "(higher at E=128 where fixed costs amortize)."
        ),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
