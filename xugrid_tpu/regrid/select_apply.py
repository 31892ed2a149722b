"""
Selection-reduction Pallas TPU kernel: mode / median / percentiles.

These reductions need each target's FULL window materialized (an order
statistic or a weighted group-by over the window values), so they
cannot ride the streamed segmented-scan/matmul engines in
``gather_apply.py``.  Until now they fell back to the XLA window
gather (lane-serial on TPU: ~60 ms/pass at the 1M-face bench config vs
~6 ms for the linear family).

Design (target-major, rank-by-counting):

* Entries are sorted by (target, source index) and packed DENSE into
  128-lane rows — no per-chunk round padding (the chunk-major engines'
  0.46-0.65 lane efficiency becomes ~0.9).  A target's entries never
  split across rows; rows never cross 512-target blocks.
* One grid step = R rows of one block.  Rows are paired; each pair
  gets its own ``pair_span`` single-chunk input streams whose
  scalar-prefetch index maps point at the pair's UNALIGNED first
  chunk, so the window never straddles an alignment boundary and
  Mosaic pipelines all DMA (no dynamic VMEM slices anywhere).
* Per lane, a segmented ALL-PAIRS pass over roll distances 1..Dmax
  (Dmax = max window size - 1, static) computes, within each target's
  lane run: the valid count n, the rank of each value (ties broken by
  lane order), and for mode the weighted total per distinct value.
  This collapses each method to ONE per-lane "contribution" that a
  single one-hot MXU matmul (128 lanes x 512 target slots) sums per
  target — no segmented scan, no segment-end tables.
* Per-target gating rides the host-computed window weight sum
  (``rwsum``) plus an in-kernel NaN injection for all-NaN windows.

Semantics pinned to ``regrid/reduce.py`` (which goldens against the
reference numba kernels, xugrid/regrid/reduce.py:16-272):

* percentile (p5..p95, median): NaN-skipping, linear interpolation
  between closest ranks: rank = 1 + (n-1)p/100, lower/upper at
  floor/ceil clipped to [0, n-1]; NaN when no valid value or all
  window weights are zero.
* mode: area-weighted value frequency; ties resolve to the LARGEST
  value; NaN when no valid value or all weights are zero.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xugrid_tpu.regrid.gather_apply import CHUNK, pad_sublanes

#: targets per kernel block (one one-hot extraction matmul per row).
BLOCK = 512

#: rows per grid step.
ROWS = 12

#: rows sharing one source-chunk window.
PAIR = 2

#: chunks per pair window (the pair's rows' combined source extent
#: must fit; plans reject otherwise).
PAIR_SPAN = 3

#: largest supported window (valid entries per target).
MAX_WINDOW = 32

SELECT_METHODS = ("mode", "median") + tuple(
    f"p{p}" for p in (5, 10, 25, 50, 75, 90, 95)
)


def _method_p(method: str) -> float | None:
    if method == "median":
        return 50.0
    if method.startswith("p"):
        return float(method[1:])
    return None


def covers_method(method: str) -> bool:
    """True when the selection kernel implements ``method`` (mode,
    median, or any ``p<float>`` percentile — not just the registry's
    preset list)."""
    if method in ("mode", "median"):
        return True
    if method.startswith("p"):
        try:
            p = float(method[1:])
        except ValueError:
            return False
        return 0.0 <= p <= 100.0
    return False


class SelectPlan(NamedTuple):
    """Host-side plan for the selection kernel (all numpy)."""

    blkid: np.ndarray    # (nsteps,) i32 512-target block per step
    bases: np.ndarray    # (nsteps * n_pairs,) i32 first chunk per pair
    ptab: np.ndarray     # (nsteps*ROWS, 3, 128) i32 rows:
    #                      0: idx7 | k_chunk<<7 | valid<<9
    #                      1: f32 weight bits
    #                      2: target slot 0..511 (-1 on pad lanes)
    rwsum: np.ndarray    # (n_pad,) f32 total window weight per target
    dmax: int            # all-pairs roll distance bound (= max w - 1)
    n: int
    block: int


def plan_gather_select(
    indices: np.ndarray,
    weights: np.ndarray | None = None,
    block: int = BLOCK,
    rows_per_step: int = ROWS,
    pair_span: int = PAIR_SPAN,
    max_plan_bytes: int = 1_500_000_000,
) -> SelectPlan | None:
    """Build the target-major selection plan, or None when the window
    structure defeats it (windows over MAX_WINDOW entries, pair source
    extents over ``pair_span`` chunks, or budget gates) — the caller
    falls back to the XLA window path."""
    n, _w = indices.shape
    if n == 0:
        return None
    if weights is None:
        weights = np.zeros(indices.shape, np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    weights = np.ascontiguousarray(weights, dtype=np.float32)
    n_blocks = -(-n // block)
    n_pad = n_blocks * block

    valid = indices >= 0
    ti, _sl = np.nonzero(valid)
    if len(ti) == 0:
        return None
    src = indices[valid]
    wts = weights[valid]
    m_max = int(src.max()) + 1
    if n >= (1 << 31) or m_max >= (1 << 31):
        return None

    # Target-major sort (window slots ascending by source index).
    order = np.argsort(ti * np.int64(m_max) + src)
    ti = ti[order]
    src = src[order]
    wts = wts[order]
    nnz = len(ti)

    # Per-target window sizes (targets present only).
    t_uniq, t_counts = np.unique(ti, return_counts=True)
    if int(t_counts.max()) > MAX_WINDOW:
        return None
    dmax = int(t_counts.max()) - 1
    dmax = max(1, -(-dmax // 4) * 4)  # pad: stable compile keys

    # Greedy row packing: rows hold whole targets, never cross a
    # block.  Iterates once per ROW (~nnz/110 iterations).
    cum = np.cumsum(t_counts)
    csum0 = np.concatenate([[0], cum])
    t_block = (t_uniq // block).astype(np.int64)
    # Last target index (exclusive) of each block present.
    blk_change = np.flatnonzero(np.diff(t_block)) + 1
    blk_end = np.concatenate([blk_change, [len(t_uniq)]])
    n_t = len(t_uniq)
    row_of_t = np.empty(n_t, np.int64)
    row_starts = []
    s = 0
    bi = 0
    while s < n_t:
        while blk_end[bi] <= s:
            bi += 1
        j = int(np.searchsorted(cum, csum0[s] + 128, side="right"))
        j = min(max(j, s + 1), int(blk_end[bi]))
        row_of_t[s:j] = len(row_starts)
        row_starts.append(s)
        s = j
    n_rows = len(row_starts)
    row_starts = np.asarray(row_starts, np.int64)
    row_block = t_block[row_starts]

    # Steps: rows of one block grouped rows_per_step at a time.
    rb_change = np.flatnonzero(np.diff(row_block)) + 1
    rb_start = np.concatenate([[0], rb_change])
    rb_end = np.concatenate([rb_change, [n_rows]])
    rows_b = rb_end - rb_start
    steps_b = -(-rows_b // rows_per_step)
    nsteps_real = int(steps_b.sum())
    n_pairs = rows_per_step // PAIR
    # One all-padding dummy step per block with no entries: its flush
    # writes the NaN the zero rwsum implies (otherwise the out block
    # would carry garbage).
    present = np.zeros(n_blocks, bool)
    present[row_block[rb_start]] = True
    missing = np.flatnonzero(~present)
    nsteps = nsteps_real + len(missing)
    if nsteps * rows_per_step * 3 * 128 * 4 > max_plan_bytes:
        return None
    if (nsteps + nsteps * n_pairs) * 4 + 64 > 900_000:
        return None  # SMEM scalar-prefetch budget

    # Global padded row id per real row.
    step0_b = np.concatenate([[0], np.cumsum(steps_b)[:-1]])
    rlocal = np.arange(n_rows) - rb_start[
        np.searchsorted(rb_end, np.arange(n_rows), side="right")
    ]
    prow = (
        step0_b[np.searchsorted(rb_end, np.arange(n_rows), side="right")]
        * rows_per_step
        + rlocal
    )

    blkid = np.concatenate(
        [np.repeat(row_block[rb_start], steps_b), missing]
    ).astype(np.int32)

    # Entry placement.
    e_t = np.repeat(np.arange(n_t), t_counts)      # target ordinal
    e_row = row_of_t[e_t]
    e_prow = prow[e_row]
    lane = np.arange(nnz) - csum0[row_starts[e_row]]
    tslot = (ti - (t_block[e_t] * block)).astype(np.int32)

    # Pair windows: first chunk per pair, local chunk offsets.
    chk = src >> 7
    e_pair = e_prow // PAIR
    NPR = nsteps * n_pairs
    pair_min = np.full(NPR + 1, np.int64(1) << 40)
    np.minimum.at(pair_min, e_pair, chk)
    pair_max = np.zeros(NPR + 1, np.int64)
    np.maximum.at(pair_max, e_pair, chk)
    has = pair_min < (np.int64(1) << 40)
    if ((pair_max - pair_min + 1)[has] > pair_span).any():
        return None
    bases = np.where(has, pair_min, 0)[:NPR].astype(np.int32)
    k_e = (chk - pair_min[e_pair]).astype(np.int32)

    ptab = np.zeros((nsteps * rows_per_step, 3, 128), np.int32)
    ptab[:, 2, :] = -1
    ptab[e_prow, 0, lane] = (
        (src & 127).astype(np.int32) | (k_e << 7) | (1 << 9)
    )
    ptab[e_prow, 1, lane] = wts.view(np.int32)
    ptab[e_prow, 2, lane] = tslot

    rwsum = np.zeros(n_pad, np.float32)
    rwsum[:n] = np.where(valid, weights, 0.0).sum(axis=1)

    return SelectPlan(
        blkid=blkid,
        bases=bases.reshape(-1),
        ptab=ptab,
        rwsum=rwsum,
        dmax=dmax,
        n=n,
        block=block,
    )


def _make_select_kernel(
    method: str,
    has_nan: bool,
    dmax: int,
    e_sub: int,
    block: int,
    rows_per_step: int,
    pair_span: int,
    interpret: bool,
):
    n_pairs = rows_per_step // PAIR
    p = _method_p(method)

    def kernel(blkid_ref, bases_ref, *refs):
        ptab_ref, rwsum_ref = refs[0], refs[1]
        srcs = refs[2:2 + n_pairs * pair_span]
        out_ref = refs[2 + n_pairs * pair_span]
        acc = refs[2 + n_pairs * pair_span + 1]

        i = pl.program_id(0)
        nsteps = pl.num_programs(0)
        cur = blkid_ref[i]
        prev = blkid_ref[jnp.maximum(i - 1, 0)]
        nxt = blkid_ref[jnp.minimum(i + 1, nsteps - 1)]
        is_first = jnp.logical_or(i == 0, prev != cur)
        is_last = jnp.logical_or(i == nsteps - 1, nxt != cur)

        n_chain = 2 if (p is None or has_nan) else 1

        @pl.when(is_first)
        def _init():
            acc[...] = jnp.zeros(
                (n_chain * e_sub, block), jnp.float32
            )

        tab = ptab_ref[...]                    # (R, 3, 128)
        meta = tab[:, 0, :]
        idx_p = meta & 127
        k_p = (meta >> 7) & 3
        slotv = (meta >> 9) & 1
        w_p = jax.lax.bitcast_convert_type(tab[:, 1, :], jnp.float32)
        seg_p = tab[:, 2, :]

        def expand(x, reps=e_sub):
            return jnp.broadcast_to(
                x[:, None, :], (rows_per_step, reps, 128)
            ).reshape(rows_per_step * reps, 128)

        idx_e = expand(idx_p)
        # Gather per (pair, k): both rows of a pair read the pair's
        # k-th chunk stream; lanes select on their chunk offset.
        k_e = expand(k_p)
        pieces = []
        for pr in range(n_pairs):
            lo = pr * PAIR * e_sub
            hi = (pr + 1) * PAIR * e_sub
            idx_pair = idx_e[lo:hi]
            sel_pair = k_e[lo:hi]
            got = jnp.zeros((PAIR * e_sub, 128), jnp.float32)
            for k in range(pair_span):
                table = jnp.broadcast_to(
                    srcs[pr * pair_span + k][...].reshape(
                        1, e_sub, 128
                    ),
                    (PAIR, e_sub, 128),
                ).reshape(PAIR * e_sub, 128)
                g = jnp.take_along_axis(table, idx_pair, axis=1)
                got = jnp.where(sel_pair == k, g, got)
            pieces.append(got)
        val = jnp.concatenate(pieces, axis=0)

        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_step, 128), 1
        )
        ok = slotv == 1
        if has_nan:
            fin = jnp.logical_not(jnp.isnan(val))
            okv = jnp.logical_and(expand(ok), fin)
        else:
            okv = expand(ok)
        okf = okv.astype(jnp.float32)

        def seg_mask(d, sgn):
            """In-segment partner mask at roll distance sgn*d, as an
            expanded f32 gate (rolls stay on i32/f32 tiles)."""
            seg_r = _roll(seg_p, sgn * d, interpret)
            edge = lanes >= d if sgn == 1 else lanes <= 127 - d
            return expand(
                jnp.logical_and(seg_r == seg_p, edge)
            ).astype(jnp.float32) * _roll(okf, sgn * d, interpret)

        # Segmented all-pairs over roll distances 1..dmax: within each
        # target's lane run count valid entries (n), and per lane its
        # rank among valid values (ties -> lane order) [percentiles]
        # or the weighted total of equal values plus the run maxima
        # needed for the lexicographic mode pick.
        vs = jnp.where(okv, val, 0.0)
        n_tot = okf + 0.0
        if p is not None:
            rank = jnp.zeros_like(vs)
        else:
            w_e = expand(w_p)
            wv = jnp.where(okv, w_e, 0.0)
            total = wv + 0.0
        for d in range(1, dmax + 1):
            for sgn in (1, -1):
                m = seg_mask(d, sgn)
                v_r = _roll(vs, sgn * d, interpret)
                n_tot = n_tot + m
                if p is not None:
                    less = (v_r < vs).astype(jnp.float32)
                    if sgn == 1:
                        less = jnp.maximum(
                            less, (v_r == vs).astype(jnp.float32)
                        )
                    rank = rank + m * less
                else:
                    w_r = _roll(wv, sgn * d, interpret)
                    total = total + jnp.where(
                        jnp.logical_and(m > 0.0, v_r == vs), w_r, 0.0
                    )

        if p is not None:
            # rank/n are valid-only; invalid lanes must never match.
            nv = n_tot
            rk = jnp.where(okv, rank, 1e9)
            target_rank = 1.0 + (nv - 1.0) * jnp.float32(p / 100.0)
            f = jnp.floor(target_rank)
            m_frac = target_rank - f
            lo_idx = jnp.maximum(f - 1.0, 0.0)
            hi_idx = jnp.minimum(
                lo_idx + 1.0, jnp.maximum(nv - 1.0, 0.0)
            )
            contrib = vs * (
                (rk == lo_idx).astype(jnp.float32) * (1.0 - m_frac)
                + (rk == hi_idx).astype(jnp.float32) * m_frac
            )
            # All-NaN windows NaN out via a second "bad" chain: a NaN
            # in the matmul input would spread to the row's every
            # target (NaN * 0 one-hot slots), so the flag rides its
            # own one-hot sum and gates in the flush instead.
            bad = jnp.logical_and(expand(ok), nv == 0.0)
        else:
            # Mode: segment max of totals, then the largest value
            # among lanes achieving it, then its first occurrence
            # (duplicate values tie on total; sum one copy).
            tmax = total + 0.0
            for d in range(1, dmax + 1):
                for sgn in (1, -1):
                    m = seg_mask(d, sgn)
                    tmax = jnp.maximum(
                        tmax,
                        jnp.where(
                            m > 0.0,
                            _roll(total, sgn * d, interpret),
                            -jnp.inf,
                        ),
                    )
            best = jnp.where(
                jnp.logical_and(okv, total == tmax),
                jnp.where(okv, val, -jnp.inf),
                -jnp.inf,
            )
            vbest = best + 0.0
            for d in range(1, dmax + 1):
                for sgn in (1, -1):
                    m = seg_mask(d, sgn)
                    vbest = jnp.maximum(
                        vbest,
                        jnp.where(
                            m > 0.0,
                            _roll(best, sgn * d, interpret),
                            -jnp.inf,
                        ),
                    )
            winf = jnp.logical_and(
                best == vbest, best > -jnp.inf
            ).astype(jnp.float32)
            first = winf + 0.0
            for d in range(1, dmax + 1):
                m = seg_mask(d, 1)
                first = first * (
                    1.0 - m * _roll(winf, d, interpret)
                )
            contrib = first * vs
            # Reference gates mode on the max VALID weight (not the
            # raw window sum): all-zero valid weights or no valid
            # value -> NaN, even when rwsum > 0.  Rides the "bad"
            # chain (a NaN here would poison the extraction matmul).
            bad = jnp.logical_and(
                expand(ok),
                jnp.logical_or(n_tot == 0.0, tmax == 0.0),
            )

        # Extraction: one one-hot matmul per row sums each target's
        # single contribution (and its bad-window flag) into its
        # block slot.
        nc = 2 if (p is None or has_nan) else 1
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (128, block), 1)
        res = jnp.zeros((nc * e_sub, block), jnp.float32)
        badf = bad.astype(jnp.float32)
        for r in range(rows_per_step):
            ph = (
                jnp.broadcast_to(
                    seg_p[r:r + 1, :].reshape(128, 1), (128, block)
                )
                == iota_b
            ).astype(jnp.float32)
            qu = contrib[r * e_sub:(r + 1) * e_sub]
            if nc == 2:
                qu = jnp.concatenate(
                    [qu, badf[r * e_sub:(r + 1) * e_sub]], axis=0
                )
            res = res + jax.lax.dot_general(
                qu,
                ph,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc[...] += res

        @pl.when(is_last)
        def _flush():
            den = rwsum_ref[...]                    # (1, block)
            a = acc[pl.ds(0, e_sub)]
            gate = jnp.broadcast_to(den > 0.0, a.shape)
            if n_chain == 2:
                badsum = acc[pl.ds(e_sub, e_sub)]
                gate = jnp.logical_and(gate, badsum == 0.0)
            out_ref[...] = jnp.where(
                gate, a, jnp.float32(jnp.nan)
            )

    return kernel


def _roll(x, shift, interpret):
    if interpret:
        return jnp.roll(x, shift, axis=1)
    return pltpu.roll(x, shift, axis=1)


@partial(
    jax.jit,
    static_argnames=(
        "method", "has_nan", "dmax", "block", "rows_per_step",
        "pair_span", "n_blocks", "interpret",
    ),
)
def gather_select_apply(
    srcE, blkid, bases, ptab, rwsum,
    method: str = "median",
    has_nan: bool = True,
    dmax: int = 8,
    block: int = BLOCK,
    rows_per_step: int = ROWS,
    pair_span: int = PAIR_SPAN,
    n_blocks: int = 1,
    interpret: bool = False,
):
    """Selection apply: plan arrays from ``plan_gather_select``; srcE
    chunk-major staged as (E_sub, m_pad)."""
    e_sub, m_pad = srcE.shape
    ctot = m_pad // CHUNK
    chunks = srcE.reshape(e_sub, ctot, CHUNK).transpose(1, 0, 2)
    nsteps = blkid.shape[0]
    n_pairs = rows_per_step // PAIR
    n_pad = n_blocks * block

    def src_map(pr, k):
        def f(i, blk, bas):
            c = bas[i * n_pairs + pr] + k
            return (jnp.minimum(c, ctot - 1), 0, 0)

        return f

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(
                (rows_per_step, 3, 128), lambda i, blk, bas: (i, 0, 0)
            ),
            pl.BlockSpec(
                (1, block), lambda i, blk, bas: (0, blk[i])
            ),
        ]
        + [
            pl.BlockSpec((1, e_sub, CHUNK), src_map(pr, k))
            for pr in range(n_pairs)
            for k in range(pair_span)
        ],
        out_specs=pl.BlockSpec(
            (e_sub, block), lambda i, blk, bas: (0, blk[i])
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (
                    (2 if (_method_p(method) is None or has_nan) else 1)
                    * e_sub,
                    block,
                ),
                jnp.float32,
            )
        ],
    )

    kernel = _make_select_kernel(
        method, has_nan, dmax, e_sub, block, rows_per_step,
        pair_span, interpret,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_sub, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        blkid, bases, ptab, rwsum.reshape(1, -1),
        *([chunks] * (n_pairs * pair_span)),
    )


def apply_windowed_select(
    source2d: np.ndarray,
    indices: np.ndarray,
    weights: np.ndarray,
    method: str,
    has_nan: bool | None = None,
    plan: SelectPlan | None = None,
    interpret: bool = False,
):
    """Host wrapper: plans, stages the source, runs the kernel.
    Returns (n_target, n_extra) f32, or None when planning rejects."""
    if not covers_method(method):
        return None
    if plan is None:
        plan = plan_gather_select(indices, weights)
    if plan is None:
        return None
    if has_nan is None:
        has_nan = bool(np.isnan(source2d).any())

    n_extra, m = source2d.shape
    e_sub = pad_sublanes(n_extra)
    c_needed = int(plan.bases.max()) + PAIR_SPAN if len(plan.bases) else 1
    m_pad = max(-(-m // CHUNK), c_needed) * CHUNK
    srcE = np.zeros((e_sub, m_pad), np.float32)
    srcE[:n_extra, :m] = source2d

    out = gather_select_apply(
        jnp.asarray(srcE),
        jnp.asarray(plan.blkid),
        jnp.asarray(plan.bases),
        jnp.asarray(plan.ptab),
        jnp.asarray(plan.rwsum),
        method=method,
        has_nan=bool(has_nan),
        dmax=plan.dmax,
        block=plan.block,
        n_blocks=len(plan.rwsum) // plan.block,
        interpret=interpret,
    )
    return np.asarray(out)[:n_extra, : plan.n].T
