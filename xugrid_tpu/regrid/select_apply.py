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
* One grid step = R rows of one block.  Rows are grouped PAIR at a
  time; each group gets ``span`` single-chunk input streams whose
  scalar-prefetch index maps point at the group's DISTINCT source
  chunks (real meshes number faces row-major, so a window's ~17-chunk
  *spread* hides only ~3 *distinct* chunks — a consecutive-chunk
  window would reject almost everything).  The row packer is
  span-aware: a target that would push its group past ``span``
  distinct chunks closes the whole group.
* Per lane, a segmented ALL-PAIRS pass over roll distances 1..Dmax
  (Dmax = max window size - 1, static) computes, within each target's
  lane run: the valid count n, the rank of each value (ties broken by
  lane order), and for mode the weighted total per distinct value.
  This collapses each method to ONE per-lane "contribution" that a
  single one-hot MXU matmul (128 lanes x 512 target slots) sums per
  target — no segmented scan, no segment-end tables.
* Per-target gating rides the host-computed window weight sum
  (``rwsum``) plus a "bad window" flag chain for all-NaN windows (a
  NaN in the extraction matmul would spread row-wide).

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

#: rows sharing one set of source-chunk streams.
PAIR = int(os.environ.get("XUGRID_TPU_SELECT_PAIR", "4"))

#: distinct source chunks per row group (4-bit k field: max 16).
PAIR_SPAN = int(os.environ.get("XUGRID_TPU_SELECT_SPAN", "12"))

#: largest supported window (valid entries per target).
MAX_WINDOW = 32

SELECT_METHODS = ("mode", "median") + tuple(
    f"p{p}" for p in (5, 10, 25, 50, 75, 90, 95)
)

#: pinned device copies of plan tables keyed by (plan identity, gate
#: kind); entries pin the plan so ids cannot be reused while cached.
_PLAN_DEV_CACHE: dict = {}


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
    bases: np.ndarray    # (nsteps * n_pairs * span,) i32 chunk ids
    ptab: np.ndarray     # (nsteps*ROWS, 3, 128) i32 rows:
    #                      0: idx7 | k<<7 | valid<<11
    #                      1: f32 weight bits
    #                      2: target slot 0..511 (-1 on pad lanes)
    rwsum: np.ndarray    # (n_pad,) f32 mode gate: max VALID weight
    rwraw: np.ndarray    # (n_pad,) f32 percentile gate: max RAW weight
    #                      where any valid slot exists (reduce.py pins
    #                      percentile to max(weights) incl. invalid
    #                      slots, mode to the valid-masked max)
    dmax: int            # all-pairs roll distance bound (= max w - 1)
    pair: int            # rows per stream group
    span: int            # streams (distinct chunks) per group
    rows: int            # ptab rows per grid step (kernel layout)
    n: int
    block: int


class SplitSelectPlan(NamedTuple):
    """Two-kernel plan partitioned by window size.

    The all-pairs roll pass costs O(dmax) full-width VPU work per step,
    and dmax is the GLOBAL max window size — a 1% tail of wide windows
    taxes every step.  Splitting targets at a padding-class boundary
    runs ~97% of the rows at the typical dmax and only the tail at the
    global one (the one-hot extraction makes target coverage per call
    arbitrary, so the merge is a plain mask select)."""

    small: "SelectPlan"
    big: "SelectPlan"
    big_mask: np.ndarray  # (n,) bool: targets the `big` plan covers
    n: int

    def plans(self):
        """The component single plans, in apply order."""
        return (self.small, self.big)


#: tail fraction above which a dmax split stops paying for its second
#: kernel launch + plan stream.
_SPLIT_TAIL_FRAC = 0.05


def plan_gather_select(
    indices: np.ndarray,
    weights: np.ndarray | None = None,
    block: int = BLOCK,
    rows_per_step: int = ROWS,
    pair: int = PAIR,
    span: int = PAIR_SPAN,
    max_plan_bytes: int = 1_500_000_000,
) -> "SelectPlan | SplitSelectPlan | None":
    """Plan with an automatic dmax split: when a small tail of wide
    windows inflates the global all-pairs bound, targets partition into
    a typical-dmax plan plus a tail plan (``SplitSelectPlan``)."""
    if os.environ.get("XUGRID_TPU_SELECT_SPLIT", "1") == "0":
        return _plan_select_single(
            indices, weights, block, rows_per_step, pair, span,
            max_plan_bytes,
        )
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    counts = (indices >= 0).sum(axis=1)
    present = counts > 0
    if not present.any() or int(counts.max()) > MAX_WINDOW:
        return _plan_select_single(
            indices, weights, block, rows_per_step, pair, span,
            max_plan_bytes,
        )
    wmax = int(counts.max())
    pad4 = lambda w: max(1, -(-(w - 1) // 4) * 4)  # noqa: E731
    dmax_all = pad4(wmax)
    # Cost-based split: the all-pairs pass costs ~rows x dmax, and rows
    # scale with entries/128 — so model each candidate boundary by
    # entries_small*dmax_small + entries_big*dmax_all and keep the
    # cheapest, requiring >5% total saving to pay for the second kernel
    # launch + plan stream.  (The old smallest-tail<=5% rule picked
    # dmax=12 on the 1M overlap bench where 73% of windows are exactly
    # 9 entries and a dmax=8 / dmax=16 split is ~23% less roll work.)
    ents_all = int(counts.sum())
    best_cost = ents_all * dmax_all * (1.0 - _SPLIT_TAIL_FRAC)
    split_w = None
    for c in range(4, dmax_all, 4):
        sm = counts <= c + 1
        ents_small = int(counts[sm].sum())
        ents_big = ents_all - ents_small
        if ents_big == 0:
            continue
        cost = ents_small * c + ents_big * dmax_all
        if cost < best_cost:
            best_cost = cost
            split_w = c + 1
    if split_w is None:
        return _plan_select_single(
            indices, weights, block, rows_per_step, pair, span,
            max_plan_bytes,
        )
    big_mask = counts > split_w
    if weights is None:
        weights = np.zeros(indices.shape, np.float32)
    weights = np.ascontiguousarray(weights, dtype=np.float32)
    idx_small = np.where(big_mask[:, None], -1, indices)
    w_small = np.where(big_mask[:, None], 0.0, weights).astype(np.float32)
    idx_big = np.where(big_mask[:, None], indices, -1)
    w_big = np.where(big_mask[:, None], weights, 0.0).astype(np.float32)
    small = _plan_select_single(
        idx_small, w_small, block, rows_per_step, pair, span,
        max_plan_bytes,
    )
    big = _plan_select_single(
        idx_big, w_big, block, rows_per_step, pair, span,
        max_plan_bytes,
    )
    if small is None or big is None:
        return _plan_select_single(
            indices, weights, block, rows_per_step, pair, span,
            max_plan_bytes,
        )
    return SplitSelectPlan(
        small=small, big=big, big_mask=big_mask, n=len(indices)
    )


def _plan_select_single(
    indices: np.ndarray,
    weights: np.ndarray | None = None,
    block: int = BLOCK,
    rows_per_step: int = ROWS,
    pair: int = PAIR,
    span: int = PAIR_SPAN,
    max_plan_bytes: int = 1_500_000_000,
) -> SelectPlan | None:
    """Build the target-major selection plan, or None when the window
    structure defeats it (windows over MAX_WINDOW entries, more than
    ``span`` distinct chunks in one window, or budget gates) — the
    caller falls back to the XLA window path."""
    n, _w = indices.shape
    if n == 0:
        return None
    if span > 16:
        return None  # 4-bit k field
    if rows_per_step % pair != 0:
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
    n_t = len(t_uniq)
    csum0 = np.concatenate([[0], np.cumsum(t_counts)])

    # Per-target distinct chunk lists (CSR over sorted-unique chunks;
    # entries are source-sorted within each target already).
    chk = (src >> 7).astype(np.int64)
    e_t = np.repeat(np.arange(n_t), t_counts)
    newc = np.empty(nnz, bool)
    newc[0] = True
    np.logical_or(
        np.diff(chk) != 0, np.diff(e_t) != 0, out=newc[1:]
    )
    t_nchunks = np.zeros(n_t, np.int64)
    np.add.at(t_nchunks, e_t[newc], 1)
    if int(t_nchunks.max()) > span:
        return None
    tc_data = chk[newc]                       # distinct chunks, grouped
    tc_ptr = np.concatenate([[0], np.cumsum(t_nchunks)])

    t_block = (t_uniq // block).astype(np.int64)

    # Span-aware greedy packing (Python loop, once per plan; plans are
    # cached by the caller).  Rows hold whole targets, never cross a
    # block; a target that would push its PAIR-row group past ``span``
    # distinct chunks (or is the group's first and a block boundary)
    # closes the group.
    row_start = []        # first target ordinal of each row
    row_blockl = []       # block of each row
    group_of_row = []     # group ordinal of each row
    group_chunks = []     # list of sorted np arrays per group
    cur_set: set = set()
    cur_lanes = 0
    cur_block = -1
    row_open = False
    rows_in_group = 0

    def close_row():
        nonlocal row_open, cur_lanes, rows_in_group
        row_open = False
        cur_lanes = 0
        rows_in_group += 1

    def close_group():
        nonlocal rows_in_group, cur_set
        if cur_set:
            group_chunks.append(
                np.asarray(sorted(cur_set), np.int64)
            )
            cur_set = set()
        rows_in_group = 0

    for t in range(n_t):
        cnt = int(t_counts[t])
        tch = tc_data[tc_ptr[t]:tc_ptr[t + 1]]
        blk = int(t_block[t])
        new_block = blk != cur_block
        need_new_row = (
            new_block or not row_open or cur_lanes + cnt > 128
        )
        if need_new_row and row_open:
            close_row()
        if new_block:
            close_group()
            cur_block = blk
        # Chunk budget: does this target fit the current group?
        add = [c for c in tch if c not in cur_set]
        if len(cur_set) + len(add) > span:
            if row_open:
                close_row()
            close_group()
            add = list(tch)
            need_new_row = True
        elif rows_in_group >= pair and not row_open:
            close_group()
            add = list(tch)
        if not row_open:
            row_start.append(t)
            row_blockl.append(blk)
            group_of_row.append(len(group_chunks))
            row_open = True
        cur_set.update(add)
        cur_lanes += cnt
    if row_open:
        close_row()
    close_group()

    n_rows = len(row_start)
    row_start = np.asarray(row_start, np.int64)
    row_block = np.asarray(row_blockl, np.int64)
    group_of_row = np.asarray(group_of_row, np.int64)
    row_of_t = np.repeat(
        np.arange(n_rows),
        np.diff(np.concatenate([row_start, [n_t]])),
    )

    # Steps: rows of one block grouped rows_per_step at a time.  Each
    # group of `pair` rows must land in one step-local stream slot, so
    # groups pad to `pair` rows: row ids are assigned group-major.
    n_groups = len(group_chunks)
    rows_g = np.bincount(group_of_row, minlength=n_groups)
    if (rows_g > pair).any():
        return None
    group_block = np.zeros(n_groups, np.int64)
    group_block[group_of_row] = row_block
    gb_change = np.flatnonzero(np.diff(group_block)) + 1
    gb_start = np.concatenate([[0], gb_change])
    gb_end = np.concatenate([gb_change, [n_groups]])
    groups_b = gb_end - gb_start
    gps = rows_per_step // pair              # groups per step
    steps_b = -(-groups_b // gps)
    nsteps_real = int(steps_b.sum())
    # One all-padding dummy step per block with no entries: its flush
    # writes the NaN the zero rwsum implies (otherwise the out block
    # would carry garbage).
    present = np.zeros(n_blocks, bool)
    present[group_block[gb_start]] = True
    missing = np.flatnonzero(~present)
    nsteps = nsteps_real + len(missing)
    n_pairs = gps
    if nsteps * rows_per_step * 3 * 128 * 4 > max_plan_bytes:
        return None
    if (nsteps + nsteps * n_pairs * span) * 4 + 64 > 900_000:
        return None  # SMEM scalar-prefetch budget

    # Global padded group/row ids.
    step0_b = np.concatenate([[0], np.cumsum(steps_b)[:-1]])
    g_bi = np.searchsorted(gb_end, np.arange(n_groups), side="right")
    glocal = np.arange(n_groups) - gb_start[g_bi]
    pgroup = step0_b[g_bi] * gps + glocal
    # Row slot within its group (rows of a group are consecutive).
    first_row_of_g = np.full(n_groups, n_rows, np.int64)
    np.minimum.at(
        first_row_of_g, group_of_row, np.arange(n_rows)
    )
    rslot = np.arange(n_rows) - first_row_of_g[group_of_row]
    prow = pgroup[group_of_row] * pair + rslot

    blkid = np.concatenate(
        [np.repeat(group_block[gb_start], steps_b), missing]
    ).astype(np.int32)

    # Stream table: group -> its sorted distinct chunks, padded with 0.
    bases = np.zeros((nsteps * n_pairs, span), np.int32)
    for g in range(n_groups):
        gc = group_chunks[g]
        bases[pgroup[g], : len(gc)] = gc.astype(np.int32)

    # Entry placement.
    e_row = row_of_t[e_t]
    e_prow = prow[e_row]
    lane = np.arange(nnz) - csum0[row_start[e_row]]
    tslot = (ti - (t_block[e_t] * block)).astype(np.int32)
    # k = position of the entry's chunk in its group's stream list.
    k_e = np.empty(nnz, np.int32)
    e_g = group_of_row[e_row]
    bounds = np.concatenate(
        [[0], np.flatnonzero(np.diff(e_g)) + 1, [nnz]]
    )
    for s, e in zip(bounds[:-1], bounds[1:]):
        gc = group_chunks[e_g[s]]
        k_e[s:e] = np.searchsorted(gc, chk[s:e]).astype(np.int32)

    ptab = np.zeros((nsteps * rows_per_step, 3, 128), np.int32)
    ptab[:, 2, :] = -1
    # Window size rides bits 12..17 (<= MAX_WINDOW = 32): when the
    # source is NaN-free the per-target valid count is plan-static, so
    # the kernel skips the whole n-counting all-pairs pass.
    wsz = t_counts[e_t].astype(np.int32)
    ptab[e_prow, 0, lane] = (
        (src & 127).astype(np.int32)
        | (k_e << 7)
        | (1 << 11)
        | (wsz << 12)
    )
    ptab[e_prow, 1, lane] = wts.view(np.int32)
    ptab[e_prow, 2, lane] = tslot

    rwsum = np.zeros(n_pad, np.float32)
    rwsum[:n] = np.where(valid, weights, 0.0).max(axis=1)
    rwraw = np.zeros(n_pad, np.float32)
    any_valid = valid.any(axis=1)
    rwraw[:n] = np.where(any_valid, weights.max(axis=1), 0.0)

    return SelectPlan(
        blkid=blkid,
        bases=bases.reshape(-1),
        ptab=ptab,
        rwsum=rwsum,
        rwraw=rwraw,
        dmax=dmax,
        pair=pair,
        span=span,
        rows=rows_per_step,
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
    pair: int,
    span: int,
    interpret: bool,
):
    n_pairs = rows_per_step // pair
    p = _method_p(method)

    def kernel(blkid_ref, bases_ref, *refs):
        ptab_ref, rwsum_ref = refs[0], refs[1]
        srcs = refs[2:2 + n_pairs * span]
        out_ref = refs[2 + n_pairs * span]
        acc = refs[2 + n_pairs * span + 1]

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
        k_p = (meta >> 7) & 15
        slotv = (meta >> 11) & 1
        w_p = jax.lax.bitcast_convert_type(tab[:, 1, :], jnp.float32)
        seg_p = tab[:, 2, :]

        def expand(x, reps=e_sub):
            return jnp.broadcast_to(
                x[:, None, :], (rows_per_step, reps, 128)
            ).reshape(rows_per_step * reps, 128)

        idx_e = expand(idx_p)
        # Gather per (group, k): all `pair` rows of a group read the
        # group's k-th chunk stream; lanes select on their k field.
        k_e = expand(k_p)
        pieces = []
        for pr in range(n_pairs):
            lo = pr * pair * e_sub
            hi = (pr + 1) * pair * e_sub
            idx_pair = idx_e[lo:hi]
            sel_pair = k_e[lo:hi]
            got = jnp.zeros((pair * e_sub, 128), jnp.float32)
            for k in range(span):
                table = jnp.broadcast_to(
                    srcs[pr * span + k][...].reshape(
                        1, e_sub, 128
                    ),
                    (pair, e_sub, 128),
                ).reshape(pair * e_sub, 128)
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
            okf = okv.astype(jnp.float32)
        else:
            # NaN-free: every in-segment partner is valid, so the
            # validity roll drops out of seg_mask and the valid count
            # is the plan-static window size (meta bits 12..17) — this
            # halves the all-pairs VPU work, the kernel's hot loop.
            okv = expand(ok)
            okf = None

        def pair_mask(d):
            """In-segment pair mask at roll distance +d (partner
            j = i - d), as an expanded f32 gate evaluated at lane i.
            The backward (sgn = -1) contribution of the old two-sided
            pass is recovered by depositing the complementary quantity
            at the partner with one roll(-d) — each unordered pair is
            visited ONCE (halves the hot-loop roll/compare work)."""
            seg_r = _roll(seg_p, d, interpret)
            edge = lanes >= d
            return expand(
                jnp.logical_and(seg_r == seg_p, edge)
            ).astype(jnp.float32)

        # Segmented all-pairs over roll distances 1..dmax, one-sided:
        # within each target's lane run count valid entries (n, NaN
        # path only), and per lane its rank among valid values (ties
        # -> lane order) [percentiles] or the weighted total of equal
        # values plus the run maxima for the lexicographic mode pick.
        # Pair (j = i - d, i): lane i counts [v_j <= v_i]; lane j's
        # mirrored count [v_i < v_j] = 1 - [v_j <= v_i] is computed at
        # lane i and rolled back by -d (wrapped lanes land where the
        # mask is zero, so the cyclic roll is safe).
        vs = jnp.where(okv, val, 0.0)
        n_tot = okf + 0.0 if has_nan else None
        if p is not None:
            rank = jnp.zeros_like(vs)
        else:
            w_e = expand(w_p)
            wv = jnp.where(okv, w_e, 0.0)
            total = wv + 0.0
        for d in range(1, dmax + 1):
            s = pair_mask(d)
            v_r = _roll(vs, d, interpret)
            if has_nan:
                # Validity gates are one-sided too: the receiving
                # lane's own validity must NOT gate its n/rank (an
                # invalid lane still carries its window's n for the
                # bad-window flag; rk discards it via okv later).
                m_i = s * _roll(okf, d, interpret)   # partner j valid
                m_j = s * okf                        # sender i valid
                n_tot = n_tot + m_i + _roll(m_j, -d, interpret)
            else:
                m_i = m_j = s
            if p is not None:
                c = (v_r <= vs).astype(jnp.float32)
                rank = rank + m_i * c
                rank = rank + _roll(m_j * (1.0 - c), -d, interpret)
            else:
                eq = (v_r == vs).astype(jnp.float32)
                w_r = _roll(wv, d, interpret)
                total = total + (m_i * eq) * w_r
                total = total + _roll(
                    (m_j * eq) * wv, -d, interpret
                )

        if p is not None:
            # rank/n are valid-only; invalid lanes must never match.
            nv = (
                n_tot
                if has_nan
                else expand((meta >> 12) & 63).astype(jnp.float32)
            )
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
            # (duplicate values tie on total; sum one copy).  One-sided
            # like the rank pass: per d, pull the partner's value
            # forward AND push the own value back with one roll each.
            def seg_max(x):
                out = x + 0.0
                for d in range(1, dmax + 1):
                    s = pair_mask(d)
                    if has_nan:
                        m_i = s * _roll(okf, d, interpret)
                        m_j = s * okf
                    else:
                        m_i = m_j = s
                    out = jnp.maximum(
                        out,
                        jnp.where(
                            m_i > 0.0,
                            _roll(x, d, interpret),
                            -jnp.inf,
                        ),
                    )
                    out = jnp.maximum(
                        out,
                        _roll(
                            jnp.where(m_j > 0.0, x, -jnp.inf),
                            -d,
                            interpret,
                        ),
                    )
                return out

            tmax = seg_max(total)
            best = jnp.where(
                jnp.logical_and(okv, total == tmax),
                jnp.where(okv, val, -jnp.inf),
                -jnp.inf,
            )
            vbest = seg_max(best)
            winf = jnp.logical_and(
                best == vbest, best > -jnp.inf
            ).astype(jnp.float32)
            first = winf + 0.0
            for d in range(1, dmax + 1):
                s = pair_mask(d)
                m = s * _roll(okf, d, interpret) if has_nan else s
                first = first * (
                    1.0 - m * _roll(winf, d, interpret)
                )
            contrib = first * vs
            # Reference gates mode on the max VALID weight (not the
            # raw window sum): all-zero valid weights or no valid
            # value -> NaN, even when rwsum > 0.  Rides the "bad"
            # chain (a NaN here would poison the extraction matmul).
            # NaN-free windows always have >= 1 valid value.
            empty = (
                n_tot == 0.0
                if has_nan
                else jnp.zeros_like(tmax, dtype=bool)
            )
            bad = jnp.logical_and(
                expand(ok),
                jnp.logical_or(empty, tmax == 0.0),
            )

        # Extraction: ONE batched one-hot matmul sums each target's
        # single contribution (and its bad-window flag) into its block
        # slot.  Rows concatenate on the contraction axis (K = rows *
        # 128): one K-tiled MXU chain replaces rows_per_step separate
        # K=128 matmuls (fewer issue slots, same FLOPs).
        nc = 2 if (p is None or has_nan) else 1
        K = rows_per_step * 128
        badf = bad.astype(jnp.float32)

        def rows_to_k(x):
            """(rows*e_sub, 128) -> (e_sub, rows*128): lane-axis concat
            of the per-row (e_sub, 128) tiles.  (A single
            reshape/transpose of the whole stack is an unsupported
            Mosaic shape cast on chip — per-tile concat lowers
            cleanly.)"""
            return jnp.concatenate(
                [
                    x[r * e_sub:(r + 1) * e_sub]
                    for r in range(rows_per_step)
                ],
                axis=1,
            )

        qu = rows_to_k(contrib)
        if nc == 2:
            qu = jnp.concatenate([qu, rows_to_k(badf)], axis=0)
        # Per-row lane->sublane reshape (128,)->(128,1) is the verified
        # Mosaic-supported form (scripts/roll_probe.py); the one-shot
        # (K, 1) shape cast of the whole seg_p stack is NOT (on-chip
        # Mosaic error: "infer-vector-layout: unsupported shape cast").
        ph = (
            jnp.concatenate(
                [
                    jnp.broadcast_to(
                        seg_p[r:r + 1, :].reshape(128, 1),
                        (128, block),
                    )
                    for r in range(rows_per_step)
                ],
                axis=0,
            )
            == jax.lax.broadcasted_iota(jnp.int32, (K, block), 1)
        ).astype(jnp.bfloat16)
        # Default TPU matmul precision rounds inputs to bf16 (observed
        # ~0.4% error on chip, none in interpret mode) and Mosaic
        # supports only DEFAULT/HIGHEST.  Manual 2-pass bf16 split: the
        # one-hot side is exact in bf16, so hi+lo recovers the f32
        # product to ~2^-17 at a third of HIGHEST's six MXU passes.
        qu_hi = qu.astype(jnp.bfloat16)
        qu_lo = (qu - qu_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dims = (((1,), (0,)), ((), ()))
        acc[...] += jax.lax.dot_general(
            qu_hi, ph, dims,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            qu_lo, ph, dims,
            preferred_element_type=jnp.float32,
        )

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
    # pltpu.roll rejects negative shifts; the lane axis is 128 wide.
    return pltpu.roll(x, shift % 128, axis=1)


@partial(
    jax.jit,
    static_argnames=(
        "method", "has_nan", "dmax", "block", "rows_per_step",
        "pair", "span", "n_blocks", "interpret",
    ),
)
def gather_select_apply(
    srcE, blkid, bases, ptab, rwsum,
    method: str = "median",
    has_nan: bool = True,
    dmax: int = 8,
    block: int = BLOCK,
    rows_per_step: int = ROWS,
    pair: int = 4,
    span: int = 12,
    n_blocks: int = 1,
    interpret: bool = False,
):
    """Selection apply: plan arrays from ``plan_gather_select``; srcE
    chunk-major staged as (E_sub, m_pad)."""
    e_sub, m_pad = srcE.shape
    ctot = m_pad // CHUNK
    chunks = srcE.reshape(e_sub, ctot, CHUNK).transpose(1, 0, 2)
    nsteps = blkid.shape[0]
    n_pairs = rows_per_step // pair
    n_pad = n_blocks * block

    def src_map(pr, k):
        def f(i, blk, bas):
            c = bas[(i * n_pairs + pr) * span + k]
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
            for k in range(span)
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
        pair, span, interpret,
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
        *([chunks] * (n_pairs * span)),
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
    if isinstance(plan, SplitSelectPlan):
        out_s = apply_windowed_select(
            source2d, indices, weights, method,
            has_nan=has_nan, plan=plan.small, interpret=interpret,
        )
        if out_s is None:
            return None
        out_b = apply_windowed_select(
            source2d, indices, weights, method,
            has_nan=has_nan, plan=plan.big, interpret=interpret,
        )
        if out_b is None:
            return None
        return np.where(plan.big_mask[: plan.n, None], out_b, out_s)
    if has_nan is None:
        has_nan = bool(np.isnan(source2d).any())
        if np.isinf(source2d).any():
            # inf NaN-poisons the whole 512-target block through the
            # one-hot extraction matmul (inf * 0 = NaN) — fall back.
            return None

    n_extra, m = source2d.shape
    e_sub = pad_sublanes(n_extra)
    c_needed = int(plan.bases.max()) + 1 if len(plan.bases) else 1
    m_pad = max(-(-m // CHUNK), c_needed) * CHUNK
    srcE = np.zeros((e_sub, m_pad), np.float32)
    srcE[:n_extra, :m] = source2d

    # Gate choice pins reduce.py: mode gates on the valid-masked max
    # weight, percentiles on the raw max (invalid slots included).
    # Plan tables ship to the device once per (plan, gate kind):
    # repeat applies over time slices must not re-upload ptab over the
    # remote tunnel every call (see aligned_apply._PLAN_DEV_CACHE).
    kind = "mode" if method == "mode" else "pct"
    ent = _PLAN_DEV_CACHE.get((id(plan), kind))
    if ent is not None and ent[0] is plan:
        dev = ent[1]
    else:
        gate = plan.rwsum if method == "mode" else plan.rwraw
        dev = (
            jnp.asarray(plan.blkid), jnp.asarray(plan.bases),
            jnp.asarray(plan.ptab), jnp.asarray(gate),
        )
        if len(_PLAN_DEV_CACHE) > 8:
            _PLAN_DEV_CACHE.clear()
        _PLAN_DEV_CACHE[(id(plan), kind)] = (plan, dev)
    out = gather_select_apply(
        jnp.asarray(srcE),
        *dev,
        method=method,
        has_nan=bool(has_nan),
        dmax=plan.dmax,
        block=plan.block,
        rows_per_step=plan.rows,
        pair=plan.pair,
        span=plan.span,
        n_blocks=len(plan.rwsum) // plan.block,
        interpret=interpret,
    )
    return np.asarray(out)[:n_extra, : plan.n].T
