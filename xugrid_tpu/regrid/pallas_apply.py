"""
Pallas TPU kernels for the windowed regrid apply.

The XLA path gathers source rows from HBM per (target, window) pair.
These kernels exploit spatial locality instead: targets come in Hilbert/
raster order, so each block of targets reads a *contiguous* source
range.  The kernel DMAs that range into VMEM in (SUB, E) slabs and
resolves the window gathers locally as one-hot matmuls on the MXU — HBM
sees only streaming reads.

Work-skipping, planned host-side by ``plan_auto`` (measured on v5e, 1M
sources -> 262k targets, 2.4M nnz, 20 slices):

* The slab loop is dynamic per block: each block only pays
  ``ceil(span_b / SUB)`` DMA+matmul steps for its actual index span.
* The window loop is predicated per (block, slab) on the first/last
  window slot whose indices can fall in that slab (windows are sorted
  by source index at plan time) — each slot's one-hot pass runs for
  ~1.3 slabs instead of all of them.
* Matmuls run as a manual 3-pass bf16 split (hi*hi + hi*lo + lo*hi,
  ~1.5e-5 worst-case relative error) — half the MXU passes of
  ``Precision.HIGHEST``; validity/count matrices are {0,1}/small-int
  valued, bf16-exact, and need only 2 passes (or 1 when both sides are
  exact).  ``XUGRID_TPU_PALLAS_PRECISION=highest`` forces 6-pass f32.

NaN semantics: NaN-bearing sources take a *masked* variant — NaN source
values are zeroed before the MXU and their contribution removed through
a parallel validity matmul — matching ``regrid/reduce.py`` (which
matches the reference's numba kernels, xugrid/regrid/reduce.py:16-272).
NaN-free sources (detected by the caller) skip the validity matmuls.

Covered methods (the linear family — every reduction expressible as a
transformed weighted sum): mean, sum, first_order_conservative,
conductance, harmonic_mean, geometric_mean.  Selection-shaped methods
(min/max/mode/median/percentiles) are genuinely gather-shaped and stay
on the XLA window-gather path in apply.py.
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

#: rows per VMEM slab DMA. 1024 beats 2048 (25% less one-hot build work
#: on ~2.5k spans) and 512 (slab fixed costs).
SUB = 1024

#: target rows per kernel block (grid step).
BLOCK = 512

#: reductions expressible as masked weighted sums (MXU-resolvable).
PALLAS_METHODS = (
    "mean",
    "sum",
    "first_order_conservative",
    "conductance",
    "harmonic_mean",
    "geometric_mean",
)

#: methods needing the unweighted (multiplicity) scatter matrix.
_NEEDS_SMAT = {"sum", "geometric_mean"}

#: methods whose masking depends on values, not just NaNs.
_VALUE_MASKED = {"harmonic_mean", "geometric_mean"}


class Plan(NamedTuple):
    """Host-side plan for the tiled kernel (all i32 numpy arrays)."""

    starts: np.ndarray    # (n_blocks,) min source index per block
    n_subs: np.ndarray    # (n_blocks,) slab count per block
    j_lo: np.ndarray      # (n_blocks, max_subs) first window slot per slab
    j_hi: np.ndarray      # (n_blocks, max_subs) one-past-last slot per slab
    indices: np.ndarray   # (n_blocks*block, w) window indices, row-sorted
    weights: np.ndarray   # matching weights (f32)
    block: int
    n: int                # true target count (rows before padding)


def sort_rows(indices: np.ndarray, weights: np.ndarray):
    """Sort each window by source index (padding slots stay rightmost).
    Required by the per-slab window-slot predication."""
    key = np.where(indices < 0, np.iinfo(np.int32).max, indices)
    order = np.argsort(key, axis=1, kind="stable")
    return (
        np.take_along_axis(indices, order, axis=1),
        np.take_along_axis(weights, order, axis=1),
    )


def plan_spans(indices: np.ndarray, block: int):
    """
    Per-block source windows for the tiled kernel.

    Returns (starts (n_blocks,) i32, spans (n_blocks,) i64): the minimum
    source index and the span (max - min + 1, 0 for empty blocks) of
    every block of ``block`` consecutive target rows.
    """
    n = len(indices)
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    idx = indices
    if pad:
        idx = np.concatenate(
            [indices, np.full((pad, indices.shape[1]), -1, indices.dtype)]
        )
    grouped = idx.reshape(n_blocks, block, idx.shape[1])
    valid = grouped >= 0
    big = np.where(valid, grouped, np.iinfo(np.int32).max)
    small = np.where(valid, grouped, np.iinfo(np.int32).min)
    lo = big.reshape(n_blocks, -1).min(axis=1)
    hi = small.reshape(n_blocks, -1).max(axis=1)
    empty = lo > hi
    lo = np.where(empty, 0, lo)
    span = np.where(empty, 0, hi - lo + 1)
    return lo.astype(np.int32), span.astype(np.int64)


def plan_blocks(indices: np.ndarray, block: int, tile: int):
    """
    (starts, ok): slab offsets, and whether every block's window span
    fits within ``tile`` (fall back to the XLA path otherwise).
    """
    starts, spans = plan_spans(indices, block)
    return starts, bool((spans <= tile).all())


def plan_auto(
    indices: np.ndarray,
    weights: np.ndarray | None = None,
    block: int = BLOCK,
    max_scalar_bytes: int = 96_000,
    max_mean_slabs_per_slot: float = 4.0,
) -> Plan | None:
    """
    Plan the tiled apply, or None when the window structure has too
    little source locality for the slab kernel (each window slot would
    be re-scanned in too many slabs) or the per-slab slot tables exceed
    the SMEM budget — the caller falls back to the XLA gather path.
    """
    n = len(indices)
    if n == 0:
        return None
    if weights is None:
        weights = np.zeros(indices.shape, np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    weights = np.ascontiguousarray(weights, dtype=np.float32)
    indices, weights = sort_rows(indices, weights)
    starts, spans = plan_spans(indices, block)
    n_subs = np.maximum(-(-spans // SUB), 1).astype(np.int32)
    n_blocks = len(starts)
    max_subs = int(n_subs.max())
    if n_blocks * max_subs * 8 > max_scalar_bytes:
        return None

    pad = n_blocks * block - n
    idx = indices
    wts = weights
    if pad:
        idx = np.concatenate(
            [indices, np.full((pad, indices.shape[1]), -1, np.int32)]
        )
        wts = np.concatenate(
            [weights, np.zeros((pad, weights.shape[1]), np.float32)]
        )
    w = idx.shape[1]
    grouped = idx.reshape(n_blocks, block, w)
    valid = grouped >= 0
    # Slab range of each window slot: [min, max] over the block's rows
    # (conservative — a slot is scanned in every slab its column range
    # crosses, even if a specific slab holds none of its indices).
    big = np.where(valid, grouped, np.iinfo(np.int32).max)
    small = np.where(valid, grouped, np.iinfo(np.int32).min)
    col_lo = big.min(axis=1) - starts[:, None]          # (n_blocks, w)
    col_hi = small.max(axis=1) - starts[:, None]
    any_valid = valid.any(axis=1)                       # (n_blocks, w)
    k_lo = np.where(any_valid, col_lo // SUB, max_subs)
    k_hi = np.where(any_valid, col_hi // SUB, -1)
    ks = np.arange(max_subs)
    in_slab = (k_lo[:, :, None] <= ks) & (ks <= k_hi[:, :, None])
    any_j = in_slab.any(axis=1)                         # (n_blocks, max_subs)
    j_lo = np.where(any_j, in_slab.argmax(axis=1), 0).astype(np.int32)
    j_hi = np.where(
        any_j, w - in_slab[:, ::-1, :].argmax(axis=1), 0
    ).astype(np.int32)

    # Locality gate: mean number of slabs each (active) slot is scanned
    # in.  Raster/Hilbert-ordered problems sit near 1.3; scattered
    # indices blow up towards span/SUB and lose to the XLA gather.
    eff = float((j_hi - j_lo).sum())
    active = float(np.minimum(valid.sum(axis=1).max(axis=1), w).sum())
    if active > 0 and eff / active > max_mean_slabs_per_slot:
        return None
    return Plan(starts, n_subs, j_lo, j_hi, idx, wts, block, n)


def _mm(a, x, a_exact=False, x_exact=False, highest=False):
    """f32 matmul via manual bf16 splits.

    A full split costs 3 MXU passes (hi*hi + hi*lo + lo*hi, dropping the
    ~2^-16 lo*lo term); operands marked exact ({0,1} masks, small-int
    counts — exactly representable in bf16) skip their split.
    """
    dn = (((1,), (0,)), ((), ()))
    if highest:
        return jax.lax.dot_general(
            a, x, dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def dot(l, r):
        return jax.lax.dot_general(
            l, r, dn, preferred_element_type=jnp.float32
        )

    def split(v):
        hi = v.astype(jnp.bfloat16)
        lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    if a_exact and x_exact:
        return dot(a.astype(jnp.bfloat16), x.astype(jnp.bfloat16))
    if a_exact:
        ab = a.astype(jnp.bfloat16)
        xh, xl = split(x)
        return dot(ab, xh) + dot(ab, xl)
    if x_exact:
        ah, al = split(a)
        xb = x.astype(jnp.bfloat16)
        return dot(ah, xb) + dot(al, xb)
    ah, al = split(a)
    xh, xl = split(x)
    return dot(ah, xh) + (dot(ah, xl) + dot(al, xh))


def _make_kernel(method: str, has_nan: bool, highest: bool):
    """Build the kernel body for one reduction method (static)."""
    needs_smat = method in _NEEDS_SMAT
    # mean/sum/conservative on NaN-free sources take scalar (per-row)
    # denominators — no validity matmul at all.
    masked = has_nan or method in _VALUE_MASKED

    def kernel(starts_ref, n_subs_ref, jlo_ref, jhi_ref, idx_ref, w_ref,
               source_hbm, out_ref, *scratch):
        if needs_smat:
            wmat_ref, smat_ref, sub_vmem, sem = scratch
        else:
            wmat_ref, sub_vmem, sem = scratch
            smat_ref = None
        b = pl.program_id(0)
        start = starts_ref[b]
        n_sub = n_subs_ref[b]

        idx = idx_ref[...]  # (block, w)
        wts = w_ref[...]
        valid = idx >= 0
        local = jnp.where(valid, idx - start, -1)
        masked_w = jnp.where(valid, wts, 0.0)
        if method == "harmonic_mean":
            # Reference semantics: only weights > 0 participate.
            masked_w = jnp.where(masked_w > 0.0, masked_w, 0.0)
        elif method == "geometric_mean":
            # Reference semantics: weights are row-normalized first
            # (over all slots; padded ones carry weight 0).
            normsum = jnp.sum(masked_w, axis=1, keepdims=True)
            masked_w = masked_w / jnp.where(normsum == 0.0, 1.0, normsum)

        block, w = idx.shape
        sub, E = sub_vmem.shape
        iota = jax.lax.broadcasted_iota(jnp.int32, (block, sub), 1)
        mm = partial(_mm, highest=highest)

        # Mosaic has no general VMEM gather; instead fold the window
        # into a weighted scatter matrix and resolve it on the MXU:
        #   wmat[t, s] = sum_j masked_w[t, j] * (local[t, j] - s0 == s)
        #   num += wmat @ slab        (block, sub) x (sub, E)
        # Duplicate indices within a window accumulate their weights —
        # exactly the weighted-sum semantics.  smat is the same with
        # unit weights (multiplicities), for the unweighted sums.
        def body(k, acc):
            s0 = k * sub
            dma = pltpu.make_async_copy(
                source_hbm.at[pl.ds(start + s0, sub)], sub_vmem, sem
            )
            dma.start()

            # Build the scatter matrices while the DMA is in flight.
            # The slot loop is statically unrolled (Mosaic cannot slice
            # the minor axis dynamically) but predicated per (block,
            # slab): only slots whose sorted index range crosses this
            # slab run their one-hot pass.  Skipped slots contribute
            # nothing anyway (their hits are all outside the slab), so
            # this is purely a performance contract with plan_auto.
            lo_j = jlo_ref[b, k]
            hi_j = jhi_ref[b, k]
            wmat_ref[...] = jnp.zeros((block, sub), dtype=jnp.float32)
            if needs_smat:
                smat_ref[...] = jnp.zeros((block, sub), dtype=jnp.float32)
            for j in range(w):
                @pl.when(jnp.logical_and(j >= lo_j, j < hi_j))
                def _(j=j):
                    hit = iota == (local[:, j][:, None] - s0)
                    wmat_ref[...] += jnp.where(
                        hit, masked_w[:, j][:, None], 0.0
                    )
                    if needs_smat:
                        smat_ref[...] += hit.astype(jnp.float32)

            dma.wait()
            slab = sub_vmem[...]
            wmat = wmat_ref[...]
            if masked:
                nan = jnp.isnan(slab)
                fin = 1.0 - nan.astype(jnp.float32)
                clean = jnp.where(nan, 0.0, slab)
            else:
                clean = slab

            if method in ("mean", "first_order_conservative",
                          "conductance"):
                num = acc[0] + mm(wmat, clean)
                if masked:
                    return (num, acc[1] + mm(wmat, fin, x_exact=True))
                return (num,)
            if method == "sum":
                # UNWEIGHTED value sum; the weight sum only gates NaN.
                vsum = acc[0] + mm(smat_ref[...], clean, a_exact=True)
                if masked:
                    return (vsum, acc[1] + mm(wmat, fin, x_exact=True))
                return (vsum,)
            if method == "harmonic_mean":
                if has_nan:
                    use = jnp.logical_and(~nan, slab != 0.0)
                else:
                    use = slab != 0.0
                inv = jnp.where(use, 1.0 / jnp.where(use, slab, 1.0), 0.0)
                return (
                    acc[0] + mm(wmat, inv),
                    acc[1] + mm(wmat, use.astype(jnp.float32),
                                x_exact=True),
                )
            # geometric_mean
            if has_nan:
                ok_val = ~nan
            else:
                ok_val = jnp.full(slab.shape, True)
            use = jnp.logical_and(ok_val, slab > 0.0)
            lg = jnp.where(use, jnp.log(jnp.where(use, slab, 1.0)), 0.0)
            neg = jnp.logical_and(ok_val, slab < 0.0).astype(jnp.float32)
            return (
                acc[0] + mm(wmat, lg),
                acc[1] + mm(wmat, use.astype(jnp.float32), x_exact=True),
                acc[2] + mm(smat_ref[...], neg, a_exact=True, x_exact=True),
            )

        if method == "geometric_mean":
            n_acc = 3
        elif masked:
            n_acc = 2
        else:
            n_acc = 1
        init = tuple(
            jnp.zeros((block, E), dtype=jnp.float32) for _ in range(n_acc)
        )
        acc = jax.lax.fori_loop(0, n_sub, body, init)

        den_vec = jnp.sum(masked_w, axis=1, keepdims=True)  # (block, 1)
        if method == "mean":
            num = acc[0]
            den = acc[1] if masked else den_vec + jnp.zeros_like(num)
            out_ref[...] = jnp.where(
                den > 0.0, num / jnp.where(den == 0.0, 1.0, den), jnp.nan
            )
        elif method in ("first_order_conservative", "conductance"):
            num = acc[0]
            den = acc[1] if masked else den_vec + jnp.zeros_like(num)
            out_ref[...] = jnp.where(den != 0.0, num, jnp.nan)
        elif method == "sum":
            vsum = acc[0]
            wsum = acc[1] if masked else den_vec + jnp.zeros_like(vsum)
            out_ref[...] = jnp.where(wsum != 0.0, vsum, jnp.nan)
        elif method == "harmonic_mean":
            vagg, wsum = acc
            ok = jnp.logical_and(vagg != 0.0, wsum != 0.0)
            out_ref[...] = jnp.where(
                ok, wsum / jnp.where(ok, vagg, 1.0), jnp.nan
            )
        else:  # geometric_mean
            vagg, wsum, negs = acc
            # The reference's normsum != 0 condition is implied: all
            # normalized weights are 0 when normsum was 0.
            ok = jnp.logical_and(wsum != 0.0, negs == 0.0)
            out_ref[...] = jnp.where(
                ok, jnp.exp(vagg / jnp.where(ok, wsum, 1.0)), jnp.nan
            )

    return kernel


@partial(
    jax.jit,
    static_argnums=(7, 8, 9),
    static_argnames=("interpret", "highest"),
)
def pallas_windowed_apply(
    sourceT, indices, weights, starts, n_subs, j_lo, j_hi,
    block: int, method: str = "mean", has_nan: bool = True,
    interpret=False, highest=False,
):
    """
    sourceT: (m_padded, E) f32; indices/weights: (n_padded, w) with
    windows sorted by source index; starts/n_subs: (n_blocks,) i32 slab
    offsets and counts; j_lo/j_hi: (n_blocks, max_subs) per-slab window
    slot ranges.  n_padded = n_blocks * block; m_padded must allow
    reading [start, start + n_sub * SUB) for every block.
    Returns (n_padded, E) f32.
    """
    n_padded = indices.shape[0]
    n_blocks = n_padded // block
    E = sourceT.shape[1]

    scratch = [pltpu.VMEM((block, SUB), jnp.float32)]
    if method in _NEEDS_SMAT:
        scratch.append(pltpu.VMEM((block, SUB), jnp.float32))
    scratch += [pltpu.VMEM((SUB, E), jnp.float32), pltpu.SemaphoreType.DMA]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (block, indices.shape[1]), lambda b, *_: (b, 0)
            ),
            pl.BlockSpec(
                (block, weights.shape[1]), lambda b, *_: (b, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block, E), lambda b, *_: (b, 0)),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        _make_kernel(method, has_nan, highest),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_padded, E), jnp.float32),
        # The default 16 MB scoped-VMEM budget is conservative; the slab
        # plus the scatter matrices fit comfortably in a v5e core.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(starts, n_subs, j_lo, j_hi, indices, weights, sourceT)


def pad_minor_pallas(n_extra: int) -> int:
    """Lane padding for the slab minor axis (128-lane DMA tiles)."""
    return -(-n_extra // 128) * 128


def pad_for_plan(sourceT: np.ndarray, plan: Plan):
    """Pad sourceT so every block's slab reads stay in bounds and the
    minor dim is 128-lane aligned (Mosaic DMA requirement)."""
    m, E = sourceT.shape
    E_pad = pad_minor_pallas(E)
    ends = plan.starts.astype(np.int64) + plan.n_subs.astype(np.int64) * SUB
    m_needed = max(m, int(ends.max()) if len(ends) else m)
    if m_needed > m or E_pad > E:
        padded = np.zeros((m_needed, E_pad), dtype=np.float32)
        padded[:m, :E] = sourceT
        return padded
    return sourceT.astype(np.float32, copy=False)


def _use_highest() -> bool:
    return os.environ.get("XUGRID_TPU_PALLAS_PRECISION", "") == "highest"


def apply_windowed_pallas(
    sourceT: np.ndarray,
    indices: np.ndarray,
    weights: np.ndarray,
    method: str = "mean",
    has_nan: bool | None = None,
    block: int = BLOCK,
    plan: Plan | None = None,
    interpret: bool = False,
):
    """
    Host wrapper: plans slabs, pads, runs the kernel.  Returns None when
    the plan's locality/size preconditions fail (caller falls back to
    the XLA gather path).  ``plan`` may be passed to reuse a previous
    ``plan_auto`` result across applies.
    """
    if method not in PALLAS_METHODS:
        return None
    if plan is None:
        plan = plan_auto(indices, weights, block)
    if plan is None:
        return None
    if has_nan is None:
        has_nan = bool(np.isnan(sourceT).any())
    E = sourceT.shape[1]
    padded = pad_for_plan(sourceT, plan)
    out = pallas_windowed_apply(
        jnp.asarray(padded),
        jnp.asarray(plan.indices),
        jnp.asarray(plan.weights),
        jnp.asarray(plan.starts),
        jnp.asarray(plan.n_subs),
        jnp.asarray(plan.j_lo),
        jnp.asarray(plan.j_hi),
        plan.block,
        method,
        bool(has_nan),
        interpret=interpret,
        highest=_use_highest(),
    )
    return np.asarray(out)[: plan.n, :E]


def apply_windowed_mean_pallas(
    sourceT: np.ndarray,
    indices: np.ndarray,
    weights: np.ndarray,
    block: int = BLOCK,
    tile: int | None = None,
    interpret: bool = False,
):
    """Back-compat wrapper for the weighted-mean method."""
    del tile  # span bounds are now part of plan_auto's locality gate
    return apply_windowed_pallas(
        sourceT, indices, weights, "mean", block=block, interpret=interpret
    )
