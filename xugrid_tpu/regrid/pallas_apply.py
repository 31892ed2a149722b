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
  ``ceil(span_b / SUB)`` DMA+matmul steps for its actual index span,
  and slabs stream through two VMEM buffers (slab k+1's DMA is issued
  before slab k's matmul, hiding the per-step DMA latency).
* The scatter matrices are laid out (SUB, block) — window slots on the
  SUBLANE axis — so the slot loop is a dynamic ``fori_loop`` over
  sublane slices running EXACTLY the [lo_j, hi_j) slots whose sorted
  index range crosses the slab (~1.3 slabs per slot), with no
  unrolled-branch overhead (Mosaic allows dynamic second-minor ref
  indexing; dynamic lane slicing it does not).
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

#: rows per VMEM slab DMA.  With the double-buffered pair loop and the
#: dynamic slot loop, 512 wins (measured 15.3 ms vs 15.6/17.4 for
#: 1024/2048 at 1M faces x 20 slices): smaller scatter tiles beat the
#: per-step fixed costs once DMA latency is prefetched away.
SUB = 512

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
    max_mean_slabs_per_slot: float = 12.0,
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
    # Only starts/n_subs ride SMEM scalar prefetch; the per-slab slot
    # tables are VMEM block inputs, so their size no longer gates the
    # plan (this previously rejected the 10M-face north-star config).
    if n_blocks * 8 > max_scalar_bytes:
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
    # in.  Raster/Hilbert-ordered problems sit near 2.6 at 1M faces and
    # 7.6 at 10M (measured; the kernel still beats the XLA gather 5.8x
    # there — the 12.0 cap leaves headroom over that data point);
    # genuinely scattered indices blow up towards span/SUB (tens to
    # thousands at scale) and lose to the XLA gather.
    eff = float((j_hi - j_lo).sum())
    active = float(any_valid.sum())  # active slots per block, summed
    if active > 0 and eff / active > max_mean_slabs_per_slot:
        return None
    return Plan(starts, n_subs, j_lo, j_hi, idx, wts, block, n)


def _mm(a, x, a_exact=False, x_exact=False, highest=False, tn=False):
    """f32 matmul via manual bf16 splits.

    A full split costs 3 MXU passes (hi*hi + hi*lo + lo*hi, dropping the
    ~2^-16 lo*lo term); operands marked exact ({0,1} masks, small-int
    counts — exactly representable in bf16) skip their split.
    ``tn=True`` contracts dim 0 of BOTH operands ((K, M) x (K, N) ->
    (M, N)), the layout of the transposed scatter matrices.
    """
    dn = (((0,), (0,)), ((), ())) if tn else (((1,), (0,)), ((), ()))
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

    def kernel(starts_ref, n_subs_ref, jtab_ref, idxT_ref,
               wT_ref, rwsum_ref, source_hbm, out_ref, *scratch):
        if needs_smat:
            (wmat_ref, smat_ref, local_ref, mw_ref,
             sub_a, sub_b, sem_a, sem_b) = scratch
        else:
            (wmat_ref, local_ref, mw_ref,
             sub_a, sub_b, sem_a, sem_b) = scratch
            smat_ref = None
        b = pl.program_id(0)
        start = starts_ref[b]
        n_sub = n_subs_ref[b]
        max_subs = jtab_ref.shape[1]

        idx = idxT_ref[...]  # (w, block) — slots on the SUBLANE axis
        wts = wT_ref[...]
        valid = idx >= 0
        local = jnp.where(valid, idx - start, -1)
        masked_w = jnp.where(valid, wts, 0.0)
        if method == "harmonic_mean":
            # Reference semantics: only weights > 0 participate.
            masked_w = jnp.where(masked_w > 0.0, masked_w, 0.0)
        elif method == "geometric_mean":
            # Reference semantics: weights are row-normalized first
            # (over all slots; padded ones carry weight 0).
            normsum = jnp.sum(masked_w, axis=0, keepdims=True)
            masked_w = masked_w / jnp.where(normsum == 0.0, 1.0, normsum)
        # Stage the transformed tables into scratch so the slot loop can
        # slice them dynamically (dynamic indexing is a ref operation).
        local_ref[...] = local
        mw_ref[...] = masked_w

        w, block = idx.shape
        sub, E = sub_a.shape
        iota = jax.lax.broadcasted_iota(jnp.int32, (sub, block), 0)
        mm = partial(_mm, highest=highest, tn=True)

        def slab_dma(k, buf, sem):
            return pltpu.make_async_copy(
                source_hbm.at[pl.ds(start + k * sub, sub)], buf, sem
            )

        # Mosaic has no general VMEM gather; instead fold the window
        # into a weighted scatter matrix and resolve it on the MXU:
        #   wmat[s, t] = sum_j masked_w[j, t] * (local[j, t] - s0 == s)
        #   num += wmat^T-contract slab    (sub, block) x (sub, E)
        # Duplicate indices within a window accumulate their weights —
        # exactly the weighted-sum semantics.  smat is the same with
        # unit weights (multiplicities), for the unweighted sums.
        #
        # Slots live on the SUBLANE axis, so the slot loop is a dynamic
        # fori_loop over sublane slices (Mosaic allows dynamic
        # second-minor indexing; lanes it does not) — it runs EXACTLY
        # the [lo_j, hi_j) slots plan_auto assigned to this slab, with
        # no unrolled-branch overhead.
        def build(k):
            # Out-of-range k (odd-count tail) reads a clamped table
            # entry; plan_auto emits lo_j == hi_j there, so the loop
            # body never runs and the matrices stay zero.
            kc = jnp.minimum(k, max_subs - 1)
            s0 = k * sub
            # The slot table is a VMEM block slice (1, max_subs, 128):
            # the slab index kc lands on the SUBLANE axis (dynamic
            # sublane indexing is legal; lanes would not be) and lo/hi
            # sit at static lanes 0/1.  SMEM no longer bounds the
            # table size, which unblocks the 10M-face plan.
            lo_j = jtab_ref[0, kc, 0]
            hi_j = jtab_ref[0, kc, 1]
            is_real = k < n_sub
            lo_j = jnp.where(is_real, lo_j, 0)
            hi_j = jnp.where(is_real, hi_j, 0)
            wmat_ref[...] = jnp.zeros((sub, block), dtype=jnp.float32)
            if needs_smat:
                smat_ref[...] = jnp.zeros((sub, block), dtype=jnp.float32)

            def slot(j, _):
                localj = local_ref[pl.ds(j, 1), :]  # (1, block)
                wj = mw_ref[pl.ds(j, 1), :]
                hit = iota == (localj - s0)  # (sub, block)
                wmat_ref[...] += jnp.where(hit, wj, 0.0)
                if needs_smat:
                    smat_ref[...] += hit.astype(jnp.float32)
                return 0

            jax.lax.fori_loop(lo_j, hi_j, slot, 0)

        def contrib(slab):
            wmat = wmat_ref[...]
            if masked:
                nan = jnp.isnan(slab)
                fin = 1.0 - nan.astype(jnp.float32)
                clean = jnp.where(nan, 0.0, slab)
            else:
                clean = slab

            if method in ("mean", "first_order_conservative",
                          "conductance"):
                if masked:
                    return (mm(wmat, clean), mm(wmat, fin, x_exact=True))
                return (mm(wmat, clean),)
            if method == "sum":
                # UNWEIGHTED value sum; the weight sum only gates NaN.
                vsum = mm(smat_ref[...], clean, a_exact=True)
                if masked:
                    return (vsum, mm(wmat, fin, x_exact=True))
                return (vsum,)
            if method == "harmonic_mean":
                if has_nan:
                    use = jnp.logical_and(~nan, slab != 0.0)
                else:
                    use = slab != 0.0
                inv = jnp.where(use, 1.0 / jnp.where(use, slab, 1.0), 0.0)
                return (
                    mm(wmat, inv),
                    mm(wmat, use.astype(jnp.float32), x_exact=True),
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
                mm(wmat, lg),
                mm(wmat, use.astype(jnp.float32), x_exact=True),
                mm(smat_ref[...], neg, a_exact=True, x_exact=True),
            )

        # Double-buffered pair loop: slab k+1 streams into the other
        # buffer while slab k is built and resolved — hides the per-step
        # DMA latency that otherwise dominates (measured 7.7 ms of a
        # 16.4 ms pass at 1M faces with the serial one-buffer loop).
        def body(p, acc):
            k0 = 2 * p
            k1 = k0 + 1

            @pl.when(k1 < n_sub)
            def _():
                slab_dma(k1, sub_b, sem_b).start()

            build(k0)
            slab_dma(k0, sub_a, sem_a).wait()
            c0 = contrib(sub_a[...])
            acc = tuple(a + c for a, c in zip(acc, c0))

            @pl.when(k0 + 2 < n_sub)
            def _():
                slab_dma(k0 + 2, sub_a, sem_a).start()

            build(k1)
            ok1 = k1 < n_sub

            @pl.when(ok1)
            def _():
                slab_dma(k1, sub_b, sem_b).wait()

            # Tail guard: with an odd slab count the k1 matrices are all
            # zero and the where() discards the (stale-buffer) products.
            c1 = contrib(sub_b[...])
            acc = tuple(
                a + jnp.where(ok1, c, 0.0) for a, c in zip(acc, c1)
            )
            return acc

        if method == "geometric_mean":
            n_acc = 3
        elif masked:
            n_acc = 2
        else:
            n_acc = 1
        init = tuple(
            jnp.zeros((block, E), dtype=jnp.float32) for _ in range(n_acc)
        )

        # First block of the pass: scrub buffer B — uninitialized VMEM
        # may hold NaN bit patterns that would poison the tail-guard
        # products (0 * NaN) before any real slab lands in it.
        @pl.when(b == 0)
        def _():
            sub_b[...] = jnp.zeros((sub, E), dtype=jnp.float32)

        slab_dma(0, sub_a, sem_a).start()
        n_pair = (n_sub + 1) // 2
        acc = jax.lax.fori_loop(0, n_pair, body, init)

        # Row weight sums come in as a (block, 1) input — the transposed
        # layout puts slots on sublanes, so an in-kernel axis-0 sum
        # would land on lanes, mismatching the (block, E) accumulators.
        den_vec = rwsum_ref[...]  # (block, 1)
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
    w = indices.shape[1]

    # The kernel wants slots on sublanes: transpose the window tables
    # (loop-invariant under an outer rep loop — XLA hoists the copies)
    # and precompute the per-row weight sums for the NaN-free paths.
    idxT = indices.T  # (w, n_padded)
    wT = weights.T
    rwsum = jnp.sum(
        jnp.where(indices >= 0, weights, 0.0), axis=1, keepdims=True
    )

    scratch = [pltpu.VMEM((SUB, block), jnp.float32)]
    if method in _NEEDS_SMAT:
        scratch.append(pltpu.VMEM((SUB, block), jnp.float32))
    scratch += [
        pltpu.VMEM((w, block), jnp.int32),    # staged local indices
        pltpu.VMEM((w, block), jnp.float32),  # staged masked weights
        pltpu.VMEM((SUB, E), jnp.float32),  # slab buffer A
        pltpu.VMEM((SUB, E), jnp.float32),  # slab buffer B
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]

    max_subs = j_lo.shape[1]
    subs_pad = -(-max_subs // 8) * 8
    # Slot table as a 3D VMEM input: (n_blocks, subs_pad, 128) with
    # lo/hi at lanes 0/1 (padded rows are zero -> empty slot ranges).
    jtab = jnp.zeros((n_blocks, subs_pad, 128), jnp.int32)
    jtab = jtab.at[:, :max_subs, 0].set(j_lo).at[:, :max_subs, 1].set(j_hi)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, subs_pad, 128), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((w, block), lambda b, *_: (0, b)),
            pl.BlockSpec((w, block), lambda b, *_: (0, b)),
            pl.BlockSpec((block, 1), lambda b, *_: (b, 0)),
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
    )(starts, n_subs, jtab, idxT, wT, rwsum, sourceT)


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
