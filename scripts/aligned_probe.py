"""Stage-isolated probe of the aligned kernel's inner loop on the TPU.

The 1M-config aligned apply is flat across r_step (16/32/64), rb (8/16)
and gm on/off — so the floor is per-ROW work whose pieces this probe
times at the REAL shapes (block=512, r_step=16, rb=8, e_sub=24,
w_chunks=64 double-buffered slabs resident in VMEM, itab/wtab streamed
per step).  Stages nest cumulatively:

  meta       SMEM meta reads + address math, acc init/flush only
  read       + per-row dynamic slab read (1, e_sub, 128), summed
  rowq       + Q_PACK broadcast/concat rowQ build (the 393KB batch)
  gather     + idxQ byte chain + take_along_axis
  chain      + weight multiply + Q_PACK band reduce
  full       + per-row dynamic acc RMW (the production loop)

Run on the chip:  python scripts/aligned_probe.py
Knobs: E (sublanes, default 24), RB, R_STEP, STEPS, REPS, PROBE_GROUPS.

DCE HAZARD (round-5 lesson): stages that retire only a SLICE of the
batch result (``acc[0] += x[:E]`` — rowq/gather/cmul) let Mosaic
dead-code-eliminate most of the work they claim to measure; their
ns/row reads low.  Only stages whose every row reaches an accumulator
(chain/full/cself/cqmaj/sgfull) measure the true cost.  Round-5
verdict from those: chain-structure variants (per-row reduce tree,
q-major big adds, static-group single-RMW batches) are IDENTICAL at
~59-60 ns/row on chip — the inner loop is issue-bound on the full
(Q*E, 128) gather+multiply+combine data flow, not on how rows are
reduced or retired.
"""

from __future__ import annotations

import os
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache"),
)

E = int(os.environ.get("E", "24"))
RB = int(os.environ.get("RB", "8"))
R_STEP = int(os.environ.get("R_STEP", "16"))
STEPS = int(os.environ.get("STEPS", "1536"))
REPS = int(os.environ.get("REPS", "200"))
INTERPRET = os.environ.get("INTERPRET") == "1"   # CPU smoke only
W = 64          # resident window chunks (single buffer half)
Q = 4           # Q_PACK
GROUPS = int(os.environ.get("PROBE_GROUPS", "4"))   # block / 128


STAGES = (
    "null", "meta", "read", "rowq", "gather", "chain", "full",
    # chain decompositions (all build on the gather stage):
    #   cmul   multiply by the expanded weights only, single final add
    #   cself  same-shape multiply val*val (no weight expand) + reduce
    #   cslot  slot-major: per-q (E,128) multiply-accumulate against a
    #          sublane-broadcast weight row (no (Q*E,128) expand)
    #   cqmaj  q-major batch layout: the Q-reduce becomes Q-1 big
    #          (RB*E,128) adds (no per-row slice/reshape tree) and the
    #          per-row RMW slices tot[j*E:(j+1)*E] as plain 2D slices
    #   sgfull full pipeline with STATIC group slotting: batch position
    #          j IS the group (requires GROUPS == RB), so the 8 per-row
    #          dynamic acc RMWs collapse into ONE static full-acc
    #          combine per batch — zero per-row ops after the gather
    "cmul", "cself", "cslot", "cqmaj", "sgfull",
)
SPAN = int(os.environ.get("SPAN", "16"))   # steps per manual plan DMA
SPAN_STAGES = ("snull", "sfull")


def make_span_kernel(stage: str):
    """Span-batched plan streaming: itab/wtab live in HBM (ANY) and a
    manual double-buffered DMA copies SPAN steps' worth at once — one
    DMA issue per SPAN steps instead of two BlockSpec copies per step.
    Measures whether the per-step scalar-core DMA orchestration is the
    2.16 us/step floor the BlockSpec probe shows."""

    def kernel(meta_ref, itab_hbm, wtab_hbm, slabs_ref, o_ref,
               acc, itab_s, wtab_s, sem0, sem1):
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)
        sp = i // SPAN
        off = (i % SPAN) * R_STEP
        slot = jax.lax.rem(sp, 2)

        @pl.when(i == 0)
        def _init():
            acc[...] = jnp.zeros((GROUPS, E, 128), jnp.float32)
            pltpu.make_async_copy(
                itab_hbm.at[pl.ds(0, SPAN * R_STEP)],
                itab_s.at[0], sem0,
            ).start()
            pltpu.make_async_copy(
                wtab_hbm.at[pl.ds(0, SPAN * R_STEP * Q)],
                wtab_s.at[0], sem0,
            ).start()

        # Span rotation: even spans ride sem0/buf0, odd spans
        # sem1/buf1 — each span's wait matches the semaphore its start
        # used (span 0 starts at _init on sem0; span k+1 starts at
        # span k's rotation on the other semaphore).
        nxt = (sp + 1) * SPAN * R_STEP
        at_rot = i % SPAN == 0

        def _rot(cur_sem, nxt_sem, cur_buf, nxt_buf):
            pltpu.make_async_copy(
                itab_hbm.at[pl.ds(0, SPAN * R_STEP)],
                itab_s.at[cur_buf], cur_sem,
            ).wait()
            pltpu.make_async_copy(
                wtab_hbm.at[pl.ds(0, SPAN * R_STEP * Q)],
                wtab_s.at[cur_buf], cur_sem,
            ).wait()

            @pl.when(nxt < nsteps * R_STEP)
            def _pref():
                pltpu.make_async_copy(
                    itab_hbm.at[pl.ds(nxt, SPAN * R_STEP)],
                    itab_s.at[nxt_buf], nxt_sem,
                ).start()
                pltpu.make_async_copy(
                    wtab_hbm.at[pl.ds(nxt * Q, SPAN * R_STEP * Q)],
                    wtab_s.at[nxt_buf], nxt_sem,
                ).start()

        @pl.when(jnp.logical_and(at_rot, slot == 0))
        def _rot_even():
            _rot(sem0, sem1, 0, 1)

        @pl.when(jnp.logical_and(at_rot, slot == 1))
        def _rot_odd():
            _rot(sem1, sem0, 1, 0)
        if stage == "snull":
            acc[pl.ds(0, 1)] = acc[pl.ds(0, 1)] + 1.0

            @pl.when(i == nsteps - 1)
            def _flush0():
                o_ref[...] = acc[pl.ds(0, 1)].reshape(E, 128)

            return

        bshift = (
            jax.lax.broadcasted_iota(jnp.int32, (RB * Q, 128), 0) % Q
        ) * 8
        mbase = i * (R_STEP // 2)

        def expand(x):
            k = x.shape[0]
            return jnp.broadcast_to(
                x[:, None, :], (k, E, 128)
            ).reshape(k * E, 128)

        for r0 in range(0, R_STEP, RB):
            cids = []
            grps = []
            for j in range(RB):
                r = r0 + j
                mw = meta_ref[mbase + (r >> 1)]
                mrow = (mw >> ((r & 1) * 16)) & 0xFFFF
                cids.append(mrow & 63)
                grps.append((mrow >> 6) & (GROUPS - 1))
            rowQ = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        slabs_ref[pl.ds(cids[j], 1)].reshape(
                            1, E, 128
                        ),
                        (Q, E, 128),
                    ).reshape(Q * E, 128)
                    for j in range(RB)
                ],
                axis=0,
            )
            idxw = itab_s[slot, pl.ds(off + r0, RB), :]
            idxR = jnp.broadcast_to(
                idxw[:, None, :], (RB, Q, 128)
            ).reshape(RB * Q, 128)
            byte4 = jnp.right_shift(idxR, bshift) & 255
            idxQ = expand(byte4 & 127)
            val = jnp.take_along_axis(rowQ, idxQ, axis=1)
            wQ = expand(
                wtab_s[slot, pl.ds((off + r0) * Q, RB * Q), :]
            )
            qs = val * wQ
            for j in range(RB):
                x = qs[j * Q * E:(j + 1) * Q * E].reshape(Q, E, 128)
                tot = (x[0] + x[1]) + (x[2] + x[3])
                cur = acc[pl.ds(grps[j], 1)].reshape(E, 128)
                acc[pl.ds(grps[j], 1)] = (cur + tot).reshape(
                    1, E, 128
                )

        @pl.when(i == nsteps - 1)
        def _flush():
            o_ref[...] = acc[pl.ds(0, 1)].reshape(E, 128)

    return kernel


@partial(jax.jit, static_argnames=("stage",))
def run_span(meta, itab, wtab, slabs, stage):
    return pl.pallas_call(
        make_span_kernel(stage),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(
                    (2 * W, E, 128), lambda i, m: (0, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec((E, 128), lambda i, m: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((GROUPS, E, 128), jnp.float32),
                pltpu.VMEM((2, SPAN * R_STEP, 128), jnp.int32),
                pltpu.VMEM((2, SPAN * R_STEP * Q, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((E, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=INTERPRET,
    )(meta, itab, wtab, slabs)


def make_kernel(stage: str):
    lvl = -1 if stage == "null" else STAGES.index(stage) - 1

    def kernel(meta_ref, itab_ref, wtab_ref, slabs_ref, o_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            acc[...] = jnp.zeros((GROUPS, E, 128), jnp.float32)

        if stage == "null":     # grid + block-DMA machinery only
            acc[pl.ds(0, 1)] = acc[pl.ds(0, 1)] + 1.0

            @pl.when(i == pl.num_programs(0) - 1)
            def _flush0():
                o_ref[...] = acc[pl.ds(0, 1)].reshape(E, 128)

            return

        bshift = (
            jax.lax.broadcasted_iota(jnp.int32, (RB * Q, 128), 0) % Q
        ) * 8
        mbase = i * (R_STEP // 2)

        def expand(x):
            k = x.shape[0]
            return jnp.broadcast_to(
                x[:, None, :], (k, E, 128)
            ).reshape(k * E, 128)

        for r0 in range(0, R_STEP, RB):
            cids = []
            grps = []
            for j in range(RB):
                r = r0 + j
                mw = meta_ref[mbase + (r >> 1)]
                mrow = (mw >> ((r & 1) * 16)) & 0xFFFF
                cids.append(mrow & 63)
                grps.append((mrow >> 6) & (GROUPS - 1))
            if stage == "cqmaj":
                # (q, j, e) layout: ONE j-concat of slabs broadcast Q
                # times; per-q 2D slices feed Q multiply-accumulates —
                # the per-row (Q,E,128) reshape/reduce tree disappears.
                rowJ = jnp.concatenate(
                    [
                        slabs_ref[pl.ds(cids[j], 1)].reshape(E, 128)
                        for j in range(RB)
                    ],
                    axis=0,
                )                                        # (RB*E, 128)
                rowQm = jnp.broadcast_to(
                    rowJ[None], (Q, RB * E, 128)
                ).reshape(Q * RB * E, 128)
                idxw = itab_ref[r0:r0 + RB, :]           # (RB, 128)
                idxR = jnp.broadcast_to(
                    idxw[None, :, :], (Q, RB, 128)
                ).reshape(Q * RB, 128)
                bq = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (Q * RB, 128), 0
                    )
                    // RB
                ) * 8
                byteQ = jnp.right_shift(idxR, bq) & 255
                idxQm = expand(byteQ & 127)
                valm = jnp.take_along_axis(rowQm, idxQm, axis=1)
                wrows = wtab_ref[r0 * Q:(r0 + RB) * Q, :]
                tot = None
                for q in range(Q):
                    # production plans would store wtab q-major; the
                    # probe's random weights just need SOME (RB,128)
                    # row block per q.
                    wq = expand(wrows[q * RB:(q + 1) * RB])
                    p_ = valm[q * RB * E:(q + 1) * RB * E] * wq
                    tot = p_ if tot is None else tot + p_
                for j in range(RB):
                    cur = acc[pl.ds(grps[j], 1)].reshape(E, 128)
                    acc[pl.ds(grps[j], 1)] = (
                        cur + tot[j * E:(j + 1) * E]
                    ).reshape(1, E, 128)
                continue
            if stage == "sgfull":
                # Static-group slotting: batch position j IS the group
                # (plan guarantees it), so after the q-major combine the
                # whole batch retires in ONE static acc RMW.
                rowJ = jnp.concatenate(
                    [
                        slabs_ref[pl.ds(cids[j], 1)].reshape(E, 128)
                        for j in range(RB)
                    ],
                    axis=0,
                )                                        # (RB*E, 128)
                rowQm = jnp.broadcast_to(
                    rowJ[None], (Q, RB * E, 128)
                ).reshape(Q * RB * E, 128)
                idxw = itab_ref[r0:r0 + RB, :]           # (RB, 128)
                idxR = jnp.broadcast_to(
                    idxw[None, :, :], (Q, RB, 128)
                ).reshape(Q * RB, 128)
                bq = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (Q * RB, 128), 0
                    )
                    // RB
                ) * 8
                byteQ = jnp.right_shift(idxR, bq) & 255
                idxQm = expand(byteQ & 127)
                valm = jnp.take_along_axis(rowQm, idxQm, axis=1)
                wrows = wtab_ref[r0 * Q:(r0 + RB) * Q, :]
                tot = None
                for q in range(Q):
                    wq = expand(wrows[q * RB:(q + 1) * RB])
                    p_ = valm[q * RB * E:(q + 1) * RB * E] * wq
                    tot = p_ if tot is None else tot + p_
                acc[...] = acc[...] + tot.reshape(RB, E, 128)
                continue
            if lvl == 0:        # meta: touch addresses cheaply
                acc[pl.ds(0, 1)] = acc[pl.ds(0, 1)] + (
                    (cids[0] + grps[0]).astype(jnp.float32)
                )
                continue
            if lvl == 1:        # read: RB dynamic slab reads, summed
                tot = jnp.zeros((E, 128), jnp.float32)
                for j in range(RB):
                    tot = tot + slabs_ref[pl.ds(cids[j], 1)].reshape(
                        E, 128
                    )
                acc[pl.ds(0, 1)] = (
                    acc[pl.ds(0, 1)] + tot.reshape(1, E, 128)
                )
                continue
            rowQ = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        slabs_ref[pl.ds(cids[j], 1)].reshape(
                            1, E, 128
                        ),
                        (Q, E, 128),
                    ).reshape(Q * E, 128)
                    for j in range(RB)
                ],
                axis=0,
            )
            if lvl == 2:        # rowq
                acc[pl.ds(0, 1)] = acc[pl.ds(0, 1)] + rowQ[
                    : E
                ].reshape(1, E, 128)
                continue
            idxw = itab_ref[r0:r0 + RB, :]
            idxR = jnp.broadcast_to(
                idxw[:, None, :], (RB, Q, 128)
            ).reshape(RB * Q, 128)
            byte4 = jnp.right_shift(idxR, bshift) & 255
            idxQ = expand(byte4 & 127)
            val = jnp.take_along_axis(rowQ, idxQ, axis=1)
            if lvl == 3:        # gather
                acc[pl.ds(0, 1)] = acc[pl.ds(0, 1)] + val[
                    : E
                ].reshape(1, E, 128)
                continue
            if stage == "cmul":
                # weight expand + multiply, NO per-row reduce tree
                wm = val * expand(wtab_ref[r0 * Q:(r0 + RB) * Q, :])
                acc[pl.ds(0, 1)] = acc[pl.ds(0, 1)] + wm[
                    : E
                ].reshape(1, E, 128)
                continue
            if stage == "cself":
                # same-shape multiply (no broadcast read) + full reduce
                qs2 = val * val
                for j in range(RB):
                    x = qs2[j * Q * E:(j + 1) * Q * E].reshape(
                        Q, E, 128
                    )
                    tot = (x[0] + x[1]) + (x[2] + x[3])
                    cur = acc[pl.ds(grps[j], 1)].reshape(E, 128)
                    acc[pl.ds(grps[j], 1)] = (cur + tot).reshape(
                        1, E, 128
                    )
                continue
            if stage == "cslot":
                # slot-major: per (j, q) multiply the (E, 128) value
                # band by a (1, 128) weight row broadcast on sublanes —
                # no (RB*Q*E, 128) weight materialization.
                wrows = wtab_ref[r0 * Q:(r0 + RB) * Q, :]
                for j in range(RB):
                    tot = None
                    for q in range(Q):
                        band = val[
                            (j * Q + q) * E:(j * Q + q + 1) * E
                        ]
                        wq = jnp.broadcast_to(
                            wrows[j * Q + q:j * Q + q + 1], (E, 128)
                        )
                        p = band * wq
                        tot = p if tot is None else tot + p
                    cur = acc[pl.ds(grps[j], 1)].reshape(E, 128)
                    acc[pl.ds(grps[j], 1)] = (cur + tot).reshape(
                        1, E, 128
                    )
                continue
            wQ = expand(wtab_ref[r0 * Q:(r0 + RB) * Q, :])
            qs = val * wQ
            tots = []
            for j in range(RB):
                x = qs[j * Q * E:(j + 1) * Q * E].reshape(Q, E, 128)
                tots.append((x[0] + x[1]) + (x[2] + x[3]))
            if lvl == 4:        # chain
                t = tots[0]
                for j in range(1, RB):
                    t = t + tots[j]
                acc[pl.ds(0, 1)] = acc[pl.ds(0, 1)] + t.reshape(
                    1, E, 128
                )
                continue
            for j in range(RB):  # full: per-row dynamic RMW
                cur = acc[pl.ds(grps[j], 1)].reshape(E, 128)
                acc[pl.ds(grps[j], 1)] = (cur + tots[j]).reshape(
                    1, E, 128
                )

        @pl.when(i == pl.num_programs(0) - 1)
        def _flush():
            o_ref[...] = acc[pl.ds(0, 1)].reshape(E, 128)

    return kernel


@partial(jax.jit, static_argnames=("stage",))
def run_probe(meta, itab, wtab, slabs, stage):
    return pl.pallas_call(
        make_kernel(stage),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((R_STEP, 128), lambda i, m: (i, 0)),
                pl.BlockSpec((R_STEP * Q, 128), lambda i, m: (i, 0)),
                # constant block -> loaded once, VMEM-resident like the
                # production kernel's slab scratch
                pl.BlockSpec(
                    (2 * W, E, 128), lambda i, m: (0, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec((E, 128), lambda i, m: (0, 0)),
            scratch_shapes=[pltpu.VMEM((GROUPS, E, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((E, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=INTERPRET,
    )(meta, itab, wtab, slabs)


@partial(jax.jit, static_argnames=("stage", "reps"))
def run_reps(meta, itab, wtab, slabs, stage, reps):
    def body(k, s):
        out = run_probe(
            meta, itab, wtab,
            slabs + k.astype(jnp.float32) * 1e-12, stage,
        )
        return s + jnp.sum(out)

    return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))


@partial(jax.jit, static_argnames=("stage", "reps"))
def run_reps_span(meta, itab, wtab, slabs, stage, reps):
    def body(k, s):
        out = run_span(
            meta, itab, wtab,
            slabs + k.astype(jnp.float32) * 1e-12, stage,
        )
        return s + jnp.sum(out)

    return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))


def main():
    rng = np.random.default_rng(0)
    rows = STEPS * R_STEP
    cid = rng.integers(0, W, rows).astype(np.int64)
    grp = rng.integers(0, GROUPS, rows).astype(np.int64)
    m16 = cid | (grp << 6)
    meta = (m16[0::2] | (m16[1::2] << 16)).astype(np.int32)
    itab = rng.integers(0, 2**31 - 1, (rows, 128), np.int64).astype(
        np.int32
    )
    wtab = rng.normal(size=(rows * Q, 128)).astype(np.float32)
    slabs = rng.normal(size=(2 * W, E, 128)).astype(np.float32)

    dm = jnp.asarray(meta)
    di = jnp.asarray(itab)
    dw = jnp.asarray(wtab)
    ds_ = jnp.asarray(slabs)

    only = os.environ.get("ONLY")
    stages = list(STAGES)
    if STEPS % SPAN == 0:
        stages += list(SPAN_STAGES)
    if only:
        stages = [s for s in stages if s in only.split(",")]

    prev = 0.0
    for stage in stages:
        runner = run_reps_span if stage in SPAN_STAGES else run_reps
        # Warm with the SAME reps value: reps is a static argname, so a
        # different value is a different executable and the timed call
        # would otherwise include compile/cache-deserialize (~1s) — this
        # exact bug produced a phantom "fixed 3.3 ms/pass floor" at
        # REPS=300 that derailed a round-4 perf investigation.
        _ = float(runner(dm, di, dw, ds_, stage, REPS))
        t0 = time.perf_counter()
        _ = float(runner(dm, di, dw, ds_, stage, REPS))
        dt = (time.perf_counter() - t0) / REPS
        ns_row = dt / rows * 1e9
        print(
            f"{stage:8s}: {dt*1e3:7.3f} ms/pass  {ns_row:7.1f} ns/row "
            f"(+{ns_row - prev:6.1f})"
        )
        prev = ns_row


if __name__ == "__main__":
    main()
