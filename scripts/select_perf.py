"""Slope-timed select-kernel (median/mode/percentile) measurement at
the 1M bench config — the isolated number behind bench.py's
``select_median_s_per_pass`` (VERDICT r4 item 4: target <= 4 ms).

Run on chip:  python scripts/select_perf.py
Knobs: METHOD (median), E (20), REPS_LO/HI via _sweep_common.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _sweep_common import REPS_HI, REPS_LO, build_weights  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

METHOD = os.environ.get("METHOD", "median")
E = int(os.environ.get("E", "20"))


def main():
    from xugrid_tpu.regrid.gather_apply import CHUNK, pad_sublanes
    from xugrid_tpu.regrid.select_apply import (
        gather_select_apply,
        plan_gather_select,
    )

    t0 = time.perf_counter()
    grid, target, csr, padded = build_weights()
    print(f"# build {time.perf_counter()-t0:.1f}s nnz={csr.nnz}",
          file=sys.stderr)
    t0 = time.perf_counter()
    splan = plan_gather_select(padded.indices, padded.weights)
    subplans = (
        list(splan.plans()) if hasattr(splan, "plans")
        else [splan]
    )
    print(f"# plan {time.perf_counter()-t0:.1f}s "
          f"subplans={[(sp.rows, sp.dmax, sp.span) for sp in subplans]}",
          file=sys.stderr)

    rng = np.random.default_rng(1)
    source = rng.normal(size=(E, grid.n_face)).astype(np.float32)
    e_sub = pad_sublanes(E)
    c_needed = max(
        int(sp.bases.max()) + 1 if len(sp.bases) else 1
        for sp in subplans
    )
    m_pad = max(-(-grid.n_face // CHUNK), c_needed) * CHUNK
    srcE = np.zeros((e_sub, m_pad), np.float32)
    srcE[:E, : grid.n_face] = source

    @partial(jax.jit, static_argnames=(
        "method", "dmax", "pair", "span", "rows", "n_blocks"))
    def reps_fn(srcE, blkid, bases, ptab, rw, n_reps,
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

    total = 0.0
    for sp in subplans:
        args = (
            jnp.asarray(srcE), jnp.asarray(sp.blkid),
            jnp.asarray(sp.bases), jnp.asarray(sp.ptab),
            jnp.asarray(sp.rwraw),
        )
        statics = (METHOD, sp.dmax, sp.pair, sp.span, sp.rows,
                   len(sp.rwsum) // sp.block)
        t0 = time.perf_counter()
        _ = float(reps_fn(*args, jnp.int32(REPS_LO), *statics))
        print(f"# compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        t_lo = t_hi = np.inf
        for _k in range(2):
            t0 = time.perf_counter()
            _ = float(reps_fn(*args, jnp.int32(REPS_LO), *statics))
            t_lo = min(t_lo, time.perf_counter() - t0)
            t0 = time.perf_counter()
            _ = float(reps_fn(*args, jnp.int32(REPS_HI), *statics))
            t_hi = min(t_hi, time.perf_counter() - t0)
        p = (t_hi - t_lo) / (REPS_HI - REPS_LO)
        total += p
        print(f"subplan rows={sp.rows} dmax={sp.dmax} span={sp.span}: "
              f"{p*1e3:.2f} ms/pass")
    print(f"{METHOD} total: {total*1e3:.2f} ms/pass "
          f"(target <= 4 ms at the 1M config)")


if __name__ == "__main__":
    main()
