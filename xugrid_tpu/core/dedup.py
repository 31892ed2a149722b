"""
Sort-based row deduplication — the merge/collective-path kernel.

``merge_partitions`` deduplicates stacked node coordinates and
connectivity rows (reference: host ``np.unique(axis=0)``,
xugrid/ugrid/partitioning.py:81-148, a bytewise void-view sort).  Here
the heavy work — an O(n log n) multi-key sort plus neighbor-equality
grouping — runs as ONE jitted XLA program with static shapes:

* rows are bitcast to uint32 key columns (f64 -> 2 columns), so
  equality grouping is exactly bytewise like the reference's void view
  (distinct NaN payloads and ±0.0 stay distinct);
* ``lexsort`` over the columns brings equal rows together, a cumsum
  over the neighbor-inequality mask labels groups, and a segment-min
  recovers each group's first occurrence — no data-dependent shapes;
* inputs are padded to power-of-two buckets (pad rows duplicate row 0,
  which cannot create a group or disturb first-occurrence minima), so
  compiles are reused across merge calls;
* the host does only the O(n_unique) compaction.

Small inputs take a numpy path (the device round trip over the remote
tunnel costs more than the sort below ~64k rows).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax

#: row count above which the dedup runs on device.
_DEVICE_MIN = 1 << 16


def _to_u32_columns(rows: np.ndarray) -> np.ndarray:
    """View each row as uint32 key columns (bytewise equality)."""
    rows = np.ascontiguousarray(rows)
    if rows.ndim != 2:
        raise ValueError(f"expected 2D rows, got shape {rows.shape}")
    if rows.dtype.itemsize % 4 != 0:
        # Promote sub-4-byte ints; exact for all practical connectivity.
        rows = rows.astype(np.int32)
    return rows.view(np.uint32).reshape(rows.shape[0], -1)


@partial(jax.jit, static_argnums=(1,))
def _group_rows_device(cols, n_cols: int):
    import jax.numpy as jnp
    from jax import ops

    n = cols.shape[0]
    order = jnp.lexsort(tuple(cols[:, c] for c in range(n_cols - 1, -1, -1)))
    s = cols[order]
    neq = jnp.any(s[1:] != s[:-1], axis=1)
    is_first = jnp.concatenate([jnp.ones(1, dtype=bool), neq])
    group = jnp.cumsum(is_first) - 1  # group id per sorted position
    inverse = (
        jnp.zeros(n, dtype=jnp.int32).at[order].set(group.astype(jnp.int32))
    )
    # First occurrence (minimum original index) per group; padded to n.
    rep = ops.segment_min(order.astype(jnp.int32), group, num_segments=n)
    n_unique = group[-1] + 1
    return inverse, rep, n_unique


def unique_rows(rows: np.ndarray):
    """
    Deduplicate rows by exact (bytewise) equality.

    Returns ``(index, inverse)`` where ``index`` holds the ascending
    original positions of first occurrences (``rows[index]`` is the
    unique set in first-seen order) and ``inverse`` maps every row to
    its position in that first-seen ordering.
    """
    n = len(rows)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)

    mode = os.environ.get("XUGRID_TPU_DEDUP", "auto")
    # auto: the device path needs a LOCAL backend — over the remote TPU
    # tunnel a cold compile costs minutes, dwarfing the ~1 s/M-row host
    # sort.  XUGRID_TPU_DEDUP=device forces it (multi-chip merges, local
    # chips); =host forces numpy.
    use_device = mode == "device" or (
        mode == "auto"
        and n >= _DEVICE_MIN
        and jax.default_backend() == "cpu"
    )
    if use_device:
        try:
            cols = _to_u32_columns(rows)
            n_pad = 1 << int(np.ceil(np.log2(max(n, 2))))
            if n_pad > n:
                cols = np.concatenate(
                    [cols, np.broadcast_to(cols[0], (n_pad - n, cols.shape[1]))]
                )
            inverse_d, rep_d, n_unique_d = _group_rows_device(
                cols, cols.shape[1]
            )
            n_unique = int(n_unique_d)
            inverse_group = np.asarray(inverse_d[:n], dtype=np.int64)
            rep = np.asarray(rep_d[:n_unique], dtype=np.int64)
        except Exception:  # pragma: no cover - device fallback
            use_device = False
    if not use_device:
        # Native hash join (csrc unique_rows_hash): one first-seen-order
        # open-addressing pass, no sort at all.  rep is already
        # ascending and inverse already first-seen-numbered.
        from xugrid_tpu.utils.native import unique_rows_hash_native

        native = unique_rows_hash_native(np.ascontiguousarray(rows))
        if native is not None:
            rep, inverse, _count = native
            return rep, inverse
        # Stable lexsort over u32 key columns + neighbor grouping: the
        # same algorithm as the device kernel, in numpy.  This replaces
        # a bytewise void-view np.unique whose void-comparison sort ran
        # ~20x slower (126.8 s for the 4-way 10M-node merge in r02).
        cols = _to_u32_columns(rows)
        n_cols = cols.shape[1]
        order = np.lexsort(
            tuple(cols[:, c] for c in range(n_cols - 1, -1, -1))
        )
        s = cols[order]
        is_first = np.empty(n, dtype=bool)
        is_first[0] = True
        np.any(s[1:] != s[:-1], axis=1, out=is_first[1:])
        group = np.cumsum(is_first) - 1
        inverse_group = np.empty(n, dtype=np.int64)
        inverse_group[order] = group
        # lexsort is stable, so each group's first sorted element holds
        # the minimum original index — np.unique's return_index.
        rep = order[is_first]

    # Renumber groups to first-seen order: groups sorted by their first
    # occurrence position.
    order = np.argsort(rep, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    index = rep[order]
    inverse = rank[inverse_group]
    return index, inverse
