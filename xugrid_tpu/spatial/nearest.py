"""
Batched nearest-neighbor queries on device.

The reference's nearest lookups go through scipy KDTree with thread
workers (xugrid/ugrid/ugridbase.py:1114-1123, 1275-1303).  Tree descent
is scalar, branchy work — the opposite of what a TPU wants.  The
TPU-native formulation is the classic distance matmul:

    d^2(q, s) = |q|^2 + |s|^2 - 2 q . s

computed per SOURCE TILE on the MXU with a running (best distance,
best index) reduction — dense, branch-free, batched over every query
lane at once.  For P queries and M sources this is O(P * M) FLOPs
instead of O(P log M) scalar steps; on the MXU that trade wins by
orders of magnitude until M grows huge, at which point the host KDTree
(C, threaded) is used instead.  ``nearest_points`` picks automatically.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

#: source-tile length per scan step (lanes of the distance matmul).
TILE = 2048

#: device path engages above this many query-source pairs.  The
#: crossover sits high: the threaded KDTree handles 3e8 pairs in tens
#: of milliseconds, while the first Mosaic compile over the remote
#: tunnel costs minutes — only sustained million-query workloads
#: amortize the MXU path (force with XUGRID_TPU_NEAREST=device).
_MIN_WORK = 1 << 36
#: ...and below this many sources (tiling the queries too would win
#: back more range, but the KDTree is already fine there).
_MAX_SOURCES = 1 << 21


@partial(jax.jit, static_argnames=("n_tiles",))
def _nearest_device(queries, sources_padded, n_tiles: int):
    """(P, 2) queries vs (n_tiles * TILE, 2) sources -> (best_d2, idx)."""
    q2 = jnp.sum(queries * queries, axis=1, keepdims=True)  # (P, 1)
    tiles = sources_padded.reshape(n_tiles, TILE, 2)

    def body(carry, inp):
        best_d2, best_idx = carry
        tile, t = inp
        s2 = jnp.sum(tile * tile, axis=1)[None, :]  # (1, T)
        cross = queries @ tile.T  # (P, T) — the MXU pass
        d2 = q2 + s2 - 2.0 * cross
        arg = jnp.argmin(d2, axis=1)
        tile_d2 = jnp.take_along_axis(d2, arg[:, None], axis=1)[:, 0]
        better = tile_d2 < best_d2
        best_d2 = jnp.where(better, tile_d2, best_d2)
        best_idx = jnp.where(
            better, (t * TILE + arg).astype(jnp.int32), best_idx
        )
        return (best_d2, best_idx), None

    init = (
        jnp.full(queries.shape[0], jnp.inf, queries.dtype),
        jnp.full(queries.shape[0], -1, jnp.int32),
    )
    (best_d2, best_idx), _ = jax.lax.scan(
        body, init, (tiles, jnp.arange(n_tiles, dtype=jnp.int32))
    )
    return best_d2, best_idx


def nearest_points(
    sources: np.ndarray,
    queries: np.ndarray,
    max_distance: float = np.inf,
    tree=None,
):
    """
    Index of the nearest source per query (-1 beyond ``max_distance``).

    Dispatches between the MXU distance-matmul kernel and the host
    KDTree by problem shape and backend; XUGRID_TPU_NEAREST=
    device|host overrides.  ``tree`` may pass a prebuilt
    scipy KDTree over ``sources`` so repeated host-path lookups skip
    the O(M log M) construction (the grids cache theirs).
    """
    sources = np.ascontiguousarray(sources, dtype=np.float64)
    queries = np.atleast_2d(np.ascontiguousarray(queries, dtype=np.float64))
    P, M = len(queries), len(sources)
    mode = os.environ.get("XUGRID_TPU_NEAREST", "auto")
    use_device = mode == "device" or (
        mode == "auto"
        and P * M >= _MIN_WORK
        and M <= _MAX_SOURCES
        and jax.default_backend() != "cpu"
    )
    if not use_device or M == 0:
        if tree is None:
            from scipy.spatial import KDTree

            tree = KDTree(sources)
        _, indices = tree.query(
            queries, distance_upper_bound=max_distance, workers=-1
        )
        indices = np.asarray(indices, dtype=np.int64)
        indices[indices == M] = -1
        return indices

    n_tiles = -(-M // TILE)
    # The kernel computes in f32: shift to a local origin first so
    # large-magnitude coordinate systems (UTM ~1e6) keep their relative
    # precision instead of collapsing to the ~0.1 m f32 grid.
    origin = sources.mean(axis=0)
    # Pad with a huge FINITE coordinate: |pad|^2 overflows f32 to +inf
    # (losing every argmin), whereas inf pads would produce NaN
    # distances via 0*inf in the cross term — and NaN WINS argmin.
    padded = np.full((n_tiles * TILE, 2), 1e30, dtype=np.float32)
    padded[:M] = sources - origin
    # Bucket the query count to powers of two so repeated calls reuse
    # compiles (pad queries join some tile's argmin harmlessly).
    P_pad = 1 << max(int(np.ceil(np.log2(max(P, 1)))), 3)
    q_pad = np.zeros((P_pad, 2), dtype=np.float32)
    q_pad[:P] = queries - origin
    d2, idx = _nearest_device(jnp.asarray(q_pad), jnp.asarray(padded), n_tiles)
    idx = np.asarray(idx[:P], dtype=np.int64)
    if np.isfinite(max_distance):
        idx = np.where(np.asarray(d2[:P]) <= max_distance**2, idx, -1)
    return idx
