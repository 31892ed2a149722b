"""
The regrid apply kernel: weights × source values → target values.

This is the hot loop of the framework (reference: the numba
``prange``-parallel CSR row loop, xugrid/regrid/regridder.py:34-69).
TPU-first design: the PaddedCSR dense window turns the ragged CSR loop
into a single gather of shape (n_target, w_max) followed by a vectorized
reduction along the window axis — pure gather + VPU math streaming at
HBM bandwidth, no data-dependent control flow.  Extra (time/layer)
dimensions are mapped with ``lax.map`` so peak memory stays at one
(n_target, w_max) window regardless of how many slices are regridded.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xugrid_tpu.core.sparse import PaddedCSR


@partial(jax.jit, static_argnums=(3,))
def _apply_windowed(source2d, indices, weights, reduction):
    """
    source2d: (n_extra, m) source values
    indices: (n_target, w_max) int32, -1 padded
    weights: (n_target, w_max), 0 padded
    reduction: f(values, weights) -> reduced along the last axis
    """
    pad = indices < 0

    def one_slice(source_flat):
        values = source_flat[jnp.maximum(indices, 0)]
        values = jnp.where(pad, jnp.nan, values)
        return reduction(values, weights)

    return jax.lax.map(one_slice, source2d)


@partial(jax.jit, static_argnums=(3,))
def _apply_coo_gather(source2d, row, col, n_target):
    """CentroidLocator apply: out[row] = source[col] (pure gather)."""

    def one_slice(source_flat):
        out = jnp.full((n_target,), jnp.nan, dtype=source_flat.dtype)
        return out.at[row].set(source_flat[col])

    return jax.lax.map(one_slice, source2d)


def apply_weights(
    weights: PaddedCSR,
    source: np.ndarray,
    reduction,
    target_size: int,
    dtype=None,
):
    """
    Apply regridding weights over the flattened source.

    source: (..., m) array; leading dims are mapped.
    Returns (..., n_target) numpy array.
    """
    source = np.asarray(source)
    leading = source.shape[:-1]
    source2d = source.reshape((-1, source.shape[-1]))
    if dtype is not None:
        source2d = source2d.astype(dtype)
    if not np.issubdtype(source2d.dtype, np.floating):
        source2d = source2d.astype(np.float64)
    out = _apply_windowed(
        jnp.asarray(source2d),
        jnp.asarray(weights.indices),
        jnp.asarray(weights.weights),
        reduction,
    )
    return np.asarray(out).reshape(leading + (target_size,))
