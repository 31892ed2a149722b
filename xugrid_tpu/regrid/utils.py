"""Index broadcasting utilities for structured regridding.

Parity: xugrid/regrid/utils.py.
"""

from __future__ import annotations

import numpy as np


def create_linear_index(arrays, dims):
    meshgrids = [a.ravel() for a in np.meshgrid(*arrays, indexing="ij")]
    return np.ravel_multi_index(meshgrids, dims)


def create_weights(arrays):
    meshgrids = np.meshgrid(*arrays, indexing="ij")
    weight = meshgrids[0].astype(np.float64)
    for dim_weight in meshgrids[1:]:
        weight = weight * dim_weight
    return weight.ravel()


def broadcast(source_shape, target_shape, source_indices, target_indices, weights):
    """Combine per-axis (index, weight) joins into linear-index triplets."""
    source_index = create_linear_index(source_indices, source_shape)
    target_index = create_linear_index(target_indices, target_shape)
    weights = create_weights(weights)
    return source_index, target_index, weights


def alt_cumsum(a):
    """Exclusive cumsum: starts at 0, omits the final total."""
    out = np.empty(a.size, a.dtype)
    if a.size == 0:
        return out
    out[0] = 0
    np.cumsum(a[:-1], out=out[1:])
    return out
