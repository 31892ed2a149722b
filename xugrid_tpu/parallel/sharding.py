"""
Multi-chip execution: mesh sharding of UGRID face data.

This is the framework's "distributed communication backend" (SURVEY.md
§2.10, §5): where the reference merges MPI-partitioned files offline,
here the face dimension itself is sharded across a
``jax.sharding.Mesh`` and operations run SPMD under ``shard_map``:

* faces are ordered along the Hilbert curve (the same ordering the
  partitioner uses) so each device holds a spatially compact block;
* regrid apply shards target rows per device and all-gathers the source
  values over ICI;
* stencil/smoothing ops exchange halo values with ``ppermute``
  neighbor passes instead of re-gathering everything.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import warnings as _warnings

with _warnings.catch_warnings():
    # jax.experimental.shard_map is deprecated in favor of jax.shard_map,
    # but the new entry point changed the check_rep kwarg; use the stable
    # experimental path while both exist.
    _warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from xugrid_tpu.core.sparse import PaddedCSR
from xugrid_tpu.regrid import reduce as reductions
from xugrid_tpu.ugrid.partitioning import hilbert_distance


def partition_order(coordinates: np.ndarray) -> np.ndarray:
    """Hilbert-curve ordering of entities: contiguous slices are compact
    spatial blocks, the layout used to shard the face dimension."""
    return np.argsort(hilbert_distance(np.asarray(coordinates)), kind="stable")


def _pad_to_multiple(array: np.ndarray, multiple: int, fill) -> np.ndarray:
    n = array.shape[0]
    n_pad = (-n) % multiple
    if n_pad == 0:
        return array
    pad_shape = (n_pad,) + array.shape[1:]
    return np.concatenate([array, np.full(pad_shape, fill, array.dtype)])


class ShardedRegrid:
    """
    A regrid-apply plan sharded over a device mesh.

    Target rows (the PaddedCSR windows) are split across devices along
    the mesh axis; the source field is sharded too and all-gathered
    inside the shard_map (one ICI collective per application), after
    which each device reduces its own target windows locally.
    """

    def __init__(
        self,
        mesh: Mesh,
        weights: PaddedCSR,
        reduction: Callable = reductions.mean,
        axis: str | None = None,
    ):
        self.mesh = mesh
        self.axis = axis or mesh.axis_names[0]
        self.reduction = reduction
        n_devices = mesh.devices.size

        indices = _pad_to_multiple(weights.indices, n_devices, -1)
        values = _pad_to_multiple(weights.weights, n_devices, 0.0)
        m_pad = (-weights.m) % n_devices
        self.n_target = weights.n
        self.m_source = weights.m
        self.m_padded = weights.m + m_pad

        row_sharding = NamedSharding(mesh, P(self.axis, None))
        src_sharding = NamedSharding(mesh, P(self.axis))
        self.indices = jax.device_put(indices, row_sharding)
        self.weights = jax.device_put(values, row_sharding)
        self.src_sharding = src_sharding
        self.out_sharding = NamedSharding(mesh, P(self.axis))

        reduction_fn = self.reduction
        axis_name = self.axis

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name, None), P(axis_name, None)),
            out_specs=P(axis_name),
            check_rep=False,
        )
        def _apply(source_local, idx_local, w_local):
            # One collective: gather the full source over ICI.
            source_full = jax.lax.all_gather(
                source_local, axis_name, tiled=True
            )
            pad = idx_local < 0
            values = source_full[jnp.maximum(idx_local, 0)]
            values = jnp.where(pad, jnp.nan, values)
            return reduction_fn(values, w_local)

        self._apply = jax.jit(_apply)

    def put_source(self, source: np.ndarray) -> jax.Array:
        """Shard a source field (length m) across the mesh."""
        padded = _pad_to_multiple(
            np.asarray(source, dtype=self.weights.dtype), self.mesh.devices.size, np.nan
        )
        return jax.device_put(padded, self.src_sharding)

    def __call__(self, source) -> jax.Array:
        """Apply the sharded regrid; returns the sharded target field."""
        if isinstance(source, np.ndarray):
            source = self.put_source(source)
        return self._apply(source, self.indices, self.weights)

    def gather(self, out: jax.Array) -> np.ndarray:
        """Bring a sharded target field back to the host, unpadded."""
        return np.asarray(out)[: self.n_target]


def halo_exchange(mesh: Mesh, axis: str, local: jax.Array, halo: int):
    """
    Ring halo exchange inside a shard_map region: returns the local
    block extended with ``halo`` rows from both neighbors (ppermute over
    ICI).  For use inside shard_map-decorated functions.
    """
    axis_size = jax.lax.axis_size(axis)
    left_edge = local[:halo]
    right_edge = local[-halo:]
    perm_fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    perm_bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    from_left = jax.lax.ppermute(right_edge, axis, perm_fwd)
    from_right = jax.lax.ppermute(left_edge, axis, perm_bwd)
    return jnp.concatenate([from_left, local, from_right], axis=0)


def sharded_laplace_smooth(
    mesh: Mesh,
    neighbor_indices: np.ndarray,
    values: np.ndarray,
    n_steps: int = 1,
    axis: Optional[str] = None,
):
    """
    Jacobi smoothing over face adjacency, SPMD over the mesh.

    neighbor_indices: (n_face, k) global face indices (-1 padded).
    Each step all-gathers the sharded field (ICI) and averages each
    face with its neighbors — the building block of the sharded
    Laplace/CG solvers.
    """
    axis = axis or mesh.axis_names[0]
    n_devices = mesh.devices.size
    n = len(values)
    idx = _pad_to_multiple(neighbor_indices.astype(np.int32), n_devices, -1)
    vals = _pad_to_multiple(np.asarray(values, dtype=np.float64), n_devices, np.nan)

    row_sharding = NamedSharding(mesh, P(axis, None))
    vec_sharding = NamedSharding(mesh, P(axis))
    idx_d = jax.device_put(idx, row_sharding)
    vals_d = jax.device_put(vals, vec_sharding)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis, None)),
        out_specs=P(axis),
        check_rep=False,
    )
    def step(v_local, idx_local):
        v_full = jax.lax.all_gather(v_local, axis, tiled=True)
        pad = idx_local < 0
        neigh = jnp.where(pad, jnp.nan, v_full[jnp.maximum(idx_local, 0)])
        neigh_mean = jnp.nanmean(
            jnp.concatenate([neigh, v_local[:, None]], axis=1), axis=1
        )
        return 0.5 * v_local + 0.5 * neigh_mean

    fn = jax.jit(step)
    out = vals_d
    for _ in range(n_steps):
        out = fn(out, idx_d)
    return np.asarray(out)[:n]
