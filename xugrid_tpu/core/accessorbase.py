"""
Shared accessor machinery for .ugrid on UgridDataArray / UgridDataset.

Parity target: xugrid/core/accessorbase.py:10-180.
"""

from __future__ import annotations

import abc
from typing import Tuple

import numpy as np

from xugrid_tpu import xdata


class AbstractUgridAccessor(abc.ABC):
    @staticmethod
    def _raster_xy(bounds: Tuple[float, float, float, float], resolution: float):
        xmin, ymin, xmax, ymax = bounds
        d = abs(resolution)
        xmin = np.floor(xmin / d) * d
        xmax = np.ceil(xmax / d) * d
        ymin = np.floor(ymin / d) * d
        ymax = np.ceil(ymax / d) * d
        x = np.arange(xmin + 0.5 * d, xmax, d)
        y = np.arange(ymax - 0.5 * d, ymin, -d)
        return x, y

    def _raster(self, x, y, index) -> xdata.DataArray:
        """Index obj by the rasterized face index; mask -1 cells."""
        index2d = np.asarray(index).reshape(y.size, x.size)
        face_dim = self.grid.face_dimension
        obj = self.obj
        # Outer-index along the face dim with the flattened index, reshape
        # afterwards into (y, x).
        flat = index2d.ravel()
        taken = obj.isel({face_dim: np.maximum(flat, 0)})
        if isinstance(taken, xdata.Dataset):
            out = xdata.Dataset(attrs=dict(taken.attrs))
            for name in taken.data_vars:
                var = taken[name]
                if face_dim in var.dims:
                    out[name] = _reshape_raster_var(
                        var, face_dim, index2d, x, y
                    )
                else:
                    # Variables on other facets pass through untouched
                    # (xarray isel semantics in the reference,
                    # accessorbase.py:89-97).
                    out[name] = var
            return out
        return _reshape_raster_var(taken, face_dim, index2d, x, y)

    def clip_box(self, xmin: float, ymin: float, xmax: float, ymax: float):
        """Clip to a bounding box."""
        return self.sel(x=slice(xmin, xmax), y=slice(ymin, ymax))

    def partition_by_label(self, labels):
        """Partition the grid and data by integer labels per core entity."""
        from xugrid_tpu.ugrid import partitioning

        return partitioning.partition_by_label(self.grid, self.obj, labels)

    def partition(self, n_part: int):
        """Partition into n_part parts (SFC partitioner)."""
        labels = self.grid.label_partitions(n_part)
        return self.partition_by_label(labels)

    def to_netcdf(self, *args, **kwargs):
        """Write as UGRID-compliant netCDF (topology variables included)."""
        self.to_dataset().to_netcdf(*args, **kwargs)

    def to_zarr(self, *args, **kwargs):
        """Write as UGRID-compliant zarr store (topology included)."""
        self.to_dataset().to_zarr(*args, **kwargs)


def _reshape_raster_var(da, face_dim, index2d, x, y):
    values = np.asarray(da.data)
    axis = da.dims.index(face_dim)
    values = np.moveaxis(values, axis, -1)
    new_shape = values.shape[:-1] + index2d.shape
    values = values.reshape(new_shape)
    if np.issubdtype(values.dtype, np.integer):
        values = values.astype(np.float64)
    values = np.where(index2d != -1, values, np.nan)
    other_dims = tuple(d for d in da.dims if d != face_dim)
    out = xdata.DataArray(
        values,
        dims=other_dims + ("y", "x"),
        name=da.name,
        attrs=dict(da.attrs),
    )
    coords = {
        k: v
        for k, v in da._coords.items()
        if face_dim not in v.dims
    }
    out._coords.update(coords)
    return out.assign_coords(y=y, x=x)
