"""
Top-level I/O and combination functions.

Parity target: xugrid/core/common.py:12-146.
"""

from __future__ import annotations

from xugrid_tpu import xdata
from xugrid_tpu.core.wrap import UgridDataArray, UgridDataset, maybe_xdata
from xugrid_tpu.ugrid.conventions import ugrid_roles


def _dataset_helper(ds: xdata.Dataset) -> UgridDataset:
    if len(ugrid_roles(ds).topology) == 0:
        raise ValueError(
            "The file or object does not contain UGRID conventions data: "
            "no variable with the attribute cf_role: mesh_topology was found."
        )
    return UgridDataset(ds)


def open_dataset(path, **kwargs) -> UgridDataset:
    """Open a UGRID netCDF file as a UgridDataset."""
    ds = xdata.open_dataset(path, **kwargs)
    return _dataset_helper(ds)


def load_dataset(path, **kwargs) -> UgridDataset:
    """Open, load into memory, and close a UGRID netCDF file."""
    return open_dataset(path, **kwargs)


def open_dataarray(path, **kwargs) -> UgridDataArray:
    """Open a UGRID netCDF file containing a single data variable."""
    uds = open_dataset(path, **kwargs)
    data_vars = list(uds.obj.data_vars)
    if len(data_vars) != 1:
        raise ValueError(
            "The file contains more than one data variable: use "
            f"open_dataset instead. Found: {data_vars}"
        )
    name = data_vars[0]
    return uds[name]


def load_dataarray(path, **kwargs) -> UgridDataArray:
    return open_dataarray(path, **kwargs)


def open_zarr(store, **kwargs) -> UgridDataset:
    """Open a UGRID zarr store as a UgridDataset."""
    ds = xdata.open_zarr(store, **kwargs)
    return _dataset_helper(ds)


def open_mfdataset(paths, **kwargs) -> UgridDataset:
    """Open multiple UGRID netCDF files and merge them."""
    if isinstance(paths, str):
        import glob

        paths = sorted(glob.glob(paths))
    datasets = [xdata.open_dataset(p, **kwargs) for p in paths]
    merged = datasets[0]
    for ds in datasets[1:]:
        merged = merged.merge(ds)
    return _dataset_helper(merged)


def _unwrap_grids(objects):
    from xugrid_tpu.core.utils import unique_grids

    grids = []
    for obj in objects:
        if isinstance(obj, (UgridDataArray, UgridDataset)):
            grids.extend(obj.grids)
    return unique_grids(grids)


def concat(objs, *args, **kwargs):
    """Concatenate UgridDataArrays/UgridDatasets; grids must match."""
    grids = _unwrap_grids(objs)
    result = xdata.concat([maybe_xdata(o) for o in objs], *args, **kwargs)
    if isinstance(result, xdata.DataArray):
        return UgridDataArray(result, grids[0])
    return UgridDataset(result, grids)


def merge(objs, *args, **kwargs):
    """Merge UgridDataArrays/UgridDatasets; grids are uniqued."""
    grids = _unwrap_grids(objs)
    result = xdata.merge([maybe_xdata(o) for o in objs], *args, **kwargs)
    return UgridDataset(result, grids)


def full_like(other, fill_value, *args, **kwargs):
    """A UgridDataArray/UgridDataset like other, filled with fill_value."""
    result = xdata.full_like(maybe_xdata(other), fill_value, *args, **kwargs)
    if isinstance(other, UgridDataArray):
        return UgridDataArray(result, other.grid)
    if isinstance(other, UgridDataset):
        return UgridDataset(result, other.grids)
    return result


def zeros_like(other, *args, **kwargs):
    return full_like(other, 0, *args, **kwargs)


def ones_like(other, *args, **kwargs):
    return full_like(other, 1, *args, **kwargs)
