"""
UgridDataArray / UgridDataset: labeled data paired with UGRID topologies.

Parity target: xugrid/core/wrap.py:31-669.  The reference pre-wraps every
xarray method at class-definition time; here forwarding is dynamic
(``__getattr__``) over the xdata layer: results that are DataArray/
Dataset come back wrapped with the grids, and any operation that
subsets a UGRID dimension (tracked via RangeIndex coordinates on those
dims) triggers topology subsetting through ``align``.
"""

from __future__ import annotations

import operator
from typing import Any, Sequence, Union

import numpy as np

from xugrid_tpu import xdata
from xugrid_tpu.constants import FILL_VALUE
from xugrid_tpu.ugrid import conventions
from xugrid_tpu.ugrid.ugrid1d import Ugrid1d
from xugrid_tpu.ugrid.ugrid2d import Ugrid2d
from xugrid_tpu.ugrid.ugridbase import AbstractUgrid, align


def get_ugrid_dims(obj, grids) -> set:
    dims = set()
    for grid in grids:
        dims |= grid.dims & set(obj.dims)
    return dims


def assign_ugrid_coords(obj, grids):
    """Assign RangeIndex coordinates on UGRID dims so subsetting is
    observable after forwarded operations."""
    ugrid_dims = {dim for grid in grids for dim in grid.dims} & set(obj.dims)
    sizes = obj.sizes
    coords = {
        dim: np.arange(sizes[dim]) for dim in ugrid_dims if dim not in obj.coords
    }
    if coords:
        obj = obj.assign_coords(coords)
    return obj


def maybe_xugrid(obj, grids, old_indexes=None):
    """Wrap xdata objects that still carry UGRID dims; pass through rest."""
    if not isinstance(obj, (xdata.DataArray, xdata.Dataset)):
        return obj
    item_grids = [
        grid for grid in grids if grid.dims.intersection(obj.dims)
    ]
    if not item_grids:
        return obj
    aligned, aligned_grids = align(obj, item_grids, old_indexes)
    if isinstance(aligned, xdata.DataArray):
        return UgridDataArray(aligned, aligned_grids[0])
    return UgridDataset(aligned, aligned_grids)


def maybe_xdata(obj):
    """Unwrap Ugrid wrappers into their underlying xdata objects."""
    if isinstance(obj, (UgridDataArray, UgridDataset)):
        return obj.obj
    if isinstance(obj, (list, tuple)):
        return type(obj)(maybe_xdata(o) for o in obj)
    return obj


class _ForwardMixin:
    def _forward_result(self, result):
        return maybe_xugrid(result, self.grids, self._indexes_snapshot())

    def _indexes_snapshot(self):
        ugrid_dims = {dim for grid in self.grids for dim in grid.dims}
        return {
            k: v for k, v in self.obj.indexes.items() if k in ugrid_dims
        }

    def __getattr__(self, name: str):
        if name.startswith("_") or name in ("obj", "grids"):
            raise AttributeError(name)
        attr = getattr(self.obj, name)
        if callable(attr) and not isinstance(
            attr, (xdata.DataArray, xdata.Dataset)
        ):
            snapshot = self._indexes_snapshot()

            def wrapped(*args, **kwargs):
                args = tuple(maybe_xdata(a) for a in args)
                kwargs = {k: maybe_xdata(v) for k, v in kwargs.items()}
                result = attr(*args, **kwargs)
                return maybe_xugrid(result, self.grids, snapshot)

            wrapped.__name__ = name
            wrapped.__doc__ = getattr(attr, "__doc__", None)
            return wrapped
        return self._forward_result(attr)

    def _binary(self, other, op, reflexive=False):
        other_un = maybe_xdata(other)
        result = (
            op(other_un, self.obj) if reflexive else op(self.obj, other_un)
        )
        return maybe_xugrid(result, self.grids, self._indexes_snapshot())

    def __dir__(self):
        return list(set(super().__dir__()) | set(dir(self.obj)))


def _attach_operators(cls):
    binops = {
        "__add__": operator.add,
        "__sub__": operator.sub,
        "__mul__": operator.mul,
        "__truediv__": operator.truediv,
        "__floordiv__": operator.floordiv,
        "__mod__": operator.mod,
        "__pow__": operator.pow,
        "__and__": operator.and_,
        "__or__": operator.or_,
        "__xor__": operator.xor,
        "__lt__": operator.lt,
        "__le__": operator.le,
        "__gt__": operator.gt,
        "__ge__": operator.ge,
        "__eq__": operator.eq,
        "__ne__": operator.ne,
    }
    for name, op in binops.items():
        def make(op):
            def method(self, other):
                return self._binary(other, op)

            return method

        setattr(cls, name, make(op))
    for name, op in {
        "__radd__": operator.add,
        "__rsub__": operator.sub,
        "__rmul__": operator.mul,
        "__rtruediv__": operator.truediv,
        "__rpow__": operator.pow,
    }.items():
        def make_r(op):
            def method(self, other):
                return self._binary(other, op, reflexive=True)

            return method

        setattr(cls, name, make_r(op))
    for name, op in {
        "__neg__": operator.neg,
        "__pos__": operator.pos,
        "__abs__": operator.abs,
        "__invert__": operator.invert,
    }.items():
        def make_u(op):
            def method(self):
                return maybe_xugrid(
                    op(self.obj), self.grids, self._indexes_snapshot()
                )

            return method

        setattr(cls, name, make_u(op))
    cls.__hash__ = object.__hash__
    return cls


@_attach_operators
class UgridDataArray(_ForwardMixin):
    """An xdata.DataArray paired with a single UGRID topology."""

    def __init__(self, obj: xdata.DataArray, grid: AbstractUgrid):
        if not isinstance(obj, xdata.DataArray):
            raise TypeError(
                "obj must be xdata.DataArray. Received instead: "
                f"{type(obj).__name__}"
            )
        if grid is None:
            raise ValueError("grid is required")
        object.__setattr__(self, "grid", grid)
        object.__setattr__(self, "obj", assign_ugrid_coords(obj, [grid]))

    @property
    def grids(self):
        return [self.grid]

    @property
    def ugrid(self):
        """Topology-aware accessor."""
        from xugrid_tpu.core.dataarray_accessor import UgridDataArrayAccessor

        return UgridDataArrayAccessor(self.obj, self.grid)

    def __getitem__(self, key):
        result = self.obj[key]
        return maybe_xugrid(result, self.grids, self._indexes_snapshot())

    def __setitem__(self, key, value):
        self.obj[key] = maybe_xdata(value)

    def __setattr__(self, name, value):
        if name in ("grid", "obj"):
            object.__setattr__(self, name, value)
        else:
            setattr(self.obj, name, value)

    def __repr__(self):
        return self.obj.__repr__()

    def __len__(self):
        return len(self.obj)

    def __iter__(self):
        return iter(self.obj)

    def __array__(self, dtype=None, copy=None):
        return self.obj.__array__(dtype)

    def __float__(self):
        return float(self.obj)

    def __int__(self):
        return int(self.obj)

    def __bool__(self):
        return bool(self.obj)

    def to_dataset(self, name=None):
        ds = self.obj.to_dataset(name)
        return UgridDataset(ds, self.grids)

    # -- constructors --------------------------------------------------------
    @staticmethod
    def from_data(data, grid, facet: str) -> "UgridDataArray":
        """
        Create a UgridDataArray from a 1D array on a grid facet
        ("node" / "edge" / "face").
        """
        return grid.create_data_array(data, facet)

    @staticmethod
    def from_structured2d(
        da: xdata.DataArray,
        x: str = None,
        y: str = None,
        x_bounds=None,
        y_bounds=None,
    ) -> "UgridDataArray":
        """
        Create a UgridDataArray from a structured DataArray by flattening
        its (y, x) dimensions into a face dimension.

        When explicit 2D bounds are given, supports (NaN-masked)
        curvilinear topologies; otherwise x/y coordinates are inferred.
        """
        if da.ndim < 2:
            raise ValueError(
                "DataArray must have at least two spatial dimensions. "
                f"Found: {da.dims}"
            )
        if x_bounds is not None and y_bounds is not None:
            if x is None or y is None:
                raise ValueError("x and y must be provided for bounds")
            # With bounds, x/y name the DIMENSIONS (reference semantics,
            # wrap.py:308-326); when they name coordinate variables
            # instead, fall back to those variables' dims.
            if y in da.dims and x in da.dims:
                ydim, xdim = y, x
            elif da[x].ndim == 2:
                ydim, xdim = da[x].dims
            else:
                ydim, xdim = da[y].dims[0], da[x].dims[0]
            grid, index = Ugrid2d.from_structured_bounds(
                np.asarray(x_bounds.data if hasattr(x_bounds, "data") else x_bounds),
                np.asarray(y_bounds.data if hasattr(y_bounds, "data") else y_bounds),
                return_index=True,
            )
            dims = (ydim, xdim)
        else:
            grid, dims = Ugrid2d.from_structured(da, x, y, return_dims=True)
            index = slice(None, None)
        extra_dims = [d for d in da.dims if d not in dims]
        flattened = da.transpose(*extra_dims, *dims).stack_dims(
            grid.face_dimension, list(dims)
        )
        if not isinstance(index, slice):
            flattened = flattened.isel(
                {grid.face_dimension: np.flatnonzero(index)}
            )
        return UgridDataArray(flattened, grid)


class UgridDataset(_ForwardMixin):
    """An xdata.Dataset paired with one or more UGRID topologies."""

    def __init__(
        self,
        obj: xdata.Dataset = None,
        grids: Union[AbstractUgrid, Sequence[AbstractUgrid]] = None,
    ):
        if obj is None and grids is None:
            raise ValueError("At least one of obj and grids is required")
        if obj is None:
            ds = xdata.Dataset()
        else:
            if not isinstance(obj, xdata.Dataset):
                raise TypeError(
                    "obj must be xdata.Dataset. Received instead: "
                    f"{type(obj).__name__}"
                )
            ds = obj

        if grids is None:
            topologies = conventions.ugrid_roles(ds).topology
            grids = []
            for topology in topologies:
                topodim = ds._variables[topology].attrs["topology_dimension"]
                if topodim == 1:
                    grids.append(Ugrid1d.from_dataset(ds, topology))
                elif topodim == 2:
                    grids.append(Ugrid2d.from_dataset(ds, topology))
                else:
                    raise ValueError(f"Invalid topology dimension: {topodim}")
            # Strip UGRID topology/connectivity/grid-mapping vars from data.
            ds = self._remove_topology(ds, grids)
        else:
            if isinstance(grids, AbstractUgrid):
                grids = [grids]
            else:
                bad = [
                    type(g).__name__
                    for g in grids
                    if not isinstance(g, AbstractUgrid)
                ]
                if bad:
                    raise TypeError(
                        "grids must be Ugrid1d or Ugrid2d, received: "
                        f"{bad}"
                    )
            grids = list(grids)

        object.__setattr__(self, "grids", grids)
        object.__setattr__(self, "obj", assign_ugrid_coords(ds, grids))

    @staticmethod
    def _remove_topology(ds, grids):
        remove = set()
        for grid in grids:
            attrs = grid._attrs
            remove.add(grid.name)
            for key in conventions._CONNECTIVITY_NAMES[grid.topology_dimension]:
                if key in attrs:
                    remove.add(attrs[key])
            roles = conventions.ugrid_roles(ds)
            gm = roles.grid_mapping_names.get(grid.name)
            if gm:
                remove.add(gm)
        return ds.drop_vars([v for v in remove if v in ds._variables], errors="ignore")

    @property
    def grid(self):
        if len(self.grids) != 1:
            raise ValueError(
                f"Can only call .grid with a single topology, found "
                f"{len(self.grids)}"
            )
        return self.grids[0]

    @property
    def ugrid(self):
        """Topology-aware accessor."""
        from xugrid_tpu.core.dataset_accessor import UgridDatasetAccessor

        return UgridDatasetAccessor(self.obj, self.grids)

    def __repr__(self):
        return self.obj.__repr__()

    def __contains__(self, key):
        return key in self.obj

    def __iter__(self):
        return iter(self.obj)

    def __len__(self):
        return len(self.obj)

    def __getitem__(self, key):
        result = self.obj[key]
        return maybe_xugrid(result, self.grids, self._indexes_snapshot())

    def __setattr__(self, name, value):
        if name in ("grids", "obj"):
            object.__setattr__(self, name, value)
        else:
            setattr(self.obj, name, value)

    def __setitem__(self, key, value):
        if isinstance(value, UgridDataArray):
            # Append the grid if it's a new topology.
            existing = {g.name for g in self.grids}
            if value.grid.name in existing:
                matching = next(
                    g for g in self.grids if g.name == value.grid.name
                )
                if not matching.equals(value.grid):
                    self.grids[
                        [g.name for g in self.grids].index(value.grid.name)
                    ] = value.grid
            else:
                self.grids.append(value.grid)
            self.obj[key] = value.obj
            object.__setattr__(
                self, "obj", assign_ugrid_coords(self.obj, self.grids)
            )
        else:
            self.obj[key] = maybe_xdata(value)

    def _binary(self, other, op, reflexive=False):
        other_un = maybe_xdata(other)
        result = (
            op(other_un, self.obj) if reflexive else op(self.obj, other_un)
        )
        return maybe_xugrid(result, self.grids, self._indexes_snapshot())

    # -- constructors --------------------------------------------------------
    @staticmethod
    def from_geodataframe(geodataframe) -> "UgridDataset":
        """Convert a GeoDataFrame of polygons into a UgridDataset."""
        grid = Ugrid2d.from_geodataframe(geodataframe)
        ds = xdata.Dataset()
        for column in geodataframe.columns:
            if column == "geometry":
                continue
            ds[column] = (
                (grid.face_dimension,),
                geodataframe[column].to_numpy(),
            )
        return UgridDataset(ds, [grid])

    @staticmethod
    def from_structured2d(dataset, topology=None) -> "UgridDataset":
        """
        Create a UgridDataset from a structured Dataset, flattening (y, x)
        dims per topology.  ``topology`` maps topology name to a dict of
        options ({"x": ..., "y": ..., "bounds_x": ..., "bounds_y": ...})
        or None for inference.
        """
        if topology is None:
            topology = {"mesh2d": None}
        elif isinstance(topology, str):
            topology = {topology: None}

        out = None
        for name, options in topology.items():
            options = options or {}
            x = options.get("x")
            y = options.get("y")
            bounds_x = options.get("bounds_x")
            bounds_y = options.get("bounds_y")
            if bounds_x is not None:
                if isinstance(bounds_x, str):
                    bounds_x = dataset[bounds_x]
                if isinstance(bounds_y, str):
                    bounds_y = dataset[bounds_y]
                grid, index = Ugrid2d.from_structured_bounds(
                    np.asarray(bounds_x.data),
                    np.asarray(bounds_y.data),
                    name=name,
                    return_index=True,
                )
                # x/y name the dimensions to stack (reference
                # wrap.py:622), not the bounds variable's own dims.
                if y in dataset.dims_sizes() and x in dataset.dims_sizes():
                    dims = (y, x)
                else:
                    dims = (
                        dataset[y].dims[0],
                        dataset[x].dims[0],
                    )
            else:
                grid, dims = Ugrid2d.from_structured(
                    dataset, x, y, name=name, return_dims=True
                )
                index = slice(None, None)

            new_ds = xdata.Dataset(attrs=dict(dataset.attrs))
            for varname in dataset.data_vars:
                da = dataset[varname]
                if set(dims) <= set(da.dims):
                    extra = [d for d in da.dims if d not in dims]
                    flattened = da.transpose(*extra, *dims).stack_dims(
                        grid.face_dimension, list(dims)
                    )
                    if not isinstance(index, slice):
                        flattened = flattened.isel(
                            {grid.face_dimension: np.flatnonzero(index)}
                        )
                    new_ds[varname] = flattened
                elif not (set(dims) & set(da.dims)):
                    new_ds[varname] = da
            part = UgridDataset(new_ds, [grid])
            out = part if out is None else UgridDataset(
                out.obj.merge(part.obj), out.grids + part.grids
            )
        return out
