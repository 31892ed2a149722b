"""
DataArray: a Variable plus coordinates and a name.

The labeled-array object the rest of the framework builds on; it mirrors
the subset of the xarray.DataArray API that the reference library (an
xarray extension) actually exercises, so that UgridDataArray can forward
transparently.
"""

from __future__ import annotations

import operator
from typing import Any, Hashable, Mapping, Sequence

import numpy as np

from xugrid_tpu.xdata.indexes import (
    as_index,
    resolve_label_indexer,
    stacked_multiindex,
)
from xugrid_tpu.xdata.variable import (
    Variable,
    as_compatible_data,
    broadcast_variables,
    get_namespace,
)


class Coordinates(Mapping):
    """Read-through mapping of coordinate name -> DataArray."""

    def __init__(self, owner):
        self._owner = owner

    def __getitem__(self, key) -> "DataArray":
        var = self._owner._coords[key]
        coords = {
            k: v
            for k, v in self._owner._coords.items()
            if set(v.dims) <= set(var.dims)
        }
        return DataArray._construct(var, coords, key)

    def __iter__(self):
        return iter(self._owner._coords)

    def __len__(self):
        return len(self._owner._coords)

    def __contains__(self, key):
        return key in self._owner._coords

    def __repr__(self):
        lines = [
            f"  {k}: {tuple(v.dims)} {v.dtype}" for k, v in self._owner._coords.items()
        ]
        return "Coordinates:\n" + "\n".join(lines)

    @property
    def variables(self):
        return dict(self._owner._coords)


def _normalize_coords(coords, dims, shape) -> dict:
    out: dict = {}
    if coords is None:
        return out
    if isinstance(coords, (list, tuple)):
        # positional: one coord array per dim
        for dim, values in zip(dims, coords):
            out[dim] = Variable((dim,), values)
        return out
    for name, values in coords.items():
        if isinstance(values, Variable):
            out[name] = values
        elif isinstance(values, DataArray):
            out[name] = values.variable
        elif isinstance(values, tuple) and len(values) in (2, 3):
            cdims, cdata = values[0], values[1]
            out[name] = Variable(cdims, cdata)
        else:
            arr = as_compatible_data(values)
            if np.ndim(arr) == 0:
                out[name] = Variable((), arr)
            elif name in dims:
                out[name] = Variable((name,), arr)
            elif np.ndim(arr) == 1 and len(dims) == 1:
                out[name] = Variable((dims[0],), arr)
            else:
                raise ValueError(
                    f"cannot infer dimensions for coordinate {name!r}"
                )
    return out


class DataArray:
    __slots__ = ("variable", "_coords", "name")

    def __init__(
        self,
        data=None,
        coords=None,
        dims=None,
        name: Hashable | None = None,
        attrs: Mapping | None = None,
    ):
        if isinstance(data, DataArray):
            variable = data.variable.copy(deep=False)
            if attrs:
                variable.attrs.update(attrs)
            merged_coords = dict(data._coords)
            if coords:
                merged_coords.update(_normalize_coords(coords, data.dims, data.shape))
            self.variable = variable
            self._coords = merged_coords
            self.name = name if name is not None else data.name
            return
        if isinstance(data, Variable):
            variable = data
            if dims is not None and tuple(
                [dims] if isinstance(dims, str) else dims
            ) != variable.dims:
                variable = Variable(dims, variable.data, variable.attrs)
            if attrs:
                variable = Variable(variable.dims, variable.data, attrs)
        else:
            data = as_compatible_data(data)
            if dims is None:
                if coords is not None and isinstance(coords, Mapping):
                    # try to infer from coords matching shape
                    dims = tuple(f"dim_{i}" for i in range(np.ndim(data)))
                else:
                    dims = tuple(f"dim_{i}" for i in range(np.ndim(data)))
            elif isinstance(dims, str):
                dims = (dims,)
            variable = Variable(dims, data, attrs)
        self.variable = variable
        self._coords = _normalize_coords(coords, variable.dims, variable.shape)
        self.name = name
        self._validate_coords()

    def _validate_coords(self):
        sizes = self.variable.sizes
        for cname, cvar in self._coords.items():
            for d, s in cvar.sizes.items():
                if d in sizes and sizes[d] != s:
                    raise ValueError(
                        f"conflicting size for dimension {d!r} in coordinate "
                        f"{cname!r}: {s} vs {sizes[d]}"
                    )

    @classmethod
    def _construct(cls, variable: Variable, coords: dict, name) -> "DataArray":
        obj = object.__new__(cls)
        obj.variable = variable
        obj._coords = coords
        obj.name = name
        return obj

    # -- properties ---------------------------------------------------------
    @property
    def dims(self):
        return self.variable.dims

    @property
    def shape(self):
        return self.variable.shape

    @property
    def sizes(self):
        return self.variable.sizes

    @property
    def ndim(self):
        return self.variable.ndim

    @property
    def size(self):
        return self.variable.size

    @property
    def dtype(self):
        return self.variable.dtype

    @property
    def data(self):
        return self.variable.data

    @data.setter
    def data(self, value):
        self.variable.data = as_compatible_data(value)

    @property
    def values(self) -> np.ndarray:
        return self.variable.values

    @values.setter
    def values(self, value):
        self.variable.data = np.asarray(value)

    @property
    def attrs(self) -> dict:
        return self.variable.attrs

    @attrs.setter
    def attrs(self, value):
        self.variable.attrs = dict(value)

    @property
    def encoding(self) -> dict:
        return self.variable.encoding

    @property
    def coords(self) -> Coordinates:
        return Coordinates(self)

    @property
    def indexes(self) -> dict:
        out = {}
        for dim in self.dims:
            mi = stacked_multiindex(dim, self.encoding, self._coords)
            if mi is not None:
                out[dim] = mi
            elif dim in self._coords and self._coords[dim].dims == (dim,):
                out[dim] = as_index(self._coords[dim].data)
        return out

    def get_index(self, dim):
        mi = stacked_multiindex(dim, self.encoding, self._coords)
        if mi is not None:
            return mi
        if dim in self._coords and self._coords[dim].dims == (dim,):
            return as_index(self._coords[dim].data)
        import pandas as pd

        return pd.RangeIndex(self.sizes[dim])

    def __len__(self):
        if not self.dims:
            raise TypeError("len() of unsized object")
        return self.shape[0]

    def __repr__(self):
        header = f"<xdata.DataArray {self.name!r} {tuple(self.dims)} {self.shape}>"
        coords = "\n".join(
            f"  * {k}: {tuple(v.dims)} {v.dtype}" for k, v in self._coords.items()
        )
        data_repr = repr(self.variable.data)
        if len(data_repr) > 400:
            data_repr = data_repr[:400] + "…"
        return f"{header}\n{data_repr}\nCoordinates:\n{coords}"

    def item(self):
        return self.values.item()

    def __array__(self, dtype=None, copy=None):
        v = self.values
        return v.astype(dtype) if dtype is not None else v

    def __float__(self):
        return float(self.values)

    def __int__(self):
        return int(self.values)

    def __bool__(self):
        return bool(self.values)

    # -- conversion ---------------------------------------------------------
    def copy(self, deep: bool = True, data=None) -> "DataArray":
        """Copy; ``data`` replaces the values while keeping dims, coords,
        and attrs (xarray's ``DataArray.copy(data=...)``)."""
        return DataArray._construct(
            self.variable.copy(deep, data=data),
            {k: v.copy(deep) for k, v in self._coords.items()},
            self.name,
        )

    def rename(self, new_name_or_dict=None, **names) -> "DataArray":
        if isinstance(new_name_or_dict, (str, type(None))) and not names:
            if new_name_or_dict is None:
                return self.copy(deep=False)
            return DataArray._construct(self.variable, dict(self._coords), new_name_or_dict)
        mapping = dict(new_name_or_dict or {})
        mapping.update(names)
        new_dims = tuple(mapping.get(d, d) for d in self.dims)
        var = Variable(new_dims, self.variable.data, self.attrs, self.encoding)
        coords = {}
        for k, v in self._coords.items():
            cdims = tuple(mapping.get(d, d) for d in v.dims)
            coords[mapping.get(k, k)] = Variable(cdims, v.data, v.attrs)
        name = mapping.get(self.name, self.name)
        return DataArray._construct(var, coords, name)

    def astype(self, dtype) -> "DataArray":
        return DataArray._construct(
            self.variable.astype(dtype), dict(self._coords), self.name
        )

    def to_dataset(self, name=None):
        from xugrid_tpu.xdata.dataset import Dataset

        name = name or self.name
        if name is None:
            raise ValueError("unable to convert unnamed DataArray to Dataset")
        ds = Dataset()
        for k, v in self._coords.items():
            ds._variables[k] = v
            ds._coord_names.add(k)
        ds._variables[name] = self.variable
        return ds

    def to_numpy(self) -> np.ndarray:
        return self.values

    def to_pandas(self):
        import pandas as pd

        if self.ndim == 1:
            return pd.Series(self.values, index=self.get_index(self.dims[0]), name=self.name)
        if self.ndim == 0:
            return self.values.item()
        raise NotImplementedError("to_pandas only for 0D/1D")

    def to_dataframe(self, name=None, dim_order=None):
        name = name or self.name or "data"
        ds = self.rename(name).to_dataset() if name != self.name else self.to_dataset(name)
        return ds.to_dataframe(dim_order=dim_order)

    # -- indexing -----------------------------------------------------------
    def _resolve_indexers(self, indexers, kwargs):
        if indexers is None:
            indexers = {}
        indexers = dict(indexers)
        indexers.update(kwargs)
        return indexers

    def isel(self, indexers=None, drop: bool = False, missing_dims: str = "raise", **kwargs) -> "DataArray":
        indexers = self._resolve_indexers(indexers, kwargs)
        unknown = set(indexers) - set(self.dims)
        if unknown:
            if missing_dims == "raise":
                raise ValueError(f"dimensions {unknown} do not exist")
            indexers = {k: v for k, v in indexers.items() if k in self.dims}
        da_idx = {
            k: v
            for k, v in indexers.items()
            if isinstance(v, DataArray) and v.ndim >= 1
        }
        if len(da_idx) > 1:
            # Vectorized (pointwise) indexing: multiple DataArray
            # indexers broadcast against each other by dim name and
            # select jointly — per-axis application would produce an
            # outer product with duplicate dim names (xarray pointwise
            # semantics).
            rest = {k: v for k, v in indexers.items() if k not in da_idx}
            return self._isel_pointwise(da_idx, rest, drop)
        clean = {}
        renames = {}
        for k, v in indexers.items():
            if isinstance(v, DataArray):
                # Named-indexer semantics: the indexed axis takes the
                # indexer's dimension name (like xarray pointwise sel).
                if v.ndim == 1 and v.dims[0] != k:
                    renames[k] = v.dims[0]
                v = v.data
            clean[k] = v
        new_var = self.variable.isel(clean)
        new_coords = {}
        for name, cvar in self._coords.items():
            sub = {d: clean[d] for d in cvar.dims if d in clean}
            cv = cvar.isel(sub) if sub else cvar
            if drop and cv.ndim == 0:
                continue
            new_coords[name] = cv
        out = DataArray._construct(new_var, new_coords, self.name)
        # Stacked-dim layout survives subsetting (unstack handles the
        # sparse case via the level coordinates).
        for ek, ev in self.encoding.items():
            if ek.startswith("_stacked_") and ek[len("_stacked_"):] in out.dims:
                out.encoding[ek] = ev
        if renames:
            out = out.rename(renames)
            # Drop the old dim-named index coordinate: its values are
            # positions in the source dim, meaningless on the new dim.
            for old, new in renames.items():
                if new in out._coords and out._coords[new].dims == (new,):
                    del out._coords[new]
        return out

    def _isel_pointwise(self, da_idx, rest, drop):
        """Joint advanced indexing for multiple DataArray indexers:
        broadcast the indexers by dim name, replace the indexed dims
        with the broadcast dims (xarray vectorized indexing)."""
        out = self.isel(rest, drop=drop) if rest else self
        axes_dims = list(da_idx)
        bvars = broadcast_variables(*[v.variable for v in da_idx.values()])
        idx_arrays = [np.asarray(b.data) for b in bvars]
        new_idx_dims = bvars[0].dims
        for d in new_idx_dims:
            if d in out.dims and d not in axes_dims:
                raise ValueError(
                    f"pointwise indexer dim {d!r} collides with a "
                    "remaining array dim"
                )
        arr = np.asarray(out.data)
        axes = [out.dims.index(k) for k in axes_dims]
        moved = np.moveaxis(arr, axes, range(len(axes)))
        result = moved[tuple(idx_arrays)]
        rest_dims = tuple(d for d in out.dims if d not in axes_dims)
        new_dims = new_idx_dims + rest_dims
        coords = {}
        for name, cvar in out._coords.items():
            hit = [d for d in cvar.dims if d in axes_dims]
            if not hit:
                coords[name] = cvar
                continue
            c_arr = np.asarray(cvar.data)
            c_axes = [cvar.dims.index(d) for d in hit]
            c_moved = np.moveaxis(c_arr, c_axes, range(len(c_axes)))
            c_idx = tuple(
                idx_arrays[axes_dims.index(d)] for d in hit
            )
            c_rest = tuple(d for d in cvar.dims if d not in axes_dims)
            coords[name] = Variable(new_idx_dims + c_rest, c_moved[c_idx])
        # indexer coordinates ride along (xarray attaches them)
        for v in da_idx.values():
            for cname, cvar in v._coords.items():
                if cname not in coords and set(cvar.dims) <= set(
                    new_idx_dims
                ):
                    coords[cname] = cvar
        return DataArray._construct(
            Variable(new_dims, result, self.attrs), coords, self.name
        )

    def sel(self, indexers=None, method=None, tolerance=None, drop: bool = False, **kwargs) -> "DataArray":
        indexers = self._resolve_indexers(indexers, kwargs)
        positional = {}
        aux_masks = {}  # underlying dim -> bool mask (level selections)
        for dim, label in indexers.items():
            if dim not in self.dims:
                # MultiIndex-style level selection: a 1-D coordinate
                # over another dim (the layout stack() produces).
                cv = self._coords.get(dim)
                if (
                    cv is not None
                    and len(cv.dims) == 1
                    and cv.dims[0] != dim
                    and cv.dims[0] in self.dims
                ):
                    other = cv.dims[0]
                    vals = np.asarray(cv.data)
                    lab = np.asarray(label)
                    if lab.ndim == 0:
                        m = vals == lab[()]
                        if not m.any():
                            raise KeyError(
                                f"{label!r} not found in level {dim!r}"
                            )
                    else:
                        m = np.isin(vals, lab)
                    aux_masks[other] = (
                        m if other not in aux_masks else aux_masks[other] & m
                    )
                    continue
                raise KeyError(f"no dimension {dim!r}")
            levels = None
            ent = self.encoding.get("_stacked_" + dim)
            if ent is not None:
                levels = ent[0]
            if levels is not None and isinstance(label, tuple):
                # full-tuple MultiIndex label -> scalar position
                positional[dim] = self._stacked_tuple_position(
                    dim, levels, label
                )
                continue
            if (
                levels is not None
                and isinstance(label, (list, np.ndarray))
                and len(label)
                and isinstance(label[0], tuple)
            ):
                positional[dim] = np.array(
                    [
                        self._stacked_tuple_position(dim, levels, t)
                        for t in label
                    ]
                )
                continue
            if dim not in self._coords or self._coords[dim].dims != (dim,):
                # No index coordinate: treat labels as positions.
                positional[dim] = label
                continue
            index = as_index(self._coords[dim].data)
            positional[dim] = resolve_label_indexer(
                index, label, method, tolerance
            )
        for other, m in aux_masks.items():
            pos = np.flatnonzero(m)
            if other in positional:
                prev = positional[other]
                if isinstance(prev, slice):
                    # slice + level selection on one dim: expand the
                    # slice to positions before intersecting
                    prev = np.arange(self.sizes[other])[prev]
                prev = np.atleast_1d(np.asarray(prev))
                positional[other] = prev[np.isin(prev, pos)]
            else:
                positional[other] = pos
        return self.isel(positional, drop=drop)

    def _stacked_tuple_position(self, dim, levels, label) -> int:
        """Flat position of a full (level0, level1, ...) label on a
        stacked dim."""
        if len(label) != len(levels):
            raise KeyError(
                f"stacked dim {dim!r} expects {len(levels)}-tuples "
                f"(levels {levels}), got {label!r}"
            )
        mask = np.ones(self.sizes[dim], bool)
        for lev, lab in zip(levels, label):
            lv = self._coords.get(lev)
            if lv is None:
                raise KeyError(
                    f"stacked level coordinate {lev!r} was dropped"
                )
            mask &= np.asarray(lv.data) == lab
        pos = np.flatnonzero(mask)
        if len(pos) == 0:
            raise KeyError(f"{label!r} not found in stacked dim {dim!r}")
        return int(pos[0])

    def __getitem__(self, key) -> "DataArray":
        if isinstance(key, str):
            return self.coords[key]
        if isinstance(key, dict):
            return self.isel(key)
        if not isinstance(key, tuple):
            key = (key,)
        indexers = {}
        for dim, k in zip(self.dims, key):
            indexers[dim] = k
        return self.isel(indexers)

    def __setitem__(self, key, value):
        if isinstance(value, DataArray):
            value = value.data
        if isinstance(key, str):
            self._coords[key] = (
                value if isinstance(value, Variable) else Variable((key,), value)
            )
            return
        if isinstance(key, dict):
            key = tuple(key.get(d, slice(None)) for d in self.dims)
        data = self.variable.data
        if not isinstance(data, np.ndarray):
            # jax arrays are immutable; use functional update
            data = data.at[key].set(value)
            self.variable.data = data
        else:
            data[key] = value

    # -- coordinate manipulation --------------------------------------------
    def assign_coords(self, coords=None, **kwargs) -> "DataArray":
        coords = dict(coords or {})
        coords.update(kwargs)
        new = dict(self._coords)
        new.update(_normalize_coords(coords, self.dims, self.shape))
        out = DataArray._construct(self.variable, new, self.name)
        out._validate_coords()
        return out

    def drop_vars(self, names, errors: str = "raise") -> "DataArray":
        if isinstance(names, str):
            names = [names]
        new = dict(self._coords)
        for n in names:
            if n in new:
                del new[n]
            elif errors == "raise":
                raise ValueError(f"{n!r} not found in coords")
        return DataArray._construct(self.variable, new, self.name)

    def reset_coords(self, names=None, drop=True):
        if not drop:
            raise NotImplementedError("reset_coords(drop=False)")
        names = names or [
            k for k, v in self._coords.items() if k not in self.dims
        ]
        return self.drop_vars(names, errors="ignore")

    def set_index(self, **kwargs):
        out = self
        for dim, coord in kwargs.items():
            if isinstance(coord, (list, tuple)):
                # Multi-coordinate index over an existing dim: record
                # the level order so tuple-label sel and (sparse)
                # unstack work; no reshape happens (xarray MultiIndex
                # semantics without the pandas object).
                for c in coord:
                    cv = out._coords[c]
                    if cv.dims != (dim,):
                        raise ValueError(
                            f"set_index level {c!r} must be a 1-D "
                            f"coordinate over {dim!r}"
                        )
                var = Variable(
                    out.variable.dims, out.variable.data, out.attrs,
                    dict(out.encoding),
                )
                # sizes=None: no product layout exists — unstack must
                # take the sparse unique-level path.
                var.encoding["_stacked_" + dim] = (tuple(coord), None)
                out = DataArray._construct(
                    var, dict(out._coords), out.name
                )
                continue
            # single coordinate: rename it onto the dim name
            cv = out._coords[coord]
            new = dict(out._coords)
            del new[coord]
            new[dim] = Variable((dim,), cv.data, cv.attrs)
            out = DataArray._construct(out.variable, new, out.name)
        return out

    def reset_index(self, dims_or_levels, drop: bool = False):
        """Remove the index of the given dims (xarray semantics).

        For a stacked/multi-coordinate dim this forgets the recorded
        MultiIndex layout; the level coordinates stay as plain
        (dim,)-shaped coords unless ``drop=True``.  For a plain
        dimension coordinate the coord is demoted to the non-index name
        ``<dim>_`` (xarray's convention), or dropped."""
        if isinstance(dims_or_levels, str):
            dims_or_levels = [dims_or_levels]
        var = Variable(
            self.variable.dims, self.variable.data, self.attrs,
            dict(self.encoding),
        )
        coords = dict(self._coords)
        for d in dims_or_levels:
            key = "_stacked_" + d
            if key in var.encoding:
                levels, _sizes = var.encoding.pop(key)
                if drop:
                    for name in levels:
                        coords.pop(name, None)
            elif d in coords and coords[d].dims == (d,):
                cv = coords.pop(d)
                if not drop:
                    coords[d + "_"] = cv
            else:
                raise ValueError(f"{d!r} has no index to reset")
        return DataArray._construct(var, coords, self.name)

    def reorder_levels(self, dim_order=None, **kwargs):
        """Reorder the levels of stacked-dim MultiIndexes.

        Only the recorded level ORDER changes (xarray semantics: data
        is untouched).  The product-reshape fast path of
        :meth:`unstack` keys on the original meshgrid layout, so a
        reordered dim unstacks through the sparse unique-level path
        (levels sorted), matching xarray's reindex-based unstack of a
        reordered MultiIndex."""
        dim_order = {**(dim_order or {}), **kwargs}
        var = Variable(
            self.variable.dims, self.variable.data, self.attrs,
            dict(self.encoding),
        )
        for d, order in dim_order.items():
            key = "_stacked_" + d
            if key not in var.encoding:
                raise ValueError(f"{d!r} has no MultiIndex")
            levels, _sizes = var.encoding[key]
            if sorted(order) != sorted(levels):
                raise ValueError(
                    f"reorder_levels for {d!r}: {tuple(order)} is not "
                    f"a permutation of {tuple(levels)}"
                )
            # sizes=None: the meshgrid layout no longer matches the
            # level order — unstack must take the sparse path.
            var.encoding[key] = (tuple(order), None)
        return DataArray._construct(var, dict(self._coords), self.name)

    # -- shaping ------------------------------------------------------------
    def transpose(self, *dims) -> "DataArray":
        var = self.variable.transpose(*dims)
        return DataArray._construct(var, dict(self._coords), self.name)

    @property
    def T(self):
        return self.transpose()

    def squeeze(self, dim=None, drop: bool = False) -> "DataArray":
        if dim is None:
            drop_dims = [d for d, s in self.sizes.items() if s == 1]
        else:
            drop_dims = [dim] if isinstance(dim, str) else list(dim)
        return self.isel({d: 0 for d in drop_dims}, drop=drop)

    def expand_dims(self, dim=None, axis=None, **dim_kwargs) -> "DataArray":
        if isinstance(dim, str):
            dims = {dim: 1}
        elif isinstance(dim, (list, tuple)):
            dims = {d: 1 for d in dim}
        else:
            dims = dict(dim or {})
        dims.update(dim_kwargs)
        var = self.variable
        coords = dict(self._coords)
        for i, (d, size_or_values) in enumerate(dims.items()):
            ax = axis if axis is not None else i
            var = var.expand_dims(d, axis=ax)
            if not isinstance(size_or_values, (int, np.integer)):
                values = np.asarray(size_or_values)
                coords[d] = Variable((d,), values)
                if len(values) > 1:
                    xp = get_namespace(var.data)
                    shape = list(var.shape)
                    shape[ax] = len(values)
                    var = Variable(var.dims, xp.broadcast_to(var.data, tuple(shape)), var.attrs)
            elif size_or_values > 1:
                xp = get_namespace(var.data)
                shape = list(var.shape)
                shape[ax] = int(size_or_values)
                var = Variable(var.dims, xp.broadcast_to(var.data, tuple(shape)), var.attrs)
        return DataArray._construct(var, coords, self.name)

    def broadcast_like(self, other) -> "DataArray":
        sizes = dict(other.sizes)
        sizes.update(self.sizes)
        dims = tuple(dict.fromkeys(tuple(other.dims) + tuple(self.dims)))
        var = self.variable.broadcast_to(dims, sizes)
        coords = dict(other._coords)
        coords.update(self._coords)
        return DataArray._construct(var, coords, self.name)

    def stack_dims(self, new_dim: str, dims: Sequence[str]) -> "DataArray":
        """Collapse ``dims`` (in order) into a single new trailing dim."""
        other = [d for d in self.dims if d not in dims]
        var = self.variable.transpose(*(other + list(dims)))
        n = int(np.prod([self.sizes[d] for d in dims]))
        shape = tuple(self.sizes[d] for d in other) + (n,)
        data = var.data.reshape(shape)
        coords = {
            k: v for k, v in self._coords.items() if not (set(v.dims) & set(dims))
        }
        return DataArray._construct(
            Variable(tuple(other) + (new_dim,), data, self.attrs), coords, self.name
        )

    # -- computation --------------------------------------------------------
    def _apply_binary(self, other, op, reflexive=False) -> "DataArray":
        if isinstance(other, DataArray):
            var = self.variable._binary_op(other.variable, op, reflexive)
            coords = _merge_coords(self._coords, other._coords)
            name = self.name if self.name == other.name else None
        else:
            var = self.variable._binary_op(other, op, reflexive)
            coords = dict(self._coords)
            name = self.name
        coords = {
            k: v for k, v in coords.items() if set(v.dims) <= set(var.dims)
        }
        return DataArray._construct(var, coords, name)

    def _apply_unary(self, op) -> "DataArray":
        var = Variable(self.dims, op(self.variable.data), self.attrs)
        return DataArray._construct(var, dict(self._coords), self.name)

    def _reduce(self, func_name, dim=None, skipna=None, keep_attrs=False, **kwargs) -> "DataArray":
        var = self.variable.reduce(func_name, dim=dim, skipna=skipna, **kwargs)
        if not keep_attrs:
            var = Variable(var.dims, var.data)
        coords = {
            k: v for k, v in self._coords.items() if set(v.dims) <= set(var.dims)
        }
        return DataArray._construct(var, coords, self.name)

    def where(self, cond, other=np.nan, drop: bool = False) -> "DataArray":
        if isinstance(cond, DataArray):
            cond_var = cond.variable
        else:
            cond_var = Variable(self.dims, cond)
        if isinstance(other, DataArray):
            other = other.variable
        if drop:
            mask = np.asarray(cond_var.data)
            keep_indexers = {}
            for dim in cond_var.dims:
                axes = tuple(i for i, d in enumerate(cond_var.dims) if d != dim)
                keep = mask.any(axis=axes) if axes else mask
                keep_indexers[dim] = np.flatnonzero(keep)
            result = self.isel(keep_indexers)
            if isinstance(cond, DataArray):
                sub_cond = cond.isel(keep_indexers)
            else:
                # Plain array/Variable cond must be subset too, or the
                # recursive where() sees mismatched sizes.
                sub_cond = cond_var.isel(keep_indexers).data
            sub_other = other
            if isinstance(other, Variable):
                # Array-valued other follows the drop (same mismatch).
                sub = {
                    d: keep_indexers[d]
                    for d in other.dims
                    if d in keep_indexers
                }
                if sub:
                    sub_other = other.isel(sub)
            return result.where(sub_cond, sub_other)
        self_b = self
        xp = get_namespace(self.data)
        sv, cv = broadcast_variables(self.variable, cond_var)
        if isinstance(other, Variable):
            sv2, ov = broadcast_variables(sv, other)
            data = xp.where(cv.broadcast_to(sv2.dims, sv2.sizes).data, sv2.data, ov.data)
            var = Variable(sv2.dims, data, self.attrs)
        else:
            data = xp.where(cv.data, sv.data, other)
            var = Variable(sv.dims, data, self.attrs)
        coords = {
            k: v for k, v in self_b._coords.items() if set(v.dims) <= set(var.dims)
        }
        if isinstance(cond, DataArray):
            coords = _merge_coords(coords, {
                k: v for k, v in cond._coords.items() if set(v.dims) <= set(var.dims)
            })
        return DataArray._construct(var, coords, self.name)

    def fillna(self, value) -> "DataArray":
        if isinstance(value, DataArray):
            value = value.variable.broadcast_to(self.dims, self.sizes).data
        return DataArray._construct(
            self.variable.fillna(value), dict(self._coords), self.name
        )

    def notnull(self) -> "DataArray":
        return DataArray._construct(
            self.variable.notnull(), dict(self._coords), self.name
        )

    def isnull(self) -> "DataArray":
        return DataArray._construct(
            self.variable.isnull(), dict(self._coords), self.name
        )

    def clip(self, min=None, max=None) -> "DataArray":
        xp = get_namespace(self.data)
        return self._apply_unary(lambda d: xp.clip(d, min, max))

    def round(self, decimals=0) -> "DataArray":
        xp = get_namespace(self.data)
        return self._apply_unary(lambda d: xp.round(d, decimals))

    def isin(self, values) -> "DataArray":
        xp = get_namespace(self.data)
        return self._apply_unary(lambda d: xp.isin(d, np.asarray(values)))

    def diff(self, dim, n: int = 1) -> "DataArray":
        axis = self.dims.index(dim)
        xp = get_namespace(self.data)
        var = Variable(self.dims, xp.diff(self.data, n=n, axis=axis), self.attrs)
        coords = {}
        for k, v in self._coords.items():
            if dim in v.dims:
                sub = v.isel({dim: slice(n, None)})
                coords[k] = sub
            else:
                coords[k] = v
        return DataArray._construct(var, coords, self.name)

    def cumsum(self, dim=None) -> "DataArray":
        xp = get_namespace(self.data)
        if dim is None:
            axis = None
        else:
            axis = self.dims.index(dim)
        return self._apply_unary(lambda d: xp.cumsum(d, axis=axis))

    def argmax(self, dim=None):
        return self._reduce("argmax", dim=dim, skipna=False)

    def argmin(self, dim=None):
        return self._reduce("argmin", dim=dim, skipna=False)

    def idxmax(self, dim=None, skipna=True):
        return self._idx_reduce("argmax", dim, skipna)

    def idxmin(self, dim=None, skipna=True):
        return self._idx_reduce("argmin", dim, skipna)

    def _idx_reduce(self, op, dim, skipna):
        dim = dim or self.dims[0]
        values = np.asarray(self.data)
        if skipna and np.issubdtype(values.dtype, np.floating):
            # NaN must not win the arg reduction (xarray skipna=True).
            fill = -np.inf if op == "argmax" else np.inf
            clean = np.where(np.isnan(values), fill, values)
            axis = self.dims.index(dim)
            pos_data = np.argmax(clean, axis=axis) if op == "argmax" else np.argmin(clean, axis=axis)
            pos_dims = tuple(d for d in self.dims if d != dim)
            pos = DataArray._construct(
                Variable(pos_dims, pos_data),
                {k: v for k, v in self._coords.items() if dim not in v.dims},
                self.name,
            )
        else:
            pos = self._reduce(op, dim=dim, skipna=False)
        index = np.asarray(self.get_index(dim))
        labels = index[np.asarray(pos.data)]
        if skipna and np.issubdtype(values.dtype, np.floating):
            # All-NaN slices map to NaN, not index[0] (xarray semantics).
            axis = self.dims.index(dim)
            all_nan = np.isnan(values).all(axis=axis)
            if all_nan.any():
                if labels.dtype.kind in "mM":
                    labels = np.where(
                        all_nan, np.array("NaT", dtype=labels.dtype), labels
                    )
                else:
                    labels = np.where(all_nan, np.nan, labels.astype(np.float64))
        return DataArray._construct(
            Variable(pos.dims, labels), dict(pos._coords), self.name
        )

    def equals(self, other) -> bool:
        if not isinstance(other, DataArray):
            return False
        if self.dims != other.dims or self.shape != other.shape:
            return False
        if not _array_equiv(self.values, other.values):
            return False
        for k in self._coords:
            if k not in other._coords:
                return False
            if not _array_equiv(
                np.asarray(self._coords[k].data), np.asarray(other._coords[k].data)
            ):
                return False
        return True

    def identical(self, other) -> bool:
        return (
            self.equals(other)
            and self.name == other.name
            and self.attrs == other.attrs
        )

    def compute(self):
        return self

    def load(self):
        return self

    def chunk(self, *args, **kwargs):
        return self

    def persist(self):
        return self

    def pipe(self, func, *args, **kwargs):
        return func(self, *args, **kwargs)

    def dropna(self, dim: str, how: str = "any") -> "DataArray":
        """Drop positions along ``dim`` containing NaN (any/all over the
        other dimensions)."""
        axis = tuple(i for i, d in enumerate(self.dims) if d != dim)
        isnan = np.isnan(np.asarray(self.data))
        mask = isnan.any(axis=axis) if how == "any" else isnan.all(axis=axis)
        return self.isel({dim: np.flatnonzero(~mask)})

    # -- xarray-parity convenience methods ---------------------------------
    def assign_attrs(self, *args, **kwargs) -> "DataArray":
        out = self.copy(deep=False)
        out.attrs.update(dict(*args, **kwargs))
        return out

    def count(self, dim=None) -> "DataArray":
        """Number of non-null elements along ``dim`` (NaN for floats,
        NaT for datetimes/timedeltas)."""
        valid = np.asarray(self.variable.notnull().data)
        var = Variable(self.dims, valid.astype(np.int64))
        out = DataArray._construct(var, dict(self._coords), self.name)
        return out._reduce("sum", dim=dim, skipna=False)

    def quantile(self, q, dim=None, skipna=True, **kwargs) -> "DataArray":
        """NaN-aware quantiles; array ``q`` adds a leading ``quantile``
        dimension (xarray semantics)."""
        data = np.asarray(self.data)
        q_arr = np.atleast_1d(np.asarray(q, dtype=np.float64))
        scalar_q = np.ndim(q) == 0
        if dim is None:
            axis = None
            new_dims = ()
        else:
            dims = [dim] if isinstance(dim, str) else list(dim)
            axis = tuple(self.dims.index(d) for d in dims)
            new_dims = tuple(d for d in self.dims if d not in dims)
        func = np.nanquantile if skipna else np.quantile
        result = func(data, q_arr, axis=axis)
        coords = {
            k: v
            for k, v in self._coords.items()
            if set(v.dims) <= set(new_dims)
        }
        if scalar_q:
            result = result[0]
            var = Variable(new_dims, result)
        else:
            var = Variable(("quantile",) + new_dims, result)
            coords["quantile"] = Variable(("quantile",), q_arr)
        return DataArray._construct(var, coords, self.name)

    def cumprod(self, dim=None) -> "DataArray":
        xp = get_namespace(self.data)
        axis = None if dim is None else self.dims.index(dim)
        return self._apply_unary(lambda d: xp.cumprod(d, axis=axis))

    def rank(self, dim) -> "DataArray":
        """Rank values along ``dim`` (average method, NaN stays NaN)."""
        from scipy.stats import rankdata

        axis = self.dims.index(dim)
        data = np.asarray(self.data, dtype=np.float64)
        ranked = rankdata(
            data, method="average", axis=axis, nan_policy="omit"
        ).astype(np.float64)
        ranked = np.where(np.isnan(data), np.nan, ranked)
        var = Variable(self.dims, ranked, self.attrs)
        return DataArray._construct(var, dict(self._coords), self.name)

    def _shift_kwargs(self, shifts, kwargs):
        shifts = dict(shifts or {})
        shifts.update(kwargs)
        return shifts

    def shift(self, shifts=None, fill_value=np.nan, **kwargs) -> "DataArray":
        """Shift data along dims, introducing ``fill_value`` (coords are
        NOT shifted — xarray semantics)."""
        shifts = self._shift_kwargs(shifts, kwargs)
        data = np.asarray(self.data)
        if data.dtype.kind in "iub" and (
            fill_value is np.nan or (
                isinstance(fill_value, float) and np.isnan(fill_value)
            )
        ):
            data = data.astype(np.float64)
        out = data.copy()
        for dim, n in shifts.items():
            if n == 0:
                continue
            axis = self.dims.index(dim)
            out = np.roll(out, n, axis=axis)
            index = [slice(None)] * out.ndim
            index[axis] = slice(0, n) if n > 0 else slice(n, None)
            out[tuple(index)] = fill_value
        var = Variable(self.dims, out, self.attrs)
        return DataArray._construct(var, dict(self._coords), self.name)

    def roll(self, shifts=None, roll_coords=False, **kwargs) -> "DataArray":
        """Cyclically roll data (and optionally coords) along dims."""
        shifts = self._shift_kwargs(shifts, kwargs)
        out = np.asarray(self.data)
        for dim, n in shifts.items():
            out = np.roll(out, n, axis=self.dims.index(dim))
        coords = {}
        for k, v in self._coords.items():
            if roll_coords and any(d in shifts for d in v.dims):
                cdat = np.asarray(v.data)
                for dim, n in shifts.items():
                    if dim in v.dims:
                        cdat = np.roll(cdat, n, axis=v.dims.index(dim))
                coords[k] = Variable(v.dims, cdat, v.attrs)
            else:
                coords[k] = v
        var = Variable(self.dims, out, self.attrs)
        return DataArray._construct(var, coords, self.name)

    def polyfit(self, dim: str, deg: int, skipna=None):
        """Least-squares polynomial fit along ``dim``.

        Returns a Dataset with ``polyfit_coefficients`` over a
        ``degree`` dimension (descending powers, xarray layout).
        NaN-bearing columns fit over their finite samples when skipna
        is true (default: skip when NaNs are present).
        """
        from xugrid_tpu.xdata.dataset import Dataset

        axis = self.dims.index(dim)
        x = np.asarray(self.get_index(dim), dtype=np.float64)
        data = np.asarray(self.data, dtype=np.float64)
        moved = np.moveaxis(data, axis, 0)
        flat = moved.reshape(len(x), -1)
        has_nan = bool(np.isnan(flat).any())
        if skipna is None:
            skipna = has_nan
        vander = np.vander(x, deg + 1)  # descending powers
        coeffs = np.full((deg + 1, flat.shape[1]), np.nan)
        if not has_nan:
            coeffs, *_ = np.linalg.lstsq(vander, flat, rcond=None)
        elif skipna:
            finite_cols = ~np.isnan(flat).any(axis=0)
            if finite_cols.any():
                coeffs[:, finite_cols], *_ = np.linalg.lstsq(
                    vander, flat[:, finite_cols], rcond=None
                )
            for c in np.flatnonzero(~finite_cols):
                ok = np.isfinite(flat[:, c])
                if ok.sum() > deg:
                    coeffs[:, c], *_ = np.linalg.lstsq(
                        vander[ok], flat[ok, c], rcond=None
                    )
        other_dims = tuple(d for d in self.dims if d != dim)
        other_shape = tuple(
            s for d, s in zip(self.dims, self.shape) if d != dim
        )
        out = coeffs.reshape((deg + 1,) + other_shape)
        coords = {
            k: v
            for k, v in self._coords.items()
            if dim not in v.dims
        }
        coords["degree"] = Variable(("degree",), np.arange(deg, -1, -1))
        ds = Dataset()
        ds._variables.update(coords)
        ds._coord_names = set(coords)
        ds["polyfit_coefficients"] = DataArray._construct(
            Variable(("degree",) + other_dims, out), dict(coords), None
        )
        return ds

    def sortby(self, variables, ascending: bool = True) -> "DataArray":
        """Sort along the dimension(s) of the given coordinate(s)."""
        if isinstance(variables, (str, DataArray)):
            variables = [variables]
        out = self
        for v in variables:
            key = self._coords[v] if isinstance(v, str) else v.variable
            if len(key.dims) != 1:
                raise ValueError("sortby requires 1-D sort keys")
            dim = key.dims[0]
            order = np.argsort(np.asarray(key.data), kind="stable")
            if not ascending:
                order = order[::-1]
            out = out.isel({dim: order})
        return out

    def _fill_directional(self, dim, limit, reverse) -> "DataArray":
        axis = self.dims.index(dim)
        data = np.asarray(self.data, dtype=np.float64)
        moved = np.moveaxis(data, axis, 0)
        n = moved.shape[0]
        if reverse:
            moved = moved[::-1]
        idx = np.arange(n).reshape((n,) + (1,) * (moved.ndim - 1))
        valid = ~np.isnan(moved)
        last = np.where(valid, idx, -1)
        last = np.maximum.accumulate(last, axis=0)
        if limit is not None:
            age = idx - last
            last = np.where((last >= 0) & (age <= limit), last, -1)
        gather = np.where(last >= 0, last, 0)
        filled = np.take_along_axis(moved, gather, axis=0)
        filled = np.where(last >= 0, filled, np.nan)
        filled = np.where(valid, moved, filled)
        if reverse:
            filled = filled[::-1]
        out = np.moveaxis(filled, 0, axis)
        var = Variable(self.dims, out, self.attrs)
        return DataArray._construct(var, dict(self._coords), self.name)

    def ffill(self, dim, limit=None) -> "DataArray":
        """Forward-fill NaNs along ``dim``."""
        return self._fill_directional(dim, limit, reverse=False)

    def bfill(self, dim, limit=None) -> "DataArray":
        """Backward-fill NaNs along ``dim``."""
        return self._fill_directional(dim, limit, reverse=True)

    def integrate(self, coord) -> "DataArray":
        """Trapezoidal integral over the named coordinate."""
        key = self._coords[coord]
        dim = key.dims[0]
        axis = self.dims.index(dim)
        result = np.trapezoid(
            np.asarray(self.data), x=np.asarray(key.data), axis=axis
        )
        new_dims = tuple(d for d in self.dims if d != dim)
        coords = {
            k: v
            for k, v in self._coords.items()
            if set(v.dims) <= set(new_dims)
        }
        return DataArray._construct(
            Variable(new_dims, result), coords, self.name
        )

    def differentiate(self, coord) -> "DataArray":
        """Central-difference derivative along the named coordinate."""
        key = self._coords[coord]
        dim = key.dims[0]
        axis = self.dims.index(dim)
        result = np.gradient(
            np.asarray(self.data, dtype=np.float64),
            np.asarray(key.data, dtype=np.float64),
            axis=axis,
        )
        var = Variable(self.dims, result, self.attrs)
        return DataArray._construct(var, dict(self._coords), self.name)

    def dot(self, other, dims=None) -> "DataArray":
        """Tensor contraction over shared (or named) dimensions."""
        if dims is None:
            dims = [d for d in self.dims if d in other.dims]
        elif isinstance(dims, str):
            dims = [dims]
        a_keep = [d for d in self.dims if d not in dims]
        b_keep = [d for d in other.dims if d not in dims]
        sub = {d: chr(ord("a") + i)
               for i, d in enumerate(dict.fromkeys(
                   tuple(self.dims) + tuple(other.dims)))}
        spec = (
            "".join(sub[d] for d in self.dims)
            + ","
            + "".join(sub[d] for d in other.dims)
            + "->"
            + "".join(sub[d] for d in a_keep + b_keep)
        )
        result = np.einsum(
            spec, np.asarray(self.data), np.asarray(other.data)
        )
        new_dims = tuple(a_keep + b_keep)
        coords = {
            k: v
            for k, v in {**other._coords, **self._coords}.items()
            if set(v.dims) <= set(new_dims)
        }
        return DataArray._construct(
            Variable(new_dims, result), coords, self.name
        )

    def map_blocks(self, func, args=(), kwargs=None, template=None):
        """Apply ``func`` to the whole array (no dask: single block)."""
        return func(self, *args, **(kwargs or {}))

    def stack(self, dimensions=None, **kwargs) -> "DataArray":
        """Stack multiple dims into one; the original dim coordinates
        become (stacked,)-shaped coords (xarray semantics, without a
        pandas MultiIndex)."""
        dimensions = dict(dimensions or {})
        dimensions.update(kwargs)
        out = self
        for new_dim, dims in dimensions.items():
            dims = list(dims)
            base = out.stack_dims(new_dim, dims)
            # expand the collapsed dims' coords over the product
            sizes = [out.sizes[d] for d in dims]
            grids = np.meshgrid(
                *[
                    np.asarray(out._coords[d].data)
                    if d in out._coords
                    else np.arange(out.sizes[d])
                    for d in dims
                ],
                indexing="ij",
            )
            coords = dict(base._coords)
            for d, g in zip(dims, grids):
                coords[d] = Variable((new_dim,), g.reshape(-1))
            out = DataArray._construct(base.variable, coords, out.name)
            out.encoding["_stacked_" + new_dim] = (tuple(dims), tuple(sizes))
        return out

    def unstack(self, dim=None, fill_value=np.nan) -> "DataArray":
        """Invert :meth:`stack` using the recorded stacked-dim layout."""
        if dim is None:
            dims = [
                k[len("_stacked_"):]
                for k in self.encoding
                if k.startswith("_stacked_")
            ]
        else:
            dims = [dim] if isinstance(dim, str) else list(dim)
        out = self
        for d in dims:
            key = "_stacked_" + d
            if key not in out.encoding:
                raise ValueError(
                    f"cannot unstack {d!r}: not created by stack()"
                )
            orig_dims, orig_sizes = out.encoding[key]
            axis = out.dims.index(d)
            data = np.asarray(out.data)
            new_dims = out.dims[:axis] + orig_dims + out.dims[axis + 1:]
            coords = {}
            # The pure-reshape path requires the stacked dim to still be
            # in canonical meshgrid order: a matching LENGTH alone is not
            # enough (sortby/roll keep the length while permuting rows,
            # which a reshape would silently scramble).
            canonical = orig_sizes is not None and data.shape[
                axis
            ] == int(np.prod(orig_sizes))
            if canonical:
                for k in orig_dims:
                    if k not in out._coords:
                        continue  # dropped level: no order evidence
                    flat = np.asarray(out._coords[k].data).reshape(
                        orig_sizes
                    )
                    j = orig_dims.index(k)
                    index = [slice(0, 1)] * len(orig_sizes)
                    index[j] = slice(None)
                    expect = np.broadcast_to(flat[tuple(index)], flat.shape)
                    if flat.dtype.kind == "f":
                        same = np.array_equal(flat, expect, equal_nan=True)
                    else:
                        same = np.array_equal(flat, expect)
                    if not same:
                        canonical = False
                        break
            if canonical:
                # full product: a pure reshape, original level order
                new_shape = (
                    data.shape[:axis]
                    + tuple(orig_sizes)
                    + data.shape[axis + 1:]
                )
                unstacked = data.reshape(new_shape)
                for k, v in out._coords.items():
                    if d in v.dims:
                        if k in orig_dims:
                            # recover the 1-D coordinate from the product
                            flat = np.asarray(v.data).reshape(orig_sizes)
                            j = orig_dims.index(k)
                            index = [0] * len(orig_sizes)
                            index[j] = slice(None)
                            coords[k] = Variable((k,), flat[tuple(index)])
                        # other stacked-dim coords are dropped
                    else:
                        coords[k] = v
            else:
                # subset of the product (after sel/isel): scatter into
                # the unique-level grid, missing cells take fill_value
                # (xarray's sparse-unstack semantics; levels sorted).
                try:
                    level_vals = [
                        np.asarray(out._coords[k].data) for k in orig_dims
                    ]
                except KeyError:
                    raise ValueError(
                        f"cannot unstack subset of {d!r}: a level "
                        "coordinate was dropped"
                    )
                uniq = [np.unique(lv) for lv in level_vals]
                new_sizes = tuple(len(u) for u in uniq)
                flat_idx = np.ravel_multi_index(
                    [
                        np.searchsorted(u, lv)
                        for u, lv in zip(uniq, level_vals)
                    ],
                    new_sizes,
                )
                d0 = np.moveaxis(data, axis, 0)
                dtype = d0.dtype
                full = len(np.unique(flat_idx)) == int(np.prod(new_sizes))
                if not full and dtype.kind in "iub" and not isinstance(
                    fill_value, (int, np.integer)
                ):
                    dtype = np.float64
                out0 = np.full(
                    (int(np.prod(new_sizes)),) + d0.shape[1:],
                    fill_value,
                    dtype=dtype,
                )
                out0[flat_idx] = d0
                unstacked = np.moveaxis(
                    out0.reshape(new_sizes + d0.shape[1:]),
                    range(len(new_sizes)),
                    range(axis, axis + len(new_sizes)),
                )
                for k, v in out._coords.items():
                    if d in v.dims:
                        if k in orig_dims:
                            coords[k] = Variable(
                                (k,), uniq[orig_dims.index(k)]
                            )
                    else:
                        coords[k] = v
            var = Variable(new_dims, unstacked, out.attrs)
            enc = dict(out.encoding)
            enc.pop(key)
            result = DataArray._construct(var, coords, out.name)
            result.encoding.update(enc)
            out = result
        return out

    def reindex(
        self,
        indexers=None,
        method=None,
        tolerance=None,
        fill_value=np.nan,
        **kwargs,
    ) -> "DataArray":
        """Conform to new coordinate labels; unmatched labels take
        ``fill_value`` (or the nearest/ffill/bfill match)."""
        indexers = dict(indexers or {})
        indexers.update(kwargs)
        out = self
        for dim, labels in indexers.items():
            labels = np.asarray(
                labels.data if isinstance(labels, DataArray) else labels
            )
            current = np.asarray(out._coords[dim].data)
            pos = np.full(len(labels), -1, dtype=np.int64)
            if method is None:
                if current.dtype.kind == "O":
                    # object labels (mixed types) are not sortable;
                    # hash lookup, with the same non-unique guard
                    if len(set(current.tolist())) != len(current):
                        raise ValueError(
                            f"cannot reindex dimension {dim!r}: "
                            "index has duplicate labels"
                        )
                    lookup = {v: i for i, v in enumerate(current.tolist())}
                    for i, lab in enumerate(labels.tolist()):
                        pos[i] = lookup.get(lab, -1)
                else:
                    order = np.argsort(current, kind="stable")
                    sc = current[order]
                    if len(sc) > 1 and (sc[1:] == sc[:-1]).any():
                        raise ValueError(
                            f"cannot reindex dimension {dim!r}: "
                            "index has duplicate labels"
                        )
                    j = np.searchsorted(sc, labels)
                    safe = np.clip(j, 0, len(sc) - 1)
                    exact = (j < len(sc)) & (sc[safe] == labels)
                    pos = np.where(exact, order[safe], -1)
            else:
                order = np.argsort(current, kind="stable")
                sc = current[order]
                j = np.searchsorted(sc, labels)
                if method == "nearest":
                    j_lo = np.clip(j - 1, 0, len(sc) - 1)
                    j_hi = np.clip(j, 0, len(sc) - 1)
                    # strict <: pandas breaks exact-distance ties
                    # toward the HIGHER label
                    pick = np.where(
                        np.abs(labels - sc[j_lo])
                        < np.abs(sc[j_hi] - labels),
                        j_lo,
                        j_hi,
                    )
                elif method in ("ffill", "pad"):
                    exact = (j < len(sc)) & (
                        sc[np.clip(j, 0, len(sc) - 1)] == labels
                    )
                    pick = np.where(exact, j, j - 1)
                elif method in ("bfill", "backfill"):
                    pick = j
                else:
                    raise ValueError(f"unknown reindex method: {method}")
                valid = (pick >= 0) & (pick < len(sc))
                if tolerance is not None:
                    safe = np.clip(pick, 0, len(sc) - 1)
                    valid &= np.abs(sc[safe] - labels) <= tolerance
                pos = np.where(valid, order[np.clip(pick, 0, len(sc) - 1)], -1)
            axis = out.dims.index(dim)
            data = np.asarray(out.data)
            if data.dtype.kind in "iub" and not (
                isinstance(fill_value, (int, np.integer))
            ):
                data = data.astype(np.float64)
            gathered = np.take(data, np.clip(pos, 0, len(current) - 1), axis=axis)
            miss_shape = [1] * gathered.ndim
            miss_shape[axis] = len(labels)
            miss = (pos < 0).reshape(miss_shape)
            gathered = np.where(miss, fill_value, gathered)
            coords = {}
            for k, v in out._coords.items():
                if k == dim:
                    coords[k] = Variable((dim,), labels)
                elif dim in v.dims:
                    continue  # non-index coords over dim are dropped
                else:
                    coords[k] = v
            var = Variable(out.dims, gathered, out.attrs)
            out = DataArray._construct(var, coords, out.name)
        return out

    def reindex_like(self, other, method=None, tolerance=None,
                     fill_value=np.nan) -> "DataArray":
        indexers = {
            d: np.asarray(other._coords[d].data)
            for d in self.dims
            if d in other._coords and d in self._coords
        }
        return self.reindex(
            indexers, method=method, tolerance=tolerance,
            fill_value=fill_value,
        )

    def interp(self, coords=None, method="linear", kwargs=None,
               **coords_kwargs) -> "DataArray":
        """Sequential 1-D interpolation along each named dim
        (``method``: "linear", "nearest", or the scipy spline kinds
        "slinear"/"quadratic"/"cubic" — the set xarray exposes via
        scipy.interpolate for 1-D interp)."""
        spline_kinds = ("slinear", "quadratic", "cubic")
        if method not in ("linear", "nearest") + spline_kinds:
            raise NotImplementedError(
                "interp supports method='linear', 'nearest', "
                "'slinear', 'quadratic', or 'cubic'"
            )
        targets = dict(coords or {})
        targets.update(coords_kwargs)
        out = self
        for dim, new in targets.items():
            new = np.asarray(
                new.data if isinstance(new, DataArray) else new,
                dtype=np.float64,
            )
            scalar = new.ndim == 0
            new1 = np.atleast_1d(new)
            old = np.asarray(out._coords[dim].data, dtype=np.float64)
            axis = out.dims.index(dim)
            data = np.asarray(out.data, dtype=np.float64)
            moved = np.moveaxis(data, axis, -1)
            flat = moved.reshape(-1, moved.shape[-1])
            order = np.argsort(old, kind="stable")
            so = old[order]
            if method == "nearest":
                # midpoint rule, out-of-range -> NaN (xarray semantics)
                j = np.searchsorted(so, new1)
                j_lo = np.clip(j - 1, 0, len(so) - 1)
                j_hi = np.clip(j, 0, len(so) - 1)
                pick = np.where(
                    np.abs(new1 - so[j_lo]) <= np.abs(so[j_hi] - new1),
                    j_lo,
                    j_hi,
                )
                oob = (new1 < so[0]) | (new1 > so[-1])
                res = flat[:, order][:, pick]
                res = np.where(oob[None, :], np.nan, res)
            elif method in spline_kinds:
                from scipy.interpolate import interp1d

                f = interp1d(
                    so, flat[:, order], kind=method, axis=1,
                    bounds_error=False, fill_value=np.nan,
                    assume_sorted=True,
                )
                res = f(new1)
            else:
                res = np.empty((flat.shape[0], len(new1)), dtype=np.float64)
                for i in range(flat.shape[0]):
                    res[i] = np.interp(
                        new1, so, flat[i][order], left=np.nan, right=np.nan
                    )
            shaped = res.reshape(moved.shape[:-1] + (len(new1),))
            result = np.moveaxis(shaped, -1, axis)
            coords2 = {}
            for k, v in out._coords.items():
                if k == dim:
                    coords2[k] = Variable((dim,), new1)
                elif dim in v.dims:
                    continue
                else:
                    coords2[k] = v
            var = Variable(out.dims, result, out.attrs)
            out = DataArray._construct(var, coords2, out.name)
            if scalar:
                out = out.isel({dim: 0})
        return out

    def interp_like(self, other, method="linear") -> "DataArray":
        targets = {
            d: np.asarray(other._coords[d].data)
            for d in self.dims
            if d in other._coords and d in self._coords
        }
        return self.interp(targets, method=method)

    def weighted(self, weights) -> "DataArrayWeighted":
        from xugrid_tpu.xdata.grouped import DataArrayWeighted

        return DataArrayWeighted(self, weights)

    def groupby(self, group) -> "DataArrayGroupBy":
        from xugrid_tpu.xdata.grouped import DataArrayGroupBy

        return DataArrayGroupBy(self, group)

    def rolling(self, dim=None, min_periods=None, center=False, **kwargs):
        from xugrid_tpu.xdata.grouped import DataArrayRolling

        windows = dict(dim or {})
        windows.update(kwargs)
        return DataArrayRolling(self, windows, min_periods, center)

    def coarsen(self, dim=None, boundary="exact", **kwargs):
        from xugrid_tpu.xdata.grouped import DataArrayCoarsen

        windows = dict(dim or {})
        windows.update(kwargs)
        return DataArrayCoarsen(self, windows, boundary)

    def resample(self, indexer=None, **kwargs):
        from xugrid_tpu.xdata.grouped import DataArrayResample

        indexer = dict(indexer or {})
        indexer.update(kwargs)
        if len(indexer) != 1:
            raise ValueError("resample expects exactly one dim=freq pair")
        (dim, freq), = indexer.items()
        return DataArrayResample(self, dim, freq)

    def interpolate_na(
        self, dim=None, method: str = "linear", fill_value=None, **kwargs
    ):
        """
        Fill NaN values by 1D interpolation along ``dim`` (xarray
        semantics: interior gaps are interpolated, leading/trailing NaNs
        remain unless ``fill_value="extrapolate"``).  For topology-aware
        filling over the mesh use ``uda.ugrid.interpolate_na``.
        """
        if dim is None:
            raise ValueError("interpolate_na requires a dim")
        if method not in ("linear", "nearest"):
            raise NotImplementedError(f"method {method!r} not supported")
        axis = self.dims.index(dim)
        values = np.asarray(self.data, dtype=np.float64)
        moved = np.moveaxis(values, axis, -1)
        flat = moved.reshape(-1, moved.shape[-1]).copy()
        if dim in self.coords:
            x = np.asarray(self.coords[dim].data, dtype=np.float64)
        else:
            x = np.arange(flat.shape[-1], dtype=np.float64)
        extrapolate = fill_value == "extrapolate"
        for row in flat:
            ok = ~np.isnan(row)
            if ok.all() or not ok.any():
                continue
            missing = ~ok
            if method == "linear":
                left = right = None if extrapolate else np.nan
                row[missing] = np.interp(
                    x[missing], x[ok], row[ok], left=left, right=right
                )
                if extrapolate and missing.any():
                    # np.interp clamps; true linear extrapolation at ends.
                    xs, ys = x[ok], row[ok]
                    lo = x < xs[0]
                    hi = x > xs[-1]
                    if len(xs) > 1:
                        s0 = (ys[1] - ys[0]) / (xs[1] - xs[0])
                        s1 = (ys[-1] - ys[-2]) / (xs[-1] - xs[-2])
                        row[lo & missing] = ys[0] + s0 * (x[lo & missing] - xs[0])
                        row[hi & missing] = ys[-1] + s1 * (x[hi & missing] - xs[-1])
            else:  # nearest
                idx_ok = np.flatnonzero(ok)
                pos = np.searchsorted(x[ok], x[missing])
                pos = np.clip(pos, 1, len(idx_ok) - 1)
                left_i = idx_ok[pos - 1]
                right_i = idx_ok[pos]
                take_right = np.abs(x[right_i] - x[missing]) < np.abs(
                    x[missing] - x[left_i]
                )
                filled = np.where(take_right, row[right_i], row[left_i])
                if not extrapolate:
                    # Leading/trailing NaNs stay NaN (scipy/xarray
                    # semantics), matching the linear branch.
                    xs = x[ok]
                    outside = (x[missing] < xs[0]) | (x[missing] > xs[-1])
                    filled = np.where(outside, np.nan, filled)
                row[missing] = filled
        out = np.moveaxis(flat.reshape(moved.shape), -1, axis)
        return self._construct(
            Variable(self.dims, out, dict(self.attrs)),
            dict(self._coords),
            self.name,
        )


def _array_equiv(a: np.ndarray, b: np.ndarray) -> bool:
    if a.shape != b.shape:
        return False
    if a.dtype.kind in "fc" or b.dtype.kind in "fc":
        both_nan = np.isnan(a) & np.isnan(b)
        return bool(((a == b) | both_nan).all())
    return bool((a == b).all())


def _merge_coords(a: dict, b: dict) -> dict:
    out = dict(a)
    for k, v in b.items():
        if k in out:
            if out[k].dims != v.dims or not _array_equiv(
                np.asarray(out[k].data), np.asarray(v.data)
            ):
                del out[k]  # conflicting coordinate: drop
        else:
            out[k] = v
    return out


# -- attach operators -------------------------------------------------------
def _make_binop(op, reflexive=False):
    def method(self, other):
        return self._apply_binary(other, op, reflexive)

    return method


def _make_unary(op):
    def method(self):
        return self._apply_unary(op)

    return method


_BINOPS = {
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
for _name, _op in _BINOPS.items():
    setattr(DataArray, _name, _make_binop(_op))
for _name, _op in {
    "__radd__": operator.add,
    "__rsub__": operator.sub,
    "__rmul__": operator.mul,
    "__rtruediv__": operator.truediv,
    "__rpow__": operator.pow,
}.items():
    setattr(DataArray, _name, _make_binop(_op, reflexive=True))
setattr(DataArray, "__neg__", _make_unary(operator.neg))
setattr(DataArray, "__pos__", _make_unary(operator.pos))
setattr(DataArray, "__abs__", _make_unary(operator.abs))
setattr(DataArray, "__invert__", _make_unary(operator.invert))

for _rname in ("sum", "mean", "std", "var", "min", "max", "prod", "all", "any", "median"):
    def _make_reduce(n):
        def method(self, dim=None, skipna=None, **kwargs):
            return self._reduce(n, dim=dim, skipna=skipna, **kwargs)

        method.__name__ = n
        return method

    setattr(DataArray, _rname, _make_reduce(_rname))

DataArray.__hash__ = object.__hash__
