"""
Dataset: a dict of Variables sharing dimensions, with a set of coordinate
names.  Mirrors the xarray.Dataset API subset the framework uses.
"""

from __future__ import annotations

from typing import Any, Hashable, Iterator, Mapping, Sequence

import numpy as np

from xugrid_tpu.xdata.dataarray import DataArray, _array_equiv
from xugrid_tpu.xdata.indexes import (
    as_index,
    resolve_label_indexer,
    stacked_multiindex,
)
from xugrid_tpu.xdata.variable import Variable


class _DictView(Mapping):
    def __init__(self, owner, names):
        self._owner = owner
        self._names = names

    def __getitem__(self, key) -> DataArray:
        if key not in self._names:
            raise KeyError(key)
        return self._owner[key]

    def __iter__(self):
        return iter(self._names)

    def __len__(self):
        return len(self._names)

    def __contains__(self, key):
        return key in self._names

    def __repr__(self):
        return "\n".join(
            f"  {k}: {tuple(self._owner._variables[k].dims)}" for k in self._names
        )


class Dataset:
    __slots__ = ("_variables", "_coord_names", "attrs", "encoding")

    def __init__(self, data_vars=None, coords=None, attrs=None):
        self._variables: dict = {}
        self._coord_names: set = set()
        self.attrs = dict(attrs) if attrs else {}
        self.encoding: dict = {}
        if coords:
            for name, v in coords.items():
                self._set_variable(name, v)
                self._coord_names.add(name)
        if data_vars:
            for name, v in data_vars.items():
                self._set_variable(name, v)

    def _set_variable(self, name, value):
        if isinstance(value, DataArray):
            for cname, cvar in value._coords.items():
                if cname not in self._variables:
                    self._variables[cname] = cvar
                    self._coord_names.add(cname)
            self._variables[name] = value.variable
        elif isinstance(value, Variable):
            self._variables[name] = value
        elif isinstance(value, tuple):
            dims, data = value[0], value[1]
            attrs = value[2] if len(value) > 2 else None
            self._variables[name] = Variable(dims, data, attrs)
        else:
            arr = np.asarray(value)
            if arr.ndim == 0:
                self._variables[name] = Variable((), arr)
            elif arr.ndim == 1:
                self._variables[name] = Variable((name,), arr)
            else:
                raise ValueError(
                    f"cannot infer dimensions for variable {name!r}; "
                    "pass a (dims, data) tuple"
                )
        self._check_sizes(name)

    def _check_sizes(self, name):
        sizes = {}
        for vname, var in self._variables.items():
            for d, s in var.sizes.items():
                if d in sizes and sizes[d] != s:
                    raise ValueError(
                        f"conflicting size for dimension {d!r}: {s} "
                        f"(variable {vname!r}) vs {sizes[d]}"
                    )
                sizes.setdefault(d, s)

    # -- mapping interface --------------------------------------------------
    def __getitem__(self, key):
        if isinstance(key, (list, tuple)) and not isinstance(key, str):
            out = Dataset(attrs=self.attrs)
            for k in key:
                out[k] = self[k]
            return out
        if key not in self._variables:
            raise KeyError(key)
        var = self._variables[key]
        coords = {
            k: v
            for k, v in self._variables.items()
            if k in self._coord_names and set(v.dims) <= set(var.dims)
        }
        return DataArray._construct(var, coords, key)

    def __setitem__(self, key, value):
        self._set_variable(key, value)

    def __delitem__(self, key):
        del self._variables[key]
        self._coord_names.discard(key)

    def __contains__(self, key) -> bool:
        return key in self._variables

    def __iter__(self) -> Iterator:
        return iter(self.data_vars)

    def __len__(self) -> int:
        return len(self.data_vars)

    def keys(self):
        return self.data_vars.keys()

    def values(self):
        return (self[k] for k in self.data_vars)

    def items(self):
        return ((k, self[k]) for k in self.data_vars)

    def get(self, key, default=None):
        return self[key] if key in self else default

    # -- properties ---------------------------------------------------------
    @property
    def data_vars(self) -> _DictView:
        names = [k for k in self._variables if k not in self._coord_names]
        return _DictView(self, names)

    @property
    def coords(self) -> _DictView:
        return _DictView(self, list(self._coord_names))

    @property
    def variables(self) -> dict:
        return dict(self._variables)

    def dims_sizes(self) -> dict:
        sizes: dict = {}
        for var in self._variables.values():
            sizes.update(var.sizes)
        return sizes

    @property
    def dims(self) -> dict:
        return self.dims_sizes()

    @property
    def sizes(self) -> dict:
        return self.dims_sizes()

    @property
    def indexes(self) -> dict:
        out = {}
        # Stacked dims first: the product layout is recorded in the
        # data variables' encodings; level coords live at ds level.
        coords = {
            k: self._variables[k] for k in self._coord_names
        }
        seen = set()
        for name in self.data_vars:
            for key in self._variables[name].encoding:
                if not key.startswith("_stacked_"):
                    continue
                dim = key[len("_stacked_"):]
                if dim in seen:
                    continue
                mi = stacked_multiindex(
                    dim, self._variables[name].encoding, coords
                )
                if mi is not None:
                    out[dim] = mi
                    seen.add(dim)
        for name in self._coord_names:
            var = self._variables[name]
            if var.dims == (name,) and name not in out:
                out[name] = as_index(var.data)
        return out

    def reset_index(self, dims_or_levels, drop: bool = False) -> "Dataset":
        if isinstance(dims_or_levels, str):
            dims_or_levels = [dims_or_levels]
        stacked = {
            k[len("_stacked_"):]
            for name in self.data_vars
            for k in self._variables[name].encoding
            if k.startswith("_stacked_")
        }
        out = self.copy(deep=False)
        for d in dims_or_levels:
            if d in stacked:
                dropped: set = set()

                def _reset(da, d=d, dropped=dropped):
                    if "_stacked_" + d not in da.encoding:
                        return da
                    if drop:
                        dropped.update(da.encoding["_stacked_" + d][0])
                    return da.reset_index(d, drop=drop)

                out = out._apply_per_var(_reset)
                for name in dropped:
                    out._variables.pop(name, None)
                    out._coord_names.discard(name)
            elif d in out._coord_names and out._variables[d].dims == (d,):
                cv = out._variables.pop(d)
                out._coord_names.discard(d)
                if not drop:
                    out._variables[d + "_"] = cv
                    out._coord_names.add(d + "_")
            else:
                raise ValueError(f"{d!r} has no index to reset")
        return out

    def reorder_levels(self, dim_order=None, **kwargs) -> "Dataset":
        dim_order = {**(dim_order or {}), **kwargs}
        return self._apply_per_var(
            lambda da: da.reorder_levels(
                {
                    d: o
                    for d, o in dim_order.items()
                    if "_stacked_" + d in da.encoding
                }
            )
            if any(
                "_stacked_" + d in da.encoding for d in dim_order
            )
            else da
        )

    def __repr__(self) -> str:
        lines = ["<xdata.Dataset>"]
        lines.append(f"Dimensions: {self.dims_sizes()}")
        if self._coord_names:
            lines.append("Coordinates:")
            for k in self._coord_names:
                v = self._variables[k]
                lines.append(f"  * {k} {tuple(v.dims)} {v.dtype}")
        lines.append("Data variables:")
        for k in self.data_vars:
            v = self._variables[k]
            lines.append(f"    {k} {tuple(v.dims)} {v.dtype}")
        if self.attrs:
            lines.append(f"Attributes: {self.attrs}")
        return "\n".join(lines)

    # -- conversion ---------------------------------------------------------
    def copy(self, deep: bool = True) -> "Dataset":
        out = Dataset(attrs=dict(self.attrs))
        out._variables = {k: v.copy(deep) for k, v in self._variables.items()}
        out._coord_names = set(self._coord_names)
        return out

    def set_coords(self, names) -> "Dataset":
        if isinstance(names, str):
            names = [names]
        out = self.copy(deep=False)
        for n in names:
            if n not in out._variables:
                raise ValueError(f"{n!r} not found")
            out._coord_names.add(n)
        return out

    def reset_coords(self, names=None, drop: bool = False) -> "Dataset":
        if names is None:
            names = [n for n in self._coord_names if self._variables[n].dims != (n,)]
        elif isinstance(names, str):
            names = [names]
        out = self.copy(deep=False)
        for n in names:
            out._coord_names.discard(n)
            if drop:
                del out._variables[n]
        return out

    def drop_vars(self, names, errors: str = "raise") -> "Dataset":
        if isinstance(names, str):
            names = [names]
        out = self.copy(deep=False)
        for n in names:
            if n in out._variables:
                del out._variables[n]
                out._coord_names.discard(n)
            elif errors == "raise":
                raise ValueError(f"{n!r} not found")
        return out

    def drop_dims(self, dims, errors: str = "raise") -> "Dataset":
        if isinstance(dims, str):
            dims = [dims]
        missing = set(dims) - set(self.dims_sizes())
        if missing and errors == "raise":
            raise ValueError(f"dimensions {missing} not found")
        drop = [
            name
            for name, var in self._variables.items()
            if set(var.dims) & set(dims)
        ]
        return self.drop_vars(drop, errors="ignore")

    def rename(self, name_dict=None, **names) -> "Dataset":
        mapping = dict(name_dict or {})
        mapping.update(names)
        out = Dataset(attrs=dict(self.attrs))
        for name, var in self._variables.items():
            new_dims = tuple(mapping.get(d, d) for d in var.dims)
            out._variables[mapping.get(name, name)] = Variable(
                new_dims, var.data, var.attrs, var.encoding
            )
        out._coord_names = {mapping.get(n, n) for n in self._coord_names}
        return out

    def rename_dims(self, dims_dict=None, **dims) -> "Dataset":
        mapping = dict(dims_dict or {})
        mapping.update(dims)
        out = Dataset(attrs=dict(self.attrs))
        for name, var in self._variables.items():
            new_dims = tuple(mapping.get(d, d) for d in var.dims)
            out._variables[name] = Variable(new_dims, var.data, var.attrs, var.encoding)
        out._coord_names = set(self._coord_names)
        return out

    def rename_vars(self, name_dict=None, **names) -> "Dataset":
        mapping = dict(name_dict or {})
        mapping.update(names)
        out = Dataset(attrs=dict(self.attrs))
        for name, var in self._variables.items():
            out._variables[mapping.get(name, name)] = var
        out._coord_names = {mapping.get(n, n) for n in self._coord_names}
        return out

    def assign(self, variables=None, **kwargs) -> "Dataset":
        out = self.copy(deep=False)
        for k, v in {**(variables or {}), **kwargs}.items():
            out[k] = v
        return out

    def assign_coords(self, coords=None, **kwargs) -> "Dataset":
        out = self.copy(deep=False)
        for k, v in {**(coords or {}), **kwargs}.items():
            out._set_variable(k, v)
            out._coord_names.add(k)
        return out

    def update(self, other) -> "Dataset":
        if isinstance(other, Dataset):
            for k, v in other._variables.items():
                self._variables[k] = v
                self._check_sizes(k)
            self._coord_names |= other._coord_names
        else:
            for k, v in other.items():
                self[k] = v
        return self

    def merge(self, other, compat: str = "no_conflicts") -> "Dataset":
        out = self.copy(deep=False)
        if isinstance(other, DataArray):
            other = other.to_dataset()
        if isinstance(other, Dataset):
            for k, v in other._variables.items():
                if k in out._variables:
                    existing = out._variables[k]
                    if existing.dims == v.dims and _array_equiv(
                        np.asarray(existing.data), np.asarray(v.data)
                    ):
                        continue
                    if compat == "override":
                        continue
                    raise ValueError(f"conflicting values for variable {k!r}")
                out._variables[k] = v
            out._coord_names |= other._coord_names
            out.attrs.update(other.attrs)
        else:
            for k, v in dict(other).items():
                out[k] = v
        out._check_sizes("<merge>")
        return out

    def map(self, func, *args, **kwargs) -> "Dataset":
        out = Dataset(attrs=dict(self.attrs))
        for k in self._coord_names:
            out._variables[k] = self._variables[k]
            out._coord_names.add(k)
        for k in self.data_vars:
            result = func(self[k], *args, **kwargs)
            out._variables[k] = (
                result.variable if isinstance(result, DataArray) else result
            )
        return out

    def pipe(self, func, *args, **kwargs):
        return func(self, *args, **kwargs)

    # -- xarray-parity conveniences -----------------------------------------
    def _apply_per_var(self, fn, only_dims=None) -> "Dataset":
        """Apply a DataArray->DataArray transform to every data var
        (skipping vars without ``only_dims``) and reassemble, carrying
        over coords whose dims survived unchanged."""
        out = Dataset(attrs=dict(self.attrs))
        for name in self.data_vars:
            da = self[name]
            if only_dims is not None and not any(
                d in da.dims for d in only_dims
            ):
                out._variables[name] = self._variables[name]
                continue
            out._set_variable(name, fn(da))
        sizes = out.dims_sizes()
        for k in self._coord_names:
            if k in out._variables:
                out._coord_names.add(k)
                continue
            var = self._variables[k]
            if all(sizes.get(d) == s for d, s in var.sizes.items()):
                out._variables[k] = var
                out._coord_names.add(k)
        return out

    def where(self, cond, other=np.nan, drop: bool = False) -> "Dataset":
        cond_da = cond if isinstance(cond, DataArray) else None
        if drop:
            if cond_da is None:
                raise TypeError(
                    "Dataset.where(drop=True) requires a DataArray cond"
                )
            # Trim every cond dim to the positions where cond holds
            # anywhere (xarray semantics), then mask.
            mask = np.asarray(cond_da.data)
            out = self
            for dim in cond_da.dims:
                axes = tuple(
                    i for i, d in enumerate(cond_da.dims) if d != dim
                )
                keep = mask.any(axis=axes) if axes else mask
                out = out.isel({dim: np.flatnonzero(keep)})
            trimmed_cond = cond_da
            for dim in cond_da.dims:
                axes = tuple(
                    i for i, d in enumerate(cond_da.dims) if d != dim
                )
                keep = mask.any(axis=axes) if axes else mask
                trimmed_cond = trimmed_cond.isel(
                    {dim: np.flatnonzero(keep)}
                )
            return out._apply_per_var(
                lambda da: da.where(trimmed_cond, other)
                if any(d in da.dims for d in cond_da.dims)
                else da
            )
        return self._apply_per_var(
            lambda da: da.where(
                cond_da if cond_da is not None else cond, other
            )
        )

    def fillna(self, value) -> "Dataset":
        return self._apply_per_var(lambda da: da.fillna(value))

    def count(self, dim=None) -> "Dataset":
        return self._apply_per_var(
            lambda da: da.count(
                dim if dim is None or dim in da.dims else None
            ),
            only_dims=None if dim is None else [dim],
        )

    def quantile(self, q, dim=None, skipna=True) -> "Dataset":
        return self._apply_per_var(
            lambda da: da.quantile(q, dim=dim, skipna=skipna),
            only_dims=None if dim is None else [dim],
        )

    def diff(self, dim, n: int = 1) -> "Dataset":
        return self._apply_per_var(
            lambda da: da.diff(dim, n=n), only_dims=[dim]
        )

    def shift(self, shifts=None, fill_value=np.nan, **kwargs) -> "Dataset":
        shifts = {**(shifts or {}), **kwargs}
        return self._apply_per_var(
            lambda da: da.shift(
                {d: s for d, s in shifts.items() if d in da.dims},
                fill_value=fill_value,
            ),
            only_dims=list(shifts),
        )

    def roll(self, shifts=None, roll_coords=False, **kwargs) -> "Dataset":
        shifts = {**(shifts or {}), **kwargs}
        return self._apply_per_var(
            lambda da: da.roll(
                {d: s for d, s in shifts.items() if d in da.dims},
                roll_coords=roll_coords,
            ),
            only_dims=list(shifts),
        )

    def sortby(self, variables, ascending: bool = True) -> "Dataset":
        if isinstance(variables, (str, DataArray)):
            variables = [variables]
        out = self
        for v in variables:
            key = out[v] if isinstance(v, str) else v
            dim = key.dims[0]
            order = np.argsort(np.asarray(key.data), kind="stable")
            if not ascending:
                order = order[::-1]
            out = out.isel({dim: order})
        return out

    def dropna(self, dim, how: str = "any", subset=None) -> "Dataset":
        names = subset if subset is not None else [
            n for n in self.data_vars if dim in self[n].dims
        ]
        masks = []
        for n in names:
            da = self[n]
            if dim not in da.dims:
                continue
            axis = tuple(i for i, d in enumerate(da.dims) if d != dim)
            # dtype-aware missingness: strings/ints are never null and
            # must not be force-cast to float (xarray semantics).
            isnan = ~np.asarray(da.variable.notnull().data)
            masks.append(
                isnan.any(axis=axis) if how == "any" else isnan.all(axis=axis)
            )
        if not masks:
            return self
        bad = np.logical_or.reduce(masks) if how == "any" else (
            np.logical_and.reduce(masks)
        )
        return self.isel({dim: np.flatnonzero(~bad)})

    def to_array(self, dim: str = "variable", name=None) -> DataArray:
        """Stack all data variables into one DataArray along ``dim``."""
        names = list(self.data_vars)
        das = [self[n] for n in names]
        all_dims = []
        for da in das:
            for d in da.dims:
                if d not in all_dims:
                    all_dims.append(d)
        sizes = self.dims_sizes()
        arrays = [
            np.asarray(
                da.variable.broadcast_to(all_dims, sizes).data,
                dtype=np.float64,
            )
            for da in das
        ]
        data = np.stack(arrays, axis=0)
        coords = {dim: Variable((dim,), np.array(names, dtype=object))}
        for k in self._coord_names:
            var = self._variables[k]
            if set(var.dims) <= set(all_dims):
                coords[k] = var
        return DataArray(
            data, dims=(dim,) + tuple(all_dims),
            coords={
                k: (v.dims, v.data) for k, v in coords.items()
            },
            name=name,
        )

    def stack(self, dimensions=None, **kwargs) -> "Dataset":
        dimensions = {**(dimensions or {}), **kwargs}
        out = self
        for new_dim, dims in dimensions.items():
            dims = tuple(dims)
            sizes = out.dims_sizes()

            def _stack_var(da, dims=dims, new_dim=new_dim, sizes=sizes,
                           source=out):
                if not any(d in da.dims for d in dims):
                    return da
                missing = [d for d in dims if d not in da.dims]
                if missing:
                    # xarray broadcasts partial variables over the full
                    # product before stacking.
                    full = tuple(da.dims) + tuple(missing)
                    var = da.variable.broadcast_to(full, sizes)
                    coords = dict(da._coords)
                    for d in missing:
                        if d in source._variables:
                            coords[d] = source._variables[d]
                    da = DataArray._construct(var, coords, da.name)
                return da.stack({new_dim: dims})

            out = out._apply_per_var(_stack_var)
        return out

    def unstack(self, dim=None) -> "Dataset":
        return self._apply_per_var(
            lambda da: da.unstack(dim)
            if any(k.startswith("_stacked_") for k in da.encoding)
            else da
        )

    def reindex(self, indexers=None, method=None, tolerance=None,
                fill_value=np.nan, **kwargs) -> "Dataset":
        indexers = {**(indexers or {}), **kwargs}
        return self._apply_per_var(
            lambda da: da.reindex(
                {d: v for d, v in indexers.items() if d in da.dims},
                method=method, tolerance=tolerance, fill_value=fill_value,
            )
            if any(d in da.dims for d in indexers)
            else da
        )

    def reindex_like(self, other, method=None, tolerance=None,
                     fill_value=np.nan) -> "Dataset":
        indexers = {
            d: np.asarray(other[d].data)
            for d in self.dims_sizes()
            if d in other.coords and d in self.coords
        }
        return self.reindex(
            indexers, method=method, tolerance=tolerance,
            fill_value=fill_value,
        )

    def interp(self, coords=None, method="linear", **coords_kwargs):
        targets = {**(coords or {}), **coords_kwargs}
        return self._apply_per_var(
            lambda da: da.interp(
                {d: v for d, v in targets.items() if d in da.dims},
                method=method,
            )
            if any(d in da.dims for d in targets)
            else da
        )

    def polyfit(self, dim: str, deg: int, skipna=None):
        """Per-variable polynomial fits along ``dim`` (xarray layout:
        ``{name}_polyfit_coefficients`` over a ``degree`` dim)."""
        out = Dataset(attrs=dict(self.attrs))
        for name, da in self.data_vars.items():
            if dim not in da.dims:
                continue
            fit = da.polyfit(dim, deg, skipna=skipna)
            out[f"{name}_polyfit_coefficients"] = fit[
                "polyfit_coefficients"
            ]
        return out

    def groupby(self, group):
        from xugrid_tpu.xdata.grouped import DatasetGroupBy

        return DatasetGroupBy(self, group)

    def apply(self, func, *args, **kwargs) -> "Dataset":
        """Deprecated xarray alias for :meth:`map`."""
        return self.map(func, *args, **kwargs)

    def rolling(self, dim=None, min_periods=None, center=False, **kwargs):
        from xugrid_tpu.xdata.grouped import DatasetWindowed

        windows = {**(dim or {}), **kwargs}
        return DatasetWindowed(
            self, "rolling", windows,
            dict(min_periods=min_periods, center=center),
        )

    def coarsen(self, dim=None, boundary="exact", **kwargs):
        from xugrid_tpu.xdata.grouped import DatasetWindowed

        windows = {**(dim or {}), **kwargs}
        return DatasetWindowed(
            self, "coarsen", windows, dict(boundary=boundary)
        )

    def resample(self, indexer=None, **kwargs):
        from xugrid_tpu.xdata.grouped import DatasetWindowed

        indexer = {**(indexer or {}), **kwargs}
        if len(indexer) != 1:
            raise ValueError("resample expects exactly one dim=freq pair")
        return DatasetWindowed(self, "resample", indexer, {})

    # -- indexing -----------------------------------------------------------
    def isel(self, indexers=None, drop: bool = False, missing_dims: str = "raise", **kwargs) -> "Dataset":
        indexers = dict(indexers or {})
        indexers.update(kwargs)
        unknown = set(indexers) - set(self.dims_sizes())
        if unknown and missing_dims == "raise":
            raise ValueError(f"dimensions {unknown} do not exist")
        clean = {}
        renames = {}
        for k, v in indexers.items():
            if isinstance(v, DataArray):
                if v.ndim == 1 and v.dims[0] != k:
                    renames[k] = v.dims[0]
                v = v.data
            clean[k] = v
        out = Dataset(attrs=dict(self.attrs))
        for name, var in self._variables.items():
            sub = {d: clean[d] for d in var.dims if d in clean}
            new_var = var.isel(sub) if sub else var
            if drop and new_var.ndim == 0 and name in self._coord_names:
                continue
            out._variables[name] = new_var
        out._coord_names = {n for n in self._coord_names if n in out._variables}
        if renames:
            out = out.rename({k: v for k, v in renames.items()})
            for old, new in renames.items():
                var = out._variables.get(new)
                if var is not None and var.dims == (new,) and new in out._coord_names:
                    del out._variables[new]
                    out._coord_names.discard(new)
        return out

    def sel(self, indexers=None, method=None, tolerance=None, drop: bool = False, **kwargs) -> "Dataset":
        indexers = dict(indexers or {})
        indexers.update(kwargs)
        positional = {}
        aux_masks = {}  # underlying dim -> bool mask (level selections)
        dim_sizes = self.dims_sizes()
        for dim, label in indexers.items():
            var = self._variables.get(dim)
            if var is not None and var.dims == (dim,) and dim in self._coord_names:
                index = as_index(var.data)
                positional[dim] = resolve_label_indexer(
                    index, label, method, tolerance
                )
            elif (
                var is not None
                and dim in self._coord_names
                and len(var.dims) == 1
                and var.dims[0] != dim
                and dim not in dim_sizes
            ):
                # MultiIndex-style level selection: a 1-D coordinate
                # over another dim (the layout stack() produces).
                other = var.dims[0]
                vals = np.asarray(var.data)
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
            else:
                positional[dim] = label
        for other, m in aux_masks.items():
            pos = np.flatnonzero(m)
            if other in positional:
                prev = positional[other]
                if isinstance(prev, slice):
                    # slice + level selection on one dim: expand the
                    # slice to positions before intersecting
                    prev = np.arange(self.dims_sizes()[other])[prev]
                prev = np.atleast_1d(np.asarray(prev))
                positional[other] = prev[np.isin(prev, pos)]
            else:
                positional[other] = pos
        return self.isel(positional, drop=drop)

    def transpose(self, *dims) -> "Dataset":
        out = Dataset(attrs=dict(self.attrs))
        for name, var in self._variables.items():
            order = [d for d in dims if d in var.dims]
            order += [d for d in var.dims if d not in order]
            out._variables[name] = var.transpose(*order) if var.ndim > 1 else var
        out._coord_names = set(self._coord_names)
        return out

    def expand_dims(self, dim=None, **kwargs) -> "Dataset":
        out = Dataset(attrs=dict(self.attrs))
        out._coord_names = set(self._coord_names)
        for name, var in self._variables.items():
            if name in self._coord_names:
                out._variables[name] = var
            else:
                da = self[name].expand_dims(dim, **kwargs)
                out._variables[name] = da.variable
                # The expansion may introduce a coordinate for the new
                # dimension (expand_dims({'time': [...]})): keep it.
                for cname, cvar in da._coords.items():
                    if cname not in out._variables:
                        out._variables[cname] = cvar
                        out._coord_names.add(cname)
        return out

    def equals(self, other) -> bool:
        if not isinstance(other, Dataset):
            return False
        if set(self._variables) != set(other._variables):
            return False
        if self._coord_names != other._coord_names:
            return False
        for k, v in self._variables.items():
            ov = other._variables[k]
            if v.dims != ov.dims:
                return False
            if not _array_equiv(np.asarray(v.data), np.asarray(ov.data)):
                return False
        return True

    def identical(self, other) -> bool:
        if not self.equals(other):
            return False
        if self.attrs != other.attrs:
            return False
        for k, v in self._variables.items():
            if v.attrs != other._variables[k].attrs:
                return False
        return True

    def compute(self):
        return self

    def load(self):
        return self

    def chunk(self, *args, **kwargs):
        return self

    def unify_chunks(self):
        return self

    def to_dataframe(self, dim_order=None):
        import pandas as pd

        sizes = self.dims_sizes()
        if dim_order is None:
            dims = sorted(sizes)
        else:
            dim_order = list(dim_order)
            if set(dim_order) != set(sizes):
                raise ValueError(
                    f"dim_order {dim_order} does not match dataset "
                    f"dimensions {sorted(sizes)}"
                )
            dims = dim_order
        if len(dims) == 0:
            return pd.DataFrame(
                {k: [np.asarray(self._variables[k].data).item()] for k in self.data_vars}
            )
        columns = {}
        for k in self.data_vars:
            var = self._variables[k]
            v = var.broadcast_to(dims, sizes)
            columns[k] = np.asarray(v.data).ravel()
        index_arrays = []
        for d in dims:
            if d in self.indexes:
                vals = np.asarray(self.indexes[d])
            else:
                vals = np.arange(sizes[d])
            index_arrays.append(vals)
        if len(dims) == 1:
            index = pd.Index(index_arrays[0], name=dims[0])
        else:
            index = pd.MultiIndex.from_product(index_arrays, names=dims)
        return pd.DataFrame(columns, index=index)

    # -- reductions ---------------------------------------------------------
    def _reduce(self, func_name, dim=None, skipna=None, **kwargs) -> "Dataset":
        out = Dataset(attrs=dict(self.attrs))
        for name, var in self._variables.items():
            if name in self._coord_names:
                # keep coords untouched by the reduction: all of them
                # for scalar/disjoint coords; dim=None only drops
                # DIMENSIONED coords (xarray keeps scalar coords)
                if dim is None:
                    drop = var.ndim > 0
                else:
                    drop = any(d in var.dims for d in np.atleast_1d(dim))
                if drop:
                    continue
                out._variables[name] = var
                out._coord_names.add(name)
            else:
                rdim = dim
                if rdim is not None:
                    rdims = [rdim] if isinstance(rdim, str) else list(rdim)
                    rdims = [d for d in rdims if d in var.dims]
                    if not rdims:
                        out._variables[name] = var
                        continue
                    rdim = rdims
                out._variables[name] = var.reduce(func_name, dim=rdim, skipna=skipna, **kwargs)
        return out

    def to_netcdf(self, path=None, **kwargs):
        from xugrid_tpu.xdata.io_netcdf import to_netcdf

        return to_netcdf(self, path, **kwargs)

    def to_zarr(self, store=None, **kwargs):
        from xugrid_tpu.xdata.io_zarr import to_zarr

        return to_zarr(self, store, **kwargs)

    def close(self):
        pass


for _rname in ("sum", "mean", "std", "var", "min", "max", "prod", "all", "any", "median"):
    def _make_reduce(n):
        def method(self, dim=None, skipna=None, **kwargs):
            return self._reduce(n, dim=dim, skipna=skipna, **kwargs)

        method.__name__ = n
        return method

    setattr(Dataset, _rname, _make_reduce(_rname))
