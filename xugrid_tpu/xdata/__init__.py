"""
xdata: the minimal labeled-array core (xarray stand-in) of xugrid_tpu.

Public API mirrors the xarray subset that the UGRID layers consume:
DataArray, Dataset, Variable, open_dataset/open_zarr, concat/merge,
full_like/zeros_like/ones_like, where, align, apply_ufunc.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from xugrid_tpu.xdata.dataarray import DataArray, _merge_coords
from xugrid_tpu.xdata.dataset import Dataset
from xugrid_tpu.xdata.io_netcdf import open_dataset, to_netcdf
from xugrid_tpu.xdata.io_zarr import open_zarr, to_zarr
from xugrid_tpu.xdata.variable import (
    Variable,
    broadcast_variables,
    concat_variables,
    get_namespace,
)

__all__ = [
    "DataArray",
    "Dataset",
    "Variable",
    "open_dataset",
    "open_zarr",
    "to_netcdf",
    "to_zarr",
    "concat",
    "merge",
    "full_like",
    "zeros_like",
    "ones_like",
    "where",
    "align",
    "broadcast",
    "apply_ufunc",
    "polyval",
]


def concat(objs: Sequence, dim: str, **kwargs):
    """Concatenate DataArrays or Datasets along ``dim``."""
    objs = list(objs)
    first = objs[0]
    if isinstance(first, DataArray):
        var = concat_variables([o.variable for o in objs], dim)
        coords: dict = {}
        for k in first._coords:
            if all(k in o._coords for o in objs):
                cvars = [o._coords[k] for o in objs]
                if dim in cvars[0].dims or (
                    k == dim and cvars[0].dims == () or cvars[0].dims == (dim,)
                ):
                    coords[k] = concat_variables(cvars, dim)
                elif k == dim:
                    coords[k] = concat_variables(cvars, dim)
                else:
                    coords[k] = cvars[0]
        return DataArray._construct(var, coords, first.name)
    if isinstance(first, Dataset):
        out = Dataset(attrs=dict(first.attrs))
        all_names = list(dict.fromkeys(k for o in objs for k in o._variables))
        for name in all_names:
            vars_ = [o._variables[name] for o in objs if name in o._variables]
            if len(vars_) < len(objs):
                raise ValueError(f"variable {name!r} missing from some datasets")
            if dim in vars_[0].dims or any(
                not _vars_equiv(vars_[0], v) for v in vars_[1:]
            ):
                out._variables[name] = concat_variables(vars_, dim)
            else:
                out._variables[name] = vars_[0]
        out._coord_names = set(first._coord_names)
        return out
    raise TypeError(f"cannot concatenate {type(first)}")


def _vars_equiv(a: Variable, b: Variable) -> bool:
    if a.dims != b.dims or a.shape != b.shape:
        return False
    av, bv = np.asarray(a.data), np.asarray(b.data)
    if av.dtype.kind in "fc":
        return bool(((av == bv) | (np.isnan(av) & np.isnan(bv))).all())
    return bool((av == bv).all())


def merge(objs: Sequence, compat: str = "no_conflicts", **kwargs) -> Dataset:
    out = Dataset()
    for obj in objs:
        if isinstance(obj, DataArray):
            obj = obj.to_dataset()
        elif isinstance(obj, dict):
            obj = Dataset(obj)
        out = out.merge(obj, compat=compat)
    return out


def full_like(other, fill_value, dtype=None):
    xp = get_namespace(other.data if isinstance(other, DataArray) else None)
    if isinstance(other, DataArray):
        data = xp.full(other.shape, fill_value, dtype=dtype or other.dtype)
        return DataArray._construct(
            Variable(other.dims, data, dict(other.attrs)),
            dict(other._coords),
            other.name,
        )
    if isinstance(other, Dataset):
        out = Dataset(attrs=dict(other.attrs))
        out._coord_names = set(other._coord_names)
        for name, var in other._variables.items():
            if name in other._coord_names:
                out._variables[name] = var
            else:
                data = np.full(var.shape, fill_value, dtype=dtype or var.dtype)
                out._variables[name] = Variable(var.dims, data, dict(var.attrs))
        return out
    raise TypeError(f"cannot create full_like of {type(other)}")


def zeros_like(other, dtype=None):
    return full_like(other, 0, dtype=dtype)


def ones_like(other, dtype=None):
    return full_like(other, 1, dtype=dtype)


def where(cond, x, y, keep_attrs=None):
    if isinstance(x, DataArray):
        return x.where(cond, y)
    if isinstance(cond, DataArray):
        xp = get_namespace(cond.data)
        data = xp.where(cond.data, x, y)
        return DataArray._construct(
            Variable(cond.dims, data), dict(cond._coords), cond.name
        )
    return np.where(cond, x, y)


def align(*objs, join: str = "inner"):
    """Minimal alignment: verifies shared dims are equal-sized."""
    sizes: dict = {}
    for obj in objs:
        for d, s in obj.sizes.items():
            if d in sizes and sizes[d] != s:
                raise ValueError(
                    f"cannot align: conflicting size for dim {d!r}: "
                    f"{sizes[d]} vs {s} (label-based joins not supported)"
                )
            sizes.setdefault(d, s)
    return objs


def broadcast(*objs):
    out = []
    sizes: dict = {}
    dims: list = []
    for obj in objs:
        for d, s in obj.sizes.items():
            if d not in sizes:
                dims.append(d)
                sizes[d] = s
    for obj in objs:
        if isinstance(obj, DataArray):
            var = obj.variable.broadcast_to(dims, sizes)
            out.append(DataArray._construct(var, dict(obj._coords), obj.name))
        else:
            out.append(obj)
    return tuple(out)


def apply_ufunc(
    func,
    *args,
    input_core_dims=None,
    output_core_dims=None,
    exclude_dims=frozenset(),
    vectorize: bool = False,
    dask: str = "forbidden",
    output_dtypes=None,
    keep_attrs=None,
    kwargs=None,
    dask_gufunc_kwargs=None,
):
    """
    Simplified apply_ufunc: moves each input's core dims last, broadcasts
    the remaining ("extra") dims, applies ``func``, labels outputs with
    the broadcast dims + output core dims.
    """
    kwargs = kwargs or {}
    n_in = len(args)
    if input_core_dims is None:
        input_core_dims = [()] * n_in
    if output_core_dims is None:
        output_core_dims = [()]

    das = [a for a in args if isinstance(a, DataArray)]
    # Determine broadcast (non-core) dims in first-seen order.
    broadcast_dims: list = []
    sizes: dict = {}
    for a, core in zip(args, input_core_dims):
        if not isinstance(a, DataArray):
            continue
        for d in a.dims:
            if d not in core and d not in broadcast_dims:
                broadcast_dims.append(d)
        for d, s in a.sizes.items():
            sizes[d] = s

    raw_inputs = []
    for a, core in zip(args, input_core_dims):
        if isinstance(a, DataArray):
            target = broadcast_dims + [d for d in core]
            var = a.variable
            # Insert missing broadcast dims (size 1 → broadcast later by numpy)
            for d in target:
                if d not in var.dims:
                    if d in core and d in exclude_dims:
                        raise ValueError(f"missing core dim {d}")
                    var = var.expand_dims(d, axis=0)
            var = var.transpose(*[d for d in target if d in var.dims])
            raw_inputs.append(var.data)
        else:
            raw_inputs.append(a)

    if vectorize:
        func = np.vectorize(
            func,
            signature=_build_signature(input_core_dims, output_core_dims),
        )
    results = func(*raw_inputs, **kwargs)

    n_out = len(output_core_dims)
    if n_out == 1:
        results = (results,)
    outputs = []
    template = das[0] if das else None
    for res, core in zip(results, output_core_dims):
        out_dims = tuple(broadcast_dims) + tuple(core)
        # drop leading broadcast dims of size 1 that were expand_dims'ed
        res_arr = res
        while np.ndim(res_arr) > len(out_dims):
            res_arr = res_arr[0]
        var = Variable(out_dims[: np.ndim(res_arr)] if np.ndim(res_arr) < len(out_dims) else out_dims, res_arr)
        coords = {}
        if template is not None:
            for k, v in template._coords.items():
                if set(v.dims) <= set(var.dims):
                    coords[k] = v
        outputs.append(
            DataArray._construct(
                var, coords, template.name if template is not None else None
            )
        )
    return outputs[0] if n_out == 1 else tuple(outputs)


def _build_signature(input_core_dims, output_core_dims) -> str:
    def fmt(dims_list):
        return ",".join("(" + ",".join(str(d) for d in dims) + ")" for dims in dims_list)

    return fmt(input_core_dims) + "->" + fmt(output_core_dims)


class _TestingModule:
    @staticmethod
    def assert_equal(a, b):
        assert a.equals(b), f"objects not equal:\n{a}\n{b}"

    @staticmethod
    def assert_identical(a, b):
        assert a.identical(b), f"objects not identical:\n{a}\n{b}"

    @staticmethod
    def assert_allclose(a, b, rtol=1e-5, atol=1e-8):
        np.testing.assert_allclose(
            np.asarray(a.data if hasattr(a, "data") else a),
            np.asarray(b.data if hasattr(b, "data") else b),
            rtol=rtol,
            atol=atol,
        )


testing = _TestingModule()


def polyval(coord, coeffs, degree_dim: str = "degree"):
    """Evaluate a polynomial (from :meth:`DataArray.polyfit`) at the
    given coordinate values: sum over ``degree_dim`` of
    ``coeff_d * coord**d``."""
    if isinstance(coeffs, Dataset):
        out = Dataset(attrs=dict(coeffs.attrs))
        for name, da in coeffs.data_vars.items():
            if degree_dim in da.dims:
                out[name.replace("_polyfit_coefficients", "")] = polyval(
                    coord, da, degree_dim
                )
        return out
    degrees = np.asarray(coeffs.coords[degree_dim].data)
    x = coord.data if isinstance(coord, DataArray) else np.asarray(coord)
    x = np.asarray(x, dtype=np.float64)
    axis = coeffs.dims.index(degree_dim)
    cdata = np.moveaxis(np.asarray(coeffs.data, dtype=np.float64), axis, 0)
    other_dims = tuple(d for d in coeffs.dims if d != degree_dim)
    # result dims: coord dims + remaining coefficient dims
    coord_dims = coord.dims if isinstance(coord, DataArray) else ("x",)
    result = np.zeros(x.shape + cdata.shape[1:])
    for d, c in zip(degrees, cdata):
        result += np.multiply.outer(x.astype(np.float64) ** d, c)
    coords = {}
    if isinstance(coord, DataArray):
        coords.update(
            {k: v for k, v in coord._coords.items()}
        )
    var = Variable(tuple(coord_dims) + other_dims, result)
    return DataArray._construct(var, coords, None)
