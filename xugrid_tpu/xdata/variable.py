"""
Variable: the dimension-labeled array primitive underlying DataArray and
Dataset.

xugrid_tpu ships its own minimal labeled-array core ("xdata") because the
framework must stand alone; xarray (the reference's metadata layer) is an
optional integration, not a dependency.  Data payloads may be numpy arrays
(host tier) or jax.Array (device tier) — operations dispatch on the array
namespace so device data stays on device.
"""

from __future__ import annotations

from typing import Any, Hashable, Mapping, Sequence, Tuple

import numpy as np


def is_jax_array(data) -> bool:
    mod = type(data).__module__
    return mod.startswith("jax") or mod.startswith("jaxlib")


def get_namespace(*arrays):
    """Return jax.numpy if any argument is a jax array, else numpy."""
    if any(is_jax_array(a) for a in arrays):
        import jax.numpy as jnp

        return jnp
    return np


def as_compatible_data(data) -> Any:
    """Coerce python scalars/lists to numpy; leave array types alone."""
    if is_jax_array(data):
        return data
    if isinstance(data, Variable):
        return data.data
    if isinstance(data, np.ndarray):
        return data
    if getattr(data, "is_lazy", False):
        return data  # LazyArray: materializes on demand, never here
    if hasattr(data, "values") and hasattr(data, "dims"):
        return as_compatible_data(data.values)
    return np.asarray(data)


_REDUCE_METHODS = (
    "sum",
    "mean",
    "std",
    "var",
    "min",
    "max",
    "prod",
    "all",
    "any",
)


class Variable:
    """An array with named dimensions and attributes."""

    __slots__ = ("dims", "data", "attrs", "encoding")

    def __init__(
        self,
        dims: Sequence[Hashable] | Hashable,
        data,
        attrs: Mapping | None = None,
        encoding: Mapping | None = None,
    ):
        data = as_compatible_data(data)
        if isinstance(dims, str):
            dims = (dims,)
        dims = tuple(dims)
        if len(dims) != np.ndim(data):
            raise ValueError(
                f"dimensions {dims} do not match data with {np.ndim(data)} "
                f"dimensions (shape {np.shape(data)})"
            )
        self.dims: Tuple[Hashable, ...] = dims
        self.data = data
        self.attrs = dict(attrs) if attrs else {}
        self.encoding = dict(encoding) if encoding else {}

    # -- basic properties ---------------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(np.shape(self.data))

    @property
    def ndim(self) -> int:
        return len(self.dims)

    @property
    def size(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def sizes(self) -> dict:
        return dict(zip(self.dims, self.shape))

    @property
    def values(self) -> np.ndarray:
        return np.asarray(self.data)

    def __repr__(self) -> str:
        return f"<xdata.Variable {self.dims} {self.shape} {self.dtype}>"

    def copy(self, deep: bool = True, data=None) -> "Variable":
        """Copy; ``data`` replaces the values (must match the shape),
        mirroring xarray's ``Variable.copy(data=...)``."""
        if data is None:
            data = self.data
            if deep and isinstance(data, np.ndarray):
                data = data.copy()
        else:
            data = np.asarray(data)
            if data.shape != np.shape(self.data):
                raise ValueError(
                    f"Data shape {data.shape} must match original shape "
                    f"{np.shape(self.data)}"
                )
        return Variable(self.dims, data, self.attrs, self.encoding)

    def astype(self, dtype) -> "Variable":
        return Variable(self.dims, self.data.astype(dtype), self.attrs)

    # -- indexing -----------------------------------------------------------
    def isel(self, indexers: Mapping[Hashable, Any]) -> "Variable":
        key = []
        for dim in self.dims:
            idx = indexers.get(dim, slice(None))
            if isinstance(idx, Variable):
                idx = idx.data
            key.append(idx)
        # Handle multiple array indexers via sequential indexing (outer
        # indexing semantics, like xarray, not numpy fancy indexing).
        n_array = sum(
            1 for k in key if not isinstance(k, (slice, int, np.integer))
        )
        if n_array > 1:
            data = self.data
            new_dims = []
            offset = 0
            for axis, (dim, k) in enumerate(zip(self.dims, key)):
                ax = axis - offset
                if isinstance(k, (int, np.integer)):
                    data = get_namespace(data).take(data, int(k), axis=ax)
                    offset += 1
                elif isinstance(k, slice):
                    sl = [slice(None)] * np.ndim(data)
                    sl[ax] = k
                    data = data[tuple(sl)]
                    new_dims.append(dim)
                else:
                    k = np.asarray(k)
                    # Boolean masks must become positions, not be cast
                    # to 0/1 integer indices.
                    if k.dtype == bool:
                        k = np.flatnonzero(k)
                    data = get_namespace(data).take(
                        data, k.astype(np.int64), axis=ax
                    )
                    new_dims.append(dim)
            return Variable(tuple(new_dims), data, self.attrs)
        data = self.data[tuple(key)]
        new_dims = tuple(
            dim
            for dim, k in zip(self.dims, key)
            if not isinstance(k, (int, np.integer))
        )
        return Variable(new_dims, data, self.attrs)

    # -- shaping ------------------------------------------------------------
    def transpose(self, *dims: Hashable) -> "Variable":
        if not dims:
            dims = self.dims[::-1]
        if set(dims) != set(self.dims):
            raise ValueError(f"transpose dims {dims} != variable dims {self.dims}")
        if tuple(dims) == self.dims:
            # identity: keep the payload untouched (a LazyArray stays lazy)
            return Variable(self.dims, self.data, self.attrs)
        axes = [self.dims.index(d) for d in dims]
        xp = get_namespace(self.data)
        return Variable(tuple(dims), xp.transpose(self.data, axes), self.attrs)

    def squeeze(self, dim=None) -> "Variable":
        if dim is None:
            drop = [d for d, s in zip(self.dims, self.shape) if s == 1]
        else:
            drop = [dim] if isinstance(dim, str) else list(dim)
        indexers = {d: 0 for d in drop}
        return self.isel(indexers)

    def expand_dims(self, dim: Hashable, axis: int = 0) -> "Variable":
        xp = get_namespace(self.data)
        data = xp.expand_dims(self.data, axis=axis)
        dims = list(self.dims)
        dims.insert(axis, dim)
        return Variable(tuple(dims), data, self.attrs)

    def broadcast_to(self, dims: Sequence[Hashable], sizes: Mapping) -> "Variable":
        """Reorder/insert dimensions to match ``dims``."""
        dims = tuple(dims)
        var = self
        for d in dims:
            if d not in var.dims:
                var = var.expand_dims(d, axis=0)
        var = var.transpose(*dims)
        xp = get_namespace(var.data)
        shape = tuple(sizes[d] for d in dims)
        if var.shape != shape:
            var = Variable(dims, xp.broadcast_to(var.data, shape), var.attrs)
        return var

    # -- math ---------------------------------------------------------------
    def _binary_op(self, other, op, reflexive: bool = False):
        if isinstance(other, Variable):
            self_b, other_b = broadcast_variables(self, other)
            a, b = self_b.data, other_b.data
            dims = self_b.dims
        else:
            a, b = self.data, other
            dims = self.dims
        result = op(b, a) if reflexive else op(a, b)
        return Variable(dims, result)

    def reduce(self, func_name: str, dim=None, skipna=None, **kwargs):
        xp = get_namespace(self.data)
        if dim is None:
            axis = None
            new_dims: Tuple[Hashable, ...] = ()
        else:
            if isinstance(dim, str):
                dim = [dim]
            axis = tuple(self.dims.index(d) for d in dim)
            new_dims = tuple(d for d in self.dims if d not in dim)
        data = self.data
        dtype = getattr(data, "dtype", None)
        if dtype is None:
            dtype = np.asarray(data).dtype
        use_nan = skipna or (
            skipna is None
            and func_name in ("sum", "mean", "std", "var", "min", "max", "prod", "median")
            and np.issubdtype(dtype, np.floating)
        )
        fname = f"nan{func_name}" if use_nan else func_name
        func = getattr(xp, fname, getattr(xp, func_name))
        if func_name in ("argmax", "argmin") and isinstance(axis, tuple):
            if len(axis) != 1:
                raise ValueError(f"{func_name} requires a single dimension")
            axis = axis[0]
        result = func(data, axis=axis, **kwargs)
        if new_dims == ():
            return Variable((), result)
        return Variable(new_dims, result, self.attrs)

    def fillna(self, value) -> "Variable":
        xp = get_namespace(self.data)
        return Variable(self.dims, xp.where(xp.isnan(self.data), value, self.data), self.attrs)

    def notnull(self) -> "Variable":
        xp = get_namespace(self.data)
        data = self.data
        if np.issubdtype(self.dtype, np.floating) or np.issubdtype(
            self.dtype, np.complexfloating
        ):
            return Variable(self.dims, ~xp.isnan(data))
        if self.dtype.kind in "mM":  # datetime64/timedelta64: NaT
            return Variable(self.dims, ~np.isnat(np.asarray(data)))
        return Variable(self.dims, xp.ones(self.shape, dtype=bool))

    def isnull(self) -> "Variable":
        nn = self.notnull()
        return Variable(nn.dims, ~nn.data)


def broadcast_variables(*variables: Variable) -> Tuple[Variable, ...]:
    """Broadcast variables against each other by dimension name."""
    all_dims: list = []
    sizes: dict = {}
    for var in variables:
        for d, s in var.sizes.items():
            if d not in sizes:
                all_dims.append(d)
                sizes[d] = s
            elif sizes[d] != s and s != 1 and sizes[d] != 1:
                raise ValueError(
                    f"conflicting sizes for dimension {d!r}: {sizes[d]} vs {s}"
                )
            else:
                sizes[d] = max(sizes[d], s)
    return tuple(v.broadcast_to(all_dims, sizes) for v in variables)


def concat_variables(variables: Sequence[Variable], dim: Hashable) -> Variable:
    first = variables[0]
    xp = get_namespace(*(v.data for v in variables))
    if dim in first.dims:
        axis = first.dims.index(dim)
        parts = [v.transpose(*first.dims).data for v in variables]
        data = xp.concatenate(parts, axis=axis)
        return Variable(first.dims, data, first.attrs)
    # New dimension: stack.
    parts = [v.broadcast_to(first.dims, first.sizes).data for v in variables]
    data = xp.stack(parts, axis=0)
    return Variable((dim,) + first.dims, data, first.attrs)
