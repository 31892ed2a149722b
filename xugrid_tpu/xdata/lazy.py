"""
Out-of-core variable loading for the xdata layer.

The reference inherits laziness from xarray+dask (lazy ``open_dataset``,
``map_blocks`` regridding, chunked partition merges —
xugrid/regrid/regridder.py:167-186, xugrid/ugrid/partitioning.py:310-327).
xdata's equivalent is a small duck array, ``LazyArray``, that reads row
blocks from the on-disk store on demand:

* ``open_dataset(path, lazy=True)`` / ``open_zarr(store, lazy=True)``
  wrap each large data variable in a LazyArray (small variables —
  coordinates, topology — load eagerly; they are needed for grid
  construction anyway).
* Basic slicing along the leading dimension composes lazily, so
  ``uda.isel(time=slice(...))`` and the regridder's chunked apply
  stream row blocks without ever materializing the full payload.
* Any other access materializes via ``__array__`` (like xarray's
  ``.compute()`` — laziness is for open→select→regrid pipelines, not a
  general task graph).
* CF decoding (fill/scale/offset/time) is applied per loaded block by a
  transform closure, so decode semantics match the eager reader
  exactly.

``load_log`` records the byte size of every store read — the
integration tests assert that a regrid of a larger-than-budget dataset
never materializes more than one chunk at a time.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

#: variables smaller than this load eagerly (bytes).
LAZY_MIN_BYTES = 8 * 1024 * 1024


class LazyArray:
    """Duck array backed by a row-block loader.

    ``loader(start, stop)`` returns decoded rows [start, stop) along
    dimension 0 as numpy.  Slicing dim 0 composes lazily; everything
    else loads the covering rows and indexes them.
    """

    is_lazy = True

    def __init__(
        self,
        loader: Callable[[int, int], np.ndarray],
        shape: Tuple[int, ...],
        dtype,
        load_log: list | None = None,
    ):
        self._loader = loader
        self.shape = tuple(int(s) for s in shape)
        self.dtype = np.dtype(dtype)
        self.load_log = load_log if load_log is not None else []

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def size(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1

    @property
    def nbytes(self) -> int:
        return self.size * self.dtype.itemsize

    def _load(self, start: int, stop: int) -> np.ndarray:
        block = self._loader(start, stop)
        self.load_log.append(block.nbytes)
        return block

    def __array__(self, dtype=None, copy=None):
        out = self._load(0, self.shape[0]) if self.ndim else self._load(0, 1)
        if dtype is not None:
            out = out.astype(dtype, copy=False)
        return out

    def compute(self) -> np.ndarray:
        return self.__array__()

    def __getitem__(self, key):
        n = self.shape[0] if self.ndim else 1
        if key is Ellipsis or (isinstance(key, slice) and key == slice(None)):
            return self
        first, rest = key, ()
        if isinstance(key, tuple):
            if not key:
                return self
            first, rest = key[0], key[1:]
        if isinstance(first, slice) and first.step in (None, 1):
            start, stop, _ = first.indices(n)
            stop = max(stop, start)
            if not rest or all(
                isinstance(r, slice) and r == slice(None) for r in rest
            ):
                parent = self

                def loader(s, e, off=start):
                    return parent._load(off + s, off + e)

                return LazyArray(
                    loader,
                    (stop - start,) + self.shape[1:],
                    self.dtype,
                    self.load_log,
                )
            block = self._load(start, stop)
            return block[(slice(None),) + rest]
        if isinstance(first, (int, np.integer)):
            i = int(first)
            if i < 0:
                i += n
            if not 0 <= i < n:
                raise IndexError(
                    f"index {int(first)} is out of bounds for axis 0 "
                    f"with size {n}"
                )
            block = self._load(i, i + 1)[0]
            return block[rest] if rest else block
        # fancy / boolean / strided: materialize then index
        return self.__array__()[key]

    def __repr__(self):
        return (
            f"LazyArray(shape={self.shape}, dtype={self.dtype}, "
            f"loads={len(self.load_log)})"
        )


def max_single_load(arr) -> int:
    """Largest single store read (bytes) recorded by a LazyArray."""
    log = getattr(arr, "load_log", None)
    return max(log) if log else 0


def is_lazy(data) -> bool:
    return getattr(data, "is_lazy", False)


def cf_block_decoder(dims, dtype, attrs, decode_cf):
    """
    Per-block CF decode transform mirroring io_netcdf._decode_variable's
    numeric path: (attrs_out, encoding, transform, out_dtype).

    Returns None when the variable needs an eager shape-changing decode
    (CF char arrays) — the caller loads those eagerly.
    """
    from xugrid_tpu.xdata.io_netcdf import (
        _resolve_time_units,
        _time_values_to_datetime64,
    )

    attrs = dict(attrs)
    encoding: dict = {}
    if dtype == np.dtype("S1") and dims and str(dims[-1]).startswith("string"):
        return None  # char-collapse changes shape: eager path
    steps = []
    if decode_cf:
        fill = attrs.pop("_FillValue", None)
        scale = attrs.pop("scale_factor", None)
        offset = attrs.pop("add_offset", None)
        packed = scale is not None or offset is not None
        if fill is not None:
            encoding["_FillValue"] = fill
            if np.issubdtype(dtype, np.floating):
                steps.append(lambda d, f=fill: np.where(d == f, np.nan, d))
            elif packed:
                steps.append(
                    lambda d, f=fill: np.where(
                        d == f, np.nan, d.astype(np.float64)
                    )
                )
        if packed:
            steps.append(lambda d: d.astype(np.float64))
            if scale is not None:
                steps.append(lambda d, s=scale: d * s)
            if offset is not None:
                steps.append(lambda d, o=offset: d + o)
        units = attrs.get("units")
        if np.issubdtype(dtype, np.number) or packed:
            resolved = _resolve_time_units(units)
            if resolved is not None:
                ns, epoch = resolved
                steps.append(
                    lambda d, ns=ns, epoch=epoch: _time_values_to_datetime64(
                        d, ns, epoch
                    )
                )
                attrs.pop("units", None)
                attrs.pop("calendar", None)
                encoding["units"] = "seconds since 1970-01-01"

    def transform(block):
        for f in steps:
            block = f(block)
        return block

    probe = transform(np.zeros((0,), dtype=dtype))
    # loaders emit native byte order (NetCDF3 stores are big-endian)
    return attrs, encoding, transform, probe.dtype.newbyteorder("=")
