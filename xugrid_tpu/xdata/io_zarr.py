"""
Minimal self-contained zarr v2 directory store I/O.

Implements just enough of the zarr v2 spec (JSON metadata + zlib-compressed
C-order chunks, xarray's ``_ARRAY_DIMENSIONS`` convention) to round-trip
datasets without the zarr package.  When the real zarr/xarray stack is
present it reads these stores transparently.
"""

from __future__ import annotations

import json
import os
import zlib
from pathlib import Path

import numpy as np

from xugrid_tpu.xdata.dataset import Dataset
from xugrid_tpu.xdata.variable import Variable

_COMPRESSOR = {"id": "zlib", "level": 4}


def _dtype_str(dtype: np.dtype) -> str:
    return dtype.str


def to_zarr(ds: Dataset, store, mode: str = "w-", **kwargs) -> None:
    from xugrid_tpu.xdata.io_netcdf import (
        annotate_cf_coordinates,
        encode_cf_time,
    )

    ds = annotate_cf_coordinates(encode_cf_time(ds))
    root = Path(store)
    if (root / ".zgroup").exists():
        # xarray's default mode "w-" refuses to clobber an existing
        # store; only an explicit mode="w" removes it (removal must be
        # complete — stale arrays or chunk files would reappear on open
        # with conflicting dimension sizes).
        if mode != "w":
            raise FileExistsError(
                f"zarr store already exists at {root}; "
                "pass mode='w' to overwrite"
            )
        import shutil

        shutil.rmtree(root)
    root.mkdir(parents=True, exist_ok=True)
    (root / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    (root / ".zattrs").write_text(json.dumps(_json_safe(ds.attrs)))
    for name, var in ds._variables.items():
        _write_array(root / str(name), var)
    # Consolidated metadata: xarray's open_zarr reads this by default
    # (consolidated=True) and warns or fails without it.
    consolidated = {}
    for key in (".zgroup", ".zattrs"):
        consolidated[key] = json.loads((root / key).read_text())
    for child in sorted(root.iterdir()):
        if child.is_dir():
            for key in (".zarray", ".zattrs"):
                f = child / key
                if f.exists():
                    consolidated[f"{child.name}/{key}"] = json.loads(
                        f.read_text()
                    )
    (root / ".zmetadata").write_text(
        json.dumps(
            {"zarr_consolidated_format": 1, "metadata": consolidated}
        )
    )


def _write_array(path: Path, var: Variable) -> None:
    path.mkdir(parents=True, exist_ok=True)
    data = np.asarray(var.data)
    if data.ndim:
        # NOTE: ascontiguousarray promotes 0-d arrays to 1-d, which would
        # corrupt scalar variables (e.g. the UGRID topology dummy var).
        data = np.ascontiguousarray(data)
    if data.dtype.kind == "U":
        # utf-8, not astype("S") (which is ASCII-only and raises on
        # accented text); the reader decodes bytes back as utf-8.
        data = np.char.encode(data, "utf-8")
    meta = {
        "zarr_format": 2,
        "shape": list(data.shape),
        # zarr v2 requires len(chunks) == len(shape) and every chunk
        # length >= 1 (even for zero-length dims); 0-d arrays use []
        # (zarr-python normalize_chunks semantics) with chunk key "0".
        "chunks": [max(1, s) for s in data.shape],
        "dtype": _dtype_str(data.dtype),
        "compressor": _COMPRESSOR,
        "fill_value": None,
        "order": "C",
        "filters": None,
    }
    (path / ".zarray").write_text(json.dumps(meta))
    attrs = _json_safe(dict(var.attrs))
    attrs["_ARRAY_DIMENSIONS"] = list(map(str, var.dims))
    (path / ".zattrs").write_text(json.dumps(attrs))
    if data.size:
        chunk_key = ".".join(["0"] * max(data.ndim, 1))
        (path / chunk_key).write_bytes(zlib.compress(data.tobytes(), 4))


def open_zarr(store, lazy: bool = False, **kwargs) -> Dataset:
    root = Path(store)
    if not (root / ".zgroup").exists():
        raise FileNotFoundError(f"not a zarr store: {store}")
    attrs = {}
    if (root / ".zattrs").exists():
        attrs = json.loads((root / ".zattrs").read_text())
    ds = Dataset(attrs=attrs)
    for child in sorted(root.iterdir()):
        if not child.is_dir() or not (child / ".zarray").exists():
            continue
        name = child.name
        meta = json.loads((child / ".zarray").read_text())
        var_attrs = {}
        dims = None
        if (child / ".zattrs").exists():
            var_attrs = json.loads((child / ".zattrs").read_text())
            dims = var_attrs.pop("_ARRAY_DIMENSIONS", None)
        shape = tuple(meta["shape"])
        dtype = np.dtype(meta["dtype"])
        chunks = tuple(meta["chunks"])
        if dims is None:
            dims = tuple(f"{name}_dim_{i}" for i in range(len(shape)))
        from xugrid_tpu.xdata.io_netcdf import _decode_variable

        if lazy and shape:
            from xugrid_tpu.xdata.lazy import (
                LAZY_MIN_BYTES,
                LazyArray,
                cf_block_decoder,
            )

            nbytes = int(np.prod(shape)) * dtype.itemsize
            plan = (
                cf_block_decoder(tuple(dims), dtype, var_attrs, True)
                if nbytes >= LAZY_MIN_BYTES
                else None
            )
            if plan is not None:
                attrs_out, encoding, transform, out_dtype = plan

                def loader(start, stop, child=child, shape=shape,
                           chunks=chunks, dtype=dtype, meta=meta,
                           transform=transform):
                    block = _read_chunks(
                        child, shape, chunks, dtype, meta,
                        row_range=(start, stop),
                    )
                    block = transform(block)
                    # Loaders must emit native byte order (lazy.py's
                    # out_dtype contract); an identity transform over a
                    # '>f8' store would otherwise leak big-endian blocks
                    # under a native-claiming dtype.  No-op when already
                    # native (copy=False).
                    block = block.astype(
                        block.dtype.newbyteorder("="), copy=False
                    )
                    return np.ascontiguousarray(block)

                ds._variables[name] = Variable(
                    tuple(dims),
                    LazyArray(loader, shape, out_dtype),
                    attrs_out,
                    encoding,
                )
                continue
        data = _read_chunks(child, shape, chunks, dtype, meta)
        ds._variables[name] = _decode_variable(
            name, tuple(dims), data, var_attrs, decode_cf=True
        )
    from xugrid_tpu.xdata.io_netcdf import _mark_coords

    _mark_coords(ds)
    return ds


def _read_chunks(
    path: Path, shape, chunks, dtype, meta, row_range=None
) -> np.ndarray:
    compressor = meta.get("compressor")
    if meta.get("order", "C") != "C":
        # Silently reading an F-order store would transpose every chunk.
        raise NotImplementedError(
            "zarr arrays with order='F' require the zarr package"
        )
    if meta.get("filters"):
        raise NotImplementedError(
            "zarr arrays with filters require the zarr package"
        )
    ndim = max(len(shape), 1)
    if any(s == 0 for s in shape):
        # Zero-length array: no chunk files exist.
        return np.zeros(shape, dtype=dtype)
    ranged = row_range is not None and bool(shape)
    r0, r1 = (row_range if ranged else (0, shape[0] if shape else 1))
    out_shape = ((r1 - r0),) + tuple(shape[1:]) if ranged else shape
    grid = [
        max(1, -(-s // max(1, c))) for s, c in zip(shape, chunks)
    ] or [1]
    if ranged:
        c0 = max(1, chunks[0])
        dim0_range = range(r0 // c0, min(grid[0], -(-max(r1, r0 + 1) // c0)))
    else:
        dim0_range = range(grid[0]) if shape else range(1)
    fill = meta.get("fill_value")
    if fill is None:
        init = np.zeros(out_shape if shape else (), dtype=dtype)
    else:
        if isinstance(fill, str) and dtype.kind == "f":
            fill = float(fill)  # "NaN" / "Infinity" spec encodings
        init = np.full(out_shape if shape else (), fill, dtype=dtype)
    out = init
    import itertools

    dim_ranges = [dim0_range] + [range(g) for g in grid[1:]]
    for idx in itertools.product(*dim_ranges) if shape else [()]:
        key = ".".join(map(str, idx)) if idx else "0"
        chunk_file = path / key
        if not chunk_file.exists():
            # Absent chunk: entirely fill_value (legal sparse store).
            continue
        raw = chunk_file.read_bytes()
        if compressor and compressor.get("id") == "zlib":
            raw = zlib.decompress(raw)
        elif compressor and compressor.get("id") == "blosc":
            raise ImportError("blosc-compressed zarr requires the zarr package")
        chunk_shape = tuple(
            min(c, s - i * c) for i, c, s in zip(idx, chunks, shape)
        )
        full_chunk = np.frombuffer(raw, dtype=dtype).reshape(
            chunks if shape else ()
        )
        if shape:
            sel = [slice(0, cs) for cs in chunk_shape]
            target = [
                slice(i * c, i * c + cs)
                for i, c, cs in zip(idx, chunks, chunk_shape)
            ]
            if ranged:
                lo = max(idx[0] * chunks[0], r0)
                hi = min(idx[0] * chunks[0] + chunk_shape[0], r1)
                if hi <= lo:
                    continue
                sel[0] = slice(lo - idx[0] * chunks[0],
                               hi - idx[0] * chunks[0])
                target[0] = slice(lo - r0, hi - r0)
            out[tuple(target)] = full_chunk[tuple(sel)]
        else:
            out = full_chunk
    return out


def _json_safe(obj):
    if isinstance(obj, dict):
        return {k: _json_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_json_safe(v) for v in obj]
    if isinstance(obj, np.bool_):
        return bool(obj)
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.bytes_):
        return obj.decode("utf-8", errors="replace")
    if isinstance(obj, np.str_):
        return str(obj)
    if isinstance(obj, np.ndarray):
        return _json_safe(obj.tolist())
    return obj
