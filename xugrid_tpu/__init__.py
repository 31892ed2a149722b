"""
xugrid_tpu: a TPU-native framework for 1D network and 2D unstructured-grid
(UGRID conventions) data.

Capability-parity rebuild of Deltares/xugrid on JAX/XLA/Pallas:
topologies are padded dense int arrays; the spatial index is a flat BVH
with batched jitted queries; regridders build sparse weights on device and
apply them as fused segment-sum kernels; partitioning maps onto device
sharding with collective halo exchange.  The labeled-array core (xdata)
is self-contained: xarray, netCDF4, shapely, and pyproj are optional.
"""

__version__ = "0.1.0"

from xugrid_tpu import xdata
from xugrid_tpu.constants import FILL_VALUE
from xugrid_tpu.core.common import (
    concat,
    full_like,
    load_dataarray,
    load_dataset,
    merge,
    ones_like,
    open_dataarray,
    open_dataset,
    open_mfdataset,
    open_zarr,
    zeros_like,
)
from xugrid_tpu.core.wrap import UgridDataArray, UgridDataset
from xugrid_tpu.regrid import (
    BarycentricInterpolator,
    CentroidLocatorRegridder,
    NetworkGridder,
    OverlapRegridder,
    RelativeOverlapRegridder,
)
from xugrid_tpu.ugrid.conventions import UgridRolesAccessor, ugrid_roles
from xugrid_tpu.ugrid.partitioning import merge_partitions
from xugrid_tpu.ugrid.ugrid1d import Ugrid1d
from xugrid_tpu.ugrid.ugrid2d import Ugrid2d
from xugrid_tpu.ugrid.ugridbase import AbstractUgrid

__all__ = [
    "FILL_VALUE",
    "AbstractUgrid",
    "Ugrid1d",
    "Ugrid2d",
    "UgridDataArray",
    "UgridDataset",
    "UgridRolesAccessor",
    "BarycentricInterpolator",
    "CentroidLocatorRegridder",
    "NetworkGridder",
    "OverlapRegridder",
    "RelativeOverlapRegridder",
    "ugrid_roles",
    "concat",
    "full_like",
    "load_dataarray",
    "load_dataset",
    "merge",
    "merge_partitions",
    "ones_like",
    "open_dataarray",
    "open_dataset",
    "open_mfdataset",
    "open_zarr",
    "zeros_like",
    "xdata",
]

from xugrid_tpu import data  # noqa: E402  (sample datasets)
__all__.append("data")
