"""
Regridding: the four regridder families on an unstructured mesh
(reference: examples/regridder_overview.py).
"""

import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import xugrid_tpu as xu

source = xu.data.elevation_nl(n_points=4000)
grid = source.grid

# Target: a regular raster spanning the mesh.
xmin, ymin, xmax, ymax = grid.bounds
res = max(xmax - xmin, ymax - ymin) / 128
target = xu.Ugrid2d.from_structured_intervals1d(
    np.arange(xmin, xmax + res, res), np.arange(ymin, ymax + res, res)
)

# Area-weighted mean of overlapping faces.
overlap = xu.OverlapRegridder(source, target, method="mean")
mean_elev = overlap.regrid(source)
print("overlap mean:", float(np.nanmean(np.asarray(mean_elev.values))))

# Other reductions, including percentiles and custom callables.
p90 = xu.OverlapRegridder(source, target, method="p90").regrid(source)
import jax.numpy as jnp

spread = xu.OverlapRegridder(
    source, target, method=lambda v, w: jnp.nanmax(v, axis=-1) - jnp.nanmin(v, axis=-1)
).regrid(source)
print("p90 / spread computed")

# Nearest-source-face and linear interpolation.
centroid = xu.CentroidLocatorRegridder(source, target).regrid(source)
linear = xu.BarycentricInterpolator(source, target).regrid(source)
print("centroid/linear computed")

# Weights are serializable: build once, reuse across runs.
ds = overlap.to_dataset()
rebuilt = xu.OverlapRegridder.from_dataset(ds)
again = rebuilt.regrid(source)
np.testing.assert_allclose(
    np.asarray(again.values), np.asarray(mean_elev.values), equal_nan=True
)
print("weight serialization round-trip OK")
