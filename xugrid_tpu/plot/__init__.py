from xugrid_tpu.plot.facetgrid import FacetGrid
from xugrid_tpu.plot.plot import (
    contour,
    contourf,
    imshow,
    line,
    pcolormesh,
    scatter,
    surface,
    tripcolor,
)

__all__ = [
    "FacetGrid",
    "contour",
    "contourf",
    "imshow",
    "line",
    "pcolormesh",
    "scatter",
    "surface",
    "tripcolor",
]
