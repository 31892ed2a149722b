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
    "contour",
    "contourf",
    "imshow",
    "line",
    "pcolormesh",
    "scatter",
    "surface",
    "tripcolor",
]
