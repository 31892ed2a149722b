from xugrid_tpu.data.synthetic import (
    adh_san_diego,
    disk,
    elevation_nl,
    generate_disk,
    provinces_nl,
    xoxo,
)

__all__ = [
    "adh_san_diego",
    "disk",
    "elevation_nl",
    "generate_disk",
    "provinces_nl",
    "xoxo",
]
