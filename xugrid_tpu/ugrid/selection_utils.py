"""Section coordinate assembly for line/cross-section selections.

Reference parity: xugrid/ugrid/selection_utils.py:8-32.
"""

from __future__ import annotations

import numpy as np

from xugrid_tpu.constants import FloatArray, IntArray


def get_sorted_section_coords(
    s: FloatArray, xy: FloatArray, dim: str, index: IntArray, name: str
):
    """Sort section samples by distance-along-line s; return coords dict."""
    order = np.argsort(s)
    coords = {
        f"{name}_x": (dim, xy[order, 0]),
        f"{name}_y": (dim, xy[order, 1]),
        f"{name}_s": (dim, s[order]),
    }
    return coords, index[order]


def section_coordinates_1d(
    edges: FloatArray, xy: FloatArray, dim: str, index: IntArray, name: str
):
    s = np.linalg.norm(xy - edges[0, 0], axis=1)
    return get_sorted_section_coords(s, xy, dim, index, name)


def section_coordinates_2d(
    edges: FloatArray, xy: FloatArray, dim: str, index: IntArray, name: str
):
    xy_mid = 0.5 * (xy[:, 0, :] + xy[:, 1, :])
    return section_coordinates_1d(edges, xy_mid, dim, index, name)
