"""Cross-section coordinate assembly.

Line selections (``sel(x=slice, y=scalar)`` and friends) sample values
along a section line; this module orders those samples by their
distance along the line and packages the ``{name}_x/_y/_s`` coordinate
set the selection API attaches (output contract:
xugrid/ugrid/selection_utils.py — the coordinate names and ordering are
the observable behavior; the assembly below is original).
"""

from __future__ import annotations

import numpy as np

from xugrid_tpu.constants import FloatArray, IntArray


def section_coordinates(
    edges: FloatArray, xy: FloatArray, dim: str, index: IntArray, name: str
):
    """
    Order section samples by distance along the line and build their
    coordinate set.

    Parameters
    ----------
    edges: (n_segment, 2, 2)
        The section line's segments; the first vertex is the origin the
        distance coordinate ``s`` is measured from.
    xy: (n, 2) sample points, or (n, 2, 2) sampled sub-segments
        (collapsed to their midpoints).
    dim, index, name: the output dimension, the per-sample entity
        indices, and the coordinate-name prefix.

    Returns
    -------
    coords: {f"{name}_x", f"{name}_y", f"{name}_s"} mapped to
        ``(dim, values)`` pairs, sorted by ``s``.
    index: the entity indices in the same order.
    """
    pts = np.asarray(xy)
    if pts.ndim == 3:
        pts = pts.mean(axis=1)
    origin = np.asarray(edges)[0, 0]
    delta = pts - origin
    s = np.hypot(delta[:, 0], delta[:, 1])
    order = np.argsort(s, kind="stable")
    return (
        {
            f"{name}_x": (dim, pts[order, 0]),
            f"{name}_y": (dim, pts[order, 1]),
            f"{name}_s": (dim, s[order]),
        },
        np.asarray(index)[order],
    )


def get_sorted_section_coords(
    s: FloatArray, xy: FloatArray, dim: str, index: IntArray, name: str
):
    """Pre-computed-distance variant (kept for API parity)."""
    order = np.argsort(s, kind="stable")
    return (
        {
            f"{name}_x": (dim, xy[order, 0]),
            f"{name}_y": (dim, xy[order, 1]),
            f"{name}_s": (dim, s[order]),
        },
        np.asarray(index)[order],
    )


# Facet-specific names kept for parity with the reference's split API.
section_coordinates_1d = section_coordinates
section_coordinates_2d = section_coordinates
