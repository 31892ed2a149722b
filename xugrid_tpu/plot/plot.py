"""
Matplotlib plotting of UGRID data.

Parity target: xugrid/plot/plot.py:53-676 — pcolormesh / tripcolor /
line / contour(f) / imshow / scatter / surface with facet dispatch via
``uda.ugrid.plot``; facet grids over extra dims via row=/col= kwargs
(plot/facetgrid.py).
"""

from __future__ import annotations

import numpy as np

from xugrid_tpu.constants import FILL_VALUE
from xugrid_tpu.ugrid.connectivity import close_polygons


def _ensure_ax(ax=None, **subplot_kws):
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(**subplot_kws)
    return ax


def _unpack(grid_or_accessor, darray):
    """Accept (grid, values) or an accessor-style pair."""
    values = None
    if darray is not None:
        values = np.asarray(
            darray.data if hasattr(darray, "data") else darray
        ).squeeze()
    return grid_or_accessor, values


def _add_colorbar(ax, artist, add_colorbar):
    if add_colorbar:
        ax.figure.colorbar(artist, ax=ax)


def _cmap_params(values, kwargs):
    """
    Resolve xarray-style colormap keywords (vmin/vmax/robust/center/norm)
    into a Normalize + cmap pair that every matplotlib artist accepts
    (PolyCollection/LineCollection reject raw vmin=/vmax=).

    Mirrors the reference's _process_cmap_cbar_kwargs behavior
    (xugrid/plot/utils.py): robust uses the 2-98 percentile range, and
    data straddling zero (or an explicit ``center``) selects symmetric
    limits with a diverging default colormap.
    """
    vmin = kwargs.pop("vmin", None)
    vmax = kwargs.pop("vmax", None)
    robust = kwargs.pop("robust", False)
    center = kwargs.pop("center", None)
    norm = kwargs.pop("norm", None)
    if values is None:
        return kwargs
    if norm is not None:
        kwargs["norm"] = norm
        return kwargs
    calc = np.asarray(values, dtype=float).ravel()
    calc = calc[np.isfinite(calc)]
    if calc.size == 0:
        return kwargs
    computed_vmin = vmin is None
    computed_vmax = vmax is None
    if computed_vmin:
        vmin = float(np.percentile(calc, 2) if robust else calc.min())
    if computed_vmax:
        vmax = float(np.percentile(calc, 98) if robust else calc.max())
    divergent = center is not None
    if center is None and computed_vmin and computed_vmax and vmin < 0 < vmax:
        center = 0.0
        divergent = True
    if divergent:
        lim = max(abs(vmax - center), abs(vmin - center))
        vmin, vmax = center - lim, center + lim
        kwargs.setdefault("cmap", "RdBu_r")
    import matplotlib.colors

    kwargs["norm"] = matplotlib.colors.Normalize(vmin=vmin, vmax=vmax)
    return kwargs


def line(grid, darray=None, ax=None, add_colorbar: bool = False, **kwargs):
    """Plot the edges of the grid as a LineCollection; optional edge
    values as colors."""
    from matplotlib.collections import LineCollection

    grid, values = _unpack(grid, darray)
    ax = _ensure_ax(ax)
    segments = grid.node_coordinates[grid.edge_node_connectivity]
    kwargs.setdefault("colors", "#000033" if values is None else None)
    if values is not None:
        kwargs.pop("colors")
        kwargs = _cmap_params(values, kwargs)
    collection = LineCollection(segments, **kwargs)
    if values is not None:
        collection.set_array(values)
    ax.add_collection(collection)
    ax.autoscale_view()
    if values is not None:
        _add_colorbar(ax, collection, add_colorbar)
    return collection


def scatter(grid, darray=None, dim=None, ax=None, add_colorbar: bool = False, **kwargs):
    """Scatter the coordinates of a facet, colored by its values."""
    grid, values = _unpack(grid, darray)
    ax = _ensure_ax(ax)
    dim = dim or grid.core_dimension
    coords = grid.get_coordinates(dim)
    kwargs = _cmap_params(values, kwargs)
    artist = ax.scatter(coords[:, 0], coords[:, 1], c=values, **kwargs)
    if values is not None:
        _add_colorbar(ax, artist, add_colorbar)
    return artist


def pcolormesh(grid, darray=None, ax=None, add_colorbar: bool = False, **kwargs):
    """Draw face values as filled polygons (PolyCollection)."""
    from matplotlib.collections import PolyCollection

    grid, values = _unpack(grid, darray)
    ax = _ensure_ax(ax)
    closed, _ = close_polygons(grid.face_node_connectivity)
    vertices = grid.node_coordinates[closed]
    kwargs = _cmap_params(values, kwargs)
    collection = PolyCollection(vertices, **kwargs)
    if values is not None:
        collection.set_array(values)
    ax.add_collection(collection)
    ax.autoscale_view()
    if values is not None:
        _add_colorbar(ax, collection, add_colorbar)
    return collection


def tripcolor(grid, darray=None, ax=None, add_colorbar: bool = False, **kwargs):
    """Draw node values on the grid triangulation."""
    import matplotlib.tri

    grid, values = _unpack(grid, darray)
    ax = _ensure_ax(ax)
    (node_x, node_y, triangles), _ = grid.triangulation
    triangulation = matplotlib.tri.Triangulation(node_x, node_y, triangles)
    kwargs = _cmap_params(values, kwargs)
    artist = ax.tripcolor(triangulation, values, **kwargs)
    _add_colorbar(ax, artist, add_colorbar)
    return artist


def _contour_triangulation(grid, values, location):
    import matplotlib.tri

    if location == "node":
        (node_x, node_y, triangles), _ = grid.triangulation
        z = values
    else:  # face values -> centroid triangulation
        (node_x, node_y, triangles), face_index = grid.centroid_triangulation
        z = values[face_index]
    return matplotlib.tri.Triangulation(node_x, node_y, triangles), z


def contour(grid, darray=None, ax=None, location="node", add_colorbar=False, **kwargs):
    """Contour lines of node or face data."""
    grid, values = _unpack(grid, darray)
    ax = _ensure_ax(ax)
    triangulation, z = _contour_triangulation(grid, values, location)
    kwargs = _cmap_params(z, kwargs)
    artist = ax.tricontour(triangulation, z, **kwargs)
    _add_colorbar(ax, artist, add_colorbar)
    return artist


def contourf(grid, darray=None, ax=None, location="node", add_colorbar=False, **kwargs):
    """Filled contours of node or face data."""
    grid, values = _unpack(grid, darray)
    ax = _ensure_ax(ax)
    triangulation, z = _contour_triangulation(grid, values, location)
    kwargs = _cmap_params(z, kwargs)
    artist = ax.tricontourf(triangulation, z, **kwargs)
    _add_colorbar(ax, artist, add_colorbar)
    return artist


def surface(grid, darray=None, ax=None, location="node", add_colorbar=False, **kwargs):
    """3D triangular surface plot."""
    import matplotlib.pyplot as plt

    grid, values = _unpack(grid, darray)
    if ax is None:
        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
    triangulation, z = _contour_triangulation(grid, values, location)
    artist = ax.plot_trisurf(triangulation, z, **kwargs)
    _add_colorbar(ax, artist, add_colorbar)
    return artist


def imshow(
    grid,
    darray=None,
    ax=None,
    resolution=None,
    add_colorbar: bool = False,
    **kwargs,
):
    """Rasterize face data and draw with imshow (default >= 500 px)."""
    grid, values = _unpack(grid, darray)
    ax = _ensure_ax(ax)
    xmin, ymin, xmax, ymax = grid.bounds
    if resolution is None:
        resolution = max(xmax - xmin, ymax - ymin) / 500
    x, y, index = grid.rasterize(resolution)
    img = np.where(index != -1, values[np.maximum(index, 0)], np.nan)
    kwargs.setdefault("origin", "upper")
    # Extent spans the OUTER cell edges; center-to-center would shift
    # the raster by half a pixel against mesh overlays.
    d = abs(resolution)
    kwargs.setdefault(
        "extent",
        (x.min() - 0.5 * d, x.max() + 0.5 * d,
         y.min() - 0.5 * d, y.max() + 0.5 * d),
    )
    kwargs = _cmap_params(img, kwargs)
    artist = ax.imshow(img, **kwargs)
    _add_colorbar(ax, artist, add_colorbar)
    return artist


class _PlotMethods:
    """``uda.ugrid.plot``: dispatch by the data's facet."""

    def __init__(self, accessor):
        self._accessor = accessor

    def _dispatch(self):
        grid = self._accessor.grid
        obj = self._accessor.obj
        dims = set(obj.dims)
        if grid.core_dimension in dims and grid.topology_dimension == 2:
            return "face"
        if grid.node_dimension in dims:
            return "node"
        if grid.edge_dimension in dims:
            return "edge"
        raise ValueError(
            f"Data dimensions {obj.dims} do not include a UGRID dimension "
            f"of grid {grid.name}"
        )

    def __call__(self, **kwargs):
        facet = self._dispatch()
        if facet == "face":
            return self.pcolormesh(**kwargs)
        elif facet == "node":
            return self.tripcolor(**kwargs)
        return self.line(**kwargs)

    def _grid_and_data(self):
        return self._accessor.grid, self._accessor.obj

    def _maybe_facet(self, func, kwargs):
        """row=/col= kwargs dispatch to a FacetGrid of small multiples."""
        row = kwargs.pop("row", None)
        col = kwargs.pop("col", None)
        col_wrap = kwargs.pop("col_wrap", None)
        if row is None and col is None:
            return None
        from xugrid_tpu.plot.facetgrid import plot_facets

        return plot_facets(
            self._accessor, func, row=row, col=col, col_wrap=col_wrap, **kwargs
        )

    def pcolormesh(self, **kwargs):
        fg = self._maybe_facet(pcolormesh, kwargs)
        if fg is not None:
            return fg
        grid, da = self._grid_and_data()
        return pcolormesh(grid, da, **kwargs)

    def tripcolor(self, **kwargs):
        fg = self._maybe_facet(tripcolor, kwargs)
        if fg is not None:
            return fg
        grid, da = self._grid_and_data()
        return tripcolor(grid, da, **kwargs)

    def line(self, **kwargs):
        grid, da = self._grid_and_data()
        facet = self._dispatch()
        if facet == "edge":
            fg = self._maybe_facet(line, kwargs)
            if fg is not None:
                return fg
        return line(grid, da if facet == "edge" else None, **kwargs)

    def scatter(self, **kwargs):
        grid, da = self._grid_and_data()
        dims = set(da.dims)
        dim = next(iter(grid.dims & dims))
        return scatter(grid, da, dim=dim, **kwargs)

    def contour(self, **kwargs):
        facet = self._dispatch()
        kwargs.setdefault("location", "face" if facet == "face" else "node")
        fg = self._maybe_facet(contour, kwargs)
        if fg is not None:
            return fg
        grid, da = self._grid_and_data()
        return contour(grid, da, **kwargs)

    def contourf(self, **kwargs):
        facet = self._dispatch()
        kwargs.setdefault("location", "face" if facet == "face" else "node")
        fg = self._maybe_facet(contourf, kwargs)
        if fg is not None:
            return fg
        grid, da = self._grid_and_data()
        return contourf(grid, da, **kwargs)

    def surface(self, **kwargs):
        grid, da = self._grid_and_data()
        facet = self._dispatch()
        location = "face" if facet == "face" else "node"
        return surface(grid, da, location=location, **kwargs)

    def imshow(self, **kwargs):
        fg = self._maybe_facet(imshow, kwargs)
        if fg is not None:
            return fg
        grid, da = self._grid_and_data()
        return imshow(grid, da, **kwargs)
