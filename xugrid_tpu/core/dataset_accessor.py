"""
UgridDatasetAccessor: the ``.ugrid`` surface for multi-topology datasets.

Parity target: xugrid/core/dataset_accessor.py:15-655 — the DataArray
accessor surface, looping over all grids in the dataset.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from xugrid_tpu import xdata
from xugrid_tpu.core.accessorbase import AbstractUgridAccessor
from xugrid_tpu.core.wrap import UgridDataArray, UgridDataset
from xugrid_tpu.ugrid.ugrid1d import Ugrid1d
from xugrid_tpu.ugrid.ugrid2d import Ugrid2d


class UgridDatasetAccessor(AbstractUgridAccessor):
    """Operations using the UGRID topologies, via ``uds.ugrid``."""

    def __init__(self, obj: xdata.Dataset, grids):
        self.obj = obj
        self.grids = grids

    @property
    def grid(self):
        """The single grid (errors for multi-topology datasets)."""
        if len(self.grids) != 1:
            raise ValueError(
                "Can only call .grid with a single topology, found: "
                f"{len(self.grids)}"
            )
        return self.grids[0]

    @property
    def name(self) -> str:
        """Name of the single topology."""
        return self.grid.name

    @property
    def names(self):
        """Names of all topologies."""
        return [grid.name for grid in self.grids]

    @property
    def topology(self) -> dict:
        """Mapping from name to topology."""
        return {grid.name: grid for grid in self.grids}

    @property
    def bounds(self) -> dict:
        """Mapping from grid name to (minx, miny, maxx, maxy)."""
        return {grid.name: grid.bounds for grid in self.grids}

    @property
    def total_bounds(self):
        """(minx, miny, maxx, maxy) over all topologies."""
        bounds = np.array(list(self.bounds.values()))
        return (
            bounds[:, 0].min(),
            bounds[:, 1].min(),
            bounds[:, 2].max(),
            bounds[:, 3].max(),
        )

    def _single_grid_for(self, method: str):
        if len(self.grids) != 1:
            raise ValueError(
                f".{method} requires a single grid, found {len(self.grids)}. "
                "Select a single topology first."
            )
        return self.grids[0]

    def rename(self, name_dict=None, **names) -> UgridDataset:
        """Rename topologies; accepts {old_name: new_name} or a single
        name when only one topology is present."""
        if isinstance(name_dict, str):
            name_dict = {self._single_grid_for("rename").name: name_dict}
        mapping = dict(name_dict or {})
        mapping.update(names)
        obj = self.obj
        new_grids = []
        for grid in self.grids:
            if grid.name in mapping:
                new_grid, name_dict_grid = grid.rename(
                    mapping[grid.name], return_name_dict=True
                )
                present = tuple(obj._variables) + tuple(obj.dims_sizes())
                obj = obj.rename(
                    {k: v for k, v in name_dict_grid.items() if k in present}
                )
                new_grids.append(new_grid)
            else:
                new_grids.append(grid)
        return UgridDataset(obj, new_grids)

    def assign_node_coords(self) -> UgridDataset:
        """Assign node coordinates of all grids to the dataset."""
        obj = self.obj
        for grid in self.grids:
            obj = grid.assign_node_coords(obj)
        return UgridDataset(obj, self.grids)

    def assign_edge_coords(self) -> UgridDataset:
        """Assign edge coordinates of all grids to the dataset."""
        obj = self.obj
        for grid in self.grids:
            obj = grid.assign_edge_coords(obj)
        return UgridDataset(obj, self.grids)

    def assign_face_coords(self) -> UgridDataset:
        """Assign face coordinates of all 2D grids to the dataset."""
        obj = self.obj
        for grid in self.grids:
            if grid.topology_dimension == 2:
                obj = grid.assign_face_coords(obj)
        return UgridDataset(obj, self.grids)

    def set_node_coords(self, node_x: str, node_y: str, topology: Optional[str] = None):
        """Use dataset coordinates as node coordinates of a topology."""
        if topology is None:
            grid = self._single_grid_for("set_node_coords")
        else:
            grid = self.topology[topology]
        grid.set_node_coords(node_x, node_y, self.obj)

    def sel(self, x=None, y=None):
        """Subselect in UGRID x/y over every topology."""
        result = self.obj
        new_grids = []
        for grid in self.grids:
            out = grid.sel(result, x, y)
            if isinstance(out, tuple):
                result, new_grid = out
                new_grids.append(new_grid)
            else:
                result = out
        if new_grids:
            return UgridDataset(result, new_grids)
        return result

    def sel_points(
        self,
        x,
        y,
        method=None,
        out_of_bounds="warn",
        fill_value=np.nan,
        tolerance=None,
    ):
        """Select values at point locations over every topology."""
        result = self.obj
        for grid in self.grids:
            result = grid.sel_points(
                result, x, y, method, out_of_bounds, fill_value, tolerance
            )
        return result

    def rasterize(self, resolution: float) -> xdata.Dataset:
        """Rasterize all face data on a regular grid."""
        grid = self._single_grid_for("rasterize")
        x, y, index = grid.rasterize(resolution)
        return self._raster_dataset(grid, x, y, index)

    def rasterize_like(self, other) -> xdata.Dataset:
        """Rasterize on the x/y coordinates of another object."""
        grid = self._single_grid_for("rasterize_like")
        x, y, index = grid.rasterize_like(
            x=np.asarray(other["x"].data), y=np.asarray(other["y"].data)
        )
        return self._raster_dataset(grid, x, y, index)

    def _raster_dataset(self, grid, x, y, index):
        accessor = _SingleGridProxy(self.obj, grid)
        return accessor._raster(x, y, index)

    def to_periodic(self) -> UgridDataset:
        """Convert all grids to periodic grids."""
        obj = self.obj
        new_grids = []
        for grid in self.grids:
            new_grid, obj = grid.to_periodic(obj=obj)
            new_grids.append(new_grid)
        return UgridDataset(obj, new_grids)

    def to_nonperiodic(self, xmax: float) -> UgridDataset:
        """Convert all periodic grids to aperiodic ones."""
        obj = self.obj
        new_grids = []
        for grid in self.grids:
            new_grid, obj = grid.to_nonperiodic(xmax=xmax, obj=obj)
            new_grids.append(new_grid)
        return UgridDataset(obj, new_grids)

    def intersect_line(self, start: Sequence[float], end: Sequence[float]):
        """Cross-section values along a line for every topology."""
        result = self.obj
        for grid in self.grids:
            result = grid.intersect_line(result, start, end)
        return result

    def intersect_linestring(self, linestring):
        """Cross-section values along a linestring for every topology."""
        result = self.obj
        for grid in self.grids:
            result = grid.intersect_linestring(result, linestring)
        return result

    @property
    def crs(self) -> dict:
        """Mapping from grid name to CRS."""
        return {grid.name: grid.crs for grid in self.grids}

    def set_crs(
        self,
        crs=None,
        epsg=None,
        allow_override: bool = False,
        topology: Optional[str] = None,
    ):
        """Set the CRS of one or all topologies."""
        grids = (
            self.grids if topology is None else [self.topology[topology]]
        )
        for grid in grids:
            grid.set_crs(crs, epsg, allow_override)
            grid._update_coordinate_attrs(self.obj)

    def to_crs(self, crs=None, epsg=None, topology: Optional[str] = None):
        """Transform one or all topologies to a new CRS."""
        obj = self.obj
        new_grids = []
        for grid in self.grids:
            if topology is None or grid.name == topology:
                new_grid = grid.to_crs(crs, epsg)
                obj = new_grid._assign_derived_coords(obj)
            else:
                new_grid = grid
            new_grids.append(new_grid)
        return UgridDataset(obj, new_grids)

    def to_geodataframe(
        self,
        dim: Optional[str] = None,
        name: Optional[str] = None,
        dim_order=None,
    ):
        """Convert facet data + geometry of all grids to a GeoDataFrame."""
        import geopandas as gpd
        import pandas as pd

        frames = []
        for grid in self.grids:
            for facet_dim in grid.dims:
                if dim is not None and facet_dim != dim:
                    continue
                variables = [
                    var
                    for var in self.obj.data_vars
                    if facet_dim in self.obj._variables[var].dims
                ]
                if not variables:
                    continue
                df = self.obj[variables].to_dataframe(dim_order=dim_order)
                geometry = grid.to_shapely(facet_dim)
                frames.append(
                    gpd.GeoDataFrame(df, geometry=geometry, crs=grid.crs)
                )
        if not frames:
            raise ValueError(
                "Unable to convert to GeoDataFrame: no data variables are "
                "associated with any UGRID dimension."
            )
        if len(frames) == 1:
            return frames[0]
        return pd.concat(frames)

    def reindex_like(self, other, tolerance: float = 0.0) -> UgridDataset:
        """Conform to equivalent topologies with permuted entity order,
        matching grids by name."""
        if isinstance(other, (Ugrid1d, Ugrid2d)):
            other_grids = {other.name: other}
        elif isinstance(other, UgridDataset):
            other_grids = {grid.name: grid for grid in other.grids}
        elif isinstance(other, UgridDataArray):
            other_grids = {other.grid.name: other.grid}
        else:
            raise TypeError(
                "Expected Ugrid1d, Ugrid2d, UgridDataArray, or UgridDataset, "
                f"received instead: {type(other).__name__}"
            )
        obj = self.obj
        new_grids = []
        for grid in self.grids:
            other_grid = other_grids.get(grid.name)
            if other_grid is not None:
                obj = grid.reindex_like(other_grid, obj=obj, tolerance=tolerance)
                new_grids.append(other_grid)
            else:
                new_grids.append(grid)
        return UgridDataset(obj, new_grids)

    def to_dataset(self, optional_attributes: bool = False):
        """Convert to a plain Dataset with UGRID topology variables."""
        ds = self.obj
        for grid in self.grids:
            ds = grid.to_dataset(ds, optional_attributes)
        return ds

    # used by AbstractUgridAccessor.partition/partition_by_label
    # (these require a single grid)
    @property
    def _partition_grid(self):
        return self._single_grid_for("partition")


class _SingleGridProxy(AbstractUgridAccessor):
    """Adapter giving the base-class raster helper a single grid."""

    def __init__(self, obj, grid):
        self.obj = obj
        self.grid = grid

    def sel(self, *args, **kwargs):
        raise NotImplementedError

    def to_dataset(self):
        raise NotImplementedError
