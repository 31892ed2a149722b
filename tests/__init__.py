"""Optional-dependency gating for tests (reference test strategy §4)."""

import importlib

import pytest


def _importorskip(name):
    try:
        importlib.import_module(name)
        has = True
    except ImportError:
        has = False
    return has, pytest.mark.skipif(not has, reason=f"requires {name}")


has_shapely, requires_shapely = _importorskip("shapely")
has_geopandas, requires_geopandas = _importorskip("geopandas")
has_pyproj, requires_pyproj = _importorskip("pyproj")
has_meshkernel, requires_meshkernel = _importorskip("meshkernel")
has_netcdf4, requires_netcdf4 = _importorskip("netCDF4")
