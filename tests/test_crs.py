"""
CRS attribute handling (reference tests/test_crs.py).  Without pyproj,
every path must degrade to CrsPlaceholder; the pyproj-gated tests assert
the CF/WKT/EPSG candidate resolution.
"""

import numpy as np
import pytest

from tests import has_pyproj, requires_pyproj
from xugrid_tpu.ugrid.crs import CrsPlaceholder, crs_from_attrs, crs_to_attrs

UTM31_WKT = (
    'PROJCS["WGS 84 / UTM zone 31N",GEOGCS["WGS 84",DATUM["WGS_1984",'
    'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
    'UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],'
    'PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",3],'
    'PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],'
    'PARAMETER["false_northing",0],UNIT["metre",1],AUTHORITY["EPSG","32631"]]'
)


class TestCrsPlaceholder:
    def test_stores_attrs(self):
        attrs = {"grid_mapping_name": "latitude_longitude", "epsg": 4326}
        ph = CrsPlaceholder(attrs)
        assert ph._attrs == attrs

    def test_eq(self):
        a = CrsPlaceholder({"epsg": 4326})
        b = CrsPlaceholder({"epsg": 4326})
        c = CrsPlaceholder({"epsg": 28992})
        assert a == b
        assert a != c
        assert a != "something else"
        assert hash(a) == hash(b)

    def test_repr(self):
        assert "4326" in repr(CrsPlaceholder({"epsg": 4326}))

    def test_roundtrip(self):
        attrs = {"crs_wkt": UTM31_WKT, "epsg": 32631}
        ph = CrsPlaceholder(attrs)
        assert crs_to_attrs(ph) == attrs


@pytest.mark.skipif(has_pyproj, reason="asserts the no-pyproj fallback")
def test_placeholder_without_pyproj():
    crs = crs_from_attrs({"epsg": 4326})
    assert isinstance(crs, CrsPlaceholder)


def test_empty_attrs_give_placeholder():
    crs = crs_from_attrs({})
    assert isinstance(crs, CrsPlaceholder)


@requires_pyproj
class TestCrsFromAttrsPyproj:
    def test_from_epsg(self):
        import pyproj

        crs = crs_from_attrs({"epsg": 4326})
        assert isinstance(crs, pyproj.CRS)
        assert crs.to_epsg() == 4326
        crs = crs_from_attrs({"epsg_code": "EPSG:28992"})
        assert crs.to_epsg() == 28992

    def test_from_wkt(self):
        crs = crs_from_attrs({"crs_wkt": UTM31_WKT})
        assert crs.to_epsg() == 32631
        crs = crs_from_attrs({"spatial_ref": UTM31_WKT})
        assert crs.to_epsg() == 32631

    def test_from_cf(self):
        crs = crs_from_attrs({"grid_mapping_name": "latitude_longitude"})
        assert crs.is_geographic

    def test_case_insensitive(self):
        crs = crs_from_attrs({"EPSG": 4326})
        assert crs.to_epsg() == 4326

    def test_conflict_raises(self):
        with pytest.raises(ValueError, match="Contradictory CRS"):
            crs_from_attrs({"crs_wkt": UTM31_WKT, "epsg": 4326})

    def test_agreeing_candidates(self):
        crs = crs_from_attrs({"crs_wkt": UTM31_WKT, "epsg": 32631})
        assert crs.to_epsg() == 32631

    def test_to_attrs_roundtrip(self):
        import pyproj

        crs = pyproj.CRS.from_epsg(28992)
        attrs = crs_to_attrs(crs)
        assert attrs["epsg"] == 28992
        assert "crs_wkt" in attrs
        assert attrs["spatial_ref"] == attrs["crs_wkt"]
        back = crs_from_attrs(attrs)
        assert back.to_epsg() == 28992

    def test_grid_crs_ops(self):
        import pyproj

        import xugrid_tpu as xu

        grid = xu.Ugrid2d(
            np.array([0.0, 1.0, 1.0, 0.0]),
            np.array([0.0, 0.0, 1.0, 1.0]),
            -1,
            np.array([[0, 1, 2, 3]]),
        )
        grid.set_crs(epsg=4326)
        assert grid.crs == pyproj.CRS.from_epsg(4326)
        reprojected = grid.to_crs(epsg=3857)
        assert reprojected.crs.to_epsg() == 3857
        assert not np.allclose(reprojected.node_x, grid.node_x)
