"""meshkernel bridge helpers (reference tests/test_meshkernel_utils.py).

The enum coercion is testable without meshkernel; the GeometryList
conversion and grid-level refine/delete/from_polygon are gated.
"""

import enum

import numpy as np
import pytest

from tests import requires_meshkernel, requires_shapely
from xugrid_tpu import meshkernel_utils


class FakeEnum(enum.Enum):
    WACHSPRESS = 1
    MEAN_VALUE = 2


def test_either_string_or_enum():
    f = meshkernel_utils.either_string_or_enum
    assert f("wachspress", FakeEnum) is FakeEnum.WACHSPRESS
    assert f("MEAN_VALUE", FakeEnum) is FakeEnum.MEAN_VALUE
    assert f(FakeEnum.WACHSPRESS, FakeEnum) is FakeEnum.WACHSPRESS
    with pytest.raises(ValueError, match="Invalid option"):
        f("nonsense", FakeEnum)
    with pytest.raises(TypeError, match="Expected str or FakeEnum"):
        f(123, FakeEnum)


def test_missing_module_raises_on_use():
    if not isinstance(
        meshkernel_utils.mk, type(meshkernel_utils.mk)
    ):  # pragma: no cover
        pytest.skip("meshkernel installed")
    from xugrid_tpu.constants import MissingOptionalModule

    if isinstance(meshkernel_utils.mk, MissingOptionalModule):
        with pytest.raises(ImportError, match="meshkernel"):
            meshkernel_utils.mk.GeometryList


@requires_shapely
@requires_meshkernel
def test_to_geometry_list():
    import shapely

    square = shapely.Polygon([(0, 0), (1, 0), (1, 1), (0, 1)])
    gl = meshkernel_utils.to_geometry_list(square)
    assert len(gl.x_coordinates) == 5


@requires_meshkernel
def test_ugrid2d_meshkernel_bridge():
    import xugrid_tpu as xu

    grid = xu.Ugrid2d(
        np.array([0.0, 1.0, 1.0, 0.0]),
        np.array([0.0, 0.0, 1.0, 1.0]),
        -1,
        np.array([[0, 1, 2, 3]]),
    )
    mesh = grid.mesh
    assert mesh.node_x.size == 4
    back = xu.Ugrid2d.from_meshkernel(mesh)
    assert back.n_face == 1
