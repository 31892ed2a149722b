"""Core utility tests (reference tests/test_core_utils.py)."""

import numpy as np
import pytest

import xugrid_tpu as xu
from xugrid_tpu.core.utils import (
    UncachedAccessor,
    either_dict_or_kwargs,
    unique_grids,
)


def test_either_dict_or_kwargs():
    assert either_dict_or_kwargs({"x": 1}, {}, "sel") == {"x": 1}
    assert either_dict_or_kwargs(None, {"x": 1}, "sel") == {"x": 1}
    assert either_dict_or_kwargs(None, {}, "sel") == {}
    with pytest.raises(ValueError, match="Cannot specify both"):
        either_dict_or_kwargs({"x": 1}, {"y": 2}, "sel")


def test_uncached_accessor():
    class Accessor:
        def __init__(self, obj):
            self.obj = obj

    class Host:
        acc = UncachedAccessor(Accessor)

    h = Host()
    a1 = h.acc
    a2 = h.acc
    assert a1 is not a2  # new instance per access
    assert a1.obj is h
    assert Host.acc is Accessor  # class access returns the class


def test_unique_grids():
    grid = xu.Ugrid2d(
        np.array([0.0, 1.0, 1.0, 0.0]),
        np.array([0.0, 0.0, 1.0, 1.0]),
        -1,
        np.array([[0, 1, 2, 3]]),
    )
    same = xu.Ugrid2d(
        grid.node_x, grid.node_y, -1, grid.face_node_connectivity
    )
    other = grid.rename("other")
    out = unique_grids([grid, same, other])
    assert len(out) == 2
    assert out[0] is grid
