"""
Structured-grid adapters for regridding (reference strategy:
tests/test_regrid/test_structured.py): bounds inference, decreasing-
coordinate flipping, interval overlap, centroid location, and linear
interpolation weights.
"""

import numpy as np
import pytest

from xugrid_tpu.regrid.structured import (
    StructuredGrid1d,
    StructuredGrid2d,
    StructuredGrid3d,
)
from xugrid_tpu.xdata import DataArray, Dataset


def make_obj(coords_dict, sizes):
    """Dataset with a dummy variable spanning the given dims."""
    ds = Dataset()
    dims = tuple(sizes)
    ds["dummy"] = DataArray(np.zeros(tuple(sizes.values())), dims=dims)
    coord_das = {}
    for name, value in coords_dict.items():
        value = np.asarray(value)
        if value.ndim == 0:
            coord_das[name] = DataArray(value)
        elif value.ndim == 1:
            dim = name if name in sizes else name[1:]  # dx -> x
            coord_das[name] = DataArray(value, dims=(dim,))
        else:  # bounds (n, 2)
            dim = name.replace("bounds", "")
            coord_das[name] = DataArray(value, dims=(dim, "nbounds"))
    return ds.assign_coords(**coord_das)


def sorted_triplet(s, t, w):
    order = np.lexsort((s, t))
    return s[order], t[order], w[order]


class TestStructuredGrid1d:
    def test_equidistant_inference(self):
        obj = make_obj({"x": [0.5, 1.5, 2.5]}, {"x": 3})
        grid = StructuredGrid1d(obj, "x")
        np.testing.assert_allclose(
            grid.bounds, [[0.0, 1.0], [1.0, 2.0], [2.0, 3.0]]
        )
        assert not grid.flipped
        assert grid.size == 3

    def test_decreasing_coordinates_flip(self):
        obj = make_obj({"x": [2.5, 1.5, 0.5]}, {"x": 3})
        grid = StructuredGrid1d(obj, "x")
        assert grid.flipped
        # Internal bounds ascending.
        np.testing.assert_allclose(grid.bounds[:, 0], [0.0, 1.0, 2.0])
        # flip_if_needed maps internal (ascending) indices back.
        np.testing.assert_array_equal(
            grid.flip_if_needed(np.array([0, 1, 2])), [2, 1, 0]
        )

    def test_dx_coordinate(self):
        obj = make_obj({"x": [0.5, 2.0, 4.0], "dx": [1.0, 2.0, 2.0]}, {"x": 3})
        grid = StructuredGrid1d(obj, "x")
        np.testing.assert_allclose(
            grid.bounds, [[0.0, 1.0], [1.0, 3.0], [3.0, 5.0]]
        )

    def test_bounds_coordinate(self):
        bounds = np.array([[0.0, 1.0], [1.0, 3.0]])
        obj = make_obj({"x": [0.5, 2.0], "xbounds": bounds}, {"x": 2})
        grid = StructuredGrid1d(obj, "x")
        np.testing.assert_allclose(grid.bounds, bounds)

    def test_errors(self):
        obj = make_obj({"x": [0.5, 1.5, 4.0]}, {"x": 3})
        with pytest.raises(ValueError, match="equidistant"):
            StructuredGrid1d(obj, "x")
        obj = make_obj({"x": [0.5, 2.0, 1.0]}, {"x": 3})
        with pytest.raises(ValueError, match="not monotonic"):
            StructuredGrid1d(obj, "x")
        obj = make_obj({"x": [0.5]}, {"x": 1})
        with pytest.raises(ValueError, match="single"):
            StructuredGrid1d(obj, "x")
        with pytest.raises(ValueError, match="not present"):
            StructuredGrid1d(obj, "y")

    def test_overlap(self):
        # source cells [0,1],[1,2],[2,3]; target cells [0.5,1.5],[1.5,2.5]
        source = StructuredGrid1d(
            make_obj({"x": [0.5, 1.5, 2.5]}, {"x": 3}), "x"
        )
        target = StructuredGrid1d(
            make_obj({"x": [1.0, 2.0]}, {"x": 2}), "x"
        )
        s, t, w = sorted_triplet(*source.overlap(target, relative=False))
        np.testing.assert_array_equal(s, [0, 1, 1, 2])
        np.testing.assert_array_equal(t, [0, 0, 1, 1])
        np.testing.assert_allclose(w, [0.5, 0.5, 0.5, 0.5])

    def test_overlap_relative(self):
        source = StructuredGrid1d(
            make_obj({"x": [1.0, 3.0], "dx": [2.0, 2.0]}, {"x": 2}), "x"
        )
        target = StructuredGrid1d(
            make_obj({"x": [2.0], "dx": np.array(2.0)}, {"x": 1}), "x"
        )
        s, t, w = sorted_triplet(*source.overlap(target, relative=True))
        # Each source cell contributes half of itself: 1.0 / 2.0.
        np.testing.assert_allclose(w, [0.5, 0.5])

    def test_locate_centroids(self):
        source = StructuredGrid1d(
            make_obj({"x": [0.5, 1.5, 2.5]}, {"x": 3}), "x"
        )
        target = StructuredGrid1d(
            make_obj({"x": [0.7, 2.9], "dx": np.array(0.2)}, {"x": 2}), "x"
        )
        s, t, w = sorted_triplet(*source.locate_centroids(target))
        np.testing.assert_array_equal(s, [0, 2])
        np.testing.assert_array_equal(t, [0, 1])
        np.testing.assert_allclose(w, 1.0)

    def test_linear_weights(self):
        source = StructuredGrid1d(
            make_obj({"x": [0.5, 1.5, 2.5]}, {"x": 3}), "x"
        )
        target = StructuredGrid1d(
            make_obj({"x": [1.0, 1.25], "dx": np.array(0.25)}, {"x": 2}), "x"
        )
        s, t, w = source.linear_weights(target)
        # Weights per target sum to one.
        sums = np.zeros(2)
        np.add.at(sums, t, w)
        np.testing.assert_allclose(sums, 1.0)
        # Target at x=1.0 is halfway between midpoints 0.5 and 1.5.
        w0 = w[t == 0]
        np.testing.assert_allclose(np.sort(w0), [0.5, 0.5])
        # Target at 1.25: 0.25/0.75 split between midpoints 0.5/1.5.
        w1 = w[t == 1]
        np.testing.assert_allclose(np.sort(w1), [0.25, 0.75])

    def test_linear_weights_decreasing(self):
        source = StructuredGrid1d(
            make_obj({"x": [2.5, 1.5, 0.5]}, {"x": 3}), "x"
        )
        target = StructuredGrid1d(
            make_obj({"x": [1.0], "dx": np.array(0.25)}, {"x": 1}), "x"
        )
        s, t, w = source.linear_weights(target)
        sums = np.zeros(1)
        np.add.at(sums, t, w)
        np.testing.assert_allclose(sums, 1.0)
        # Contributing sources are the (original, unflipped) indices of
        # midpoints 0.5 and 1.5 -> 2 and 1.
        assert set(s.tolist()) == {1, 2}


class TestStructuredGrid2d:
    def source(self):
        return StructuredGrid2d(
            make_obj(
                {"x": [0.5, 1.5], "y": [0.5, 1.5]}, {"y": 2, "x": 2}
            ),
            "x",
            "y",
        )

    def test_basic(self):
        grid = self.source()
        assert grid.ndim == 2
        assert grid.size == 4
        assert grid.shape == (2, 2)
        np.testing.assert_allclose(grid.area, np.ones((2, 2)))

    def test_overlap_product(self):
        source = self.source()
        # One target cell covering the full 2x2 source.
        target = StructuredGrid2d(
            make_obj(
                {
                    "x": np.array([1.0]),
                    "dx": np.array(2.0),
                    "y": np.array([1.0]),
                    "dy": np.array(2.0),
                },
                {"y": 1, "x": 1},
            ),
            "x",
            "y",
        )
        s, t, w = sorted_triplet(*source.overlap(target, relative=False))
        assert len(s) == 4
        np.testing.assert_allclose(w, 1.0)  # each source cell fully inside
        assert (t == 0).all()

    def test_locate_centroids(self):
        source = self.source()
        target = StructuredGrid2d(
            make_obj(
                {
                    "x": np.array([0.6]),
                    "dx": np.array(0.1),
                    "y": np.array([1.4]),
                    "dy": np.array(0.1),
                },
                {"y": 1, "x": 1},
            ),
            "x",
            "y",
        )
        s, t, w = source.locate_centroids(target)
        # (y=1.4, x=0.6) falls in source cell row 1, col 0 -> flat 2.
        np.testing.assert_array_equal(s, [2])
        np.testing.assert_array_equal(t, [0])

    def test_linear_weights_bilinear(self):
        source = self.source()
        target = StructuredGrid2d(
            make_obj(
                {
                    "x": np.array([0.75]),
                    "dx": np.array(0.1),
                    "y": np.array([0.75]),
                    "dy": np.array(0.1),
                },
                {"y": 1, "x": 1},
            ),
            "x",
            "y",
        )
        s, t, w = source.linear_weights(target)
        sums = np.zeros(1)
        np.add.at(sums, t, w)
        np.testing.assert_allclose(sums, 1.0)
        # Bilinear at (0.75, 0.75): weights 0.75*0.75, 0.75*0.25, ...
        np.testing.assert_allclose(
            np.sort(w), [0.0625, 0.1875, 0.1875, 0.5625]
        )


class TestStructuredGrid3d:
    def test_overlap_volume(self):
        coords = {
            "x": [0.5, 1.5],
            "y": [0.5, 1.5],
            "z": [0.5],
            "dz": np.array(1.0),
        }
        source = StructuredGrid3d(
            make_obj(coords, {"z": 1, "y": 2, "x": 2}), "x", "y", "z"
        )
        assert source.size == 4
        target = StructuredGrid3d(
            make_obj(
                {
                    "x": np.array([1.0]),
                    "dx": np.array(2.0),
                    "y": np.array([1.0]),
                    "dy": np.array(2.0),
                    "z": np.array([0.5]),
                    "dz": np.array(1.0),
                },
                {"z": 1, "y": 1, "x": 1},
            ),
            "x",
            "y",
            "z",
        )
        s, t, w = sorted_triplet(*source.overlap(target, relative=False))
        assert len(s) == 4
        np.testing.assert_allclose(w, 1.0)


class TestExplicitStructuredGrid3d:
    def explicit(self, zb):
        # 2x1 footprint, per-column explicit z-bounds.
        ds = Dataset()
        ds["dummy"] = DataArray(
            np.zeros((zb.shape[0], 1, 2)), dims=("z", "y", "x")
        )
        ds = ds.assign_coords(
            x=DataArray(np.array([0.5, 1.5]), dims=("x",)),
            y=DataArray(np.array([0.5]), dims=("y",)),
            dy=DataArray(np.array(1.0)),
            zbounds=DataArray(zb, dims=("z", "yx", "nb")),
        )
        from xugrid_tpu.regrid.structured import ExplicitStructuredGrid3d

        return ExplicitStructuredGrid3d(ds, "x", "y", "z")

    def voxel_target(self, z_mid, dz):
        return StructuredGrid3d(
            make_obj(
                {
                    "x": np.array([1.0]),
                    "dx": np.array(2.0),
                    "y": np.array([0.5]),
                    "dy": np.array(1.0),
                    "z": np.asarray(z_mid),
                    "dz": np.asarray(dz),
                },
                {"z": len(np.atleast_1d(z_mid)), "y": 1, "x": 1},
            ),
            "x",
            "y",
            "z",
        )

    def test_shape_and_area(self):
        zb = np.array(
            [[[0.0, 1.0], [0.0, 1.0]], [[1.0, 2.0], [1.0, 2.0]]]
        )  # (nlayer=2, n_yx=2, 2)
        grid = self.explicit(zb)
        assert grid.shape == (2, 1, 2)
        assert grid.size == 4
        np.testing.assert_allclose(grid.area, 1.0)

    def test_overlap_with_voxel(self):
        zb = np.array(
            [[[0.0, 1.0], [0.0, 1.0]], [[1.0, 2.0], [1.0, 2.0]]]
        )
        grid = self.explicit(zb)
        target = self.voxel_target([1.0], 2.0)  # z spans [0, 2]
        s, t, w = sorted_triplet(*grid.overlap(target, relative=False))
        # All four source cells fully inside the single target voxel.
        assert len(s) == 4
        np.testing.assert_allclose(w, 1.0)
        assert (t == 0).all()

    def test_partial_z_overlap(self):
        zb = np.array(
            [[[0.0, 1.0], [0.0, 1.0]], [[1.0, 2.0], [1.0, 2.0]]]
        )
        grid = self.explicit(zb)
        target = self.voxel_target([1.0], 1.0)  # z spans [0.5, 1.5]
        s, t, w = sorted_triplet(*grid.overlap(target, relative=False))
        # Each layer contributes half its thickness per column.
        assert len(s) == 4
        np.testing.assert_allclose(w, 0.5)

    def test_sloped_columns(self):
        # Column 1's layers sit deeper: only its top layer overlaps.
        zb = np.array(
            [[[0.0, 1.0], [-10.0, -9.0]], [[1.0, 2.0], [-9.0, -8.0]]]
        )
        grid = self.explicit(zb)
        target = self.voxel_target([1.0], 2.0)  # z [0, 2]
        s, t, w = sorted_triplet(*grid.overlap(target, relative=False))
        # Only the two layers of column 0 land in the voxel.
        assert len(s) == 2
        np.testing.assert_allclose(w, 1.0)

    def test_bad_zbounds_shape(self):
        from xugrid_tpu.regrid.structured import ExplicitStructuredGrid3d

        ds = Dataset()
        ds["dummy"] = DataArray(np.zeros((1, 1, 2)), dims=("z", "y", "x"))
        ds = ds.assign_coords(
            x=DataArray(np.array([0.5, 1.5]), dims=("x",)),
            y=DataArray(np.array([0.5]), dims=("y",)),
            dy=DataArray(np.array(1.0)),
            zbounds=DataArray(np.zeros((2, 2)), dims=("zb", "nb")),
        )
        with pytest.raises(ValueError, match="nlayer, n_yx, 2"):
            ExplicitStructuredGrid3d(ds, "x", "y", "z")
