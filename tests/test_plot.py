"""Plotting: artists and facet grids (reference: xugrid/plot/plot.py)."""

import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")
mpl.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import xugrid_tpu as xu  # noqa: E402
import importlib  # noqa: E402
xplot = importlib.import_module("xugrid_tpu.plot.plot")  # noqa: E402
from xugrid_tpu.xdata import DataArray  # noqa: E402


@pytest.fixture
def grid():
    # 3x3 quad grid
    nx = ny = 3
    x = np.arange(nx + 1.0)
    y = np.arange(ny + 1.0)
    yy, xx = np.meshgrid(y, x, indexing="ij")
    verts = np.column_stack([xx.ravel(), yy.ravel()])
    j, i = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    nid = lambda ii, jj: jj * (nx + 1) + ii  # noqa: E731
    faces = np.stack(
        [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)], axis=-1
    ).reshape(-1, 4)
    return xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces)


@pytest.fixture
def face_uda(grid):
    values = np.arange(grid.n_face, dtype=float)
    return xu.UgridDataArray(
        DataArray(values, dims=(grid.face_dimension,), name="z"), grid
    )


@pytest.fixture
def node_uda(grid):
    values = grid.node_coordinates.sum(axis=1)
    return xu.UgridDataArray(
        DataArray(values, dims=(grid.node_dimension,), name="z"), grid
    )


def teardown_function(function):
    plt.close("all")


def test_pcolormesh(face_uda):
    artist = face_uda.ugrid.plot.pcolormesh(add_colorbar=True)
    assert len(artist.get_paths()) == 9
    np.testing.assert_allclose(
        artist.get_array(), np.arange(9, dtype=float)
    )


def test_plot_dispatch(face_uda, node_uda, grid):
    from matplotlib.collections import LineCollection, PolyCollection

    assert isinstance(face_uda.ugrid.plot(), PolyCollection)
    assert node_uda.ugrid.plot() is not None  # tripcolor artist
    edge_vals = np.arange(grid.n_edge, dtype=float)
    edge_uda = xu.UgridDataArray(
        DataArray(edge_vals, dims=(grid.edge_dimension,)), grid
    )
    assert isinstance(edge_uda.ugrid.plot(), LineCollection)


def test_line_contour_imshow(face_uda, node_uda, grid):
    xu.plot.line(grid)
    node_uda.ugrid.plot.contour()
    node_uda.ugrid.plot.contourf()
    face_uda.ugrid.plot.contourf()  # centroid triangulation path
    artist = face_uda.ugrid.plot.imshow(resolution=0.5)
    assert artist.get_array().shape == (6, 6)


def test_facetgrid_col(grid):
    values = np.stack(
        [np.arange(grid.n_face, dtype=float) + 10 * k for k in range(4)]
    )
    uda = xu.UgridDataArray(
        DataArray(values, dims=("time", grid.face_dimension)), grid
    )
    fg = uda.ugrid.plot.pcolormesh(col="time")
    assert fg.axes.shape == (1, 4)
    # shared color scale across panels
    for ax in fg.axes.ravel():
        coll = ax.collections[0]
        assert coll.get_clim() == (0.0, 38.0)
    assert fg.axes[0, 2].get_title() == "time = 2"

    fg2 = uda.ugrid.plot.pcolormesh(col="time", col_wrap=3)
    assert fg2.axes.shape == (2, 3)
    # ragged tail panel hidden
    assert not fg2.axes[1, 1].get_visible()


def test_facetgrid_row_and_col(grid):
    values = np.arange(2 * 3 * grid.n_face, dtype=float).reshape(
        2, 3, grid.n_face
    )
    uda = xu.UgridDataArray(
        DataArray(values, dims=("layer", "time", grid.face_dimension)), grid
    )
    fg = uda.ugrid.plot.pcolormesh(row="layer", col="time")
    assert fg.axes.shape == (2, 3)
    assert "layer = 1" in fg.axes[1, 0].get_title()


def test_facetgrid_requires_dims(face_uda):
    with pytest.raises(ValueError, match="not in data dims"):
        face_uda.ugrid.plot.pcolormesh(col="time")


def test_facetgrid_coordinate_labels(grid):
    values = np.zeros((2, grid.n_face))
    uda = xu.UgridDataArray(
        DataArray(
            values,
            dims=("time", grid.face_dimension),
            coords={"time": np.array([10.0, 20.0])},
        ),
        grid,
    )
    fg = uda.ugrid.plot.pcolormesh(col="time")
    assert fg.axes[0, 1].get_title() == "time = 20.0"


@pytest.fixture
def edge_uda(grid):
    values = np.arange(grid.n_edge, dtype=float)
    return xu.UgridDataArray(
        DataArray(values, dims=(grid.edge_dimension,), name="z"), grid
    )


def test_tripcolor(node_uda):
    from matplotlib.collections import Collection

    artist = node_uda.ugrid.plot.tripcolor()
    assert isinstance(artist, Collection)


def test_scatter(face_uda, node_uda):
    from matplotlib.collections import PathCollection

    assert isinstance(face_uda.ugrid.plot.scatter(), PathCollection)
    assert isinstance(node_uda.ugrid.plot.scatter(), PathCollection)


def test_surface(face_uda, node_uda):
    from mpl_toolkits.mplot3d.art3d 	import Poly3DCollection

    artist = node_uda.ugrid.plot.surface()
    assert isinstance(artist, Poly3DCollection)
    artist = face_uda.ugrid.plot.surface()
    assert isinstance(artist, Poly3DCollection)


def test_edge_data_plots_as_line(edge_uda):
    from matplotlib.collections import LineCollection

    artist = edge_uda.ugrid.plot()
    assert isinstance(artist, LineCollection)
    # Edge data colors the segments.
    assert artist.get_array() is not None
    assert len(np.asarray(artist.get_array())) == edge_uda.grid.n_edge


def test_contourf(face_uda, node_uda):
    from matplotlib.contour import ContourSet

    assert isinstance(node_uda.ugrid.plot.contourf(), ContourSet)
    assert isinstance(face_uda.ugrid.plot.contourf(), ContourSet)


def test_cmap_params_robust_and_center(face_uda):
    # robust: limits from the 2-98 percentile range.
    values = np.asarray(face_uda.values)
    artist = face_uda.ugrid.plot(robust=True)
    lo, hi = artist.get_clim()
    assert lo == pytest.approx(np.percentile(values, 2))
    assert hi == pytest.approx(np.percentile(values, 98))

    # data straddling zero: symmetric limits + diverging default cmap.
    signed = face_uda - float(values.mean())
    artist = signed.ugrid.plot()
    lo, hi = artist.get_clim()
    assert lo == pytest.approx(-hi)
    assert artist.get_cmap().name == "RdBu_r"

    # explicit norm is passed through.
    import matplotlib.colors

    norm = matplotlib.colors.LogNorm(vmin=1.0, vmax=8.0)
    artist = (face_uda + 1.0).ugrid.plot(norm=norm)
    assert artist.norm is norm


def test_colorbar(face_uda):
    fig, ax = plt.subplots()
    face_uda.ugrid.plot(ax=ax, add_colorbar=True)
    assert len(fig.axes) == 2  # main + colorbar


def test_grid_plot(grid):
    from matplotlib.collections import LineCollection

    artist = grid.plot()
    assert isinstance(artist, LineCollection)


def test_kwargs_passthrough(face_uda):
    artist = face_uda.ugrid.plot(cmap="viridis", vmin=0.0, vmax=4.0)
    assert artist.get_clim() == (0.0, 4.0)


class TestCmapDepth:
    """Discrete levels / extend / figure sizing (reference plot/utils.py
    _determine_cmap_params + get_axis parity)."""

    def _grid_and_values(self):
        nx = ny = 3
        x = np.arange(nx + 1.0)
        y = np.arange(ny + 1.0)
        yy, xx = np.meshgrid(y, x, indexing="ij")
        verts = np.column_stack([xx.ravel(), yy.ravel()])
        j, i = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        nid = lambda ii, jj: jj * (nx + 1) + ii  # noqa: E731
        faces = np.stack(
            [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)],
            axis=-1,
        ).reshape(-1, 4)
        grid = xu.Ugrid2d(verts[:, 0], verts[:, 1], -1, faces)
        values = np.linspace(0.0, 10.0, grid.n_face)
        return grid, values

    def test_levels_int_builds_boundarynorm(self):
        import matplotlib.colors as mcolors

        grid, values = self._grid_and_values()
        artist = xplot.pcolormesh(grid, values, levels=5)
        assert isinstance(artist.norm, mcolors.BoundaryNorm)
        assert isinstance(artist.cmap, mcolors.ListedColormap)
        assert artist.cmap.N == len(artist.norm.boundaries) - 1

    def test_levels_list_and_extend_colors(self):
        import matplotlib.colors as mcolors

        grid, values = self._grid_and_values()
        # levels inside the data range -> extend="both" inferred, with
        # distinct under/over colors carved from the colormap ends
        artist = xplot.pcolormesh(grid, values, levels=[2.0, 4.0, 6.0])
        assert isinstance(artist.norm, mcolors.BoundaryNorm)
        cmap = artist.cmap
        assert cmap.N == 2
        under = np.asarray(cmap.get_under())
        over = np.asarray(cmap.get_over())
        assert not np.allclose(under, over)

    def test_extend_inference_vminmax(self):
        grid, values = self._grid_and_values()
        _, cbar_kw = xplot._cmap_params(values, {"vmin": 2.0, "vmax": 8.0})
        assert cbar_kw == {"extend": "both"}
        _, cbar_kw = xplot._cmap_params(values, {"vmin": -1.0})
        assert cbar_kw == {}

    def test_contourf_levels_passthrough(self):
        grid, values = self._grid_and_values()
        node_values = np.linspace(0.0, 1.0, grid.n_node)
        artist = xplot.contourf(
            grid, node_values, levels=[0.2, 0.5, 0.8]
        )
        np.testing.assert_allclose(artist.levels, [0.2, 0.5, 0.8])

    def test_figsize_and_size_aspect(self):
        import matplotlib.pyplot as plt

        grid, values = self._grid_and_values()
        artist = xplot.pcolormesh(grid, values, figsize=(5.0, 3.0))
        fig = artist.axes.figure
        np.testing.assert_allclose(fig.get_size_inches(), [5.0, 3.0])
        plt.close(fig)
        artist = xplot.pcolormesh(grid, values, size=4.0, aspect=2.0)
        fig = artist.axes.figure
        np.testing.assert_allclose(fig.get_size_inches(), [8.0, 4.0])
        plt.close(fig)

    def test_sizing_conflicts_raise(self):
        import matplotlib.pyplot as plt

        grid, values = self._grid_and_values()
        fig, ax = plt.subplots()
        with pytest.raises(ValueError, match="figsize"):
            xplot.pcolormesh(grid, values, ax=ax, figsize=(3, 3))
        with pytest.raises(ValueError, match="aspect"):
            xplot.pcolormesh(grid, values, aspect=2.0)
        plt.close(fig)
