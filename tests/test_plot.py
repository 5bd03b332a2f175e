"""Smoke tests for utils/plot.py — render both plots for a star graph to an
Agg canvas (the reference plots via networkx+matplotlib, plot_utils.py:6-80;
these assert ours actually draw: artists exist and the figure rasterizes)."""

import matplotlib

matplotlib.use("Agg", force=True)

import matplotlib.pyplot as plt
import numpy as np

from geometric_message_passing_tpu import datasets as ds
from geometric_message_passing_tpu.utils.plot import plot_2d, plot_3d


def _star():
    return ds.create_star_graphs(num=2, fold=[5], dim=3, target="max")[0]


def test_plot_2d_renders_star():
    g = _star()
    ax = plot_2d(g, lim=1.2)
    # one line per edge + the scatter + one annotation per node
    assert len(ax.lines) == g.edge_index.shape[1]
    assert len(ax.collections) == 1
    assert len(ax.texts) == len(np.asarray(g.atoms))
    ax.figure.canvas.draw()  # rasterize
    plt.close(ax.figure)


def test_plot_3d_renders_star():
    g = _star()
    ax = plot_3d(g, lim=1.2)
    assert ax.name == "3d"
    assert len(ax.lines) == g.edge_index.shape[1]
    assert len(ax.collections) == 1
    ax.figure.canvas.draw()
    plt.close(ax.figure)


def test_plot_2d_reuses_given_axis():
    g = _star()
    _, ax_in = plt.subplots()
    ax_out = plot_2d(g, ax=ax_in)
    assert ax_out is ax_in
    plt.close(ax_in.figure)
