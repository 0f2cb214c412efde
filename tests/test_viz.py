"""Chart library: figures render and save without errors."""

import numpy as np
import pytest

from gcn_maxcut_tpu.viz import (
    HAS_MATPLOTLIB,
    bar_plot_3,
    bar_plot_2,
    bar_plot_speedup,
    create_line_graph,
    create_test_visualizations,
    plot_loss_history,
)

pytestmark = pytest.mark.skipif(not HAS_MATPLOTLIB, reason="matplotlib missing")


def test_bar_plot_3_with_annotations(tmp_path):
    fig = bar_plot_3(
        ["n=50", "n=100"],
        {"Solver": [100, 200], "Randomized": [80, 150], "GCN": [95, 190]},
        annotate_percent_of="Solver",
        save_path=str(tmp_path / "b3.png"),
    )
    assert (tmp_path / "b3.png").exists()


def test_bar_plot_2_and_speedup(tmp_path):
    bar_plot_2(["a", "b"], [1, 2], [3, 4], labels=("x", "y"))
    fig = bar_plot_speedup(
        ["n=50"], {"Solver": [3.0], "GCN": [0.4]}, save_path=str(tmp_path / "sp.png")
    )
    assert (tmp_path / "sp.png").exists()


def test_line_graph_pct_of_optimum(tmp_path):
    fig = create_line_graph(
        [50, 100], {"GCN": [90, 180]}, optimum=[100, 200],
        save_path=str(tmp_path / "line.png"),
    )
    assert (tmp_path / "line.png").exists()


def test_panel_and_loss_history(tmp_path):
    results = [
        {"improvement_percent": 5.0},
        {"improvement_percent": -1.0},
    ]
    by_size = {
        50: {
            "simple": {"cut_values": [10, 12], "times": [0.1, 0.2]},
            "post_processed": {"cut_values": [11, 13], "times": [0.3, 0.4]},
        }
    }
    fig = create_test_visualizations(
        results, by_size, [50], save_path=str(tmp_path / "panel.png")
    )
    assert (tmp_path / "panel.png").exists()
    plot_loss_history([-10, -50, -100], save_path=str(tmp_path / "loss.png"))
    assert (tmp_path / "loss.png").exists()
