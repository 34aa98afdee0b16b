"""Smoke tests for the visualization suite (C20-C22): every entry point
renders PNG files without error on synthetic sweep results."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from genome_assembly_tpu.core.config import METRIC_NAMES
from genome_assembly_tpu import plots


def _fake_results():
    rng = np.random.default_rng(0)
    results = []
    for p in [0.001, 0.01]:
        for k in [5, 10]:
            for n, l in [(100, 50), (200, 100)]:
                row = {"num_reads": n, "read_length": l, "error_prob": p,
                       "k": k, "expected_coverage": n * l / 5386}
                for m in METRIC_NAMES:
                    vals = rng.uniform(0, 10, 3)
                    row[f"{m} avg"] = float(vals.mean())
                    row[f"{m} std"] = float(vals.std())
                    row[f"{m} raw"] = [float(v) for v in vals]
                results.append(row)
    return results


def test_iteration_plots(tmp_path):
    cov = np.array([0, 1, 2, 2, 1, 0, 0, 3])
    plots.plot_genome_coverage(cov, 8, "t", 1, str(tmp_path))
    plots.plot_genome_depth(cov, 1.5, 8, "t", 1, str(tmp_path))
    assert (tmp_path / "genome_coverage_iteration_1.png").exists()
    assert (tmp_path / "genome_depth_iteration_1.png").exists()


def test_plot_by_other_values(tmp_path):
    plots.plot_experiment_results_by_other_values(
        _fake_results(), x_key="num_reads", path=str(tmp_path),
        num_iterations=3, separator=150, other_value_key="error_prob")
    pngs = list(tmp_path.rglob("*.png"))
    assert len(pngs) >= 4  # combined + per-group, raw/non-raw, split sets
    assert any("combined" in p.name for p in pngs)


def test_plot_const_coverage(tmp_path):
    plots.plot_const_coverage_results(
        _fake_results(), coverage_target=2.0, x_axis_var="l",
        path=str(tmp_path), num_iterations=3, grouping_value="k")
    pngs = list(tmp_path.rglob("*.png"))
    assert any("ordered_by_l" in p.name for p in pngs)
    # 2 combined (raw/plain) + 2 per group value x 2 groups; the N-ordered
    # and l-ordered passes share filenames (reference quirk: the filename
    # uses x_axis_var, plots.py:610), so 6 distinct files
    assert len(pngs) >= 6


def test_plot_coverage_comparison(tmp_path):
    all_results = {0.9: _fake_results()[:4], 2: _fake_results()[4:]}
    plots.plot_coverage_comparison(all_results, 5386, path=str(tmp_path))
    assert (tmp_path / "coverage_comparison_const_p.png").exists()
    assert (tmp_path / "coverage_comparison_trend.png").exists()


def test_plot_two_values(tmp_path):
    plots.plot_experiment_results_by_two_values(
        _fake_results(), path=str(tmp_path), num_iterations=3)
    assert (tmp_path / "num_reads_by_two_values_p_k.png").exists()


def test_helpers():
    assert plots.check_x_values_boundaries([1, 2], 10, None) == \
        "(all values lower than 10) "
    assert plots.check_x_values_boundaries([100, 200], 10, 50) == \
        "(all values higher than 50) "
    assert plots.check_x_values_boundaries([20, 30], 10, 50) == ""
