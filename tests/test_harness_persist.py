"""Persistence round-trip + experiment-harness tests (SURVEY.md §4 item c:
full-pipeline golden tests against the reference CSV schema)."""

import os

import numpy as np
import pytest

from genome_assembly_tpu.core.config import METRIC_NAMES
from genome_assembly_tpu.experiments.harness import (
    default_grids,
    experiment_const_coverage,
    filter_results,
)
from genome_assembly_tpu.experiments.runner import run_for_params
from genome_assembly_tpu.persist import (
    create_paths,
    load_and_clean_results,
    parse_list_with_numpy,
    save_results,
)

TOY_GENOME = "ATGCGTACGTTAGCACGTGTTCGATAGCATGCGTACGTTAGCACGTGT" * 4


def test_create_paths_returns_joined_and_makes_parent(tmp_path):
    out = create_paths([(str(tmp_path / "results"), "exp/sub")])
    assert out == [str(tmp_path / "results" / "exp" / "sub")]
    assert (tmp_path / "results" / "exp").is_dir()


def test_parse_list_with_numpy_legacy_reprs():
    assert parse_list_with_numpy("[np.int64(3), np.int64(4)]",
                                 "N50 raw") == [3, 4]
    assert parse_list_with_numpy("[np.float64(0.5)]",
                                 "Genome Coverage raw") == [0.5]
    assert parse_list_with_numpy("7", "N50 raw") == 7


def test_save_and_reload_round_trip(tmp_path):
    results = [{
        "num_reads": 10, "read_length": 5, "error_prob": 0.01, "k": 3,
        "expected_coverage": 0.26,
        "N50 avg": 5.0, "N50 std": 0.0,
        "N50 raw": [np.int64(5), np.int64(5)],
        "Genome Coverage avg": 0.5, "Genome Coverage std": 0.1,
        "Genome Coverage raw": [np.float64(0.4), np.float64(0.6)],
    }]
    save_results(results, "exp", path=str(tmp_path))
    assert (tmp_path / "results.csv").exists()
    assert (tmp_path / "summary.csv").exists()

    loaded = load_and_clean_results(str(tmp_path))
    assert loaded is not None and len(loaded) == 1
    row = loaded[0]
    assert row["N50 raw"] == [5, 5]
    assert row["Genome Coverage raw"] == [0.4, 0.6]
    assert row["num_reads"] == 10

    # summary keeps only avg + identifying columns
    import pandas as pd

    summary = pd.read_csv(tmp_path / "summary.csv")
    assert "N50 avg" in summary.columns
    assert "N50 std" not in summary.columns
    assert "num_reads" in summary.columns


def test_filter_results_iterable_and_scalar():
    rs = [{"k": 5}, {"k": 10}, {"k": 5}]
    assert filter_results(rs, "k", 5) == [{"k": 5}, {"k": 5}]
    out = filter_results(rs, "k", [10, 5])
    assert out[0]["k"] == 10 and len(out) == 3


def test_default_grids_match_reference_values():
    # verified-by-execution reference grids (SURVEY.md §2.2 C26-C28)
    c, n, l, p, k = default_grids(5386)
    assert c == [0.928, 2, 5, 10, 30]
    assert list(n) == [100, 316, 1000, 3162, 10000]
    assert list(l) == [50, 100, 150]
    assert np.allclose(p, [0.001, 0.01, 0.1])
    assert list(k) == [5, 10, 15]


def test_run_for_params_aggregates_avg_std_raw(tmp_path):
    params = {
        "num_reads": 12, "read_length": 8, "error_prob": 0.0, "k": 0,
        "reference_genome": TOY_GENOME, "expected_coverage": 0.5,
        "experiment_name": "agg", "num_iterations": 2, "contigs": None,
    }
    out = run_for_params(params, path=str(tmp_path), device=False,
                         use_native=False)
    for metric in METRIC_NAMES:
        assert f"{metric} avg" in out
        assert f"{metric} std" in out
        assert isinstance(out[f"{metric} raw"], list)
        assert len(out[f"{metric} raw"]) == 2


def test_experiment_const_coverage_end_to_end(tmp_path):
    results = experiment_const_coverage(
        TOY_GENOME, 0.5, error_probs=[0.0], k_values=[3],
        l_values=[8, 12], x_axis_var="l", experiment_name="cc",
        paths=[str(tmp_path / "csv"), str(tmp_path / "plots")],
        num_iterations=2, return_results=True, make_plots=False,
        device=False, use_native=False)
    assert len(results) == 2  # one per l value
    # derived N = ceil(C*G/l)
    g = len(TOY_GENOME)
    assert results[0]["num_reads"] == int(np.ceil(0.5 * g / 8))
    assert os.path.exists(tmp_path / "csv" / "results.csv")
    loaded = load_and_clean_results(str(tmp_path / "csv"))
    assert len(loaded) == 2
    assert loaded[0]["N50 raw"] is not None
