"""End-to-end pipeline tests: full test_assembly runs compared against a
complete reference replica (networkx graph + oracle aligners + loop-level
metrics), plus PhiX smoke runs."""

import os
import random

import networkx as nx
import numpy as np
import pytest

from genome_assembly_tpu.experiments.runner import run_for_params
from genome_assembly_tpu.experiments.runner import test_assembly as run_assembly
from genome_assembly_tpu.simulate import read_genome_from_fasta

from test_graph_parity import _reference_pipeline
from test_metrics import _ref_measures

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "phix174.fasta")


@pytest.mark.parametrize("seed,n,l,p,k", [
    (0, 50, 20, 0.0, 5),
    (1, 60, 25, 0.05, 4),
    (2, 80, 15, 0.01, 0),
])
def test_full_pipeline_parity(seed, n, l, p, k):
    r = random.Random(seed)
    genome = "".join(r.choice("ACGT") for _ in range(400))
    contigs, measures, details, reads = run_assembly(
        genome, l, n, p, k, "exp", 1, "plots",
        rng=random.Random(seed + 100), np_rng=np.random.RandomState(seed + 200))
    # replay the same reads through the reference replica
    ref_contigs = _reference_pipeline(reads, k)
    assert contigs == ref_contigs
    ref_measures, _ = _ref_measures(contigs, genome, l)
    assert measures == ref_measures


def test_phix_smoke():
    genome = read_genome_from_fasta(DATA)
    assert len(genome) == 5386
    contigs, measures, details, reads = run_assembly(
        genome, 100, 120, 0.01, 5, "phix_smoke", 1, "plots",
        rng=random.Random(0), np_rng=np.random.RandomState(0))
    assert measures["Number of Contigs"] == len(contigs)
    assert 0 < measures["Genome Coverage"] <= 1.0
    assert measures["N50"] >= 50
    # contigs must reassemble read content
    assert all(len(c) >= 1 for c in contigs)


def test_run_for_params_aggregation():
    r = random.Random(42)
    genome = "".join(r.choice("ACGT") for _ in range(300))
    params = {
        "num_reads": 30, "read_length": 20, "error_prob": 0.0, "k": 5,
        "reference_genome": genome, "expected_coverage": 2.0,
        "experiment_name": "agg", "num_iterations": 3, "contigs": None,
    }
    out = run_for_params(params, rng=random.Random(1),
                         np_rng=np.random.RandomState(1))
    assert "N50 avg" in out and "N50 std" in out and "N50 raw" in out
    assert len(out["N50 raw"]) == 3
    assert out["Number of Contigs avg"] == np.mean(out["Number of Contigs raw"])
