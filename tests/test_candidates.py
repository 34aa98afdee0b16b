"""Device k-mer sort-join candidate generation vs the host dict join.

The device path (graph/candidates.py) must reproduce the reference's
candidate enumeration order exactly (overlapGraphs.py:30-53): (ua, ub)
sorted by source read, then by target read within each suffix→prefix
match group, self-pairs excluded.
"""

import random

import numpy as np
import pytest

from conftest import random_dna

from genome_assembly_tpu.graph.build import (
    build_overlap_graph,
    candidate_pairs,
    candidate_pairs_arrays,
    dedup_reads,
)
from genome_assembly_tpu.graph.candidates import (
    candidate_pairs_dense,
    candidate_pairs_device,
    candidate_pairs_numpy,
)


def _expected(unique, k):
    pairs = candidate_pairs(unique, k)
    return ([p[0] for p in pairs], [p[1] for p in pairs])


@pytest.mark.parametrize("k", [1, 3, 5, 10, 15])
def test_device_join_matches_host_dict(rng, k):
    reads = [random_dna(rng, rng.randint(8, 40)) for _ in range(120)]
    # force shared prefixes/suffixes so groups have >1 member
    reads += [("ACGT" * 12)[:rng.randint(10, 30)] for _ in range(40)]
    unique, _ = dedup_reads(reads)
    ia, ib = candidate_pairs_device(unique, k)
    ea, eb = _expected(unique, k)
    assert ia.tolist() == ea
    assert ib.tolist() == eb


def test_device_join_short_reads_whole_read_key(rng):
    # reads shorter than k use the whole read as both prefix and suffix
    # (overlapGraphs.py:33-47): a length-m string only matches length-m keys
    reads = ["ACG", "ACG" + "T" * 10, "AC", "ACGT", "A", "ACGTA", "CG"]
    unique, _ = dedup_reads(reads)
    for k in (2, 4, 6):
        ia, ib = candidate_pairs_device(unique, k)
        ea, eb = _expected(unique, k)
        assert ia.tolist() == ea, f"k={k}"
        assert ib.tolist() == eb, f"k={k}"


@pytest.mark.parametrize("k", [1, 3, 5, 15, 20, 31])
def test_numpy_join_matches_host_dict(rng, k):
    reads = [random_dna(rng, rng.randint(8, 40)) for _ in range(120)]
    reads += [("ACGT" * 12)[:rng.randint(10, 30)] for _ in range(40)]
    unique, _ = dedup_reads(reads)
    ia, ib = candidate_pairs_numpy(unique, k)
    ea, eb = _expected(unique, k)
    assert ia.tolist() == ea
    assert ib.tolist() == eb


def test_numpy_join_short_reads_whole_read_key():
    reads = ["ACG", "ACG" + "T" * 10, "AC", "ACGT", "A", "ACGTA", "CG"]
    unique, _ = dedup_reads(reads)
    for k in (2, 4, 6, 31):
        ia, ib = candidate_pairs_numpy(unique, k)
        ea, eb = _expected(unique, k)
        assert ia.tolist() == ea, f"k={k}"
        assert ib.tolist() == eb, f"k={k}"


def test_size_aware_dispatch_policy(monkeypatch):
    # host engines below the thresholds even with an accelerator attached,
    # device above (VERDICT round 4, next-step #1)
    from genome_assembly_tpu.core import dispatch

    monkeypatch.setattr(dispatch, "accelerator_attached", lambda: True)
    monkeypatch.setattr(dispatch, "_native_available", lambda: True)
    assert not dispatch.use_device_join(100)
    assert dispatch.use_device_join(dispatch.min_device_join())
    assert dispatch.use_host_pair_scoring(100)
    assert not dispatch.use_host_pair_scoring(dispatch.min_device_pairs())
    assert dispatch.use_host_metrics(100)
    assert not dispatch.use_host_metrics(dispatch.min_device_cells())
    # CPU backend: host engines at every size (no round trip to dodge,
    # and the XLA:CPU kernels are the slow path)
    monkeypatch.setattr(dispatch, "accelerator_attached", lambda: False)
    assert not dispatch.use_device_join(10**9)
    assert dispatch.use_host_pair_scoring(10**9)
    assert dispatch.use_host_metrics(10**12)
    # without the native library the host scorers are unavailable
    monkeypatch.setattr(dispatch, "_native_available", lambda: False)
    assert not dispatch.use_host_pair_scoring(100)
    assert not dispatch.use_host_metrics(100)


def test_threshold_env_overrides(monkeypatch):
    from genome_assembly_tpu.core import dispatch

    monkeypatch.setenv("GA_TPU_MIN_DEVICE_PAIRS", "0")
    monkeypatch.setenv("GA_TPU_MIN_DEVICE_JOIN", "1")
    monkeypatch.setenv("GA_TPU_MIN_DEVICE_CELLS", "1e12")
    assert dispatch.min_device_pairs() == 0
    assert dispatch.min_device_join() == 1
    assert dispatch.min_device_cells() == 10**12


def test_dense_pairs_rowmajor():
    ia, ib = candidate_pairs_dense(4)
    expected = [(a, b) for a in range(4) for b in range(4) if a != b]
    assert list(zip(ia.tolist(), ib.tolist())) == expected


def test_candidate_pairs_arrays_dispatch(rng):
    reads = [random_dna(rng, 20) for _ in range(60)]
    unique, _ = dedup_reads(reads)
    for k in (0, 5, 20):
        ia, ib = candidate_pairs_arrays(unique, k)
        ea, eb = _expected(unique, k)
        assert ia.tolist() == ea, f"k={k}"
        assert ib.tolist() == eb, f"k={k}"


def test_builder_with_device_candidates_matches_host(rng):
    # full graph build parity: device candidates + vectorized fanout vs the
    # host dict path, with duplicate reads exercising the copy fanout
    reads = [random_dna(rng, rng.randint(10, 25)) for _ in range(50)]
    reads = reads + reads[:7]  # duplicates -> multi-copy nodes
    g_dev = build_overlap_graph(reads, k=3, device=True)
    g_host = build_overlap_graph(reads, k=3, device=False)
    np.testing.assert_array_equal(g_dev.src, g_host.src)
    np.testing.assert_array_equal(g_dev.dst, g_host.dst)
    np.testing.assert_array_equal(g_dev.weight, g_host.weight)
    np.testing.assert_array_equal(g_dev.end_pos, g_host.end_pos)


def test_dense_route_matches_native_scorer(rng, monkeypatch):
    """The accelerator dense route (score ALL U^2 pairs on the all-pairs
    kernel, gather requested entries) must be bit-identical to the
    chunked/native scorers on the same sparse candidate set."""
    from genome_assembly_tpu.core import dispatch
    from genome_assembly_tpu.graph import build as build_mod

    reads = [random_dna(rng, rng.randint(15, 30)) for _ in range(60)]
    unique, _ = dedup_reads(reads)
    ia, ib = candidate_pairs_arrays(unique, 3)
    if len(ia) == 0:
        ia, ib = candidate_pairs_arrays(unique, 1)
    # baseline: host/oracle-free chunked XLA path (no native, no accel)
    monkeypatch.setattr(dispatch, "accelerator_attached", lambda: False)
    monkeypatch.setattr(dispatch, "_native_available", lambda: False)
    s0, e0 = build_mod.score_pairs(unique, (ia, ib))
    # force the dense route: pretend an accelerator is attached (the
    # all-pairs kernel runs its XLA twin on CPU — same results)
    monkeypatch.setattr(dispatch, "accelerator_attached", lambda: True)
    s1, e1 = build_mod.score_pairs(unique, (ia, ib))
    np.testing.assert_array_equal(s1, s0)
    np.testing.assert_array_equal(e1, e0)
