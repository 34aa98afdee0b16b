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
