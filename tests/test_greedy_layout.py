"""Fast non-parity layout mode (graph/greedy.py; VERDICT round 3, weak #2):
greedy best-overlap chaining replacing the cycle-removal/topo/walk stack."""

import random

import numpy as np
import pytest

from genome_assembly_tpu.graph.greedy import (
    assemble_contigs_greedy,
    greedy_chain_python,
)
from genome_assembly_tpu.models.overlap_graph import (
    assemble_contigs_using_overlap_graphs,
)
from genome_assembly_tpu.native import graphcore


def random_dna(r, length):
    return "".join(r.choice("ACGT") for _ in range(length))


def test_accept_loop_invariants_and_native_parity():
    """Accepted edges must form simple chains (out/in degree <= 1, no
    cycles), and the C++ accept loop must match the Python one exactly."""
    rng = np.random.default_rng(13)
    for _ in range(25):
        n = int(rng.integers(4, 300))
        e = int(rng.integers(1, 5 * n))
        src = rng.integers(0, n, e).astype(np.int32)
        dst = rng.integers(0, n, e).astype(np.int32)
        scores = rng.integers(-10, 100, e)
        order = np.argsort(-scores, kind="stable")
        succ, chain_edge = greedy_chain_python(n, src, dst, order)
        # degree <= 1 holds by construction of succ; check acyclicity by
        # walking every chain with a step budget
        valid = succ >= 0
        if valid.any():
            # in-degree <= 1: successor targets are unique
            tgt = succ[valid]
            assert len(np.unique(tgt)) == len(tgt)
        for start in range(n):
            node, steps = start, 0
            while succ[node] >= 0:
                node = int(succ[node])
                steps += 1
                assert steps <= n, "cycle in accepted chain"
        if graphcore.available():
            s2, c2 = graphcore.greedy_chain(n, src, dst, order)
            np.testing.assert_array_equal(succ, s2)
            np.testing.assert_array_equal(chain_edge, c2)


def test_greedy_matches_exact_on_unambiguous_chain():
    """Reads tiling a genome in one unambiguous successor chain: the fast
    layout must produce the same single contig as the exact pipeline (the
    chain has one candidate edge per node, so both layouts accept exactly
    those edges; the merged string is then determined by the shared
    (score, end_pos) edges)."""
    r = random.Random(3)
    genome = random_dna(r, 600)
    k, l = 5, 50
    step = l - k
    reads = [genome[i:i + l] for i in range(0, len(genome) - l + 1, step)]
    exact = assemble_contigs_using_overlap_graphs(reads, k=k)
    fast = assemble_contigs_greedy(reads, k=k)
    assert fast == exact


def test_greedy_deterministic_and_flag_plumbed():
    """Same reads -> same contigs, and exact_parity=False routes the main
    pipeline entry point to the fast layout."""
    r = random.Random(8)
    genome = random_dna(r, 400)
    reads = [genome[r.randrange(350):][:40] for _ in range(100)]
    reads.append(reads[0])                     # duplicate-copy handling
    a = assemble_contigs_greedy(reads, k=5)
    b = assemble_contigs_greedy(reads, k=5)
    assert a == b
    c = assemble_contigs_using_overlap_graphs(reads, k=5,
                                              exact_parity=False)
    assert c == a
    # total base content: every read appears in exactly one contig
    # (chains partition unique reads; copies append as singletons)
    assert sum(1 for x in c if x == reads[0]) >= 1


def test_greedy_vs_exact_quality_small():
    """On a clean tiled dataset the fast layout's best contig must be at
    least as long as the exact pipeline's (greedy chaining cannot do
    worse than the weakest-edge loop on an unambiguous chain)."""
    r = random.Random(5)
    genome = random_dna(r, 500)
    k, l = 5, 40
    reads = [genome[i:i + l] for i in range(0, len(genome) - l + 1, l - k)]
    r.shuffle(reads)
    exact = assemble_contigs_using_overlap_graphs(reads, k=k)
    fast = assemble_contigs_using_overlap_graphs(reads, k=k,
                                                 exact_parity=False)
    assert max(map(len, fast)) >= max(map(len, exact))
