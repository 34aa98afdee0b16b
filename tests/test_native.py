"""Native C++ graph engine parity: the removal sequence and resulting DAG
must be identical to the Python engine (which is NetworkX-parity-tested)."""

import random

import numpy as np
import pytest

from genome_assembly_tpu.graph.build import build_overlap_graph
from genome_assembly_tpu.graph.cycles import remove_cycles_python
from genome_assembly_tpu.native import graphcore


def random_dna(r, length):
    return "".join(r.choice("ACGT") for _ in range(length))


needs_native = pytest.mark.skipif(not graphcore.available(),
                                  reason="libgraphcore.so not built")


@needs_native
@pytest.mark.parametrize("seed,n,l,k", [
    (1, 40, 8, 0), (2, 60, 10, 3), (3, 80, 7, 0), (4, 120, 10, 4),
])
def test_native_cycle_removal_parity(seed, n, l, k):
    r = random.Random(seed)
    genome = random_dna(r, 250)
    reads = [genome[r.randrange(len(genome)):][:l] for _ in range(n)]

    g_py = build_overlap_graph(reads, k=k, device=True)
    g_cc = build_overlap_graph(reads, k=k, device=True)
    removed_py = remove_cycles_python(g_py)
    removed_cc = graphcore.remove_cycles(g_cc)
    assert removed_cc == removed_py
    assert (g_cc.alive == g_py.alive).all()


@needs_native
def test_native_on_dense_duplicate_graph():
    r = random.Random(5)
    base = [random_dna(r, 6) for _ in range(15)]
    reads = [r.choice(base) for _ in range(60)]  # heavy duplication
    g_py = build_overlap_graph(reads, k=0)
    g_cc = build_overlap_graph(reads, k=0)
    remove_cycles_python(g_py)
    graphcore.remove_cycles(g_cc)
    assert (g_cc.alive == g_py.alive).all()
