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


def test_incremental_cycle_removal_matches_legacy():
    """gc_remove_cycles_v2 (incremental-resume DFS, the round-3 speedup for
    the reference's 48-hour cycle-removal wall) must produce the exact same
    removal set as the legacy full-restart loop on random dense digraphs.
    The default remove_cycles path uses v2, so the existing C++-vs-Python
    NetworkX-order parity tests exercise it too."""
    import numpy as np

    from genome_assembly_tpu.native import graphcore

    if not graphcore.available():
        import pytest

        pytest.skip("C++ engine not built")
    lib = graphcore._load()
    rng = np.random.default_rng(7)
    for _ in range(10):
        n = int(rng.integers(10, 250))
        e = int(rng.integers(n, n * n // 3 + n))
        src = rng.integers(0, n, e).astype(np.int32)
        dst = rng.integers(0, n, e).astype(np.int32)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        e = len(src)
        w = rng.integers(-50, 500, e).astype(np.int32)
        a1 = np.ones(e, np.uint8)
        a2 = np.ones(e, np.uint8)
        r1 = lib.gc_remove_cycles(n, e, src, dst, w, a1)
        r2 = lib.gc_remove_cycles_v2(n, e, src, dst, w, a2)
        assert r1 == r2
        np.testing.assert_array_equal(a1, a2)
