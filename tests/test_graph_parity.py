"""Graph-layer parity tests.

`_reference_pipeline` below reconstructs the reference's assembly algorithm
(overlapGraphs.py:5-193) directly on NetworkX — the same library, the same
graph-construction order, the same find_cycle/topological_sort calls — with
the oracle aligner supplying scores. Our edge-list pipeline must produce
bit-identical contig lists, which pins down:
- candidate enumeration & edge insertion order,
- NetworkX find_cycle DFS order + weakest-edge removal order,
- Kahn-generations topological order,
- copy-collapse + greedy min-topo contig walking.
"""

import random

import networkx as nx
import pytest

from genome_assembly_tpu.graph.build import build_overlap_graph, candidate_pairs, dedup_reads
from genome_assembly_tpu.graph.cycles import remove_cycles_python
from genome_assembly_tpu.graph.layout import walk_contigs
from genome_assembly_tpu.graph.topo import topological_order
from genome_assembly_tpu.models import assemble_contigs_using_overlap_graphs
from genome_assembly_tpu.ops.oracle import overlap_align_oracle


def random_dna(r, length):
    return "".join(r.choice("ACGT") for _ in range(length))


# --- reference pipeline replica on networkx (the parity oracle) ---

def _reference_graph(reads, k):
    read_copies = {}
    for read in reads:
        read_copies[read] = read_copies.get(read, 0) + 1
    G = nx.DiGraph()
    for read, count in read_copies.items():
        for c in range(count):
            G.add_node(f"{read}_{c}")
    prefix_index = {}
    if k > 0:
        for read in read_copies:
            prefix = read[:k] if len(read) >= k else read
            prefix_index.setdefault(prefix, []).append(read)
    for read_a in read_copies:
        suffix = (read_a[-k:] if len(read_a) >= k else read_a) if k > 0 else None
        candidates = prefix_index.get(suffix, []) if k > 0 else list(read_copies)
        for read_b in candidates:
            if read_a == read_b:
                continue
            _, _, score, end = overlap_align_oracle(read_a, read_b)
            for ca in range(read_copies[read_a]):
                for cb in range(read_copies[read_b]):
                    G.add_edge(f"{read_a}_{ca}", f"{read_b}_{cb}",
                               weight=score, end_position=end)
    return G, read_copies


def _reference_pipeline(reads, k):
    G, read_copies = _reference_graph(reads, k)
    while True:
        try:
            cycle = nx.find_cycle(G, orientation="original")
        except nx.NetworkXNoCycle:
            break
        u, v, _ = min(((u, v, G[u][v]["weight"]) for u, v, _ in cycle),
                      key=lambda x: x[2])
        G.remove_edge(u, v)
    topo_with_copies = {node: i for i, node in enumerate(nx.topological_sort(G))}
    topo = {}
    for node in topo_with_copies:
        topo[node.rsplit("_", 1)[0]] = topo_with_copies[node]
    visited = set()
    contigs = []
    for read in topo:
        if read in visited:
            continue
        for c in range(read_copies[read]):
            node = f"{read}_{c}"
            contig = node.rsplit("_", 1)[0]
            visited.add(contig)
            cur = node
            while True:
                valid = [nb for nb in G.neighbors(cur)
                         if nb.rsplit("_", 1)[0] not in visited]
                if not valid:
                    break
                nxt = min(valid, key=lambda nb: topo.get(nb.rsplit("_", 1)[0],
                                                         float("inf")))
                contig += nxt.rsplit("_", 1)[0][G.edges[cur, nxt]["end_position"]:]
                cur = nxt
                visited.add(cur.rsplit("_", 1)[0])
            contigs.append(contig)
    return contigs


def _reads_from_genome(r, genome, n, l):
    reads = []
    for _ in range(n):
        s = r.randrange(len(genome))
        reads.append(genome[s:s + l])
    return reads


TOY_GENOME = "ATGCGTACGTTAGCACGTGTTCGATAGC"
TOY_READS = ['TGTTC', 'TGCGT', 'ACGTG', 'CACGT', 'AGCAC',
             'GATAG', 'CGATA', 'GTACG', 'CGTAC', 'ATGCG']


@pytest.mark.parametrize("k", [0, 2, 5])
def test_toy_reads_parity(k):
    """Fixed toy fixture from the reference __main__ (overlapGraphs.py:417-425)."""
    expected = _reference_pipeline(TOY_READS, k)
    got = assemble_contigs_using_overlap_graphs(TOY_READS, k=k, device=True,
                                                use_native=False)
    assert got == expected


@pytest.mark.parametrize("seed,n,l,k", [
    (1, 40, 8, 3), (2, 60, 10, 0), (3, 80, 12, 4),
    (4, 50, 6, 2), (5, 100, 10, 5), (6, 30, 15, 3),
])
def test_random_genome_parity(seed, n, l, k):
    r = random.Random(seed)
    genome = random_dna(r, 300)
    reads = _reads_from_genome(r, genome, n, l)
    expected = _reference_pipeline(reads, k)
    got = assemble_contigs_using_overlap_graphs(reads, k=k, device=True,
                                                use_native=False)
    assert got == expected


def test_duplicate_reads_copy_semantics():
    reads = ["ACGTA", "CGTAC", "ACGTA", "GTACG", "ACGTA", "CGTAC"]
    for k in (0, 2):
        expected = _reference_pipeline(reads, k)
        got = assemble_contigs_using_overlap_graphs(reads, k=k, device=True,
                                                    use_native=False)
        assert got == expected


def test_candidate_pairs_order_matches_reference():
    r = random.Random(9)
    reads = _reads_from_genome(r, random_dna(r, 100), 30, 6)
    unique, _ = dedup_reads(reads)
    k = 3
    # expected order per reference loops
    prefix_index = {}
    for u, read in enumerate(unique):
        prefix_index.setdefault(read[:k] if len(read) >= k else read, []).append(u)
    expected = []
    for ua, read_a in enumerate(unique):
        suffix = read_a[-k:] if len(read_a) >= k else read_a
        for ub in prefix_index.get(suffix, []):
            if ua != ub:
                expected.append((ua, ub))
    assert candidate_pairs(unique, k) == expected


def test_cycle_removal_matches_networkx_sequence():
    """Check the *set and order* of removed edges against networkx on a
    denser random graph."""
    r = random.Random(17)
    reads = _reads_from_genome(r, random_dna(r, 80), 40, 7)
    g = build_overlap_graph(reads, k=0, device=True)
    G, _ = _reference_graph(reads, 0)

    removed_ref = []
    while True:
        try:
            cycle = nx.find_cycle(G, orientation="original")
        except nx.NetworkXNoCycle:
            break
        u, v, _ = min(((u, v, G[u][v]["weight"]) for u, v, _ in cycle),
                      key=lambda x: x[2])
        G.remove_edge(u, v)
        removed_ref.append((u, v))

    n_removed = remove_cycles_python(g)
    assert n_removed == len(removed_ref)
    # removed edges as (node-name) pairs must match as a set
    base = g.base_array()
    names = []
    for e in range(len(g.src)):
        if not g.alive[e]:
            ua, ub = base[g.src[e]], base[g.dst[e]]
            ca = int(g.src[e] - g.offsets[ua])
            cb = int(g.dst[e] - g.offsets[ub])
            names.append((f"{g.unique_reads[ua]}_{ca}", f"{g.unique_reads[ub]}_{cb}"))
    assert sorted(names) == sorted(removed_ref)

    # and the resulting topological order must match
    topo_ref = list(nx.topological_sort(G))
    topo_got = topological_order(g)
    got_names = []
    for node in topo_got:
        u = base[node]
        got_names.append(f"{g.unique_reads[u]}_{node - int(g.offsets[u])}")
    assert got_names == topo_ref
