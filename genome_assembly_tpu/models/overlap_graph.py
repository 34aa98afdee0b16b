"""Primary assembly pipeline: k-mer-filtered overlap graph -> greedy cycle
removal -> topological layout -> contig merge.

Equivalent of the reference's `assemble_contigs_using_overlap_graphs`
(overlapGraphs.py:151-193), returning the identical contig list (content and
order) for identical input reads.
"""

from __future__ import annotations

from ..graph.build import build_overlap_graph
from ..graph.cycles import remove_cycles
from ..graph.layout import walk_contigs
from ..graph.topo import topological_order
from ..utils.tracing import stage


def assemble_contigs_using_overlap_graphs(reads: list[str], k: int = 5,
                                          params: dict | None = None,
                                          device: bool = True,
                                          use_native: bool = True,
                                          verbose: bool = False,
                                          exact_parity: bool = True,
                                          consensus: bool = False) -> list[str]:
    """Assemble contigs from reads.

    Args:
        reads: DNA read strings.
        k: k-mer prefilter length (0 disables filtering).
        params: optional run metadata for progress logging (reference
            signature parity, overlapGraphs.py:151).
        device: score candidate pairs on the accelerator.
        use_native: use the C++ graph engine when available.
        exact_parity: True (default) reproduces the reference layout
            bit-for-bit (greedy weakest-edge cycle removal -> topo ->
            walk); False switches to the fast greedy best-overlap
            chaining layout (graph/greedy.py) — guarded chaining +
            redundancy suppression + consensus, one O(E log E) sort +
            linear accept pass instead of the sequential cycle loop,
            different (documented) contig semantics.
        consensus: polish the exact-parity walk's contigs by majority
            vote over their read pileup (graph/consensus.py). OFF by
            default: the polished sequences are corrected, i.e. NOT
            bit-identical to the reference's (VERDICT round 4,
            next-step #10). The fast layout has its own consensus
            default (on).

    Every stage feeds the global tracer (utils/tracing.py); print a table
    with `genome_assembly_tpu.utils.tracing.global_tracer().report()` or
    run the CLI with --trace.
    """
    def log(msg):
        if verbose:
            print(msg)

    if not exact_parity:
        from ..graph.greedy import assemble_contigs_greedy

        log(f"Fast-layout assembly (k={k}, reads={len(reads)})...")
        with stage("graph.greedy_layout"):
            return assemble_contigs_greedy(reads, k=k, device=device,
                                           use_native=use_native)

    log(f"Constructing overlap graph (k={k}, reads={len(reads)})...")
    with stage("graph.build"):
        g = build_overlap_graph(reads, k=k, device=device)
    log(f"Removing cycles ({len(g.src)} edges)...")
    with stage("graph.remove_cycles", items=len(g.src)):
        remove_cycles(g, use_native=use_native)
    log("Sorting graph topologically...")
    with stage("graph.topo_sort"):
        topo_nodes = topological_order(g)
    log("Creating contigs...")
    with stage("graph.walk_contigs"):
        if not consensus:
            return walk_contigs(g, topo_nodes)
        contigs, (pr, po, pc) = walk_contigs(g, topo_nodes,
                                             with_placements=True)
    log("Consensus polish...")
    with stage("graph.consensus"):
        from ..graph.consensus import polish_contigs

        return polish_contigs(contigs, g.unique_reads, pr, po, pc,
                              place_weight=g.counts[pr].astype("int64"))
