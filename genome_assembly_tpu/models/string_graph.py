"""Alternative pipeline #1: Myers-style string graph (reference C12,
overlapGraphs.py:196-329).

Stages:
1. all-ordered-pairs overlap scoring over unique reads, edges only for
   score > 0 (overlapGraphs.py:219-230) — scored in device batches;
2. Myers mark-and-eliminate transitive reduction with the reference's
   weight test w(w,x) + w(v,w) >= w(v,x) (overlapGraphs.py:235-303).
   The reference runs its elimination loop twice (duplicated block at
   overlapGraphs.py:257-286), but the second pass is a provable no-op
   (it only eliminates nodes still marked 'inplay', and pass one already
   processed every such candidate with identical conditions), so we run it
   once;
3. greedy walk WITHOUT topological order: first unvisited neighbor in
   adjacency order wins (create_contig with an empty topo map,
   overlapGraphs.py:323-327), one contig per unique read base.

Copy semantics: copies of a duplicate read share identical edge sets, so
marks and eliminations are functions of the base read only — the reduction
runs at base level and fans out, which is behaviorally identical to the
reference's per-copy loops.
"""

from __future__ import annotations

import numpy as np

from ..graph.build import OverlapGraph, dedup_reads, score_pairs
from ..graph.layout import create_contig


def build_string_graph(reads: list[str], device: bool = True) -> OverlapGraph:
    """All-pairs overlap graph thresholded at score > 0
    (overlapGraphs.py:219-230)."""
    unique, counts = dedup_reads(reads)
    offsets = np.zeros(len(unique) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])

    pairs = [(ua, ub) for ua in range(len(unique))
             for ub in range(len(unique)) if ua != ub]
    scores, ends = score_pairs(unique, pairs, device=device)

    src_l, dst_l, w_l, e_l = [], [], [], []
    for idx, (ua, ub) in enumerate(pairs):
        if scores[idx] <= 0:
            continue
        for ca in range(int(counts[ua])):
            for cb in range(int(counts[ub])):
                src_l.append(int(offsets[ua]) + ca)
                dst_l.append(int(offsets[ub]) + cb)
                w_l.append(int(scores[idx]))
                e_l.append(int(ends[idx]))
    return OverlapGraph(
        unique_reads=unique, counts=counts, offsets=offsets,
        src=np.array(src_l, dtype=np.int32),
        dst=np.array(dst_l, dtype=np.int32),
        weight=np.array(w_l, dtype=np.int32),
        end_pos=np.array(e_l, dtype=np.int32))


def transitive_reduction(g: OverlapGraph) -> None:
    """Myers mark-and-eliminate over bases; deletes reduced edges in place
    (overlapGraphs.py:235-303 semantics, single pass)."""
    base_arr = g.base_array()
    n_unique = g.num_unique

    # base-level adjacency in first-insertion order, with representative
    # edge weight (all copy-pair edges of a base pair share one weight)
    succ: list[list[int]] = [[] for _ in range(n_unique)]
    wmap: dict[tuple[int, int], int] = {}
    for e in range(len(g.src)):
        if not g.alive[e]:
            continue
        bu, bv = int(base_arr[g.src[e]]), int(base_arr[g.dst[e]])
        if (bu, bv) not in wmap:
            succ[bu].append(bv)
            wmap[(bu, bv)] = int(g.weight[e])

    VACANT, INPLAY, ELIMINATED = 0, 1, 2
    mark = np.full(n_unique, VACANT, dtype=np.int8)
    reduce_pair: set[tuple[int, int]] = set()
    for v in range(n_unique):
        for w in succ[v]:
            mark[w] = INPLAY
        for w in succ[v]:
            for x in succ[w]:
                if mark[x] == INPLAY and (v, x) in wmap:
                    if wmap[(w, x)] + wmap[(v, w)] >= wmap[(v, x)]:
                        mark[x] = ELIMINATED
        for w in succ[v]:
            if mark[w] == ELIMINATED:
                reduce_pair.add((v, w))
            mark[w] = VACANT

    if reduce_pair:
        for e in range(len(g.src)):
            if g.alive[e]:
                bp = (int(base_arr[g.src[e]]), int(base_arr[g.dst[e]]))
                if bp in reduce_pair:
                    g.alive[e] = False


def assemble_contigs_string(reads: list[str], fuzz: int = 5,
                            device: bool = True) -> list[str]:
    """String-graph pipeline (overlapGraphs.py:306-329). `fuzz` is accepted
    for signature parity; like the reference, the reduction tests weights,
    not lengths, so fuzz is unused."""
    g = build_string_graph(reads, device=device)
    transitive_reduction(g)
    base_arr = g.base_array()
    visited: set[int] = set()
    contigs: list[str] = []
    # node insertion order == base-major, copy-minor; first copy of an
    # unvisited base starts the contig (overlapGraphs.py:323-327)
    for base in range(g.num_unique):
        if base in visited:
            continue
        contigs.append(create_contig(g, int(g.offsets[base]), visited, {},
                                     base_arr))
    return contigs
