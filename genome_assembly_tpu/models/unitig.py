"""Alternative pipeline #2: string graph + unitig collapse (reference C13,
overlapGraphs.py:332-412).

Stages:
1. positional-combinations graph: edges follow `combinations(reads, 2)` —
   one direction per positional pair, so with duplicate reads both
   directions (and self-pairs) can occur (overlapGraphs.py:344); nodes are
   read STRINGS (duplicates collapse); edges kept when score > 0;
2. path-based transitive reduction: an edge (v, w) is removed when some
   other successor u of v (u before w in combination order) reaches w in the
   ORIGINAL graph (overlapGraphs.py:354-367);
3. unitigs: maximal forward extensions through nodes with out-degree 1 and
   in-degree 1, merged via end_position (overlapGraphs.py:370-402).

Deviation (defensive, SURVEY.md §2.3 policy of not replicating defects): the
reference's extension loop never marks nodes during the walk, so a reachable
2-cycle of degree-1 nodes loops forever; we stop when the next node is
already on the current path.
"""

from __future__ import annotations

from itertools import combinations

from ..graph.build import score_pairs


class _DiGraph:
    """Minimal insertion-ordered digraph over string nodes — reproduces the
    NetworkX dict-of-dicts iteration orders the reference relies on."""

    def __init__(self):
        self.succ: dict[str, dict[str, dict]] = {}
        self.pred: dict[str, dict[str, dict]] = {}

    def add_node(self, n: str) -> None:
        if n not in self.succ:
            self.succ[n] = {}
            self.pred[n] = {}

    def add_edge(self, u: str, v: str, **attrs) -> None:
        self.add_node(u)
        self.add_node(v)
        self.succ[u][v] = attrs
        self.pred[v][u] = attrs

    def remove_edge(self, u: str, v: str) -> None:
        del self.succ[u][v]
        del self.pred[v][u]

    def has_edge(self, u: str, v: str) -> bool:
        return u in self.succ and v in self.succ[u]

    def nodes(self):
        return list(self.succ.keys())

    def successors(self, n: str):
        return list(self.succ[n].keys())

    def predecessors(self, n: str):
        return list(self.pred[n].keys())

    def has_path(self, src: str, dst: str) -> bool:
        if src == dst:
            return True
        seen = {src}
        stack = [src]
        while stack:
            u = stack.pop()
            for v in self.succ[u]:
                if v == dst:
                    return True
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        return False

    def copy(self) -> "_DiGraph":
        g = _DiGraph()
        for n in self.succ:
            g.add_node(n)
        for u, nbrs in self.succ.items():
            for v, attrs in nbrs.items():
                g.succ[u][v] = dict(attrs)
                g.pred[v][u] = dict(attrs)
        return g


def construct_string_graph(reads: list[str],
                           device: bool = True) -> _DiGraph:
    """Combinations-ordered graph with score > 0 edges
    (overlapGraphs.py:332-351); each distinct ordered string pair is scored
    once on device."""
    g = _DiGraph()
    for read in reads:
        g.add_node(read)

    # positional combinations -> distinct ordered string pairs, first order
    seen: dict[tuple[str, str], None] = {}
    for a, b in combinations(reads, 2):
        seen.setdefault((a, b))
    ordered_pairs = list(seen.keys())
    if not ordered_pairs:
        return g

    node_list = g.nodes()
    index = {r: i for i, r in enumerate(node_list)}
    idx_pairs = [(index[a], index[b]) for a, b in ordered_pairs]
    scores, ends = score_pairs(node_list, idx_pairs, device=device)
    for (a, b), s, e in zip(ordered_pairs, scores, ends):
        if int(s) > 0:
            g.add_edge(a, b, weight=int(s), end_position=int(e))
    return g


def transitive_reduction2(graph: _DiGraph) -> _DiGraph:
    """Remove (v, w) when another successor pair (u before w) has a path
    u ->* w in the original graph (overlapGraphs.py:354-367)."""
    reduced = graph.copy()
    for v in graph.nodes():
        for u, w in combinations(graph.successors(v), 2):
            if graph.has_path(u, w) and reduced.has_edge(v, w):
                reduced.remove_edge(v, w)
    return reduced


def find_unitigs(graph: _DiGraph) -> list[str]:
    """Collapse non-branching forward paths (overlapGraphs.py:370-402)."""
    unitigs: list[str] = []
    visited: set[str] = set()
    for node in graph.nodes():
        if node in visited:
            continue
        path = [node]
        while (len(graph.successors(path[-1])) == 1
               and len(graph.predecessors(path[-1])) == 1):
            nxt = graph.successors(path[-1])[0]
            if nxt in visited or nxt in path:
                break
            path.append(nxt)
        visited.update(path)
        seq = path[0]
        for i in range(1, len(path)):
            overlap_len = graph.succ[path[i - 1]][path[i]]["end_position"]
            seq += path[i][overlap_len:]
        unitigs.append(seq)
    return unitigs


def assemble_contigs(reads: list[str], device: bool = True) -> list[str]:
    """Unitig pipeline (overlapGraphs.py:405-412)."""
    graph = construct_string_graph(reads, device=device)
    reduced = transitive_reduction2(graph)
    return find_unitigs(reduced)
