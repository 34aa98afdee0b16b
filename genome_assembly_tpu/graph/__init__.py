from .build import OverlapGraph, build_overlap_graph
from .cycles import remove_cycles
from .topo import topological_order

__all__ = [
    "OverlapGraph",
    "build_overlap_graph",
    "remove_cycles",
    "topological_order",
]
