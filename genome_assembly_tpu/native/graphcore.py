"""ctypes loader for the C++ graph engine (libgraphcore.so).

Build with `make -C genome_assembly_tpu/native`. When the shared library is
absent or fails to load, `available()` returns False and callers fall back to
the pure-Python implementations (graph/cycles.py, graph/topo.py).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libgraphcore.so")
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.gc_remove_cycles.restype = ctypes.c_longlong
            lib.gc_remove_cycles.argtypes = [
                ctypes.c_longlong,                        # num_nodes
                ctypes.c_longlong,                        # num_edges
                np.ctypeslib.ndpointer(np.int32),         # src
                np.ctypeslib.ndpointer(np.int32),         # dst
                np.ctypeslib.ndpointer(np.int32),         # weight
                np.ctypeslib.ndpointer(np.uint8),         # alive (in/out)
            ]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def remove_cycles(g) -> int:
    """C++ weakest-edge cycle removal; mutates g.alive. Returns #removed."""
    lib = _load()
    alive = np.ascontiguousarray(g.alive, dtype=np.uint8)
    src = np.ascontiguousarray(g.src, dtype=np.int32)
    dst = np.ascontiguousarray(g.dst, dtype=np.int32)
    weight = np.ascontiguousarray(g.weight, dtype=np.int32)
    removed = lib.gc_remove_cycles(
        g.num_nodes, len(src), src, dst, weight, alive)
    g.alive[:] = alive.astype(bool)
    return int(removed)
