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


def _build(path: str) -> None:
    """Compile libgraphcore.so in place when a toolchain is available.

    Best-effort: any failure (no g++, read-only install, sandbox) leaves the
    library absent and callers use the pure-Python fallbacks.
    """
    import subprocess

    src_dir = os.path.dirname(path)
    if not os.path.exists(os.path.join(src_dir, "graphcore.cpp")):
        return
    try:
        subprocess.run(
            ["make", "-C", src_dir],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        pass


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libgraphcore.so")
    if not os.path.exists(path):
        _build(path)
    for attempt in range(2):
        lib = _try_load(path)
        if lib is not None or attempt == 1:
            _LIB = lib
            return _LIB
        # stale .so (e.g. built before a symbol was added, mtimes not
        # helping): force a rebuild once, then give up to the Python
        # fallbacks rather than crash (review finding round 3)
        try:
            os.remove(path)
        except OSError:
            pass
        _build(path)
    return _LIB


def _try_load(path):
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            _cycles_sig = [
                ctypes.c_longlong,                        # num_nodes
                ctypes.c_longlong,                        # num_edges
                np.ctypeslib.ndpointer(np.int32),         # src
                np.ctypeslib.ndpointer(np.int32),         # dst
                np.ctypeslib.ndpointer(np.int32),         # weight
                np.ctypeslib.ndpointer(np.uint8),         # alive (in/out)
            ]
            lib.gc_remove_cycles.restype = ctypes.c_longlong
            lib.gc_remove_cycles.argtypes = _cycles_sig
            lib.gc_remove_cycles_v2.restype = ctypes.c_longlong
            lib.gc_remove_cycles_v2.argtypes = _cycles_sig
            lib.gc_overlap_baseline_batch.restype = ctypes.c_longlong
            lib.gc_overlap_baseline_batch.argtypes = [
                ctypes.c_longlong,                        # B
                ctypes.c_longlong,                        # L
                np.ctypeslib.ndpointer(np.int8),          # a codes (B, L)
                np.ctypeslib.ndpointer(np.int32),         # a_len
                np.ctypeslib.ndpointer(np.int8),          # b codes (B, L)
                np.ctypeslib.ndpointer(np.int32),         # b_len
                ctypes.c_longlong,                        # match
                ctypes.c_longlong,                        # mismatch
                ctypes.c_longlong,                        # indel
                np.ctypeslib.ndpointer(np.int32),         # score out
                np.ctypeslib.ndpointer(np.int32),         # end out
            ]
            lib.gc_local_align_banded_batch.restype = ctypes.c_longlong
            lib.gc_local_align_banded_batch.argtypes = [
                ctypes.c_longlong,                        # B
                ctypes.c_longlong,                        # q_stride
                np.ctypeslib.ndpointer(np.int8),          # q codes (B, qs)
                np.ctypeslib.ndpointer(np.int32),         # q_len
                ctypes.c_longlong,                        # m (genome len)
                np.ctypeslib.ndpointer(np.int8),          # genome codes
                np.ctypeslib.ndpointer(np.int32),         # d0 (center diag)
                ctypes.c_longlong,                        # band
                ctypes.c_longlong,                        # match
                ctypes.c_longlong,                        # mismatch
                ctypes.c_longlong,                        # indel
                ctypes.c_longlong,                        # ops_stride
                np.ctypeslib.ndpointer(np.int32),         # score out
                np.ctypeslib.ndpointer(np.int32),         # bi out
                np.ctypeslib.ndpointer(np.int32),         # bj out (global)
                np.ctypeslib.ndpointer(np.int32),         # steps out
                np.ctypeslib.ndpointer(np.uint8),         # ops out
                ctypes.c_longlong,                        # n_threads
            ]
            lib.gc_overlap_nogap_pairs.restype = ctypes.c_longlong
            lib.gc_overlap_nogap_pairs.argtypes = [
                ctypes.c_longlong,                        # n_pairs
                ctypes.c_longlong,                        # stride (width)
                np.ctypeslib.ndpointer(np.int8),          # reads (U, W)
                np.ctypeslib.ndpointer(np.int32),         # lens
                np.ctypeslib.ndpointer(np.int32),         # ia
                np.ctypeslib.ndpointer(np.int32),         # ib
                ctypes.c_longlong,                        # match
                ctypes.c_longlong,                        # mismatch
                np.ctypeslib.ndpointer(np.int32),         # score out
                np.ctypeslib.ndpointer(np.int32),         # end out
                ctypes.c_longlong,                        # n_threads
            ]
            lib.gc_greedy_chain.restype = ctypes.c_longlong
            lib.gc_greedy_chain.argtypes = [
                ctypes.c_longlong,                        # n_nodes
                ctypes.c_longlong,                        # n_edges
                np.ctypeslib.ndpointer(np.int32),         # src
                np.ctypeslib.ndpointer(np.int32),         # dst
                np.ctypeslib.ndpointer(np.int64),         # order
                np.ctypeslib.ndpointer(np.int32),         # succ out
                np.ctypeslib.ndpointer(np.int32),         # pred out
                np.ctypeslib.ndpointer(np.int64),         # chain_edge out
            ]
            lib.gc_local_align_batch.restype = ctypes.c_longlong
            lib.gc_local_align_batch.argtypes = [
                ctypes.c_longlong,                        # B
                ctypes.c_longlong,                        # q_stride
                np.ctypeslib.ndpointer(np.int8),          # q codes (B, qs)
                np.ctypeslib.ndpointer(np.int32),         # q_len
                ctypes.c_longlong,                        # m (genome len)
                np.ctypeslib.ndpointer(np.int8),          # genome codes (m,)
                np.ctypeslib.ndpointer(np.int32),         # w_len (suffix)
                ctypes.c_longlong,                        # match
                ctypes.c_longlong,                        # mismatch
                ctypes.c_longlong,                        # indel
                ctypes.c_longlong,                        # ops_stride
                np.ctypeslib.ndpointer(np.int32),         # score out
                np.ctypeslib.ndpointer(np.int32),         # bi out
                np.ctypeslib.ndpointer(np.int32),         # bj out
                np.ctypeslib.ndpointer(np.int32),         # steps out
                np.ctypeslib.ndpointer(np.uint8),         # ops out (B, os)
                ctypes.c_longlong,                        # n_threads
            ]
            lib.gc_local_align.restype = ctypes.c_longlong
            lib.gc_local_align.argtypes = [
                ctypes.c_longlong,                        # n (query)
                ctypes.c_longlong,                        # m (reference)
                np.ctypeslib.ndpointer(np.int8),          # q codes (n,)
                np.ctypeslib.ndpointer(np.int8),          # r codes (m,)
                ctypes.c_longlong,                        # match
                ctypes.c_longlong,                        # mismatch
                ctypes.c_longlong,                        # indel
                np.ctypeslib.ndpointer(np.int32),         # score out (1,)
                np.ctypeslib.ndpointer(np.int32),         # bi out (1,)
                np.ctypeslib.ndpointer(np.int32),         # bj out (1,)
                np.ctypeslib.ndpointer(np.uint8),         # ops out (n+m,)
            ]
            return lib
        except (OSError, AttributeError):
            # OSError: unloadable .so; AttributeError: stale build
            # missing a newer symbol — caller forces a rebuild once
            return None
    return None


def available() -> bool:
    return _load() is not None


def remove_cycles(g, legacy: bool | None = None) -> int:
    """C++ weakest-edge cycle removal; mutates g.alive. Returns #removed.

    Uses the incremental-resume engine (gc_remove_cycles_v2 — bit-identical
    removal sequence, one DFS prefix instead of one per cycle) unless
    `legacy=True` or GA_TPU_CYCLES_LEGACY=1 forces the full-restart loop."""
    lib = _load()
    if legacy is None:
        legacy = os.environ.get("GA_TPU_CYCLES_LEGACY") == "1"
    alive = np.ascontiguousarray(g.alive, dtype=np.uint8)
    src = np.ascontiguousarray(g.src, dtype=np.int32)
    dst = np.ascontiguousarray(g.dst, dtype=np.int32)
    weight = np.ascontiguousarray(g.weight, dtype=np.int32)
    fn = lib.gc_remove_cycles if legacy else lib.gc_remove_cycles_v2
    removed = fn(g.num_nodes, len(src), src, dst, weight, alive)
    g.alive[:] = alive.astype(bool)
    return int(removed)


def local_align(query: str, reference: str, match_score: int = 10,
                mismatch: int = -1, indel: int = -1):
    """C++ Smith-Waterman with reference semantics (aligners.py:85-167).

    Returns (aligned_ref, aligned_query, score, start, end) like the
    Python oracle (ops/oracle.py local_align_oracle), ~200x faster.
    """
    from ..core.encoding import encode
    from ..ops.smith_waterman import replay_ops_host

    lib = _load()
    n, m = len(query), len(reference)
    if n == 0 or m == 0:
        return "", "", 0, 0, 0
    q = np.ascontiguousarray(encode(query), dtype=np.int8)
    r = np.ascontiguousarray(encode(reference), dtype=np.int8)
    score = np.zeros(1, np.int32)
    bi = np.zeros(1, np.int32)
    bj = np.zeros(1, np.int32)
    ops = np.zeros(n + m, np.uint8)
    steps = lib.gc_local_align(n, m, q, r, match_score, mismatch, indel,
                               score, bi, bj, ops)
    ar, aq, start = replay_ops_host(ops[:steps], int(bi[0]), int(bj[0]),
                                    query, reference)
    return ar, aq, int(score[0]), start, int(bj[0])


def local_align_banded_batch(queries: list[str], genome_codes, d0,
                             band: int, match_score: int = 10,
                             mismatch: int = -1, indel: int = -1,
                             n_threads: int | None = None):
    """Batched C++ diagonal-banded SW against one shared genome
    (ops/smith_waterman.py local_align_batch_banded semantics).

    d0: (B,) int32 center diagonal per item. Returns
    (score, bi, bj, steps, ops) with bj in GLOBAL genome coordinates and
    ops[p, :steps[p]] the backwards path stream (replay with
    replay_ops_host against the full genome)."""
    from ..core.encoding import encode_batch

    lib = _load()
    B = len(queries)
    genome = np.ascontiguousarray(genome_codes, dtype=np.int8)
    m = len(genome)
    q_mat, q_len = encode_batch(queries)
    q_mat = np.ascontiguousarray(q_mat, dtype=np.int8)
    d0 = np.ascontiguousarray(d0, dtype=np.int32)
    q_stride = q_mat.shape[1] if B else 0
    ops_stride = 2 * q_stride + 2 * band + 1
    score = np.empty(B, np.int32)
    bi = np.empty(B, np.int32)
    bj = np.empty(B, np.int32)
    steps = np.empty(B, np.int32)
    ops = np.empty((max(B, 1), max(ops_stride, 1)), np.uint8)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 8)
    if B:
        lib.gc_local_align_banded_batch(B, q_stride, q_mat, q_len, m,
                                        genome, d0, band, match_score,
                                        mismatch, indel, ops.shape[1],
                                        score, bi, bj, steps, ops,
                                        n_threads)
    return score, bi, bj, steps, ops


def overlap_nogap_pairs(reads_mat, lens, ia, ib, match_score: int = 10,
                        mismatch: int = -1, n_threads: int | None = None):
    """C++ no-gap overlap scoring over candidate index pairs.

    reads_mat: (U, W) int8 LEFT-aligned unique-read codes; lens: (U,)
    int32; ia/ib: (P,) int32 pair indices. Returns (score, end) int32
    (P,) arrays — bit-identical to ops.overlap.overlap_scores on the
    same pairs (differential-tested)."""
    lib = _load()
    reads_mat = np.ascontiguousarray(reads_mat, dtype=np.int8)
    lens = np.ascontiguousarray(lens, dtype=np.int32)
    ia = np.ascontiguousarray(ia, dtype=np.int32)
    ib = np.ascontiguousarray(ib, dtype=np.int32)
    n_pairs = len(ia)
    score = np.empty(n_pairs, np.int32)
    end = np.empty(n_pairs, np.int32)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 8)
    if n_pairs:
        lib.gc_overlap_nogap_pairs(n_pairs, reads_mat.shape[1], reads_mat,
                                   lens, ia, ib, match_score, mismatch,
                                   score, end, n_threads)
    return score, end


def greedy_chain(n_nodes: int, src, dst, order):
    """C++ greedy best-overlap chain acceptance (fast layout mode).

    Returns (succ, chain_edge): succ[u] = accepted successor (-1 none),
    chain_edge[u] = accepted edge index for the u -> succ[u] link.
    Identical by construction to graph.greedy.greedy_chain_python.
    """
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.int32)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    order = np.ascontiguousarray(order, dtype=np.int64)
    succ = np.empty(n_nodes, np.int32)
    pred = np.empty(n_nodes, np.int32)
    chain_edge = np.empty(n_nodes, np.int64)
    lib.gc_greedy_chain(n_nodes, len(order), src, dst, order, succ, pred,
                        chain_edge)
    return succ, chain_edge


def local_align_batch_suffix_windows(queries: list[str], genome_codes,
                                     w_len, match_score: int = 10,
                                     mismatch: int = -1, indel: int = -1,
                                     n_threads: int | None = None):
    """Batched C++ Smith-Waterman of queries against per-item SUFFIX
    windows of one genome (the two window shapes of the metrics pass,
    aligners.py:170-202: full genome, or the tail window genome[-n:]).

    Args:
        queries: contig strings.
        genome_codes: (m,) int8 encoded genome.
        w_len: (B,) window length per item (w == m -> full genome).

    Returns (score, bi, bj, steps, ops): int32 arrays (B,) and the
    (B, ops_stride) uint8 op-stream matrix; item p's path is
    ops[p, :steps[p]] in backwards order, coordinates LOCAL to the
    window (caller adds the m - w offset). Semantics are bit-identical
    to gc_local_align / the device kernel (ops/smith_waterman.py).
    """
    from ..core.encoding import encode_batch

    lib = _load()
    B = len(queries)
    genome = np.ascontiguousarray(genome_codes, dtype=np.int8)
    m = len(genome)
    q_mat, q_len = encode_batch(queries)
    q_mat = np.ascontiguousarray(q_mat, dtype=np.int8)
    wl = np.ascontiguousarray(w_len, dtype=np.int32)
    q_stride = q_mat.shape[1] if B else 0
    ops_stride = q_stride + m
    score = np.empty(B, np.int32)
    bi = np.empty(B, np.int32)
    bj = np.empty(B, np.int32)
    steps = np.empty(B, np.int32)
    ops = np.empty((max(B, 1), max(ops_stride, 1)), np.uint8)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 8)
    if B:
        lib.gc_local_align_batch(B, q_stride, q_mat, q_len, m, genome, wl,
                                 match_score, mismatch, indel, ops.shape[1],
                                 score, bi, bj, steps, ops, n_threads)
    return score, bi, bj, steps, ops


def overlap_baseline_batch(a_codes, a_len, b_codes, b_len, match_score=10,
                           mismatch=-1, indel=-(2**31)):
    """Reference-faithful full-DP overlap alignment on a batch of pairs
    (compiled C++, the Numba-baseline stand-in — see graphcore.cpp).

    Args: a_codes/b_codes (B, L) int8 LEFT-aligned, a_len/b_len (B,) int32.
    Returns (score, end_pos) int32 arrays of shape (B,).
    """
    lib = _load()
    a = np.ascontiguousarray(a_codes, dtype=np.int8)
    b = np.ascontiguousarray(b_codes, dtype=np.int8)
    al = np.ascontiguousarray(a_len, dtype=np.int32)
    bl = np.ascontiguousarray(b_len, dtype=np.int32)
    B, L = a.shape
    score = np.empty((B,), dtype=np.int32)
    end = np.empty((B,), dtype=np.int32)
    lib.gc_overlap_baseline_batch(B, L, a, al, b, bl, match_score, mismatch,
                                  indel, score, end)
    return score, end
