"""Overlap-graph construction.

Reference semantics (overlapGraphs.py:5-61):
- duplicate reads collapse to (unique read, count) in first-occurrence order;
  every copy becomes its own node ("read_0", "read_1", ... in the reference —
  here node ids are dense ints: node(u, c) = offset[u] + c);
- a k-mer prefix index maps each unique read's first k chars (whole read if
  shorter) to candidates; each read's last k chars look up its successor
  candidates; k = 0 disables filtering (all ordered unique pairs);
- identical reads never get edges; every copy pair of two distinct reads gets
  the same (weight, end_position) edge — one alignment per unique pair,
  fanned out to copies;
- NO score threshold: even zero/negative-score candidate edges are added.

Edge insertion order is preserved exactly (it determines NetworkX adjacency
order, hence cycle-removal and topological order, hence the contigs) — the
candidate enumeration runs on host in reference order while the actual
scoring is batched onto the device kernel in chunks.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from ..core.encoding import encode_batch


@dataclass
class OverlapGraph:
    """Edge-list overlap graph over read-copy nodes.

    Nodes are dense ints; node (unique u, copy c) has id offset[u] + c.
    `adj[v]` lists edge indices out of v in insertion order; `alive` supports
    edge deletion without disturbing order.
    """

    unique_reads: list[str]
    counts: np.ndarray            # (U,) int32 copies per unique read
    offsets: np.ndarray           # (U+1,) int64 node-id offsets
    src: np.ndarray               # (E,) int32 node ids
    dst: np.ndarray               # (E,) int32
    weight: np.ndarray            # (E,) int32
    end_pos: np.ndarray           # (E,) int32
    adj: list[list[int]] = field(default_factory=list)
    alive: np.ndarray = field(default=None)

    def __post_init__(self):
        if self.alive is None:
            self.alive = np.ones(len(self.src), dtype=bool)
        if not self.adj:
            # insertion-order adjacency without a Python per-edge loop: a
            # STABLE argsort of src keeps edge indices in insertion order
            # within each node's group (matters at the dense-k=0 scale,
            # millions of edges)
            order = np.argsort(self.src, kind="stable")
            bounds = np.searchsorted(
                self.src[order], np.arange(self.num_nodes + 1))
            self.adj = [order[bounds[v]:bounds[v + 1]]
                        for v in range(self.num_nodes)]

    @property
    def num_nodes(self) -> int:
        return int(self.offsets[-1])

    @property
    def num_unique(self) -> int:
        return len(self.unique_reads)

    def base_of(self, node: int) -> int:
        """unique-read index of a node id."""
        return int(np.searchsorted(self.offsets, node, side="right") - 1)

    def out_edges(self, node: int):
        """Alive out-edge indices in insertion order."""
        return [e for e in self.adj[node] if self.alive[e]]

    def remove_edge(self, e: int) -> None:
        self.alive[e] = False

    def base_array(self) -> np.ndarray:
        """(num_nodes,) unique-read index per node id."""
        out = np.empty(self.num_nodes, dtype=np.int32)
        for u in range(self.num_unique):
            out[self.offsets[u]:self.offsets[u + 1]] = u
        return out


def dedup_reads(reads: list[str]):
    """First-occurrence-ordered (unique_reads, counts) — overlapGraphs.py:18-20."""
    counts: dict[str, int] = {}
    for r in reads:
        counts[r] = counts.get(r, 0) + 1
    unique = list(counts.keys())
    return unique, np.array([counts[r] for r in unique], dtype=np.int32)


def candidate_pairs(unique_reads: list[str], k: int) -> list[tuple[int, int]]:
    """Ordered candidate (source, target) unique-index pairs, in the exact
    enumeration order of the reference builder (overlapGraphs.py:30-53)."""
    assert k >= 0, "k-mer length must be non-negative"
    u_count = len(unique_reads)
    pairs: list[tuple[int, int]] = []
    if k > 0:
        prefix_index: dict[str, list[int]] = {}
        for u, read in enumerate(unique_reads):
            prefix = read[:k] if len(read) >= k else read
            prefix_index.setdefault(prefix, []).append(u)
        for ua, read_a in enumerate(unique_reads):
            suffix = read_a[-k:] if len(read_a) >= k else read_a
            for ub in prefix_index.get(suffix, []):
                if ua != ub:
                    pairs.append((ua, ub))
    else:
        for ua in range(u_count):
            for ub in range(u_count):
                if ua != ub:
                    pairs.append((ua, ub))
    return pairs


def candidate_pairs_arrays(unique_reads: list[str], k: int,
                           device: bool = True):
    """Ordered candidate pairs as (ia, ib) int32 index arrays.

    Same enumeration order as `candidate_pairs` (the reference's,
    overlapGraphs.py:30-53) but vectorized end to end: k=0 is a numpy
    meshgrid; 1 <= k <= 15 runs the device sort-join
    (graph/candidates.py); larger k (outside the reference's grids,
    experiments.py:53) falls back to the host dict join.
    """
    from ..core.dispatch import use_device_join
    from .candidates import (
        MAX_DEVICE_K,
        MAX_HOST_K,
        candidate_pairs_dense,
        candidate_pairs_device,
        candidate_pairs_numpy,
    )

    if k == 0:
        return candidate_pairs_dense(len(unique_reads))
    if (device and 0 < k <= MAX_DEVICE_K
            and use_device_join(len(unique_reads))):
        return candidate_pairs_device(unique_reads, k)
    if 0 < k <= MAX_HOST_K:
        # vectorized host sort-join — same order, no device round trips;
        # the small-problem arm of the size-aware dispatch (VERDICT
        # round 4, next-step #1) and the k > 15 fallback
        return candidate_pairs_numpy(unique_reads, k)
    pairs = candidate_pairs(unique_reads, k)  # dict join: k > 31 only
    ia = np.fromiter((p[0] for p in pairs), np.int32, len(pairs))
    ib = np.fromiter((p[1] for p in pairs), np.int32, len(pairs))
    return ia, ib


_GATHER_PAIRS = None


def _gather_pairs(sm, em, a, b):
    """Gather requested (a, b) entries from the all-pairs score/end
    matrices under ONE process-lifetime jit object: an inline
    jax.jit(lambda ...) builds a fresh cache per call and recompiled
    the gather every iteration (~10 s/iteration through the axon
    tunnel, round-5 third attach)."""
    global _GATHER_PAIRS
    if _GATHER_PAIRS is None:
        import jax

        _GATHER_PAIRS = jax.jit(
            lambda sm, em, a, b: (sm[a, b], em[a, b]))
    return _GATHER_PAIRS(sm, em, a, b)


def _pairs_to_arrays(pairs):
    """Normalize a pair spec — list[(ua, ub)] or an (ia, ib) array tuple —
    to int32 index arrays."""
    if (isinstance(pairs, tuple) and len(pairs) == 2
            and isinstance(pairs[0], np.ndarray)):
        return (np.ascontiguousarray(pairs[0], dtype=np.int32),
                np.ascontiguousarray(pairs[1], dtype=np.int32))
    ia = np.fromiter((p[0] for p in pairs), np.int32, len(pairs))
    ib = np.fromiter((p[1] for p in pairs), np.int32, len(pairs))
    return ia, ib


def score_pairs(unique_reads: list[str], pairs,
                chunk: int = 16384, device: bool = True):
    """Score ordered unique-read pairs with the overlap kernel.

    `pairs` is a list of (ua, ub) tuples or an (ia, ib) index-array tuple.
    Returns (scores, end_positions) int32 arrays aligned with `pairs`.

    Dense candidate sets (k=0 all-pairs, or >=5% of U^2) use the fused
    all-pairs Pallas kernel (ops/overlap_allpairs.py) and gather the
    requested entries; sparse sets batch through the chunked pair kernel.

    Feeds the global tracer's "score.pairs" stage (pairs/s — the
    BASELINE.json headline counter).
    """
    from ..utils.tracing import stage

    ia, ib = _pairs_to_arrays(pairs)
    with stage("score.pairs", items=len(ia)):
        return _score_pairs_impl(unique_reads, ia, ib, chunk, device)


def _pow2_class(n: int, lo: int = 256) -> int:
    """Smallest power-of-two >= n (>= lo): operand shapes quantize to a
    handful of classes so per-iteration/config jit caches HIT — unique
    read counts and candidate counts drift every iteration, and an exact
    shape would recompile the device kernels each time (the round-5 TPU
    session measured 17 s/iteration of pure recompilation at N=10000)."""
    c = lo
    while c < n:
        c *= 2
    return c


def _score_pairs_impl(unique_reads: list[str], ia, ib, chunk, device):
    n_pairs = len(ia)
    if n_pairs == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    width = max(len(r) for r in unique_reads)
    u_count = len(unique_reads)
    from ..core.dispatch import use_host_pair_scoring

    if device and use_host_pair_scoring(n_pairs):
        # executor swap, never a result change (bit-identical,
        # differential-tested): C++ on CPU backends (the XLA:CPU one-hot
        # matmul is ~100x slower than the C++ loop on the same host) AND
        # on accelerator backends below the pair threshold, where the
        # whole batch costs less than one tunnel round trip
        # (core/dispatch.py — VERDICT round 4, next-step #1)
        from ..native import graphcore

        left, lens = encode_batch(unique_reads, width=width, align="left")
        return graphcore.overlap_nogap_pairs(left, lens, ia, ib)
    from ..core.dispatch import accelerator_attached

    # Dense-path rule: (a) candidate density >= 5%, or (b) an attached
    # accelerator and U small enough that the fused all-pairs kernel
    # sweeps ALL U^2 slots faster than the chunked pair path can move
    # its inputs — at 1.9G pairs/s a 16384^2 sweep is ~140 ms while the
    # chunked path through the tunnel measured 11.9 s for 43k pairs
    # (round-5 follow-up session). Computing everything and gathering
    # is the TPU-first answer whenever it fits.
    dense_max_u = int(os.environ.get("GA_TPU_DENSE_MAX_U", "16384")) \
        if device else 0
    if device and (n_pairs * 20 >= u_count * u_count
                   or (accelerator_attached()
                       and u_count <= dense_max_u)):
        import jax
        import jax.numpy as jnp

        from ..ops.overlap_allpairs import overlap_scores_all_pairs_auto

        # pad the unique axis and the gather index list to power-of-two
        # shape classes: exact sizes drift per iteration and would
        # recompile the all-pairs kernel + gather every run
        u_pad = _pow2_class(u_count)
        left, lens = encode_batch(
            unique_reads + [""] * (u_pad - u_count), width=width,
            align="left")
        s_mat, e_mat = overlap_scores_all_pairs_auto(
            jnp.asarray(left), jnp.asarray(lens))
        p_pad = _pow2_class(n_pairs)
        ia_p = np.zeros(p_pad, np.int32)
        ib_p = np.zeros(p_pad, np.int32)
        ia_p[:n_pairs] = ia
        ib_p[:n_pairs] = ib
        s, e = _gather_pairs(s_mat, e_mat, jnp.asarray(ia_p),
                             jnp.asarray(ib_p))
        return (np.asarray(jax.device_get(s), dtype=np.int32)[:n_pairs],
                np.asarray(jax.device_get(e), dtype=np.int32)[:n_pairs])
    if device:
        import functools

        import jax
        import jax.numpy as jnp

        from ..ops.overlap import overlap_scores

        # unique-axis shape class (see _pow2_class): index rows beyond
        # u_count are empty reads, never selected by real pair indices
        u_pad = _pow2_class(u_count)
        padded = unique_reads + [""] * (u_pad - u_count)
        left, lens = encode_batch(padded, width=width, align="left")
        right, _ = encode_batch(padded, width=width, align="right")
        # read tensors go to the device ONCE; per chunk we ship only the
        # pair-index arrays (8 bytes/pair vs ~2*width operand bytes) and
        # gather on device — essential when the TPU sits behind a
        # low-bandwidth tunnel
        right_d = jax.device_put(right)
        left_d = jax.device_put(left)
        lens_d = jax.device_put(lens)

        # every chunk folds its results into device-resident buffers via
        # dynamic_update_slice; ONE fetch at the end collects everything.
        # The per-chunk fetch this replaces paid a ~30 ms tunnel round
        # trip per 16k pairs — a hard ~500k pairs/s ceiling no kernel
        # speed could lift (round-4 TPU session). Buffers are donated so
        # the chain updates in place.
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def chunk_into(buf_s, buf_e, r_res, l_res, len_res, sa, sb, lo):
            s, e = overlap_scores(r_res[sa], len_res[sa],
                                  l_res[sb], len_res[sb])
            return (jax.lax.dynamic_update_slice(buf_s, s, (lo,)),
                    jax.lax.dynamic_update_slice(buf_e, e, (lo,)))

        # fixed shape classes (powers of two, >=256) so XLA compiles at most
        # a handful of kernel variants regardless of candidate counts
        def shape_class(n: int) -> int:
            c = 256
            while c < n:
                c *= 2
            return min(c, chunk)

        # + chunk of slack: the final chunk's shape-class padding writes
        # garbage rows past n_pairs; slack keeps them off the real data
        # (and away from dynamic_update_slice's start-index clamping).
        # The buffer length itself quantizes to a power-of-two number of
        # chunks so chunk_into's jit cache survives drifting pair counts
        buf_len = chunk * _pow2_class(-(-(n_pairs + chunk) // chunk), 1)
        buf_s = jnp.zeros(buf_len, jnp.int32)
        buf_e = jnp.zeros(buf_len, jnp.int32)
        for lo in range(0, n_pairs, chunk):
            hi = min(lo + chunk, n_pairs)
            n = hi - lo
            pad = shape_class(n) - n
            sel_a = np.concatenate([ia[lo:hi], np.zeros(pad, np.int32)])
            sel_b = np.concatenate([ib[lo:hi], np.zeros(pad, np.int32)])
            buf_s, buf_e = chunk_into(buf_s, buf_e, right_d, left_d, lens_d,
                                      jnp.asarray(sel_a), jnp.asarray(sel_b),
                                      jnp.int32(lo))
        scores = np.asarray(jax.device_get(buf_s))[:n_pairs]
        ends = np.asarray(jax.device_get(buf_e))[:n_pairs]
        return scores, ends
    else:
        from ..ops.oracle import overlap_align_oracle

        scores = np.empty(n_pairs, np.int32)
        ends = np.empty(n_pairs, np.int32)
        for i in range(n_pairs):
            _, _, s, e = overlap_align_oracle(unique_reads[ia[i]],
                                              unique_reads[ib[i]])
            scores[i], ends[i] = s, e
        return scores, ends


def fanout_edges(ia: np.ndarray, ib: np.ndarray, scores: np.ndarray,
                 ends: np.ndarray, counts: np.ndarray, offsets: np.ndarray):
    """Expand per-unique-pair edges to per-copy-pair edges, vectorized.

    Order matches the reference's add_edge order (overlapGraphs.py:55-60):
    pair enumeration order, then copy_a-major / copy_b-minor within each
    pair — edge r of pair p has ca = r // counts[ib[p]], cb = r % counts[ib[p]].
    """
    rep = counts[ia].astype(np.int64) * counts[ib].astype(np.int64)
    total = int(rep.sum())
    pair_of_edge = np.repeat(np.arange(len(ia), dtype=np.int64), rep)
    starts = np.cumsum(rep) - rep
    within = np.arange(total, dtype=np.int64) - starts[pair_of_edge]
    cb_count = counts[ib][pair_of_edge].astype(np.int64)
    ca = within // cb_count
    cb = within % cb_count
    src = (offsets[ia][pair_of_edge] + ca).astype(np.int32)
    dst = (offsets[ib][pair_of_edge] + cb).astype(np.int32)
    return (src, dst, scores[pair_of_edge].astype(np.int32),
            ends[pair_of_edge].astype(np.int32))


def build_overlap_graph(reads: list[str], k: int = 5,
                        device: bool = True) -> OverlapGraph:
    """Full builder: dedup -> candidates -> batched scoring -> edge fanout.

    Edge order matches the reference's add_edge order exactly
    (overlapGraphs.py:43-60): pair enumeration order, then copy_a-major /
    copy_b-minor within each pair.
    """
    unique, counts = dedup_reads(reads)
    offsets = np.zeros(len(unique) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])

    ia, ib = candidate_pairs_arrays(unique, k, device=device)
    scores, ends = score_pairs(unique, (ia, ib), device=device)
    src, dst, weight, end_pos = fanout_edges(ia, ib, scores, ends,
                                             counts, offsets)
    return OverlapGraph(unique_reads=unique, counts=counts, offsets=offsets,
                        src=src, dst=dst, weight=weight, end_pos=end_pos)
