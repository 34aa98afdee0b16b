"""Batched Smith-Waterman local alignment (contig/read -> reference genome).

Reference semantics (aligners.py:85-167): dp clamped at 0, tie-break cascade
diag>=up>=left with each candidate additionally required >= 0, global best
tracked with strict > in row-major order (first maximum wins), traceback from
the best cell until score 0 / matrix edge / code 0.

TPU-native design: instead of an anti-diagonal wavefront (which would need
n+m sequential steps), we scan over *query rows* only (n steps). The intra-row
"left" dependency dp[i][j] = max(..., dp[i][j-1] + indel) is a max-plus prefix
scan, solved in closed form with a cumulative max:

    dp[i][j] = cummax_j( c0[j] - indel*j ) + indel*j,
    c0[j]    = max(diag[j], up[j], 0)

so each row is O(m) vector work (one cummax) and the whole batch is a
`lax.scan` of n steps over (B, m+1) lanes. Traceback codes are emitted
per-row with the exact reference cascade evaluated *after* the row values are
known (left uses the final dp of the previous column), with code 0 stored
wherever dp == 0 so the host traceback reproduces the reference's
"while dp > 0" stop condition exactly.

Best-cell selection: row scan order == the reference's row-major outer loop,
and jnp.argmax picks the first (lowest-j) maximum within a row, so strict ">"
updates across rows reproduce first-max-in-row-major-order bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("match_score", "mismatch", "indel"))
def local_align_batch(queries: jax.Array, q_len: jax.Array, refs: jax.Array,
                      r_len: jax.Array, match_score: int = 10,
                      mismatch: int = -1, indel: int = -1):
    """Batched local alignment.

    Args:
        queries: (B, n_pad) int8, LEFT-aligned.
        q_len:   (B,) int32.
        refs:    (B, m_pad) int8, LEFT-aligned (per-item reference windows —
                 the full genome broadcast, or the tail window of
                 aligners.py:186-195).
        r_len:   (B,) int32.

    Returns:
        best:   (B,) int32 best score (0 if no positive cell).
        best_i: (B,) int32 query end row (1-based; 0 if none).
        best_j: (B,) int32 reference end column = end position.
        codes:  (n_pad, B, m_pad+1) uint8 traceback codes, codes[i-1, b, j]
                is the code of cell (i, j); 0 encodes "stop" (dp == 0).
    """
    B, n_pad = queries.shape
    m_pad = refs.shape[1]
    jcol = jnp.arange(m_pad + 1, dtype=jnp.int32)[None, :]      # (1, m+1)
    neg_indel = jnp.int32(-indel)

    valid_j = (jcol >= 1) & (jcol <= r_len[:, None])             # (B, m+1)
    # reference chars per column j (j>=1 uses refs[:, j-1])
    ref_chars = jnp.concatenate(
        [jnp.full((B, 1), 127, dtype=refs.dtype), refs], axis=1)  # (B, m+1)

    def step(carry, i):
        prev, best, bi, bj = carry                               # prev: (B, m+1) int32
        qc = jax.lax.dynamic_slice_in_dim(queries, i - 1, 1, axis=1)  # (B, 1)
        sub = jnp.where(ref_chars == qc, match_score, mismatch).astype(jnp.int32)
        diag = jnp.roll(prev, 1, axis=1) + sub                   # prev[j-1] + sub
        diag = jnp.where(jcol == 0, jnp.int32(-(2**28)), diag)
        up = prev + indel
        c0 = jnp.maximum(jnp.maximum(diag, up), 0)
        c0 = jnp.where(valid_j, c0, 0)                           # outside ref -> 0
        # max-plus prefix scan for the left chain
        key = c0 + neg_indel * jcol
        run = jax.lax.cummax(key, axis=1)
        row = run - neg_indel * jcol                             # dp[i][j]
        row = jnp.where(jcol == 0, 0, row)
        left = jnp.roll(row, 1, axis=1) + indel
        left = jnp.where(jcol == 0, jnp.int32(-(2**28)), left)
        # exact reference cascade (aligners.py:122-132)
        code = jnp.where(
            (diag >= up) & (diag >= left) & (diag >= 0), jnp.uint8(1),
            jnp.where((up >= left) & (up >= 0), jnp.uint8(2),
                      jnp.where(left >= 0, jnp.uint8(3), jnp.uint8(0))))
        code = jnp.where(row > 0, code, jnp.uint8(0))
        code = jnp.where(valid_j, code, jnp.uint8(0))
        # best-cell tracking (row-major first strict max)
        row_masked = jnp.where(valid_j, row, -1)
        r_arg = jnp.argmax(row_masked, axis=1).astype(jnp.int32)
        r_max = jnp.take_along_axis(row_masked, r_arg[:, None], axis=1)[:, 0]
        improve = (r_max > best) & (i <= q_len)
        best = jnp.where(improve, r_max, best)
        bi = jnp.where(improve, i, bi)
        bj = jnp.where(improve, r_arg, bj)
        return (row, best, bi, bj), code

    init = (jnp.zeros((B, m_pad + 1), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32))
    (_, best, bi, bj), codes = jax.lax.scan(
        step, init, jnp.arange(1, n_pad + 1, dtype=jnp.int32))
    return best, bi, bj, codes


@functools.partial(jax.jit, static_argnames=("max_steps",))
def traceback_device(codes: jax.Array, best_i: jax.Array, best_j: jax.Array,
                     max_steps: int):
    """Walk the traceback ON DEVICE, emitting a compact per-step op stream.

    The round-2 design fetched the whole (n_pad, B, m_pad+1) traceback-code
    tensor to host (~360 MB for one k=0 contig batch over the low-bandwidth
    tunnel — VERDICT round 2, weak #8 / missing #1). The walk itself is a
    tiny sequential gather chain, so it runs here as a `lax.scan` over the
    device-resident code tensor; the host receives only the (max_steps, B)
    uint8 op stream (~100 KB) and replays it against the strings it already
    holds (`replay_ops_host`).

    Args:
        codes:  (n_pad, B, m_pad+1) uint8 from `local_align_batch`.
        best_i: (B,) int32 1-based best row.
        best_j: (B,) int32 best column.
        max_steps: static walk bound (n_pad + m_pad covers any path).

    Returns:
        ops:     (max_steps, B) uint8 — codes along the path from the best
                 cell backwards; 0 marks the stop (and everything after).
        start_j: (B,) int32 — the reference column where the walk stopped =
                 the reference's start position (aligners.py:161).
    """
    B = codes.shape[1]
    lane = jnp.arange(B, dtype=jnp.int32)

    def step(carry, _):
        i, j, active = carry
        safe_i = jnp.maximum(i - 1, 0)
        safe_j = jnp.maximum(j, 0)
        c = codes[safe_i, lane, safe_j]
        c = jnp.where(active & (i > 0) & (j > 0), c, jnp.uint8(0))
        i = i - jnp.where((c == 1) | (c == 2), 1, 0).astype(i.dtype)
        j = j - jnp.where((c == 1) | (c == 3), 1, 0).astype(j.dtype)
        active = active & (c != 0)
        return (i, j, active), c

    (_, j_end, _), ops = jax.lax.scan(
        step, (best_i, best_j, jnp.ones_like(best_i, dtype=bool)),
        None, length=max_steps)
    return ops, j_end


@functools.partial(jax.jit, static_argnames=("match_score", "mismatch",
                                             "indel"))
def local_align_batch_ops(queries: jax.Array, q_len: jax.Array,
                          refs: jax.Array, r_len: jax.Array,
                          match_score: int = 10, mismatch: int = -1,
                          indel: int = -1):
    """Fused batched local alignment + device traceback.

    One jit: the (n_pad, B, m_pad+1) code tensor never leaves the device.
    Returns (best, best_i, best_j, ops, start_j) — see `traceback_device`.
    """
    best, bi, bj, codes = local_align_batch(
        queries, q_len, refs, r_len, match_score=match_score,
        mismatch=mismatch, indel=indel)
    ops, start_j = traceback_device(
        codes, bi, bj, max_steps=queries.shape[1] + refs.shape[1])
    return best, bi, bj, ops, start_j


@functools.partial(jax.jit, static_argnames=("band", "match_score",
                                             "mismatch", "indel"))
def local_align_batch_banded(queries: jax.Array, q_len: jax.Array,
                             refs: jax.Array, r_len: jax.Array,
                             d0: jax.Array, band: int,
                             match_score: int = 10, mismatch: int = -1,
                             indel: int = -1):
    """Banded batched local alignment + device traceback (SURVEY §5
    long-context item b; VERDICT round 2, next-step #8).

    Restricts the Smith-Waterman DP to the diagonal band
    |j - i - d0| <= band around a per-item center diagonal `d0` (from
    `seed_diagonal`, k-mer vote). Because SW cells are clamped at 0, the
    out-of-band boundary behaves exactly like a fresh local-alignment
    start: diagonal moves into the band read in-band predecessors only,
    and edge gap moves from outside (masked to -inf) could never win
    against the 0 clamp anyway — so this is precisely full SW restricted
    to paths inside the band. Banded score <= full score, with equality
    (score, end, traceback) whenever the optimal path fits in the band.

    Row work and the traceback-code tensor shrink from O(m) to O(band):
    (n_pad, B, 2*band+1) codes instead of (n_pad, B, m_pad+1) — the
    enabler for genomes >> PhiX where full-width rows are the wall
    (reference aligners.py:85-167 scans the full genome per row).

    Args:
        d0: (B,) int32 — center diagonal (j - i) per item.
        band: static half-width; band width is 2*band + 1.

    Returns:
        (best, best_i, best_j, ops, start_j) — global coordinates,
        same contract as `local_align_batch_ops`.
    """
    B, n_pad = queries.shape
    m_pad = refs.shape[1]
    shared_ref = refs.shape[0] == 1 and B > 1
    wb = 2 * band + 1
    t = jnp.arange(wb, dtype=jnp.int32)[None, :]                 # (1, wb)
    neg_indel = jnp.int32(-indel)
    neg_inf = jnp.int32(-(2**28))

    def step(carry, i):
        prev, best, bi, bt = carry                               # prev: (B, wb)
        jlo = d0 - band + i                                      # (B,)
        j = jlo[:, None] + t                                     # (B, wb) global col
        valid_j = (j >= 1) & (j <= r_len[:, None]) & (i <= q_len)[:, None]
        jc = jnp.clip(j - 1, 0, m_pad - 1)
        # refs may be a single shared row (the long-genome case: one
        # genome, many contigs — materializing B copies would cost
        # O(B*m) memory for a kernel that only reads O(band) per row)
        rc = refs[0][jc] if shared_ref else \
            jnp.take_along_axis(refs, jc, axis=1)                # (B, wb)
        qc = jax.lax.dynamic_slice_in_dim(queries, i - 1, 1, axis=1)
        sub = jnp.where(rc == qc, match_score, mismatch).astype(jnp.int32)
        diag = prev + sub                                        # prev[t] = dp[i-1][j-1]
        up = jnp.concatenate([prev[:, 1:],
                              jnp.full((B, 1), neg_inf)], axis=1) + indel
        c0 = jnp.maximum(jnp.maximum(diag, up), 0)
        c0 = jnp.where(valid_j, c0, 0)
        key = c0 + neg_indel * t
        run = jax.lax.cummax(key, axis=1)
        row = run - neg_indel * t                                # dp[i][j] in band
        left = jnp.concatenate([jnp.full((B, 1), neg_inf),
                                row[:, :-1]], axis=1) + indel
        code = jnp.where(
            (diag >= up) & (diag >= left) & (diag >= 0), jnp.uint8(1),
            jnp.where((up >= left) & (up >= 0), jnp.uint8(2),
                      jnp.where(left >= 0, jnp.uint8(3), jnp.uint8(0))))
        code = jnp.where((row > 0) & valid_j, code, jnp.uint8(0))
        row = jnp.where(valid_j, row, 0)
        row_masked = jnp.where(valid_j, row, -1)
        r_arg = jnp.argmax(row_masked, axis=1).astype(jnp.int32)
        r_max = jnp.take_along_axis(row_masked, r_arg[:, None], axis=1)[:, 0]
        improve = r_max > best
        best = jnp.where(improve, r_max, best)
        bi = jnp.where(improve, i, bi)
        bt = jnp.where(improve, r_arg, bt)
        return (row, best, bi, bt), code

    init = (jnp.zeros((B, wb), jnp.int32), jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32))
    (_, best, bi, bt), codes = jax.lax.scan(
        step, init, jnp.arange(1, n_pad + 1, dtype=jnp.int32))
    hit = best > 0
    best_j = jnp.where(hit, d0 - band + bi + bt, 0)              # global column

    # band-coordinate walk: diag (1) -> (i-1, t); up (2) -> (i-1, t+1);
    # left (3) -> (i, t-1). Codes at band edges were masked, so t stays
    # in range whenever the code is nonzero.
    lane = jnp.arange(B, dtype=jnp.int32)

    def wstep(carry, _):
        i, tt, active = carry
        safe_i = jnp.maximum(i - 1, 0)
        safe_t = jnp.clip(tt, 0, wb - 1)
        c = codes[safe_i, lane, safe_t]
        jg = d0 - band + i + tt
        c = jnp.where(active & (i > 0) & (jg > 0), c, jnp.uint8(0))
        i = i - jnp.where((c == 1) | (c == 2), 1, 0).astype(i.dtype)
        tt = tt + jnp.where(c == 2, 1, 0).astype(tt.dtype) \
            - jnp.where(c == 3, 1, 0).astype(tt.dtype)
        active = active & (c != 0)
        return (i, tt, active), c

    # walk bound: #diag + #up <= n_pad (each consumes a query row) and
    # #left <= #up + band width (t stays in [0, 2*band]), so total steps
    # <= 2*n_pad + 2*band + 1 — NOT n_pad + 2*band (an insertion-rich
    # path interleaves up/left beyond that; review finding round 3)
    (i_end, t_end, _), ops = jax.lax.scan(
        wstep, (bi, bt, jnp.ones_like(bi, dtype=bool)),
        None, length=2 * n_pad + 2 * band + 1)
    start_j = jnp.where(hit, d0 - band + i_end + t_end, 0)
    return best, jnp.where(hit, bi, 0), best_j, ops, start_j


def seed_diagonal(query: str, genome_index: dict, genome_len: int,
                  k: int = 15) -> int | None:
    """Vote the dominant alignment diagonal d = ref_pos - query_pos from
    exact k-mer hits (host, numpy). Returns None when the query has no
    k-mer hit at all (caller falls back to full-width alignment)."""
    n = len(query)
    if n < k:
        return None
    votes: dict[int, int] = {}
    for u in range(0, n - k + 1):
        for pos in genome_index.get(query[u:u + k], ()):
            d = pos - u
            votes[d] = votes.get(d, 0) + 1
    if not votes:
        return None
    return max(votes.items(), key=lambda kv: (kv[1], -abs(kv[0])))[0]


@functools.lru_cache(maxsize=4)
def genome_kmer_index(genome: str, k: int = 15) -> dict:
    """{k-mer: (positions...)} over the genome (host, cached per genome).

    Single-query convenience path; the metrics pass uses the numpy
    sorted-hash index (`genome_hash_index` + `seed_diagonals_batch`)
    instead — O(genome) Python dict builds and per-contig Python vote
    loops were the host wall at 10k-contig scale (advisor round 3)."""
    idx: dict[str, list[int]] = {}
    for pos in range(len(genome) - k + 1):
        idx.setdefault(genome[pos:pos + k], []).append(pos)
    return {km: tuple(ps) for km, ps in idx.items()}


@functools.lru_cache(maxsize=4)
def genome_hash_index(genome: str, k: int = 15):
    """Sorted base-4 k-mer hash index over the genome, fully vectorized.

    Returns (hashes, positions): int64/int32 arrays sorted by (hash, pos).
    Memory is O(genome) (two arrays), not the ~100x dict-of-tuples
    footprint of `genome_kmer_index`. k <= 31 keeps 4**k in int64.
    """
    from ..core.encoding import encode

    assert 0 < k <= 31, "base-4 hash needs k <= 31 for int64"
    codes = encode(genome).astype(np.int64)
    n_win = len(genome) - k + 1
    if n_win <= 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int32)
    pw = 4 ** np.arange(k - 1, -1, -1, dtype=np.int64)
    h = np.zeros(n_win, np.int64)
    for t in range(k):                     # k adds of an O(genome) vector
        h += codes[t:t + n_win] * pw[t]
    # windows touching a non-ACGT code (>= 4) are not real k-mers
    bad = codes >= 4
    if bad.any():
        w = np.zeros(n_win, bool)
        for t in range(k):
            w |= bad[t:t + n_win]
        keep = ~w
        h, pos = h[keep], np.nonzero(keep)[0].astype(np.int32)
    else:
        pos = np.arange(n_win, dtype=np.int32)
    order = np.argsort(h, kind="stable")   # stable: ascending pos per hash
    return h[order], pos[order]


def seed_diagonals_batch(contigs: list[str], genome: str, k: int = 15,
                         chunk_elems: int = 4_000_000):
    """Batched k-mer diagonal seeding for the metrics pass (numpy).

    For every contig, finds all exact k-mer hits against the genome and
    aggregates them per diagonal d = genome_pos - contig_pos. Returns
    (d0, d_lo, d_hi, has_hit):

      d0:      (U,) int32 — the vote-winning diagonal (most hits; ties
               break to smallest |d|, then smallest d);
      d_lo/hi: (U,) int32 — min/max diagonal over ALL hits (a band
               covering [d_lo, d_hi] contains every exact-match segment,
               which under the substitution-only error model is where
               any high-scoring alignment path lives);
      has_hit: (U,) bool — False where the contig has no k-mer hit
               (callers fall back to full-width alignment).

    Vectorized end to end: rolling base-4 hashes per contig row,
    searchsorted into the genome's sorted hash index, np.repeat hit
    expansion, np.unique vote counting. Contigs are processed in
    length-sorted chunks so the (rows, windows) hash matrix stays under
    `chunk_elems` elements even when one contig is genome-sized.
    """
    from ..core.encoding import encode_batch

    u_count = len(contigs)
    d0 = np.zeros(u_count, np.int32)
    d_lo = np.zeros(u_count, np.int32)
    d_hi = np.zeros(u_count, np.int32)
    has = np.zeros(u_count, bool)
    if u_count == 0:
        return d0, d_lo, d_hi, has
    gh, gpos = genome_hash_index(genome, k)
    if len(gh) == 0:
        return d0, d_lo, d_hi, has
    lens = np.array([len(c) for c in contigs], np.int64)
    by_len = np.argsort(lens, kind="stable")
    pw = 4 ** np.arange(k - 1, -1, -1, dtype=np.int64)

    lo = 0
    while lo < u_count:
        hi = lo + 1
        width = int(lens[by_len[lo]])
        while hi < u_count:
            w = int(lens[by_len[hi]])
            if w >= k and (hi - lo + 1) * (w - k + 1) > chunk_elems:
                break
            width = w
            hi += 1
        idx = by_len[lo:hi]
        lo = hi
        if width < k:
            continue                       # every contig here is too short
        rows = [contigs[i] for i in idx]
        mat, rlen = encode_batch(rows, width=width)
        n_win = width - k + 1
        h = np.zeros((len(rows), n_win), np.int64)
        m64 = mat.astype(np.int64)
        for t in range(k):
            h += m64[:, t:t + n_win] * pw[t]
        u_col = np.arange(n_win, dtype=np.int64)[None, :]
        valid = u_col <= (rlen[:, None].astype(np.int64) - k)
        h = np.where(valid, h, np.int64(-1))          # -1 < all genome hashes
        flat = h.ravel()
        s_lo = np.searchsorted(gh, flat, side="left")
        s_hi = np.searchsorted(gh, flat, side="right")
        cnt = s_hi - s_lo
        total = int(cnt.sum())
        if total == 0:
            continue
        starts = np.cumsum(cnt) - cnt
        within = np.arange(total, dtype=np.int64) - np.repeat(starts, cnt)
        hit_pos = gpos[np.repeat(s_lo, cnt) + within].astype(np.int64)
        flat_idx = np.repeat(np.arange(flat.size, dtype=np.int64), cnt)
        hit_row = flat_idx // n_win                    # chunk-local row
        hit_u = flat_idx % n_win
        d = hit_pos - hit_u                            # diagonal
        # vote per (row, d): encode as one key, count with np.unique
        off = np.int64(n_win)                          # d >= -(n_win - 1)
        mod = np.int64(len(genome) + n_win + 1)
        uk, ucnt = np.unique(hit_row * mod + (d + off), return_counts=True)
        uk_row = uk // mod
        uk_d = uk % mod - off
        # winner per row: most votes, then smallest |d|, then smallest d
        order = np.lexsort((uk_d, np.abs(uk_d), -ucnt, uk_row))
        row_sorted = uk_row[order]
        first = np.ones(len(order), bool)
        first[1:] = row_sorted[1:] != row_sorted[:-1]
        win_rows = row_sorted[first]
        g_idx = idx[win_rows]
        d0[g_idx] = uk_d[order[first]].astype(np.int32)
        has[g_idx] = True
        # d range per row: uk is sorted by (row, d+off) already
        fr = np.ones(len(uk), bool)
        fr[1:] = uk_row[1:] != uk_row[:-1]
        starts_r = np.nonzero(fr)[0]
        ends_r = np.r_[starts_r[1:], len(uk)] - 1
        rng_idx = idx[uk_row[starts_r]]
        d_lo[rng_idx] = uk_d[starts_r].astype(np.int32)
        d_hi[rng_idx] = uk_d[ends_r].astype(np.int32)
    return d0, d_lo, d_hi, has


def replay_ops_host(ops_col: np.ndarray, best_i: int, best_j: int,
                    query: str, reference: str):
    """Rebuild the aligned strings from a device op stream.

    Exactly `traceback_host` semantics (reference aligners.py:139-161), but
    reading the path codes from the compact (max_steps,) stream emitted by
    `traceback_device` instead of the full code matrix. Vectorized (one
    numpy pass over the path instead of a per-step Python loop): at
    10k-contig metrics scale the replay used to cost more than the C++
    DP it decodes (round-4 long-genome finding).
    """
    ops = np.asarray(ops_col)
    stop = np.nonzero(ops == 0)[0]
    n = int(stop[0]) if len(stop) else len(ops)
    if n == 0:
        return "", "", int(best_j)
    c = ops[:n]
    qmove = (c == 1) | (c == 2)              # consumes a query char
    rmove = (c == 1) | (c == 3)              # consumes a reference char
    # positions consumed at each (backwards) step: exclusive prefix counts
    qpos = int(best_i) - 1 - (np.cumsum(qmove) - qmove)
    rpos = int(best_j) - 1 - (np.cumsum(rmove) - rmove)
    qb = np.frombuffer(query.encode("ascii"), np.uint8)
    rb = np.frombuffer(reference.encode("ascii"), np.uint8)
    dash = np.uint8(ord("-"))
    aq = np.where(qmove, qb[np.clip(qpos, 0, max(len(qb) - 1, 0))], dash)
    ar = np.where(rmove, rb[np.clip(rpos, 0, max(len(rb) - 1, 0))], dash)
    start_j = int(best_j) - int(rmove.sum())
    return (ar[::-1].tobytes().decode("ascii"),
            aq[::-1].tobytes().decode("ascii"), start_j)


def traceback_host(codes: np.ndarray, best_i: int, best_j: int,
                   query: str, reference: str):
    """Rebuild the aligned strings from device traceback codes.

    codes: (n_pad, m_pad+1) uint8 for one item (codes[i-1, j] = cell (i,j)).
    Returns (aligned_ref, aligned_query, start_pos) — reference
    aligners.py:139-161 semantics (code 0 stops, start = final j).
    """
    i, j = int(best_i), int(best_j)
    aq: list[str] = []
    ar: list[str] = []
    while i > 0 and j > 0:
        code = int(codes[i - 1, j])
        if code == 1:
            aq.append(query[i - 1])
            ar.append(reference[j - 1])
            i -= 1
            j -= 1
        elif code == 2:
            aq.append(query[i - 1])
            ar.append("-")
            i -= 1
        elif code == 3:
            aq.append("-")
            ar.append(reference[j - 1])
            j -= 1
        else:
            break
    return "".join(reversed(ar)), "".join(reversed(aq)), j


def local_align_one(query: str, reference: str, match_score: int = 10,
                    mismatch: int = -1, indel: int = -1):
    """Single-pair convenience wrapper (device DP + host traceback).

    Returns (aligned_ref, aligned_query, score, start, end) like the oracle.
    """
    from ..core.encoding import encode

    n, m = len(query), len(reference)
    if n == 0 or m == 0:
        return "", "", 0, 0, 0
    q = jnp.asarray(encode(query))[None, :]
    r = jnp.asarray(encode(reference))[None, :]
    best, bi, bj, codes = local_align_batch(
        q, jnp.array([n], jnp.int32), r, jnp.array([m], jnp.int32),
        match_score=match_score, mismatch=mismatch, indel=indel)
    codes_np = np.asarray(codes)[:, 0, :]
    ar, aq, start = traceback_host(codes_np, int(bi[0]), int(bj[0]), query, reference)
    return ar, aq, int(best[0]), start, int(bj[0])
