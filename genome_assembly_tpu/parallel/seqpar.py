"""Sequence-parallel Smith-Waterman: the genome axis sharded across chips.

SURVEY.md §5 (long-context row) calls for "ring-pass genome blocks across
chips during the contig→genome local alignment" — the ring-attention-style
sequence/context-parallel analog. This module implements it exactly (not
approximately): the reference axis of the row-scan SW kernel
(ops/smith_waterman.py) is block-sharded over a mesh axis, and each DP row
is completed with two O(B) neighbour/collective exchanges that ride ICI:

- a `ppermute` halo: cell (i, j) needs dp[i-1][j-1] and dp[i][j-1]; the
  first column of each block gets them from the left neighbour's last
  column (device 0 reads the dp[·][0] = 0 boundary).
- a cross-block prefix-max carry: the intra-row left chain
  dp[i][j] = max(..., dp[i][j-1] + indel) is a max-plus prefix scan,
  cummax(key)[j] + indel·j with key = c0[j] - indel·j (see
  ops/smith_waterman.py). cummax distributes: each block computes its
  local cummax, `all_gather`s its block total, and folds in the max of
  all left-of-it blocks — an exclusive max-scan over the device axis.

Best-cell selection reproduces the reference's row-major first-strict-max
(aligners.py:135-137) globally: each device tracks the first strict max
over its own columns inside the scan, and one post-scan gather resolves
the global winner by (value desc, row asc, device asc). Together with the
shared halo ppermute (the diag halo of row i+1 IS the left halo of row i)
that leaves TWO collectives per DP row — one ppermute, one all_gather for
the inherently sequential left-chain carry — down from five in the
round-3 version. Traceback codes stay sharded — each device stores only
its (n, B, G/D) slice, which is the long-context memory win.

Bit-for-bit identical to `local_align_batch` on a replicated genome (the
parity test runs both on an 8-device CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

# plain int: a module-level jnp scalar would initialise the XLA backend at
# import time, which breaks jax.distributed.initialize in worker processes
NEG = -(2**28)


def _seqpar_body(queries, q_len, genome_blk, g_len, *, axis: str,
                 match_score: int, mismatch: int, indel: int):
    """Per-device body. queries (B, n_pad) replicated; genome_blk (Gb,)
    this device's genome block; g_len scalar true genome length.

    Collective budget: TWO collectives per DP row (one ppermute + one
    all_gather), down from five in the round-3 version (VERDICT round 3,
    weak #6):

    - the diag halo for row i+1 and the left halo for row i both move
      row i's last column to the right neighbour — ONE ppermute, used in
      this step and carried into the next;
    - best-cell tracking is per-device inside the scan (each device
      tracks the first strict max over ITS columns in row-major order)
      and resolved to the global row-major first max ONCE after the
      scan, removing the two per-row argmax all_gathers. The remaining
      per-row all_gather is the cross-block carry of the left-chain
      prefix max, which is inherently sequential in j.
    """
    B, n_pad = queries.shape
    gb = genome_blk.shape[0]
    d = jax.lax.axis_index(axis)
    n_dev = jax.lax.axis_size(axis)
    off = d.astype(jnp.int32) * gb
    jglob = off + 1 + jnp.arange(gb, dtype=jnp.int32)            # (Gb,) 1-based
    valid_j = (jglob <= g_len)[None, :]                          # (1, Gb)
    neg_indel = jnp.int32(-indel)
    ref_chars = genome_blk[None, :]                              # (1, Gb)
    # exclusive left-of-me mask over the device axis, for the carry fold
    dev_ids = jnp.arange(n_dev, dtype=jnp.int32)
    left_of_me = (dev_ids < d)[:, None]                          # (D, 1)
    perm = [(i, i + 1) for i in range(n_dev - 1)]                # send right

    def step(carry, i):
        prev, halo_prev, best, bi, bj = carry                    # prev (B, Gb)
        qc = jax.lax.dynamic_slice_in_dim(queries, i - 1, 1, axis=1)  # (B, 1)
        sub = jnp.where(ref_chars == qc, match_score,
                        mismatch).astype(jnp.int32)              # (B, Gb)
        # halo: dp[i-1][j-1] for the first local column came from the left
        # neighbour's last column via LAST step's ppermute (device 0: the
        # dp[·][0] = 0 boundary, which is ppermute's zero fill)
        diag = jnp.concatenate([halo_prev[:, None], prev[:, :-1]],
                               axis=1) + sub
        up = prev + indel
        c0 = jnp.maximum(jnp.maximum(diag, up), 0)
        c0 = jnp.where(valid_j, c0, 0)                           # beyond G -> 0
        # distributed max-plus prefix scan for the left chain
        key = c0 + neg_indel * jglob[None, :]
        run = jax.lax.cummax(key, axis=1)                        # local cummax
        tmax = run[:, -1]                                        # block total
        totals = jax.lax.all_gather(tmax, axis)                  # (D, B)
        cin = jnp.max(jnp.where(left_of_me, totals, NEG), axis=0)  # (B,)
        row = jnp.maximum(run, cin[:, None]) - neg_indel * jglob[None, :]
        # ONE ppermute of this row's last column serves as both the left
        # halo of THIS row and the diag halo of the NEXT row
        halo_row = jax.lax.ppermute(row[:, -1], axis, perm)
        left = jnp.concatenate([halo_row[:, None], row[:, :-1]],
                               axis=1) + indel
        # exact reference cascade (aligners.py:122-132)
        code = jnp.where(
            (diag >= up) & (diag >= left) & (diag >= 0), jnp.uint8(1),
            jnp.where((up >= left) & (up >= 0), jnp.uint8(2),
                      jnp.where(left >= 0, jnp.uint8(3), jnp.uint8(0))))
        code = jnp.where(row > 0, code, jnp.uint8(0))
        code = jnp.where(valid_j, code, jnp.uint8(0))
        # per-device first-strict-max tracking over LOCAL columns only;
        # the cross-device resolution happens once after the scan
        row_masked = jnp.where(valid_j, row, -1)
        l_arg = jnp.argmax(row_masked, axis=1).astype(jnp.int32)  # (B,)
        l_max = jnp.take_along_axis(row_masked, l_arg[:, None], axis=1)[:, 0]
        improve = (l_max > best) & (i <= q_len)
        best = jnp.where(improve, l_max, best)
        bi = jnp.where(improve, i, bi)
        bj = jnp.where(improve, off + 1 + l_arg, bj)             # global j
        return (row, halo_row, best, bi, bj), code

    init = (jnp.zeros((B, gb), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32))
    (_, _, l_best, l_bi, l_bj), codes = jax.lax.scan(
        step, init, jnp.arange(1, n_pad + 1, dtype=jnp.int32))
    # global row-major first strict max from the D per-device candidates:
    # the winner is the device attaining the global max value at the
    # smallest row; ties on the row resolve to the smallest device index
    # (= smallest global j, since devices partition j in order). A device
    # whose local max equals the global max recorded its FIRST local
    # attainment, so (value desc, bi asc, device asc) reproduces the
    # reference's scan order exactly (aligners.py:135-137).
    bests = jax.lax.all_gather(l_best, axis)                     # (D, B)
    bis = jax.lax.all_gather(l_bi, axis)                         # (D, B)
    bjs = jax.lax.all_gather(l_bj, axis)                         # (D, B)
    g_best = jnp.max(bests, axis=0)                              # (B,)
    cand = bests == g_best[None, :]
    bi_masked = jnp.where(cand, bis, jnp.int32(2**30))
    d_win = jnp.argmin(bi_masked, axis=0)                        # first row,
    # jnp.argmin takes the first minimum -> smallest device index on ties
    best = g_best
    bi = jnp.take_along_axis(bis, d_win[None, :], axis=0)[0]
    bj = jnp.take_along_axis(bjs, d_win[None, :], axis=0)[0]
    hit = best > 0
    bi = jnp.where(hit, bi, 0)
    bj = jnp.where(hit, bj, 0)
    # best/bi/bj are identical on every device (computed from all_gathers);
    # codes stay sharded along the genome axis
    return best, bi, bj, codes


def local_align_batch_seqpar(mesh: Mesh, queries, q_len, genome_codes,
                             g_len: int, axis: str = "data",
                             match_score: int = 10, mismatch: int = -1,
                             indel: int = -1):
    """Sequence-parallel batched SW against ONE shared reference.

    Args:
        queries: (B, n_pad) int8 LEFT-aligned.
        q_len:   (B,) int32.
        genome_codes: (Gp,) int8, padded so the mesh axis divides Gp.
        g_len:   true genome length (<= Gp).

    Returns (best, best_i, best_j, codes) exactly like
    `ops.smith_waterman.local_align_batch` on a replicated genome, except
    codes has shape (n_pad, B, Gp) (no j=0 column; codes[i-1, b, j-1] is
    the code of cell (i, j)).
    """
    gp = genome_codes.shape[0]
    n_dev = mesh.shape[axis]
    assert gp % n_dev == 0, (
        f"padded genome length {gp} not divisible by mesh axis "
        f"'{axis}' size {n_dev}")

    body = functools.partial(_seqpar_body, axis=axis,
                             match_score=match_score, mismatch=mismatch,
                             indel=indel)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None), P(None), P(axis), P()),
        out_specs=(P(None), P(None), P(None), P(None, None, axis)),
        check_vma=False)
    return fn(queries, q_len, genome_codes,
              jnp.int32(g_len))


def _seqpar_body_pipelined(queries, q_len, genome_blk, g_len, *, axis: str,
                           rows: int, n_blocks: int, match_score: int,
                           mismatch: int, indel: int):
    """Systolic row-block pipeline (VERDICT round 4, stretch #9): rows
    are processed in blocks of R with the devices SKEWED one block apart
    (device d works on row-block t-d at step t). All cross-device state a
    block needs from its left neighbour — the R final last-column values
    (diag/left halos) and the R accumulated left-chain carries — moves in
    ONE (2, R, B) ppermute per step, so the collective count drops from
    2 rows-per-collective-pair * n_pad to n_blocks + D - 1 total (R*2 x
    fewer), at the price of D-1 pipeline-fill steps. The carry itself is
    pipelined: each device folds its local cummax total into the
    received carry and passes it right, replacing the per-row all_gather
    (an exclusive max-scan over devices computed systolically instead of
    collectively). Bit-identical to `_seqpar_body` (parity-tested).
    """
    B, n_pad_r = queries.shape
    gb = genome_blk.shape[0]
    d = jax.lax.axis_index(axis)
    n_dev = jax.lax.axis_size(axis)
    off = d.astype(jnp.int32) * gb
    jglob = off + 1 + jnp.arange(gb, dtype=jnp.int32)            # 1-based
    valid_j = (jglob <= g_len)[None, :]
    neg_indel = jnp.int32(-indel)
    ref_chars = genome_blk[None, :]
    perm = [(i, i + 1) for i in range(n_dev - 1)]                # send right
    t_total = n_blocks + n_dev - 1

    def row_step(carry, r):
        prev, halo_diag0, best, bi, bj, tb, active = carry[:7]
        slab_last, slab_carry = carry[7], carry[8]
        i = tb * rows + r + 1                                    # global row
        qc = jax.lax.dynamic_slice(queries, (jnp.int32(0), i - 1),
                                   (B, 1))                        # (B, 1)
        sub = jnp.where(ref_chars == qc, match_score,
                        mismatch).astype(jnp.int32)
        halo_left = slab_last[r]                                 # (B,)
        halo_diag = jnp.where(r == 0, halo_diag0, slab_last[r - 1])
        cin = slab_carry[r]                                      # (B,)
        diag = jnp.concatenate([halo_diag[:, None], prev[:, :-1]],
                               axis=1) + sub
        up = prev + indel
        c0 = jnp.maximum(jnp.maximum(diag, up), 0)
        c0 = jnp.where(valid_j, c0, 0)
        key = c0 + neg_indel * jglob[None, :]
        run = jax.lax.cummax(key, axis=1)
        # systolic carry fold: received cin is the max over ALL left
        # devices' block totals (each hop folded its own tmax in)
        row = jnp.maximum(run, cin[:, None]) - neg_indel * jglob[None, :]
        carry_out = jnp.maximum(cin, run[:, -1])
        left = jnp.concatenate([halo_left[:, None], row[:, :-1]],
                               axis=1) + indel
        code = jnp.where(
            (diag >= up) & (diag >= left) & (diag >= 0), jnp.uint8(1),
            jnp.where((up >= left) & (up >= 0), jnp.uint8(2),
                      jnp.where(left >= 0, jnp.uint8(3), jnp.uint8(0))))
        code = jnp.where(row > 0, code, jnp.uint8(0))
        code = jnp.where(valid_j, code, jnp.uint8(0))
        row_masked = jnp.where(valid_j, row, -1)
        l_arg = jnp.argmax(row_masked, axis=1).astype(jnp.int32)
        l_max = jnp.take_along_axis(row_masked, l_arg[:, None],
                                    axis=1)[:, 0]
        improve = (l_max > best) & (i <= q_len) & active
        best = jnp.where(improve, l_max, best)
        bi = jnp.where(improve, i, bi)
        bj = jnp.where(improve, off + 1 + l_arg, bj)
        new_carry = (row, halo_diag0, best, bi, bj, tb, active,
                     slab_last, slab_carry)
        return new_carry, (code, row[:, -1], carry_out)

    def step(carry, t):
        prev, halo_diag0, slab, best, bi, bj = carry
        tb = t - d.astype(jnp.int32)
        tb_c = jnp.clip(tb, 0, n_blocks - 1)
        active = (tb >= 0) & (tb < n_blocks)
        # entering my first block: dp row 0 is the zero boundary
        first = tb <= 0
        prev = jnp.where(first, 0, prev)
        halo_diag0 = jnp.where(first, 0, halo_diag0)
        inner = (prev, halo_diag0, best, bi, bj, tb_c, active,
                 slab[0], slab[1])
        inner, (codes_blk, lastcols, carries) = jax.lax.scan(
            row_step, inner, jnp.arange(rows, dtype=jnp.int32))
        prev, best, bi, bj = inner[0], inner[2], inner[3], inner[4]
        # ONE collective per step: halos + carries for the block the
        # right neighbour processes next step
        slab_next = jax.lax.ppermute(
            jnp.stack([lastcols, carries]), axis, perm)          # (2, R, B)
        halo_diag0 = slab[0][rows - 1]     # left's last row of this block
        return (prev, halo_diag0, slab_next, best, bi, bj), codes_blk

    init = (jnp.zeros((B, gb), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((2, rows, B), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32))
    (_, _, _, l_best, l_bi, l_bj), codes_all = jax.lax.scan(
        step, init, jnp.arange(t_total, dtype=jnp.int32))
    # codes_all: (T, R, B, Gb); my valid blocks are steps d .. d+n_blocks
    idx = d.astype(jnp.int32) + jnp.arange(n_blocks, dtype=jnp.int32)
    codes = jnp.take(codes_all, idx, axis=0).reshape(
        n_blocks * rows, B, gb)
    # global first-strict-max resolution: identical to _seqpar_body
    bests = jax.lax.all_gather(l_best, axis)
    bis = jax.lax.all_gather(l_bi, axis)
    bjs = jax.lax.all_gather(l_bj, axis)
    g_best = jnp.max(bests, axis=0)
    cand = bests == g_best[None, :]
    bi_masked = jnp.where(cand, bis, jnp.int32(2**30))
    d_win = jnp.argmin(bi_masked, axis=0)
    best = g_best
    bi = jnp.take_along_axis(bis, d_win[None, :], axis=0)[0]
    bj = jnp.take_along_axis(bjs, d_win[None, :], axis=0)[0]
    hit = best > 0
    bi = jnp.where(hit, bi, 0)
    bj = jnp.where(hit, bj, 0)
    return best, bi, bj, codes


def local_align_batch_seqpar_pipelined(mesh: Mesh, queries, q_len,
                                       genome_codes, g_len: int,
                                       rows_per_exchange: int = 8,
                                       axis: str = "data",
                                       match_score: int = 10,
                                       mismatch: int = -1,
                                       indel: int = -1):
    """Row-block-pipelined variant of `local_align_batch_seqpar`: one
    (2, R, B) ppermute per R DP rows per device hop instead of one
    ppermute + one all_gather per row — n_pad/R + D - 1 collectives
    total. Same outputs; codes rows are padded up to a multiple of
    `rows_per_exchange` (slice [:n_pad] to compare)."""
    gp = genome_codes.shape[0]
    n_dev = mesh.shape[axis]
    assert gp % n_dev == 0, (
        f"padded genome length {gp} not divisible by mesh axis "
        f"'{axis}' size {n_dev}")
    B, n_pad = queries.shape
    rows = max(1, min(rows_per_exchange, n_pad))
    n_blocks = -(-n_pad // rows)
    pad = n_blocks * rows - n_pad
    if pad:
        queries = jnp.pad(queries, ((0, 0), (0, pad)),
                          constant_values=np.int8(4))
    body = functools.partial(_seqpar_body_pipelined, axis=axis, rows=rows,
                             n_blocks=n_blocks, match_score=match_score,
                             mismatch=mismatch, indel=indel)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None), P(None), P(axis), P()),
        out_specs=(P(None), P(None), P(None), P(None, None, axis)),
        check_vma=False)
    return fn(queries, q_len, genome_codes, jnp.int32(g_len))


def traceback_host_seqpar(codes: np.ndarray, best_i: int, best_j: int,
                          query: str, reference: str):
    """Traceback over seq-par codes ((n_pad, Gp) for one item, no j=0
    column). Same contract as ops.smith_waterman.traceback_host."""
    i, j = int(best_i), int(best_j)
    aq: list[str] = []
    ar: list[str] = []
    while i > 0 and j > 0:
        code = int(codes[i - 1, j - 1])
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
