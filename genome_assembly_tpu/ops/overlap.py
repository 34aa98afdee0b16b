"""Batched overlap-alignment scoring.

Reference semantics (aligners.py:6-82 + SURVEY.md §2.2-C1): the overlap DP is
zero-initialized on row 0 / column 0 (free overhanging ends) and, with the
default ``indel = -2**31`` promoted to int64 under Numba, gap moves are never
selected. The recurrence therefore degenerates to

    dp[i][j] = dp[i-1][j-1] + (match if s[i-1]==t[j-1] else mismatch)

so every last-row entry is a *full-diagonal sum* of the match/mismatch matrix:

    dp[n][j] = sum_{u} M[u, u + j - n],   M[i,v] = sub(s[i], t[v])

The answer is the first maximum over j in 0..m (strict >), returning
(score, end_position=argmax j).

TPU-native formulation: right-align the source read inside its padded slot
(suffix geometry becomes shift-invariant across ragged lengths); then the
last row is a 4-channel cross-correlation of one-hot encodings. We compute it
as one batched MXU matmul C[b,u,v] = rhs[b,u,:]·lhs[b,v,:] over a 4-channel
axis (3 ±1-simplex channels + a validity-mask channel — see the in-function
derivation; 4*score = (m-mm)*dot + (m+3mm)*valid_cells), followed by masked
diagonal sums — scores[b,j] =
Σ_u C[b,u,u+j-L]. Measured on TPU v5e this formulation compiles in seconds
and runs ~137M pairs/s at B=8192/L=100, vs minutes-long compiles and ~25M
pairs/s for the equivalent `conv_general_dilated(feature_group_count=B)`
lowering, and ~1000x faster at small batches. Padding contributes exactly 0
via the masked one-hots.

`overlap_align_full` keeps the complete anti-diagonal DP (arbitrary penalty
values, exact tie-break cascade diag>=up>=left) for API parity with
non-default parameters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.encoding import PAD


def right_align(reads: jax.Array, lengths: jax.Array) -> jax.Array:
    """Shift each left-aligned padded read to the right edge of its slot.

    (N, L) int8 + (N,) lengths -> (N, L) int8 with PAD on the left.

    Implemented as a log2(L) cascade of STATIC shifts with per-row
    selects (binary decomposition of each row's shift amount) instead of
    a `take_along_axis` gather: per-row gathers along the lane axis cost
    ~45 ms per N=1024 batch on the current TPU toolchain, while this
    cascade is a handful of fused elementwise ops (<0.1 ms).
    """
    n, l = reads.shape
    shift = (l - lengths).astype(jnp.int32)  # (N,) in [0, L]
    out = reads
    step = 1
    while step <= l:
        rolled = jnp.pad(out, ((0, 0), (step, 0)),
                         constant_values=PAD)[:, :l]
        take = (shift & step) != 0
        out = jnp.where(take[:, None], rolled, out)
        step <<= 1
    return out


@functools.partial(jax.jit, static_argnames=("match_score", "mismatch"))
def overlap_scores(a_right: jax.Array, a_len: jax.Array, b: jax.Array,
                   b_len: jax.Array, match_score: int = 10, mismatch: int = -1):
    """Score a batch of read pairs under the default (no-gap) overlap DP.

    Args:
        a_right: (B, L) int8 source reads, RIGHT-aligned (PAD on the left).
        a_len:   (B,) int32 true lengths of a.
        b:       (B, L) int8 target reads, LEFT-aligned.
        b_len:   (B,) int32 true lengths of b.

    Returns:
        score:   (B,) int32 — best last-row value (first max over j=0..len(b)).
        end_pos: (B,) int32 — the argmax j (overlap end position in b).
    """
    B, L = a_right.shape
    m_f, mm_f = float(match_score), float(mismatch)
    # 3-channel ±1 simplex encoding (the same trick as the fused
    # all-pairs Pallas kernel, ops/overlap_allpairs.py): map ACGT to the
    # tetrahedron vertices of {±1}^3 (PAD -> the zero vector), so the
    # 3-dot is +3 for equal bases and -1 for different ones. With
    #   dot = Σ va·vb  and  d = Σ mask_a·mask_b  (valid aligned cells)
    # the per-diagonal contraction
    #   C = (ms - mm)·dot + (ms + 3·mm)·d
    # equals 4·(per-cell score): a valid match gives 3(ms-mm) + ms+3mm
    # = 4·ms, a valid mismatch -(ms-mm) + ms+3mm = 4·mm, and any PAD
    # cell exactly 0. One /4 at the end recovers the score — 4 MXU
    # channels instead of the 5 the one-hot formulation needed (20%
    # less contraction work). All values are exact: ±1/0 inputs and
    # small integer weights are exact in bf16, partial sums are exact
    # integers in f32 (guarded below).
    assert abs(match_score - mismatch) <= 256 and \
        abs(match_score + 3 * mismatch) <= 256, (
        "channel weights must be bf16-exact integers")
    assert 4 * max(abs(match_score), abs(mismatch)) * L < 2**24, (
        "4*score exceeds the f32 exact-integer range; chunk reads")
    simplex = jnp.asarray([[1, 1, 1], [1, -1, -1], [-1, 1, -1],
                           [-1, -1, 1], [0, 0, 0]], dtype=jnp.bfloat16)
    va = simplex[a_right]                                   # (B, L, 3)
    vb = simplex[b]                                         # (B, L, 3)
    mask_a = (a_right != PAD).astype(jnp.bfloat16)[..., None]
    mask_b = (b != PAD).astype(jnp.bfloat16)[..., None]
    rhs = jnp.concatenate(
        [(m_f - mm_f) * va, (m_f + 3.0 * mm_f) * mask_a], axis=-1)  # (B, L, 4)
    lhs = jnp.concatenate([vb, mask_b], axis=-1)                    # (B, L, 4)

    # batched MXU matmul: C[b, u, v] = rhs[b, u, :] . lhs[b, v, :]
    C = jax.lax.dot_general(rhs, lhs, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # (B, L, L)
    # last row = masked diagonal sums: scores[b, j] = sum_u C[b, u, u+j-L]
    u = jnp.arange(L, dtype=jnp.int32)[:, None]             # (L, 1)
    jj = jnp.arange(L + 1, dtype=jnp.int32)[None, :]        # (1, L+1)
    v = u + jj - L                                          # (L, L+1)
    valid = (v >= 0) & (v < L)
    v_c = jnp.clip(v, 0, L - 1)
    G = jnp.take_along_axis(
        C, jnp.broadcast_to(v_c[None], (B, L, L + 1)), axis=2)
    G = jnp.where(valid[None], G, 0.0)
    scores = jnp.rint(G.sum(axis=1) * 0.25).astype(jnp.int32)  # (B, L+1)

    j = jnp.arange(L + 1, dtype=jnp.int32)[None, :]
    masked = jnp.where(j <= b_len[:, None], scores, jnp.int32(-(2**31) + 1))
    end_pos = jnp.argmax(masked, axis=1).astype(jnp.int32)  # first max wins
    score = jnp.take_along_axis(masked, end_pos[:, None], axis=1)[:, 0]
    return score, end_pos


@functools.partial(jax.jit, static_argnames=("match_score", "mismatch", "indel"))
def overlap_align_full(a: jax.Array, a_len: jax.Array, b: jax.Array,
                       b_len: jax.Array, match_score: int = 10,
                       mismatch: int = -1, indel: int = -2):
    """Full overlap DP (gaps allowed) via anti-diagonal wavefront scan.

    Exact tie-break cascade of the reference (aligners.py:40-48):
    diag if diag>=up and diag>=left; elif up>=left -> up; else left.
    `indel` is clamped to -2**24 — values below that are numerically
    indistinguishable from "never choose a gap" (dp is bounded by ±10*L)
    and clamping keeps all arithmetic exactly representable in int32.

    Args:
        a: (B, L) int8 LEFT-aligned source reads (unlike `overlap_scores`,
           the wavefront indexes rows directly so left alignment is natural).

    Returns (score, end_pos) — (B,) int32 each.
    """
    B, L = a.shape
    indel_c = max(int(indel), -(2**24))

    # dp diagonals: diag_d[i] = dp[i][d - i] for i in 0..L (cells outside the
    # valid rectangle are forced to int32-min/3 so they never win a max).
    NEG = jnp.int32(-(2**28))
    i_idx = jnp.arange(L + 1, dtype=jnp.int32)[None, :]    # (1, L+1)

    def sub_of(d):
        # substitution score entering cell (i, d-i): compares a[i-1], b[d-i-1]
        ai = jnp.take_along_axis(
            a, jnp.clip(i_idx - 1, 0, L - 1).repeat(B, axis=0), axis=1)
        bj = jnp.take_along_axis(
            b, jnp.clip(d - i_idx - 1, 0, L - 1).repeat(B, axis=0), axis=1)
        return jnp.where(ai == bj, match_score, mismatch).astype(jnp.int32)

    def step(carry, d):
        dm2, dm1 = carry                                   # diagonals d-2, d-1
        diag = jnp.roll(dm2, 1, axis=1) + sub_of(d)        # dp[i-1][d-i-1]
        up = jnp.roll(dm1, 1, axis=1) + indel_c            # dp[i-1][d-i]
        left = dm1 + indel_c                               # dp[i][d-i-1]
        take_diag = (diag >= up) & (diag >= left)
        val = jnp.where(take_diag, diag, jnp.where(up >= left, up, left))
        # boundaries: dp[0][j] = 0 and dp[i][0] = 0
        val = jnp.where(i_idx == 0, 0, val)
        val = jnp.where(i_idx == d, 0, val)
        # outside the (a_len+1, b_len+1) rectangle -> invalid
        valid = (i_idx <= a_len[:, None]) & (d - i_idx <= b_len[:, None]) & (d - i_idx >= 0)
        val = jnp.where(valid, val, NEG)
        return (dm1, val), val

    d0 = jnp.broadcast_to(jnp.where(i_idx == 0, 0, NEG), (B, L + 1))
    d1 = jnp.where((i_idx <= 1) & (i_idx <= a_len[:, None]) &
                   ((1 - i_idx) <= b_len[:, None]) & ((1 - i_idx) >= 0), 0, NEG)
    (_, _), stack = jax.lax.scan(step, (d0, d1), jnp.arange(2, 2 * L + 1, dtype=jnp.int32))
    # prepend d=0,1 diagonals so stack[d] = diagonal d
    stack = jnp.concatenate([d0[None], d1[None], stack], axis=0)  # (2L+1, B, L+1)

    # last row: dp[n][j] = stack[n + j][n], j = 0..m
    j = jnp.arange(L + 1, dtype=jnp.int32)                 # (L+1,)
    n = a_len                                              # (B,)
    dvals = jnp.clip(n[:, None] + j[None, :], 0, 2 * L)    # (B, L+1)
    # gather stack[d, b, n_b]
    per_b = jnp.take_along_axis(
        stack.transpose(1, 0, 2),                          # (B, 2L+1, L+1)
        n[:, None, None].repeat(2 * L + 1, axis=1), axis=2)[..., 0]  # (B, 2L+1)
    last_row = jnp.take_along_axis(per_b, dvals, axis=1)   # (B, L+1)
    masked = jnp.where(j[None, :] <= b_len[:, None], last_row, NEG)
    end_pos = jnp.argmax(masked, axis=1).astype(jnp.int32)
    score = jnp.take_along_axis(masked, end_pos[:, None], axis=1)[:, 0]
    return score, end_pos


def overlap_scores_host(pairs_a: np.ndarray, pairs_b: np.ndarray,
                        len_a: np.ndarray, len_b: np.ndarray,
                        match_score: int = 10, mismatch: int = -1):
    """Pure-numpy no-gap scorer (same math as `overlap_scores`), used as a
    mid-level cross-check between the Python oracle and the device kernel."""
    B, L = pairs_a.shape
    scores = np.zeros((B,), dtype=np.int32)
    ends = np.zeros((B,), dtype=np.int32)
    for p in range(B):
        n, m = int(len_a[p]), int(len_b[p])
        s = pairs_a[p, :n]
        t = pairs_b[p, :m]
        best, bj = -np.inf, 0
        for j in range(m + 1):
            d = min(n, j)
            if d == 0:
                v = 0
            else:
                seg_s = s[n - d:]
                seg_t = t[j - d:j]
                eq = seg_s == seg_t
                v = int(match_score * eq.sum() + mismatch * (~eq).sum())
            if v > best:
                best, bj = v, j
        scores[p] = best
        ends[p] = bj
    return scores, ends
