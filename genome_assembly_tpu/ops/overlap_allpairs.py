"""All-pairs / block overlap scoring as a fused Pallas TPU kernel.

The chunked MXU formulation in `ops/overlap.py` computes, per pair, an
(L x L) correlation matrix with a contraction size of only 5 channels —
~4% MXU utilisation — and round-trips it through HBM before the diagonal
reduction. For dense pair workloads (reference `overlapGraphs.py:49`
with k=0: every ordered pair of distinct reads is scored) there is a far
better mapping to the systolic array:

For an overlap end position j, the no-gap overlap score (reference
`aligners.py:6-82` semantics, SURVEY.md §2.2-C1) of every pair (i, t) is

    matches[i, t] = sum_{u,c} A[i, u, c] * Bshift_j[t, u, c]
    score[i, t]   = (match - mismatch) * matches + mismatch * min(n_i, j)

where A is the one-hot of the RIGHT-aligned source read and Bshift_j is
the one-hot of the target read shifted so that b[j-d : j] lines up with
the suffix of a. Flattening (u, c) gives ONE (Na x 4L) @ (4L x Nb)
matmul per j — K = 4L = 512: near-ideal MXU shapes — and the
first-max-over-j selection (strict >, reference `aligners.py:54-57`) is
a running elementwise update that stays RESIDENT IN VMEM across the
whole j sweep. Nothing of size (Na, Nb, L) ever touches HBM.

Implementation notes (measured on v5e, N=1024 / L=100):
- The shifted one-hot stack is built WITHOUT gathers: the flattened
  one-hot row of read t, zero-extended on the left, yields Bshift_j as
  the static window [4j : 4j + 4L) — l static slices that XLA fuses
  into one copy (an index-array gather here costs ~18 ms; this costs
  <2 ms).
- Grid is (rows/TM, cols/TN, L/JC) with the j axis innermost so the
  (TM, TN) best/end accumulators are revisited in VMEM; JC overlap
  positions are processed per grid step to amortise the ~4 us per-step
  overhead that otherwise dominates (1600 steps of 67 MFLOP each).
  Best measured config: TM=TN=512, JC=5 -> ~1.1 ms per 1024x1024 sweep
  (~950M pairs/s) vs ~7 ms un-chunked.
- bf16 one-hot operands with f32 accumulation: exact for counts <= L
  (Mosaic's s8 dot lowering VMEM-OOMs on this pattern).

The rectangular `overlap_scores_block` is the shard_map building block:
the distributed layer row-shards the pair matrix and each device scores
its (N/D, N) block (parallel/sharded.py).

Exactness: bit-identical to the reference DP's no-gap degenerate form
for the default penalties (match=10, mismatch=-1, indel=-2**31; see
SURVEY.md §2.2-C1 for why gaps are never selected).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.encoding import PAD
from .overlap import right_align


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(a_ref, bsh_ref, alen_ref, blen_ref, best_ref, end_ref,
            *, match_score: int, mismatch: int, k: int, jc: int):
    jstep = pl.program_id(2)

    @pl.when(jstep == 0)
    def _():
        # j=0: empty overlap, score 0 at end 0 (dp[n][0] == 0).
        best_ref[:] = jnp.zeros_like(best_ref)
        end_ref[:] = jnp.zeros_like(end_ref)

    for q in range(jc):  # static unroll: JC overlap positions per step
        j = jstep * jc + q + 1
        matches = jax.lax.dot_general(
            a_ref[:], bsh_ref[:, q * k:(q + 1) * k],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # (TM, TN)
        matches = matches.astype(jnp.int32)             # exact: counts <= L
        d = jnp.minimum(alen_ref[:, 0:1], j)            # valid cells min(n,j)
        score = (match_score - mismatch) * matches + mismatch * d
        valid = (j <= blen_ref[:, 0])[None, :]          # j beyond len(b): skip
        upd = valid & (score > best_ref[:])             # strict > = first max
        best_ref[:] = jnp.where(upd, score, best_ref[:])
        end_ref[:] = jnp.where(upd, j, end_ref[:])


def _shift_stack(oh_flat: jax.Array, l: int, k: int, ljc: int) -> jax.Array:
    """(N, k) flattened one-hots -> (N, ljc*k) shifted windows.

    Window j (1-based) is the slice [4j, 4j + k) of the zero-extended
    row: element v of Bshift_j is element v - 4*(lp - j) of the one-hot
    (rows v = 4u + c, shift by whole slots = 4 rows per position).
    """
    npad = oh_flat.shape[0]
    z = jnp.concatenate(
        [jnp.zeros((npad, k), oh_flat.dtype), oh_flat], axis=1)
    windows = [jax.lax.slice_in_dim(z, 4 * j, 4 * j + k, axis=1)
               for j in range(1, l + 1)]
    if ljc > l:  # pad the j axis: zero windows are masked by j <= len(b)
        windows += [jnp.zeros((npad, k), oh_flat.dtype)] * (ljc - l)
    return jnp.concatenate(windows, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("match_score", "mismatch", "tm", "tn", "jc",
                     "interpret"))
def overlap_scores_block(a_codes: jax.Array, a_len: jax.Array,
                         b_codes: jax.Array, b_len: jax.Array,
                         match_score: int = 10, mismatch: int = -1,
                         tm: int = 512, tn: int = 512, jc: int = 5,
                         interpret: bool = False):
    """Score the (Na x Nb) block of ordered pairs (a_i, b_t).

    Args:
        a_codes: (Na, L) int8 LEFT-aligned source reads (PAD-padded).
        a_len:   (Na,) int32 true lengths.
        b_codes: (Nb, L) int8 LEFT-aligned target reads.
        b_len:   (Nb,) int32.
        tm, tn:  output tile sizes; jc: overlap positions per grid step.

    Returns:
        (score, end_pos): (Na, Nb) int32 arrays. Self/duplicate pairs are
        NOT excluded here (reference `overlapGraphs.py:52` — callers do).
    """
    na, l = a_codes.shape
    nb, lb = b_codes.shape
    assert l == lb, "source and target reads must share the padded width"
    lp = _round_up(max(l, 32), 32)          # 4*lp is a lane multiple of 128
    k = 4 * lp
    tm = min(tm, _round_up(na, 8))
    tn = min(tn, _round_up(nb, 128))
    mpad = _round_up(na, tm)
    npad = _round_up(nb, tn)
    lc = -(-l // jc)                        # grid steps along j
    ljc = lc * jc                           # j padded to a multiple of jc

    a_codes = jnp.pad(a_codes, ((0, mpad - na), (0, lp - l)),
                      constant_values=PAD)
    b_codes = jnp.pad(b_codes, ((0, npad - nb), (0, lp - l)),
                      constant_values=PAD)
    a_len = jnp.pad(a_len, (0, mpad - na)).astype(jnp.int32)
    b_len = jnp.pad(b_len, (0, npad - nb)).astype(jnp.int32)

    # A: one-hot of right-aligned source reads, flattened (u, c) -> 4*lp.
    a_right = right_align(a_codes, a_len)
    a_flat = jax.nn.one_hot(a_right, 4, dtype=jnp.bfloat16).reshape(mpad, k)

    oh_flat = jax.nn.one_hot(b_codes, 4, dtype=jnp.bfloat16).reshape(npad, k)
    bsh = _shift_stack(oh_flat, l, k, ljc)               # (npad, ljc*k)

    grid = (mpad // tm, npad // tn, lc)
    best, end = pl.pallas_call(
        functools.partial(_kernel, match_score=match_score,
                          mismatch=mismatch, k=k, jc=jc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, t, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, jc * k), lambda i, t, j: (t, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, t, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, t, j: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, tn), lambda i, t, j: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda i, t, j: (i, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mpad, npad), jnp.int32),
            jax.ShapeDtypeStruct((mpad, npad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ljc * mpad * npad * k,
            bytes_accessed=(mpad // tm) * ljc * k * npad + mpad * k
            + 8 * mpad * npad,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(a_flat, bsh, a_len[:, None], b_len[:, None])
    return best[:na, :nb], end[:na, :nb]


def overlap_scores_all_pairs(codes: jax.Array, lengths: jax.Array,
                             match_score: int = 10, mismatch: int = -1,
                             tm: int = 512, tn: int = 512, jc: int = 5,
                             interpret: bool = False):
    """Square all-pairs case of `overlap_scores_block` (same read set as
    both source and target, i == t diagonal included)."""
    return overlap_scores_block(
        codes, lengths, codes, lengths, match_score=match_score,
        mismatch=mismatch, tm=tm, tn=tn, jc=jc, interpret=interpret)


def overlap_scores_all_pairs_auto(codes, lengths, match_score: int = 10,
                                  mismatch: int = -1):
    """Platform-dispatching wrapper: Pallas on TPU, XLA reference otherwise."""
    codes = jnp.asarray(codes)
    lengths = jnp.asarray(lengths)
    if jax.default_backend() == "tpu":
        return overlap_scores_all_pairs(codes, lengths,
                                        match_score=match_score,
                                        mismatch=mismatch)
    return overlap_scores_all_pairs_xla(
        codes, lengths, match_score=match_score, mismatch=mismatch)


def overlap_scores_block_xla(a_codes: jax.Array, a_len: jax.Array,
                             b_codes: jax.Array, b_len: jax.Array,
                             match_score: int = 10, mismatch: int = -1):
    """Same block contraction in pure XLA (lax.scan over j).

    Used on CPU (tests, meshes simulated with host devices) and as an
    independent cross-check of the Pallas kernel. Identical outputs.
    shard_map-compatible: no jit decorator of its own, no host callbacks.
    """
    na, l = a_codes.shape
    nb = b_codes.shape[0]
    a_len = a_len.astype(jnp.int32)
    b_len = b_len.astype(jnp.int32)
    a_right = right_align(a_codes, a_len)
    a_flat = jax.nn.one_hot(a_right, 4, dtype=jnp.float32).reshape(na, 4 * l)
    oh_b = jax.nn.one_hot(b_codes, 4, dtype=jnp.float32)  # (nb, l, 4)

    def step(carry, j):
        best, end = carry
        src = jnp.arange(l, dtype=jnp.int32) + j - l
        in_win = (src >= 0) & (src < l)
        bsh = oh_b[:, jnp.clip(src, 0, l - 1), :]
        bsh = jnp.where(in_win[None, :, None], bsh, 0.0).reshape(nb, 4 * l)
        matches = jnp.dot(a_flat, bsh.T,
                          preferred_element_type=jnp.float32)
        matches = jnp.rint(matches).astype(jnp.int32)
        d = jnp.minimum(a_len[:, None], j)
        score = (match_score - mismatch) * matches + mismatch * d
        valid = (j <= b_len)[None, :]
        upd = valid & (score > best)
        return (jnp.where(upd, score, best), jnp.where(upd, j, end)), None

    # derive the zero init from the inputs so its sharding/varying-axis
    # type matches the body output under shard_map (scan-vma rule)
    zero = (a_len[:, None] * 0 + b_len[None, :] * 0).astype(jnp.int32)
    (best, end), _ = jax.lax.scan(step, (zero, zero),
                                  jnp.arange(1, l + 1, dtype=jnp.int32))
    return best, end


@functools.partial(jax.jit, static_argnames=("match_score", "mismatch"))
def overlap_scores_all_pairs_xla(codes: jax.Array, lengths: jax.Array,
                                 match_score: int = 10, mismatch: int = -1):
    """Square all-pairs case of `overlap_scores_block_xla`."""
    return overlap_scores_block_xla(codes, lengths, codes, lengths,
                                    match_score=match_score,
                                    mismatch=mismatch)


def overlap_scores_all_pairs_host(codes: np.ndarray, lengths: np.ndarray,
                                  match_score: int = 10, mismatch: int = -1):
    """Numpy oracle for the all-pairs kernel (slow; tests only)."""
    from .overlap import overlap_scores_host

    n = codes.shape[0]
    ia, ib = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    s, e = overlap_scores_host(codes[ia.ravel()], codes[ib.ravel()],
                               lengths[ia.ravel()], lengths[ib.ravel()],
                               match_score=match_score, mismatch=mismatch)
    return s.reshape(n, n), e.reshape(n, n)
