"""Parity tests for the all-pairs overlap kernel (Pallas + XLA variants).

Both must reproduce the reference no-gap overlap DP (aligners.py:6-82,
SURVEY.md §2.2-C1) exactly: same scores AND same first-max end positions,
on ragged random batches.
"""

import numpy as np
import pytest

from genome_assembly_tpu.core.encoding import encode_batch
from genome_assembly_tpu.ops.overlap_allpairs import (
    overlap_scores_all_pairs,
    overlap_scores_all_pairs_host,
    overlap_scores_all_pairs_xla,
)


def _random_reads(rng, n, l):
    reads = []
    for _ in range(n):
        ln = rng.integers(1, l + 1)
        reads.append("".join(rng.choice(list("ACGT"), ln)))
    return reads


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(7)
    reads = _random_reads(rng, 24, 12)
    codes, lengths = encode_batch(reads, width=12, align="left")
    oracle = overlap_scores_all_pairs_host(codes, lengths)
    return codes, lengths, oracle


def test_xla_allpairs_matches_oracle(batch):
    codes, lengths, (s0, e0) = batch
    s, e = overlap_scores_all_pairs_xla(codes, lengths)
    np.testing.assert_array_equal(np.asarray(s), s0)
    np.testing.assert_array_equal(np.asarray(e), e0)


def test_pallas_allpairs_matches_oracle(batch):
    codes, lengths, (s0, e0) = batch
    s, e = overlap_scores_all_pairs(codes, lengths, tm=8, tn=128,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(s), s0)
    np.testing.assert_array_equal(np.asarray(e), e0)


def test_nondefault_penalties(batch):
    codes, lengths, _ = batch
    s0, e0 = overlap_scores_all_pairs_host(
        np.asarray(codes), np.asarray(lengths), match_score=3, mismatch=-2)
    s, e = overlap_scores_all_pairs_xla(codes, lengths,
                                        match_score=3, mismatch=-2)
    np.testing.assert_array_equal(np.asarray(s), s0)
    np.testing.assert_array_equal(np.asarray(e), e0)
    sp, ep = overlap_scores_all_pairs(codes, lengths, match_score=3,
                                      mismatch=-2, tm=8, tn=128,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(sp), s0)
    np.testing.assert_array_equal(np.asarray(ep), e0)


def test_fixed_length_reads():
    rng = np.random.default_rng(3)
    reads = ["".join(rng.choice(list("ACGT"), 16)) for _ in range(16)]
    reads[3] = reads[0]  # duplicate reads also score correctly
    codes, lengths = encode_batch(reads, width=16, align="left")
    s0, e0 = overlap_scores_all_pairs_host(codes, lengths)
    s, e = overlap_scores_all_pairs_xla(codes, lengths)
    np.testing.assert_array_equal(np.asarray(s), s0)
    np.testing.assert_array_equal(np.asarray(e), e0)


def test_rectangular_block():
    rng = np.random.default_rng(11)
    a = _random_reads(rng, 10, 12)
    b = _random_reads(rng, 18, 12)
    from genome_assembly_tpu.ops.overlap_allpairs import (
        overlap_scores_block,
        overlap_scores_block_xla,
    )
    from genome_assembly_tpu.ops.overlap import overlap_scores_host

    ca, la = encode_batch(a, width=12, align="left")
    cb, lb = encode_batch(b, width=12, align="left")
    ia, ib = np.meshgrid(np.arange(10), np.arange(18), indexing="ij")
    s0, e0 = overlap_scores_host(ca[ia.ravel()], cb[ib.ravel()],
                                 la[ia.ravel()], lb[ib.ravel()])
    s0, e0 = s0.reshape(10, 18), e0.reshape(10, 18)
    s, e = overlap_scores_block_xla(ca, la, cb, lb)
    np.testing.assert_array_equal(np.asarray(s), s0)
    np.testing.assert_array_equal(np.asarray(e), e0)
    sp, ep = overlap_scores_block(ca, la, cb, lb, tm=8, tn=128,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(sp), s0)
    np.testing.assert_array_equal(np.asarray(ep), e0)


def test_shift_chain_kernel_matches_matmul_and_xla(rng):
    """The scratch-carried shift-chain kernel (GA_TPU_SHIFT=chain; no
    shift matmuls) must be bit-identical to the shift-matrix kernel and
    the XLA twin, including ragged lengths and the l ~ lp edge."""
    import jax.numpy as jnp

    from conftest import random_dna

    from genome_assembly_tpu.core.encoding import encode_batch
    from genome_assembly_tpu.ops.overlap_allpairs import (
        overlap_scores_all_pairs_xla,
        overlap_scores_block,
    )

    for n, l in ((16, 12), (24, 60), (8, 127)):
        reads = [random_dna(rng, rng.randint(max(1, l - 6), l))
                 for _ in range(n)]
        codes, lens = encode_batch(reads, width=l, align="left")
        c, ln = jnp.asarray(codes), jnp.asarray(lens)
        s0, e0 = overlap_scores_all_pairs_xla(c, ln)
        s2, e2 = overlap_scores_block(c, ln, c, ln, interpret=True,
                                      shift="chain")
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(s0))
        np.testing.assert_array_equal(np.asarray(e2), np.asarray(e0))
