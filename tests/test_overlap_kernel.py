"""Differential tests: device overlap kernel vs exact-semantics oracle.

Case families mirror the reference's randomized self-test suite
(aligners.py:277-434): perfect matches, disjoint pairs, short overlaps,
mismatches, repeats, ragged lengths, edge cases.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from genome_assembly_tpu.core.encoding import encode_batch
from genome_assembly_tpu.ops.oracle import overlap_align_oracle
from genome_assembly_tpu.ops.overlap import (
    overlap_align_full,
    overlap_scores,
    overlap_scores_host,
    right_align,
)


def random_dna(r, length):
    return "".join(r.choice("ACGT") for _ in range(length))


def _make_cases(r):
    cases = []
    # perfect overlaps: suffix of a == prefix of b
    for _ in range(10):
        core = random_dna(r, r.randint(3, 20))
        a = random_dna(r, r.randint(0, 15)) + core
        b = core + random_dna(r, r.randint(0, 15))
        cases.append((a, b))
    # disjoint
    for _ in range(10):
        cases.append((random_dna(r, r.randint(1, 30)), random_dna(r, r.randint(1, 30))))
    # mismatched overlap
    for _ in range(10):
        core = list(random_dna(r, r.randint(5, 20)))
        a = random_dna(r, r.randint(0, 10)) + "".join(core)
        for _ in range(r.randint(1, 3)):
            i = r.randrange(len(core))
            core[i] = r.choice("ACGT".replace(core[i], ""))
        b = "".join(core) + random_dna(r, r.randint(0, 10))
        cases.append((a, b))
    # repeats
    for _ in range(5):
        pat = random_dna(r, r.randint(2, 5))
        cases.append((pat * r.randint(2, 6), pat * r.randint(2, 6)))
    # b longer than a (window case j > n)
    for _ in range(10):
        a = random_dna(r, r.randint(1, 8))
        b = random_dna(r, r.randint(10, 30))
        cases.append((a, b))
    # tiny
    cases += [("A", "A"), ("A", "T"), ("AC", "CA"), ("ACGT", "ACGT")]
    return cases


def _run_kernel(cases):
    l = max(max(len(a), len(b)) for a, b in cases)
    a_right, a_len = encode_batch([a for a, _ in cases], width=l, align="right")
    b_left, b_len = encode_batch([b for _, b in cases], width=l, align="left")
    score, end = overlap_scores(jnp.asarray(a_right), jnp.asarray(a_len),
                                jnp.asarray(b_left), jnp.asarray(b_len))
    return np.asarray(score), np.asarray(end)


def test_overlap_kernel_vs_oracle():
    r = random.Random(7)
    cases = _make_cases(r)
    score, end = _run_kernel(cases)
    for idx, (a, b) in enumerate(cases):
        _, _, o_score, o_end = overlap_align_oracle(a, b)
        assert score[idx] == o_score, (idx, a, b, score[idx], o_score)
        assert end[idx] == o_end, (idx, a, b, end[idx], o_end)


def test_overlap_host_vs_oracle():
    r = random.Random(11)
    cases = _make_cases(r)[:20]
    l = max(max(len(a), len(b)) for a, b in cases)
    a_left, a_len = encode_batch([a for a, _ in cases], width=l, align="left")
    b_left, b_len = encode_batch([b for _, b in cases], width=l, align="left")
    score, end = overlap_scores_host(a_left, b_left, a_len, b_len)
    for idx, (a, b) in enumerate(cases):
        _, _, o_score, o_end = overlap_align_oracle(a, b)
        assert score[idx] == o_score
        assert end[idx] == o_end


def test_right_align():
    mat, lens = encode_batch(["ACG", "A"], width=5, align="left")
    out = np.asarray(right_align(jnp.asarray(mat), jnp.asarray(lens)))
    ref, _ = encode_batch(["ACG", "A"], width=5, align="right")
    assert (out == ref).all()


def test_full_dp_matches_oracle_with_gaps():
    r = random.Random(3)
    cases = _make_cases(r)[:30]
    l = max(max(len(a), len(b)) for a, b in cases)
    a_left, a_len = encode_batch([a for a, _ in cases], width=l, align="left")
    b_left, b_len = encode_batch([b for _, b in cases], width=l, align="left")
    for indel in (-2, -5):
        score, end = overlap_align_full(
            jnp.asarray(a_left), jnp.asarray(a_len),
            jnp.asarray(b_left), jnp.asarray(b_len), indel=indel)
        score, end = np.asarray(score), np.asarray(end)
        for idx, (a, b) in enumerate(cases):
            _, _, o_score, o_end = overlap_align_oracle(a, b, indel=indel)
            assert score[idx] == o_score, (idx, a, b, indel, score[idx], o_score)
            assert end[idx] == o_end, (idx, a, b, indel)


def test_full_dp_default_indel_matches_nogap_kernel():
    r = random.Random(5)
    cases = _make_cases(r)[:25]
    l = max(max(len(a), len(b)) for a, b in cases)
    a_left, a_len = encode_batch([a for a, _ in cases], width=l, align="left")
    b_left, b_len = encode_batch([b for _, b in cases], width=l, align="left")
    score_f, end_f = overlap_align_full(
        jnp.asarray(a_left), jnp.asarray(a_len),
        jnp.asarray(b_left), jnp.asarray(b_len), indel=-(2**31))
    score_k, end_k = _run_kernel(cases)
    assert (np.asarray(score_f) == score_k).all()
    assert (np.asarray(end_f) == end_k).all()


def test_native_pair_scorer_bit_identical(rng):
    """The C++ CPU-backend pair scorer (gc_overlap_nogap_pairs, the
    round-4 executor swap for graph.build.score_pairs on hosts without an
    accelerator) must match ops.overlap.overlap_scores bit-for-bit on
    ragged reads with planted overlaps and duplicates."""
    import numpy as np

    from genome_assembly_tpu.native import graphcore

    if not graphcore.available():
        import pytest

        pytest.skip("libgraphcore.so not built")
    reads = [random_dna(rng, rng.randint(5, 60)) for _ in range(120)]
    for i in range(0, 120, 3):
        j = (i * 7 + 5) % 120
        ov = rng.randint(3, min(len(reads[i]), len(reads[j])))
        reads[j] = reads[i][-ov:] + reads[j][ov:]
    width = max(map(len, reads))
    left, lens = encode_batch(reads, width=width, align="left")
    ia = np.array([rng.randrange(120) for _ in range(800)], np.int32)
    ib = np.array([rng.randrange(120) for _ in range(800)], np.int32)
    s_c, e_c = graphcore.overlap_nogap_pairs(left, lens, ia, ib)
    r = right_align(jnp.asarray(left), jnp.asarray(lens))
    s_x, e_x = overlap_scores(jnp.asarray(np.asarray(r)[ia]),
                              jnp.asarray(lens[ia]),
                              jnp.asarray(left[ib]), jnp.asarray(lens[ib]))
    np.testing.assert_array_equal(s_c, np.asarray(s_x))
    np.testing.assert_array_equal(e_c, np.asarray(e_x))
