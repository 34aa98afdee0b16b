"""Property-based differentials (hypothesis) over the core alignment
semantics — random shapes, lengths, and scoring parameters rather than the
fixed case families of test_aligner_families.py.

Each property pins an independently-derivable invariant:
- the XLA all-pairs contraction == the loop-level Python oracle for any
  (match, mismatch) within the packed-f32 exactness bound;
- Smith-Waterman results satisfy the weighted-Levenshtein identity
  (third-party C oracle, see test_oracle_external.py for the derivation);
- banded SW never exceeds full SW and its traceback replays to exactly
  the claimed score.

Shapes stay tiny (hypothesis runs dozens of examples); the scale-coverage
lives in the fixed-seed differential tests.
"""

import numpy as np
import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

import jax.numpy as jnp

from genome_assembly_tpu.core.encoding import encode_batch
from genome_assembly_tpu.ops.oracle import (
    local_align_oracle,
    overlap_align_oracle,
)

dna = st.text(alphabet="ACGT", min_size=0, max_size=24)


@settings(max_examples=30, deadline=None)
@given(st.lists(dna.filter(lambda s: len(s) >= 1), min_size=2, max_size=6),
       st.integers(1, 12), st.integers(-3, -1))
def test_allpairs_xla_matches_oracle(reads, match, mismatch):
    from genome_assembly_tpu.ops.overlap_allpairs import (
        overlap_scores_all_pairs_xla,
    )

    width = max(len(r) for r in reads)
    codes, lens = encode_batch(reads, width=width)
    s, e = overlap_scores_all_pairs_xla(
        jnp.asarray(codes), jnp.asarray(lens), match_score=match,
        mismatch=mismatch)
    s, e = np.asarray(s), np.asarray(e)
    for i, a in enumerate(reads):
        for j, b in enumerate(reads):
            _, _, score, end = overlap_align_oracle(
                a, b, match_score=match, mismatch=mismatch)
            assert s[i, j] == score, (a, b, match, mismatch)
            assert e[i, j] == end, (a, b, match, mismatch)


@settings(max_examples=30, deadline=None)
@given(dna, st.text(alphabet="ACGT", min_size=1, max_size=60))
def test_sw_weighted_levenshtein_identity(q, ref):
    """score == 5(|q'|+|r'|) - WeightedLev(q', r'; 6, 6, 11) for the
    gap-stripped traceback substrings — exact, third-party-checked."""
    from rapidfuzz.distance import Levenshtein as lev_rf

    ar, aq, score, start, end = local_align_oracle(q, ref)
    q_sub = aq.replace("-", "")
    r_sub = ar.replace("-", "")
    assert r_sub == ref[start:end]
    expected = 5 * (len(q_sub) + len(r_sub)) - lev_rf.distance(
        q_sub, r_sub, weights=(6, 6, 11))
    assert score == expected


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet="ACGT", min_size=8, max_size=40),
       st.text(alphabet="ACGT", min_size=20, max_size=80),
       st.integers(-10, 10), st.integers(2, 8))
def test_banded_never_exceeds_full_and_replays(q, ref, d0, band):
    from genome_assembly_tpu.ops.smith_waterman import (
        local_align_batch_banded,
        local_align_batch_ops,
        replay_ops_host,
    )

    q_mat, q_len = encode_batch([q], width=len(q))
    r_mat, r_len = encode_batch([ref], width=len(ref))
    full = local_align_batch_ops(
        jnp.asarray(q_mat), jnp.asarray(q_len),
        jnp.asarray(r_mat), jnp.asarray(r_len))
    b = local_align_batch_banded(
        jnp.asarray(q_mat), jnp.asarray(q_len),
        jnp.asarray(r_mat), jnp.asarray(r_len),
        jnp.asarray(np.array([d0], np.int32)), band)
    b_best = int(b[0][0])
    assert b_best <= int(full[0][0])
    ar_b, aq_b, _ = replay_ops_host(
        np.asarray(b[3])[:, 0], int(b[1][0]), int(b[2][0]), q, ref)
    replay_score = sum(
        10 if (x != "-" and y != "-" and x == y) else -1
        for x, y in zip(ar_b, aq_b))
    assert replay_score == b_best
