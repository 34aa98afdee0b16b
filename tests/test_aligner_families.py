"""Randomized differential kernel tests over the reference's 10 structured
case families (aligners.py:277-434, C5): device kernels vs exact host
oracles on (score, start, end) plus alignment-string reconstruction.

The reference validates against Biopython's PairwiseAligner; this image has
no Biopython, so the exact-semantics oracles (ops/oracle.py) are the ground
truth — they themselves pin the reference's verified numeric semantics
(SURVEY.md §2.2-C1/C2)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from genome_assembly_tpu.core.encoding import PAD, encode_batch
from genome_assembly_tpu.ops.oracle import (
    local_align_oracle,
    overlap_align_oracle,
)
from genome_assembly_tpu.ops.overlap import overlap_scores, right_align
from genome_assembly_tpu.ops.smith_waterman import local_align_one

R = random.Random(20260817)


def dna(n):
    return "".join(R.choice("ACGT") for _ in range(n))


def mutate(s, n_sub):
    out = list(s)
    for _ in range(n_sub):
        if not out:
            break
        i = R.randrange(len(out))
        out[i] = R.choice([c for c in "ACGT" if c != out[i]])
    return "".join(out)


def _families():
    """Ten structured case families mirroring aligners.py:283-406."""
    cases = []
    # 1. perfect matches (contained / identical)
    for _ in range(6):
        s = dna(R.randint(10, 60))
        cases.append((s, s))
        cases.append((s, s + dna(5)))
    # 2. completely disjoint
    for _ in range(6):
        cases.append(("A" * R.randint(5, 30), "C" * R.randint(5, 30)))
    # 3. short true overlaps (suffix of s == prefix of t)
    for _ in range(10):
        ov = dna(R.randint(3, 12))
        cases.append((dna(R.randint(5, 30)) + ov, ov + dna(R.randint(5, 30))))
    # 4. overlaps with mismatches
    for _ in range(10):
        ov = dna(R.randint(8, 20))
        cases.append((dna(10) + ov, mutate(ov, 2) + dna(10)))
    # 5. gap-bearing pairs (insertions in one side)
    for _ in range(10):
        ov = dna(15)
        ins = ov[:7] + dna(2) + ov[7:]
        cases.append((dna(8) + ov, ins + dna(8)))
    # 6. combined mismatch+gap
    for _ in range(10):
        ov = dna(18)
        cases.append((dna(6) + ov, mutate(ov[:9] + dna(1) + ov[9:], 2) + dna(6)))
    # 7. long sequences, short match
    for _ in range(6):
        ov = dna(6)
        cases.append((dna(80) + ov, ov + dna(80)))
    # 8. long sequences, no designed match
    for _ in range(6):
        cases.append((dna(90), dna(90)))
    # 9. repeats
    for _ in range(6):
        unit = dna(4)
        cases.append((unit * R.randint(3, 8), unit * R.randint(3, 8)))
    # 10. edge cases: empty and single-char
    cases += [("", dna(10)), (dna(10), ""), ("", ""), ("A", "A"),
              ("A", "C"), (dna(1), dna(25))]
    return cases


CASES = _families()


def test_overlap_kernel_all_families_match_oracle():
    valid = [(s, t) for s, t in CASES if s and t]
    width = max(max(len(s), len(t)) for s, t in valid)
    a, al = encode_batch([s for s, _ in valid], width=width, align="left")
    b, bl = encode_batch([t for _, t in valid], width=width, align="left")
    a_r = right_align(jnp.asarray(a), jnp.asarray(al))
    score, end = overlap_scores(a_r, jnp.asarray(al), jnp.asarray(b),
                                jnp.asarray(bl))
    score = np.asarray(score)
    end = np.asarray(end)
    for i, (s, t) in enumerate(valid):
        _, _, o_score, o_end = overlap_align_oracle(s, t)
        assert score[i] == o_score, (s, t, int(score[i]), o_score)
        assert end[i] == o_end, (s, t, int(end[i]), o_end)


def test_local_kernel_all_families_match_oracle():
    sample = [c for c in CASES if c[0] and c[1]][::3]  # every 3rd (speed)
    for s, t in sample:
        ar, aq, score, start, end = local_align_one(s, t)
        o_ar, o_aq, o_score, o_start, o_end = local_align_oracle(s, t)
        assert score == o_score, (s, t, score, o_score)
        assert (start, end) == (o_start, o_end), (s, t)
        assert (ar, aq) == (o_ar, o_aq), (s, t)


def test_overlap_kernel_nondefault_penalties():
    """The full anti-diagonal DP path (gaps allowed) vs oracle."""
    from genome_assembly_tpu.ops.overlap import overlap_align_full

    pairs = [(dna(12) + "ACGTAC", "ACGTAC" + dna(12)) for _ in range(8)]
    pairs += [(dna(20), dna(20)) for _ in range(8)]
    width = max(max(len(s), len(t)) for s, t in pairs)
    a, al = encode_batch([s for s, _ in pairs], width=width, align="left")
    b, bl = encode_batch([t for _, t in pairs], width=width, align="left")
    score, end = overlap_align_full(
        jnp.asarray(a), jnp.asarray(al), jnp.asarray(b), jnp.asarray(bl),
        match_score=10, mismatch=-1, indel=-2)
    for i, (s, t) in enumerate(pairs):
        _, _, o_score, o_end = overlap_align_oracle(s, t, indel=-2)
        assert int(score[i]) == o_score, (s, t, int(score[i]), o_score)
        assert int(end[i]) == o_end, (s, t, int(end[i]), o_end)


def test_biopython_oracle_if_available():
    Bio = pytest.importorskip("Bio")  # noqa: F841 — absent in this image
    from Bio.Align import PairwiseAligner

    aligner = PairwiseAligner()
    aligner.mode = "local"
    aligner.match_score = 10
    aligner.mismatch_score = -1
    aligner.open_gap_score = -1
    aligner.extend_gap_score = -1
    for s, t in [c for c in CASES if c[0] and c[1]][::5]:
        _, _, score, _, _ = local_align_one(s, t)
        assert score == int(aligner.score(t, s))
