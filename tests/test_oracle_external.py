"""De-correlated oracle tests.

The reference validates its kernels against Biopython's C PairwiseAligner
(aligners.py:205-274). Biopython is not in this image, so:

1. `test_biopython_differential` runs IF biopython (or parasail) is ever
   installed — opt-in third-party differential (VERDICT round 1, #9).
2. `test_cpp_full_dp_vs_device_nogap` is always on: the C++ engine's FULL
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
