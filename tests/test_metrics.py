"""Metrics parity tests against a loop-level reference replica built on the
oracle aligner (performanceMeasures.py semantics)."""

import os
import random

import numpy as np
import pytest

from genome_assembly_tpu.metrics.align_to_ref import (
    align_contigs_to_reference,
    align_read_or_contig_to_reference,
)
from genome_assembly_tpu.metrics.measures import (
    calculate_genome_coverage_and_mismatch_rate,
    calculate_measures,
    calculate_n50,
)
from genome_assembly_tpu.ops.oracle import local_align_oracle


def random_dna(r, length):
    return "".join(r.choice("ACGT") for _ in range(length))


# --- reference replicas ---

def _ref_align(contig, genome, read_length):
    """aligners.py:170-202 semantics on the oracle kernel."""
    n = len(contig)
    if n < read_length:
        ar, aq, score, start, end = local_align_oracle(contig, genome[-n:] if n else genome)
        off = len(genome) - n
        return ar, aq, score, start + off, end + off
    ar, aq, score, start, end = local_align_oracle(contig, genome)
    return ar, aq, score, start, end


def _ref_measures(contigs, genome, read_length):
    details = {}
    for c in contigs:
        ar, aq, score, start, end = _ref_align(c, genome, read_length)
        details[c] = (ar, aq, score, start, end)
    G = len(genome)
    coverage = np.zeros(G)
    mm = np.zeros(G)
    for c, (ar, aq, score, start, end) in details.items():
        coverage[start:end] += 1
        for i in range(end - start):
            if aq[i] == "-" or aq[i] != ar[i]:
                mm[start + i] += 1
    covered = np.count_nonzero(coverage)
    uncovered = G - covered
    nmm = np.count_nonzero(mm)
    return {
        "Number of Contigs": len(contigs),
        "Genome Coverage": covered / G,
        "N50": _ref_n50(contigs),
        "Mismatch Rate Aligned Regions": nmm / covered if covered else 0.0,
        "Mismatch Rate Genome Level": (nmm + uncovered) / G,
    }, details


def _ref_n50(contigs):
    lengths = sorted(map(len, contigs), reverse=True)
    cum = 0
    for length in lengths:
        cum += length
        if cum >= sum(lengths) / 2:
            return length
    return 0


def test_n50():
    assert calculate_n50(["A" * 10]) == 10
    assert calculate_n50(["A" * 8, "C" * 4, "G" * 3]) == 8
    assert calculate_n50(["AA", "CC", "GG", "TT"]) == 2
    assert calculate_n50([]) == 0
    r = random.Random(2)
    for _ in range(20):
        contigs = [random_dna(r, r.randint(1, 50)) for _ in range(r.randint(1, 30))]
        assert calculate_n50(contigs) == _ref_n50(contigs)


def test_tail_window_quirk():
    r = random.Random(4)
    genome = random_dna(r, 120)
    # short contig (< read_length) must align against genome[-len:] only
    short = genome[-15:]
    to_print, ar, aq, score, start, end = align_read_or_contig_to_reference(
        short, genome, read_length=50)
    o_ar, o_aq, o_score, o_start, o_end = _ref_align(short, genome, 50)
    assert (ar, aq, score, start, end) == (o_ar, o_aq, o_score, o_start, o_end)
    assert start >= len(genome) - 15


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_batched_alignment_matches_oracle(seed):
    r = random.Random(seed)
    genome = random_dna(r, 400)
    contigs = []
    for _ in range(12):
        i = r.randrange(350)
        c = list(genome[i:i + r.randint(20, 120)])
        for _ in range(r.randint(0, 3)):
            t = r.randrange(len(c))
            c[t] = r.choice("ACGT".replace(c[t], ""))
        contigs.append("".join(c))
    contigs.append(genome[-10:])            # tail-window case
    contigs.append(contigs[0])              # duplicate (dict collapse)
    details = align_contigs_to_reference(contigs, genome, read_length=50)
    # first-occurrence order, duplicates collapsed
    expect_keys = list(dict.fromkeys(contigs))
    assert list(details.keys()) == expect_keys
    for c in expect_keys:
        o_ar, o_aq, o_score, o_start, o_end = _ref_align(c, genome, 50)
        d = details[c]
        assert d["Alignment Score"] == o_score, c
        assert d["Start Position"] == o_start
        assert d["End Position"] == o_end
        assert d["Alignment_reference"] == o_ar
        assert d["Alignment_query"] == o_aq


@pytest.mark.parametrize("seed", [5, 6])
def test_calculate_measures_parity(seed):
    r = random.Random(seed)
    genome = random_dna(r, 300)
    reads = [genome[r.randrange(280):][:30] for _ in range(25)]
    # mutate a few
    contigs = []
    for rd in reads:
        c = list(rd)
        if r.random() < 0.4 and len(c) > 2:
            t = r.randrange(len(c))
            c[t] = r.choice("ACGT".replace(c[t], ""))
        contigs.append("".join(c))
    measures, details = calculate_measures(
        contigs, reads, len(reads), 30, 0.01, 3, genome, "t", 1, "p")
    ref_measures, _ = _ref_measures(contigs, genome, 30)
    assert measures == ref_measures


@pytest.mark.parametrize("device", [True, False])
def test_coverage_mismatch_vectorized_parity(device):
    """The vectorized scatter scan (device and numpy variants) must be
    bit-equal to the reference's per-column Python loop."""
    from genome_assembly_tpu.metrics.measures import (
        _coverage_and_mismatch_python,
        coverage_and_mismatch_vectors,
    )

    r = random.Random(777)
    genome = random_dna(r, 400)
    details = {}
    for i in range(60):
        start = r.randint(0, 390)
        end = min(400, start + r.randint(0, 60))
        span = end - start
        ar = random_dna(r, span + r.randint(0, 4))
        # query with random matches, mismatches and '-' columns
        aq = "".join(
            ar[j] if r.random() < 0.7 else ("-" if r.random() < 0.3
                                            else r.choice("ACGT"))
            for j in range(len(ar)))
        details[f"c{i}"] = {"Start Position": start, "End Position": end,
                            "Alignment_reference": ar, "Alignment_query": aq}
    # unaligned contigs are skipped
    details["miss"] = {"Start Position": -1, "End Position": -1,
                       "Alignment_reference": "", "Alignment_query": ""}
    cov_ref, mm_ref = _coverage_and_mismatch_python(details, 400)
    cov, mm = coverage_and_mismatch_vectors(details, 400, device=device)
    np.testing.assert_array_equal(cov, cov_ref)
    np.testing.assert_array_equal(mm, mm_ref)


def test_native_executor_bit_identical():
    """The C++ full-width executor (the CPU-backend default since round 4:
    gc_local_align_batch) must produce the byte-identical details dict to
    the XLA device path, across tail windows, mutated contigs, indel-rich
    chimeras, unalignable junk, duplicates, and empties."""
    from genome_assembly_tpu.native import graphcore

    if not graphcore.available():
        pytest.skip("libgraphcore.so not built")
    r = random.Random(20)
    genome = random_dna(r, 1800)
    contigs = []
    for _ in range(80):
        i = r.randrange(len(genome) - 300)
        q = list(genome[i:i + r.randint(15, 280)])
        for _ in range(r.randint(0, 30)):
            t = r.randrange(len(q))
            op = r.random()
            if op < 0.7:
                q[t] = r.choice("ACGT".replace(q[t], ""))
            elif op < 0.85:
                q.insert(t, r.choice("ACGT"))
            elif len(q) > 2:
                q.pop(t)
        contigs.append("".join(q))
    # chimeric: two distant genome segments glued (multi-diagonal path)
    contigs.append(genome[100:220] + genome[1500:1640])
    contigs += [random_dna(r, 150), "", contigs[0], genome[-25:]]
    d_native = align_contigs_to_reference(contigs, genome, 100,
                                          executor="native")
    d_xla = align_contigs_to_reference(contigs, genome, 100,
                                       executor="xla")
    assert list(d_native) == list(d_xla)
    assert d_native == d_xla


def test_seed_diagonals_batch_matches_legacy():
    """The vectorized batched seeder must agree with the per-contig dict
    seeder (advisor round 3: the dict index + Python vote loop were the
    host wall) on hit presence and d0, and its [d_lo, d_hi] range must
    contain every legacy d0."""
    from genome_assembly_tpu.ops.smith_waterman import (
        genome_kmer_index,
        seed_diagonal,
        seed_diagonals_batch,
    )

    r = random.Random(21)
    genome = random_dna(r, 2200)
    gidx = genome_kmer_index(genome, 15)
    contigs = []
    for _ in range(120):
        i = r.randrange(len(genome) - 260)
        q = list(genome[i:i + r.randint(10, 250)])
        for _ in range(r.randint(0, 15)):
            t = r.randrange(len(q))
            q[t] = r.choice("ACGT".replace(q[t], ""))
        contigs.append("".join(q))
    contigs += [random_dna(r, 140), "ACGT"]
    d0, d_lo, d_hi, has = seed_diagonals_batch(contigs, genome, k=15)
    for i, c in enumerate(contigs):
        legacy = seed_diagonal(c, gidx, len(genome), k=15)
        if legacy is None:
            assert not has[i]
        else:
            assert has[i]
            assert int(d0[i]) == legacy
            assert d_lo[i] <= legacy <= d_hi[i]


def test_banded_native_executor_matches_xla():
    """The C++ banded executor (gc_local_align_banded_batch) must produce
    the byte-identical details dict to the XLA banded path, including the
    band-edge-contact full-width redo routing."""
    from genome_assembly_tpu.native import graphcore

    if not graphcore.available():
        pytest.skip("libgraphcore.so not built")
    r = random.Random(31)
    genome = random_dna(r, 2000)
    contigs = []
    for _ in range(60):
        i = r.randrange(len(genome) - 320)
        q = list(genome[i:i + r.randint(110, 300)])
        for _ in range(r.randint(0, 25)):
            t = r.randrange(len(q))
            op = r.random()
            if op < 0.7:
                q[t] = r.choice("ACGT".replace(q[t], ""))
            elif op < 0.85:
                q.insert(t, r.choice("ACGT"))
            elif len(q) > 2:
                q.pop(t)
        contigs.append("".join(q))
    contigs.append(genome[100:250] + genome[1500:1700])   # chimeric
    contigs += [random_dna(r, 160), genome[-30:], ""]
    d_native = align_contigs_to_reference(contigs, genome, 100,
                                          banded=True, executor="native")
    d_xla = align_contigs_to_reference(contigs, genome, 100,
                                       banded=True, executor="xla")
    assert d_native == d_xla


def test_banded_stability_verified_matches_full_width():
    """Band-stability escalation (VERDICT round 4, next-step #3): the
    banded pass must return the SAME details dict as the full-width
    kernel on adversarial contigs — chimeras, indel-heavy contigs, and
    repeat-bridging contigs that the round-4 edge-contact heuristic
    could silently mis-band."""
    r = random.Random(77)
    # genome with an exact long repeat so distant diagonals carry
    # identical high-scoring content (the band-bridging trap)
    core = random_dna(r, 900)
    genome = core + random_dna(r, 200) + core[:400] + random_dna(r, 500)
    contigs = []
    for _ in range(40):
        i = r.randrange(len(genome) - 320)
        q = list(genome[i:i + r.randint(110, 300)])
        for _ in range(r.randint(0, 30)):
            t = r.randrange(len(q))
            op = r.random()
            if op < 0.6:
                q[t] = r.choice("ACGT".replace(q[t], ""))
            elif op < 0.8:
                q.insert(t, r.choice("ACGT"))
            elif len(q) > 2:
                q.pop(t)
        contigs.append("".join(q))
    contigs.append(genome[100:250] + genome[1400:1600])    # chimera
    contigs.append(genome[850:1000] + genome[950:1100])    # repeat join
    contigs += [random_dna(r, 160), genome[-35:]]
    d_banded = align_contigs_to_reference(contigs, genome, 100,
                                          banded=True)
    d_full = align_contigs_to_reference(contigs, genome, 100,
                                        banded=False)
    assert d_banded == d_full


def test_banded_auto_threshold():
    """banded="auto" must stay full-width below GA_TPU_BANDED_AUTO_MIN
    (reference-scale genomes -> exact results) and switch to verified
    banding above it (advisor round-4 medium finding: "auto" used to be
    a no-op)."""
    import genome_assembly_tpu.metrics.align_to_ref as mod

    r = random.Random(5)
    genome = random_dna(r, 3000)
    contigs = [genome[100:400], genome[1200:1500]]
    calls = []
    orig = mod.seed_diagonals_batch if hasattr(mod, "seed_diagonals_batch") \
        else None
    from genome_assembly_tpu.ops import smith_waterman as sw

    real = sw.seed_diagonals_batch

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    sw.seed_diagonals_batch = spy
    try:
        d_below = align_contigs_to_reference(contigs, genome, 100,
                                             banded="auto")
        assert not calls, "auto banded below threshold must be full-width"
        os.environ["GA_TPU_BANDED_AUTO_MIN"] = "1000"
        d_above = align_contigs_to_reference(contigs, genome, 100,
                                             banded="auto")
        assert calls, "auto banded above threshold must seed bands"
    finally:
        os.environ.pop("GA_TPU_BANDED_AUTO_MIN", None)
        sw.seed_diagonals_batch = real
    assert d_below == d_above
