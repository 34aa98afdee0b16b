"""Assembly quality metrics.

Reference semantics (performanceMeasures.py):
- per aligned contig, coverage[start:end] += 1 (performanceMeasures.py:34);
- mismatch columns: for i in range(end-start), a column is a mismatch when
  the query char is '-' or differs from the ref char; counted into
  mismatches[start+i] (performanceMeasures.py:37-50) — note this scans the
  first (end-start) characters of the aligned strings, including '-'
  columns, exactly as the reference does;
- coverage_rate = nonzero(coverage)/G;
  mismatch_rate_aligned = nonzero(mismatch)/covered (0.0 if none covered);
  mismatch_rate_genome = (nonzero(mismatch)+uncovered)/G
  (performanceMeasures.py:61-69);
- N50 = classic mass-median over descending contig lengths
  (performanceMeasures.py:124-143);
- the measures dict uses the exact metric names of consts.py:8.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..core.config import METRIC_NAMES
from .align_to_ref import align_contigs_to_reference

_DASH = np.uint8(ord("-"))


def _shape_class(n: int) -> int:
    c = 4096
    while c < n:
        c *= 2
    return c


def _coverage_and_mismatch_python(details: dict, genome_length: int):
    """The reference's per-column interpreter loop
    (performanceMeasures.py:25-50); kept as the parity oracle for the
    vectorized path below."""
    coverage = np.zeros(genome_length)
    mismatches = np.zeros(genome_length)
    for contig, d in details.items():
        start, end = d["Start Position"], d["End Position"]
        if start == -1 or end == -1:
            continue
        coverage[start:end] += 1
        ar = d["Alignment_reference"]
        aq = d["Alignment_query"]
        for i in range(end - start):
            if aq[i] == "-" or aq[i] != ar[i]:
                mismatches[start + i] += 1
    return coverage, mismatches


@functools.lru_cache(maxsize=1)
def _scatter_device_fn():
    """One-shot device scatter: coverage via a +1/−1 difference array and
    cumsum; mismatch counts via scatter-add over aligned columns (SURVEY.md
    §2.4 metrics row — the jnp equivalent of performanceMeasures.py:25-50).
    Padding rows carry index g (coverage: trimmed slot; mismatch: dropped
    as out-of-bounds, JAX's default scatter mode). JAX import is deferred
    to first use."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("g",))
    def _scatter(pos, mm, starts, ends, g: int):
        delta = jnp.zeros(g + 1, jnp.int32).at[starts].add(1).at[ends].add(-1)
        coverage = jnp.cumsum(delta)[:g]
        mism = jnp.zeros(g, jnp.int32).at[pos].add(mm.astype(jnp.int32))
        return coverage, mism

    return _scatter


def coverage_and_mismatch_vectors(details: dict, genome_length: int,
                                  device: bool | None = None):
    """Vectorized (coverage, mismatches) count vectors, bit-equal to the
    reference loop. Per contig the aligned-column compare is one numpy
    bytes comparison; the global accumulation is a single device
    scatter-add (or np.add.at when JAX is disabled via GA_TPU_DEVICE=0)."""
    if device is None:
        device = os.environ.get("GA_TPU_DEVICE", "1") != "0"
    pos_parts, mm_parts, starts_l, ends_l = [], [], [], []
    for contig, d in details.items():
        start, end = d["Start Position"], d["End Position"]
        if start == -1 or end == -1:
            continue
        starts_l.append(start)
        ends_l.append(end)
        span = end - start
        if span <= 0:
            continue
        ar = np.frombuffer(
            d["Alignment_reference"][:span].encode("ascii"), np.uint8)
        aq = np.frombuffer(
            d["Alignment_query"][:span].encode("ascii"), np.uint8)
        mm_parts.append((aq == _DASH) | (aq != ar))
        pos_parts.append(np.arange(start, end, dtype=np.int32))
    if not starts_l:
        return np.zeros(genome_length), np.zeros(genome_length)
    starts = np.asarray(starts_l, np.int32)
    ends = np.asarray(ends_l, np.int32)
    pos = (np.concatenate(pos_parts) if pos_parts
           else np.zeros(0, np.int32))
    mm = (np.concatenate(mm_parts) if mm_parts
          else np.zeros(0, bool))
    if device:
        import jax

        g = genome_length
        # pad to shape classes (index g = dropped/trimmed) so XLA compiles
        # a handful of scatter variants, not one per contig count
        cp = _shape_class(len(pos))
        sp = _shape_class(len(starts))
        pos_p = np.full(cp, g, np.int32); pos_p[:len(pos)] = pos
        mm_p = np.zeros(cp, bool); mm_p[:len(mm)] = mm
        st_p = np.full(sp, g, np.int32); st_p[:len(starts)] = starts
        en_p = np.full(sp, g, np.int32); en_p[:len(ends)] = ends
        cov, mis = _scatter_device_fn()(pos_p, mm_p, st_p, en_p, g)
        return (np.asarray(jax.device_get(cov), np.int64).astype(float),
                np.asarray(jax.device_get(mis), np.int64).astype(float))
    coverage = np.zeros(genome_length + 1, np.int64)
    np.add.at(coverage, starts, 1)
    np.add.at(coverage, ends, -1)
    coverage = np.cumsum(coverage)[:genome_length].astype(float)
    mismatches = np.zeros(genome_length, np.int64)
    np.add.at(mismatches, pos[mm], 1)
    return coverage, mismatches.astype(float)


def calculate_n50(contigs: list[str]) -> int:
    lengths = sorted((len(c) for c in contigs), reverse=True)
    total = sum(lengths)
    cum = 0
    for length in lengths:
        cum += length
        if cum >= total / 2:
            return length
    return 0


def calculate_genome_coverage_and_mismatch_rate(
        contigs_alignment_details: dict, reference_genome: str,
        expected_coverage: float, experiment_name: str, num_iteration: int,
        path: str = "plots", plot_hooks=None):
    """Returns (coverage_rate, mismatch_rate_aligned, mismatch_rate_genome)."""
    genome_length = len(reference_genome)
    coverage, mismatches = coverage_and_mismatch_vectors(
        contigs_alignment_details, genome_length)

    if plot_hooks is not None:
        # reference gating (performanceMeasures.py:53-58): skip flat coverage
        # on iterations beyond the first
        if not (num_iteration != 1 and np.all(coverage == coverage[0])):
            plot_hooks["coverage"](coverage, genome_length, experiment_name,
                                   num_iteration, path)
            plot_hooks["depth"](coverage, expected_coverage, genome_length,
                                experiment_name, num_iteration, path)

    covered = int(np.count_nonzero(coverage))
    uncovered = genome_length - covered
    coverage_rate = covered / genome_length
    n_mismatch = int(np.count_nonzero(mismatches))
    mismatch_rate_aligned = n_mismatch / covered if covered > 0 else 0.0
    mismatch_rate_genome = (n_mismatch + uncovered) / genome_length
    return coverage_rate, mismatch_rate_aligned, mismatch_rate_genome


def calculate_mismatch_rate_aligned_regions(contigs_alignment_details: dict,
                                            reference_genome: str) -> float:
    """Dead-code metric variant kept for capability parity
    (performanceMeasures.py:76-121, never called in the live path)."""
    genome_length = len(reference_genome)
    total_mm = 0
    total_aligned = 0
    for contig, d in contigs_alignment_details.items():
        start, end = d["Start Position"], d["End Position"]
        if start == -1 or end == -1:
            continue
        total_aligned += end - start
        c_seq = contig[max(0, -start): min(len(contig), len(contig) + (genome_length - end))]
        r_seq = reference_genome[max(0, start): min(genome_length, end)]
        m = min(len(c_seq), len(r_seq))
        if m > 0:
            total_mm += sum(a != b for a, b in zip(c_seq[:m], r_seq[:m]))
    if total_aligned == 0:
        return 0.0
    rate = (total_mm / total_aligned) * (total_aligned / genome_length)
    return min(1.0, max(0.0, rate))


def calculate_mismatch_rate_full_genome(contigs_alignment_details: dict,
                                        reference_genome: str,
                                        coverage: np.ndarray) -> float:
    """Dead-code metric variant (performanceMeasures.py:146-187)."""
    genome_length = len(reference_genome)
    total_mm = 0
    for contig, d in contigs_alignment_details.items():
        start, end = d["Start Position"], d["End Position"]
        if start == -1 or end == -1:
            continue
        c_seq = contig[max(0, -start): min(len(contig), len(contig) + (genome_length - end))]
        r_seq = reference_genome[max(0, start): min(genome_length, end)]
        m = min(len(c_seq), len(r_seq))
        if m > 0:
            total_mm += sum(a != b for a, b in zip(c_seq[:m], r_seq[:m]))
    total_mm += int(np.count_nonzero(coverage == 0))
    return min(1.0, total_mm / genome_length)


def calculate_measures(contigs: list[str], reads: list[str], num_reads: int,
                       reads_length: int, error_prob: float, k: int,
                       ref_genome: str, experiment_name: str,
                       num_iteration: int, path: str = "plots",
                       plot_hooks=None, verbose: bool = False,
                       banded: bool | str = "auto", band: int = 64):
    """Returns (measures, contigs_alignment_details) — reference
    performanceMeasures.py:190-252 signature and output parity.

    `banded` routes the contig->genome alignments through the
    diagonal-banded SW kernel (align_to_ref.py; identical results when
    the band covers the optimal path, O(band) instead of O(genome) row
    work). The default "auto" bands only large full-genome batches —
    the N=10000 sweep wall (VERDICT round 3) — with per-contig seeded
    bands and full-width fallback; False forces the reference's
    full-width shape everywhere."""
    if verbose:
        print(f"Calculating performance measures for {experiment_name} "
              f"(Iteration {num_iteration})")
    expected_coverage = num_reads * reads_length / len(ref_genome)
    details = align_contigs_to_reference(contigs, ref_genome, reads_length,
                                         banded=banded, band=band)

    coverage_rate, mm_aligned, mm_genome = (
        calculate_genome_coverage_and_mismatch_rate(
            details, ref_genome, expected_coverage, experiment_name,
            num_iteration, path, plot_hooks=plot_hooks))

    measures = {
        METRIC_NAMES[0]: len(contigs),
        METRIC_NAMES[1]: coverage_rate,
        METRIC_NAMES[2]: calculate_n50(contigs),
        METRIC_NAMES[3]: mm_aligned,
        METRIC_NAMES[4]: mm_genome,
    }
    return measures, details
