"""Long-genome capability demonstration (round 4).

The reference is built around the 5,386 bp PhiX genome; every alignment in
its metrics pass scans the full genome per DP row (aligners.py:85-167),
which is O(contig x genome) and collapses at larger G. This script
demonstrates the framework's long-genome path on a synthetic genome an
order of magnitude larger:

- G = 50,000 bp random genome (seeded), N = 15,000 reads, l = 150,
  p = 0.005 substitution errors;
- assembly in BOTH layout modes (exact-parity and fast greedy chaining)
  at k in {15, 5};
- metrics through the stability-verified banded SW (per-contig seeded
  bands recomputed at 2x width until the traceback agrees — round 5,
  VERDICT round 4 next-step #3) — the path that exists precisely for
  this regime — AND, for every row, a full-width run over the FULL
  contig set so the banded-vs-exact delta is quantified at the metric
  level (coverage / mismatch / N50), not just on a detail sample.

Writes LONG_GENOME.json rows with stage walls, metrics, the full-set
metric deltas, and the sampled per-detail agreement. CPU-backend
friendly (the C++ executors carry the scoring and full-width checks);
on TPU the same script exercises the device kernels.

Usage: python scripts/long_genome_demo.py [G N l]
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 15_000
    l = int(sys.argv[3]) if len(sys.argv) > 3 else 150
    p = 0.005
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from genome_assembly_tpu.metrics.align_to_ref import (
        align_contigs_to_reference,
    )
    from genome_assembly_tpu.metrics.measures import calculate_measures
    from genome_assembly_tpu.models.overlap_graph import (
        assemble_contigs_using_overlap_graphs,
    )
    from genome_assembly_tpu.simulate.errors import generate_error_prone_reads
    from genome_assembly_tpu.simulate.reads import generate_error_free_reads
    from genome_assembly_tpu.utils.tracing import global_tracer

    rng = random.Random(0)
    genome = "".join(rng.choice("ACGT") for _ in range(G))
    reads = generate_error_prone_reads(
        generate_error_free_reads(genome, l, N, rng=random.Random(1)),
        p, rs=np.random.RandomState(2))

    out = {"G": G, "N": N, "l": l, "p": p,
           "platform": jax.devices()[0].platform, "rows": []}
    skip = set(filter(None, os.environ.get(
        "LONG_GENOME_SKIP", "").split(",")))
    for k in (15, 5):
        for mode, exact in (("fast", False), ("exact", True)):
            if f"{mode}:{k}" in skip:
                continue
            tr = global_tracer()
            tr.times.clear(); tr.counts.clear(); tr.items.clear()
            t0 = time.perf_counter()
            contigs = assemble_contigs_using_overlap_graphs(
                reads, k=k, exact_parity=exact)
            t_asm = time.perf_counter() - t0
            t0 = time.perf_counter()
            measures, details = calculate_measures(
                contigs, reads, N, l, p, k, genome, f"long_{mode}_k{k}", 1,
                path="/tmp/long_plots", banded=True)
            t_metrics = time.perf_counter() - t0
            row = {
                "k": k, "mode": mode,
                "assembly_s": round(t_asm, 1),
                "metrics_banded_s": round(t_metrics, 1),
                "stages": {s: round(v, 2) for s, v in tr.times.items()},
                "num_contigs": len(contigs),
                "n50": measures["N50"],
                "coverage": round(measures["Genome Coverage"], 4),
                "mismatch_genome": round(
                    measures["Mismatch Rate Genome Level"], 4),
            }
            # metric-level banded-vs-exact delta over the FULL contig
            # set (VERDICT round 4, next-step #3): re-run the entire
            # metrics pass with the full-width reference-shape DP and
            # compare the three headline metrics
            if os.environ.get("LONG_GENOME_FULL_DELTA", "1") == "1":
                t0 = time.perf_counter()
                m_full, _ = calculate_measures(
                    contigs, reads, N, l, p, k, genome,
                    f"long_{mode}_k{k}_fw", 1, path="/tmp/long_plots",
                    banded=False)
                t_fw = time.perf_counter() - t0
                row["full_width_metrics_s"] = round(t_fw, 1)
                row["metric_delta_banded_minus_full"] = {
                    "coverage": round(measures["Genome Coverage"]
                                      - m_full["Genome Coverage"], 6),
                    "mismatch_genome": round(
                        measures["Mismatch Rate Genome Level"]
                        - m_full["Mismatch Rate Genome Level"], 6),
                    "n50": measures["N50"] - m_full["N50"],
                }
                row["banded_speedup_metrics"] = round(
                    t_fw / max(t_metrics, 1e-9), 1)
            # banded-vs-full-width agreement on a contig sample (the
            # full-width pass at this G is the wall banded removes; the
            # sample quantifies how often banding changed anything)
            if mode == "fast":
                sample = [c for c in dict.fromkeys(contigs)
                          if len(c) >= l][:256]
                t0 = time.perf_counter()
                d_band = align_contigs_to_reference(sample, genome, l,
                                                    banded=True)
                t_b = time.perf_counter() - t0
                t0 = time.perf_counter()
                d_full = align_contigs_to_reference(sample, genome, l,
                                                    banded=False)
                t_f = time.perf_counter() - t0
                same = sum(d_band[c] == d_full[c] for c in sample)
                pos_same = sum(
                    (d_band[c]["Start Position"],
                     d_band[c]["End Position"]) ==
                    (d_full[c]["Start Position"],
                     d_full[c]["End Position"]) for c in sample)
                row["banded_check"] = {
                    "sample": len(sample),
                    "details_identical": same,
                    "positions_identical": pos_same,
                    "banded_s": round(t_b, 1),
                    "full_width_s": round(t_f, 1),
                }
            out["rows"].append(row)
            print(json.dumps(row), flush=True)
            with open(os.path.join(REPO, "LONG_GENOME.json"), "w") as f:
                json.dump(out, f, indent=1)
    print("long-genome demo complete", flush=True)


if __name__ == "__main__":
    main()
