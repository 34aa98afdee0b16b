"""k=0 dense-regime demonstration (VERDICT round 1, next-step #3).

The reference could not finish k=0 (unfiltered all-pairs) assembly at
coverage C in {10, 30}: the NetworkX find_cycle edge-removal loop was
still running after 48 hours (report p.4 footnote ii, reference
overlapGraphs.py:106-130). This script runs exactly that regime on the
TPU build — fused all-pairs scoring on the chip, C++ cycle removal,
vectorized layout — and records wall-clock per stage plus the quality
metrics. Results land in RESULTS.md.

Usage: python scripts/dense_demo.py [C ...]   (default: 10 30)
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    coverages = [float(c) for c in sys.argv[1:]] or [10.0, 30.0]
    L = 100
    import jax

    # the axon TPU plugin force-sets jax_platforms — honor an explicit CPU
    # request so comparison rows can be produced on the host backend
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from genome_assembly_tpu.experiments.runner import test_assembly
    from genome_assembly_tpu.simulate import read_genome_from_fasta
    from genome_assembly_tpu.utils.tracing import global_tracer

    genome = read_genome_from_fasta(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data", "phix174.fasta"))
    g_len = len(genome)
    rows = []
    for C in coverages:
        N = int(np.ceil(C * g_len / L))  # experiments.py:271-276
        tr = global_tracer()
        tr.times.clear(); tr.counts.clear(); tr.items.clear()
        t0 = time.perf_counter()
        contigs, measures, _, _ = test_assembly(
            genome, L, N, 0.01, 0, f"dense_k0_C{C}", 1,
            rng=random.Random(0), np_rng=np.random.RandomState(0))
        wall = time.perf_counter() - t0
        row = {
            "C": C, "N": N, "l": L, "k": 0, "p": 0.01,
            "platform": jax.devices()[0].platform,
            "wall_seconds": round(wall, 1),
            "stages": {k: round(v, 2) for k, v in tr.times.items()},
            "pairs_scored": int(tr.items.get("score.pairs", 0)),
            "num_contigs": len(contigs),
            "n50": measures["N50"],
            "genome_coverage": round(float(measures["Genome Coverage"]), 4),
            "mismatch_rate_genome": round(
                float(measures["Mismatch Rate Genome Level"]), 4),
        }
        rows.append(row)
        print(json.dumps(row))
    # merge with any previous runs (C=10 and C=30 may run as separate
    # invocations); rows are keyed by (C, platform)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "DENSE_DEMO.json")
    merged: dict = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                for r in json.load(f):
                    merged[(r["C"], r.get("platform"))] = r
        except Exception:
            pass
    for r in rows:
        merged[(r["C"], r.get("platform"))] = r
    with open(out, "w") as f:
        json.dump(sorted(merged.values(), key=lambda r: (r["platform"], r["C"])),
                  f, indent=1)


if __name__ == "__main__":
    main()
