"""Final TPU attach (round 5): refreshed artifacts on the finished code.

One attach, phases independent:

  A. DENSE_DEMO refresh — the k=0 C in {10, 30} exact-parity rows on the
     round-5 engines (chainrev kernel + vectorized C++ metrics DP);
     replaces the round-3-era rows in DENSE_DEMO.json (kept under
     "rows_round3" for history).
  B. C=5 sweep re-run (10-iteration protocol, size-aware dispatch) —
     the round-5 session measured 141 s with the metrics DP as 137.6 s
     of it; this run carries the vectorized DP -> results_tpu_r5b/.
  C. SCALING_tpu at SCALE_N_PER_DEV=1024 (the session refresh used the
     512 default, a quarter of the round-3 artifact's pair count).

Lands in TPU_FINAL_r5.json.
"""

import contextlib
import io
import json
import os
import random
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "TPU_FINAL_r5.json")


def save(session):
    with open(OUT, "w") as f:
        json.dump(session, f, indent=1)


def main():
    import jax

    session = {"phases": {}, "started_unix": time.time()}
    platform = jax.devices()[0].platform
    session["platform"] = platform
    print(f"attached: {jax.devices()}", flush=True)
    save(session)

    from genome_assembly_tpu.utils.tracing import global_tracer

    # ---- phase A: dense-demo refresh ----
    try:
        from genome_assembly_tpu.experiments.runner import test_assembly
        from genome_assembly_tpu.simulate import read_genome_from_fasta

        genome = read_genome_from_fasta(
            os.path.join(REPO, "data", "phix174.fasta"))
        g_len = len(genome)
        rows = []
        for C in (10.0, 30.0):
            N = int(np.ceil(C * g_len / 100))
            tr = global_tracer()
            tr.times.clear(); tr.counts.clear(); tr.items.clear()
            t0 = time.perf_counter()
            contigs, measures, _, _ = test_assembly(
                genome, 100, N, 0.01, 0, f"dense_r5_C{C}", 1,
                path=os.path.join(REPO, "plots_tpu", "dense"),
                rng=random.Random(0), np_rng=np.random.RandomState(0))
            wall = time.perf_counter() - t0
            row = {
                "C": C, "N": N, "l": 100, "k": 0, "p": 0.01,
                "platform": platform,
                "wall_seconds": round(wall, 1),
                "stages": {k: round(v, 2) for k, v in tr.times.items()},
                "pairs_scored": tr.items.get("score.pairs", 0),
                "num_contigs": len(contigs),
                "n50": measures["N50"],
                "genome_coverage": round(measures["Genome Coverage"], 4),
                "mismatch_rate_genome": round(
                    measures["Mismatch Rate Genome Level"], 4),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        session["phases"]["dense_demo_r5"] = rows
        # refresh the artifact, preserving the historical rows
        path = os.path.join(REPO, "DENSE_DEMO.json")
        try:
            old = json.load(open(path))
        except Exception:
            old = []
        with open(path, "w") as f:
            json.dump({"rows": rows,
                       "engines": "round-5 (chainrev kernel, vectorized "
                                  "C++ metrics DP, size-aware dispatch)",
                       "rows_round3": old}, f, indent=1)
    except Exception:
        session["phases"]["dense_demo_r5"] = {
            "error": traceback.format_exc()}
    save(session)

    # ---- phase B: C=5 sweep on the vectorized metrics engine ----
    try:
        from genome_assembly_tpu.experiments.harness import (
            default_grids,
            experiment_const_coverage,
        )
        from genome_assembly_tpu.simulate import read_genome_from_fasta

        genome = read_genome_from_fasta(
            os.path.join(REPO, "data", "phix174.fasta"))
        _, _, l_values, error_probs, k_values = default_grids(len(genome))
        tr = global_tracer()
        tr.times.clear(); tr.counts.clear(); tr.items.clear()
        t0 = time.perf_counter()
        experiment_const_coverage(
            genome, 5, error_probs, k_values, l_values=l_values,
            x_axis_var="l",
            experiment_name="experiment_const_coverage/C_5",
            paths=[os.path.join(REPO, "results_tpu_r5b",
                                "experiment_const_coverage/C_5"),
                   os.path.join(REPO, "plots_tpu",
                                "experiment_const_coverage/C_5b")],
            num_iterations=10, make_plots=False, return_results=False)
        wall = time.perf_counter() - t0
        session["phases"]["tpu_sweep_C5_vectorized_metrics"] = {
            "wall_s": round(wall, 1),
            "session_r5_wall_s": 141.0,
            "round4_all_device_wall_s": 651.8,
            "stage_trace": tr.as_dict(),
        }
        print(f"C=5 sweep in {wall:.0f}s (r5 session: 141 s, r4: 652 s)\n"
              f"{tr.report()}", flush=True)
    except Exception:
        session["phases"]["tpu_sweep_C5_vectorized_metrics"] = {
            "error": traceback.format_exc()}
    save(session)

    # ---- phase C: scaling at the round-3 artifact's size ----
    try:
        os.environ["SCALE_OUT"] = os.path.join(REPO, "SCALING_tpu.json")
        os.environ["SCALE_N_PER_DEV"] = "1024"
        import bench_scaling

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench_scaling.main()
        session["phases"]["scaling_tpu_1024"] = {
            "rows": [json.loads(x) for x in
                     buf.getvalue().strip().splitlines()
                     if x.startswith("{")]}
        print("scaling refresh (n=1024) done", flush=True)
    except Exception:
        session["phases"]["scaling_tpu_1024"] = {
            "error": traceback.format_exc()}

    session["finished_unix"] = time.time()
    save(session)
    print("final session complete", flush=True)


if __name__ == "__main__":
    main()
