"""One-attach TPU demonstration session (round 4).

The shared TPU tunnel on this box wedges when clients attach back-to-back
or die mid-attach (tests/test_compile_time.py documents the semantics), so
every TPU deliverable of the round runs in THIS single process, one attach,
phases independent behind try/except:

  A. bench.py in-process (kernel-resident + sustained fields)
     -> BENCH_SELF_r04.json
  B. the reference's 10-iteration protocol (experiments.py:227) on the
     experiment-1 C=5 sub-experiment, n_jobs=1, device scoring, stage
     trace proving score.pairs ran on TPU (VERDICT round 3, missing #2/#4)
     -> results_tpu/experiment_const_coverage/C_5/*.csv + trace in the
     session JSON
  C. dense k=0 demo, exact-parity vs fast greedy layout, C in {10, 30}
     (VERDICT round 3, weak #2 quality differential)
     -> fast_layout rows in the session JSON

Everything lands in TPU_SESSION_r4.json.

Usage: python scripts/tpu_session.py   (requires the axon TPU plugin env)
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
OUT = os.path.join(REPO, "TPU_SESSION_r4.json")


def save(session):
    with open(OUT, "w") as f:
        json.dump(session, f, indent=1)


def main():
    import jax

    session = {"phases": {}, "started_unix": time.time()}
    platform = jax.devices()[0].platform
    session["platform"] = platform
    session["device"] = str(jax.devices()[0])
    print(f"attached: {jax.devices()}", flush=True)
    save(session)

    from genome_assembly_tpu.utils.tracing import global_tracer

    # ---- phase A: bench ----
    try:
        t0 = time.perf_counter()
        import bench

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main()
        line = buf.getvalue().strip().splitlines()[-1]
        print(f"bench: {line}", flush=True)
        row = json.loads(line)
        session["phases"]["bench"] = {
            "wall_s": round(time.perf_counter() - t0, 1), "result": row}
        with open(os.path.join(REPO, "BENCH_SELF_r04.json"), "w") as f:
            f.write(line + "\n")
    except Exception:
        session["phases"]["bench"] = {"error": traceback.format_exc()}
    save(session)

    # ---- phase B: 10-iteration protocol, device scoring, C=5 ----
    try:
        from genome_assembly_tpu.experiments.harness import (
            default_grids,
            experiment_const_coverage,
        )
        from genome_assembly_tpu.simulate import read_genome_from_fasta

        genome = read_genome_from_fasta(
            os.path.join(REPO, "data", "phix174.fasta"))
        _, _, l_values, error_probs, k_values = default_grids(len(genome))
        quick = os.environ.get("TPU_SESSION_QUICK") == "1"
        n_iter = 2 if quick else 10
        if quick:
            l_values, error_probs, k_values = [100], [0.01], [5]
        tr = global_tracer()
        tr.times.clear(); tr.counts.clear(); tr.items.clear()
        t0 = time.perf_counter()
        experiment_const_coverage(
            genome, 5, error_probs, k_values, l_values=l_values,
            x_axis_var="l",
            experiment_name="experiment_const_coverage/C_5",
            paths=[os.path.join(REPO, "results_tpu",
                                "experiment_const_coverage/C_5"),
                   os.path.join(REPO, "plots_tpu",
                                "experiment_const_coverage/C_5")],
            num_iterations=n_iter, make_plots=False, return_results=False)
        wall = time.perf_counter() - t0
        session["phases"]["tpu_sweep_C5_10iter"] = {
            "wall_s": round(wall, 1),
            "platform": platform,
            "n_configs": len(l_values) * len(error_probs) * len(k_values),
            "iterations": n_iter,
            "stage_trace": tr.as_dict(),
        }
        print(f"sweep done in {wall:.0f}s\n{tr.report()}", flush=True)
    except Exception:
        session["phases"]["tpu_sweep_C5_10iter"] = {
            "error": traceback.format_exc()}
    save(session)

    # ---- phase C: dense demo, exact vs fast layout ----
    try:
        from genome_assembly_tpu.experiments.runner import test_assembly
        from genome_assembly_tpu.simulate import read_genome_from_fasta

        genome = read_genome_from_fasta(
            os.path.join(REPO, "data", "phix174.fasta"))
        g_len = len(genome)
        rows = []
        dense_cs = ((2.0,) if os.environ.get("TPU_SESSION_QUICK") == "1"
                    else (10.0, 30.0))
        for C in dense_cs:
            N = int(np.ceil(C * g_len / 100))
            for mode, exact in (("exact", True), ("fast", False)):
                tr = global_tracer()
                tr.times.clear(); tr.counts.clear(); tr.items.clear()
                t0 = time.perf_counter()
                contigs, measures, _, _ = test_assembly(
                    genome, 100, N, 0.01, 0, f"dense_{mode}_C{C}", 1,
                    path=os.path.join(REPO, "plots_tpu", "dense"),
                    rng=random.Random(0), np_rng=np.random.RandomState(0),
                    exact_parity=exact)
                wall = time.perf_counter() - t0
                row = {
                    "C": C, "N": N, "mode": mode,
                    "wall_seconds": round(wall, 1),
                    "stages": {k: round(v, 2) for k, v in tr.times.items()},
                    "num_contigs": len(contigs),
                    "n50": measures["N50"],
                    "coverage": round(measures["Genome Coverage"], 4),
                    "mismatch_genome": round(
                        measures["Mismatch Rate Genome Level"], 4),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
                session["phases"]["dense_fast_vs_exact"] = rows
                save(session)
    except Exception:
        session["phases"].setdefault("dense_fast_vs_exact_error",
                                     traceback.format_exc())
    session["finished_unix"] = time.time()
    save(session)
    print("session complete", flush=True)


if __name__ == "__main__":
    main()
