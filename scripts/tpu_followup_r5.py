"""Follow-up TPU attach (round 5): shift-kernel diagnosis + the
shape-class-stable forced-device rerun.

Run AFTER scripts/tpu_session_r5.py (separate process, attach spaced by
minutes — the tunnel wedges on back-to-back attaches). Phases:

  A. on-chip parity triage of the three shift implementations at the
     bench shape: matmul (baseline), chain (failed parity in the main
     session; the (jc,3,tm,1) seed operand is suspect), chainrev (the
     descending-j variant with no seed operand). Records mismatch
     fractions and a sample of differing entries.
  B. if chainrev is bit-exact on chip: bench it (same methodology as
     bench.py) and append to BENCH_SELF_r05.json.
  C. N=10000 forced-device rerun on the shape-class-stable code
     (power-of-two operand classes; the main session measured 17 s per
     iteration of pure recompilation at k=5).

Everything lands in TPU_FOLLOWUP_r5.json.
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
OUT = os.path.join(REPO, "TPU_FOLLOWUP_r5.json")


def save(session):
    with open(OUT, "w") as f:
        json.dump(session, f, indent=1)


def main():
    import jax

    session = {"phases": {}, "started_unix": time.time()}
    session["platform"] = jax.devices()[0].platform
    print(f"attached: {jax.devices()}", flush=True)
    save(session)

    # ---- phase A: shift-kernel on-chip triage ----
    chainrev_ok = False
    try:
        import jax.numpy as jnp

        from genome_assembly_tpu.core.encoding import encode_batch
        from genome_assembly_tpu.ops.overlap_allpairs import (
            overlap_scores_block,
        )

        r = random.Random(0)
        reads = ["".join(r.choice("ACGT") for _ in range(r.randint(80, 100)))
                 for _ in range(512)]
        codes, lens = encode_batch(reads, width=100, align="left")
        c, ln = jnp.asarray(codes), jnp.asarray(lens)
        res = {}
        for variant in ("matmul", "chain", "chainrev"):
            s, e = overlap_scores_block(c, ln, c, ln, shift=variant)
            res[variant] = (np.asarray(s), np.asarray(e))
        report = {}
        for variant in ("chain", "chainrev"):
            ds = res[variant][0] != res["matmul"][0]
            de = res[variant][1] != res["matmul"][1]
            entry = {"score_mismatch_frac": round(float(ds.mean()), 4),
                     "end_mismatch_frac": round(float(de.mean()), 4)}
            if ds.any():
                i, j = np.argwhere(ds)[0]
                entry["first_diff"] = {
                    "pair": [int(i), int(j)],
                    "matmul": [int(res["matmul"][0][i, j]),
                               int(res["matmul"][1][i, j])],
                    variant: [int(res[variant][0][i, j]),
                              int(res[variant][1][i, j])],
                }
            report[variant] = entry
        chainrev_ok = (report["chainrev"]["score_mismatch_frac"] == 0
                       and report["chainrev"]["end_mismatch_frac"] == 0)
        session["phases"]["shift_triage"] = report
        print(json.dumps(report), flush=True)
    except Exception:
        session["phases"]["shift_triage"] = {"error": traceback.format_exc()}
    save(session)

    # ---- phase B: bench chainrev if exact ----
    if chainrev_ok:
        try:
            os.environ["GA_TPU_SHIFT"] = "chainrev"
            import bench

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                bench.main()
            line = buf.getvalue().strip().splitlines()[-1]
            print(f"bench[chainrev]: {line}", flush=True)
            session["phases"]["bench_chainrev"] = json.loads(line)
            path = os.path.join(REPO, "BENCH_SELF_r05.json")
            try:
                rows = json.load(open(path))
            except Exception:
                rows = {}
            rows["chainrev"] = session["phases"]["bench_chainrev"]
            with open(path, "w") as f:
                json.dump(rows, f, indent=1)
        except Exception:
            session["phases"]["bench_chainrev"] = {
                "error": traceback.format_exc()}
        finally:
            os.environ.pop("GA_TPU_SHIFT", None)
        save(session)

    # ---- phase C: N=10000 forced-device, shape-class-stable ----
    try:
        from genome_assembly_tpu.experiments.runner import test_assembly
        from genome_assembly_tpu.simulate import read_genome_from_fasta
        from genome_assembly_tpu.utils.tracing import global_tracer

        genome = read_genome_from_fasta(
            os.path.join(REPO, "data", "phix174.fasta"))
        os.environ["GA_TPU_MIN_DEVICE_PAIRS"] = "0"
        os.environ["GA_TPU_MIN_DEVICE_JOIN"] = "0"
        rows = []
        for k in (5, 2):
            walls = []
            for it in range(3):
                tr = global_tracer()
                tr.times.clear(); tr.counts.clear(); tr.items.clear()
                t0 = time.perf_counter()
                contigs, measures, _, _ = test_assembly(
                    genome, 100, 10000, 0.001, k, f"n10k_k{k}_dev2",
                    it + 1, path=os.path.join(REPO, "plots_tpu", "n10k"),
                    rng=random.Random(it),
                    np_rng=np.random.RandomState(it))
                walls.append(round(time.perf_counter() - t0, 1))
            sp = tr.as_dict().get("score.pairs", {})
            row = {
                "N": 10000, "k": k, "dispatch": "device(shape-stable)",
                "walls_s": walls,
                "stages_last_iter": {s: round(v, 2)
                                     for s, v in tr.times.items()},
                "score_pairs_items": sp.get("items"),
                "score_pairs_s": round(sp.get("seconds", 0.0), 3),
                "score_pairs_per_sec": round(
                    sp.get("items", 0) / max(sp.get("seconds", 1e-9),
                                             1e-9), 1),
                "num_contigs": len(contigs),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            session["phases"]["n10000_device_shape_stable"] = rows
            save(session)
    except Exception:
        session["phases"]["n10000_device_shape_stable_error"] = \
            traceback.format_exc()
    finally:
        os.environ.pop("GA_TPU_MIN_DEVICE_PAIRS", None)
        os.environ.pop("GA_TPU_MIN_DEVICE_JOIN", None)

    session["finished_unix"] = time.time()
    save(session)
    print("followup complete", flush=True)


if __name__ == "__main__":
    main()
