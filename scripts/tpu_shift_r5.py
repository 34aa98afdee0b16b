"""Third TPU attach (round 5): SSA shift-chain validation + dense-route
check.

The first follow-up showed BOTH chain kernels mis-computing ~5-9% of
entries on chip while exact in interpret mode; the common factor was the
per-q scratch read-modify-write, since rewritten to load-once /
advance-in-registers / store-once. This attach:

  A. re-triage matmul vs chain vs chainrev (SSA form) on chip;
  B. bench whichever chain variant is now bit-exact (pairs/s upside of
     dropping the 12.5% shift-matmul FLOPs);
  C. N=10000 k=5 forced-device under the new dense-max-U route (the
     chunked pair path measured 11.9 s warm through the tunnel; the
     all-pairs sweep + gather should land near the round-trip floor).

Lands in TPU_SHIFT_r5.json; bench rows append to BENCH_SELF_r05.json.
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
OUT = os.path.join(REPO, "TPU_SHIFT_r5.json")


def save(session):
    with open(OUT, "w") as f:
        json.dump(session, f, indent=1)


def main():
    import jax

    session = {"phases": {}, "started_unix": time.time()}
    session["platform"] = jax.devices()[0].platform
    print(f"attached: {jax.devices()}", flush=True)
    save(session)

    # ---- phase A: SSA-form triage ----
    exact_variants = []
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
            report[variant] = {
                "score_mismatch_frac": round(float(ds.mean()), 4),
                "end_mismatch_frac": round(float(de.mean()), 4)}
            if not ds.any() and not de.any():
                exact_variants.append(variant)
        session["phases"]["shift_triage_ssa"] = report
        print(json.dumps(report), flush=True)
    except Exception:
        session["phases"]["shift_triage_ssa"] = {
            "error": traceback.format_exc()}
    save(session)

    # ---- phase B: bench exact chain variants ----
    for variant in exact_variants:
        try:
            os.environ["GA_TPU_SHIFT"] = variant
            import bench

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                bench.main()
            line = buf.getvalue().strip().splitlines()[-1]
            print(f"bench[{variant}]: {line}", flush=True)
            session["phases"][f"bench_{variant}"] = json.loads(line)
            path = os.path.join(REPO, "BENCH_SELF_r05.json")
            try:
                rows = json.load(open(path))
            except Exception:
                rows = {}
            rows[variant] = session["phases"][f"bench_{variant}"]
            with open(path, "w") as f:
                json.dump(rows, f, indent=1)
        except Exception:
            session["phases"][f"bench_{variant}"] = {
                "error": traceback.format_exc()}
        finally:
            os.environ.pop("GA_TPU_SHIFT", None)
        save(session)

    # ---- phase C: k=5 forced-device via the dense-max-U route ----
    try:
        from genome_assembly_tpu.experiments.runner import test_assembly
        from genome_assembly_tpu.simulate import read_genome_from_fasta
        from genome_assembly_tpu.utils.tracing import global_tracer

        genome = read_genome_from_fasta(
            os.path.join(REPO, "data", "phix174.fasta"))
        os.environ["GA_TPU_MIN_DEVICE_PAIRS"] = "0"
        os.environ["GA_TPU_MIN_DEVICE_JOIN"] = "0"
        walls = []
        for it in range(3):
            tr = global_tracer()
            tr.times.clear(); tr.counts.clear(); tr.items.clear()
            t0 = time.perf_counter()
            contigs, measures, _, _ = test_assembly(
                genome, 100, 10000, 0.001, 5, "n10k_k5_dense", it + 1,
                path=os.path.join(REPO, "plots_tpu", "n10k"),
                rng=random.Random(it), np_rng=np.random.RandomState(it))
            walls.append(round(time.perf_counter() - t0, 1))
        sp = tr.as_dict().get("score.pairs", {})
        row = {
            "N": 10000, "k": 5, "dispatch": "device(dense-route)",
            "walls_s": walls,
            "stages_last_iter": {s: round(v, 2)
                                 for s, v in tr.times.items()},
            "score_pairs_items": sp.get("items"),
            "score_pairs_s": round(sp.get("seconds", 0.0), 3),
            "prev_chunked_score_pairs_s": 11.85,
            "num_contigs": len(contigs),
        }
        session["phases"]["n10000_k5_dense_route"] = row
        print(json.dumps(row), flush=True)
    except Exception:
        session["phases"]["n10000_k5_dense_route"] = {
            "error": traceback.format_exc()}
    finally:
        os.environ.pop("GA_TPU_MIN_DEVICE_PAIRS", None)
        os.environ.pop("GA_TPU_MIN_DEVICE_JOIN", None)

    session["finished_unix"] = time.time()
    save(session)
    print("shift session complete", flush=True)


if __name__ == "__main__":
    main()
