"""Scaling-efficiency report: sharded all-pairs scoring vs mesh size.

BASELINE.json config 5 asks for overlap-pairs/s efficiency measured at
1 chip / 1 host / >=2 hosts. On this box there is ONE real TPU chip, so:

- under the default (TPU) backend the script reports the absolute 1-chip
  number (same methodology as bench.py);
- under `JAX_PLATFORMS=cpu` with `--xla_force_host_platform_device_count=8`
  (set automatically when SCALE_CPU=1) it runs the identical shard_map
  program at mesh sizes 1/2/4/8 and reports pairs/s/device scaling
  efficiency — the mesh-size-invariance evidence for the multi-host path
  (the program only sees a Mesh; DCN axes are a reshape away,
  parallel/mesh.py make_mesh_hosts_chips).

Writes one JSON object per mesh size to stdout and the full report to
SCALING.json.

Two modes (VERDICT round 2, weak #1 — the round-2 artifact ran a
strong-scaling sweep at toy size, where fixed total work shrinks per
device while collective overhead grows, and read as scaling collapse):

- SCALE_MODE=weak (default): reads per device fixed (SCALE_N_PER_DEV,
  default 512) — N grows with the mesh, per-device row-block work grows
  with N, compute dominates. Efficiency = pairs/s/device vs mesh-1.
- SCALE_MODE=strong: fixed total N (SCALE_N, default 1024) split over
  the mesh — the round-2 setup, kept for comparison.

Each run also emits a mesh-1 "direct" control row (the kernel called
without shard_map) so the wrapper overhead is visible in the artifact
(VERDICT round 2, weak #2).

Env: SCALE_MODE (weak|strong), SCALE_N (strong total, 1024),
SCALE_N_PER_DEV (weak rows/device, 512), SCALE_L (100), SCALE_REP (8),
SCALE_CPU=1 (force the 8-device virtual CPU mesh), SCALE_OUT (path).
"""

import json
import os
import sys
import time

if os.environ.get("SCALE_CPU") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _timed_pairs_per_sec(fn, variants, ld, rep):
    """Median-of-warm-rounds timing (same methodology as bench.py): warm
    until two consecutive rounds agree within 10%, then time one round.
    Returns seconds per sweep."""
    import time

    int(fn(variants[0], ld))  # compile
    rounds = int(os.environ.get("SCALE_ROUNDS", "10"))
    prev = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        acc = None
        for c in variants:
            acc = fn(c, ld) if acc is None else acc + fn(c, ld)
        int(acc)
        dt = (time.perf_counter() - t0) / rep
        if dt > 0.9 * prev:
            break
        prev = dt
    # chain `rounds` passes over the variants with ONE final fetch: a
    # synchronous fetch through the device tunnel costs ~30 ms, which at
    # rep=8 masquerades as ~4 ms/sweep of "wrapper overhead" (this was
    # the round-2 SCALING_tpu-vs-bench 2x discrepancy, VERDICT weak #2)
    t0 = time.perf_counter()
    c0 = time.process_time()
    acc = None
    for _ in range(rounds):
        for c in variants:
            acc = fn(c, ld) if acc is None else acc + fn(c, ld)
    int(acc)
    wall = time.perf_counter() - t0
    # process_time/wall ~= host threads actually running: on the virtual
    # CPU mesh this shows when the physical cores are saturated
    return wall / (rep * rounds), (time.process_time() - c0) / wall


def _make_inputs(genome, N, L, rep):
    import random

    import jax.numpy as jnp

    from genome_assembly_tpu.core.encoding import encode_batch
    from genome_assembly_tpu.simulate import (
        generate_error_free_reads,
        generate_error_prone_reads,
    )

    reads = generate_error_free_reads(genome, L, N, rng=random.Random(0))
    reads = generate_error_prone_reads(reads, 0.01,
                                       rs=np.random.RandomState(0))
    codes, lengths = encode_batch(reads, width=L, align="left")
    ld = jnp.asarray(lengths)
    variants = [jnp.asarray(np.roll(codes, i + 1, axis=0))
                for i in range(rep)]
    import jax

    jax.block_until_ready(variants)
    return variants, ld


def main():
    mode = os.environ.get("SCALE_MODE", "weak")
    N_total = int(os.environ.get("SCALE_N", "1024"))
    n_per_dev = int(os.environ.get("SCALE_N_PER_DEV", "512"))
    L = int(os.environ.get("SCALE_L", "100"))
    REP = int(os.environ.get("SCALE_REP", "8"))
    out_path = os.environ.get("SCALE_OUT", "SCALING.json")

    import jax

    if os.environ.get("SCALE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from genome_assembly_tpu.parallel.mesh import make_mesh
    from genome_assembly_tpu.parallel.sharded import all_pairs_block_scores
    from genome_assembly_tpu.simulate import read_genome_from_fasta

    genome = read_genome_from_fasta(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "data", "phix174.fasta"))

    n_avail = len(jax.devices())
    sizes = [m for m in (1, 2, 4, 8) if m <= n_avail]
    if mode == "strong":
        sizes = [m for m in sizes if N_total % m == 0]
    platform = jax.devices()[0].platform
    rows = []

    # mesh-1 control: the kernel WITHOUT the shard_map wrapper, same N as
    # the mesh-1 row — quantifies the wrapper overhead (round-2 weak #2)
    n1 = n_per_dev if mode == "weak" else N_total
    from genome_assembly_tpu.ops.overlap_allpairs import (
        overlap_scores_all_pairs_auto,
    )

    variants, ld = _make_inputs(genome, n1, L, REP)
    direct = jax.jit(lambda c, l: (
        lambda se: (se[0].sum() + se[1].sum()))(
        overlap_scores_all_pairs_auto(c, l)))
    dt, util = _timed_pairs_per_sec(direct, variants, ld, REP)
    direct_pps = n1 * n1 / dt
    row = {"mesh_size": 1, "wrapper": "direct", "platform": platform,
           "pairs_per_sec": round(direct_pps, 1),
           "pairs_per_sec_per_device": round(direct_pps, 1),
           "host_threads_busy": round(util, 2),
           "n": n1, "l": L}
    rows.append(row)
    print(json.dumps(row))

    cores = os.cpu_count() or 1
    base_ppd = None
    for m in sizes:
        N = n_per_dev * m if mode == "weak" else N_total
        mesh = make_mesh(m)
        fn = jax.jit(
            lambda c, l, mesh=mesh: (
                lambda se: (se[0] * (se[0] > -2**30)).sum() + se[1].sum())(
                all_pairs_block_scores(mesh, c, l)))
        variants, ld = _make_inputs(genome, N, L, REP)
        dt, util = _timed_pairs_per_sec(fn, variants, ld, REP)
        pps = N * N / dt
        ppd = pps / m
        if base_ppd is None:
            base_ppd = ppd
        row = {
            "mesh_size": m,
            "mode": mode,
            "wrapper": "shard_map",
            "platform": platform,
            "pairs_per_sec": round(pps, 1),
            "pairs_per_sec_per_device": round(ppd, 1),
            "scaling_efficiency": round(ppd / base_ppd, 4),
            "host_threads_busy": round(util, 2),
            "n": N, "l": L,
        }
        if platform == "cpu":
            # all virtual devices share the host's physical cores, so
            # per-device efficiency is hard-capped at cores/m once a
            # single device saturates the machine — this cap, not the
            # sharded program, is what bounds CPU-mesh numbers
            row["host_core_cap"] = round(min(1.0, cores / m), 4)
        rows.append(row)
        print(json.dumps(row))
    # sequence-parallel SW rows (VERDICT round 4, next-step #5): the
    # genome axis sharded over the mesh, per-row (2 collectives/DP row)
    # vs the round-5 systolic row-block pipeline (n/R + D - 1 total)
    if os.environ.get("SCALE_SEQPAR", "1") == "1" and n_avail >= 2:
        import random as pyrandom

        import numpy as np

        from genome_assembly_tpu.core.encoding import (
            PAD, encode, encode_batch,
        )
        from genome_assembly_tpu.parallel.seqpar import (
            local_align_batch_seqpar,
            local_align_batch_seqpar_pipelined,
        )

        r = pyrandom.Random(0)
        G = int(os.environ.get("SCALE_SEQPAR_G", "50000"))
        B, qn = 16, 100
        sg = "".join(r.choice("ACGT") for _ in range(G))
        queries = []
        for _ in range(B):
            s0 = r.randrange(G - qn - 1)
            queries.append(sg[s0:s0 + qn])
        q, ql = encode_batch(queries, align="left")
        q, ql = jnp.asarray(q), jnp.asarray(ql)
        m = max(s for s in sizes)
        gp = ((G + m - 1) // m) * m
        g_pad = np.full((gp,), PAD, np.int8)
        g_pad[:G] = encode(sg)
        g_d = jnp.asarray(g_pad)
        for name, fn, coll in (
                ("seqpar_per_row", local_align_batch_seqpar, 2 * qn),
                ("seqpar_pipelined_R25",
                 lambda mesh, *a, **kw: local_align_batch_seqpar_pipelined(
                     mesh, *a, rows_per_exchange=25, **kw),
                 -(-qn // 25) + m - 1)):
            mesh = make_mesh(m)
            out = fn(mesh, q, ql, g_d, G)
            jax.block_until_ready(out)      # compile + first run
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(mesh, q, ql, g_d, G)
                jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 3
            row = {"mesh_size": m, "wrapper": name, "platform": platform,
                   "genome_len": G, "batch": B, "query_len": qn,
                   "collectives_total": coll,
                   "cells_per_sec": round(B * qn * G / dt, 1),
                   "wall_ms": round(dt * 1e3, 1)}
            rows.append(row)
            print(json.dumps(row))

    report = {"rows": rows, "mode": mode, "platform": platform,
              "devices_available": n_avail, "host_cores": cores}
    if platform == "cpu":
        report["analysis"] = (
            f"Virtual CPU mesh: {n_avail} XLA host devices share "
            f"{cores} physical core(s), so weak-scaling efficiency at "
            f"mesh size m is capped at min(1, {cores}/m) regardless of "
            f"the program (total work grows with m on fixed silicon). "
            f"host_threads_busy ~= cores confirms saturation. These "
            f"numbers validate mesh-size *correctness* and wrapper "
            f"overhead (compare the direct row), not ICI scaling: on a "
            f"real slice each mesh axis member is a separate chip with "
            f"its own MXU/HBM, and the per-device collective volume in "
            f"this program (one all-gather of the read block per sweep) "
            f"is constant in m.")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
