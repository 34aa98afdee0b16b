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

Env: SCALE_N (reads, default 1024), SCALE_L (100), SCALE_REP (8),
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


def main():
    N = int(os.environ.get("SCALE_N", "1024"))
    L = int(os.environ.get("SCALE_L", "100"))
    REP = int(os.environ.get("SCALE_REP", "8"))
    out_path = os.environ.get("SCALE_OUT", "SCALING.json")

    import jax

    if os.environ.get("SCALE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from genome_assembly_tpu.core.encoding import encode_batch
    from genome_assembly_tpu.parallel.mesh import make_mesh
    from genome_assembly_tpu.parallel.sharded import all_pairs_block_scores
    from genome_assembly_tpu.simulate import (
        generate_error_free_reads,
        generate_error_prone_reads,
        read_genome_from_fasta,
    )
    import random

    genome = read_genome_from_fasta(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "data", "phix174.fasta"))
    reads = generate_error_free_reads(genome, L, N, rng=random.Random(0))
    reads = generate_error_prone_reads(reads, 0.01,
                                       rs=np.random.RandomState(0))
    codes, lengths = encode_batch(reads, width=L, align="left")

    n_avail = len(jax.devices())
    sizes = [m for m in (1, 2, 4, 8) if m <= n_avail and N % m == 0]
    platform = jax.devices()[0].platform
    rows = []
    base_pps = None
    for m in sizes:
        mesh = make_mesh(m)
        fn = jax.jit(
            lambda c, l, mesh=mesh: (
                lambda se: (se[0] * (se[0] > -2**30)).sum() + se[1].sum())(
                all_pairs_block_scores(mesh, c, l)))
        ld = jnp.asarray(lengths)
        variants = [jnp.asarray(np.roll(codes, i + 1, axis=0))
                    for i in range(REP)]
        jax.block_until_ready(variants)
        int(fn(variants[0], ld))  # compile
        # warm to steady state: under the axon tunnel the executable keeps
        # speeding up for the first couple of rounds (~40x round 0 ->
        # round 2); warm until two consecutive rounds agree within 10%
        prev = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            acc = jnp.int32(0)
            for c in variants:
                acc = acc + fn(c, ld)
            int(acc)
            dt = (time.perf_counter() - t0) / REP
            if dt > 0.9 * prev:
                break
            prev = dt
        t0 = time.perf_counter()
        acc = jnp.int32(0)
        for c in variants:
            acc = acc + fn(c, ld)
        int(acc)
        dt = (time.perf_counter() - t0) / REP
        pps = N * N / dt
        if base_pps is None:
            base_pps = pps
        row = {
            "mesh_size": m,
            "platform": platform,
            "pairs_per_sec": round(pps, 1),
            "pairs_per_sec_per_device": round(pps / m, 1),
            "scaling_efficiency": round(pps / (base_pps * m), 4),
            "n": N, "l": L,
        }
        rows.append(row)
        print(json.dumps(row))
    with open(out_path, "w") as f:
        json.dump({"rows": rows, "platform": platform,
                   "devices_available": n_avail}, f, indent=1)


if __name__ == "__main__":
    main()
