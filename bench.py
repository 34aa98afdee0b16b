"""Headline benchmark: overlap-pair scoring throughput on one chip.

Measures the device overlap-scoring kernel (ops/overlap.py) on the dense
all-pairs space of PhiX reads (N=1000, l=100 — BASELINE.json metric config)
and compares against the reference's Numba `overlap_alignment` baseline
(reference aligners.py:6-82), stood in by the same full-DP loop compiled as
C++ -O3 (numba is not installed in this image; Numba lowers the identical
loop through LLVM, so this is a fair — if anything generous — baseline).

Prints ONE JSON line:
  {"metric": ..., "value": pairs/s, "unit": "pairs/s", "vs_baseline": ratio}

Env knobs: BENCH_N (reads, default 1000), BENCH_L (read length, 100),
BENCH_QUICK=1 (small shapes for smoke-testing on CPU).
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    quick = os.environ.get("BENCH_QUICK") == "1"
    N = int(os.environ.get("BENCH_N", "128" if quick else "1000"))
    L = int(os.environ.get("BENCH_L", "32" if quick else "100"))
    seed = 0

    import jax
    import jax.numpy as jnp

    from genome_assembly_tpu.core.encoding import encode_batch
    from genome_assembly_tpu.native import graphcore
    from genome_assembly_tpu.ops.overlap import overlap_scores, right_align
    from genome_assembly_tpu.simulate import (
        generate_error_free_reads,
        generate_error_prone_reads,
        read_genome_from_fasta,
    )

    genome = read_genome_from_fasta(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "data", "phix174.fasta"))
    reads = generate_error_free_reads(genome, L, N, rng=random.Random(seed))
    reads = generate_error_prone_reads(
        reads, 0.01, rs=np.random.RandomState(seed))
    codes, lengths = encode_batch(reads, width=L, align="left")
    codes = jnp.asarray(codes)
    lengths = jnp.asarray(lengths)

    # ---- device throughput: all N*N ordered pairs in flat chunks ----
    # read tensors stay RESIDENT on device (the TPU tunnel has low host<->
    # device bandwidth — shipping operands per chunk measures the network,
    # not the chip); each dispatch sends one scalar chunk offset and gathers
    # its pair block on device. 8192-pair chunks compile in seconds.
    CHUNK = 8192 if N * N >= 8192 else 512
    total_pairs = N * N
    reads_r = jax.device_put(right_align(codes, lengths))
    codes_d = jax.device_put(codes)
    lens_d = jax.device_put(lengths)

    @jax.jit
    def chunk_fn(r_res, c_res, l_res, lo):
        flat = lo + jnp.arange(CHUNK, dtype=jnp.int32)
        sa = flat // N
        sb = flat % N
        return overlap_scores(r_res[sa], l_res[sa], c_res[sb], l_res[sb])

    s, e = chunk_fn(reads_r, codes_d, lens_d, jnp.int32(0))  # compile
    s.block_until_ready()

    t0 = time.perf_counter()
    out = None
    for lo in range(0, total_pairs, CHUNK):
        out = chunk_fn(reads_r, codes_d, lens_d, jnp.int32(lo))
    out[0].block_until_ready()
    dt = time.perf_counter() - t0
    device_pps = total_pairs / dt

    # ---- baseline: compiled reference DP on a sample, extrapolated ----
    if graphcore.available():
        B0 = min(2048, total_pairs)
        rng = np.random.default_rng(seed)
        ia = rng.integers(0, N, B0)
        ib = rng.integers(0, N, B0)
        a_np = np.asarray(codes)[ia]
        al_np = np.asarray(lengths)[ia]
        b_np = np.asarray(codes)[ib]
        bl_np = np.asarray(lengths)[ib]
        graphcore.overlap_baseline_batch(a_np[:64], al_np[:64],
                                         b_np[:64], bl_np[:64])  # warm
        t0 = time.perf_counter()
        graphcore.overlap_baseline_batch(a_np, al_np, b_np, bl_np)
        base_dt = time.perf_counter() - t0
        baseline_pps = B0 / base_dt
    else:
        baseline_pps = float("nan")

    platform = jax.devices()[0].platform
    print(json.dumps({
        "metric": f"overlap_pairs_per_sec_per_chip(N={N},l={L},{platform})",
        "value": round(device_pps, 1),
        "unit": "pairs/s",
        "vs_baseline": round(device_pps / baseline_pps, 2)
        if baseline_pps == baseline_pps else None,
    }))


if __name__ == "__main__":
    main()
