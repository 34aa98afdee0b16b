"""Sequence-parallel SW parity: genome sharded over 1/2/4/8 devices must be
bit-identical to the single-device row-scan kernel AND to the oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import random_dna

from genome_assembly_tpu.core.encoding import PAD, encode, encode_batch
from genome_assembly_tpu.ops.oracle import local_align_oracle
from genome_assembly_tpu.ops.smith_waterman import local_align_batch
from genome_assembly_tpu.parallel.mesh import make_mesh
from genome_assembly_tpu.parallel.seqpar import (
    local_align_batch_seqpar,
    traceback_host_seqpar,
)


def _setup(rng, n_q=12, g_len=200, q_max=40):
    genome = random_dna(rng, g_len)
    queries = []
    for _ in range(n_q):
        if rng.random() < 0.6:  # planted local hits
            start = rng.randint(0, g_len - q_max)
            q = genome[start:start + rng.randint(5, q_max)]
            # sprinkle mismatches
            q = "".join(c if rng.random() > 0.1 else rng.choice("ACGT")
                        for c in q)
        else:
            q = random_dna(rng, rng.randint(5, q_max))
        queries.append(q)
    return genome, queries


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_seqpar_matches_single_device(rng, n_dev):
    genome, queries = _setup(rng)
    g_len = len(genome)
    q, ql = encode_batch(queries, align="left")
    B = len(queries)

    # single-device reference: replicated genome rows
    refs = np.tile(encode(genome)[None, :], (B, 1))
    rl = np.full((B,), g_len, np.int32)
    best0, bi0, bj0, codes0 = local_align_batch(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(refs), jnp.asarray(rl))

    mesh = make_mesh(n_dev)
    gp = ((g_len + n_dev - 1) // n_dev) * n_dev
    g_pad = np.full((gp,), PAD, np.int8)
    g_pad[:g_len] = encode(genome)
    best, bi, bj, codes = local_align_batch_seqpar(
        mesh, jnp.asarray(q), jnp.asarray(ql), jnp.asarray(g_pad), g_len)

    np.testing.assert_array_equal(np.asarray(best), np.asarray(best0))
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(bi0))
    np.testing.assert_array_equal(np.asarray(bj), np.asarray(bj0))
    # codes: seq-par drops the j=0 column
    np.testing.assert_array_equal(np.asarray(codes),
                                  np.asarray(codes0)[:, :, 1:gp + 1])


def test_seqpar_traceback_matches_oracle(rng):
    genome, queries = _setup(rng, n_q=8, g_len=160)
    g_len = len(genome)
    q, ql = encode_batch(queries, align="left")
    mesh = make_mesh(4)
    gp = ((g_len + 3) // 4) * 4
    g_pad = np.full((gp,), PAD, np.int8)
    g_pad[:g_len] = encode(genome)
    best, bi, bj, codes = local_align_batch_seqpar(
        mesh, jnp.asarray(q), jnp.asarray(ql), jnp.asarray(g_pad), g_len)
    codes = np.asarray(codes)
    for b, query in enumerate(queries):
        ar, aq, start = traceback_host_seqpar(
            codes[:, b, :], int(bi[b]), int(bj[b]), query, genome)
        oar, oaq, oscore, ostart, oend = local_align_oracle(query, genome)
        assert int(best[b]) == oscore
        assert (ar, aq, start, int(bj[b])) == (oar, oaq, ostart, oend)


@pytest.mark.parametrize("n_dev,rows", [(1, 4), (4, 1), (4, 8), (8, 8),
                                        (8, 16), (4, 3)])
def test_seqpar_pipelined_matches_per_row(rng, n_dev, rows):
    """The systolic row-block pipeline (one (2, R, B) ppermute per step,
    carry passed hop-by-hop instead of all_gathered) must be bit-identical
    to the per-row seq-par kernel: best/bi/bj AND the full sharded
    traceback code tensor (VERDICT round 4, stretch #9)."""
    from genome_assembly_tpu.parallel.seqpar import (
        local_align_batch_seqpar_pipelined,
    )

    genome, queries = _setup(rng, n_q=10, g_len=192, q_max=37)
    g_len = len(genome)
    q, ql = encode_batch(queries, align="left")
    n_pad = q.shape[1]
    mesh = make_mesh(n_dev)
    gp = ((g_len + n_dev - 1) // n_dev) * n_dev
    g_pad = np.full((gp,), PAD, np.int8)
    g_pad[:g_len] = encode(genome)
    best0, bi0, bj0, codes0 = local_align_batch_seqpar(
        mesh, jnp.asarray(q), jnp.asarray(ql), jnp.asarray(g_pad), g_len)
    best, bi, bj, codes = local_align_batch_seqpar_pipelined(
        mesh, jnp.asarray(q), jnp.asarray(ql), jnp.asarray(g_pad), g_len,
        rows_per_exchange=rows)
    np.testing.assert_array_equal(np.asarray(best), np.asarray(best0))
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(bi0))
    np.testing.assert_array_equal(np.asarray(bj), np.asarray(bj0))
    np.testing.assert_array_equal(np.asarray(codes)[:n_pad],
                                  np.asarray(codes0))
