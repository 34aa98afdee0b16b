"""Sharded pair scoring and the distributed pipeline step.

Data layout (SURVEY.md §2.4 mapping):
- DP analog: candidate pairs sharded over the 'data' mesh axis
  (`sharded_overlap_scores`) — each chip scores its block with the same
  MXU correlation kernel, results concatenated by the sharding layer.
- TP/CP analog: `all_pairs_block_scores` block-shards the dense NxN pair
  score matrix (k=0 regime): reads are replicated, each device computes the
  row-block of the score matrix it owns.
- Metrics: per-device coverage vectors combined with psum.

Everything is expressed with shard_map over a Mesh so the identical program
runs on 1 chip, 8 chips, or a multi-host slice (DCN axis added to the mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.encoding import PAD
from ..ops.overlap import overlap_scores, right_align
from ..ops.overlap_allpairs import overlap_scores_block, overlap_scores_block_xla
from ..simulate.errors import inject_errors_device
from ..simulate.reads import sample_reads_device


def _block_score_fn():
    """Per-shard block scorer: fused Pallas kernel on TPU, the identical
    XLA contraction on CPU-simulated meshes."""
    if jax.default_backend() == "tpu":
        return overlap_scores_block
    return overlap_scores_block_xla


def sharded_overlap_scores(mesh: Mesh, a_right, a_len, b, b_len,
                           axis: str = "data"):
    """Shard a flat pair batch over the mesh; each device scores its slice.

    Pair count must be divisible by the mesh size (pad upstream).
    """
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)))
    def _score(ar, al, bb, bl):
        return overlap_scores(ar, al, bb, bl)

    return _score(a_right, a_len, b, b_len)


def all_pairs_block_scores(mesh: Mesh, reads, lengths, axis: str = "data"):
    """Dense all-pairs scoring (k=0 regime): row-block sharding of the NxN
    score matrix. Each device holds a row block of (right-aligned) source
    reads and the full replicated target set.

    Returns (scores, ends), both (N, N) int32, with the diagonal masked to
    int32-min (self-pairs are excluded by the builder anyway).
    """
    n, l = reads.shape
    score_fn = _block_score_fn()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None, None), P(None)),
        out_specs=(P(axis, None), P(axis, None)))
    def _block(a_blk, a_l, b_all, b_l_all):
        return score_fn(a_blk, a_l, b_all, b_l_all)

    scores, ends = _block(reads, lengths, reads, lengths)
    eye = jnp.eye(n, dtype=bool)
    return jnp.where(eye, jnp.int32(-(2**31) + 1), scores), ends


def sharded_pipeline_step(mesh: Mesh, key, genome_codes, read_length: int,
                          num_reads: int, error_prob: float,
                          axis: str = "data"):
    """One full distributed assembly-data step (the 'training step' analog):

    per device: sample a shard of reads -> inject errors -> all_gather the
    global read set over ICI -> score this device's row block of the dense
    pair matrix -> psum a genome coverage histogram of read starts.

    Returns (scores, ends, coverage) with scores/ends sharded row-blocks of
    the NxN matrix and coverage replicated (psum'd).
    """
    n_dev = mesh.devices.size
    assert num_reads % n_dev == 0
    shard = num_reads // n_dev
    g = genome_codes.shape[0]
    keys = jax.random.split(key, n_dev)
    score_fn = _block_score_fn()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(None)),
        out_specs=(P(axis, None), P(axis, None), P(None)))
    def _step(ks, genome):
        k = ks[0]
        k_reads, k_err = jax.random.split(k)
        # sample this shard's reads (uniform starts, end-truncated)
        starts = jax.random.randint(k_reads, (shard,), 0, g, dtype=jnp.int32)
        lens = jnp.minimum(read_length, g - starts)
        padded = jnp.concatenate(
            [genome, jnp.full((read_length,), PAD, dtype=jnp.int8)])
        offs = starts[:, None] + jnp.arange(read_length, dtype=jnp.int32)[None, :]
        reads = padded[offs]
        mask = jnp.arange(read_length, dtype=jnp.int32)[None, :] < lens[:, None]
        reads = jnp.where(mask, reads, PAD)
        noisy = inject_errors_device(k_err, reads, lens, error_prob)
        # gather the full read set across devices (ICI all-gather)
        all_reads = jax.lax.all_gather(noisy, axis, tiled=True)
        all_lens = jax.lax.all_gather(lens, axis, tiled=True)
        # score this shard's row block against everything (fused kernel)
        s, e = score_fn(noisy, lens, all_reads, all_lens)
        # true per-base read coverage: +1/-1 difference array, cumsum, psum
        delta = jnp.zeros((g + 1,), jnp.int32)
        delta = delta.at[starts].add(1)
        delta = delta.at[starts + lens].add(-1)
        cov = jax.lax.psum(jnp.cumsum(delta)[:g], axis)
        return (s, e, cov)

    return _step(keys, genome_codes)
