"""Synthetic read sampling.

Semantics (reference generateErrorFreeReads.py:22-52): each read starts at a
uniform position in [0, G-1] (inclusive), spans `read_length` bases, and is
*truncated* (not wrapped) at the genome end — the genome is linear, so reads
near the end are shorter, with length in [1, read_length].

Two backends:
- `generate_error_free_reads` — host path using Python's `random` module,
  stream-compatible with the reference when seeded identically.
- `sample_reads_device` — pure-JAX vectorized path returning padded int8
  tensors + lengths; the production path for large N.
"""

from __future__ import annotations

import random as _random

import jax
import jax.numpy as jnp
import numpy as np

from ..core.encoding import PAD


def generate_error_free_reads(genome: str, read_length: int, num_reads: int,
                              rng: _random.Random | None = None) -> list[str]:
    """Host sampler; same draw sequence as the reference when `rng` is seeded
    the same way (reference uses the global `random` module)."""
    r = rng if rng is not None else _random
    g = len(genome)
    reads = []
    for _ in range(num_reads):
        start = r.randint(0, g - 1)
        reads.append(genome[start:start + read_length])
    return reads


def calculate_coverage(genome_len: int, num_reads: int, read_length: int) -> float:
    """Expected coverage C = N*l/G (generateErrorFreeReads.py:55-56)."""
    return num_reads * read_length / genome_len


def sample_reads_device(key: jax.Array, genome_codes: jax.Array, read_length: int,
                        num_reads: int):
    """Vectorized device sampler.

    Args:
        key: jax PRNG key.
        genome_codes: (G,) int8 genome.
        read_length: nominal read length l.
        num_reads: N.

    Returns:
        reads: (N, l) int8, PAD beyond each read's true length.
        lengths: (N,) int32 true lengths (= min(l, G - start)).
    """
    g = genome_codes.shape[0]
    starts = jax.random.randint(key, (num_reads,), 0, g, dtype=jnp.int32)
    lengths = jnp.minimum(read_length, g - starts)
    # Gather windows: genome padded by l PADs so every slice is in-bounds.
    padded = jnp.concatenate(
        [genome_codes, jnp.full((read_length,), PAD, dtype=jnp.int8)])
    offsets = starts[:, None] + jnp.arange(read_length, dtype=jnp.int32)[None, :]
    reads = padded[offsets]
    mask = jnp.arange(read_length, dtype=jnp.int32)[None, :] < lengths[:, None]
    reads = jnp.where(mask, reads, PAD)
    return reads, lengths


def reads_to_device(reads: list[str], read_length: int | None = None):
    """Encode host reads into padded (N,l) int8 + lengths (numpy)."""
    from ..core.encoding import encode_batch

    return encode_batch(reads, width=read_length, align="left")
