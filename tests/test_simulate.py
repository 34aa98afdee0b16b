import random

import jax
import jax.numpy as jnp
import numpy as np

from genome_assembly_tpu.core.encoding import PAD, decode, encode
from genome_assembly_tpu.simulate import (
    calculate_coverage,
    generate_error_free_reads,
    generate_error_prone_reads,
    inject_errors_device,
    sample_reads_device,
)


def test_host_sampler_semantics(rng):
    genome = "".join(rng.choice("ACGT") for _ in range(200))
    reads = generate_error_free_reads(genome, 50, 100, rng=random.Random(0))
    assert len(reads) == 100
    for rd in reads:
        assert 1 <= len(rd) <= 50
        assert rd in genome  # substring, never wrapped


def test_device_sampler():
    key = jax.random.PRNGKey(0)
    genome = "ACGT" * 50
    codes = jnp.asarray(encode(genome))
    reads, lengths = sample_reads_device(key, codes, 30, 64)
    reads, lengths = np.asarray(reads), np.asarray(lengths)
    assert reads.shape == (64, 30)
    for row, n in zip(reads, lengths):
        assert 1 <= n <= 30
        assert (row[n:] == PAD).all()
        assert decode(row, int(n)) in genome


def test_error_injector_host(np_rng):
    reads = ["ACGTACGTAC" * 5] * 20
    noisy = generate_error_prone_reads(reads, 0.2, rs=np_rng)
    assert all(len(a) == len(b) for a, b in zip(reads, noisy))
    diffs = sum(a != b for r0, r1 in zip(reads, noisy) for a, b in zip(r0, r1))
    assert 100 <= diffs <= 300  # ~200 expected
    # p=0 -> identity
    assert generate_error_prone_reads(reads, 0.0, rs=np_rng) == reads


def test_error_injector_device():
    key = jax.random.PRNGKey(1)
    reads = jnp.zeros((32, 100), jnp.int8)  # all 'A'
    lengths = jnp.full((32,), 100, jnp.int32)
    noisy = np.asarray(inject_errors_device(key, reads, lengths, 0.1))
    flips = (noisy != 0).sum()
    assert 150 <= flips <= 500  # ~320 expected
    assert set(np.unique(noisy)) <= {0, 1, 2, 3}
    # never mutate pads
    short = jnp.full((4,), 10, jnp.int32)
    reads2 = jnp.where(jnp.arange(100)[None, :] < 10, 0, PAD).astype(jnp.int8)
    reads2 = jnp.broadcast_to(reads2, (4, 100))
    noisy2 = np.asarray(inject_errors_device(key, reads2, short, 1.0))
    assert (noisy2[:, 10:] == PAD).all()
    assert (noisy2[:, :10] != 0).all()  # p=1.0 flips everything


def test_coverage():
    assert calculate_coverage(5386, 1000, 100) == 1000 * 100 / 5386
