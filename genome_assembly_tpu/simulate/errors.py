"""Sequencing-error injection (substitutions only, no indels).

Semantics (reference generateErrorProneReads.py:4-45): each base mutates with
probability p (draw `u <= p`, inclusive); a mutated base is replaced by one of
its 3 alternatives chosen uniformly, in the fixed order
A->CGT, C->AGT, G->ACT, T->ACG. In int8 codes that order is
`alt = idx + (idx >= base)` for idx in {0,1,2}.

Two backends: a host path mirroring the reference's numpy draws, and a
vectorized JAX path over padded read tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.encoding import PAD, encode, decode

_ALPHABET = {"A": "CGT", "C": "AGT", "G": "ACT", "T": "ACG"}


def _introduce_errors_host(read: str, error_prob: float, rs: np.random.RandomState) -> str:
    """Single-read substitution injection (generateErrorProneReads.py:4-28)."""
    errs = np.nonzero(rs.random_sample(len(read)) <= error_prob)[0]
    picks = rs.randint(0, 3, size=len(errs))
    out = list(read)
    for pos, idx in zip(errs, picks):
        out[pos] = _ALPHABET[out[pos]][idx]
    return "".join(out)


def generate_error_prone_reads(reads: list[str], error_prob: float,
                               rs: np.random.RandomState | None = None) -> list[str]:
    """Host error injector over a list of reads."""
    if rs is None:
        rs = np.random.RandomState()
    return [_introduce_errors_host(r, error_prob, rs) for r in reads]


def inject_errors_device(key: jax.Array, reads: jax.Array, lengths: jax.Array,
                         error_prob: float) -> jax.Array:
    """Vectorized substitution injection over padded (N, l) int8 reads.

    PAD positions are never mutated. The alternative-base order matches the
    reference's alphabet map exactly.
    """
    k_mask, k_alt = jax.random.split(key)
    u = jax.random.uniform(k_mask, reads.shape, dtype=jnp.float32)
    mutate = u <= error_prob
    idx = jax.random.randint(k_alt, reads.shape, 0, 3, dtype=jnp.int8)
    alt = idx + (idx >= reads).astype(jnp.int8)
    valid = jnp.arange(reads.shape[1], dtype=jnp.int32)[None, :] < lengths[:, None]
    return jnp.where(mutate & valid, alt, reads)
