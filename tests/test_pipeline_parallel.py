"""PP-analog stage pipeline: the 2-stage microbatched score->filter program
must be bit-identical to the unpipelined score+filter."""

import numpy as np
import pytest

import jax.numpy as jnp

from genome_assembly_tpu.core.encoding import encode_batch
from genome_assembly_tpu.parallel.mesh import make_mesh
from genome_assembly_tpu.parallel.pipeline import (
    pipelined_score_filter,
    score_filter_unpipelined,
)

from conftest import random_dna


@pytest.mark.parametrize("n_micro", [1, 2, 4])
def test_pipelined_matches_unpipelined(rng, n_micro):
    reads = [random_dna(rng, rng.randint(8, 24)) for _ in range(32)]
    codes, lens = encode_batch(reads, align="left")
    mesh = make_mesh(2, axis_name="stage")
    s, e, keep = pipelined_score_filter(mesh, jnp.asarray(codes),
                                        jnp.asarray(lens), n_micro=n_micro)
    s0, e0, keep0 = score_filter_unpipelined(jnp.asarray(codes),
                                             jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s0))
    np.testing.assert_array_equal(np.asarray(e), np.asarray(e0))
    np.testing.assert_array_equal(np.asarray(keep), np.asarray(keep0))
