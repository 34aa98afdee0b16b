"""Test configuration: force JAX onto a virtual 8-device CPU platform so
multi-chip sharding paths are exercised without TPU hardware (the standard
JAX approach to testing meshes on a single host)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
# keep matplotlib tests cheap: render at low resolution (plots/helpers.py)
os.environ.setdefault("GA_TPU_PLOT_DPI", "40")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu",
# ignoring the env var — override it back to CPU before any backend init so
# tests run on the virtual 8-device CPU mesh, not the shared TPU chip.
import jax

jax.config.update("jax_platforms", "cpu")

import random

import numpy as np
import pytest


@pytest.fixture
def rng():
    return random.Random(12345)


@pytest.fixture
def np_rng():
    return np.random.RandomState(12345)


def random_dna(r, length):
    return "".join(r.choice("ACGT") for _ in range(length))
