"""Device-mesh helpers.

The reference's only parallelism is a joblib process pool over experiment
configs (experiments.py:537). The TPU-native replacements (SURVEY.md §2.4):
- a 1-D 'data' mesh axis sharding reads and candidate-pair blocks,
- collectives (all_gather / psum) instead of process-pool pickling,
- multi-host extension via jax.distributed (same PartitionSpecs, DCN axis).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis_name: str = "data",
              devices=None) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(rows: int, cols: int, axis_names=("pair_i", "pair_j"),
                 devices=None) -> Mesh:
    """2-D mesh for block-sharding the candidate-pair score matrix."""
    if devices is None:
        devices = jax.devices()
    assert rows * cols <= len(devices)
    grid = np.asarray(devices[: rows * cols]).reshape(rows, cols)
    return Mesh(grid, axis_names)
