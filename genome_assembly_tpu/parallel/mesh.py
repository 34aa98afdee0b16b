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


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` with the standard
    env-var fallbacks (the TPU-pod replacement for the reference's joblib
    process pool, experiments.py:537). No-op when already initialised or
    when running single-process with no coordinator configured.
    """
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return  # single-process run: nothing to initialise
    # Only skip when actually initialised; a genuine bring-up failure
    # (bad coordinator address, port clash, timeout) must propagate —
    # swallowing it would silently degrade a pod run to single-host.
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return  # already initialised
    try:
        from jax._src.distributed import global_state as _state
        if getattr(_state, "client", None) is not None:
            return  # already initialised (older JAX without is_initialized)
    except ImportError:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def make_mesh_hosts_chips(axis_names=("hosts", "chips"),
                          devices=None) -> Mesh:
    """('hosts', 'chips') mesh: the DCN axis spans processes (hosts), the
    ICI axis spans each host's local chips. Shardings that psum/all_gather
    over 'chips' ride ICI; 'hosts' collectives cross DCN.
    """
    if devices is None:
        devices = jax.devices()
    # jax.devices() order is not guaranteed to group by process; sort so
    # each 'hosts' row really is one process's local chips (otherwise the
    # 'chips' axis would silently carry DCN traffic).
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    n_local = max(1, len([d for d in devices
                          if d.process_index == devices[0].process_index]))
    assert len(devices) % n_local == 0, (
        f"uneven local device counts: {len(devices)} devices, "
        f"{n_local} on process {devices[0].process_index}")
    n_hosts = len(devices) // n_local
    grid = np.asarray(devices).reshape(n_hosts, n_local)
    return Mesh(grid, axis_names)
