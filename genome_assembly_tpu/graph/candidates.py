"""Device-side k-mer candidate-pair generation.

The reference builds its k-mer prefilter with host Python dicts
(`overlapGraphs.py:30-49`): an index of each unique read's first-k chars,
probed by each read's last-k chars. This module is the TPU-native
equivalent (SURVEY.md §7.4, BASELINE north star): pack each (≤15)-mer
into an int64 key on device, stable-sort the prefix keys, and join
suffix→prefix with two vectorized `searchsorted` passes. The emitted
pair list is bit-identical to the reference's enumeration order:

- the reference iterates source reads ua in unique order and, per ua,
  walks `prefix_index[suffix]` — a list appended in unique order, i.e.
  increasing ub. So the pair list is sorted by (ua, ub).
- here: a STABLE argsort of prefix keys keeps ub increasing within each
  equal-key group, so `order[lo[ua]:hi[ua]]` replays the reference's
  per-ua candidate order, and emitting groups in ua order replays the
  outer loop. Self-pairs (ua == ub; reference's `read_a != read_b`
  check at `overlapGraphs.py:52`) are masked out afterwards.

Reads shorter than k use the whole read as both prefix and suffix
(`overlapGraphs.py:33-47`), so keys must distinguish lengths. Rather
than a separate length field (which would need 34 bits for k=15 —
JAX here runs without x64, so int64 lanes silently truncate), the key
appends a TERMINATOR digit: key = Σ_{i<m} code_i·4^i + 4^m for
m = min(len, k). Injective across lengths (the highest set bit pair
encodes m) and ≤ 4^15 + 4^15 − 1 = 2^31 − 1 — exactly int32.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..core.encoding import encode_batch

MAX_DEVICE_K = 15  # 2 bits/base: 15-mer packs into 30 bits (grid max, experiments.py:53)
MAX_HOST_K = 31    # numpy join uses int64 keys: 31-mer + terminator = 63 bits


@functools.partial(jax.jit, static_argnames=("k",))
def kmer_join_keys(left: jax.Array, lens: jax.Array, k: int):
    """(prefix_key, suffix_key) int32 per read; equal keys ⇔ equal strings.

    left: (U, W) int8 LEFT-aligned codes; lens: (U,) int32 true lengths.
    key = Σ_{i<m} code_i·4^i + 4^m (terminator digit), m = min(len, k).
    """
    u_count, w = left.shape
    lens32 = lens.astype(jnp.int32)
    m = jnp.minimum(lens32, k)                          # effective k-mer len
    pos = jnp.arange(w, dtype=jnp.int32)
    codes = left.astype(jnp.int32)
    # weights: 4^i for i < m (clip the shift so masked-out lanes — where
    # 2*pos can exceed 31 for long reads — never hit UB before the mask)
    shift_cap = jnp.minimum(pos, MAX_DEVICE_K)
    pow4 = jnp.left_shift(jnp.int32(1), 2 * shift_cap)  # (W,)
    # prefix: first m chars, weight 4^i at position i
    pref_mask = pos[None, :] < m[:, None]
    pref = jnp.sum(jnp.where(pref_mask, codes * pow4[None, :], 0), axis=1)
    # suffix: last m chars; char at position p has suffix-relative index
    # rel = p - (len - m), weight 4^rel
    rel = pos[None, :] - (lens32 - m)[:, None]
    suf_mask = (rel >= 0) & (rel < m[:, None])
    rel_cap = jnp.clip(rel, 0, MAX_DEVICE_K)
    sw = jnp.left_shift(jnp.int32(1), 2 * rel_cap)
    suf = jnp.sum(jnp.where(suf_mask, codes * sw, 0), axis=1)
    term = jnp.left_shift(jnp.int32(1), 2 * m)          # 4^m terminator
    return pref + term, suf + term


@jax.jit
def _mask_pad_keys(pref: jax.Array, suf: jax.Array, u_count: jax.Array):
    """Overwrite padding rows (index >= u_count) with unique negative
    keys on disjoint ranges (even for prefixes, odd for suffixes) so
    padded shape-class rows can never join anything."""
    idx = jnp.arange(pref.shape[0], dtype=jnp.int32)
    is_pad = idx >= u_count
    return (jnp.where(is_pad, -2 - 2 * idx, pref),
            jnp.where(is_pad, -1 - 2 * idx, suf))


@jax.jit
def _join_index(pref: jax.Array, suf: jax.Array):
    """Sorted-join bookkeeping: (order, lo, hi) with order a stable argsort
    of prefix keys and [lo[u], hi[u]) the match range for read u's suffix."""
    order = jnp.argsort(pref, stable=True)
    skeys = pref[order]
    lo = jnp.searchsorted(skeys, suf, side="left")
    hi = jnp.searchsorted(skeys, suf, side="right")
    return order, lo, hi


@jax.jit
def _emit_pairs(cum: jax.Array, lo: jax.Array, order: jax.Array,
                p: jax.Array):
    """Flatten the ragged per-ua match groups into (ua, ub) arrays.

    Pair p lives in group ua = searchsorted(cum, p, 'right') - 1 at
    within-group offset p - cum[ua]; its target is order[lo[ua] + r].
    Padding rows (p ≥ total) read clamped indices and are masked on host.
    """
    ua = jnp.clip(jnp.searchsorted(cum, p, side="right") - 1,
                  0, cum.shape[0] - 2)
    r = p - cum[ua]
    ub = order[jnp.clip(lo[ua] + r, 0, order.shape[0] - 1)]
    return ua.astype(jnp.int32), ub.astype(jnp.int32)


def _shape_class(n: int) -> int:
    c = 1024
    while c < n:
        c *= 2
    return c


def candidate_pairs_device(unique_reads: list[str], k: int):
    """Device sort-join candidate generation; reference enumeration order.

    Returns (ia, ib) int32 numpy arrays — ordered (source, target) unique
    indices, bit-identical to `build.candidate_pairs(unique_reads, k)`.
    Requires 0 < k ≤ 15 (callers fall back to the host dict join above 15,
    a declared non-goal: grids max out at k=15, `experiments.py:53`).
    """
    assert 0 < k <= MAX_DEVICE_K, f"device join supports 1..15, got k={k}"
    u_count = len(unique_reads)
    if u_count == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    width = max(len(r) for r in unique_reads)
    # power-of-two unique-axis class: unique counts drift per iteration
    # and exact shapes would recompile the join kernels every run
    u_pad = 256
    while u_pad < u_count:
        u_pad *= 2
    left, lens = encode_batch(unique_reads + [""] * (u_pad - u_count),
                              width=width, align="left")
    pref, suf = kmer_join_keys(jnp.asarray(left), jnp.asarray(lens), k)
    # pad rows all carry the empty-string key (terminator 4^0 = 1) and
    # would join each other quadratically; remap them to unique values
    # on disjoint negative ranges so they match nothing
    pref, suf = _mask_pad_keys(pref, suf, jnp.int32(u_count))
    order, lo, hi = _join_index(pref, suf)
    cnt = np.asarray(jax.device_get(hi - lo), dtype=np.int64)
    total = int(cnt.sum())
    if total == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    assert total < 2**31, "candidate count exceeds int32 indexing"
    # cum spans the PADDED unique axis (stable shape class for
    # _emit_pairs); padded groups are empty so the flat cum tail never
    # owns a p < total under searchsorted(..., "right") - 1
    cum = np.zeros(u_pad + 1, dtype=np.int32)
    np.cumsum(cnt, out=cum[1:])
    p_pad = _shape_class(total)  # few padded shape classes → few compiles
    p = jnp.arange(p_pad, dtype=jnp.int32)
    ua, ub = _emit_pairs(jnp.asarray(cum), lo, order, p)
    ua = np.asarray(jax.device_get(ua))[:total]
    ub = np.asarray(jax.device_get(ub))[:total]
    keep = ua != ub  # reference skips identical reads (overlapGraphs.py:52)
    return ua[keep], ub[keep]


def candidate_pairs_numpy(unique_reads: list[str], k: int):
    """Host mirror of the device sort-join: same key construction, same
    stable-argsort + searchsorted join, pure numpy — bit-identical pair
    order to `candidate_pairs` / `candidate_pairs_device`.

    This is the size-aware dispatch's small-problem path (core/dispatch.py):
    below the device-join threshold the whole join costs less than one
    tunnel round trip, and unlike the reference's dict probe
    (overlapGraphs.py:30-49) it is vectorized end to end, so it also
    replaces the host dict join at every size. int64 keys lift the k cap
    from 15 (int32 device lanes) to 31.
    """
    assert 0 < k <= MAX_HOST_K, f"numpy join supports 1..{MAX_HOST_K}, got k={k}"
    u_count = len(unique_reads)
    if u_count == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    left, lens = encode_batch(unique_reads, align="left")
    codes = left.astype(np.int64)
    lens64 = lens.astype(np.int64)
    w = codes.shape[1]
    m = np.minimum(lens64, k)                          # effective k-mer len
    pos = np.arange(w, dtype=np.int64)
    pow4 = np.left_shift(np.int64(1), 2 * np.minimum(pos, MAX_HOST_K))
    pref_mask = pos[None, :] < m[:, None]
    pref = np.where(pref_mask, codes * pow4[None, :], 0).sum(axis=1)
    rel = pos[None, :] - (lens64 - m)[:, None]
    suf_mask = (rel >= 0) & (rel < m[:, None])
    sw = np.left_shift(np.int64(1), 2 * np.clip(rel, 0, MAX_HOST_K))
    suf = np.where(suf_mask, codes * sw, 0).sum(axis=1)
    term = np.left_shift(np.int64(1), 2 * m)           # 4^m terminator
    pref += term
    suf += term

    order = np.argsort(pref, kind="stable")
    skeys = pref[order]
    lo = np.searchsorted(skeys, suf, side="left")
    cnt = np.searchsorted(skeys, suf, side="right") - lo
    total = int(cnt.sum())
    if total == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    assert total < 2**31, "candidate count exceeds int32 indexing"
    cum = np.zeros(u_count + 1, dtype=np.int64)
    np.cumsum(cnt, out=cum[1:])
    ua = np.repeat(np.arange(u_count, dtype=np.int64), cnt)
    within = np.arange(total, dtype=np.int64) - cum[ua]
    ub = order[lo[ua] + within]
    keep = ua != ub  # reference skips identical reads (overlapGraphs.py:52)
    return ua[keep].astype(np.int32), ub[keep].astype(np.int32)


def candidate_pairs_dense(u_count: int):
    """k=0: all ordered pairs of distinct unique reads, row-major
    (`overlapGraphs.py:49`), as vectorized index arrays."""
    ia, ib = np.meshgrid(np.arange(u_count, dtype=np.int32),
                         np.arange(u_count, dtype=np.int32), indexing="ij")
    keep = ia != ib
    return ia[keep], ib[keep]
