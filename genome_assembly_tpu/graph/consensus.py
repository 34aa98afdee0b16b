"""Consensus polish: majority vote over the read pileup of each contig.

The reference pipeline (overlapGraphs.py:151-193) emits contigs verbatim
from the greedy walk — every base comes from whichever single read
happened to supply that merge segment, so a read error in that read
becomes a contig error even when ten overlapping reads disagree with it
(the residual ~1% dense-demo mismatch, DENSE_DEMO.json). The layout
already knows where every read landed in its contig; this module turns
those placements into a per-position base vote and rewrites each contig
with the majority base (ties keep the layout's base, so a depth-1
pileup is a no-op and polish never changes a contig with no dissenting
reads).

Flagged, off by default in the exact-parity pipeline (VERDICT round 4,
next-step #10): with `consensus=True` the contig SEQUENCES change (they
are corrected), so exact-parity differential tests keep it off. The
fast greedy layout (graph/greedy.py) — already documented non-parity —
enables it by default.

Vectorized: one encode_batch of the unique reads, one gather into a
(placements, width) code matrix, one np.add.at scatter into the global
(total_len, 4) vote table. No per-base Python loops.
"""

from __future__ import annotations

import numpy as np

from ..core.encoding import PAD, decode, encode, encode_batch


def polish_contigs(contigs: list[str], unique_reads: list[str],
                   place_read: np.ndarray, place_off: np.ndarray,
                   place_contig: np.ndarray,
                   place_weight: np.ndarray | None = None) -> list[str]:
    """Majority-vote polish of `contigs` from read placements.

    Args:
        contigs: contig strings (the layout's output).
        unique_reads: unique read strings; placements index into this.
        place_read: (P,) int array — unique-read index of each placement.
        place_off: (P,) int array — read start offset WITHIN its contig
            (may be negative or overhang the end for imperfect
            placements; out-of-range positions are ignored).
        place_contig: (P,) int array — contig index of each placement.
        place_weight: (P,) optional int vote weight (e.g. duplicate-copy
            multiplicity); default 1.

    Returns the polished contig list (same order/lengths; only base
    substitutions, never indels — the substitution-only error model of
    the reference generator, generateErrorProneReads.py:4-45).
    """
    if not contigs or len(place_read) == 0:
        return list(contigs)
    clens = np.fromiter((len(c) for c in contigs), np.int64, len(contigs))
    starts = np.zeros(len(contigs) + 1, np.int64)
    np.cumsum(clens, out=starts[1:])
    total = int(starts[-1])

    codes, lens = encode_batch(unique_reads)              # (U, W) int8
    place_read = np.asarray(place_read, np.int64)
    rc = codes[place_read]                                # (P, W)
    rl = lens[place_read].astype(np.int64)                # (P,)
    w = np.asarray(place_weight, np.int64) if place_weight is not None \
        else np.ones(len(place_read), np.int64)

    width = codes.shape[1]
    col = np.arange(width, dtype=np.int64)
    # global genome-of-contigs coordinate of each read base
    gpos = (starts[np.asarray(place_contig, np.int64)]
            + np.asarray(place_off, np.int64))[:, None] + col[None, :]
    lo = starts[np.asarray(place_contig, np.int64)][:, None]
    hi = (starts[np.asarray(place_contig, np.int64)]
          + clens[np.asarray(place_contig, np.int64)])[:, None]
    valid = (col[None, :] < rl[:, None]) & (gpos >= lo) & (gpos < hi) \
        & (rc != PAD)
    votes = np.zeros((total, 4), np.int64)
    np.add.at(votes, (gpos[valid], rc[valid].astype(np.int64)),
              np.broadcast_to(w[:, None], gpos.shape)[valid])

    orig = np.concatenate([encode(c) for c in contigs]).astype(np.int64)
    best = votes.max(axis=1)
    arg = votes.argmax(axis=1)
    orig_votes = votes[np.arange(total), np.clip(orig, 0, 3)]
    # ties (and zero-coverage positions) keep the layout's base
    out = np.where(orig_votes >= best, orig, arg).astype(np.int8)
    return [decode(out[starts[i]:starts[i + 1]])
            for i in range(len(contigs))]
