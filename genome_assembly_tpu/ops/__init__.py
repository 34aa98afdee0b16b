from .gotoh import local_align_affine
from .overlap import overlap_scores, overlap_align_full
from .smith_waterman import (
    local_align_batch,
    local_align_batch_banded,
    local_align_batch_ops,
    local_align_one,
    seed_diagonals_batch,
)

__all__ = [
    "local_align_affine",
    "local_align_batch",
    "local_align_batch_banded",
    "local_align_batch_ops",
    "local_align_one",
    "overlap_align_full",
    "overlap_scores",
    "seed_diagonals_batch",
]
