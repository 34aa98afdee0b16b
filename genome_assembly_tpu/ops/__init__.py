from .overlap import overlap_scores, overlap_align_full
from .smith_waterman import local_align_batch, local_align_one

__all__ = [
    "overlap_scores",
    "overlap_align_full",
    "local_align_batch",
    "local_align_one",
]
