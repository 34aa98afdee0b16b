from .mesh import make_mesh
from .sharded import (
    sharded_overlap_scores,
    sharded_pipeline_step,
    all_pairs_block_scores,
)

__all__ = [
    "make_mesh",
    "sharded_overlap_scores",
    "sharded_pipeline_step",
    "all_pairs_block_scores",
]
