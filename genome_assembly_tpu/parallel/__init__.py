from .mesh import (
    init_distributed,
    make_mesh,
    make_mesh_2d,
    make_mesh_hosts_chips,
)
from .sharded import (
    all_pairs_block_scores,
    all_pairs_block_scores_2d,
    distributed_assemble_contigs,
    distributed_build_overlap_graph,
    distributed_score_pairs,
    sharded_overlap_scores,
    sharded_pipeline_step,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "make_mesh_2d",
    "make_mesh_hosts_chips",
    "all_pairs_block_scores",
    "all_pairs_block_scores_2d",
    "distributed_assemble_contigs",
    "distributed_build_overlap_graph",
    "distributed_score_pairs",
    "sharded_overlap_scores",
    "sharded_pipeline_step",
]
