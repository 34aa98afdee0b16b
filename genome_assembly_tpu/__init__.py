"""genome_assembly_tpu — a TPU-native Overlap-Layout-Consensus genome assembly framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``roiteichman/Genome-Assembly-Using-Overlap-Graphs`` pipeline:

- ``core``        int8 sequence encoding, config, RNG backends
- ``simulate``    synthetic read generation + sequencing-error injection
- ``ops``         device alignment kernels (overlap scoring, Smith-Waterman)
                  plus exact-semantics host oracles for testing
- ``graph``       overlap-graph construction, cycle removal, topological layout
- ``models``      the assembly pipeline families (overlap-graph, string-graph, unitig)
- ``metrics``     assembly quality measures (N50, coverage, mismatch rates)
- ``parallel``    mesh / shard_map distribution of pair scoring and metrics
- ``experiments`` parameter-sweep harness with CSV persistence
- ``plots``       visualization suite
- ``native``      C++ graph runtime (ctypes) with pure-Python fallback
"""

__version__ = "0.1.0"
