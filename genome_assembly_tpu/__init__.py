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


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (opt out: GA_TPU_NO_COMP_CACHE=1).

    The pipeline compiles a small, fixed family of kernel shapes; caching
    them makes every process after the first start in seconds instead of
    minutes on TPU.
    """
    import os

    if os.environ.get("GA_TPU_NO_COMP_CACHE") == "1":
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         os.pardir, ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
