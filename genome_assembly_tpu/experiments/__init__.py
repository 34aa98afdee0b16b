from .runner import test_assembly, run_simulations, run_simulations_parallel

__all__ = ["test_assembly", "run_simulations", "run_simulations_parallel"]
