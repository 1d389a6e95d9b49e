from .solver import IterativeSolver
from .profiling import trace, IterationTimer, benchmark_solver

__all__ = ["IterativeSolver", "trace", "IterationTimer", "benchmark_solver"]
