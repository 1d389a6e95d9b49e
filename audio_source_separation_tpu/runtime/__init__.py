from .solver import IterativeSolver
from .profiling import (
    IterationTimer,
    benchmark_solver,
    measure_memory_bandwidth,
    scan_cost_analysis,
    trace,
)

__all__ = [
    "IterativeSolver",
    "trace",
    "IterationTimer",
    "benchmark_solver",
    "scan_cost_analysis",
    "measure_memory_bandwidth",
]
