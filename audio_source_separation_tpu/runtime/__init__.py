from .solver import IterativeSolver
from .profiling import (
    IterationTimer,
    benchmark_solver,
    measure_memory_bandwidth,
    scan_cost_analysis,
    state_payload_bytes,
    trace,
)

__all__ = [
    "IterativeSolver",
    "trace",
    "IterationTimer",
    "benchmark_solver",
    "scan_cost_analysis",
    "state_payload_bytes",
    "measure_memory_bandwidth",
]
