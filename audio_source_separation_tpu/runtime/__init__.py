from .solver import IterativeSolver

__all__ = ["IterativeSolver"]
