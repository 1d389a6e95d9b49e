from .projection_back import projection_back
from .minimum_distortion_principle import (
    generalized_minimum_distortion_principle,
    minimum_distortion_principle,
)
from .linalg import solve_riccati

__all__ = [
    "projection_back",
    "minimum_distortion_principle",
    "generalized_minimum_distortion_principle",
    "solve_riccati",
]
