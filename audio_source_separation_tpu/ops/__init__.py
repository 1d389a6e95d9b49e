from .covariance import weighted_covariance
from .ip import ip_update, cond_guard
from .iss import iss_sweep
from .eig2 import eig2x2, generalized_eig2x2_descending

__all__ = [
    "weighted_covariance",
    "ip_update",
    "cond_guard",
    "iss_sweep",
    "eig2x2",
    "generalized_eig2x2_descending",
]
