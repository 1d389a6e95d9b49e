from .covariance import (
    pair_products,
    spatial_covariance,
    weighted_covariance,
    weighted_covariance_auto,
    weighted_covariance_from_pairs,
)
from .ip import ip_update, cond_guard
from .ip_components import (
    auxiva_ip_step_components,
    ip_sweep_from_planes,
    pair_products_planes,
    weighted_covariance_components,
)
from .iss import iss_sweep
from .eig2 import eig2x2, generalized_eig2x2_descending
from .fast_linalg import batched_det, batched_inv, batched_log_abs_det
from .packing import Pair, jit_complex, pack, realify, to_host, unpack
from .blocks import BlockLayout

__all__ = [
    "pair_products",
    "spatial_covariance",
    "weighted_covariance",
    "weighted_covariance_auto",
    "weighted_covariance_from_pairs",
    "ip_update",
    "cond_guard",
    "auxiva_ip_step_components",
    "ip_sweep_from_planes",
    "pair_products_planes",
    "weighted_covariance_components",
    "iss_sweep",
    "eig2x2",
    "generalized_eig2x2_descending",
    "batched_det",
    "batched_inv",
    "batched_log_abs_det",
    "Pair",
    "jit_complex",
    "pack",
    "realify",
    "to_host",
    "unpack",
    "BlockLayout",
]
