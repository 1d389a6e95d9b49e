from .linalg import to_hermite, to_psd, parallel_sort, eye_like_filter
from .audio import read_wav, write_wav, mu_law_compand, inv_mu_law_compand
from .flooring import floor_below, identity_ridge

__all__ = [
    "to_hermite",
    "to_psd",
    "parallel_sort",
    "eye_like_filter",
    "read_wav",
    "write_wav",
    "mu_law_compand",
    "inv_mu_law_compand",
    "floor_below",
    "identity_ridge",
]
