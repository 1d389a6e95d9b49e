from .linalg import to_hermite, to_psd, parallel_sort, eye_like_filter
from .audio import read_wav, write_wav, mu_law_compand, inv_mu_law_compand
from .flooring import floor_below, identity_ridge
from .metrics import (
    si_sdr,
    pairwise_si_sdr,
    pit_si_sdr,
    si_sdr_improvement,
    bss_eval_sources,
    bss_eval_improvement,
)
from .callbacks import (
    SDRImprovementCallback,
    BSSEvalCallback,
    StateSnapshotCallback,
    LossLogger,
)
from .synthesis import convolutive_mixture, synthetic_room_impulse_responses

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
    "si_sdr",
    "pairwise_si_sdr",
    "pit_si_sdr",
    "si_sdr_improvement",
    "bss_eval_sources",
    "bss_eval_improvement",
    "SDRImprovementCallback",
    "BSSEvalCallback",
    "StateSnapshotCallback",
    "LossLogger",
    "convolutive_mixture",
    "synthetic_room_impulse_responses",
]
