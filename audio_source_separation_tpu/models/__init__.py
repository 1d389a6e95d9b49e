from .iva import (
    GradLaplaceIVA,
    NaturalGradLaplaceIVA,
    AuxLaplaceIVA,
    AuxGaussIVA,
    SparseAuxIVA,
    OverAuxLaplaceIVA,
)

__all__ = [
    "GradLaplaceIVA",
    "NaturalGradLaplaceIVA",
    "AuxLaplaceIVA",
    "AuxGaussIVA",
    "SparseAuxIVA",
    "OverAuxLaplaceIVA",
]
