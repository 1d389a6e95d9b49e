from .iva import (
    GradLaplaceIVA,
    NaturalGradLaplaceIVA,
    AuxLaplaceIVA,
    AuxGaussIVA,
    SparseAuxIVA,
    OverAuxLaplaceIVA,
)
from .nmf import (
    EUCNMF,
    KLNMF,
    ISNMF,
    TNMF,
    CauchyNMF,
    ComplexEUCNMF,
)

# the reference has two classes named ``MultichannelISNMF``: the
# covariance-domain factorizer (``algorithm/nmf.py:678``) and the Sawada/Ozerov
# BSS solver (``bss/mnmf.py:115``).  The BSS solver gets the top-level name;
# the factorizer stays importable as ``CovarianceISNMF`` or via models.nmf.
from .nmf import MultichannelISNMF as CovarianceISNMF
from .ntf import EUCNTF
from .psdtf import LDPSDTF
from .ilrma import (
    GaussILRMA,
    TILRMA,
    ConsistentGaussILRMA,
    GGDILRMA,
    KLILRMA,
    RegularizedILRMA,
)

# reference alias (``bss/ilrma.py`` exposes ``tILRMA``)
tILRMA = TILRMA

from .fdica import GradLaplaceFDICA, NaturalGradLaplaceFDICA
from .beamform import (
    DelaySumBeamformer,
    MVDRBeamformer,
    MaxSNRBeamformer,
    delay_sum_beamform,
    ml_beamform,
    mvdr_beamform,
    max_snr_beamform,
)
from .prox import PDSBSSBase, ProxLaplaceIVA, SparseProxIVA
from .mnmf import (
    MultichannelISNMF,
    MultichanneltNMF,
    FastMultichannelISNMF,
)
from .idlma import GaussIDLMA, torch_dnn
from .ipsdta import GaussIPSDTA, TIPSDTA

# reference alias (``bss/ipsdta.py`` exposes ``tIPSDTA``)
tIPSDTA = TIPSDTA

# reference alias (``algorithm/nmf.py`` exposes ``tNMF``)
tNMF = TNMF

__all__ = [
    "GradLaplaceIVA",
    "NaturalGradLaplaceIVA",
    "AuxLaplaceIVA",
    "AuxGaussIVA",
    "SparseAuxIVA",
    "OverAuxLaplaceIVA",
    "EUCNMF",
    "KLNMF",
    "ISNMF",
    "TNMF",
    "tNMF",
    "CauchyNMF",
    "ComplexEUCNMF",
    "MultichannelISNMF",
    "EUCNTF",
    "LDPSDTF",
    "GaussILRMA",
    "TILRMA",
    "tILRMA",
    "ConsistentGaussILRMA",
    "GGDILRMA",
    "KLILRMA",
    "RegularizedILRMA",
    "GradLaplaceFDICA",
    "NaturalGradLaplaceFDICA",
    "DelaySumBeamformer",
    "MVDRBeamformer",
    "MaxSNRBeamformer",
    "delay_sum_beamform",
    "ml_beamform",
    "mvdr_beamform",
    "max_snr_beamform",
    "PDSBSSBase",
    "ProxLaplaceIVA",
    "SparseProxIVA",
    "CovarianceISNMF",
    "MultichannelISNMF",
    "MultichanneltNMF",
    "FastMultichannelISNMF",
    "GaussIDLMA",
    "torch_dnn",
    "GaussIPSDTA",
    "TIPSDTA",
    "tIPSDTA",
]
