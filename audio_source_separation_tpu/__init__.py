"""audio_source_separation_tpu — TPU-native blind source separation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``tky823/audio_source_separation`` (reference mounted read-only at
``/root/reference``): classical iterative blind-source-separation solvers
(FDICA / IVA / ILRMA / MNMF / FastMNMF / IPSDTA / beamformers / IDLMA) and
single-channel factorization models (NMF / NTF / PSDTF) operating on complex
STFT spectrograms.

Design stance (TPU-first, not a port):
  * every solver is a functional ``(init, update, loss, finalize)`` quadruple
    over an explicit state pytree, iterated with ``jax.lax.scan`` under ``jit``;
  * per-frequency-bin C×C complex linear algebra is batched over the bin axis
    and lowered to the MXU;
  * hot ops (weighted covariance accumulation, IP row solves, ISS sweeps) live
    in :mod:`audio_source_separation_tpu.ops` with Pallas TPU kernels and pure
    XLA fallbacks;
  * multi-device scaling shards the frequency-bin axis (and a mixture batch
    axis) over a ``jax.sharding.Mesh`` — see
    :mod:`audio_source_separation_tpu.parallel`.

Public data layout matches the reference (``src/bss/iva.py:61-67``):
``input (n_channels, n_bins, n_frames)`` complex STFT, demixing filters
``(n_bins, n_sources, n_channels)``, output ``(n_sources, n_bins, n_frames)``.
"""

__version__ = "0.1.0"

from . import algorithm, criterion, models, ops, parallel, runtime, transform, utils  # noqa: F401,E402

from .transform import stft, istft, build_window, build_optimal_window, pca, whitening  # noqa: F401,E402
from .algorithm import projection_back, minimum_distortion_principle, solve_riccati  # noqa: F401,E402
