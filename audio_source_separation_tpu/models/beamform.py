"""Beamformers: delay-and-sum, ML/MVDR, max-SNR (GEV).

Parity targets (reference ``src/bss/beamform.py``):
  * ``delay_sum_beamform`` (``beamform.py:5-19``): ``y = a^H x`` per bin,
    re-imaged at the reference mic;
  * ``ml_beamform`` (``beamform.py:21-44``): ``w = R^{-1}a / (a^H R^{-1} a)``;
  * ``mvdr_beamform`` (``beamform.py:46-58``): ML beamformer with the
    covariance estimated from the data.  The reference's ``MVDRBeamformer``
    wrapper passes a ``covariance=`` kwarg that ``mvdr_beamform`` does not
    accept (latent ``TypeError``, ``beamform.py:117`` vs ``:46``); here a
    user-supplied covariance is honored (documented fix);
  * ``MaxSNRBeamformer`` (``beamform.py:121-138``): empty in the reference;
    implemented here as the standard GEV/max-SNR beamformer via the
    generalized Hermitian eigenproblem ``R_noise^{-1} R_signal`` (batched
    ``eigh`` through a Cholesky whitening — TPU-native).

All functions are pure jnp and batched over the bin axis.
"""

import jax.numpy as jnp

EPS = 1e-12


def delay_sum_beamform(input, steering_vector, reference_id=0):
    """Args:
        input: ``(n_channels, n_bins, n_frames)``.
        steering_vector: ``(n_bins, n_channels, n_sources)``.
    Returns:
        ``(n_sources, n_bins, n_frames)`` re-imaged at ``reference_id``.
    """
    X, A = input, steering_vector
    a_hermite = jnp.transpose(A, (2, 1, 0))[..., None].conj()  # (S, C, F, 1)
    Y = jnp.sum(a_hermite * X, axis=1)  # (S, F, T)
    A_img = jnp.transpose(A, (1, 2, 0))[..., None]  # (C, S, F, 1)
    return A_img[reference_id] * Y


def ml_beamform(input, steering_vector, covariance, reference_id=0, eps=EPS):
    """Maximum-likelihood (MVDR with known covariance) beamformer.

    ``w = R^{-1} a / (a^H R^{-1} a)`` per bin, applied as ``y = w^H x``
    (``beamform.py:21-44``).  Documented divergence: the reference applies
    ``w^T x`` (missing conjugate, ``beamform.py:41-42``), which violates the
    distortionless constraint ``w^H a = 1``; the correct adjoint is used here.
    """
    X = jnp.transpose(input, (1, 0, 2))  # (F, C, T)
    A = steering_vector  # (F, C, S)
    numerator = jnp.linalg.solve(covariance, A)  # R^{-1} A, (F, C, S)
    denominator = jnp.sum(A.conj() * numerator, axis=1, keepdims=True)  # (F, 1, S)
    denominator = jnp.where(jnp.abs(denominator) < eps, eps, denominator)
    W = numerator / denominator  # (F, C, S)
    Y = jnp.swapaxes(W, -2, -1).conj() @ X  # (F, S, T) — y = w^H x
    Y = jnp.transpose(Y, (1, 0, 2))  # (S, F, T)
    A_img = jnp.transpose(A, (1, 2, 0))[..., None]  # (C, S, F, 1)
    return A_img[reference_id] * Y


def mvdr_beamform(input, steering_vector, covariance=None, reference_id=0, eps=EPS):
    """MVDR: ML beamformer with the spatial covariance estimated from the
    data unless explicitly supplied (``beamform.py:46-58``)."""
    if covariance is None:
        Xb = jnp.transpose(input, (1, 0, 2))  # (F, C, T)
        covariance = jnp.mean(
            Xb[:, :, None, :] * Xb[:, None, :, :].conj(), axis=3
        )  # (F, C, C)
    return ml_beamform(
        input, steering_vector, covariance, reference_id=reference_id, eps=eps
    )


def max_snr_beamform(
    input, signal_covariance, noise_covariance, reference_id=0, eps=EPS
):
    """Max-SNR (GEV) beamformer: per bin, the dominant generalized eigenvector
    of ``(R_noise, R_signal)``, solved TPU-natively by Cholesky whitening +
    Hermitian ``eigh``.  Output scale is fixed by distortionless re-imaging
    onto the reference channel of the signal covariance (rank-1 assumption).

    Args:
        input: ``(n_channels, n_bins, n_frames)``.
        signal_covariance / noise_covariance: ``(n_bins, C, C)`` Hermitian.
    Returns:
        ``(1, n_bins, n_frames)`` enhanced signal at the reference channel.
    """
    n_channels = input.shape[0]
    Rn = noise_covariance + eps * jnp.eye(n_channels, dtype=noise_covariance.dtype)
    L = jnp.linalg.cholesky(Rn)  # (F, C, C)
    L_inv = jnp.linalg.inv(L)
    M = L_inv @ signal_covariance @ jnp.swapaxes(L_inv, -2, -1).conj()
    M = (M + jnp.swapaxes(M, -2, -1).conj()) / 2
    _, v = jnp.linalg.eigh(M)
    w = jnp.swapaxes(L_inv, -2, -1).conj() @ v[..., -1:]  # (F, C, 1)
    w = w[..., 0]
    # re-image: for rank-1 Rs = σ² a a^H, (Rs w)_ref / (w^H Rs w) = a_ref/(w^H a),
    # so scaling w^H x recovers the reference-channel image a_ref·s exactly
    img = jnp.einsum("fcd,fd->fc", signal_covariance, w)  # Rs w, (F, C)
    denom = jnp.einsum("fc,fc->f", w.conj(), img)  # w^H Rs w (real ≥ 0)
    scale = img[:, reference_id] / jnp.where(jnp.abs(denom) < eps, eps, denom)
    X = jnp.transpose(input, (1, 0, 2))  # (F, C, T)
    Y = jnp.einsum("fc,fct->ft", w.conj(), X) * scale[:, None]
    return Y[None]


class DelaySumBeamformer:
    """Class wrapper (``beamform.py:62-90``)."""

    def __init__(self, steering_vector=None, reference_id=0):
        self.steering_vector = steering_vector
        self.reference_id = reference_id

    def __call__(self, input, steering_vector=None):
        from ..ops.packing import jit_complex

        self.input = input
        if steering_vector is not None:
            self.steering_vector = steering_vector
        elif self.steering_vector is None:
            raise ValueError("Specify steering vector.")
        output = jit_complex(
            lambda X, A: delay_sum_beamform(X, A, reference_id=self.reference_id)
        )(input, self.steering_vector)
        self.estimation = output
        return output


class MVDRBeamformer:
    """Class wrapper (``beamform.py:92-119``); honors ``covariance=``."""

    def __init__(self, steering_vector=None, reference_id=0, eps=EPS):
        self.steering_vector = steering_vector
        self.reference_id = reference_id
        self.eps = eps

    def __call__(self, input, steering_vector=None, covariance=None):
        from ..ops.packing import jit_complex

        self.input = input
        if steering_vector is not None:
            self.steering_vector = steering_vector
        elif self.steering_vector is None:
            raise ValueError("Specify steering vector.")
        if covariance is None:
            fn = jit_complex(
                lambda X, A: mvdr_beamform(
                    X, A, reference_id=self.reference_id, eps=self.eps
                )
            )
            output = fn(input, self.steering_vector)
        else:
            fn = jit_complex(
                lambda X, A, R: mvdr_beamform(
                    X, A, covariance=R, reference_id=self.reference_id, eps=self.eps
                )
            )
            output = fn(input, self.steering_vector, covariance)
        self.estimation = output
        return output


class MaxSNRBeamformer:
    """Max-SNR/GEV beamformer (functional where the reference is an empty
    shell, ``beamform.py:121-138``)."""

    def __init__(self, steering_vector=None, reference_id=0, eps=EPS):
        self.steering_vector = steering_vector
        self.reference_id = reference_id
        self.eps = eps

    def __call__(self, input, signal_covariance=None, noise_covariance=None):
        from ..ops.packing import jit_complex

        self.input = input
        if signal_covariance is None or noise_covariance is None:
            raise ValueError("Specify signal_covariance and noise_covariance.")
        output = jit_complex(
            lambda X, Rs, Rn: max_snr_beamform(
                X, Rs, Rn, reference_id=self.reference_id, eps=self.eps
            )
        )(input, signal_covariance, noise_covariance)
        self.estimation = output
        return output
