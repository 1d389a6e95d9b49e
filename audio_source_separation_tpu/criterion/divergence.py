"""Divergence criteria for NMF/MNMF losses.

Parity target: reference ``src/criterion/divergence.py:5-105``.  Note the
reference's ``kl_divergence`` contains a torch-ism (``loss.sum(dim=0)``,
``divergence.py:18``) that raises ``TypeError`` if ever called; here the sum
over the leading axis is implemented correctly (documented divergence from the
reference's broken path).
"""

import jax.numpy as jnp

from ..ops.fast_linalg import batched_det, batched_eigvalsh, batched_inv

EPS = 1e-12


def kl_divergence(input, target, eps=EPS):
    """KL divergence summed over the leading axis (``(C, *) → (*)``)."""
    _input = input + eps
    _target = target + eps
    ratio = _target / _input
    loss = _target * jnp.log(ratio)
    return loss.sum(axis=0)


def is_divergence(input, target, eps=EPS):
    """Itakura–Saito divergence, elementwise."""
    _input = input + eps
    _target = target + eps
    ratio = _target / _input
    return ratio - jnp.log(ratio) - 1


def generalized_kl_divergence(input, target, eps=EPS):
    """Generalized KL divergence, elementwise."""
    _input = input + eps
    _target = target + eps
    ratio = _target / _input
    return _target * jnp.log(ratio) + _input - _target


def beta_divergence(input, target, beta=2):
    """Beta divergence (β ∉ {0, 1}), elementwise."""
    beta_minus1 = beta - 1
    assert beta != 0, "Use is_divergence instead."
    assert beta_minus1 != 0, "Use generalized_kl_divergence instead."
    loss = (
        target * (target**beta_minus1 - input**beta_minus1) / beta_minus1
        - (target**beta - input**beta) / beta
    )
    return loss


def multichannel_is_divergence(input, target, eps=EPS):
    """Multichannel IS divergence ``tr(T I^{-1}) - logdet(T I^{-1}) - C``.

    ``input``/``target``: ``(*, C, C)`` Hermitian matrices → loss ``(*)``.
    """
    n_channels = input.shape[-1]
    assert input.shape[-2] == input.shape[-1], "Invalid input shape"
    assert target.shape[-2] == target.shape[-1], "Invalid input shape"
    eye = jnp.eye(n_channels, dtype=input.dtype)
    input = input + eps * eye
    target = target + eps * eye
    XX = target @ batched_inv(input)
    trace = jnp.trace(XX, axis1=-2, axis2=-1).real
    logdet = jnp.log(batched_det(XX).real)
    return trace - logdet - n_channels


def logdet_divergence(input, target, eps=EPS):
    """Log-det divergence with eigenvalue-floored log-determinants.

    Parity target: ``criterion/divergence.py:83-105`` (the MNMF loss).
    """
    n_channels = input.shape[-1]
    assert input.shape[-2] == input.shape[-1], "Invalid input shape"
    assert target.shape[-2] == target.shape[-1], "Invalid input shape"
    # closed forms (ops/fast_linalg) for the C <= 3 cases: TPU's batched
    # LU/eigensolver kernels can fault on hard tiny-matrix batches
    XY = target @ batched_inv(input)
    trace = jnp.trace(XY, axis1=-2, axis2=-1).real
    eig_x = jnp.maximum(batched_eigvalsh(target).real, eps)
    eig_y = jnp.maximum(batched_eigvalsh(input).real, eps)
    logdet = jnp.sum(jnp.log(eig_x), axis=-1) - jnp.sum(jnp.log(eig_y), axis=-1)
    return trace - logdet - n_channels
