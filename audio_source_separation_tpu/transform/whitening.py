"""Time-domain whitening.

Parity target: reference ``src/transform/whitening.py:3-18``.  The reference
uses ``np.linalg.eig`` on the (symmetric, real) self-covariance; since
``x x^T`` is symmetric PSD we use ``eigh`` — TPU-native and numerically
equivalent up to eigenvector ordering/sign (whitening output spans the same
decorrelated space; covariance of the output is the identity either way).
"""

import jax.numpy as jnp


def whitening(input, zero_mean=True, channel_first=True):
    """Args:
        input: real ``(n_channels, T)`` signal.
    Returns:
        whitened ``(n_channels, T)`` with identity self-covariance.
    """
    if not zero_mean:
        raise AssertionError("`zero_mean` must be True.")
    if not channel_first:
        raise AssertionError("`channel_first` must be True.")
    x = jnp.asarray(input)
    self_cov = x @ x.T
    w, v = jnp.linalg.eigh(self_cov)
    return (v.T @ x) / jnp.sqrt(w)[:, None]
