"""Minimum-distortion-principle scale restoration.

Parity target: reference ``src/algorithm/minimum_distortion_principle.py:3-31``
— the diagonal closed form ``scale = Σ_t Y* X / Σ_t |Y|²``.
"""

import jax.numpy as jnp


def minimum_distortion_principle(Y, reference):
    """Args:
        Y: ``(n_sources, n_bins, n_frames)``.
        reference: ``(n_bins, n_frames)`` or ``(n_channels, n_bins, n_frames)``.
    Returns:
        scale ``(n_sources, n_bins)`` or ``(n_channels, n_sources, n_bins)``.
    """
    n_dims = reference.ndim
    if n_dims == 2:
        X = reference[None, :, :]
    elif n_dims == 3:
        X = reference
    else:
        raise ValueError(
            "reference.ndim is expected 2 or 3, but given {}.".format(n_dims)
        )

    YX_conj = jnp.sum(
        Y[None, :, :, :].conj() * X[:, None, :, :], axis=3
    )  # (n_channels, n_sources, n_bins)
    YY = jnp.sum(jnp.abs(Y) ** 2, axis=2)  # (n_sources, n_bins)
    scale = YX_conj / YY

    if n_dims == 2:
        return scale[0]
    return scale


def generalized_minimum_distortion_principle():
    """Empty stub, exactly as in the reference
    (``minimum_distortion_principle.py:33-34``)."""
    return
