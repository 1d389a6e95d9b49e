"""Per-bin channel PCA (overdetermined-BSS dimensionality reduction).

Parity target: reference ``src/transform/pca.py:4-21`` — eigendecomposition of
the time-averaged per-bin spatial covariance, projecting onto eigenvectors in
*ascending* eigenvalue order (``eigh`` convention), so the trailing channels
carry the dominant components.  Batched ``eigh`` over the bin axis is
TPU-supported and lowers to the MXU.
"""

import jax.numpy as jnp


def pca(input, n_sources=None):
    """Args:
        input: ``(n_channels, n_bins, n_frames)`` complex spectrogram.
        n_sources: if given, keep only the ``n_sources`` dominant components
            (the trailing eigenvectors), returning ``(n_sources, n_bins, n_frames)``.
    Returns:
        ``(n_channels or n_sources, n_bins, n_frames)`` decorrelated channels.
    """
    if input.ndim != 3:
        raise ValueError("Invalid dimension.")
    import jax

    if not isinstance(input, jax.core.Tracer):
        from ..ops.packing import jit_complex

        return jit_complex(lambda X: pca(X, n_sources=n_sources))(input)
    X = jnp.transpose(input, (1, 2, 0))  # (n_bins, n_frames, n_channels)
    covariance = jnp.mean(
        X[:, :, :, None] * X[:, :, None, :].conj(), axis=1
    )  # (n_bins, C, C)
    _, w = jnp.linalg.eigh(covariance)
    X = X @ w.conj()
    if n_sources is not None:
        X = X[..., -n_sources:]
    return jnp.transpose(X, (2, 0, 1))
