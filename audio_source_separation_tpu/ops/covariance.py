"""Weighted spatial covariance accumulation — the BSS hot op #1.

Reference idiom (``bss/iva.py:493-499`` and six clones): materialize the
``(n_bins, n_frames, C, C)`` outer-product tensor ``x x^H`` in RAM, divide by
per-(source, frame) weights, and mean over frames.  On TPU we never
materialize it: the accumulation is a single complex contraction over the
frame axis (``einsum`` → batched MXU matmuls), fused by XLA with the weight
scaling.  For C=2..8 and F up to 4097 this is bandwidth-bound on the
spectrogram read, which is the speed-of-light for this op.
"""

import jax.numpy as jnp


def weighted_covariance(X, weights):
    """``U[n, f] = (1/T) Σ_t weights[n, t] · x[:, f, t] x[:, f, t]^H``.

    Args:
        X: mixture spectrogram ``(n_channels, n_bins, n_frames)``.
        weights: real weights ``(n_sources, n_frames)`` (IVA: bin-coupled
            contrast) or ``(n_sources, n_bins, n_frames)`` (ILRMA: per-bin NMF
            variances); typically ``1 / R`` with ``R`` floored at ``eps``.
    Returns:
        ``U (n_sources, n_bins, n_channels, n_channels)`` Hermitian.
    """
    n_frames = X.shape[-1]
    w = weights.astype(X.real.dtype)
    if w.ndim == 2:
        U = jnp.einsum("nt,cft,dft->nfcd", w, X, X.conj(), optimize=True)
    else:
        U = jnp.einsum("nft,cft,dft->nfcd", w, X, X.conj(), optimize=True)
    return U / n_frames


def pair_products(X):
    """Precompute the channel pair products ``PP[c, d, f, t] = x_c x_d^*``.

    ``X`` is constant across solver iterations, so the outer products can be
    computed once and reused: every later weighted-covariance accumulation
    becomes a single GEMM over the frame axis (see
    :func:`weighted_covariance_from_pairs`).  Memory: ``C²·F·T`` complex —
    ~31 MB for C=2, F=2049, T=469 (complex64).
    """
    return X[:, None] * X[None].conj()  # (C, C, F, T)


def weighted_covariance_from_pairs(PP, weights):
    """Weighted covariance from precomputed pair products.

    For IVA-style ``weights (n_sources, n_frames)`` this is one
    ``(C²·F, T) × (T, N)`` matmul — ideal MXU shape; for ILRMA-style
    ``weights (n_sources, n_bins, n_frames)`` it is a bin-batched GEMM.

    Returns ``U (n_sources, n_bins, C, C)``.
    """
    n_frames = PP.shape[-1]
    w = weights.astype(PP.real.dtype)
    if w.ndim == 2:
        U = jnp.einsum("cdft,nt->nfcd", PP, w, optimize=True)
    else:
        U = jnp.einsum("cdft,nft->nfcd", PP, w, optimize=True)
    return U / n_frames


def weighted_covariance_auto(X, weights, PP=None, use_pallas=None):
    """Backend-dispatched weighted covariance.

    The fused Pallas kernel (pair products resident in VMEM) wins ~2.6× in
    isolation but its call boundary prevents XLA from fusing the covariance
    into the surrounding solver chain, costing ~17% end-to-end — so the
    default is the pair-product GEMM / einsum, with the Pallas kernel opt-in
    (``use_pallas=True``, TPU + per-(source, frame) weights only).
    """
    import jax

    if use_pallas and weights.ndim == 2 and jax.default_backend() == "tpu":
        from .pallas_kernels import weighted_covariance_pallas

        return weighted_covariance_pallas(X, weights)
    if PP is not None:
        return weighted_covariance_from_pairs(PP, weights)
    return weighted_covariance(X, weights)


def spatial_covariance(X):
    """Unweighted per-bin spatial covariance ``(n_bins, C, C)`` (mean over frames)."""
    n_frames = X.shape[-1]
    return jnp.einsum("cft,dft->fcd", X, X.conj()) / n_frames
