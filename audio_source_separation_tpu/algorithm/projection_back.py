"""Projection-back scale restoration.

Parity target: reference ``src/algorithm/projection_back.py:3-34`` — the
least-squares fit ``A = X Y^H (Y Y^H)^{-1}`` per frequency bin, returning the
per-(source, bin) complex scales to apply to the separated signals.  Every
determined-BSS solver calls this once at the end of ``__call__``.

TPU shape: one batched complex solve over the bin axis (MXU-friendly); we
solve the adjoint system instead of forming the explicit inverse.
"""

import jax.numpy as jnp


def projection_back(Y, reference):
    """Args:
        Y: separated sources ``(n_sources, n_bins, n_frames)``.
        reference: mixture at the reference mic ``(n_bins, n_frames)`` or the
            full mixture ``(n_channels, n_bins, n_frames)``.
    Returns:
        scale ``(n_sources, n_bins)`` (2-D reference) or
        ``(n_channels, n_sources, n_bins)`` (3-D reference).
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

    n_sources = Y.shape[0]
    n_channels = X.shape[0]
    if n_sources <= 3:
        # planes fast path: the per-bin Gram matrices are N² (F,)-plane
        # frame reductions and the solve is the closed-form adjugate — no
        # (N, F, T) ⇄ (F, N, T) layout transposes and no batched
        # tiny-matmul/LU lowering (this runs per ITERATION in IDLMA and
        # Consistent-ILRMA, not just at finalize)
        from ..ops.fast_linalg import inv_planes

        YY = jnp.stack(
            [
                jnp.stack(
                    [(Y[i] * Y[j].conj()).sum(axis=-1) for j in range(n_sources)]
                )
                for i in range(n_sources)
            ]
        )  # (N, N, F)
        # ridge the Gram before the adjugate inverse: a silent/duplicated
        # source or an all-zero bin makes det → 0 (inf/NaN scales); the
        # relative eps·trace diagonal matches the flooring convention used
        # by the covariance guards elsewhere and is a ~1e-12 perturbation on
        # well-conditioned bins (the reference solves unregularized)
        trace = sum(YY[i, i].real for i in range(n_sources))
        ridge = (1e-12 * trace + 1e-32).astype(YY.dtype)
        eye = jnp.eye(n_sources, dtype=YY.dtype)[..., None]
        YY = YY + eye * ridge
        inv = inv_planes(YY)
        XY = [
            [(X[c] * Y[j].conj()).sum(axis=-1) for j in range(n_sources)]
            for c in range(n_channels)
        ]
        A = jnp.stack(
            [
                jnp.stack(
                    [
                        sum(XY[c][k] * inv[k, j] for k in range(n_sources))
                        for j in range(n_sources)
                    ]
                )
                for c in range(n_channels)
            ]
        )  # (C, N, F)
        if n_dims == 2:
            return A[0]  # (n_sources, n_bins)
        return A

    Yb = jnp.transpose(Y, (1, 0, 2))  # (n_bins, n_sources, n_frames)
    Xb = jnp.transpose(X, (1, 0, 2))  # (n_bins, n_channels, n_frames)
    Y_hermite = jnp.swapaxes(Yb, -2, -1).conj()  # (n_bins, n_frames, n_sources)
    YYH = Yb @ Y_hermite  # (n_bins, n_sources, n_sources), Hermitian
    XYH = Xb @ Y_hermite  # (n_bins, n_channels, n_sources)
    # A = XYH @ inv(YYH)  ⇔  solve YYH^H A^H = XYH^H (YYH Hermitian)
    A = jnp.swapaxes(
        jnp.linalg.solve(jnp.swapaxes(YYH, -2, -1).conj(), jnp.swapaxes(XYH, -2, -1).conj()),
        -2,
        -1,
    ).conj()  # (n_bins, n_channels, n_sources)

    if n_dims == 2:
        return jnp.transpose(A[:, 0, :], (1, 0))  # (n_sources, n_bins)
    return jnp.transpose(A, (1, 2, 0))  # (n_channels, n_sources, n_bins)


def apply_projection_back(Y, reference):
    """Convenience: scale ``Y`` by the projection-back coefficients."""
    scale = projection_back(Y, reference)
    return Y * scale[..., None]
