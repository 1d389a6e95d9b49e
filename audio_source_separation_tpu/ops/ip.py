"""Iterative-projection (IP) demixing-row update — the BSS hot op #2.

Reference kernel (``bss/iva.py:503-516``; reused by GaussILRMA
``bss/ilrma.py:483-535``, tILRMA, IDLMA ``sss/idlma.py:175-210``, and the
FastMNMF diagonalizer ``bss/mnmf.py:848-888``): for each source ``n``
sequentially (a true data dependency — row ``n``'s update reads the already
updated rows), solve ``(W U_n) w = e_n`` per frequency bin, normalize by
``sqrt(w^H U_n w)``, and keep the old row wherever ``cond(W U_n)`` exceeds a
threshold (the reference's divergence guard, ``bss/iva.py:508-516``).

TPU design: the per-bin C×C solves are batched over the bin axis via one
``jnp.linalg.inv`` (``w_n = (W U_n)^{-1} e_n`` is just column ``n`` of the
inverse, so the inverse doubles as the condition estimate input).  The
reference's ``np.linalg.cond`` is a full SVD per bin per source per
iteration — its most expensive guard; we default to the 1-norm condition
number ``κ₁ = ‖A‖₁ ‖A⁻¹‖₁`` (free given the inverse, same keep-old-row
semantics) and offer exact SVD parity via ``guard='svd'``.
"""

import jax.numpy as jnp

from .fast_linalg import batched_inv


def cond_guard(A, A_inv=None, threshold=1e12, guard="one_norm"):
    """Boolean mask (batched over leading axes): True where ``A`` is
    well-conditioned enough to accept the IP update."""
    if guard == "none":
        return jnp.ones(A.shape[:-2], dtype=bool)
    if guard == "svd":
        s = jnp.linalg.svd(A, compute_uv=False)
        cond = s[..., 0] / s[..., -1]
        return cond < threshold
    if guard == "one_norm":
        if A_inv is None:
            A_inv = batched_inv(A)
        norm = jnp.max(jnp.sum(jnp.abs(A), axis=-2), axis=-1)
        inv_norm = jnp.max(jnp.sum(jnp.abs(A_inv), axis=-2), axis=-1)
        return norm * inv_norm < threshold
    raise ValueError("Unknown guard {!r}".format(guard))


def psd_quadratic_form(U, w):
    """``w^H U w`` for Hermitian PSD ``U (..., C, C)``, ``w (..., C)`` —
    fused quadratic form clamped at 0: the exact value is ≥ 0, so f32
    catastrophic cancellation (extreme source-model weights, e.g. tILRMA at
    ``nu=1``) can only land at rounding noise below zero, and the clamp
    keeps the downstream ``sqrt`` from NaNing (an earlier eigh
    sum-of-non-negative-terms form gave the same guarantee but paid a full
    batched eigendecomposition per source per sweep on this fallback path
    — on the guarded-parity ``guard='svd'`` configs that stacked a second
    iterative kernel on top of the guard's own per-bin SVD).  The
    component-layout dual is ``ip_components.cholesky_quadratic_components``.
    """
    wUw = jnp.einsum("...c,...cd,...d->...", w.conj(), U, w)
    return jnp.maximum(wUw.real, 0.0)


def ip_update(W, U, threshold=1e12, guard="one_norm", denom_floor=None):
    """One full IP sweep over all sources.

    Args:
        W: demixing filters ``(n_bins, n_sources, n_channels)`` (rows are
            ``w_n^H`` as in the reference).
        U: weighted covariances ``(n_sources, n_bins, n_channels, n_channels)``.
        denom_floor: optional floor on ``sqrt(w^H U w)`` (t-family reference
            semantics, ``bss/ilrma.py:981``).
    Returns:
        updated ``W`` (same shape).

    For the cheap guards the sweep runs in component layout
    (:mod:`~audio_source_separation_tpu.ops.ip_components`) — per-bin C×C
    tensors in ``(F, C, C)`` layout pad their trailing dims ~256× on TPU
    tiles, which otherwise dominates the iteration; ``guard='svd'`` keeps the
    matrix-layout path (exact ``np.linalg.cond`` parity).
    """
    n_sources = U.shape[0]
    if guard in ("one_norm", "none") and U.shape[-1] <= 4:
        from .ip_components import ip_update_components

        n_channels = W.shape[-1]
        W_rows = [
            [W[:, s, c] for c in range(n_channels)] for s in range(n_sources)
        ]
        U_comp = [
            [[U[n, :, c, d] for d in range(n_channels)] for c in range(n_channels)]
            for n in range(n_sources)
        ]
        W_rows = ip_update_components(
            W_rows, U_comp, threshold=threshold, guard=guard,
            denom_floor=denom_floor,
        )
        return jnp.stack(
            [jnp.stack(row, axis=-1) for row in W_rows], axis=1
        )
    for n in range(n_sources):
        U_n = U[n]  # (n_bins, C, C)
        WU = W @ U_n  # (n_bins, n_sources, C)
        WU_inv = batched_inv(WU)
        w_n = WU_inv[..., :, n]  # = solve(WU, e_n): (n_bins, C)
        ok = cond_guard(WU, WU_inv, threshold=threshold, guard=guard)
        wUw = psd_quadratic_form(U_n, w_n)
        denominator = jnp.sqrt(wUw)
        if denom_floor is not None:
            denominator = jnp.maximum(denominator, denom_floor)
        w_n_hermite = w_n.conj() / denominator[:, None]
        W = W.at[:, n, :].set(jnp.where(ok[:, None], w_n_hermite, W[:, n, :]))
    return W
