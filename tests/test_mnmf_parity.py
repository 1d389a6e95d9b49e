"""MNMF update-step parity against literal NumPy ports of the reference math
(``bss/mnmf.py``), plus equivalence of the eig-based Riccati construction
with the PSD closed form."""

import numpy as np
import pytest

from audio_source_separation_tpu.algorithm import solve_riccati
from audio_source_separation_tpu.models import (
    FastMultichannelISNMF,
    MultichannelISNMF,
)

EPS = 1e-12


# --------------------------------------------------------------------------- #
# Riccati: reference's general-eig block construction vs the PSD closed form
# --------------------------------------------------------------------------- #
def reference_solve_riccati(A, B):
    """Literal port of ``algorithm/linalg.py:7-31``."""
    M = A.shape[-1]
    O = np.zeros_like(A)
    L = np.block([[O, -A], [-B, O]])
    w, v = np.linalg.eig(L)
    v_t = v.swapaxes(-1, -2)
    order = np.argsort(np.real(w), axis=-1)[..., :M]
    FG = np.take_along_axis(v_t, order[..., None], axis=-2)
    FG = FG.swapaxes(-1, -2)
    F, G = np.split(FG, 2, axis=-2)
    H = G @ np.linalg.inv(F)
    return (H + H.swapaxes(-1, -2).conj()) / 2


def test_riccati_matches_reference_eig_construction(rng):
    for _ in range(3):
        A = rng.randn(4, 3, 3) + 1j * rng.randn(4, 3, 3)
        A = A @ A.swapaxes(-1, -2).conj() + 0.3 * np.eye(3)
        B = rng.randn(4, 3, 3) + 1j * rng.randn(4, 3, 3)
        B = B @ B.swapaxes(-1, -2).conj() + 0.3 * np.eye(3)
        H_ref = reference_solve_riccati(A, B)
        H = np.asarray(solve_riccati(A, B))
        np.testing.assert_allclose(H, H_ref, atol=1e-8)


# --------------------------------------------------------------------------- #
# Sawada MNMF one full update step
# --------------------------------------------------------------------------- #
def reference_sawada_update(Xcov, H, Z, T, V, normalize=True, eps=EPS):
    """Literal port of ``bss/mnmf.py:301-473`` (basis → activation → latent →
    spatial)."""
    n_channels = Xcov.shape[-1]

    def reconstruct(H, Z, T, V):
        HZ = np.sum(H[:, :, None] * Z[None, :, :, None, None], axis=1)  # (F,K,C,C)
        TV = T[:, :, None] * V[None, :, :]
        return np.sum(HZ[:, :, None] * TV[:, :, :, None, None], axis=1)

    def trace_terms(H, Z, T, V):
        X_hat = reconstruct(H, Z, T, V)
        inv = np.linalg.inv(X_hat + eps * np.eye(n_channels))
        XXX = inv @ Xcov @ inv
        num = np.trace(
            XXX[:, None] @ H[:, :, None], axis1=-2, axis2=-1
        ).real  # (F, S, T)
        den = np.trace(
            inv[:, None] @ H[:, :, None], axis1=-2, axis2=-1
        ).real
        return num, den, inv, XXX

    # basis
    num, den, _, _ = trace_terms(H, Z, T, V)
    n1 = np.sum(V[None, None] * num[:, :, None], axis=3)
    n1 = np.sum(Z * n1, axis=1)
    d1 = np.sum(V[None, None] * den[:, :, None], axis=3)
    d1 = np.sum(Z * d1, axis=1)
    d1[d1 < eps] = eps
    T = T * np.sqrt(n1 / d1)

    # activation
    num, den, _, _ = trace_terms(H, Z, T, V)
    n2 = np.sum(T[:, None, :, None] * num[:, :, None], axis=0)
    n2 = np.sum(Z[:, :, None] * n2, axis=0)
    d2 = np.sum(T[:, None, :, None] * den[:, :, None], axis=0)
    d2 = np.sum(Z[:, :, None] * d2, axis=0)
    d2[d2 < eps] = eps
    V = V * np.sqrt(n2 / d2)

    # latent
    num, den, _, _ = trace_terms(H, Z, T, V)
    TV = T[:, :, None] * V[None, :, :]
    n3 = np.sum(TV[:, None] * num[:, :, None], axis=(0, 3))
    d3 = np.sum(TV[:, None] * den[:, :, None], axis=(0, 3))
    d3[d3 < eps] = eps
    Z = Z * np.sqrt(n3 / d3)
    Zsum = Z.sum(axis=0)
    Zsum[Zsum < eps] = eps
    Z = Z / Zsum

    # spatial
    _, _, inv, XXX = trace_terms(H, Z, T, V)
    VX = np.sum(V[None, :, :, None, None] * inv[:, None], axis=2)
    VXXX = np.sum(V[None, :, :, None, None] * XXX[:, None], axis=2)
    ZT = Z[None] * T[:, None]
    A = np.sum(ZT[:, :, :, None, None] * VX[:, None], axis=2)
    ZTVXXX = np.sum(ZT[:, :, :, None, None] * VXXX[:, None], axis=2)
    Bmat = H @ ZTVXXX @ H
    H = reference_solve_riccati(A, Bmat)
    H = H + eps * np.eye(n_channels)
    if normalize:
        H = H / np.trace(H, axis1=2, axis2=3)[..., None, None]
    return H, Z, T, V


def test_sawada_update_matches_reference_math(rng):
    import jax.numpy as jnp

    S, F, Tn, K = 2, 5, 8, 3
    X = (rng.randn(S, F, Tn) + 1j * rng.randn(S, F, Tn)).astype(np.complex128)
    np.random.seed(111)
    solver = MultichannelISNMF(n_basis=K, author="Sawada", recordable_loss=False)
    solver.set_shape_metadata(X)
    kwargs = solver.prepare_state_kwargs(X, {})
    state = solver.init_state(
        jnp.asarray(X), **{k: jnp.asarray(v) for k, v in kwargs.items()}
    )
    # observed covariance (the framework stores compact Hermitian planes)
    xc = X.transpose(1, 2, 0)  # (F, T, C)
    Xcov = xc[..., :, None] * xc[..., None, :].conj()
    H0 = np.asarray(kwargs["spatial"]).transpose(0, 1, 2, 3)  # (F,S,C,C)
    Z0 = np.asarray(kwargs["latent"])
    T0 = np.asarray(kwargs["basis"])
    V0 = np.asarray(kwargs["activation"])

    new_state = solver.update_state(state)
    H_ref, Z_ref, T_ref, V_ref = reference_sawada_update(
        Xcov, H0.copy(), Z0.copy(), T0.copy(), V0.copy()
    )
    np.testing.assert_allclose(np.asarray(new_state["basis"]), T_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(new_state["activation"]), V_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(new_state["latent"]), Z_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(new_state["spatial"]), H_ref, atol=1e-6)


# --------------------------------------------------------------------------- #
# FastMNMF one full update step
# --------------------------------------------------------------------------- #
def reference_fastmnmf_update(X, Q, g, W, H, threshold=1e12, eps=EPS):
    """Literal port of ``bss/mnmf.py:737-888`` + power normalization
    (``:743-771``)."""
    Xb = X.transpose(1, 2, 0)  # (F, T, C)
    n_bins, n_frames, n_channels = Xb.shape

    def x_tilde():
        QX = np.sum(Q[:, None, :, :] * Xb[:, :, None, :], axis=3)
        return np.abs(QX) ** 2

    def model_R(W, H, g):
        Lam = W @ H
        return np.sum(Lam[..., None] * g[:, :, None], axis=0)

    # NMF W
    xt = x_tilde()
    R = model_R(W, H, g)
    R[R < eps] = eps
    xR = xt / R**2
    gxR = np.sum(g[:, :, None] * xR[None], axis=3)
    gR = np.sum(g[:, :, None] / R[None], axis=3)
    num = np.sum(H[:, None] * gxR[:, :, None], axis=3)
    den = np.sum(H[:, None] * gR[:, :, None], axis=3)
    den[den < eps] = eps
    W = W * np.sqrt(num / den)

    # NMF H
    R = model_R(W, H, g)
    R[R < eps] = eps
    xR = xt / R**2
    gxR = np.sum(g[:, :, None] * xR[None], axis=3)
    gR = np.sum(g[:, :, None] / R[None], axis=3)
    num = np.sum(W[:, :, :, None] * gxR[:, :, None], axis=1)
    den = np.sum(W[:, :, :, None] * gR[:, :, None], axis=1)
    den[den < eps] = eps
    H = H * np.sqrt(num / den)

    # SCM g
    Lam = W @ H
    R = model_R(W, H, g)
    R[R < eps] = eps
    xR = x_tilde() / R**2
    A = np.sum(Lam[..., None] * xR[None], axis=2)
    Bv = np.sum(Lam[..., None] / R[None], axis=2)
    Bv[Bv < eps] = eps
    g = g * np.sqrt(A / Bv)

    # diagonalizer
    XX = Xb[:, :, :, None] @ Xb[:, :, None, :].conj()
    Lam = W @ H
    R = np.sum(Lam[..., None] * g[:, :, None], axis=0)
    R[R < eps] = eps
    E = np.tile(np.eye(n_channels), (n_bins, 1, 1))
    for m in range(n_channels):
        q_m_H = Q[:, m, :]
        Vm = (XX / R[:, :, m, None, None]).mean(axis=1)
        QV = Q @ Vm
        cond = np.linalg.cond(QV) < threshold
        q = np.linalg.solve(QV, E[:, m, :][..., None])[..., 0]
        qVq = (q.conj()[:, None, :] @ Vm @ q[:, :, None])[..., 0]
        denom = np.sqrt(qVq)
        denom[np.abs(denom) < eps] = eps
        q_m_H = np.where(cond[:, None], q.conj() / denom, q_m_H)
        Q[:, m, :] = q_m_H

    # power normalization chain
    QQ = (Q * Q.conj()).real
    QQsum = QQ.sum(axis=2).mean(axis=1)
    QQsum[QQsum < eps] = eps
    Q = Q / np.sqrt(QQsum)[:, None, None]
    g = g / QQsum[None, :, None]
    g_sum = g.sum(axis=2)
    g_sum[g_sum < eps] = eps
    g = g / g_sum[:, :, None]
    W = W * g_sum[:, :, None]
    Wsum = W.sum(axis=1)
    Wsum[Wsum < eps] = eps
    W = W / Wsum[:, None]
    H = H * Wsum[:, :, None]
    return Q, g, W, H


def test_fastmnmf_update_matches_reference_math(rng):
    import jax.numpy as jnp

    S, F, Tn, K = 2, 6, 10, 3
    X = (rng.randn(S, F, Tn) + 1j * rng.randn(S, F, Tn)).astype(np.complex128)
    np.random.seed(111)
    solver = FastMultichannelISNMF(n_basis=K, recordable_loss=False, guard="svd")
    solver.set_shape_metadata(X)
    kwargs = solver.prepare_state_kwargs(X, {})
    state = solver.init_state(
        jnp.asarray(X), **{k: jnp.asarray(v) for k, v in kwargs.items()}
    )
    Q0 = np.asarray(kwargs["diagonalizer"])
    g0 = np.asarray(kwargs["spatial_covariance"])
    W0 = np.asarray(kwargs["basis"])
    H0 = np.asarray(kwargs["activation"])

    new_state = solver.update_state(state)
    Q_ref, g_ref, W_ref, H_ref = reference_fastmnmf_update(
        X, Q0.copy(), g0.copy(), W0.copy(), H0.copy()
    )
    np.testing.assert_allclose(np.asarray(new_state["diagonalizer"]), Q_ref, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(new_state["spatial_covariance"]), g_ref, atol=1e-8
    )
    np.testing.assert_allclose(np.asarray(new_state["basis"]), W_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(new_state["activation"]), H_ref, atol=1e-8)


# --------------------------------------------------------------------------- #
# Ozerov EM one full (corrected) update step vs an independent float64 oracle
# --------------------------------------------------------------------------- #
def oracle_ozerov_update(X, A, sigma_b, W, H, normalize=True, eps=EPS):
    """Independent float64 NumPy re-derivation of ONE corrected Ozerov EM
    step, written in plain per-(bin, frame) matrix form (no component planes,
    no adjugate tricks, no collapsed posteriors) — pins the production
    ``_update_ozerov`` math beyond monotonicity.  Statistics follow the
    reference (``/root/reference/src/bss/mnmf.py:307-375``) with the repo's
    documented corrections: H updated from the NEW W (valid coordinate
    minimizer), per-(bin, source) normalization compensation W·λ², floored
    noise diagonal.
    """
    C, F, Tn = X.shape
    S = A.shape[-1]
    K = W.shape[-1]

    sigma_s = np.einsum("sfk,skt->sft", W, H)  # (S, F, T)

    # E step: per-(f, t) dense posteriors
    v = np.zeros((S, F, Tn), dtype=complex)  # A^H Σx⁻¹ x
    M2_diag = np.zeros((S, F, Tn))  # Re diag(A^H Σx⁻¹ A)
    R_xs = np.zeros((F, C, S), dtype=complex)
    R_ss = np.zeros((F, S, S), dtype=complex)
    R_xx = np.zeros((F, C, C), dtype=complex)
    for f in range(F):
        Af = A[f]
        for t in range(Tn):
            x = X[:, f, t]
            Sx = Af @ np.diag(sigma_s[:, f, t]) @ Af.conj().T + np.diag(sigma_b[f])
            Sxi = np.linalg.inv(Sx)
            vft = Af.conj().T @ Sxi @ x  # (S,)
            M2 = Af.conj().T @ Sxi @ Af  # (S, S)
            v[:, f, t] = vft
            M2_diag[:, f, t] = np.diag(M2).real
            s_hat = sigma_s[:, f, t] * vft
            D = np.diag(sigma_s[:, f, t])
            R_ss[f] += np.outer(s_hat, s_hat.conj()) + D - D @ M2 @ D
            R_xs[f] += np.outer(x, s_hat.conj())
            R_xx[f] += np.outer(x, x.conj())
    R_xs /= Tn
    R_ss /= Tn
    R_xx /= Tn
    R_ss = 0.5 * (R_ss + R_ss.conj().swapaxes(-2, -1))

    # M step: mixing matrix, noise diagonal (floored)
    A_new = np.stack([R_xs[f] @ np.linalg.inv(R_ss[f]) for f in range(F)])
    resid = (
        R_xx
        - A_new @ R_xs.conj().swapaxes(-2, -1)
        - R_xs @ A_new.conj().swapaxes(-2, -1)
        + A_new @ R_ss @ A_new.conj().swapaxes(-2, -1)
    )
    sigma_b_new = np.maximum(
        np.diagonal(resid, axis1=-2, axis2=-1).real, eps
    )  # (F, C)

    # NMF M step: W from the component posteriors of the OLD parameters
    # (U/H = W + W²·H·B with B = |v|² − Re diag M2), then H from the NEW W
    B = np.abs(v) ** 2 - M2_diag  # (S, F, T)
    W_new = W + W**2 * (np.einsum("skt,sft->sfk", H, B) / Tn)
    Wf = np.maximum(W_new, eps)
    H_new = H**2 * (np.einsum("sfk,sft->skt", W**2 / Wf, B) / F) + H * np.mean(
        W / Wf, axis=1
    )[:, :, None]

    if normalize:
        scale = np.sqrt(np.sum(np.abs(A_new) ** 2, axis=1, keepdims=True))  # (F,1,S)
        A_new = A_new / scale
        W_new = W_new * np.transpose(scale, (2, 0, 1)) ** 2
        wsum = W_new.sum(axis=1)  # (S, K)
        W_new = W_new / wsum[:, None, :]
        H_new = H_new * wsum[:, :, None]
    return A_new, sigma_b_new, W_new, H_new


def test_ozerov_update_matches_float64_oracle(rng):
    import jax.numpy as jnp
    import warnings

    C, F, Tn, K = 2, 5, 8, 3
    X = (rng.randn(C, F, Tn) + 1j * rng.randn(C, F, Tn)).astype(np.complex128)
    np.random.seed(111)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        solver = MultichannelISNMF(n_basis=K, author="Ozerov", recordable_loss=False)
    solver.set_shape_metadata(X)
    kwargs = solver.prepare_state_kwargs(X, {})
    state = solver.init_state(
        jnp.asarray(X), **{k: jnp.asarray(v) for k, v in kwargs.items()}
    )
    A0 = np.asarray(kwargs["mix_filter"])
    sb0 = np.asarray(kwargs["noise_covariance"])
    W0 = np.asarray(kwargs["basis"])
    H0 = np.asarray(kwargs["activation"])

    new_state = solver.update_state(state)
    A_ref, sb_ref, W_ref, H_ref = oracle_ozerov_update(
        X, A0.copy(), sb0.copy(), W0.copy(), H0.copy(), normalize=solver.normalize
    )
    # the solver works in the per-bin equilibrated frame (W/s, Σ_b/s); the
    # EM step is exactly invariant, so mapping the state back with ·s must
    # reproduce the input-frame oracle — this asserts BOTH the step math
    # and the exactness of the reparametrization
    s = np.asarray(new_state["bin_scale"])
    np.testing.assert_allclose(np.asarray(new_state["mix_filter"]), A_ref, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(new_state["noise_covariance"]) * s[:, None], sb_ref, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(new_state["basis"]) * s[None, :, None], W_ref, atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(new_state["activation"]), H_ref, atol=1e-9)


def test_ozerov_three_channel_update_matches_float64_oracle(rng):
    """Same oracle at C = S = 3 — exercises the 3×3 adjugate/det closed
    forms in the collapsed-posterior path."""
    import jax.numpy as jnp
    import warnings

    C, F, Tn, K = 3, 4, 6, 2
    X = (rng.randn(C, F, Tn) + 1j * rng.randn(C, F, Tn)).astype(np.complex128)
    np.random.seed(111)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        solver = MultichannelISNMF(n_basis=K, author="Ozerov", recordable_loss=False)
    solver.set_shape_metadata(X)
    kwargs = solver.prepare_state_kwargs(X, {})
    state = solver.init_state(
        jnp.asarray(X), **{k: jnp.asarray(v) for k, v in kwargs.items()}
    )
    new_state = solver.update_state(state)
    A_ref, sb_ref, W_ref, H_ref = oracle_ozerov_update(
        X,
        np.asarray(kwargs["mix_filter"]),
        np.asarray(kwargs["noise_covariance"]),
        np.asarray(kwargs["basis"]),
        np.asarray(kwargs["activation"]),
        normalize=solver.normalize,
    )
    np.testing.assert_allclose(np.asarray(new_state["mix_filter"]), A_ref, atol=1e-9)
    s = np.asarray(new_state["bin_scale"])
    np.testing.assert_allclose(
        np.asarray(new_state["noise_covariance"]) * s[:, None], sb_ref, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(new_state["basis"]) * s[None, :, None], W_ref, atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(new_state["activation"]), H_ref, atol=1e-9)
