"""IPSDTA update-step parity against a direct NumPy implementation of the
reference's math (uniform blocks).

The framework's EM statistics were re-derived analytically as closed forms
over ``z = R^{-1} y`` (no rank-6 tensors); these tests implement the
reference's literal formulation — broadcast ``R_basis`` tensors, posterior
``Phi``, trace ratios (``bss/ipsdta.py:365-508`` for EM, ``:510-688`` for MM)
— on tiny shapes and assert the implementations agree.
"""

import numpy as np
import pytest

from audio_source_separation_tpu.models import GaussIPSDTA

EPS = 1e-12


def to_psd_np(X, eps=EPS):
    X = (X + np.swapaxes(X, -2, -1).conj()) / 2
    eigvals = np.linalg.eigvalsh(X)
    delta = np.minimum(eigvals.min(axis=-1), 0)
    trace = np.trace(X, axis1=-2, axis2=-1).real
    eye = np.eye(X.shape[-1])
    return X - delta[..., None, None] * eye + eps * trace[..., None, None] * eye


def reference_em_source_update(Y, U, V, eps=EPS):
    """Literal reference EM (uniform blocks): basis then activation
    (``ipsdta.py:409-432`` and ``:480-508``)."""
    n_sources, n_frames, n_bins = Y.shape[0], Y.shape[2], Y.shape[1] * 0
    S, K, nb, B, _ = U.shape
    T = V.shape[-1]
    n_bins = nb * B
    Yt = Y.transpose(0, 2, 1)  # (S, T, F)
    y = Yt.reshape(S, T, nb, B, 1)

    # ---- basis
    R_basis = U[:, :, None] * V[:, :, :, None, None, None]  # (S,K,T,nb,B,B)
    R = R_basis.sum(axis=1)
    R = to_psd_np(R, eps=eps)
    inv_R = np.linalg.inv(R)
    RR = R_basis @ inv_R[:, None]
    y_hat = RR @ y[:, None]
    R_hat = R_basis @ (np.eye(B) - RR.swapaxes(-2, -1).conj())
    R_hat = to_psd_np(R_hat, eps=eps)
    Phi = y_hat * y_hat.swapaxes(-2, -1).conj() + R_hat
    Phi = to_psd_np(Phi, eps=eps)
    Vf = V.copy()
    Vf[Vf < eps] = eps
    U_new = np.mean(Phi / Vf[:, :, :, None, None, None], axis=2)
    U_new = to_psd_np(U_new, eps=eps)

    # ---- activation (recompute with the new basis, reference order)
    R_basis = U_new[:, :, None] * V[:, :, :, None, None, None]
    R = to_psd_np(R_basis.sum(axis=1), eps=eps)
    inv_R = np.linalg.inv(R)
    RR = R_basis @ inv_R[:, None]
    y_hat = RR @ y[:, None]
    R_hat = to_psd_np(R_basis @ (np.eye(B) - RR.swapaxes(-2, -1).conj()), eps=eps)
    Phi = to_psd_np(y_hat * y_hat.swapaxes(-2, -1).conj() + R_hat, eps=eps)
    inv_U = np.linalg.inv(U_new)
    UPhi = inv_U[:, :, None] @ Phi
    trace = np.trace(UPhi, axis1=-2, axis2=-1).real
    trace[trace < 0] = 0
    V_new = trace.sum(axis=3) / n_bins
    return U_new, V_new


def reference_mm_source_update(Y, U, V, eps=EPS):
    """Literal reference MM (uniform blocks): basis sqrt-chain then
    activation trace ratio (``ipsdta.py:585-623`` and ``:665-688``)."""
    S, K, nb, B, _ = U.shape
    T = V.shape[-1]
    Yt = Y.transpose(0, 2, 1)
    y = Yt.reshape(S, T, nb, B, 1)

    R_basis = U[:, :, None] * V[:, :, :, None, None, None]
    R = to_psd_np(R_basis.sum(axis=1), eps=eps)
    inv_R = to_psd_np(np.linalg.inv(R), eps=eps)
    yy = y @ y.swapaxes(-2, -1).conj() + eps * np.eye(B)
    RyyR = inv_R @ yy @ inv_R
    S_k = np.sum(V[:, :, :, None, None, None] * RyyR[:, None], axis=2)
    T_k = np.sum(V[:, :, :, None, None, None] * inv_R[:, None], axis=2)

    def sqrt_psd(M):
        w, v = np.linalg.eigh(M)
        w[w < 0] = 0
        out = v @ (np.sqrt(w)[..., None] * np.eye(B)) @ np.linalg.inv(v)
        return to_psd_np(out, eps=eps)

    sqrt_S = sqrt_psd(S_k)
    STUTS = to_psd_np(sqrt_S @ U @ T_k @ U @ sqrt_S, eps=eps)
    sqrt_STUTS = sqrt_psd(STUTS)
    inv_sqrt = to_psd_np(np.linalg.inv(sqrt_STUTS), eps=eps)
    U_new = to_psd_np(U @ sqrt_S @ inv_sqrt @ sqrt_S @ U, eps=eps)

    # activation with the new basis
    R_basis = U_new[:, :, None] * V[:, :, :, None, None, None]
    R = to_psd_np(R_basis.sum(axis=1), eps=eps)
    yv = Yt.reshape(S, T, nb, B)
    yy = yv[..., :, None] * yv[..., None, :].conj() + eps * np.eye(B)
    yy = to_psd_np(yy, eps=eps)
    inv_R = to_psd_np(np.linalg.inv(R), eps=eps)
    Ryy = inv_R @ yy
    RU = inv_R[:, None] @ U_new[:, :, None]
    num = np.trace(RU @ Ryy[:, None], axis1=-2, axis2=-1).real.sum(axis=3)
    den = np.trace(RU, axis1=-2, axis2=-1).real.sum(axis=3)
    num[num < 0] = 0
    den[den < eps] = eps
    V_new = V * np.sqrt(num / den)
    return U_new, V_new


def _setup_state(rng, author, S=2, F=8, T=6, K=2, nb=4):
    X = (rng.randn(S, F, T) + 1j * rng.randn(S, F, T)).astype(np.complex128)
    np.random.seed(111)
    solver = GaussIPSDTA(n_basis=K, author=author, n_blocks=nb, recordable_loss=False)
    solver.set_shape_metadata(X)
    kwargs = solver.prepare_state_kwargs(X, {})
    import jax.numpy as jnp

    state = solver.init_state(
        jnp.asarray(X), **{k: jnp.asarray(v) for k, v in kwargs.items()}
    )
    return solver, state, X


def test_em_source_update_matches_reference_math(rng):
    solver, state, X = _setup_state(rng, "Ikeshita")
    layout = solver._layout(X.shape[1])
    U0 = np.asarray(solver._U_kmajor(state))
    V0 = np.asarray(state["activation"])
    Y = np.asarray(state["estimation"])

    new_state = solver._update_source_em(state, layout)
    U_ref, V_ref = reference_em_source_update(Y, U0.copy(), V0.copy())
    U_new = np.asarray(solver._U_kmajor(new_state))
    V_new = np.asarray(new_state["activation"])

    # the closed form skips the intermediate to_PSD projections of Phi (they
    # are no-ops up to the eps·trace ridge), so agreement is to ~eps·trace
    np.testing.assert_allclose(U_new, U_ref, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(V_new, V_ref, atol=1e-6, rtol=1e-6)


def test_mm_source_update_matches_reference_math(rng):
    solver, state, X = _setup_state(rng, "Kondo")
    layout = solver._layout(X.shape[1])
    U0 = np.asarray(solver._U_kmajor(state))
    V0 = np.asarray(state["activation"])
    Y = np.asarray(state["estimation"])

    new_state = solver._update_source_mm(state, layout)
    U_ref, V_ref = reference_mm_source_update(Y, U0.copy(), V0.copy())
    U_new = np.asarray(solver._U_kmajor(new_state))
    V_new = np.asarray(new_state["activation"])

    np.testing.assert_allclose(U_new, U_ref, atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(V_new, V_ref, atol=1e-6, rtol=1e-5)


def reference_vcd_spatial_update(X, W, U, V, eps=EPS):
    """Literal reference VCD (uniform blocks, ``ipsdta.py:922-973``)."""
    S, K, nb, B, _ = U.shape
    n_channels = X.shape[0]
    n_sources = W.shape[1]
    T = X.shape[-1]
    Xb = X.transpose(1, 2, 0)  # (F, T, C)
    W = W.copy().reshape(nb, B, n_sources, n_channels)
    Xr = Xb.reshape(nb, B, T, n_channels)

    XX = Xr[:, :, :, :, None] * Xr[:, :, :, None, :].conj()
    XX = to_psd_np(XX, eps=eps)
    mask = 1 - np.eye(B)
    E = np.tile(np.eye(n_sources, n_channels), (nb, 1, 1))

    for n in range(n_sources):
        e_n = E[:, n, :]
        U_n, V_n = U[n], V[n]
        R_n = np.sum(U_n[:, None] * V_n[:, :, None, None, None], axis=0)  # (T,nb,B,B)
        R_n = to_psd_np(R_n, eps=eps)
        inv_R_n = to_psd_np(np.linalg.inv(R_n), eps=eps)
        inv_R_nt = inv_R_n.transpose(1, 3, 2, 0)  # (nb, B, B', T)
        inv_R_ii = np.diagonal(inv_R_nt, axis1=1, axis2=2).real  # (nb, T, B)
        inv_R_ii = inv_R_ii.transpose(0, 2, 1)  # (nb, B, T)

        for j in range(B):
            w_n = W[:, :, n, :].conj()  # (nb, B', C)
            Xw_n = np.sum(Xr.conj() * w_n[:, :, None, :], axis=3)  # (nb, B', T)

            Q = (inv_R_ii[:, j, :, None, None] * XX[:, j]).mean(axis=1)
            Q = to_psd_np(Q, eps=eps)

            XXw = Xr[:, j, None, :, :] * Xw_n[:, :, :, None]  # (nb, B', T, C)
            RXXw = np.mean(inv_R_nt[:, j, :, :, None] * XXw, axis=2)  # (nb, B', C)
            gamma = np.sum(mask[None, j, :, None] * RXXw, axis=1)  # (nb, C)

            WQ = W[:, j] @ Q
            zeta = np.linalg.solve(WQ, e_n[..., None])[..., 0]
            zeta_hat = np.linalg.solve(Q, gamma[..., None])[..., 0]
            eta = np.einsum("bc,bcd,bd->b", zeta.conj(), Q, zeta).real
            eta_hat = np.einsum("bc,bcd,bd->b", zeta.conj(), Q, zeta_hat)

            eta[np.abs(eta) < eps] = eps
            cond = np.abs(eta_hat) < eps
            eta_hat[cond] = eps
            weight = (eta_hat / (2 * eta)) * (1 - np.sqrt(1 + 4 * eta / np.abs(eta_hat) ** 2))
            weight[cond] = (1 / np.sqrt(eta))[cond]
            w_in = weight[:, None] * zeta - zeta_hat
            W[:, j, n, :] = w_in.conj()

    return W.reshape(nb * B, n_sources, n_channels)


def test_vcd_spatial_update_matches_reference_math(rng):
    solver, state, X = _setup_state(rng, "Kondo")
    layout = solver._layout(X.shape[1])
    W0 = np.asarray(state["demix_filter"])
    U0 = np.asarray(solver._U_kmajor(state))
    V0 = np.asarray(state["activation"])

    new_state = solver._update_spatial_vcd(state, layout)
    W_ref = reference_vcd_spatial_update(X, W0.copy(), U0, V0)
    np.testing.assert_allclose(
        np.asarray(new_state["demix_filter"]), W_ref, atol=1e-8, rtol=1e-6
    )


def reference_fixed_point_spatial_update(X, W_H, U, V, Lam, eps=EPS):
    """Literal reference fixed-point (uniform blocks, ``ipsdta.py:766-816``)."""
    S, K, nb, B, _ = U.shape
    n_channels = X.shape[0]
    n_sources = W_H.shape[1]
    T = X.shape[-1]
    n_bins = nb * B

    R = np.sum(U[:, :, None] * V[:, :, :, None, None, None], axis=1)  # (S,T,nb,B,B)
    R = to_psd_np(R, eps=eps)

    Xt = X.transpose(0, 2, 1)  # (C, T, F)
    Xr = Xt.reshape(n_channels, T, nb, B)
    Xr = Xr.transpose(1, 2, 3, 0).reshape(T, nb, B * n_channels)

    XX = Xr[:, :, :, None] * Xr[:, :, None, :].conj()
    XX = XX.reshape(T, nb, B, n_channels, B, n_channels).transpose(0, 1, 2, 4, 3, 5)

    inv_R = np.linalg.inv(R.conj() + eps * np.eye(B))  # (S,T,nb,B,B)
    G = np.mean(XX[None] * inv_R[:, :, :, :, :, None, None], axis=1)  # (S,nb,B,B,C,C)
    G = G.transpose(0, 1, 2, 4, 3, 5).reshape(S, nb, B * n_channels, B * n_channels)
    G = to_psd_np(G)
    inv_G = np.linalg.inv(G)
    inv_G_H = inv_G.transpose(0, 1, 3, 2).conj()
    inv_G_H = inv_G_H.reshape(S, nb, B, n_channels, B, n_channels).transpose(0, 1, 2, 4, 3, 5)

    A = np.linalg.inv(W_H).transpose(2, 0, 1)  # (S, F, C)
    A = A.reshape(S, nb, B, n_channels)
    Bmat = (A[:, :, :, None, None, :].conj() @ inv_G_H @ A[:, :, None, :, :, None]).squeeze(axis=(4, 5))

    Lam = Lam.reshape(S, nb, B, 1)
    denom = (Bmat.swapaxes(2, 3) @ Lam.conj()).squeeze(axis=3)
    denom[np.abs(denom) < eps] = eps
    Lam_new = 1 / denom  # (S, nb, B)

    inv_G6 = inv_G.reshape(S, nb, B, n_channels, B, n_channels)
    GL = inv_G6 * Lam_new[:, :, None, None, :, None]
    GL = GL.reshape(S, nb, B * n_channels, B * n_channels)
    A_vec = A.reshape(S, nb, B * n_channels, 1)
    W_rows = (GL @ A_vec).squeeze(axis=3).reshape(S, nb * B, n_channels)
    W_new = W_rows.transpose(1, 0, 2).conj()
    return W_new, Lam_new.reshape(S, n_bins)


def test_fixed_point_spatial_update_matches_reference_math(rng):
    solver, state, X = _setup_state(rng, "Ikeshita")
    layout = solver._layout(X.shape[1])
    W0 = np.asarray(state["demix_filter"])
    U0 = np.asarray(solver._U_kmajor(state))
    V0 = np.asarray(state["activation"])
    Lam0 = np.asarray(state["fixed_point"])

    new_state = solver._update_spatial_fixed_point(state, layout)
    W_ref, Lam_ref = reference_fixed_point_spatial_update(X, W0.copy(), U0, V0, Lam0.copy())
    np.testing.assert_allclose(
        np.asarray(new_state["demix_filter"]), W_ref, atol=1e-8, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_state["fixed_point"]), Lam_ref, atol=1e-8, rtol=1e-6
    )
