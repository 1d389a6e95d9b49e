"""Multichannel NMF solver family (full-rank spatial covariance models).

Parity targets (reference ``src/bss/mnmf.py``):
  * ``MultichannelISNMF`` — **Sawada MNMF** (``mnmf.py:115-617``): observed
    covariance ``X = x x^H (n_bins, n_frames, C, C)``; MU updates for basis /
    activation / latent via trace ratios ``tr(X̂⁻¹ X X̂⁻¹ H)/tr(X̂⁻¹ H)``
    (``:377-447``); spatial covariance via the Riccati solve (``:449-473``,
    eigh closed form here) with trace normalization; multichannel Wiener
    separation at the reference mic (``:554-583``).  **Ozerov MNMF**: EM over
    the mixing-matrix model with sufficient statistics R_xx/R_xs/R_ss
    (``:307-375``);
  * ``FastMultichannelISNMF`` — **FastMNMF** (``mnmf.py:637-946``): jointly
    diagonalizable SCMs — diagonalizer ``Q (n_bins, C, C)`` + diagonal gains
    ``g (n_sources, n_bins, C)``; NMF updates in the diagonalized domain
    ``x̃ = |Qx|²`` (``:775-815``); SCM gain MU (``:817-846``); IP-style row
    update for ``Q`` (``:848-888``); power-normalization chain Q→g→W→H
    (``:743-771``); Wiener separation in the Q-domain with ``Q⁻¹``
    back-projection (``:919-946``);
  * ``MultichanneltNMF`` — stub warning, like the reference (``:619-635``).

Documented divergences from the reference's broken paths (its Ozerov mode is
flagged "in progress", ``mnmf.py:149``):
  * Ozerov NLL uses the correct Gaussian likelihood
    ``tr(xx^H Σ_x^{-1}) + log det Σ_x`` — the reference computes
    ``tr(xx^H Σ_x)`` (``mnmf.py:531``);
  * Ozerov separation builds ``Σ_x = A Σ_s A^H + Σ_b`` — the reference
    multiplies ``A Σ_s`` twice (``mnmf.py:607``).

TPU design: every trace/contraction is an einsum (no ``(F,S,T,C,C)``
broadcast materializations); the batched C×C inverses and the PSD Riccati
closed form are MXU-batched over (bin, frame) / (bin, source).
"""

import warnings

import jax.numpy as jnp
import numpy as np

from ..algorithm.linalg import solve_riccati
from ..criterion.divergence import logdet_divergence
from ..ops.ip import cond_guard
from ..ops.fast_linalg import batched_det, batched_inv
from ..runtime.solver import IterativeSolver
from ..utils.flooring import floor_below
from ..utils.linalg import to_psd

EPS = 1e-12
THRESHOLD = 1e12

__metrics__ = ["EUC", "KL", "IS"]
__authors__ = ["sawada", "ozerov"]


class MultichannelNMFBase(IterativeSolver):
    """Shared MNMF protocol (``bss/mnmf.py:25-113``)."""

    def __init__(
        self,
        n_basis=10,
        n_sources=None,
        callbacks=None,
        recordable_loss=True,
        eps=EPS,
    ):
        super().__init__(callbacks=callbacks, recordable_loss=recordable_loss, eps=eps)
        self.n_basis = n_basis
        self.n_sources = n_sources


class MultichannelISNMF(MultichannelNMFBase):
    """Sawada / Ozerov multichannel IS-NMF (``bss/mnmf.py:115-617``)."""

    state_fields = (
        "latent",
        "spatial",
        "basis",
        "activation",
        "mix_filter",
        "noise_covariance",
    )

    def __init__(
        self,
        n_basis=10,
        n_sources=None,
        normalize=True,
        callbacks=None,
        reference_id=0,
        author="Sawada",
        recordable_loss=True,
        eps=EPS,
        **kwargs,
    ):
        super().__init__(
            n_basis=n_basis,
            n_sources=n_sources,
            callbacks=callbacks,
            recordable_loss=recordable_loss,
            eps=eps,
        )
        self.normalize = normalize
        assert author.lower() in __authors__, "Choose from {}".format(__authors__)
        self.author = author
        if author.lower() == "sawada":
            allowed = {"reference_id"}
            if set(kwargs) - allowed:
                raise ValueError("Invalid keywords.")
            self.reference_id = kwargs.get("reference_id", reference_id)
        else:
            self.reference_id = reference_id
            warnings.warn("in progress", UserWarning)

    def field_axes(self):
        """Shardable axes (see :meth:`IterativeSolver.use_mesh`): everything
        in MNMF is per-bin batched; activations shard over frames."""
        common = {"input": {"bins": 1, "frames": 2}}
        if self.author.lower() == "sawada":
            return dict(
                common,
                covariance_input={"bins": 0, "frames": 1},
                spatial={"bins": 0},
                basis={"bins": 0},
                activation={"frames": -1},
            )
        return dict(
            common,
            mix_filter={"bins": 0},
            noise_covariance={"bins": 0},
            basis={"bins": 1},
            activation={"frames": -1},
        )

    # ------------------------------------------------------------------ #
    # init
    # ------------------------------------------------------------------ #
    def prepare_state_kwargs(self, input, state_kwargs):
        n_channels, n_bins, n_frames = input.shape
        n_sources = self.n_sources or n_channels
        n_basis, eps = self.n_basis, self.eps
        if self.author.lower() == "sawada":
            if "latent" not in state_kwargs:
                Z = np.random.rand(n_sources, n_basis) * 1e-2 + 1 / n_sources
                Zsum = np.maximum(Z.sum(axis=0), eps)
                state_kwargs["latent"] = Z / Zsum
            if "spatial" not in state_kwargs:
                state_kwargs["spatial"] = np.tile(
                    np.eye(n_channels, dtype=input.dtype), (n_bins, n_sources, 1, 1)
                )
            if "basis" not in state_kwargs:
                state_kwargs["basis"] = np.random.rand(n_bins, n_basis)
            if "activation" not in state_kwargs:
                state_kwargs["activation"] = np.random.rand(n_basis, n_frames)
        else:
            if "mix_filter" not in state_kwargs:
                state_kwargs["mix_filter"] = np.random.randn(
                    n_bins, n_channels, n_sources
                ) + 1j * np.random.randn(n_bins, n_channels, n_sources)
            if "basis" not in state_kwargs:
                state_kwargs["basis"] = np.random.rand(n_sources, n_bins, n_basis)
            if "activation" not in state_kwargs:
                state_kwargs["activation"] = np.random.rand(
                    n_sources, n_basis, n_frames
                )
            if "noise_covariance" not in state_kwargs:
                P = np.mean(np.sum(np.abs(input) ** 2, axis=0), axis=1)  # (n_bins,)
                state_kwargs["noise_covariance"] = 1e-2 * (
                    P[:, None] + np.random.rand(n_bins, n_channels)
                )
        return state_kwargs

    def init_state(self, X, **kwargs):
        n_channels = X.shape[0]
        self.n_channels = n_channels
        if self.n_sources is None:
            self.n_sources = n_channels
        state = {"input": X}
        state.update(kwargs)
        if self.author.lower() == "sawada":
            # observed covariance tensor (``mnmf.py:216-217``)
            xc = jnp.transpose(X, (1, 2, 0))  # (F, T, C)
            state["covariance_input"] = xc[..., :, None] * xc[..., None, :].conj()
        return state

    # ------------------------------------------------------------------ #
    # Sawada machinery
    # ------------------------------------------------------------------ #
    def _ztv(self, state):
        Z, T, V = state["latent"], state["basis"], state["activation"]
        return jnp.einsum("sk,fk,kt->sft", Z, T, V)  # (S, F, T)

    def reconstruct_covariance(self, state):
        H = state["spatial"]  # (F, S, C, C)
        ZTV = self._ztv(state).astype(H.dtype)
        return jnp.einsum("fscd,sft->ftcd", H, ZTV)  # (F, T, C, C)

    def _inv_xhat(self, state):
        n_channels = self.n_channels
        X_hat = self.reconstruct_covariance(state)
        eye = jnp.eye(n_channels, dtype=X_hat.dtype)
        # closed-form adjugate inverse (C <= 3): TPU's batched LU kernel can
        # fault on hard (F, T, C, C) batches (observed on hardware)
        return batched_inv(X_hat + self.eps * eye)

    def _trace_terms(self, state):
        """``tr(X̂⁻¹XX̂⁻¹ H)`` and ``tr(X̂⁻¹ H)`` per (bin, source, frame)."""
        X = state["covariance_input"]
        H = state["spatial"]
        inv_X_hat = self._inv_xhat(state)
        XXX = inv_X_hat @ X @ inv_X_hat
        num = jnp.einsum("ftcd,fsdc->fst", XXX, H).real
        den = jnp.einsum("ftcd,fsdc->fst", inv_X_hat, H).real
        return num, den

    def _update_sawada(self, state):
        eps = self.eps
        Z, T, V = state["latent"], state["basis"], state["activation"]

        # basis (``mnmf.py:377-398``)
        tn, td = self._trace_terms(state)
        num = jnp.einsum("sk,kt,fst->fk", Z, V, tn)
        den = floor_below(jnp.einsum("sk,kt,fst->fk", Z, V, td), eps)
        T = T * jnp.sqrt(num / den)
        state = dict(state, basis=T)

        # activation (``mnmf.py:400-421``)
        tn, td = self._trace_terms(state)
        num = jnp.einsum("sk,fk,fst->kt", Z, T, tn)
        den = floor_below(jnp.einsum("sk,fk,fst->kt", Z, T, td), eps)
        V = V * jnp.sqrt(num / den)
        state = dict(state, activation=V)

        # latent (``mnmf.py:423-447``)
        tn, td = self._trace_terms(state)
        num = jnp.einsum("fk,kt,fst->sk", T, V, tn)
        den = floor_below(jnp.einsum("fk,kt,fst->sk", T, V, td), eps)
        Z = Z * jnp.sqrt(num / den)
        Z = Z / floor_below(Z.sum(axis=0), eps)
        state = dict(state, latent=Z)

        # spatial via Riccati (``mnmf.py:449-473``)
        H = state["spatial"]
        X = state["covariance_input"]
        inv_X_hat = self._inv_xhat(state)
        XXX = inv_X_hat @ X @ inv_X_hat
        ZTV = self._ztv(state).astype(H.dtype)
        A = jnp.einsum("sft,ftcd->fscd", ZTV, inv_X_hat)
        ZTVXXX = jnp.einsum("sft,ftcd->fscd", ZTV, XXX)
        B = H @ ZTVXXX @ H
        H = solve_riccati(A, B)
        H = H + eps * jnp.eye(self.n_channels, dtype=H.dtype)
        if self.normalize:
            H = H / jnp.trace(H, axis1=-2, axis2=-1)[..., None, None]
        return dict(state, spatial=H)

    def _nll_sawada(self, state):
        n_channels = self.n_channels
        eps = self.eps
        X = state["covariance_input"]
        X_hat = self.reconstruct_covariance(state)
        eye = jnp.eye(n_channels, dtype=X_hat.dtype)
        X, X_hat = to_psd(X, eps=eps) + eps * eye, to_psd(X_hat, eps=eps) + eps * eye
        return logdet_divergence(X_hat, X, eps=eps).sum()

    def _separate_sawada(self, state):
        """Multichannel Wiener filter at the reference mic (``mnmf.py:554-583``)."""
        X = state["input"]
        H = state["spatial"]  # (F, S, C, C)
        inv_X_hat = self._inv_xhat(state)
        xc = jnp.transpose(X, (1, 2, 0))  # (F, T, C)
        v = jnp.einsum("ftcd,ftd->ftc", inv_X_hat, xc)  # X̂⁻¹ x
        # row `reference_id` of H[f,s] @ v[f,t]
        Href = H[:, :, self.reference_id, :]  # (F, S, C)
        HXx = jnp.einsum("fsd,ftd->sft", Href, v)
        ZTV = self._ztv(state).astype(HXx.dtype)
        return ZTV * HXx

    # ------------------------------------------------------------------ #
    # Ozerov machinery (EM)
    # ------------------------------------------------------------------ #
    def _sigma_x(self, state):
        A = state["mix_filter"]  # (F, C, S)
        sigma_b = state["noise_covariance"]  # (F, C)
        W, H = state["basis"], state["activation"]
        n_channels = self.n_channels
        sigma_s = jnp.transpose((W @ H), (1, 2, 0))  # (F, T, S)
        A_h = jnp.swapaxes(A, -2, -1).conj()
        AsA = jnp.einsum(
            "fcs,fts,fsd->ftcd", A, sigma_s.astype(A.dtype), A_h
        )
        Sigma_b = sigma_b[:, :, None] * jnp.eye(n_channels, dtype=A.dtype)
        Sigma_x = AsA + Sigma_b[:, None]
        return (Sigma_x + jnp.swapaxes(Sigma_x, -2, -1).conj()) / 2, sigma_s

    def _update_ozerov(self, state):
        n_basis = self.n_basis
        n_sources, n_channels = self.n_sources, self.n_channels
        X = state["input"]
        A = state["mix_filter"]
        W, H = state["basis"], state["activation"]
        n_frames = X.shape[-1]

        xc = jnp.transpose(X, (1, 2, 0))  # (F, T, C)
        A_h = jnp.swapaxes(A, -2, -1).conj()  # (F, S, C)

        Sigma_x, sigma_s = self._sigma_x(state)
        inv_Sigma_x = batched_inv(Sigma_x)  # (F, T, C, C)

        # per-(source,basis) component variances sigma_c (F, T, S, K)
        WH = W[:, :, :, None] * H[:, None, :, :]  # (S, F, K, T)
        sigma_c = jnp.transpose(WH, (1, 3, 0, 2))  # (F, T, S, K)

        AhS = jnp.einsum("fsc,ftcd->ftsd", A_h, inv_Sigma_x)  # A^H Σx⁻¹
        G_s = sigma_s[..., None].astype(A.dtype) * AhS  # (F, T, S, C)
        s = jnp.einsum("ftsc,ftc->fts", G_s, xc)  # posterior source means

        R_xx = jnp.mean(xc[..., :, None] * xc[..., None, :].conj(), axis=1)
        R_xs = jnp.mean(xc[..., :, None] * s[..., None, :].conj(), axis=1)

        G_s_A = jnp.einsum("ftsc,fcr->ftsr", G_s, A)  # (F, T, S, S)
        I_GsA = jnp.eye(n_sources, dtype=A.dtype) - G_s_A
        R_ss = jnp.mean(
            s[..., :, None] * s[..., None, :].conj()
            + I_GsA * sigma_s[:, :, None, :].astype(A.dtype),
            axis=1,
        )
        R_ss = (R_ss + jnp.swapaxes(R_ss, -2, -1).conj()) / 2

        # component posteriors: only diagonals are needed
        # c_i = σ_c,i (a_i^H Σx⁻¹ x);  U_i = |c_i|² + (1 − σ_c,i a_i^H Σx⁻¹ a_i) σ_c,i
        aSx = jnp.einsum("ftsd,ftd->fts", AhS, xc)  # a_s^H Σx⁻¹ x (F, T, S)
        aSa = jnp.einsum("ftsd,fds->fts", AhS, A)  # a_s^H Σx⁻¹ a_s
        sigma_cA = sigma_c.astype(A.dtype)
        c = sigma_cA * aSx[:, :, :, None]  # (F, T, S, K)
        U = (jnp.abs(c) ** 2 + (1 - sigma_cA * aSa[:, :, :, None]).real * sigma_c).real
        U = jnp.transpose(U, (2, 0, 3, 1))  # (S, F, K, T)

        # M step (``mnmf.py:357-375``)
        A_new = jnp.swapaxes(
            jnp.linalg.solve(
                jnp.swapaxes(R_ss, -2, -1).conj(), jnp.swapaxes(R_xs, -2, -1).conj()
            ),
            -2,
            -1,
        ).conj()  # R_xs R_ss⁻¹
        A_newh = jnp.swapaxes(A_new, -2, -1).conj()
        R_xs_h = jnp.swapaxes(R_xs, -2, -1).conj()
        sigma_b = jnp.diagonal(
            R_xx - A_new @ R_xs_h - R_xs @ A_newh + A_new @ R_ss @ A_newh,
            axis1=-2,
            axis2=-1,
        ).real
        W_new = jnp.mean(U / H[:, None, :, :], axis=3)
        H_new = jnp.mean(U / W[:, :, :, None], axis=1)

        if self.normalize:
            scale = jnp.sqrt(jnp.sum(jnp.abs(A_new) ** 2, axis=1, keepdims=True))
            A_new = A_new / scale.astype(A_new.dtype)
            W_new = W_new / jnp.transpose(scale, (2, 0, 1))
            wsum = W_new.sum(axis=1)
            W_new = W_new / wsum[:, None, :]
            H_new = H_new * wsum[:, :, None]

        return dict(
            state,
            mix_filter=A_new,
            noise_covariance=sigma_b,
            basis=W_new,
            activation=H_new,
        )

    def _nll_ozerov(self, state):
        """Correct Gaussian NLL ``x^H Σx⁻¹ x + log det Σx`` (the reference
        computes ``tr(xx^H Σx)``, ``mnmf.py:531`` — documented divergence)."""
        X = state["input"]
        xc = jnp.transpose(X, (1, 2, 0))
        Sigma_x, _ = self._sigma_x(state)
        solve_x = jnp.einsum("ftcd,ftd->ftc", batched_inv(Sigma_x), xc)
        quad = jnp.einsum("ftc,ftc->ft", xc.conj(), solve_x).real
        logdet = jnp.log(jnp.abs(batched_det(Sigma_x)))
        return (quad + logdet).sum()

    def _separate_ozerov(self, state):
        """Posterior mean of the sources (``mnmf.py:585-617``; the reference's
        duplicated ``A_sigma_s`` factor at ``:607`` is fixed here)."""
        X = state["input"]
        A = state["mix_filter"]
        xc = jnp.transpose(X, (1, 2, 0))
        A_h = jnp.swapaxes(A, -2, -1).conj()
        Sigma_x, sigma_s = self._sigma_x(state)
        inv_Sigma_x = batched_inv(Sigma_x)
        AhS = jnp.einsum("fsc,ftcd->ftsd", A_h, inv_Sigma_x)
        G_s = sigma_s[..., None].astype(A.dtype) * AhS
        s = jnp.einsum("ftsc,ftc->fts", G_s, xc)
        return jnp.transpose(s, (2, 0, 1))

    # ------------------------------------------------------------------ #
    def update_state(self, state):
        if self.author.lower() == "sawada":
            return self._update_sawada(state)
        return self._update_ozerov(state)

    def nll(self, state):
        if self.author.lower() == "sawada":
            return self._nll_sawada(state)
        return self._nll_ozerov(state)

    def finalize(self, state):
        if self.author.lower() == "sawada":
            return self._separate_sawada(state)
        return self._separate_ozerov(state)

    def __repr__(self):
        return "IS-MNMF(n_basis={}, normalize={}, author={})".format(
            self.n_basis, self.normalize, self.author
        )


class MultichanneltNMF(MultichannelNMFBase):
    """Stub with warning, as in the reference (``bss/mnmf.py:619-635``)."""

    def __init__(self, n_basis=10, n_sources=None, reference_id=0, **kwargs):
        warnings.warn("in progress", UserWarning)
        super().__init__(n_basis=n_basis, n_sources=n_sources, **kwargs)
        self.reference_id = reference_id

    def nll(self, state):
        raise NotImplementedError(
            "Implement 'compute_negative_loglikelihood' method."
        )


class FastMultichannelISNMF(MultichannelNMFBase):
    """FastMNMF with jointly-diagonalizable SCMs (``bss/mnmf.py:637-946``)."""

    state_fields = (
        "diagonalizer",
        "spatial_covariance",
        "basis",
        "activation",
        "latent",
    )
    callback_on_init = False  # callbacks fire after iterations only
    # (``mnmf.py:713-716``)

    def __init__(
        self,
        n_basis=10,
        n_sources=None,
        partitioning=False,
        normalize="power",
        reference_id=0,
        callbacks=None,
        recordable_loss=True,
        eps=EPS,
        threshold=THRESHOLD,
        guard="one_norm",
    ):
        super().__init__(
            n_basis=n_basis,
            n_sources=n_sources,
            callbacks=callbacks,
            recordable_loss=recordable_loss,
            eps=eps,
        )
        if partitioning:
            raise ValueError("Not support partitioning function.")
        self.partitioning = partitioning
        self.normalize = normalize
        self.reference_id = reference_id
        self.threshold = threshold
        self.guard = guard

    def field_axes(self):
        """Shardable axes of the FastMNMF state (see
        :meth:`IterativeSolver.use_mesh`) — everything is per-bin except the
        activations (shared over bins, shardable over frames)."""
        return {
            "input": {"bins": 1, "frames": 2},
            "diagonalizer": {"bins": 0},
            "spatial_covariance": {"bins": 1},
            "basis": {"bins": 1},
            "activation": {"frames": -1},
            "pair_products": {"bins": 1, "frames": 2},
            "qx_power": {"bins": 1, "frames": 2},
        }

    def prepare_state_kwargs(self, input, state_kwargs):
        n_channels, n_bins, n_frames = input.shape
        n_sources = self.n_sources or n_channels
        n_basis = self.n_basis
        if "diagonalizer" not in state_kwargs:
            state_kwargs["diagonalizer"] = np.tile(
                np.eye(n_channels, dtype=input.dtype), (n_bins, 1, 1)
            )
        if "spatial_covariance" not in state_kwargs:
            G = np.ones((n_sources, n_bins, n_channels)) * 1e-2
            for m in range(n_channels):
                G[m % n_sources, :, m] = 1
            state_kwargs["spatial_covariance"] = G
        if "basis" not in state_kwargs:
            state_kwargs["basis"] = np.random.rand(n_sources, n_bins, n_basis)
        if "activation" not in state_kwargs:
            state_kwargs["activation"] = np.random.rand(n_sources, n_basis, n_frames)
        return state_kwargs

    def init_state(self, X, **kwargs):
        n_channels = X.shape[0]
        self.n_channels = n_channels
        if self.n_sources is None:
            self.n_sources = n_channels
        state = {"input": X}
        state.update(kwargs)
        if self.guard != "svd":
            from ..ops.ip_components import pair_products_planes

            state["pair_products"] = pair_products_planes(X)
        state["qx_power"] = self._compute_qx_power(state)
        return state

    # ------------------------------------------------------------------ #
    # Internal layout note: the per-(bin, frame, channel) power tensors are
    # kept CHANNEL-LEADING ``(C, F, T)`` — TPU tiles pad a trailing C=2 to 128
    # lanes (~64x memory waste), which otherwise dominates the NMF/SCM sweeps.
    # ------------------------------------------------------------------ #
    def _qx_power(self, state):
        """``x̃[m] = |Σ_c Q[f,m,c] x_c|² → (n_channels, n_bins, n_frames)``
        (``mnmf.py:782-783``, channel-leading layout).

        ``x̃`` only changes when ``Q`` does (diagonalizer update +
        normalization), so it is carried through the state and recomputed
        once per iteration instead of once per consumer (NMF sweep, SCM
        sweep, NLL)."""
        cached = state.get("qx_power")
        if cached is not None:
            return cached
        return self._compute_qx_power(state)

    @staticmethod
    def _compute_qx_power(state):
        X = state["input"]  # (C, F, T)
        Q = state["diagonalizer"]  # (F, M, C)
        n_channels = X.shape[0]
        rows = []
        for m in range(n_channels):
            acc = Q[:, m, 0][:, None] * X[0]
            for c in range(1, n_channels):
                acc = acc + Q[:, m, c][:, None] * X[c]
            rows.append(jnp.abs(acc) ** 2)
        return jnp.stack(rows)  # (M, F, T)

    def _model_power(self, state):
        """``R[m] = Σ_s (WH)_s g[s,:,m] → (n_channels, n_bins, n_frames)``."""
        W, H = state["basis"], state["activation"]
        g = state["spatial_covariance"]  # (S, F, M)
        Lam = W @ H  # (S, F, T)
        return jnp.einsum("sft,sfm->mft", Lam, g)

    def _update_nmf(self, state):
        eps = self.eps
        g = state["spatial_covariance"]
        W, H = state["basis"], state["activation"]
        x_tilde = self._qx_power(state)  # (M, F, T)

        # W update (``mnmf.py:789-800``)
        R = floor_below(self._model_power(state), eps)
        xR = x_tilde / R**2
        gxR = jnp.einsum("sfm,mft->sft", g, xR)
        gR = jnp.einsum("sfm,mft->sft", g, 1 / R)
        num = jnp.einsum("skt,sft->sfk", H, gxR)
        den = floor_below(jnp.einsum("skt,sft->sfk", H, gR), eps)
        W = W * jnp.sqrt(num / den)
        state = dict(state, basis=W)

        # H update (``mnmf.py:802-813``)
        R = floor_below(self._model_power(state), eps)
        xR = x_tilde / R**2
        gxR = jnp.einsum("sfm,mft->sft", g, xR)
        gR = jnp.einsum("sfm,mft->sft", g, 1 / R)
        num = jnp.einsum("sfk,sft->skt", W, gxR)
        den = floor_below(jnp.einsum("sfk,sft->skt", W, gR), eps)
        H = H * jnp.sqrt(num / den)
        return dict(state, activation=H)

    def _update_scm(self, state):
        eps = self.eps
        g = state["spatial_covariance"]
        W, H = state["basis"], state["activation"]
        Lam = W @ H  # (S, F, T)
        R = floor_below(self._model_power(state), eps)
        x_tilde = self._qx_power(state)
        xR = x_tilde / R**2
        A = jnp.einsum("sft,mft->sfm", Lam, xR)
        B = floor_below(jnp.einsum("sft,mft->sfm", Lam, 1 / R), eps)
        g = g * jnp.sqrt(A / B)
        return dict(state, spatial_covariance=g)

    def _update_diagonalizer(self, state):
        """IP-style row update for Q (``mnmf.py:848-888``) — the AuxIVA-IP
        kernel per channel; component layout for cheap guards."""
        eps, threshold = self.eps, self.threshold
        X = state["input"]  # (C, F, T)
        Q = state["diagonalizer"]
        n_channels = Q.shape[-1]
        n_frames = X.shape[-1]
        R = floor_below(self._model_power(state), eps)  # (M, F, T)

        planes = state.get("pair_products")
        if planes is not None and self.guard in ("one_norm", "none") and n_channels <= 4:
            from ..ops.ip_components import (
                det_components,
                solve_column_components,
                weighted_covariance_components,
            )

            Q_rows = [
                [Q[:, i, c] for c in range(n_channels)] for i in range(n_channels)
            ]
            # R is fixed for the whole Q sweep (``mnmf.py:848-852`` computes it
            # once), so ALL per-channel weighted covariances batch into ONE
            # planes GEMM (M as the "sources" axis) instead of M sequential
            # contractions — the VERDICT r1 FastMNMF bottleneck.
            U_all = weighted_covariance_components(planes, 1.0 / R)
            for m in range(n_channels):
                U = U_all[m]
                QV = [
                    [
                        sum(Q_rows[i][c] * U[c][j] for c in range(n_channels))
                        for j in range(n_channels)
                    ]
                    for i in range(n_channels)
                ]
                det = det_components(QV, n_channels)
                q_m = solve_column_components(QV, n_channels, m, det=det)
                if self.guard == "none":
                    ok = None
                else:
                    inv_cols = [
                        solve_column_components(QV, n_channels, j, det=det)
                        for j in range(n_channels)
                    ]
                    norm = jnp.stack(
                        [
                            sum(jnp.abs(QV[i][j]) for i in range(n_channels))
                            for j in range(n_channels)
                        ]
                    ).max(axis=0)
                    inv_norm = jnp.stack(
                        [
                            sum(jnp.abs(inv_cols[j][i]) for i in range(n_channels))
                            for j in range(n_channels)
                        ]
                    ).max(axis=0)
                    ok = norm * inv_norm < threshold
                Uq = [
                    sum(U[c][d] * q_m[d] for d in range(n_channels))
                    for c in range(n_channels)
                ]
                qVq = sum((q_m[c].conj() * Uq[c]).real for c in range(n_channels))
                denominator = floor_below(jnp.sqrt(qVq), eps)
                for c in range(n_channels):
                    new_c = q_m[c].conj() / denominator
                    if ok is not None:
                        new_c = jnp.where(ok, new_c, Q_rows[m][c])
                    Q_rows[m][c] = new_c
            Q = jnp.stack(
                [jnp.stack(row, axis=-1) for row in Q_rows], axis=1
            )
            return dict(state, diagonalizer=Q)

        Xb = jnp.transpose(X, (1, 2, 0))  # (F, T, C)
        # one batched contraction for all channels' covariances (R is fixed
        # for the whole sweep)
        inv_R = (1.0 / R).astype(X.real.dtype)  # (M, F, T)
        V_all = (
            jnp.einsum("mft,ftc,ftd->mfcd", inv_R, Xb, Xb.conj()) / n_frames
        )
        for m in range(n_channels):
            V = V_all[m]
            QV = Q @ V
            QV_inv = jnp.linalg.inv(QV)
            ok = cond_guard(QV, QV_inv, threshold=threshold, guard=self.guard)
            q_m = QV_inv[..., :, m]
            qVq = jnp.einsum("fc,fcd,fd->f", q_m.conj(), V, q_m)
            denominator = floor_below(jnp.sqrt(qVq).real, eps)
            q_m_hermite = q_m.conj() / denominator[:, None]
            Q = Q.at[:, m, :].set(jnp.where(ok[:, None], q_m_hermite, Q[:, m, :]))
        return dict(state, diagonalizer=Q)

    def _normalize_state(self, state):
        if not self.normalize:
            return state
        if self.normalize != "power":
            raise ValueError(
                "Not support normalization based on {}. Choose 'power'".format(
                    self.normalize
                )
            )
        eps = self.eps
        Q = state["diagonalizer"]
        g = state["spatial_covariance"]
        W, H = state["basis"], state["activation"]

        QQ = (Q * Q.conj()).real
        QQsum = floor_below(QQ.sum(axis=2).mean(axis=1), eps)  # (F,)
        Q = Q / jnp.sqrt(QQsum)[:, None, None].astype(Q.dtype)
        g = g / QQsum[None, :, None]

        g_sum = floor_below(g.sum(axis=2), eps)
        g = g / g_sum[:, :, None]
        W = W * g_sum[:, :, None]

        Wsum = floor_below(W.sum(axis=1), eps)
        W = W / Wsum[:, None]
        H = H * Wsum[:, :, None]

        return dict(
            state, diagonalizer=Q, spatial_covariance=g, basis=W, activation=H
        )

    def update_state(self, state):
        state = self._update_nmf(state)
        state = self._update_scm(state)
        state = self._update_diagonalizer(state)
        state = self._normalize_state(state)
        # refresh the carried |Qx|² once, after all Q changes this iteration
        return dict(state, qx_power=self._compute_qx_power(state))

    def nll(self, state):
        """``Σ (x̃/ỹ + log ỹ) − T Σ log|det QQ^H|`` (``mnmf.py:890-917``)."""
        eps = self.eps
        n_frames = state["input"].shape[-1]
        Q = state["diagonalizer"]
        x_tilde = self._qx_power(state) + eps
        y_tilde = self._model_power(state) + eps
        detQQ = jnp.abs(batched_det(Q @ jnp.swapaxes(Q, -2, -1)))
        return jnp.sum(x_tilde / y_tilde + jnp.log(y_tilde)) - n_frames * jnp.sum(
            jnp.log(detQQ)
        )

    def finalize(self, state):
        """Wiener mask in the Q-domain + Q⁻¹ back-projection at the reference
        mic (``mnmf.py:919-946``), channel-leading layout."""
        eps = self.eps
        X = state["input"]  # (C, F, T)
        Q = state["diagonalizer"]
        g = state["spatial_covariance"]
        W, H = state["basis"], state["activation"]
        n_channels = X.shape[0]
        n_sources = g.shape[0]
        Lam = W @ H  # (S, F, T)

        # LambdaG[s, m] = Lam[s]·g[s, :, m]  and  ỹ[m] = Σ_s LambdaG[s, m]
        LambdaG = Lam[:, None] * jnp.transpose(g, (0, 2, 1))[:, :, :, None]
        # (S, M, F, T)
        y_tilde = floor_below(LambdaG.sum(axis=0), eps)  # (M, F, T)

        # QX[m] via components, Q⁻¹ row at the reference mic via closed form
        QX = []
        for m in range(n_channels):
            acc = Q[:, m, 0][:, None] * X[0]
            for c in range(1, n_channels):
                acc = acc + Q[:, m, c][:, None] * X[c]
            QX.append(acc)
        Q_inv = batched_inv(Q)  # (F, C, M), tiny
        q_ref = [Q_inv[:, self.reference_id, m] for m in range(n_channels)]

        mask = (LambdaG / y_tilde).astype(X.dtype)  # (S, M, F, T)
        outputs = []
        for s in range(n_sources):
            acc = q_ref[0][:, None] * (QX[0] * mask[s, 0])
            for m in range(1, n_channels):
                acc = acc + q_ref[m][:, None] * (QX[m] * mask[s, m])
            outputs.append(acc)
        return jnp.stack(outputs)  # (S, F, T)

    def __repr__(self):
        return "FastMNMF(n_basis={}, partitioning={}, normalize={})".format(
            self.n_basis, self.partitioning, self.normalize
        )
