"""Independent low-rank matrix analysis (ILRMA) solver family.

Parity targets (reference ``src/bss/ilrma.py``):
  * ``GaussILRMA`` — IVA + per-source NMF variance model ``R = (TV)^{2/d}``
    with the fractional ``domain`` parameter; spatial algorithms IP
    (``ilrma.py:483-535``), ISS (``ilrma.py:537-564``), IP2/pairwise
    (``ilrma.py:566-633``); optional shared-basis **partitioning** latent
    ``Z (n_sources, n_basis)`` (``ilrma.py:368-408``); per-iteration
    normalization ``'power'`` (``ilrma.py:304-322``) or
    ``'projection-back'`` (``ilrma.py:323-332``);
  * ``tILRMA`` — Student-t source model (harmonic MU, ``ilrma.py:922-936``)
    with posterior-weighted spatial covariance ``Xi = (νR + 2P)/(ν+2)``
    (``ilrma.py:961-989``), IP only;
  * ``ConsistentGaussILRMA`` — spectrogram-consistency ILRMA: every iteration
    starts with an ``istft → stft`` projection and folds projection-back into
    the update (``ilrma.py:1205-1233``);
  * ``GGDILRMA`` / ``KLILRMA`` / ``RegularizedILRMA`` — stubs raising like the
    reference (``ilrma.py:699, 1033, 1100``).

TPU design: identical runtime to the IVA family (scan over a state pytree with
real-pair jit boundaries); the NMF sweeps are batched ``(S, F, K) × (S, K, T)``
MXU matmuls; the spatial kernels are shared with
:mod:`audio_source_separation_tpu.models.iva` via
:mod:`audio_source_separation_tpu.ops`.  The ISS self-steering coefficient
uses the NLL-consistent ``1 − √(T/D)`` scaling (see ``ops/iss.py``; the
reference's ILRMA-ISS is flagged "in progress").
"""

import warnings

import jax.numpy as jnp
import numpy as np

from ..algorithm.projection_back import projection_back
from ..ops.eig2 import generalized_eig2x2_descending
from ..ops.fast_linalg import batched_log_abs_det
from ..ops.ip import cond_guard
from ..ops.iss import iss_sweep
from ..utils.flooring import floor_below
from .iva import IVABase

EPS = 1e-12
THRESHOLD = 1e12

__algorithms_spatial__ = ["IP", "IVA", "ISS", "IPA", "pairwise", "IP1", "IP2"]


class ILRMABase(IVABase):
    """Shared ILRMA machinery (``bss/ilrma.py:22-176``)."""

    use_pair_products = True
    state_fields = (
        "demix_filter",
        "estimation",
        "basis",
        "activation",
        "latent",
        "step_count",
    )

    def __init__(
        self,
        n_basis=10,
        partitioning=False,
        normalize=True,
        algorithm_spatial="IP",
        callbacks=None,
        recordable_loss=True,
        eps=EPS,
    ):
        super().__init__(callbacks=callbacks, recordable_loss=recordable_loss, eps=eps)
        self.n_basis = n_basis
        self.partitioning = partitioning
        self.normalize = normalize

        assert (
            algorithm_spatial in __algorithms_spatial__
        ), "Choose from {} as `algorithm_spatial`.".format(__algorithms_spatial__)
        assert algorithm_spatial in ["IP", "ISS", "pairwise", "IP1", "IP2"], (
            "Not support {}-based demixing filter updates.".format(algorithm_spatial)
        )
        self.algorithm_spatial = algorithm_spatial

    @property
    def _is_iss(self):
        return self.algorithm_spatial == "ISS"

    @property
    def _is_pairwise(self):
        return self.algorithm_spatial in ("pairwise", "IP2")

    def prepare_state_kwargs(self, input, state_kwargs):
        """Random source-model init, host NumPy RNG, reference draw order
        (``ilrma.py:79-104``)."""
        n_channels, n_bins, n_frames = input.shape
        n_sources = n_channels
        n_basis, eps = self.n_basis, self.eps
        if self.partitioning:
            if "latent" not in state_kwargs:
                Z = np.random.rand(n_sources, n_basis) * 1e-2 + 1 / n_sources
                Zsum = np.maximum(Z.sum(axis=0), eps)
                state_kwargs["latent"] = Z / Zsum
            if "basis" not in state_kwargs:
                state_kwargs["basis"] = np.random.rand(n_bins, n_basis)
            if "activation" not in state_kwargs:
                state_kwargs["activation"] = np.random.rand(n_basis, n_frames)
        else:
            if "basis" not in state_kwargs:
                state_kwargs["basis"] = np.random.rand(n_sources, n_bins, n_basis)
            if "activation" not in state_kwargs:
                state_kwargs["activation"] = np.random.rand(
                    n_sources, n_basis, n_frames
                )
        return state_kwargs

    def init_state(
        self,
        X,
        demix_filter=None,
        estimation=None,
        basis=None,
        activation=None,
        latent=None,
    ):
        state = super().init_state(X, demix_filter=demix_filter, estimation=estimation)
        state["basis"] = basis
        state["activation"] = activation
        if self.partitioning:
            state["latent"] = latent
        if self._is_iss:
            del state["demix_filter"]
        if self._is_pairwise:
            state["step_count"] = jnp.zeros((), dtype=jnp.int32)
        return state

    def field_axes(self):
        axes = dict(super().field_axes())
        axes["basis"] = {"bins": 0 if self.partitioning else 1}
        axes["activation"] = {"frames": -1}
        return axes

    def source_variance(self, state):
        """``R (n_sources, n_bins, n_frames)`` from the NMF source model."""
        domain = getattr(self, "domain", 2)
        if self.partitioning:
            Z, T, V = state["latent"], state["basis"], state["activation"]
            ZTV = jnp.einsum("sk,fk,kt->sft", Z, T, V)
            return ZTV ** (2 / domain)
        T, V = state["basis"], state["activation"]
        return (T @ V) ** (2 / domain)

    def _estimation(self, state):
        # ``estimation == separate(X, demix_filter)`` is maintained by every
        # update and at init, so no re-separation is needed
        return state["estimation"]

    # ------------------------------------------------------------------ #
    # power-only scan mode: every in-scan consumer of the IP-family
    # iteration needs only P = |separate(X, W)|², never the complex
    # estimates — so the scan restores P directly as an all-real quadratic
    # form over the pair-product planes (quadratic_power_planes) and the
    # complex (N, F, T) materialization disappears from the loop entirely.
    # Measured on-chip (round 4, canonical config): the complex broadcast
    # separate + |·|² costs ~155 µs/iter vs ~8 µs for the planes form.
    # The post-scan restore still rebuilds complex ``estimation``
    # (IterativeSolver.restore_state), so published attributes, callbacks,
    # and finalize are unchanged.
    # ------------------------------------------------------------------ #
    @property
    def _power_only_scan(self):
        return False

    def _estimation_power(self, state):
        P = state.get("estimation_power")
        if P is not None:
            return P
        return jnp.abs(state["estimation"]) ** 2

    def _refresh_estimation(self, state, W):
        """Post-spatial-update refresh of the derived estimate, in whichever
        representation the current execution mode carries (complex in eager/
        callback mode, power-only inside the scan)."""
        if "estimation_power" in state and "estimation" not in state:
            from ..ops.ip_components import quadratic_power_planes

            return {
                "estimation_power": quadratic_power_planes(
                    W, state["pair_products"]
                )
            }
        return {"estimation": self.separate(state["input"], W)}

    def scan_restore_state(self, state):
        if (
            self._power_only_scan
            and "estimation" not in state
            and "pair_products" in state
            and "demix_filter" in state
        ):
            from ..ops.ip_components import quadratic_power_planes

            return dict(
                state,
                estimation_power=quadratic_power_planes(
                    state["demix_filter"], state["pair_products"]
                ),
            )
        return self.restore_state(state)

    def _materialized_filter(self, state):
        if "demix_filter" in state:
            return state["demix_filter"]
        return self.compute_demix_filter(state["estimation"], state["input"])

    def finalize(self, state):
        X = state["input"]
        Y = state["estimation"]
        # projection-back is unconditional in ILRMA (``ilrma.py:269-271``)
        scale = projection_back(Y, reference=X[self.reference_id])
        return Y * scale[..., None]

    def _sync_attributes(self, state_packed):
        from ..ops.packing import realify, to_host

        host_state = super()._sync_attributes(state_packed)
        if self._is_iss:
            if self.callbacks is not None:
                fit = self._get_jit(
                    "demix_fit",
                    lambda: realify(
                        lambda s: self.compute_demix_filter(s["estimation"], s["input"])
                    ),
                )
                self.demix_filter = to_host(fit(state_packed))
            else:
                self.demix_filter = None
        return host_state

    def __repr__(self):
        return "ILRMA(n_basis={}, partitioning={}, normalize={})".format(
            self.n_basis, self.partitioning, self.normalize
        )


class GaussILRMA(ILRMABase):
    """Gaussian ILRMA (``bss/ilrma.py:178-677``)."""

    def __init__(
        self,
        n_basis=10,
        domain=2,
        partitioning=False,
        normalize="power",
        algorithm_spatial="IP",
        reference_id=0,
        callbacks=None,
        recordable_loss=True,
        eps=EPS,
        threshold=THRESHOLD,
        guard="one_norm",
        iss_compat=False,
    ):
        super().__init__(
            n_basis=n_basis,
            partitioning=partitioning,
            normalize=normalize,
            algorithm_spatial=algorithm_spatial,
            callbacks=callbacks,
            recordable_loss=recordable_loss,
            eps=eps,
        )
        assert 1 <= domain <= 2, "1 <= `domain` <= 2 is not satisfied."
        self.domain = domain
        self.reference_id = reference_id
        self.threshold = threshold
        self.guard = guard
        # opt-in reference-exact ISS self-steering scale (see ops/iss.py)
        self.iss_compat = iss_compat
        if self.algorithm_spatial == "ISS":
            warnings.warn("in progress", UserWarning)

    @property
    def _power_only_scan(self):
        # every in-scan consumer of the IP/IP2 iteration needs only
        # P = |Y|² (source MU, spatial weights, power normalization, NLL);
        # ISS updates the estimates in place and projection-back
        # normalization is a complex per-bin least squares — both need Y
        return not self._is_iss and self.normalize in (False, True, "power")

    # ------------------------------------------------------------------ #
    # source model
    # ------------------------------------------------------------------ #
    def _update_source_basic(self, state):
        domain, eps = self.domain, self.eps
        P = self._estimation_power(state)

        if self.partitioning:
            assert domain == 2, "Not support domain = {}".format(domain)
            Z, T, V = state["latent"], state["basis"], state["activation"]

            def ztv(Z, T, V):
                return floor_below(jnp.einsum("sk,fk,kt->sft", Z, T, V), eps)

            ZTV = ztv(Z, T, V)
            division, ZTV_inv = P / ZTV**2, 1 / ZTV
            # latent: numerator Σ_{f,t} division · T V
            num = jnp.einsum("sft,fk,kt->sk", division, T, V)
            den = floor_below(jnp.einsum("sft,fk,kt->sk", ZTV_inv, T, V), eps)
            Z = jnp.sqrt(num / den)
            Z = Z / Z.sum(axis=0)

            ZTV = ztv(Z, T, V)
            division, ZTV_inv = P / ZTV**2, 1 / ZTV
            num = jnp.einsum("sft,sk,kt->fk", division, Z, V)
            den = floor_below(jnp.einsum("sft,sk,kt->fk", ZTV_inv, Z, V), eps)
            T = T * jnp.sqrt(num / den)

            ZTV = ztv(Z, T, V)
            division, ZTV_inv = P / ZTV**2, 1 / ZTV
            num = jnp.einsum("sft,sk,fk->kt", division, Z, T)
            den = floor_below(jnp.einsum("sft,sk,fk->kt", ZTV_inv, Z, T), eps)
            V = V * jnp.sqrt(num / den)

            return dict(state, latent=Z, basis=T, activation=V)

        T, V = state["basis"], state["activation"]
        exponent = domain / (domain + 2)

        TV = floor_below(T @ V, eps)
        division, TV_inv = P / TV ** ((domain + 2) / domain), 1 / TV
        TVV = floor_below(TV_inv @ jnp.swapaxes(V, -2, -1), eps)
        T = T * (division @ jnp.swapaxes(V, -2, -1) / TVV) ** exponent

        TV = floor_below(T @ V, eps)
        division, TV_inv = P / TV ** ((domain + 2) / domain), 1 / TV
        TTV = floor_below(jnp.swapaxes(T, -2, -1) @ TV_inv, eps)
        V = V * (jnp.swapaxes(T, -2, -1) @ division / TTV) ** exponent

        return dict(state, basis=T, activation=V)

    def _update_source_pairwise(self, state, m, n):
        """Pairwise source-model update: only sources (m, n) get MU sweeps
        (``ilrma.py:432-481``)."""
        domain, eps = self.domain, self.eps
        if self.partitioning:
            raise NotImplementedError("Not support partitioning function.")
        P_all = self._estimation_power(state)
        T, V = state["basis"], state["activation"]
        exponent = domain / (domain + 2)

        for idx in (m, n):
            P_i = jnp.take(P_all, idx, axis=0)
            T_i = jnp.take(T, idx, axis=0)
            V_i = jnp.take(V, idx, axis=0)

            TV = floor_below(T_i @ V_i, eps)
            division, TV_inv = P_i / TV ** ((domain + 2) / domain), 1 / TV
            TVV = floor_below(TV_inv @ V_i.T, eps)
            T_i = T_i * (division @ V_i.T / TVV) ** exponent

            TV = floor_below(T_i @ V_i, eps)
            division, TV_inv = P_i / TV ** ((domain + 2) / domain), 1 / TV
            TTV = floor_below(T_i.T @ TV_inv, eps)
            V_i = V_i * (T_i.T @ division / TTV) ** exponent

            T = T.at[idx].set(T_i)
            V = V.at[idx].set(V_i)

        return dict(state, basis=T, activation=V)

    # ------------------------------------------------------------------ #
    # spatial model
    # ------------------------------------------------------------------ #
    def _update_spatial_ip(self, state):
        R = floor_below(self.source_variance(state), self.eps)
        W = self._ip_sweep(state, 1.0 / R)
        return dict(state, demix_filter=W, **self._refresh_estimation(state, W))

    def _update_spatial_iss(self, state):
        Y = state["estimation"]
        R = floor_below(self.source_variance(state), self.eps)
        Y = iss_sweep(Y, 1.0 / R, compat=getattr(self, "iss_compat", False))
        return dict(state, estimation=Y)

    def _update_spatial_pairwise(self, state, m, n):
        X, W = state["input"], state["demix_filter"]
        n_bins, n_channels = W.shape[0], W.shape[-1]
        R = floor_below(self.source_variance(state), self.eps)
        R_mn = jnp.stack([jnp.take(R, m, axis=0), jnp.take(R, n, axis=0)])

        # planes fast path (see models/iva.py::_update_pairwise)
        planes = state.get("pair_products")
        n_sources = W.shape[1]
        if (
            planes is not None
            and self.guard in ("one_norm", "none")
            and n_sources == n_channels <= 3
        ):
            from ..ops.ip_components import (
                ip2_pair_update_planes,
                weighted_covariance_planes_stack,
            )

            U_p = weighted_covariance_planes_stack(
                planes, 1.0 / R_mn, flatten=self._covariance_flatten()
            )
            W = ip2_pair_update_planes(
                W, U_p, m, n, threshold=self.threshold, guard=self.guard
            )
            return dict(
                state, demix_filter=W, **self._refresh_estimation(state, W)
            )

        U_mn = self._weighted_covariance(state, 1.0 / R_mn)
        U_m, U_n = U_mn[0], U_mn[1]

        eye = jnp.eye(n_channels, dtype=W.dtype)
        E_mn = jnp.stack(
            [jnp.take(eye, m, axis=0), jnp.take(eye, n, axis=0)], axis=-1
        )
        E_mn = jnp.broadcast_to(E_mn, (n_bins, n_channels, 2))

        WU_m, WU_n = W @ U_m, W @ U_n
        WU_m_inv, WU_n_inv = jnp.linalg.inv(WU_m), jnp.linalg.inv(WU_n)
        ok_m = cond_guard(WU_m, WU_m_inv, threshold=self.threshold, guard=self.guard)
        ok_n = cond_guard(WU_n, WU_n_inv, threshold=self.threshold, guard=self.guard)

        P_m, P_n = WU_m_inv @ E_mn, WU_n_inv @ E_mn
        V_m = jnp.swapaxes(P_m, -2, -1).conj() @ U_m @ P_m
        V_n = jnp.swapaxes(P_n, -2, -1).conj() @ U_n @ P_n
        v_m, v_n = generalized_eig2x2_descending(V_m, V_n)
        vVv_m = jnp.einsum("fi,fij,fj->f", v_m.conj(), V_m, v_m)
        vVv_n = jnp.einsum("fi,fij,fj->f", v_n.conj(), V_n, v_n)
        v_m = v_m / jnp.sqrt(vVv_m)[:, None]
        v_n = v_n / jnp.sqrt(vVv_n)[:, None]
        w_m = jnp.einsum("fci,fi->fc", P_m, v_m).conj()
        w_n = jnp.einsum("fci,fi->fc", P_n, v_n).conj()

        W = W.at[:, m, :].set(jnp.where(ok_m[:, None], w_m, W[:, m, :]))
        W = W.at[:, n, :].set(jnp.where(ok_n[:, None], w_n, W[:, n, :]))
        return dict(state, demix_filter=W, **self._refresh_estimation(state, W))

    # ------------------------------------------------------------------ #
    # normalization (``ilrma.py:293-338``)
    # ------------------------------------------------------------------ #
    def _normalize_state(self, state):
        if not self.normalize:
            return state
        eps, domain = self.eps, self.domain
        X = state["input"]
        power_mode = "estimation_power" in state and "estimation" not in state
        if self._is_iss:
            Y = state["estimation"]
            W = self.compute_demix_filter(Y, X)
        else:
            W = state["demix_filter"]
            Y = None if power_mode else state["estimation"]

        T = state["basis"]

        if self.normalize == "power" or self.normalize is True:
            P = self._estimation_power(state)
            # mean over the TRUE bin count (trace-time constant): identical
            # to .mean() when unpadded; keeps the per-source RMS exact when
            # the bin axis is zero-padded for a mesh (use_mesh pad_bins)
            n_eff = (P.shape[1] - self._bin_pad) * P.shape[2]
            aux = floor_below(jnp.sqrt(P.sum(axis=(1, 2)) / n_eff), eps)  # (S,)
            if self._bin_pad:
                # keep the padded identity rows unscaled — their data is zero
                # (scaling is a no-op for Y/T there) but their log-dets enter
                # the NLL; leaving them at I keeps the padded-loss offset an
                # iteration-independent constant
                valid = (
                    jnp.arange(W.shape[0]) < W.shape[0] - self._bin_pad
                )[:, None, None]
                W = jnp.where(valid, W / aux[None, :, None], W)
            else:
                W = W / aux[None, :, None]
            if power_mode:
                state = dict(
                    state, estimation_power=P / (aux[:, None, None] ** 2)
                )
            else:
                Y = Y / aux[:, None, None]
            if self.partitioning:
                Z = state["latent"]
                Zaux = Z / (aux[:, None] ** domain)
                Zauxsum = jnp.sum(Zaux, axis=0)
                T = T * Zauxsum
                Z = Zaux / Zauxsum
                state = dict(state, latent=Z)
            else:
                T = T / (aux[:, None, None] ** domain)
        elif self.normalize == "projection-back":
            if self.partitioning:
                raise NotImplementedError(
                    "Not support 'projection-back' based normalization for "
                    "partitioninig function. Choose 'power' based normalization."
                )
            scale = projection_back(Y, reference=X[self.reference_id])
            Y = Y * scale[..., None]
            W = W * jnp.transpose(scale, (1, 0))[..., None]
            T = T * jnp.abs(scale[..., None]) ** domain
        else:
            raise ValueError(
                "Not support normalization based on {}. Choose 'power' or "
                "'projection-back'".format(self.normalize)
            )

        state = dict(state, basis=T)
        if Y is not None:
            state = dict(state, estimation=Y)
        if "demix_filter" in state:
            state = dict(state, demix_filter=W)
        return state

    # ------------------------------------------------------------------ #
    def update_state(self, state):
        if self._is_pairwise:
            k = state["step_count"]
            n_sources = state["basis"].shape[0]
            m = k % n_sources
            n = (k + 1) % n_sources
            state = self._update_source_pairwise(state, m, n)
            state = self._update_spatial_pairwise(state, m, n)
            state = dict(state, step_count=k + 1)
        else:
            state = self._update_source_basic(state)
            if self.algorithm_spatial in ("IP", "IP1"):
                state = self._update_spatial_ip(state)
            elif self._is_iss:
                state = self._update_spatial_iss(state)
        return self._normalize_state(state)

    def nll(self, state):
        """``Σ (P/R + log R) − 2T Σ log|det W|`` (``ilrma.py:648-677``)."""
        X = state["input"]
        n_frames = X.shape[-1]
        W = self._materialized_filter(state)
        P = self._estimation_power(state)  # == |separate(X, W)|² (invariant)
        R = floor_below(self.source_variance(state), self.eps)
        return jnp.sum(P / R + jnp.log(R)) - 2 * n_frames * jnp.sum(
            batched_log_abs_det(W)
        )

    def supports_bin_padding(self):
        """Zero bins are neutral for Gauss-ILRMA's IP paths: zero spectra
        freeze the padded NMF rows at zero (MU numerators vanish), the
        covariance guard keeps identity demixing rows, the power
        normalization divides by the TRUE bin count (see
        ``_normalize_state``), and padded bins add only an
        iteration-independent ``log(eps)`` constant to the NLL.
        Projection-back normalization is per-bin least squares (0/0 on
        empty bins) and ISS materializes the filter the same way — both
        stay opted out."""
        return self.algorithm_spatial in ("IP", "IP1", "IP2", "pairwise") and (
            self.normalize in (False, True, "power")
        )

    def __repr__(self):
        return (
            "Gauss-ILRMA(n_basis={}, domain={}, partitioning={}, normalize={}, "
            "algorithm_spatial={})".format(
                self.n_basis,
                self.domain,
                self.partitioning,
                self.normalize,
                self.algorithm_spatial,
            )
        )


class TILRMA(ILRMABase):
    """Student-t ILRMA (``bss/ilrma.py:713-1020``), IP only."""

    def __init__(
        self,
        n_basis=10,
        nu=1,
        domain=2,
        partitioning=False,
        normalize="power",
        algorithm_spatial="IP",
        reference_id=0,
        callbacks=None,
        recordable_loss=True,
        eps=EPS,
        threshold=THRESHOLD,
        guard="one_norm",
    ):
        super().__init__(
            n_basis=n_basis,
            partitioning=partitioning,
            normalize=normalize,
            algorithm_spatial=algorithm_spatial,
            callbacks=callbacks,
            recordable_loss=recordable_loss,
            eps=eps,
        )
        assert self.algorithm_spatial == "IP", "Supports only IP-based spatial update."
        self.nu = nu
        self.domain = domain
        self.reference_id = reference_id
        self.threshold = threshold
        self.guard = guard

    @property
    def _power_only_scan(self):
        # IP-only solver; both MU and the posterior-weighted IP consume P
        return self.normalize in (False, True, "power")

    def source_variance(self, state):
        # t-ILRMA uses R = TV directly in the spatial weights (``ilrma.py:959``)
        if self.partitioning:
            Z, T, V = state["latent"], state["basis"], state["activation"]
            return jnp.einsum("sk,fk,kt->sft", Z, T, V)
        return state["basis"] @ state["activation"]

    def _update_source(self, state):
        nu, eps = self.nu, self.eps
        assert self.domain == 2, "Only domain = 2 is supported."
        if self.partitioning:
            raise NotImplementedError("Only support when `partitioning=False` ")
        P = self._estimation_power(state)
        T, V = state["basis"], state["activation"]

        TV = floor_below(T @ V, eps)
        harmonic = 1 / (2 / ((2 + nu) * TV) + nu / ((2 + nu) * P))
        division, TV_inv = harmonic / TV**2, 1 / TV
        TVV = floor_below(TV_inv @ jnp.swapaxes(V, -2, -1), eps)
        T = T * jnp.sqrt(division @ jnp.swapaxes(V, -2, -1) / TVV)

        TV = floor_below(T @ V, eps)
        harmonic = 1 / (2 / ((2 + nu) * TV) + nu / ((2 + nu) * P))
        division, TV_inv = harmonic / TV**2, 1 / TV
        TTV = floor_below(jnp.swapaxes(T, -2, -1) @ TV_inv, eps)
        V = V * jnp.sqrt(jnp.swapaxes(T, -2, -1) @ division / TTV)

        return dict(state, basis=T, activation=V)

    def _update_spatial(self, state):
        """Posterior-weighted IP: ``Xi = (νR + 2P)/(ν+2)`` (``ilrma.py:961-989``)
        with the reference's denominator floor, on the shared guarded sweep.

        Documented divergence: the reference runs UNGUARDED (NumPy float64).
        At float32 the reference-default ``nu=1`` drives the posterior
        weights ``1/Xi`` across ~10 decades; ``det(W U)`` then cancels
        catastrophically (observed exact zeros → inf rows → NaN at
        iteration ~70 on the quality fixture).  The standard κ₁ condition
        guard keeps the previous row exactly where the update direction is
        numerical noise — in float64 those are the bins whose update the
        reference computes from rounding error anyway.  ``guard="none"``
        restores the raw reference behavior.
        """
        from ..ops.ip import ip_update

        nu, eps = self.nu, self.eps
        X, W = state["input"], state["demix_filter"]
        P = self._estimation_power(state)  # == |separate(X, W)|² (invariant)
        R = floor_below(self.source_variance(state), eps)
        Xi = (nu * R + 2 * P) / (nu + 2)

        planes = state.get("pair_products")
        n_channels = W.shape[2]
        if (
            planes is not None
            and self.guard in ("one_norm", "none")
            and n_channels <= 4
        ):
            from ..ops.ip_components import ip_sweep_from_planes

            W = ip_sweep_from_planes(
                W,
                planes,
                1.0 / Xi,
                threshold=self.threshold,
                guard=self.guard,
                flatten=self._covariance_flatten(),
                denom_floor=eps,
            )
        else:
            U = self._weighted_covariance(state, 1.0 / Xi)
            W = ip_update(
                W, U, threshold=self.threshold, guard=self.guard, denom_floor=eps
            )
        return dict(state, demix_filter=W, **self._refresh_estimation(state, W))

    def _normalize_state(self, state):
        if not self.normalize:
            return state
        eps = self.eps
        X, W = state["input"], state["demix_filter"]
        power_mode = "estimation_power" in state and "estimation" not in state
        Y = None if power_mode else state["estimation"]
        if self.normalize == "power" or self.normalize is True:
            P = self._estimation_power(state)
            aux = floor_below(jnp.sqrt(P.mean(axis=(1, 2))), eps)
            W = W / aux[None, :, None]
            if power_mode:
                state = dict(
                    state, estimation_power=P / (aux[:, None, None] ** 2)
                )
            else:
                Y = Y / aux[:, None, None]
            T = state["basis"]
            if self.partitioning:
                Z = state["latent"]
                Zaux = Z / (aux[:, None] ** 2)
                Zauxsum = jnp.sum(Zaux, axis=0)
                T = T * Zauxsum
                Z = Zaux / Zauxsum
                state = dict(state, latent=Z, basis=T)
            else:
                T = T / (aux[:, None, None] ** 2)
                state = dict(state, basis=T)
        else:
            raise ValueError(
                "Not support normalization based on {}. Choose 'power' or "
                "'projection-back'".format(self.normalize)
            )
        state = dict(state, demix_filter=W)
        if Y is not None:
            state = dict(state, estimation=Y)
        return state

    def update_state(self, state):
        state = self._update_source(state)
        state = self._update_spatial(state)
        return self._normalize_state(state)

    def nll(self, state):
        """t-NLL (``ilrma.py:993-1020``)."""
        nu, eps = self.nu, self.eps
        X = state["input"]
        n_frames = X.shape[-1]
        W = self._materialized_filter(state)
        P = self._estimation_power(state)  # == |separate(X, W)|² (invariant)
        R = floor_below(self.source_variance(state), eps)
        return jnp.sum(
            (1 + nu / 2) * jnp.log(1 + (2 / nu) * (P / R)) + jnp.log(R)
        ) - 2 * n_frames * jnp.sum(batched_log_abs_det(W))

    def __repr__(self):
        return (
            "t-ILRMA(n_basis={}, nu={}, domain={}, partitioning={}, normalize={}, "
            "algorithm_spatial={})".format(
                self.n_basis,
                self.nu,
                self.domain,
                self.partitioning,
                self.normalize,
                self.algorithm_spatial,
            )
        )


class ConsistentGaussILRMA(GaussILRMA):
    """Consistency-projected Gaussian ILRMA (``bss/ilrma.py:1102-1233``).

    Each iteration starts with an ``istft → stft`` round trip of the current
    estimates (spectrogram-consistency projection) — on TPU this stays inside
    the jitted scan body (framing + rFFT on static shapes) — and ends by
    folding the projection-back scale into the demixing filters and basis.
    """

    def __init__(
        self,
        n_basis=10,
        partitioning=False,
        algorithm_spatial="IP",
        reference_id=0,
        fft_size=None,
        hop_size=None,
        callbacks=None,
        recordable_loss=True,
        eps=EPS,
        threshold=THRESHOLD,
        guard="one_norm",
    ):
        super().__init__(
            n_basis=n_basis,
            partitioning=partitioning,
            normalize=False,
            algorithm_spatial=algorithm_spatial,
            reference_id=reference_id,
            callbacks=callbacks,
            recordable_loss=recordable_loss,
            eps=eps,
            threshold=threshold,
            guard=guard,
        )
        if fft_size is None:
            raise ValueError("Specify `fft_size`.")
        if hop_size is None:
            hop_size = fft_size // 2
        self.fft_size, self.hop_size = fft_size, hop_size
        assert self.algorithm_spatial == "IP", "Supports only IP-based spatial update."

    def supports_bin_padding(self):
        """The per-iteration consistency projection (istft → stft) requires
        the true ``fft_size // 2 + 1`` bin geometry — padding is not neutral."""
        return False


    def update_state(self, state):
        from ..transform.stft import istft, stft

        # consistency projection (``ilrma.py:1206-1207``).  NOTE (reference
        # finding): in the reference the projected estimation is immediately
        # discarded for IP mode — ``update_source_model_basic`` recomputes
        # ``Y = separate(X, W)`` whenever ``demix_filter`` exists
        # (``ilrma.py:360-364``), so the projection never feeds any update.
        # We reproduce that behavior exactly (the projection below is dead
        # code that XLA eliminates, kept for documentation parity; in the
        # power-only scan mode the complex estimates are never restored, so
        # the dead projection is simply not traced).
        power_mode = "estimation_power" in state and "estimation" not in state
        if not power_mode:
            Y = state["estimation"]
            y = istft(Y, fft_size=self.fft_size, hop_size=self.hop_size)
            Y = stft(y, fft_size=self.fft_size, hop_size=self.hop_size)
            Y = Y[..., : state["estimation"].shape[-1]].astype(
                state["input"].dtype
            )
            del Y  # parity: the reference discards the projection (see NOTE)
            state = dict(
                state,
                estimation=self.separate(
                    state["input"], state["demix_filter"]
                ),
            )

        state = self._update_source_basic(state)
        state = self._update_spatial_ip(state)

        # fold projection-back into W and T (``ilrma.py:1212-1233``)
        X, W = state["input"], state["demix_filter"]
        T = state["basis"]
        if self.partitioning:
            raise NotImplementedError(
                "Not support 'projection-back' based normalization for "
                "partitioninig function. Choose 'power' based normalization."
            )
        if power_mode:
            # scale from the INVARIANT frame-summed mixture Gram: exact
            # restatement of projection_back(separate(X, W), X_ref) with no
            # complex (N, F, T) materialization (see ops/ip_components.py)
            from ..ops.ip_components import (
                gram_components,
                projection_back_components,
                quadratic_power_planes,
            )

            planes = state["pair_products"]
            n_channels = W.shape[-1]
            rows = [
                [W[:, n, c] for c in range(n_channels)]
                for n in range(W.shape[1])
            ]
            scale = jnp.stack(
                projection_back_components(
                    rows, gram_components(planes),
                    reference_id=self.reference_id,
                )
            )  # (N, F)
            W = W * jnp.transpose(scale, (1, 0))[..., None]
            T = T * jnp.abs(scale[..., None]) ** 2
            return dict(
                state,
                demix_filter=W,
                estimation_power=quadratic_power_planes(W, planes),
                basis=T,
            )
        Y = self.separate(X, W)
        scale = projection_back(Y, reference=X[self.reference_id])
        W = W * jnp.transpose(scale, (1, 0))[..., None]
        Y = self.separate(X, W)
        T = T * jnp.abs(scale[..., None]) ** 2
        return dict(state, demix_filter=W, estimation=Y, basis=T)

    def __repr__(self):
        return (
            "Consistent-GaussILRMA(n_basis={}, domain={}, partitioning={}, "
            "algorithm_spatial={})".format(
                self.n_basis, self.domain, self.partitioning, self.algorithm_spatial
            )
        )


class GGDILRMA(ILRMABase):
    """Stub, as in the reference (``bss/ilrma.py:679-699``)."""

    def __init__(self, n_basis=10, beta=1, domain=2, **kwargs):
        super().__init__(n_basis=n_basis, **kwargs)
        self.beta = beta
        self.domain = domain
        raise NotImplementedError("Implement GGD-ILRMA")


class KLILRMA(ILRMABase):
    """Stub, as in the reference (``bss/ilrma.py:1022-1033``)."""

    def __init__(self, n_basis=10, **kwargs):
        super().__init__(n_basis=n_basis, **kwargs)
        raise NotImplementedError("Implement KL-ILRMA")


class RegularizedILRMA(ILRMABase):
    """Stub, as in the reference (``bss/ilrma.py:1084-1100``)."""

    def __init__(self, n_basis=10, **kwargs):
        super().__init__(n_basis=n_basis, **kwargs)
        raise NotImplementedError("Implement Regularized ILRMA")
