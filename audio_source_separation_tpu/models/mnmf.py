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
flagged "in progress", ``mnmf.py:149``; each fix is also documented at its
definition site):
  * Ozerov NLL uses the correct Gaussian likelihood
    ``tr(xx^H Σ_x^{-1}) + log det Σ_x`` — the reference computes
    ``tr(xx^H Σ_x)`` (``mnmf.py:531``);
  * Ozerov separation builds ``Σ_x = A Σ_s A^H + Σ_b`` — the reference
    multiplies ``A Σ_s`` twice (``mnmf.py:607``);
  * Ozerov normalization preserves the likelihood (``a→a/λ`` compensated by
    ``W→W·λ²`` per (bin, source)) — the reference divides W by a λ that is a
    scalar over all bins (``mnmf.py:364-368``), changing the model every
    iteration;
  * the Ozerov M step is sequential (H from the NEW W) and its divisions /
    residual noise diagonal are eps-floored; the init is scaled to the data
    power.  With these four fixes the EM NLL decreases monotonically on real
    mixtures (float64; verified) where the reference's formulation diverges
    and overflows within ~5 iterations.

TPU design: every trace/contraction is an einsum (no ``(F,S,T,C,C)``
broadcast materializations); the batched C×C inverses and the PSD Riccati
closed form are MXU-batched over (bin, frame) / (bin, source).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ..algorithm.linalg import solve_riccati
from ..ops.ip import cond_guard
from ..ops.fast_linalg import (
    f32_matmuls,
    add_diag_planes,
    batched_det,
    batched_inv,
    compact_entry,
    expand_hermitian_compact,
    expand_hermitian_compact_trailing,
    hermitian_compact_from_entries,
    inv_hermitian_compact,
    inv_planes,
    psd_parts_planes,
    sandwich_hermitian_compact,
    solve_riccati_hermitian_compact,
)
from ..ops.ip_components import _plane_index, pair_products_planes
from ..runtime.solver import IterativeSolver
from ..utils.flooring import floor_below

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
    invariant_fields = ("input", "covariance_planes", "second_moment", "bin_scale")
    # Sawada spatial Riccati on compact Hermitian planes (C == 2 closed
    # form; falls back to the batched matrix path otherwise).  Settled by
    # on-chip A/B (benchmarks/riccati_ab.py) — see RESULTS.md.
    riccati_planes = True

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
            allowed = {
                "reference_id",
                "annealing",
                "annealing_iterations",
                "annealing_start",
                "annealing_end",
            }
            if set(kwargs) - allowed:
                raise ValueError("Invalid keywords.")
            self.reference_id = kwargs.get("reference_id", reference_id)
            # simulated annealing (Ozerov & Févotte 2010, the original
            # paper's remedy for EM's non-separating local optima from
            # random init): the noise variance is OVERRIDDEN by a decreasing
            # schedule instead of the M-step estimate — large early noise
            # flattens the likelihood so the mixing system can reorganize,
            # the decay then anneals into the data.  ``annealing_start`` /
            # ``annealing_end`` are relative to the mean mixture power;
            # geometric decay over ``annealing_iterations`` EM steps.  The
            # reference's (unfinished, ``mnmf.py:249``) Ozerov has no
            # annealing — this is the paper's own algorithm, off by default.
            self.annealing = bool(kwargs.get("annealing", False))
            self.annealing_iterations = int(kwargs.get("annealing_iterations", 50))
            self.annealing_start = float(kwargs.get("annealing_start", 1e-1))
            self.annealing_end = float(kwargs.get("annealing_end", 1e-5))
            warnings.warn("in progress", UserWarning)

    def field_axes(self):
        """Shardable axes (see :meth:`IterativeSolver.use_mesh`): everything
        in MNMF is per-bin batched; activations shard over frames."""
        common = {"input": {"bins": 1, "frames": 2}}
        if self.author.lower() == "sawada":
            return dict(
                common,
                covariance_planes={"bins": 1, "frames": 2},
                spatial={"bins": 0},
                basis={"bins": 0},
                activation={"frames": -1},
            )
        return dict(
            common,
            mix_filter={"bins": 0},
            noise_covariance={"bins": 0},
            second_moment={"bins": 0},
            bin_scale={"bins": 0},
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
            # documented divergence: the reference's (unfinished) Ozerov init
            # is scale-blind — rand(0, 1) spectra and a 1e-2·(P + rand(0, 1))
            # noise floor regardless of the data's power
            # (``mnmf.py:255-272``).  On quiet real-world mixtures
            # (|x|² ≪ 1) the model variance then exceeds the data by orders
            # of magnitude and the EM runs away (W↓/H↑ by ~10³ per
            # iteration until overflow — reproduced with the reference
            # math in float64).  The draws below keep the reference's RNG
            # order/count but scale the variance factors to the observed
            # mean power, which is a no-op at the reference's implicit
            # O(1)-power operating point.
            P = np.mean(np.sum(np.abs(input) ** 2, axis=0), axis=1)  # (n_bins,)
            p_bar = max(float(np.mean(P)), eps)
            # trace-time constant for the annealing schedule (see __init__)
            self._anneal_base = p_bar
            if "mix_filter" not in state_kwargs:
                state_kwargs["mix_filter"] = np.random.randn(
                    n_bins, n_channels, n_sources
                ) + 1j * np.random.randn(n_bins, n_channels, n_sources)
            if "basis" not in state_kwargs:
                # per-BIN power shaping (round 5): a flat rand(0,1) spectrum
                # mismatches quiet bins by the full ~24-decade spectral
                # dynamic range; the EM must then crush W by ~1e10 at those
                # bins, and the transient Σx (model ≫ data) drives the C=2
                # determinant negative at float32 (observed NaN on
                # sample-song).  Shaping the draw by P_f/p̄ starts every bin
                # at its own power level (σ_s(f) ~ P_f) — at the reference's
                # implicit O(1)-flat-power operating point the factor is 1
                # and this is a no-op; RNG order/count unchanged.
                state_kwargs["basis"] = (
                    np.random.rand(n_sources, n_bins, n_basis)
                    * (np.maximum(P, eps) / p_bar)[None, :, None]
                )
            if "activation" not in state_kwargs:
                state_kwargs["activation"] = p_bar * np.random.rand(
                    n_sources, n_basis, n_frames
                )
            if "noise_covariance" not in state_kwargs:
                state_kwargs["noise_covariance"] = 1e-2 * (
                    P[:, None] + p_bar * np.random.rand(n_bins, n_channels)
                )
        return state_kwargs

    def init_state(self, X, **kwargs):
        n_channels = X.shape[0]
        self.n_channels = n_channels
        if self.n_sources is None:
            self.n_sources = n_channels
        state = {"input": X}
        state.update(kwargs)
        if self.author.lower() != "sawada" and getattr(self, "annealing", False):
            state["step_count"] = jnp.zeros((), dtype=jnp.int32)
        if self.author.lower() == "sawada":
            # observed covariance tensor (``mnmf.py:216-217``), stored as
            # compact Hermitian pair-product planes ``(C², F, T)`` — the
            # planes layout keeps the (bins, frames) axes in the TPU tile
            # (a materialized (F, T, C, C) array pads its C=2 minors to the
            # 8×128 tile: ~256× the payload in HBM traffic per read)
            state["covariance_planes"] = pair_products_planes(X)
        else:
            # per-bin power equilibration (same exactly-invariant
            # reparametrization as CovarianceISNMF, ``models/nmf.py``):
            # real spectrogram powers span ~24 decades across bins, and the
            # float32 EM drifts (non-monotone NLL) on the extremes.  The
            # whole EM iteration is EXACTLY invariant under the joint
            # per-bin rescaling (x, W, Σ_b) → (x/√s, W/s, Σ_b/s) with A, H
            # unchanged (σ_s·a a^H + Σ_b and x^H Σx⁻¹ x are degree-(-1,-1)
            # homogeneous, the MU/M-step ratios dimensionless), so running
            # in the equilibrated frame changes nothing in exact arithmetic
            # (oracle-tested); the eps floors become bin-relative
            # (documented divergence from the absolute-eps float64 regime).
            # The NLL's log-det picks up the exact constant C·log s_f per
            # frame (restored in ``_nll_ozerov``); :meth:`_separate_ozerov`
            # returns to the input frame via ·√s.
            s = jnp.mean(jnp.sum(jnp.abs(X) ** 2, axis=0), axis=-1) / n_channels
            s = jnp.maximum(s, jnp.finfo(s.dtype).tiny)  # (F,)
            state["bin_scale"] = s
            X = X / jnp.sqrt(s)[None, :, None].astype(X.dtype)
            state["input"] = X
            state["basis"] = state["basis"] / s[None, :, None].astype(
                state["basis"].dtype
            )
            state["noise_covariance"] = state["noise_covariance"] / s[
                :, None
            ].astype(state["noise_covariance"].dtype)
            # R_xx = mean_t x x^H (``mnmf.py:357``) is a pure function of the
            # mixture — hoisted out of the EM scan as an invariant field
            # (it was C² full-plane products + frame means per iteration,
            # ~60 MB/iteration of op-level traffic for the C=2 canonical
            # config, all recomputing the same (F, C, C) constant)
            state["second_moment"] = jnp.stack(
                [
                    jnp.stack(
                        [(X[c] * X[d].conj()).mean(axis=-1) for d in range(n_channels)],
                        -1,
                    )
                    for c in range(n_channels)
                ],
                -2,
            )  # (F, C, C)
        return state

    # ------------------------------------------------------------------ #
    # Sawada machinery
    # ------------------------------------------------------------------ #
    def _ztv(self, state):
        Z, T, V = state["latent"], state["basis"], state["activation"]
        return jnp.einsum("sk,fk,kt->sft", Z, T, V)  # (S, F, T)

    def _cov_planes_complex(self, state):
        """Observed covariance as complex planes ``(C, C, F, T)`` assembled
        from the compact Hermitian storage (fuses into consumers — never a
        (F, T, C, C) array in HBM)."""
        planes = state["covariance_planes"]
        C = self.n_channels
        index, _ = _plane_index(C)

        def entry(c, d):
            if c == d:
                return planes[index[("re", c, c)]] + 0j
            if c < d:
                re, im = index[("re", c, d)], index[("im", c, d)]
                return planes[re] + 1j * planes[im]
            re, im = index[("re", d, c)], index[("im", d, c)]
            return planes[re] - 1j * planes[im]

        return jnp.stack(
            [jnp.stack([entry(c, d) for d in range(C)]) for c in range(C)]
        )

    def _xhat_compact(self, state):
        """``X̂ = Σ_s H_s ZTV_s`` (``mnmf.py:216-217`` reconstruction) as
        COMPACT Hermitian planes ``(C², F, T)`` real — H is Hermitian per
        (bin, source) and ZTV real, so each compact plane is one real
        S-contraction; half the HBM traffic of complex ``(C, C, F, T)``
        planes.  Barriered: X̂ is read C²-fold by the adjugate minors (the
        Ozerov E/M multi-consumer lever, CLAUDE.md round 4)."""
        H = state["spatial"]  # (F, S, C, C) complex Hermitian
        ZTV = self._ztv(state)  # (S, F, T) real
        _, order = _plane_index(self.n_channels)
        coeffs = jnp.stack(
            [
                H[:, :, c, d].real if kind == "re" else H[:, :, c, d].imag
                for kind, c, d in order
            ]
        )  # (C², F, S) real
        ZTV = ZTV.astype(coeffs.dtype)
        n_sources = H.shape[1]
        # unrolled S-sum (one elementwise fusion) — the einsum dot forced
        # (F, T)-batched layout copies of ZTV and the result
        planes = sum(
            coeffs[:, :, s][:, :, None] * ZTV[s][None] for s in range(n_sources)
        )
        return jax.lax.optimization_barrier(planes)

    def _inv_xhat_compact(self, state, xh=None):
        """Compact Hermitian planes of ``(X̂ + eps·I)⁻¹`` (adjugate closed
        form over the REAL Hermitian determinant — TPU's batched LU kernel
        can fault on hard (F, T, C, C) batches, observed on hardware).
        Barriered: X̂⁻¹ feeds the trace/frame reductions AND the
        ``X̂⁻¹XX̂⁻¹`` sandwich — without the barrier XLA's fusion
        re-expands the minor chain into every consumer."""
        if xh is None:
            xh = self._xhat_compact(state)
        inv = inv_hermitian_compact(xh, ridge=self.eps)
        return jax.lax.optimization_barrier(inv)

    def _xhat_planes(self, state):
        """Complex planes ``(C, C, F, T)`` view of the reconstruction (the
        nll's PSD-projection path consumes full complex planes)."""
        return expand_hermitian_compact(self._xhat_compact(state))

    def _trace_terms(self, state):
        """``tr(X̂⁻¹XX̂⁻¹ H)`` and ``tr(X̂⁻¹ H)`` per (bin, source, frame) —
        all on compact Hermitian planes; returns ``(F, S, T)`` reals."""
        H = state["spatial"]
        C = self.n_channels
        inv = self._inv_xhat_compact(state)
        cov = state["covariance_planes"]  # compact (C², F, T)

        # X̂⁻¹XX̂⁻¹ is consumed exactly ONCE here (by the tn accumulation
        # below), so its entries stay LAZY quadratic forms — one fusion
        # computes tn AND td reading each compact inv/X plane once from
        # HBM, and the (C, C, F, T) product tensor never materializes.
        # The spatial update keeps its own barriered sandwich (its consumer
        # is a dot, whose operands materialize regardless).
        def xxx_entry(c, d):
            return sum(
                compact_entry(inv, c, a)
                * compact_entry(cov, a, b)
                * compact_entry(inv, b, d)
                for a in range(C)
                for b in range(C)
            )

        def traces(entry):
            # ONE broadcast accumulation producing (F, S, T) — each input
            # plane is read exactly once for ALL sources.  Both operands are
            # Hermitian, so ``Σ_{c,d} A[c,d]·H[d,c]`` reduces to the diagonal
            # products plus ``2·(Re·Re + Im·Im)`` per off-diagonal pair.
            acc = sum(
                entry(c, c).real[:, None, :] * H[:, :, c, c].real[:, :, None]
                for c in range(C)
            )
            for c in range(C):
                for d in range(c + 1, C):
                    e = entry(c, d)
                    acc = acc + 2.0 * (
                        e.real[:, None, :] * H[:, :, c, d].real[:, :, None]
                        + e.imag[:, None, :] * H[:, :, c, d].imag[:, :, None]
                    )
            return acc  # (F, S, T)

        return traces(xxx_entry), traces(
            lambda c, d: compact_entry(inv, c, d)
        )

    def _update_sawada_basis(self, state):
        """Basis MU (``mnmf.py:377-398``)."""
        eps = self.eps
        Z, T, V = state["latent"], state["basis"], state["activation"]
        tn, td = self._trace_terms(state)
        # floor at 0: the trace numerators are PSD×PSD traces (≥ 0
        # exactly) but round slightly negative at float32 near zero,
        # and sqrt(num) would NaN (same hardening as models/nmf.py)
        num = jnp.maximum(jnp.einsum("sk,kt,fst->fk", Z, V, tn), 0.0)
        den = floor_below(jnp.einsum("sk,kt,fst->fk", Z, V, td), eps)
        return dict(state, basis=T * jnp.sqrt(num / den))

    def _update_sawada_activation(self, state):
        """Activation MU (``mnmf.py:400-421``)."""
        eps = self.eps
        Z, T, V = state["latent"], state["basis"], state["activation"]
        tn, td = self._trace_terms(state)
        num = jnp.maximum(jnp.einsum("sk,fk,fst->kt", Z, T, tn), 0.0)
        den = floor_below(jnp.einsum("sk,fk,fst->kt", Z, T, td), eps)
        return dict(state, activation=V * jnp.sqrt(num / den))

    def _update_sawada_latent(self, state):
        """Latent MU + simplex renormalization (``mnmf.py:423-447``)."""
        eps = self.eps
        Z, T, V = state["latent"], state["basis"], state["activation"]
        tn, td = self._trace_terms(state)
        num = jnp.maximum(jnp.einsum("fk,kt,fst->sk", T, V, tn), 0.0)
        den = floor_below(jnp.einsum("fk,kt,fst->sk", T, V, td), eps)
        Z = Z * jnp.sqrt(num / den)
        Z = Z / floor_below(Z.sum(axis=0), eps)
        return dict(state, latent=Z)

    def _update_sawada_spatial(self, state):
        eps = self.eps
        # spatial via Riccati (``mnmf.py:449-473``): the frame contractions
        # ``A = Σ_t ZTV·X̂⁻¹`` / ``Σ_t ZTV·X̂⁻¹XX̂⁻¹`` are per-entry plane
        # reductions; the Riccati solve itself runs on the small (F, S, C, C)
        # results
        H = state["spatial"]
        C = self.n_channels
        inv = self._inv_xhat_compact(state)
        XXX = jax.lax.optimization_barrier(
            sandwich_hermitian_compact(inv, state["covariance_planes"])
        )
        ZTV = self._ztv(state)  # (S, F, T) real

        if self.riccati_planes and C == 2:
            # planes Riccati (round 5): the whole
            # A^{-1/2}(A^{1/2}BA^{1/2})^{1/2}A^{-1/2} chain runs on compact
            # Hermitian planes of shape (C², S, F) — F in the tile lanes —
            # so none of its ~2 dozen intermediates materializes in the
            # tile-padded (F, S, 2, 2) matrix layout (~33 MB each padded vs
            # 131 KB payload; the Riccati chain was the measured-dominant
            # Sawada stage, STAGES.json 'spatial (Riccati)')
            def contract_planes(planes):
                # (S, C², F) mul+reduce (fuses; an einsum dot forced
                # (F, T)-batched layout copies of both operands), then a
                # lazy transpose to (C², S, F)
                return jnp.transpose(
                    (ZTV.astype(planes.dtype)[:, None] * planes[None]).sum(-1),
                    (1, 0, 2),
                )

            A_p = contract_planes(inv)
            Z_p = contract_planes(XXX)
            H_p = hermitian_compact_from_entries(
                lambda c, d: jnp.swapaxes(H[:, :, c, d], 0, 1), C
            )
            B_p = sandwich_hermitian_compact(H_p, Z_p)
            H_p = solve_riccati_hermitian_compact(A_p, B_p)
            diag, off = H_p[:C] + eps, H_p[C:]
            if self.normalize:
                tr = diag.sum(axis=0)
                diag, off = diag / tr, off / tr
            H_new = expand_hermitian_compact(jnp.concatenate([diag, off]))
            return dict(state, spatial=jnp.transpose(H_new, (3, 2, 0, 1)))

        def contract_t(planes):
            # single batched REAL t-contraction over the compact planes
            # (reads ZTV and each plane exactly once — half the bytes of the
            # complex-planes einsum), then a tiny trailing expansion to the
            # complex (F, S, C, C) the Riccati solve consumes
            small = jnp.transpose(
                (ZTV.astype(planes.dtype)[:, None] * planes[None]).sum(-1),
                (2, 0, 1),
            )  # (F, S, C²) real — mul+reduce fuses; the einsum dot forced
            # (F, T)-batched layout copies of both operands
            return expand_hermitian_compact_trailing(small, C)

        A = contract_t(inv)
        ZTVXXX = contract_t(XXX)
        B = H @ ZTVXXX @ H
        H = solve_riccati(A, B)
        H = H + eps * jnp.eye(self.n_channels, dtype=H.dtype)
        if self.normalize:
            H = H / jnp.trace(H, axis1=-2, axis2=-1)[..., None, None]
        return dict(state, spatial=H)

    def _update_sawada(self, state):
        state = self._update_sawada_basis(state)
        state = self._update_sawada_activation(state)
        state = self._update_sawada_latent(state)
        return self._update_sawada_spatial(state)

    def _nll_sawada(self, state):
        """Log-det divergence between the PSD-projected observed and model
        covariances (``criterion/divergence.py:83-105`` semantics), in planes
        layout: one closed-form eigvalsh per operand supplies the floored
        log-dets, the trace comes from the planes product."""
        n_channels = self.n_channels
        eps = self.eps
        X_psd, wX = psd_parts_planes(self._cov_planes_complex(state), eps=eps)
        Xh_psd, wXh = psd_parts_planes(self._xhat_planes(state), eps=eps)
        ridge = jnp.full(X_psd.shape[2:], eps)
        X_psd = add_diag_planes(X_psd, ridge)
        Xh_psd = add_diag_planes(Xh_psd, ridge)
        wX, wXh = wX + eps, wXh + eps
        inv_h = inv_planes(Xh_psd)
        trace = sum(
            (X_psd[c, d] * inv_h[d, c]).real
            for c in range(n_channels)
            for d in range(n_channels)
        )
        logdet = jnp.log(jnp.maximum(wX, eps)).sum(axis=0) - jnp.log(
            jnp.maximum(wXh, eps)
        ).sum(axis=0)
        return (trace - logdet - n_channels).sum()

    def _separate_sawada(self, state):
        """Multichannel Wiener filter at the reference mic (``mnmf.py:554-583``)."""
        X = state["input"]  # (C, F, T)
        H = state["spatial"]  # (F, S, C, C)
        C = self.n_channels
        n_sources = H.shape[1]
        inv = self._inv_xhat_compact(state)
        v = [
            sum(compact_entry(inv, c, d) * X[d] for d in range(C))
            for c in range(C)
        ]  # X̂⁻¹x
        # row `reference_id` of H[f,s] @ v[f,t]
        Href = H[:, :, self.reference_id, :]  # (F, S, C)
        HXx = jnp.stack(
            [
                sum(Href[:, s, d][:, None] * v[d] for d in range(C))
                for s in range(n_sources)
            ]
        )  # (S, F, T)
        ZTV = self._ztv(state).astype(HXx.dtype)
        return ZTV * HXx

    # ------------------------------------------------------------------ #
    # Ozerov machinery (EM) — planes layout throughout: every (frames ×
    # bins)-sized quantity keeps its tiny channel/source/basis axes LEADING
    # (a materialized (F, T, C, C)/(F, T, S, K) array pads its small minors
    # to the TPU tile, costing orders of magnitude in HBM traffic)
    # ------------------------------------------------------------------ #
    def _sigma_components(self, state):
        """Hermitian ``Σx`` as COMPONENT planes ``Sx[c][d] (F, T)`` (upper
        triangle computed, diagonal real, lower triangle the exact
        conjugate — bit-identical to the former stacked+symmetrized array,
        since complex conjugation distributes exactly over the fp products)
        plus the per-source variances ``σ_s (S, F, T)``
        (``mnmf.py:307-330`` model covariance).  Component lists keep every
        entry a lazy expression XLA can fuse into consumers instead of a
        materialized ``(C, C, F, T)`` tensor."""
        A = state["mix_filter"]  # (F, C, S)
        sigma_b = state["noise_covariance"]  # (F, C)
        W, H = state["basis"], state["activation"]  # (S, F, K), (S, K, T)
        C, S = self.n_channels, self.n_sources
        sigma_s = W @ H  # (S, F, T) real
        sA = sigma_s.astype(A.dtype)
        Sx = [[None] * C for _ in range(C)]
        for c in range(C):
            for d in range(c, C):
                acc = sum(
                    (A[:, c, s] * A[:, d, s].conj())[:, None] * sA[s]
                    for s in range(S)
                )
                if c == d:
                    Sx[c][c] = acc.real + sigma_b[:, c][:, None]  # real plane
                else:
                    Sx[c][d] = acc
                    Sx[d][c] = acc.conj()
        return Sx, sigma_s

    @staticmethod
    def _adjugate_components(Sx):
        """Adjugate of Hermitian component planes (closed form, C ≤ 3 —
        the component dual of ``ops.fast_linalg.inv_planes`` without the
        determinant division), as lazy expressions."""
        C = len(Sx)
        if C == 1:
            return [[jnp.ones_like(Sx[0][0])]]
        if C == 2:
            return [[Sx[1][1], -Sx[0][1]], [-Sx[1][0], Sx[0][0]]]
        if C == 3:
            a, b, c0 = Sx[0]
            d, e, f = Sx[1]
            g, h, i = Sx[2]
            return [
                [e * i - f * h, c0 * h - b * i, b * f - c0 * e],
                [f * g - d * i, a * i - c0 * g, c0 * d - a * f],
                [d * h - e * g, b * g - a * h, a * e - b * d],
            ]
        raise ValueError(
            "adjugate closed forms cover C <= 3, got {}".format(C)
        )

    @staticmethod
    def _det_components(Sx):
        """Real determinant of Hermitian component planes (C ≤ 3)."""
        C = len(Sx)
        if C == 1:
            return Sx[0][0]
        if C == 2:
            return Sx[0][0] * Sx[1][1] - (Sx[0][1] * Sx[1][0]).real
        if C == 3:
            return (
                Sx[0][0] * (Sx[1][1] * Sx[2][2] - (Sx[1][2] * Sx[2][1]).real)
                - (
                    Sx[0][1]
                    * (Sx[1][0] * Sx[2][2] - Sx[1][2] * Sx[2][0])
                ).real
                + (
                    Sx[0][2]
                    * (Sx[1][0] * Sx[2][1] - Sx[1][1] * Sx[2][0])
                ).real
            )
        raise ValueError("det closed forms cover C <= 3, got {}".format(C))

    @classmethod
    def _det_floored(cls, Sx):
        """Determinant of the Hermitian component planes, floored at
        ``100·eps_machine·Π_c Σx[c,c]`` (Hadamard bound: ``det ≤ Π diag`` for
        PSD, so the floor is scale-correct per (bin, frame)).  The closed-form
        det carries ~eps_machine·Πdiag cancellation noise and rounds to zero
        or negative for near-singular float32 Σx (observed on sample-song:
        1/det then NaNs the posteriors); at float64 the floor only engages
        beyond condition ~1e13 — outside any healthy trajectory (documented
        guard, no reference counterpart: its Ozerov path is unfinished)."""
        det = cls._det_components(Sx)
        prod_diag = Sx[0][0]
        for c in range(1, len(Sx)):
            prod_diag = prod_diag * Sx[c][c]
        feps = float(jnp.finfo(det.dtype).eps)
        return jnp.maximum(det, 100.0 * feps * prod_diag)

    def _collapsed_posteriors(self, state, Sx, sigma_s):
        """``M2 = A^H Σx⁻¹ A`` (Hermitian component planes, S×S) and
        ``v = A^H Σx⁻¹ x (S, F, T)`` — the only two E-step quantities any
        consumer needs.  The former ``(C·C/S·C, F, T)`` posterior tensors
        all collapse onto them (``AhS·x = v``, ``G = σ·AhS``,
        ``GA = σ·M2``, ``aSa = diag M2``, ``s_post = σ·v``), and Σx⁻¹ is
        never materialized: adjugate entries are lazy references into the
        ``Σx`` planes (round-4 E-step collapse; was ~1.4 GB/iteration of
        real posterior-plane traffic, ``mnmf.py:307-355``)."""
        A = state["mix_filter"]
        X = state["input"]  # (C, F, T) — the x planes
        C, S = self.n_channels, self.n_sources
        adj = self._adjugate_components(Sx)
        inv_det = 1.0 / self._det_floored(Sx)  # real (F, T)
        # t[s][d] = (A^H adj Σx)[s, d] — lazy
        t = [
            [
                sum(A[:, c, s].conj()[:, None] * adj[c][d] for c in range(C))
                for d in range(C)
            ]
            for s in range(S)
        ]
        v = jnp.stack(
            [sum(t[s][d] * X[d] for d in range(C)) * inv_det for s in range(S)]
        )  # (S, F, T)
        M2 = [[None] * S for _ in range(S)]
        for s in range(S):
            for r in range(s, S):
                m = (
                    sum(t[s][d] * A[:, d, r][:, None] for d in range(C))
                    * inv_det
                )
                M2[s][r] = m
                if r != s:
                    M2[r][s] = m.conj()
        return M2, v

    def _update_ozerov(self, state):
        n_sources, n_channels = self.n_sources, self.n_channels
        X = state["input"]  # (C, F, T)
        A = state["mix_filter"]
        W, H = state["basis"], state["activation"]
        n_basis = self.n_basis
        C, S, K = n_channels, n_sources, n_basis

        Sx, sigma_s = self._sigma_components(state)
        M2, v = self._collapsed_posteriors(state, Sx, sigma_s)
        # Materialize the E-step outputs ONCE behind an optimization
        # barrier.  ``M2``'s entries are lazy component expressions whose
        # leaves are the full adjugate/Σx chains; without the barrier XLA's
        # fusion re-expands that chain into EVERY M-step consumer (R_xs,
        # R_ss, B_post, both MU contractions) — measured on-chip: the full
        # EM iteration ran at ~0.1 ms of E step + ~1.9 ms of duplicated
        # M-step traffic (op-level 2.4 GB/iter).  Hermitian storage: S real
        # diagonal planes + the strict upper triangle, rebuilt as views.
        diag = jnp.stack([M2[s][s].real for s in range(S)])  # (S, F, T)
        upper = [M2[s][r] for s in range(S) for r in range(s + 1, S)]
        off = jnp.stack(upper) if upper else jnp.zeros((0,) + v.shape[1:], v.dtype)
        v, diag, off, sigma_s = jax.lax.optimization_barrier(
            (v, diag, off, sigma_s)
        )
        M2 = [[None] * S for _ in range(S)]
        k = 0
        for s in range(S):
            M2[s][s] = diag[s].astype(v.dtype)
            for r in range(s + 1, S):
                M2[s][r] = off[k]
                M2[r][s] = off[k].conj()
                k += 1
        sA = sigma_s.astype(A.dtype)
        # σ_s·(A^H Σx⁻¹ x)_s — kept LAZY on purpose: the batched-einsum /
        # barriered variant ("one dot each, reading the operands once")
        # measured 2.2× SLOWER on-chip (2,311 → 1,040 iters/s) — the
        # t-contracting dots layout-copy the big (·, F, T) planes to
        # frame-major form before every GEMM, and the barrier materializes
        # a 15 MB complex s_post that XLA otherwise fuses into the per-entry
        # frame reductions for free.  The modeled op-level bytes pointed the
        # other way (681 → 412 MB/iter): cost_analysis counts pre-fusion
        # materializations, not layout copies — trust the chip.
        s_post = v * sA  # (S, F, T), lazy

        def mean_t(plane):
            return plane.mean(axis=-1)  # (F,)

        # sufficient statistics (small (F, ·, ·) outputs from per-entry
        # plane reductions XLA fuses end-to-end).  R_xx is the hoisted
        # invariant (see ``init_state``).
        R_xx = state["second_moment"]  # (F, C, C)
        R_xs = jnp.stack(
            [
                jnp.stack(
                    [mean_t(X[c] * s_post[s].conj()) for s in range(S)], -1
                )
                for c in range(C)
            ],
            -2,
        )  # (F, C, S)
        # R_ss[s, r] = mean_t [ s_s s̄_r + (δ_sr − (GA)[s, r]) σ_r ] with
        # GA[s, r] = σ_s·M2[s, r]
        R_ss = jnp.stack(
            [
                jnp.stack(
                    [
                        mean_t(
                            s_post[s] * s_post[r].conj()
                            + ((1.0 if s == r else 0.0) - sA[s] * M2[s][r])
                            * sA[r]
                        )
                        for r in range(S)
                    ],
                    -1,
                )
                for s in range(S)
            ],
            -2,
        )  # (F, S, S)
        # per-entry construction is Hermitian only up to FP association
        # order ((sA[s]·M2[s][r])·sA[r] vs (sA[r]·M2[r][s])·sA[s]);
        # re-symmetrize exactly like the reference (``mnmf.py:356``) —
        # negligible cost on an (F, S, S) array
        R_ss = 0.5 * (R_ss + jnp.swapaxes(R_ss, -2, -1).conj())

        # component posteriors (diagonals only, ``mnmf.py:332-355``):
        # c_i = σ_c,i (a_i^H Σx⁻¹ x);  U_i = |c_i|² + (1 − σ_c,i a_i^H Σx⁻¹ a_i) σ_c,i
        # σ_c[s, k](f, t) = W[s, f, k]·H[s, k, t];
        # U = σ²·|aSx|² + (1 − σ·aSa)·σ = σ²·B + σ with
        # B = |aSx|² − Re(aSa) = |v|² − Re(diag M2) — so the (S·K) component
        # posteriors NEVER need materializing: the MU ratios below collapse
        # algebraically (U/H = W + W²·H·B), turning the former per-(s, k)
        # Python-looped (F, T) planes (~77 MB/iteration of U_p buffers, read
        # twice) into two (S, K)-contraction GEMMs over the single B plane
        # barriered like the E outputs: B_post is an operand of BOTH MU
        # GEMMs below, and each would otherwise re-materialize the fused
        # |v|² − diag expression as its own GEMM input (~2× its traffic)
        B_post = jax.lax.optimization_barrier(
            jnp.abs(v) ** 2 - diag
        )  # (S, F, T) real

        # M step (``mnmf.py:357-375``): ``A = R_xs R_ss⁻¹`` with the
        # closed-form S×S inverse (adjugate/det, exact for S ≤ 3) — the
        # batched LU solve on 2049 tiny (S, S) systems is a loop-shaped
        # kernel TPUs execute poorly; the closed form is two fused
        # elementwise planes ops.  Trace-relative ridge: when a source dies
        # at a bin (σ_s decaying geometrically — routine on real music at
        # float32) R_ss goes numerically singular there and the adjugate
        # inverse NaNs A for that bin; the cross-bin ``wsum`` normalization
        # then poisons EVERY bin.  100·eps_machine·tr/S is invisible at
        # float64 and keeps the inverse bounded at float32 (documented
        # guard; the reference's Ozerov path is unfinished and unguarded).
        S_eye = jnp.eye(R_ss.shape[-1], dtype=R_ss.dtype)
        finfo = jnp.finfo(R_ss.real.dtype)
        ridge = jnp.maximum(
            100.0
            * float(finfo.eps)
            * jnp.trace(R_ss, axis1=-2, axis2=-1).real
            / R_ss.shape[-1],
            # absolute floor √tiny: a fully-died bin has R_ss ~ σ̃² deep in
            # the denormal range, the relative ridge underflows with it, and
            # det(R_ss) flushes to exactly zero → inf A (observed); √tiny²
            # is the smallest normal determinant
            float(np.sqrt(finfo.tiny)),
        )
        A_new = R_xs @ batched_inv(
            R_ss + ridge[:, None, None].astype(R_ss.dtype) * S_eye
        )
        A_newh = jnp.swapaxes(A_new, -2, -1).conj()
        R_xs_h = jnp.swapaxes(R_xs, -2, -1).conj()
        # the residual diagonal is PSD in exact arithmetic but can go
        # (slightly, then catastrophically) negative numerically — an
        # indefinite Σx then NaNs the log-det; floored like every other
        # variance in the repo (the reference's unfinished Ozerov has no
        # guard, ``mnmf.py:360``)
        residual = jnp.diagonal(
            R_xx - A_new @ R_xs_h - R_xs @ A_newh + A_new @ R_ss @ A_newh,
            axis1=-2,
            axis2=-1,
        ).real
        # dtype-aware floor: in the equilibrated frame ‖Σx‖ ~ O(1) per bin,
        # and the C=2 determinant Sx₀₀Sx₁₁ − |Sx₀₁|² carries ~machine-eps·‖Σx‖²
        # cancellation noise — a 1e-12 noise floor is BELOW float32
        # resolution, Σx rounds to exactly singular, and 1/det NaNs the EM
        # (observed on sample-song at complex64).  100·eps_machine keeps
        # det ≥ ~1e-5·‖Σx‖ at float32 (a −50 dB per-bin noise floor) while
        # leaving the float64 semantics at the reference-style 1e-12
        sigma_b = floor_below(
            residual,
            max(self.eps, 100.0 * float(jnp.finfo(residual.dtype).eps)),
        )
        if getattr(self, "annealing", False):
            # simulated annealing (Ozerov & Févotte 2010): the noise
            # variance follows a geometric decay schedule instead of the
            # M-step estimate (see __init__); the schedule floor-maxes the
            # estimate so late iterations keep the M step's residual once
            # the annealed level drops beneath it
            step = state["step_count"]
            L = max(self.annealing_iterations, 1)
            frac = jnp.minimum(step.astype(sigma_b.dtype) / L, 1.0)
            s0 = self.annealing_start * self._anneal_base
            s1 = self.annealing_end * self._anneal_base
            level = s0 * (s1 / s0) ** frac
            # the schedule is defined in the INPUT power frame; divide by
            # the per-bin equilibration scale to apply it in the working
            # frame (see ``init_state``) — exact, so the annealed
            # trajectory matches the unequilibrated one
            level = level / state["bin_scale"][:, None].astype(sigma_b.dtype)
            sigma_b = jnp.maximum(sigma_b, level)
        # W update: mean_t U/H = W + W²·mean_t(H·B) EXACTLY (the division
        # by H cancels algebraically — no floored division needed at all,
        # which is strictly more stable than the previous eps-floored form)
        n_frames = B_post.shape[-1]
        n_bins = W.shape[1]
        C1 = jnp.einsum("skt,sft->sfk", H, B_post) / n_frames  # (S, F, K)
        W_new = W + W**2 * C1  # (S, F, K)
        # documented divergence: the reference updates H from the OLD W
        # (simultaneous update, ``mnmf.py:361``), which is not a valid
        # (generalized) M step — on real mixtures the NLL increases from the
        # first iteration and the factors run away.  Updating H from the NEW
        # W makes both halves exact coordinate minimizers of the M-step
        # objective Σ [U/σ_c + log σ_c], restoring monotone descent.  The
        # numerator's σ still carries the OLD W, so
        # mean_f U/W_new = H²·mean_f(W²B/W_new) + H·mean_f(W/W_new); the
        # division by W_new keeps the eps floor (documented divergence from
        # the reference's unfloored division, a no-op on healthy
        # trajectories).
        Wf = floor_below(W_new, self.eps)
        D_ratio = W**2 / Wf  # (S, F, K)
        E_ratio = W / Wf
        H_new = (
            H**2 * (jnp.einsum("sfk,sft->skt", D_ratio, B_post) / n_bins)
            + H * jnp.mean(E_ratio, axis=1)[:, :, None]
        )  # (S, K, T)

        if self.normalize:
            # documented divergence: the reference compensates the steering
            # normalization ``a_s → a_s/λ_s`` by DIVIDING W by λ (and its λ
            # is a scalar over ALL bins/sources — ``np.sum(..)`` with no
            # axis, ``mnmf.py:365``); the model term ``σ_s a_s a_s^H`` is
            # invariant only under ``W → W·λ²`` per (bin, source) — without
            # that the normalization changes the model and the NLL jumps
            # at every iteration
            scale = jnp.sqrt(jnp.sum(jnp.abs(A_new) ** 2, axis=1, keepdims=True))
            # a fully-died source column has |a|² underflowing to exactly
            # zero at float32 → a/0 = inf; √tiny leaves any live column
            # untouched (documented guard)
            scale = jnp.maximum(scale, float(np.sqrt(jnp.finfo(scale.dtype).tiny)))
            A_new = A_new / scale.astype(A_new.dtype)
            W_new = W_new * jnp.transpose(scale, (2, 0, 1)) ** 2
            # the bin-sum normalizer is computed in the INPUT frame
            # (Σ_f W̃·s_f = Σ_f W): the cross-bin sum is the one step that
            # is not per-bin equivariant, and weighting by the equilibration
            # scale keeps the whole EM step exactly equivalent to the
            # unequilibrated trajectory (oracle-tested)
            wsum = (
                W_new * state["bin_scale"][None, :, None].astype(W_new.dtype)
            ).sum(axis=1)
            W_new = W_new / wsum[:, None, :]
            H_new = H_new * wsum[:, :, None]

        out = dict(
            state,
            mix_filter=A_new,
            noise_covariance=sigma_b,
            basis=W_new,
            activation=H_new,
        )
        if "step_count" in state:
            out["step_count"] = state["step_count"] + 1
        return out

    def _nll_ozerov(self, state):
        """Correct Gaussian NLL ``x^H Σx⁻¹ x + log det Σx`` (the reference
        computes ``tr(xx^H Σx)``, ``mnmf.py:531`` — documented divergence).
        ``Σx⁻¹`` never materializes: ``x^H adj(Σx) x / det`` from the lazy
        component adjugate."""
        X = state["input"]  # (C, F, T)
        C = self.n_channels
        Sx, _ = self._sigma_components(state)
        adj = self._adjugate_components(Sx)
        det = self._det_floored(Sx)
        quad = sum(
            (X[c].conj() * sum(adj[c][d] * X[d] for d in range(C))).real
            for c in range(C)
        ) / det
        logdet = jnp.log(jnp.abs(det))
        # det is computed in the equilibrated frame (Σx/s per bin); restore
        # the input-frame log-det exactly: log det(s·Σx̃) = log det Σx̃ +
        # C·log s.  Per-(f, t) so the correction shards with bins/frames.
        logdet = logdet + (
            C * jnp.log(state["bin_scale"])[:, None]
        ).astype(logdet.dtype)
        return (quad + logdet).sum()

    def _separate_ozerov(self, state):
        """Posterior mean of the sources (``mnmf.py:585-617``; the reference's
        duplicated ``A_sigma_s`` factor at ``:607`` is fixed here)."""
        Sx, sigma_s = self._sigma_components(state)
        _, v = self._collapsed_posteriors(state, Sx, sigma_s)
        # posterior mean in the equilibrated frame; ·√s returns to the
        # input frame (see ``init_state``)
        root = jnp.sqrt(state["bin_scale"])[:, None].astype(v.dtype)
        return v * sigma_s.astype(v.dtype) * root  # (S, F, T)

    def _sync_attributes(self, state_packed):
        # publish (and checkpoint) the Ozerov factors in the INPUT frame:
        # the working state lives in the per-bin equilibrated frame (see
        # ``init_state``), and ``init_state`` re-equilibrates whatever a
        # warm start passes in — attributes must round-trip
        host_state = super()._sync_attributes(state_packed)
        if self.author.lower() != "sawada" and "bin_scale" in host_state:
            s = np.asarray(host_state["bin_scale"])
            if "basis" in host_state:
                self.basis = np.asarray(host_state["basis"]) * s[None, :, None]
                host_state["basis"] = self.basis
            if "noise_covariance" in host_state:
                self.noise_covariance = (
                    np.asarray(host_state["noise_covariance"]) * s[:, None]
                )
                host_state["noise_covariance"] = self.noise_covariance
        return host_state

    # ------------------------------------------------------------------ #
    # every stage runs with float32 matmul precision: TPU's default bf16
    # multiplies NaN the Sawada EM after ~40 iterations (and immediately
    # from ill-conditioned seeded spatial inits) — the reduced-precision
    # trace/Riccati contractions drive X̂ indefinite and its adjugate
    # inverse explodes (measured on hardware; caught by the QUALITY.md
    # sweep's seeded/300-iteration rows; same failure mode as IPSDTA)
    @f32_matmuls
    def update_state(self, state):
        if self.author.lower() == "sawada":
            return self._update_sawada(state)
        return self._update_ozerov(state)

    @f32_matmuls
    def nll(self, state):
        if self.author.lower() == "sawada":
            return self._nll_sawada(state)
        return self._nll_ozerov(state)

    @f32_matmuls
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
    # the pair-product planes are a pure function of the mixture — close
    # them over the scan body instead of threading ~15 MB through the carry
    invariant_fields = ("input", "pair_products")
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
        planes = state.get("pair_products")
        if planes is not None:
            # all-real quadratic form over the carried pair-product planes
            # — the former per-row complex broadcast multiply over X
            # measured 155 µs/iter on-chip vs 8.3 µs for this form; it was
            # HALF of FastMNMF's whole iteration (round 4)
            from ..ops.ip_components import quadratic_power_planes

            return quadratic_power_planes(Q, planes)  # (M, F, T)
        rows = []
        for m in range(n_channels):
            acc = Q[:, m, 0][:, None] * X[0]
            for c in range(1, n_channels):
                acc = acc + Q[:, m, c][:, None] * X[c]
            rows.append(jnp.abs(acc) ** 2)
        return jnp.stack(rows)  # (M, F, T)

    def _model_power(self, state):
        """``R[m] = Σ_s (WH)_s g[s,:,m] → (n_channels, n_bins, n_frames)``.

        ONE GEMM: ``g`` is folded into ``W`` (``Wg (M, F, S·K)``, ~300 KB)
        so the contraction runs over the joint ``(s, k)`` axis and the
        ``(S, F, T)`` reconstruction ``Λ = WH`` is never materialized —
        round-3 profiling showed the four per-iteration ``Λ`` round trips
        (~60 MB at the canonical config) were the largest removable term
        in FastMNMF's traffic (reference op order: ``mnmf.py:775-788``)."""
        W, H = state["basis"], state["activation"]
        g = state["spatial_covariance"]  # (S, F, M)
        n_sources, _, n_basis = W.shape
        Wg = jnp.einsum("sfk,sfm->mfsk", W, g)
        Wg = Wg.reshape(Wg.shape[:2] + (n_sources * n_basis,))
        Hj = H.reshape(n_sources * n_basis, -1)
        return jnp.einsum("mfj,jt->mft", Wg, Hj)

    def _update_nmf(self, state):
        """MU sweeps with the frame/bin contraction FIRST (``mnmf.py:789-813``
        exactly, reassociated): ``Σ_t H·(x̃/R²)`` lands in a tiny
        ``(S, K, M, F)`` tensor and the channel mix ``Σ_m g·(…)`` happens
        there, so the ``(S, F, T)`` intermediates ``g·xR`` / ``g/R`` are
        never built — each big array is read exactly once per numerator/
        denominator pair."""
        eps = self.eps
        g = state["spatial_covariance"]
        W, H = state["basis"], state["activation"]
        x_tilde = self._qx_power(state)  # (M, F, T)

        # W update (``mnmf.py:789-800``)
        R = floor_below(self._model_power(state), eps)
        # big-operand-first forms: "mft,skt->mfsk" keeps the (M, F, T)
        # operand's frame axis minor on BOTH sides of the dot (the
        # "skt,mft->skmf" form layout-copied the 7.7 MB operand to
        # (T, M·F) per GEMM; the transpose now lands on the 37 KB H)
        E_num = jnp.einsum("mft,skt->mfsk", x_tilde / R**2, H)
        E_den = jnp.einsum("mft,skt->mfsk", 1 / R, H)
        num = jnp.einsum("sfm,mfsk->sfk", g, E_num)
        den = floor_below(jnp.einsum("sfm,mfsk->sfk", g, E_den), eps)
        W = W * jnp.sqrt(num / den)
        state = dict(state, basis=W)

        # H update (``mnmf.py:802-813``): contraction over (m, f) in one
        # GEMM with g folded into W
        R = floor_below(self._model_power(state), eps)
        Wg = jnp.einsum("sfk,sfm->skmf", W, g)  # (S, K, M, F), ~300 KB
        num = jnp.einsum("mft,skmf->skt", x_tilde / R**2, Wg)
        den = floor_below(jnp.einsum("mft,skmf->skt", 1 / R, Wg), eps)
        H = H * jnp.sqrt(num / den)
        return dict(state, activation=H)

    def _update_scm(self, state):
        """``g`` MU (``mnmf.py:815-827``): ``Σ_t Λ·xR = Σ_k W·(Σ_t H·xR)``
        — reuses the tiny ``(S, K, M, F)`` frame-contraction instead of
        materializing ``Λ`` and the ``(M, F, T)`` products."""
        eps = self.eps
        g = state["spatial_covariance"]
        W, H = state["basis"], state["activation"]
        R = floor_below(self._model_power(state), eps)
        x_tilde = self._qx_power(state)
        E_num = jnp.einsum("mft,skt->mfsk", x_tilde / R**2, H)
        E_den = jnp.einsum("mft,skt->mfsk", 1 / R, H)
        A = jnp.einsum("sfk,mfsk->sfm", W, E_num)
        B = floor_below(jnp.einsum("sfk,mfsk->sfm", W, E_den), eps)
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
