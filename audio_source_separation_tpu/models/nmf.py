"""Single-channel nonnegative matrix factorization family.

Parity targets (reference ``src/algorithm/nmf.py``):
  * ``EUCNMF`` — Euclidean MM updates with the fractional ``domain``
    parameter, exponent ``d/(4−d)`` (``nmf.py:150-207``);
  * ``KLNMF`` — generalized-KL MM, exponent ``d/2`` (``nmf.py:209-266``);
  * ``ISNMF`` — Itakura–Saito MM (exponent ``d/(d+2)``) and ME variant
    (``nmf.py:268-356``);
  * ``tNMF`` — Student-t with the harmonic weight (``nmf.py:358-428``);
  * ``CauchyNMF`` — naive / mm / me / mm_fast rules (``nmf.py:430-595``);
  * ``ComplexEUCNMF`` — complex NMF with per-(bin,basis,frame) phase and
    auxiliary split weights Beta (``nmf.py:597-676``);
  * ``MultichannelISNMF`` — Sawada covariance-domain multichannel IS-NMF with
    Riccati spatial updates (``nmf.py:678-815``).

API: ``model = Cls(n_basis=K, ...); T, V = model(target, iteration=N)`` where
``target`` is the (power/magnitude-domain) spectrogram ``(n_bins, n_frames)``.
Loss is recorded after every update (no pre-loop entry), matching
``nmf.py:44-52``.

TPU notes: each MM sweep is two dense matmul pairs (``(F,K)×(K,T)``) plus
elementwise powers — all MXU/VPU work; the fractional exponents compile to
``exp/log``; the reference's in-place flooring becomes ``jnp.maximum``.
Random initialization draws from host NumPy global RNG in the reference's
order (basis then activation, ``nmf.py:41-42``) so seeded runs are
init-compatible.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..algorithm.linalg import solve_riccati
from ..ops.fast_linalg import (
    add_diag_planes,
    expand_hermitian_compact,
    expand_hermitian_compact_trailing,
    herm_planes,
    hermitian_compact_from_entries,
    hermitian_eigvalsh_planes,
    inv_hermitian_compact,
    inv_planes,
    matmul_planes,
    sandwich_hermitian_compact,
    solve_riccati_hermitian_compact,
    trace_planes,
)
from ..ops.ip_components import _plane_index
from ..criterion.divergence import generalized_kl_divergence, is_divergence
from ..runtime.solver import IterativeSolver

EPS = 1e-12


def _floor(x, eps):
    return jnp.maximum(x, eps)


class NMFBase(IterativeSolver):
    """Fit protocol shared by the NMF family (``nmf.py:10-56``)."""

    state_fields = ("basis", "activation")
    record_initial_loss = False

    def __init__(self, n_basis=2, eps=EPS):
        super().__init__(callbacks=None, recordable_loss=True, eps=eps)
        self.n_basis = n_basis

    def field_axes(self):
        """Shardable axes of the NMF state (see
        :meth:`IterativeSolver.use_mesh`).  The MU numerator/denominator
        contractions are plain GEMMs: under bins sharding the activation
        update's ``Σ_f`` becomes a psum (and vice versa for frames/basis) —
        the ``input`` entry describes the 2-D ``(n_bins, n_frames)`` call
        target."""
        return {
            "input": {"bins": 0, "frames": 1},
            "target": {"bins": -2, "frames": -1},
            "basis": {"bins": -2},  # (n_bins, n_basis)
            "activation": {"frames": -1},  # (n_basis, n_frames)
        }

    def prepare_state_kwargs(self, target, state_kwargs):
        n_bins, n_frames = target.shape[-2], target.shape[-1]
        if "basis" not in state_kwargs:
            state_kwargs["basis"] = np.random.rand(n_bins, self.n_basis)
        if "activation" not in state_kwargs:
            state_kwargs["activation"] = np.random.rand(self.n_basis, n_frames)
        return state_kwargs

    def init_state(self, target, basis=None, activation=None):
        real = target.real if jnp.iscomplexobj(target) else target
        return {
            "target": real.astype(basis.dtype),
            "basis": basis,
            "activation": activation,
        }

    def criterion(self, reconstruction, target):
        raise NotImplementedError

    def reconstruct(self, state):
        domain = getattr(self, "domain", 2)
        return (state["basis"] @ state["activation"]) ** (2 / domain)

    def nll(self, state):
        return self.criterion(self.reconstruct(state), state["target"]).sum()

    def finalize(self, state):
        return state["basis"], state["activation"]

    def __call__(self, target, iteration=100, **kwargs):
        return super().__call__(np.asarray(target), iteration=iteration, **kwargs)


class EUCNMF(NMFBase):
    """Euclidean NMF, MM updates with fractional ``domain`` (``nmf.py:150-207``)."""

    def __init__(self, n_basis=2, domain=2, algorithm="mm", eps=EPS):
        super().__init__(n_basis=n_basis, eps=eps)
        assert 1 <= domain <= 2, "1 <= `domain` <= 2 is not satisfied."
        assert algorithm == "mm", "algorithm must be 'mm'."
        self.domain = domain
        self.algorithm = algorithm

    def criterion(self, reconstruction, target):
        return (target - reconstruction) ** 2

    def update_state(self, state):
        Z = state["target"]
        T, V = state["basis"], state["activation"]
        d, eps = self.domain, self.eps

        TV = _floor(T @ V, eps)
        TVV = _floor(TV ** ((4 - d) / d) @ V.T, eps)
        numerator = (Z * TV ** ((2 - d) / d)) @ V.T
        T = T * (numerator / TVV) ** (d / (4 - d))

        TV = _floor(T @ V, eps)
        TTV = _floor(T.T @ TV ** ((4 - d) / d), eps)
        numerator = T.T @ (Z * TV ** ((2 - d) / d))
        V = V * (numerator / TTV) ** (d / (4 - d))

        return {"target": Z, "basis": T, "activation": V}


class KLNMF(NMFBase):
    """Generalized-KL NMF, MM updates (``nmf.py:209-266``)."""

    def __init__(self, n_basis=2, domain=2, algorithm="mm", eps=EPS):
        super().__init__(n_basis=n_basis, eps=eps)
        assert 1 <= domain <= 2, "1 <= `domain` <= 2 is not satisfied."
        assert algorithm == "mm", "algorithm must be 'mm'."
        self.domain = domain
        self.algorithm = algorithm

    def criterion(self, reconstruction, target):
        return generalized_kl_divergence(reconstruction, target, eps=self.eps)

    def update_state(self, state):
        Z = state["target"]
        T, V = state["basis"], state["activation"]
        d, eps = self.domain, self.eps

        TV = _floor(T @ V, eps)
        TVV = _floor(TV ** ((2 - d) / d) @ V.T, eps)
        T = T * ((Z / TV) @ V.T / TVV) ** (d / 2)

        TV = _floor(T @ V, eps)
        TTV = _floor(T.T @ TV ** ((2 - d) / d), eps)
        V = V * (T.T @ (Z / TV) / TTV) ** (d / 2)

        return {"target": Z, "basis": T, "activation": V}


class ISNMF(NMFBase):
    """Itakura–Saito NMF: MM (any domain) and ME (domain=2) updates
    (``nmf.py:268-356``)."""

    def __init__(self, n_basis=2, domain=2, algorithm="mm", eps=EPS):
        super().__init__(n_basis=n_basis, eps=eps)
        assert 1 <= domain <= 2, "1 <= `domain` <= 2 is not satisfied."
        if algorithm == "me":
            assert domain == 2, "Only domain = 2 is supported."
        self.domain = domain
        self.algorithm = algorithm

    def criterion(self, reconstruction, target):
        return is_divergence(reconstruction, target, eps=self.eps)

    def update_state(self, state):
        Z = state["target"]
        T, V = state["basis"], state["activation"]
        d, eps = self.domain, self.eps
        exponent = d / (d + 2) if self.algorithm == "mm" else 1.0

        TV = _floor(T @ V, eps)
        division = Z / TV ** ((d + 2) / d)
        TVV = _floor((1 / TV) @ V.T, eps)
        T = T * (division @ V.T / TVV) ** exponent

        TV = _floor(T @ V, eps)
        division = Z / TV ** ((d + 2) / d)
        TTV = _floor(T.T @ (1 / TV), eps)
        V = V * (T.T @ division / TTV) ** exponent

        return {"target": Z, "basis": T, "activation": V}


class TNMF(NMFBase):
    """Student-t NMF with harmonic weighting (``nmf.py:358-428``)."""

    def __init__(self, n_basis=2, nu=1e3, domain=2, algorithm="mm", eps=EPS):
        super().__init__(n_basis=n_basis, eps=eps)
        assert domain == 2, "`domain` is expected 2."
        assert algorithm == "mm", "algorithm must be 'mm'."
        self.nu = nu
        self.domain = domain
        self.algorithm = algorithm

    def criterion(self, reconstruction, target):
        eps, nu = self.eps, self.nu
        _input, _target = reconstruction + eps, target + eps
        return jnp.log(_input) + (2 + nu) / 2 * jnp.log(
            1 + (2 / nu) * (_target / _input)
        )

    def update_state(self, state):
        Z = _floor(state["target"], self.eps)
        T, V = state["basis"], state["activation"]
        nu, eps = self.nu, self.eps

        TV = _floor(T @ V, eps)
        harmonic = 1 / (2 / ((2 + nu) * TV) + nu / ((2 + nu) * Z))
        division = harmonic / TV**2
        TVV = _floor((1 / TV) @ V.T, eps)
        T = T * jnp.sqrt(division @ V.T / TVV)

        TV = _floor(T @ V, eps)
        harmonic = 1 / (2 / ((2 + nu) * TV) + nu / ((2 + nu) * Z))
        division = harmonic / TV**2
        TTV = _floor(T.T @ (1 / TV), eps)
        V = V * jnp.sqrt(T.T @ division / TTV)

        return {"target": state["target"], "basis": T, "activation": V}


class CauchyNMF(NMFBase):
    """Cauchy NMF: naive-multiplicative / mm / me / mm_fast rules
    (``nmf.py:430-595``)."""

    def __init__(self, n_basis=2, domain=2, algorithm="naive-multipricative", eps=EPS):
        super().__init__(n_basis=n_basis, eps=eps)
        assert domain == 2, "Only `domain` = 2 is supported."
        if algorithm not in ("naive-multipricative", "mm", "me", "mm_fast"):
            raise ValueError("Not support {} based update.".format(algorithm))
        self.domain = domain
        self.algorithm = algorithm

    def criterion(self, reconstruction, target):
        eps = self.eps
        _input, _target = reconstruction + eps, target + eps
        numerator = 2 * _target**2 + _input**2
        denominator = 3 * _target**2
        return jnp.log(_target / _input) + (3 / 2) * jnp.log(numerator / denominator)

    def update_state(self, state):
        Z = state["target"]
        T, V = state["basis"], state["activation"]
        eps = self.eps

        if self.algorithm in ("naive-multipricative", "mm"):
            ratio_pow = (lambda r: r) if self.algorithm == "naive-multipricative" else jnp.sqrt

            TV = _floor(T @ V, eps)
            numerator = (1 / TV) @ V.T
            C = _floor(2 * Z + TV**2, eps)
            denominator = _floor(3 * (TV / C) @ V.T, eps)
            T = T * ratio_pow(numerator / denominator)

            TV = _floor(T @ V, eps)
            numerator = T.T @ (1 / TV)
            C = _floor(2 * Z + TV**2, eps)
            denominator = _floor(3 * T.T @ (TV / C), eps)
            V = V * ratio_pow(numerator / denominator)
        elif self.algorithm == "me":
            TV = T @ V
            TV2Z = _floor(TV**2 + Z, eps)
            A = (3 / 4) * (TV / TV2Z) @ V.T
            B = _floor(TV, eps)
            B = (1 / B) @ V.T
            denominator = _floor(A + jnp.sqrt(A**2 + 2 * B * A), eps)
            T = T * (B / denominator)

            TV = T @ V
            TV2Z = _floor(TV**2 + Z, eps)
            A = (3 / 4) * T.T @ (TV / TV2Z)
            B = _floor(TV, eps)
            B = T.T @ (1 / B)
            denominator = _floor(A + jnp.sqrt(A**2 + 2 * B * A), eps)
            V = V * (B / denominator)
        else:  # mm_fast
            TV = T @ V
            C = 2 * Z + TV**2
            CTV = _floor(C * TV, eps)
            ZCTV = Z / CTV
            C = _floor(C, eps)
            numerator = ZCTV @ V.T
            denominator = _floor((TV / C) @ V.T, eps)
            T = T * jnp.sqrt(numerator / denominator)

            TV = T @ V
            C = 2 * Z + TV**2
            CTV = _floor(C * TV, eps)
            ZCTV = Z / CTV
            C = _floor(C, eps)
            numerator = T.T @ ZCTV
            denominator = _floor(T.T @ (TV / C), eps)
            V = V * jnp.sqrt(numerator / denominator)

        return {"target": Z, "basis": T, "activation": V}


class ComplexEUCNMF(IterativeSolver):
    """Complex NMF (Euclidean), with per-(bin, basis, frame) phases and the
    auxiliary split weights ``Beta = TV/ΣTV`` (``nmf.py:597-676``).

    ``T, V, Phi = model(target, iteration=N)`` on a complex spectrogram.
    Documented divergence: the reference's recorded loss reconstructs with the
    raw phase *angles* (``nmf.py:106-109``, a bug); here the loss uses
    ``exp(1j·Phi)`` — the quantity the updates actually minimize.

    TPU layout (round 5): the phase lives in the state as a *unit phasor* in
    real planes (``phase_cos``/``phase_sin``) instead of angles — the
    reference's per-iteration ``exp(1j·Phi)`` / ``angle(Z_bar)`` round trip
    (two transcendental sweeps over the (F, K, T) tensor, ``nmf.py:630,661``)
    becomes one rsqrt normalization of ``Z_bar``; angles are recovered once at
    :meth:`finalize` (``atan2`` is scale-invariant, so this is exact).  The
    ``/Beta`` quotients collapse algebraically (``TV/Beta = ΣTV``):

    * ``Σ_t (V/Beta)·Re = Σ_t V·ΣTV + V·re``  (one GEMM + one contraction)
    * ``Σ_t V²/Beta = (Σ_t V·ΣTV)/T``         (the same GEMM)
    * ``Σ_f (T'/Beta)·Re = Σ_f T'·ΣTV + T'·re``
    * ``Σ_f T'²/Beta = (Σ_f (T'²/T)·ΣTV)/V``

    with ``re = Re(ZX*·e^{iΦ})``, so no ``(F, K, T)`` quotient tensors are
    ever materialized.  Documented divergence: the collapse assumes the
    ``Beta ≥ eps`` / ``ΣTV ≥ eps`` floors are inactive (true away from
    exactly-zero factor entries); guarded divisions keep the degenerate
    direction identical (V → 0 stays 0).  Trajectory-parity-tested against a
    literal NumPy port at float64 (``tests/test_nmf.py``).
    """

    state_fields = ("basis", "activation", "phase")
    invariant_fields = ("target",)
    record_initial_loss = False

    def __init__(self, n_basis=2, regularizer=0.1, p=1, eps=EPS):
        super().__init__(callbacks=None, recordable_loss=True, eps=eps)
        self.n_basis = n_basis
        self.regularizer = regularizer
        self.p = p

    def field_axes(self):
        # the (K, F, T) phasor planes shard with the target; the basis/
        # activation GEMM reductions psum across shards like NMFbase's
        return dict(
            super().field_axes(),
            phase_cos={"bins": 1, "frames": 2},
            phase_sin={"bins": 1, "frames": 2},
        )

    def prepare_state_kwargs(self, target, state_kwargs):
        n_bins, n_frames = target.shape
        if "basis" not in state_kwargs:
            state_kwargs["basis"] = np.random.rand(n_bins, self.n_basis)
        if "activation" not in state_kwargs:
            state_kwargs["activation"] = np.random.rand(self.n_basis, n_frames)
        if "phase" not in state_kwargs:
            # reference draws a random phase then overwrites with the target
            # angle (``nmf.py:94-101``); reproduce both (RNG stream parity)
            np.random.rand(n_bins, self.n_basis, n_frames)
            state_kwargs["phase"] = np.tile(
                np.angle(target)[:, None, :], (1, self.n_basis, 1)
            )
        return state_kwargs

    def init_state(self, target, basis=None, activation=None, phase=None):
        # phasor planes live as (K, F, T): with the basis axis LEADING the
        # tile covers the big (F, T) axes — an (F, K, T) layout pads K = 10
        # into 16 sublanes, a 1.6× HBM tax on every read of every plane
        # (the repo-wide planes rule)
        phase_kft = jnp.transpose(phase, (1, 0, 2))
        return {
            "target": target,
            "basis": basis,
            "activation": activation,
            "phase_cos": jnp.cos(phase_kft),
            "phase_sin": jnp.sin(phase_kft),
        }

    def update_state(self, state):
        Z = state["target"]
        T, V = state["basis"], state["activation"]
        Ure, Uim = state["phase_cos"], state["phase_sin"]  # (K, F, T)
        regularizer, p, eps = self.regularizer, self.p, self.eps

        # ΣTV is a plain GEMM; the (K, F, T) product TV never materializes
        TVsum = jnp.maximum(T @ V, eps)  # (F, T)

        VUre = V[:, None, :] * Ure
        VUim = V[:, None, :] * Uim
        ZXre = Z.real - jnp.einsum("fk,kft->ft", T, VUre)
        ZXim = Z.imag - jnp.einsum("fk,kft->ft", T, VUim)
        # re = Re(ZX* · e^{iΦ}) — the only phase-dependent part of the
        # reference's Re = Re(Z_bar* · e^{iΦ}) = TV + Beta·re
        re = ZXre[None, :, :] * Ure + ZXim[None, :, :] * Uim
        V_bar = jnp.maximum(V, eps)

        # basis: (Σ_t V·ΣTV + V·re) / (Σ_t V·ΣTV / T)
        G_T = TVsum @ V.T  # (F, K)
        R_V = jnp.einsum("kt,kft->fk", V, re)
        T_new = (G_T + R_V) / jnp.maximum(
            G_T / jnp.maximum(T, eps * eps), eps
        )

        # activation (with the updated basis, like the reference)
        G_V = T_new.T @ TVsum  # (K, T)
        R_T = jnp.einsum("fk,kft->kt", T_new, re)
        G3 = (T_new**2 / jnp.maximum(T, eps * eps)).T @ TVsum
        denominator = jnp.maximum(
            G3 / jnp.maximum(V, eps * eps) + regularizer * p * V_bar ** (p - 2),
            eps,
        )
        V = (G_V + R_T) / denominator

        # phase: Z_bar = TV·(U + ZX/ΣTV), and the positive scalar TV cancels
        # in Z_bar/|Z_bar| — so the new phasor normalizes U + ZX/ΣTV
        # directly (no Beta tensor, no Z_bar planes; exact away from the
        # reference's Beta ≥ eps floor, documented above)
        Cre = ZXre / TVsum
        Cim = ZXim / TVsum
        Zbre = Ure + Cre[None, :, :]
        Zbim = Uim + Cim[None, :, :]
        mag = jnp.sqrt(Zbre**2 + Zbim**2)
        safe = mag > 0
        Ure = jnp.where(safe, Zbre / jnp.where(safe, mag, 1), 1.0)
        Uim = jnp.where(safe, Zbim / jnp.where(safe, mag, 1), 0.0)

        T_new = T_new / T_new.sum(axis=0)

        return dict(
            state,
            basis=T_new,
            activation=V,
            phase_cos=Ure,
            phase_sin=Uim,
        )

    def nll(self, state):
        T, V = state["basis"], state["activation"]
        VUre = V[:, None, :] * state["phase_cos"]
        VUim = V[:, None, :] * state["phase_sin"]
        recon_re = jnp.einsum("fk,kft->ft", T, VUre)
        recon_im = jnp.einsum("fk,kft->ft", T, VUim)
        Z = state["target"]
        return ((recon_re - Z.real) ** 2 + (recon_im - Z.imag) ** 2).sum()

    def finalize(self, state):
        phase = jnp.arctan2(state["phase_sin"], state["phase_cos"])
        return state["basis"], state["activation"], jnp.transpose(phase, (1, 0, 2))

    def __call__(self, target, iteration=100, **kwargs):
        return super().__call__(np.asarray(target), iteration=iteration, **kwargs)


class MultichannelISNMF(IterativeSolver):
    """Sawada covariance-domain multichannel IS-NMF (``nmf.py:678-815``).

    ``H, T, V = model(target, iteration=N)`` with ``target`` the observed
    covariance tensor ``(n_bins, n_frames, C, C)``.  Spatial update solves the
    Riccati equation ``A H_new A-like`` system via the PSD closed form
    (:func:`~audio_source_separation_tpu.algorithm.linalg.solve_riccati`).
    """

    state_fields = ("spatial", "basis", "activation")
    record_initial_loss = False
    invariant_fields = ("target_planes", "bin_scale")
    # per-basis spatial Riccati on compact Hermitian planes (C == 2 closed
    # form; falls back to the batched matrix path otherwise) — same lever
    # as MultichannelISNMF.riccati_planes in models/mnmf.py, settled by
    # on-chip A/B (benchmarks/riccati_ab.py, RESULTS.md)
    riccati_planes = True

    def field_axes(self):
        """Shardable axes (see :meth:`IterativeSolver.use_mesh`): per-bin
        updates are independent in bins mode (GSPMD all-reduces the
        activation's cross-bin contraction); in frames mode the basis/
        spatial frame contractions become psums."""
        return {
            "input": {"bins": 0, "frames": 1},  # target (F, T, C, C)
            "target_planes": {"bins": 1, "frames": 2},  # (C², F, T) compact
            "bin_scale": {"bins": 0},  # (F,)
            "spatial": {"bins": 0},  # (F, K, C, C)
            "basis": {"bins": 0},  # (F, K)
            "activation": {"frames": 1},  # (K, T)
        }

    def __init__(self, n_basis=10, normalize=True, eps=EPS):
        super().__init__(callbacks=None, recordable_loss=True, eps=eps)
        self.n_basis = n_basis
        self.normalize = normalize

    def prepare_state_kwargs(self, target, state_kwargs):
        n_bins, n_frames, n_channels, _ = target.shape
        # generated inits match the TARGET's precision (cast AFTER drawing,
        # so float64 seeded parity sees identical values): a complex64
        # target with float64 rand inits would otherwise promote the
        # spatial carry to complex128 under x64 and break the scan carry
        real_dtype = np.zeros(0, dtype=target.dtype).real.dtype
        if "spatial" not in state_kwargs:
            state_kwargs["spatial"] = np.tile(
                np.eye(n_channels, dtype=target.dtype),
                (n_bins, self.n_basis, 1, 1),
            )
        if "basis" not in state_kwargs:
            state_kwargs["basis"] = np.random.rand(n_bins, self.n_basis).astype(
                real_dtype
            )
        if "activation" not in state_kwargs:
            state_kwargs["activation"] = np.random.rand(
                self.n_basis, n_frames
            ).astype(real_dtype)
        return state_kwargs

    def init_state(self, target, spatial=None, basis=None, activation=None):
        # planes layout (tiny channel axes LEADING): a materialized
        # (F, T, C, C) array pads its C = 2-3 minors to the TPU tile at up to
        # ~256x the payload's HBM traffic; all per-iteration statistics below
        # are unrolled full-tile plane passes instead
        C = target.shape[-1]
        # COMPACT Hermitian storage (C² real planes — diagonals first, then
        # (re, im) per off-diagonal c < d): half the HBM traffic of complex
        # (C, C, F, T) planes.  Reads the upper triangle only — the observed
        # covariance is Hermitian by construction (x x^H); a non-Hermitian
        # target's lower triangle is ignored (documented divergence from the
        # reference, which consumed the full tensor).
        _, order = _plane_index(C)
        target_planes = jnp.stack(
            [
                target[..., c, d].real if kind == "re" else target[..., c, d].imag
                for kind, c, d in order
            ]
        )  # (C², F, T) real
        # per-bin power equilibration: real spectrogram covariances span
        # ~24 decades across bins, and the adjugate/Riccati chains overflow
        # float32 on the extremes.  The MU trace ratios, the Riccati solution
        # H, and the IS divergence are all EXACTLY invariant under the joint
        # reparametrization (X, T) → (X/s, T/s) per bin (the eps ridge moves
        # from absolute to bin-relative — a documented divergence from
        # ``nmf.py:678-815``'s float64 regime); :meth:`finalize` restores
        # ``T·s``, so the public fixture is unchanged.
        scale = target_planes[:C].sum(axis=0).mean(axis=-1) / C  # (F,) trace mean
        scale = jnp.maximum(scale, jnp.finfo(scale.dtype).tiny)
        target_planes = target_planes / scale[:, None]
        return {
            "target_planes": target_planes,
            "bin_scale": scale,
            "spatial": spatial,
            "basis": basis / scale[:, None].astype(basis.dtype),
            "activation": activation,
        }

    def _spatial_coeffs(self, state):
        """Compact-plane coefficients of the (Hermitian) spatial templates:
        ``(C², F, K)`` real."""
        H = state["spatial"]  # (F, K, C, C)
        _, order = _plane_index(H.shape[-1])
        return jnp.stack(
            [
                H[:, :, c, d].real if kind == "re" else H[:, :, c, d].imag
                for kind, c, d in order
            ]
        )

    def _pair_weights(self, C, dtype):
        """``tr(A·B) = Σ_p w_p A_p B_p`` for compact Hermitian A, B:
        diagonal planes weigh 1, each off-diagonal (re, im) plane weighs 2."""
        return jnp.concatenate(
            [jnp.ones((C,), dtype), 2.0 * jnp.ones((C * C - C,), dtype)]
        )

    def _xhat_compact(self, state):
        """``X̂ = Σ_k H_k T_k V_k`` as COMPACT Hermitian planes ``(C², F, T)``
        real: the per-plane H-coefficients fold into T (tiny ``(C², F, K)``),
        then ONE real GEMM over k — the complex ``(F, K, T)``
        basis-activation product the stacked path materialized (~77 MB at
        the canonical config, three times per iteration) never exists.
        Barriered: read C²-fold by the adjugate minors."""
        T, V = state["basis"], state["activation"]
        coeffs = self._spatial_coeffs(state)  # (C², F, K)
        TH = coeffs * T[None].astype(coeffs.dtype)
        planes = jnp.einsum("pfk,kt->pft", TH, V.astype(coeffs.dtype))
        return jax.lax.optimization_barrier(planes)

    def _xhat_planes(self, state):
        """Complex planes ``(C, C, F, T)`` view (the nll consumes these)."""
        return expand_hermitian_compact(self._xhat_compact(state))

    def _inv_xhat_compact(self, state):
        # barriers as in MultichannelISNMF._inv_xhat_compact: X̂ is read
        # C²-fold by the adjugate minors and X̂⁻¹ feeds several contractions
        # per call site — without them XLA re-expands the K-sum
        # reconstruction into every consumer
        xh = self._xhat_compact(state)
        inv = inv_hermitian_compact(xh, ridge=self._inv_ridge(xh))
        return jax.lax.optimization_barrier(inv)

    def _inv_ridge(self, xh):
        # dtype-aware SCALE-RELATIVE ridge: per-bin equilibration bounds the
        # cross-bin spread, but within a bin X̂[f, t] still spans the
        # frames' ~20-decade silence-to-loud range, and the absolute 1e-12
        # ridge is ~15 decades below loud frames' scale at float32 — the
        # adjugate determinant a·d − |b|² then cancels to ≤ 0 for
        # near-rank-1 X̂ (roundoff ~eps_machine·tr² swamps the ridge) and
        # the inverse turns inf (observed on sample-song at complex64).
        # 100·eps_machine·tr/C dominates that cancellation noise by 100x
        # and is invisible at float64 fixture scale (2e-14 of the local
        # eigenvalues), so float64 parity tests are unaffected.
        C = int(round(xh.shape[0] ** 0.5))
        tr = sum(xh[c] for c in range(C)) / C  # (F, T) local scale
        return self.eps + 100.0 * jnp.finfo(xh.dtype).eps * tr

    def _mu_operands(self, state):
        """``X̂⁻¹`` and ``X̂⁻¹XX̂⁻¹`` as compact Hermitian planes (both
        barriered — each feeds a GEMM, whose operands materialize)."""
        inv = self._inv_xhat_compact(state)
        XXX = jax.lax.optimization_barrier(
            sandwich_hermitian_compact(inv, state["target_planes"])
        )
        return inv, XXX

    def update_state(self, state):
        # The MU trace ratios ``tr(X̂⁻¹XX̂⁻¹ H_k) / tr(X̂⁻¹ H_k)`` contract
        # per-basis against V (basis stage) or T (activation stage).  Both
        # operands of every trace are Hermitian, so each trace is a
        # pair-weighted dot over compact planes — and the basis/frame
        # contractions reassociate into plane-level GEMMs
        # (``Σ_t P_p[f,t]·V[k,t]`` / ``Σ_{p,f} wc[p,f,k]·P_p[f,t]``) that
        # read each plane ONCE; the per-basis (K, F, T) trace tensors the
        # stacked path materialized (~77 MB each, four per iteration) never
        # exist.
        eps = self.eps
        n_channels = state["spatial"].shape[-1]
        eye = jnp.eye(n_channels, dtype=state["spatial"].dtype)

        # --- basis ---
        H, T, V = state["spatial"], state["basis"], state["activation"]
        w = self._pair_weights(n_channels, T.dtype)
        inv, XXX = self._mu_operands(state)
        wc = self._spatial_coeffs(state) * w[:, None, None]  # (C², F, K)
        Vr = V.astype(T.dtype)
        Mn = jnp.einsum("pft,kt->pfk", XXX, Vr)
        Md = jnp.einsum("pft,kt->pfk", inv, Vr)
        # the numerators/denominators are traces of PSD×PSD products —
        # mathematically ≥ 0, but at float32 the pair-weighted plane sums
        # round slightly NEGATIVE near zero and sqrt(num) NaNs (observed on
        # sample-song at complex64: ONE negative entry killed every bin).
        # Floor at 0 — exact w.r.t. the float64 math.
        num = jnp.maximum((wc * Mn).sum(axis=0), 0.0)  # (F, K)
        den = (wc * Md).sum(axis=0)
        T = T * jnp.sqrt(num / jnp.maximum(den, eps))
        state = dict(state, basis=T)

        # --- activation (X̂ rebuilt with the NEW basis) ---
        inv, XXX = self._mu_operands(state)
        wct = wc * T[None].astype(wc.dtype)  # (C², F, K)
        num = jnp.maximum(jnp.einsum("pfk,pft->kt", wct, XXX), 0.0)
        den = jnp.einsum("pfk,pft->kt", wct, inv)
        V = V * jnp.sqrt(num / jnp.maximum(den, eps))
        state = dict(state, activation=V)

        # --- spatial (Riccati): per-plane frame GEMMs against V, a tiny
        # trailing expansion, and the solve on the small (F, K, C, C) ---
        inv, XXX = self._mu_operands(state)
        Vr = V.astype(T.dtype)

        if self.riccati_planes and n_channels == 2:
            # planes Riccati (round 5, shared with the Sawada BSS solver):
            # the whole A^{-1/2}(A^{1/2}BA^{1/2})^{1/2}A^{-1/2} chain runs
            # on compact Hermitian planes (C², K, F) — F in the tile lanes —
            # so none of its intermediates materializes in the tile-padded
            # (F, K, 2, 2) matrix layout
            def contract_planes(planes):
                # (K, C², F) mul+reduce (fuses), lazy transpose to (C², K, F)
                return jnp.transpose(
                    (Vr[:, None, None, :] * planes[None]).sum(-1), (1, 0, 2)
                )

            A_p = contract_planes(inv)
            Z_p = contract_planes(XXX)
            H_p = hermitian_compact_from_entries(
                lambda c, d: jnp.swapaxes(H[:, :, c, d], 0, 1), n_channels
            )
            B_p = sandwich_hermitian_compact(H_p, Z_p)
            H_p = solve_riccati_hermitian_compact(A_p, B_p)
            diag, off = H_p[:n_channels] + eps, H_p[n_channels:]
            if self.normalize:
                tr = diag.sum(axis=0)
                diag, off = diag / tr, off / tr
            H_new = expand_hermitian_compact(jnp.concatenate([diag, off]))
            return dict(state, spatial=jnp.transpose(H_new, (3, 2, 0, 1)))

        def contract_t(planes):
            small = jnp.einsum("pft,kt->fkp", planes, Vr)  # (F, K, C²)
            return expand_hermitian_compact_trailing(small, n_channels)

        VXXX = contract_t(XXX)
        A = contract_t(inv)
        B = H @ VXXX @ H
        H = solve_riccati(A, B)
        H = H + eps * eye
        if self.normalize:
            H = H / jnp.trace(H, axis1=-2, axis2=-1)[..., None, None]

        return dict(state, spatial=H)

    def nll(self, state):
        """Multichannel IS divergence (``criterion/divergence.py:63-81``
        semantics) in planes layout.  The log-det splits into eigvalsh-floored
        per-operand log-dets (the ``_nll_sawada`` pattern): snapshot
        covariances are rank-1, so ``det(X·X̂⁻¹)`` rounds ≤ 0 at float32 and
        the direct ``log(det)`` NaNs."""
        eps = self.eps
        ridge = jnp.full(state["target_planes"].shape[1:], eps)
        Xp = add_diag_planes(
            expand_hermitian_compact(state["target_planes"]), ridge
        )
        xh_c = self._xhat_compact(state)
        # the model-side inverse needs the scale-relative ridge too (same
        # f32 adjugate cancellation as _inv_xhat_compact)
        Xh = add_diag_planes(
            expand_hermitian_compact(xh_c), self._inv_ridge(xh_c)
        )
        XX = matmul_planes(Xp, inv_planes(Xh))
        trace = trace_planes(XX)
        wX = hermitian_eigvalsh_planes(herm_planes(Xp))
        wH = hermitian_eigvalsh_planes(herm_planes(Xh))
        logdet = (
            jnp.log(jnp.maximum(wX, eps)) - jnp.log(jnp.maximum(wH, eps))
        ).sum(axis=0)
        return (trace - logdet - Xp.shape[0]).sum()

    def finalize(self, state):
        # leave the per-bin equilibration frame (see init_state)
        basis = state["basis"] * state["bin_scale"][:, None].astype(
            state["basis"].dtype
        )
        return state["spatial"], basis, state["activation"]

    def _sync_attributes(self, state_packed):
        # publish/checkpoint the basis in the INPUT frame — ``init_state``
        # re-equilibrates warm-start kwargs, so attributes must round-trip
        host_state = super()._sync_attributes(state_packed)
        if "bin_scale" in host_state and "basis" in host_state:
            s = np.asarray(host_state["bin_scale"])
            self.basis = np.asarray(host_state["basis"]) * s[:, None]
            host_state["basis"] = self.basis
        return host_state

    def __call__(self, target, iteration=100, **kwargs):
        return super().__call__(np.asarray(target), iteration=iteration, **kwargs)
