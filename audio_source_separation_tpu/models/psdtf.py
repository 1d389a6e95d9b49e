"""Positive-semidefinite tensor factorization (LD-PSDTF).

Parity target: reference ``src/algorithm/psdtf.py:12-176`` — log-det PSDTF on
a full covariance tensor ``target (n_bins, n_bins, n_frames)``: the model is
``X_t ≈ Σ_k H[k, t] · V_k`` with PSD basis matrices ``V_k``.  MM updates:
basis via the Cholesky + matrix-square-root chain (``psdtf.py:120-154``),
activation via the trace-ratio rule (``psdtf.py:156-176``); ``algorithm='em'``
raises like the reference (``psdtf.py:103``).

API: ``V, H = model(target, iteration=N)`` with
``V (n_bins, n_bins, n_basis)``, ``H (n_basis, n_frames)``.

TPU design (round 5 — the reference chain is decomposition-bound):

* **One ``eigh`` per model inverse.** The reference's
  ``to_PSD(Y) → inv → to_PSD(inv)`` chain (``psdtf.py:129-131``) costs two
  batched ``eigvalsh`` + one LU inverse per call; a single Hermitian
  eigendecomposition yields the PSD shift, the inverse, *and* the
  log-determinant of the same matrix.  ``_eigh_psd``/``_inv_from_eigh``
  reproduce the reference guards exactly in the shared eigenbasis (the
  ``to_PSD`` ridge on the inverse is ``eps·tr(inv)·I`` with ``delta = 0``
  because the reconstructed inverse is PSD by construction).
* **Eigh reuse across the loop.** The loss of iteration *i* and the basis
  step of iteration *i+1* both decompose the same ``Y(V, H)``; the
  decomposition is carried in the state (``y_eigvals``/``y_eigvecs``), so a
  full iteration (basis + activation + loss) costs two batched ``eigh`` on
  ``(T, B, B)`` instead of the reference chain's eight ``eigvalsh`` + three
  LU inverses.
* **PSD-by-construction guards.** ``A M Aᴴ`` products of PSD factors
  (``YXY``, ``P``, ``Q``, ``LVPVL``, the final ``V``) are PSD up to
  roundoff, so the reference's eigenvalue shift is identically zero there;
  the guard reduces to symmetrize + ``eps·trace`` ridge (documented
  divergence: roundoff-level negative eigenvalues are absorbed by the ridge
  instead of an exact shift — parity-tested at float64 against the
  reference, ``tests/test_reference_parity.py::test_ldpsdtf_matches_reference``).
* **Trace reassociation.** The activation numerators/denominators
  ``tr(Y⁻¹ V_k Y⁻¹ X_t)`` / ``tr(Y⁻¹ V_k)`` contract as
  ``einsum("kij,tji->kt")`` against ``Y⁻¹ X Y⁻¹`` / ``Y⁻¹`` — the
  reference's explicit ``(K, T, B, B)`` tensor (``psdtf.py:169``) is never
  materialized.
* Loop invariants (``target`` transpose and its per-frame log-det) are
  computed once at init and closed over the scan body instead of being
  carried.
"""

import jax.numpy as jnp
import numpy as np

from ..criterion.divergence import logdet_divergence
from ..ops.fast_linalg import batched_eigvalsh
from ..runtime.solver import IterativeSolver
from ..utils.linalg import to_psd

EPS = 1e-12


def _sym(X):
    Xt = jnp.swapaxes(X, -2, -1)
    return (X + (Xt.conj() if jnp.iscomplexobj(X) else Xt)) / 2


def _dtype_eps(eps, dtype):
    """Dtype-aware guard strength: the reference's 1e-12 relative ridge is
    BELOW float32 roundoff (machine eps 1.2e-7), so Cholesky/pencil chains
    can see indefinite matrices at f32 — floor the ridge at 100·eps_machine
    (the Ozerov/CovarianceISNMF convention; a no-op at float64)."""
    return max(eps, 100 * float(jnp.finfo(dtype).eps))


def _ridge(X, eps):
    """Symmetrize + ``eps·trace`` identity ridge — the reference ``to_PSD``
    for matrices that are PSD by construction (``delta = 0``)."""
    X = _sym(X)
    n = X.shape[-1]
    trace = jnp.trace(X, axis1=-2, axis2=-1).real
    eps = _dtype_eps(eps, X.dtype)
    return X + (eps * trace)[..., None, None] * jnp.eye(n, dtype=X.dtype)


def _eigh_psd(Y, eps):
    """Eigendecomposition of ``to_PSD(Y)`` (reference ``utils_linalg.py:9-31``).

    Returns ``(w, v)`` with ``w`` the *shifted* eigenvalues: symmetrize,
    shift by the most negative eigenvalue (if any), add the ``eps·trace``
    ridge — all diagonal in the eigenbasis of the symmetrized ``Y``.
    """
    Ys = _sym(Y)
    w, v = jnp.linalg.eigh(Ys)
    delta = jnp.minimum(jnp.min(w, axis=-1), 0)
    trace = jnp.trace(Ys, axis1=-2, axis2=-1).real
    return w + (_dtype_eps(eps, Y.dtype) * trace - delta)[..., None], v


def _inv_from_eigh(w, v, eps):
    """``to_PSD(inv(to_PSD(Y)))`` from the decomposition of ``to_PSD(Y)``
    (reference ``psdtf.py:130-131``): the inverse has eigenvalues ``1/w > 0``
    in the same eigenbasis, so the second guard's shift is zero and its ridge
    is ``eps·Σ(1/w)``."""
    wi = 1 / w
    wi = wi + _dtype_eps(eps, w.dtype) * jnp.sum(wi, axis=-1, keepdims=True)
    vh = jnp.swapaxes(v, -2, -1).conj()
    return _sym((v * wi[..., None, :]) @ vh)


class PSDTFBase(IterativeSolver):
    state_fields = ("basis", "activation")
    invariant_fields = ("target_t", "target_logdet", "frame_scale")
    record_initial_loss = False

    def __init__(self, n_basis=2, normalize=True, eps=EPS):
        super().__init__(callbacks=None, recordable_loss=True, eps=eps)
        self.n_basis = n_basis
        self.normalize = normalize

    def field_axes(self):
        """Shardable axes (see :meth:`IterativeSolver.use_mesh`): frames
        mode is the sequence-parallel analogue — every (T, B, B)-batched op
        is frame-independent; the Σ_t sufficient statistics (P, Q) and the
        NLL reduce over the shard axis, which GSPMD lowers to psums, and the
        B×B pencil/Cholesky/eigh factorizations run replicated.  Bins mode
        does not apply (the tap axes are coupled), so every field replicates
        there."""
        return {
            "input": {"frames": -1},  # target (B, B, T)
            "target_t": {"frames": 0},
            "target_logdet": {"frames": 0},
            "frame_scale": {"frames": 0},
            "activation": {"frames": -1},  # (K, T)
            "y_eigvals": {"frames": 0},  # generic-path carry (T, B)
            "y_eigvecs": {"frames": 0},  # generic-path carry (T, B, B)
        }

    def prepare_state_kwargs(self, target, state_kwargs):
        n_bins = target.shape[0]
        if "basis" not in state_kwargs:
            # diagonal PSD init from uniform draws (``psdtf.py:46-52``)
            V = np.random.rand(self.n_basis, n_bins)
            eye = np.eye(n_bins, dtype=target.dtype)
            V = V[:, :, None] * np.tile(eye, (self.n_basis, 1, 1))
            state_kwargs["basis"] = V.transpose(1, 2, 0)
        if "activation" not in state_kwargs:
            state_kwargs["activation"] = np.random.rand(self.n_basis, target.shape[-1])
        return state_kwargs

    def _normalize(self, V, H):
        trace = jnp.trace(V, axis1=0, axis2=1).real
        return V / trace, H * trace[:, None]

    def _model_eigh(self, basis, activation):
        """Decompose ``to_PSD(Σ_k H_k V_k)`` (the model covariance)."""
        ct = jnp.result_type(basis, activation)
        Y = jnp.einsum(
            "ijk,kt->tij", basis.astype(ct), activation.astype(ct)
        )
        return _eigh_psd(Y, self.eps)

    def _model_carry(self, basis, activation):
        """Carried decomposition of the model covariance (overridable: the
        K = 2 pencil path carries a basis-pencil instead)."""
        y_w, y_v = self._model_eigh(basis, activation)
        return {"y_eigvals": y_w, "y_eigvecs": y_v}

    def init_state(self, target, basis=None, activation=None):
        if self.normalize:
            basis, activation = self._normalize(basis, activation)
        Xt = jnp.transpose(target, (2, 0, 1))
        # per-frame trace equilibration: time-domain Gram frames of real
        # music span the signal's dynamic range, and the Cholesky/pencil
        # chains overflow or go indefinite at float32 on the extremes
        # (the CovarianceISNMF/Ozerov recipe).  The MM updates and the
        # log-det divergence are EXACTLY invariant under the joint per-frame
        # reparametrization (X_t, H_·t) → (X_t/s_t, H_·t/s_t) — the
        # eps ridges/floors move from absolute to frame-relative (documented
        # divergence from the reference's float64 regime; float64 reference
        # parity is unchanged).  :meth:`finalize` restores ``H·s``.
        n = Xt.shape[-1]
        s = jnp.trace(Xt, axis1=-2, axis2=-1).real / n
        s = jnp.maximum(s, jnp.finfo(s.dtype).tiny)
        Xt = Xt / s[:, None, None].astype(Xt.dtype)
        activation = activation / s[None, :].astype(activation.dtype)
        # per-frame log-det of the (fixed) target, floored like the loss
        # (``criterion/divergence.py:83-105``) — loop-invariant
        eig_x = jnp.maximum(
            batched_eigvalsh(_sym(Xt)).real, _dtype_eps(self.eps, Xt.dtype)
        )
        state = {
            "target_t": Xt,
            "target_logdet": jnp.sum(jnp.log(eig_x), axis=-1),
            "frame_scale": s,
            "basis": basis,
            "activation": activation,
        }
        state.update(self._model_carry(basis, activation))
        return state

    def reconstruct(self, state):
        V, H = state["basis"], state["activation"]
        if "frame_scale" in state:  # leave the equilibration frame
            H = H * state["frame_scale"][None, :].astype(H.dtype)
        VH = jnp.einsum("ijk,kt->tij", V.astype(jnp.result_type(V, H)), H.astype(jnp.result_type(V, H)))
        return to_psd(VH, eps=self.eps)

    def nll(self, state):
        """Log-det divergence against the fixed target (``psdtf.py:78-85``),
        evaluated from the carried model decomposition: ``tr(X Y⁻¹)`` via the
        eigenbasis quadratic form, ``log det Y`` from the shifted eigenvalues."""
        w, v = state["y_eigvals"], state["y_eigvecs"]
        X = state["target_t"]
        n = X.shape[-1]
        Xv = X.astype(v.dtype) @ v
        quad = jnp.einsum("tbi,tbi->ti", v.conj(), Xv).real
        trace = jnp.sum(quad / w, axis=-1)
        logdet_y = jnp.sum(
            jnp.log(jnp.maximum(w, _dtype_eps(self.eps, w.dtype))), axis=-1
        )
        return jnp.sum(trace - state["target_logdet"] + logdet_y - n)

    def finalize(self, state):
        # leave the per-frame equilibration frame (see init_state)
        H = state["activation"] * state["frame_scale"][None, :].astype(
            state["activation"].dtype
        )
        return state["basis"], H

    def _sync_attributes(self, state_packed):
        # publish/checkpoint the activation in the INPUT frame —
        # ``init_state`` re-equilibrates warm-start kwargs, so attributes
        # must round-trip
        host_state = super()._sync_attributes(state_packed)
        if "frame_scale" in host_state and "activation" in host_state:
            s = np.asarray(host_state["frame_scale"])
            self.activation = np.asarray(host_state["activation"]) * s[None, :]
            host_state["activation"] = self.activation
        return host_state

    def __call__(self, target, iteration=100, **kwargs):
        return super().__call__(np.asarray(target), iteration=iteration, **kwargs)


class LDPSDTF(PSDTFBase):
    """Log-det PSDTF with MM updates (``psdtf.py:88-176``).

    K = 2 pencil fast path (round 5): for two basis matrices the model
    ``Y_t = H₁ₜV₁ + H₂ₜV₂`` is a matrix PENCIL — one generalized
    eigendecomposition ``GᴴV₁G = I, GᴴV₂G = diag(d)`` (a single B×B
    Cholesky + eigh per iteration) simultaneously diagonalizes EVERY
    frame: ``Y_t = G⁻ᴴ diag(w_t) G⁻¹`` with ``w_t = H₁ₜ + H₂ₜ·d``, so all
    per-frame inverses and log-dets become diagonal ops + batched GEMMs
    and the (T, B, B) batched eigendecomposition disappears entirely (the
    dominant cost on TPU, where eigh is an iterative QDWH kernel: measured
    6.3 iters/s eigh-path vs the reference chain's 2.3 at B = 64).
    The activation trace ratios are diagonal in the updated pencil frame
    (``tr(Y⁻¹V_kY⁻¹X)`` needs only ``diag(GᴴXG)``), and trace
    normalization rescales the pencil exactly (``G√c₁, d·c₁/c₂``) — one
    factorization per iteration serves the basis step, the activation
    step, the carry, and the next loss.
    Documented divergences (float64-parity-tested ≤ reference tolerance):
    the ``to_PSD`` ridges on ``Y``/``Y⁻¹`` (``psdtf.py:129-131``,
    ``eps·trace ≈ 1e-12`` relative) are replaced by an equivalent
    per-frame floor ``w ≥ eps·Σw`` in the pencil frame, and the loss
    floors ``w`` instead of the similarity eigenvalues.
    """

    def __init__(self, n_basis=2, algorithm="mm", normalize=True, eps=EPS):
        super().__init__(n_basis=n_basis, normalize=normalize, eps=eps)
        if algorithm == "em":
            raise NotImplementedError
        if algorithm != "mm":
            raise ValueError("Not support {} based update.".format(algorithm))
        self.algorithm = algorithm
        self.criterion = logdet_divergence

    # ------------------------------------------------------------------ #
    # K = 2 pencil machinery
    # ------------------------------------------------------------------ #
    @property
    def _use_pencil(self):
        return self.n_basis == 2

    def _pencil(self, basis):
        """Generalized eigendecomposition of the basis pencil (V₁, V₂):
        returns ``(G, d, logdet_V1)`` with ``GᴴV₁G = I`` and
        ``GᴴV₂G = diag(d)`` — V₁ is PD (every basis iterate passes through
        the PSD projection + ridge), so Cholesky-whiten then eigh."""
        from jax.scipy.linalg import solve_triangular

        V = jnp.transpose(basis, (2, 0, 1))
        A1, A2 = _sym(V[0]), _sym(V[1])
        L = jnp.linalg.cholesky(A1)
        Z = solve_triangular(L, A2, lower=True)  # L⁻¹A₂
        M = solve_triangular(L, jnp.swapaxes(Z, -2, -1).conj(), lower=True)
        d, Q = jnp.linalg.eigh(_sym(M))
        d = jnp.maximum(d, 0)  # A₂ PSD up to roundoff
        G = solve_triangular(
            jnp.swapaxes(L, -2, -1).conj(), Q, lower=False
        )  # L⁻ᴴQ
        logdet_v1 = 2 * jnp.sum(jnp.log(jnp.diagonal(L).real))
        return G, d, logdet_v1

    def _pencil_w(self, activation, d):
        """Per-frame pencil eigenvalues ``w_t = H₁ₜ + H₂ₜ·d`` with the
        eps·trace floor standing in for the reference's to_PSD ridge."""
        H = activation.real if jnp.iscomplexobj(activation) else activation
        w = H[0][:, None] + H[1][:, None] * d[None, :]
        floor = jnp.maximum(
            _dtype_eps(self.eps, w.dtype) * jnp.sum(w, axis=-1, keepdims=True),
            jnp.finfo(w.dtype).tiny,
        )
        return jnp.maximum(w, floor)

    @staticmethod
    def _pencil_inv(G, w):
        """``Y_t⁻¹ = G diag(1/w_t) Gᴴ`` materialized as (T, B, B)."""
        Gw = G[None, :, :] * (1 / w)[:, None, :].astype(G.dtype)
        return _sym(Gw @ G.conj().T)

    def _update_state_pencil(self, state):
        eps = self.eps
        X = state["target_t"]  # (T, B, B)
        V = jnp.transpose(state["basis"], (2, 0, 1))  # (K, B, B)
        H = state["activation"]  # (K, T)
        Hc = H.astype(V.dtype)
        G, d = state["pencil_G"], state["pencil_d"]

        # --- basis (Cholesky + matrix-sqrt chain, ``psdtf.py:120-154``) ---
        inv_Y = self._pencil_inv(G, self._pencil_w(H, d))
        YXY = _ridge(inv_Y @ X.astype(inv_Y.dtype) @ inv_Y, eps)
        P = _ridge(jnp.einsum("kt,tij->kij", Hc, inv_Y), eps)
        Q = _ridge(jnp.einsum("kt,tij->kij", Hc, YXY), eps)

        L = jnp.linalg.cholesky(Q)
        if not jnp.iscomplexobj(X):
            L = L.real
        Lh = jnp.swapaxes(L, -2, -1).conj()
        LVPVL = _ridge(Lh @ V @ P @ V @ L, eps)
        w, u = jnp.linalg.eigh(LVPVL)
        w = jnp.sqrt(jnp.maximum(w, 0))
        w = w + _dtype_eps(eps, w.dtype) * jnp.sum(w, axis=-1, keepdims=True)
        uh = jnp.swapaxes(u, -2, -1).conj()
        inv_sqrt = (u * (1 / w)[..., None, :]) @ uh
        V = _ridge(V @ L @ inv_sqrt @ Lh @ V, eps)
        basis = jnp.transpose(V, (1, 2, 0))

        # --- activation (trace-ratio rule, ``psdtf.py:156-176``) ---
        # Diagonal in the updated pencil frame: with GᴴV₁G = I, GᴴV₂G = D,
        # Y⁻¹V₁Y⁻¹ = G W⁻² Gᴴ and Y⁻¹V₂Y⁻¹ = G (D·W⁻²) Gᴴ, so
        # ``tr(Y⁻¹V_kY⁻¹X_t)`` needs only ``x̃ = diag(GᴴX_tG)`` and
        # ``tr(Y⁻¹V_k)`` only ``Σ 1/w`` / ``Σ d/w`` — the second per-frame
        # (T, B, B) inverse of the reference chain never materializes.
        G2, d2, ld2 = self._pencil(basis)
        w2 = self._pencil_w(H, d2)  # (T, B)
        XG = X.astype(G2.dtype) @ G2
        xdiag = jnp.einsum("bi,tbi->ti", G2.conj(), XG).real
        r = (xdiag / w2) / w2  # two divisions: w² itself can underflow f32
        num = jnp.stack([jnp.sum(r, axis=-1), jnp.sum(r * d2, axis=-1)])
        den = jnp.stack(
            [jnp.sum(1 / w2, axis=-1), jnp.sum(d2 / w2, axis=-1)]
        )
        num = jnp.maximum(num, 0)
        den = jnp.maximum(den, eps)
        H = H * jnp.sqrt(num / den)

        if self.normalize:
            # trace normalization rescales the pencil EXACTLY — V₁/c₁, V₂/c₂
            # gives G·√c₁, d·c₁/c₂, logdet − B·log c₁ — so the third
            # factorization per iteration collapses to scalar scaling
            c = jnp.trace(V, axis1=-2, axis2=-1).real  # (K,)
            basis = jnp.transpose(V / c[:, None, None], (1, 2, 0))
            H = H * c[:, None]
            Gn = G2 * jnp.sqrt(c[0]).astype(G2.dtype)
            dn = d2 * (c[0] / c[1])
            ldn = ld2 - V.shape[-1] * jnp.log(c[0])
        else:
            Gn, dn, ldn = G2, d2, ld2
        return dict(
            state,
            basis=basis,
            activation=H,
            pencil_G=Gn,
            pencil_d=dn,
            pencil_logdet=ldn,
        )

    def _model_carry(self, basis, activation):
        if not self._use_pencil:
            return super()._model_carry(basis, activation)
        G, d, ld = self._pencil(basis)
        return {"pencil_G": G, "pencil_d": d, "pencil_logdet": ld}

    def nll(self, state):
        if not self._use_pencil:
            return super().nll(state)
        X = state["target_t"]
        n = X.shape[-1]
        G, d, ld = (
            state["pencil_G"],
            state["pencil_d"],
            state["pencil_logdet"],
        )
        w = self._pencil_w(state["activation"], d)  # (T, B)
        # tr(X_t Y_t⁻¹) = Σ_i (GᴴX_tG)_ii / w_ti;  log det Y_t = Σ log w + log det V₁
        XG = X.astype(G.dtype) @ G
        quad = jnp.einsum("bi,tbi->ti", G.conj(), XG).real
        trace = jnp.sum(quad / w, axis=-1)
        logdet_y = jnp.sum(jnp.log(w), axis=-1) + ld
        return jnp.sum(trace - state["target_logdet"] + logdet_y - n)

    def update_state(self, state):
        if self._use_pencil:
            return self._update_state_pencil(state)
        eps = self.eps
        X = state["target_t"]  # (T, B, B)
        V = jnp.transpose(state["basis"], (2, 0, 1))  # (K, B, B)
        H = state["activation"]  # (K, T)
        Hc = H.astype(V.dtype)

        # --- basis (Cholesky + matrix-sqrt chain, ``psdtf.py:120-154``) ---
        # Y(V, H) was decomposed for the previous loss — reuse it.
        inv_Y = _inv_from_eigh(state["y_eigvals"], state["y_eigvecs"], eps)
        YXY = _ridge(inv_Y @ X.astype(inv_Y.dtype) @ inv_Y, eps)
        P = _ridge(jnp.einsum("kt,tij->kij", Hc, inv_Y), eps)
        Q = _ridge(jnp.einsum("kt,tij->kij", Hc, YXY), eps)

        L = jnp.linalg.cholesky(Q)
        if not jnp.iscomplexobj(X):
            L = L.real
        Lh = jnp.swapaxes(L, -2, -1).conj()
        LVPVL = _ridge(Lh @ V @ P @ V @ L, eps)
        w, u = jnp.linalg.eigh(LVPVL)
        w = jnp.sqrt(jnp.maximum(w, 0))
        # to_PSD(√LVPVL) then invert (``psdtf.py:146-149``): the sqrt is PSD
        # by construction, so the guard is the eps·Σw ridge in the basis u
        w = w + _dtype_eps(eps, w.dtype) * jnp.sum(w, axis=-1, keepdims=True)
        uh = jnp.swapaxes(u, -2, -1).conj()
        inv_sqrt = (u * (1 / w)[..., None, :]) @ uh
        V = _ridge(V @ L @ inv_sqrt @ Lh @ V, eps)

        # --- activation (trace-ratio rule, ``psdtf.py:156-176``) ---
        w2, v2 = self._model_eigh(jnp.transpose(V, (1, 2, 0)), H)
        inv_Y = _inv_from_eigh(w2, v2, eps)
        M = inv_Y @ X.astype(inv_Y.dtype) @ inv_Y
        # tr(Y⁻¹ V_k Y⁻¹ X_t) = Σ_ij V_k[i,j]·(Y⁻¹XY⁻¹)_t[j,i]; the
        # reference's (K, T, B, B) intermediate never materializes
        num = jnp.einsum("kij,tji->kt", V, M).real
        den = jnp.einsum("kij,tji->kt", V, inv_Y).real
        num = jnp.maximum(num, 0)
        den = jnp.maximum(den, eps)
        H = H * jnp.sqrt(num / den)

        basis = jnp.transpose(V, (1, 2, 0))
        if self.normalize:
            basis, H = self._normalize(basis, H)
        # decompose the updated model once: next iteration's loss AND its
        # basis step both read it (trace-normalization leaves Y unchanged)
        y_w, y_v = self._model_eigh(basis, H)
        return dict(
            state,
            basis=basis,
            activation=H,
            y_eigvals=y_w,
            y_eigvecs=y_v,
        )


def nonparallel_inv(X, use_cholesky=True):
    """Loop-based per-slice inverse (debugging utility; parity with the
    reference's ``psdtf.py:182-207``).  Production code uses the batched
    ``jnp.linalg.inv`` — this exists to cross-check individual slices."""
    X = np.asarray(X)
    n = X.shape[-1]
    out = np.empty_like(X)
    flat = X.reshape(-1, n, n)
    flat_out = out.reshape(-1, n, n)
    eye = np.eye(n, dtype=X.dtype)
    for idx in range(flat.shape[0]):
        if use_cholesky:
            L = np.linalg.cholesky(flat[idx])
            L_inv = np.linalg.solve(L, eye)
            flat_out[idx] = L_inv.conj().T @ L_inv
        else:
            flat_out[idx] = np.linalg.inv(flat[idx])
    return out
