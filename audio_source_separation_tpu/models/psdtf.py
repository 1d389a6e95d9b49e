"""Positive-semidefinite tensor factorization (LD-PSDTF).

Parity target: reference ``src/algorithm/psdtf.py:12-176`` — log-det PSDTF on
a full covariance tensor ``target (n_bins, n_bins, n_frames)``: the model is
``X_t ≈ Σ_k H[k, t] · V_k`` with PSD basis matrices ``V_k``.  MM updates:
basis via the Cholesky + matrix-square-root chain (``psdtf.py:120-154``),
activation via the trace-ratio rule (``psdtf.py:156-176``); ``algorithm='em'``
raises like the reference (``psdtf.py:103``).

API: ``V, H = model(target, iteration=N)`` with
``V (n_bins, n_bins, n_basis)``, ``H (n_basis, n_frames)``.

TPU notes: every step is batched Hermitian linalg (``eigh`` / ``cholesky`` /
``inv``) over the basis or frame axis — all TPU-supported; the reference's
eigendecomposition-based matrix sqrt/inverse maps 1:1 onto
:func:`~audio_source_separation_tpu.algorithm.linalg.hermitian_matrix_power`.
"""

import jax.numpy as jnp
import numpy as np

from ..criterion.divergence import logdet_divergence
from ..runtime.solver import IterativeSolver
from ..utils.linalg import to_psd

EPS = 1e-12


class PSDTFBase(IterativeSolver):
    state_fields = ("basis", "activation")
    record_initial_loss = False

    def __init__(self, n_basis=2, normalize=True, eps=EPS):
        super().__init__(callbacks=None, recordable_loss=True, eps=eps)
        self.n_basis = n_basis
        self.normalize = normalize

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

    def init_state(self, target, basis=None, activation=None):
        if self.normalize:
            basis, activation = self._normalize(basis, activation)
        return {"target": target, "basis": basis, "activation": activation}

    def reconstruct(self, state):
        V, H = state["basis"], state["activation"]
        VH = jnp.einsum("ijk,kt->tij", V.astype(jnp.result_type(V, H)), H.astype(jnp.result_type(V, H)))
        return to_psd(VH, eps=self.eps)

    def nll(self, state):
        X = jnp.transpose(state["target"], (2, 0, 1))
        return self.criterion(self.reconstruct(state), X).sum()

    def finalize(self, state):
        return state["basis"], state["activation"]

    def __call__(self, target, iteration=100, **kwargs):
        return super().__call__(np.asarray(target), iteration=iteration, **kwargs)


class LDPSDTF(PSDTFBase):
    """Log-det PSDTF with MM updates (``psdtf.py:88-176``)."""

    def __init__(self, n_basis=2, algorithm="mm", normalize=True, eps=EPS):
        super().__init__(n_basis=n_basis, normalize=normalize, eps=eps)
        if algorithm == "em":
            raise NotImplementedError
        if algorithm != "mm":
            raise ValueError("Not support {} based update.".format(algorithm))
        self.algorithm = algorithm
        self.criterion = logdet_divergence

    def _model_inverse(self, V, H):
        """``Y_t = Σ_k H V`` and its PSD-projected inverse (``psdtf.py:127-131``)."""
        Y = jnp.einsum("kij,kt->tij", V, H.astype(V.dtype))
        Y = to_psd(Y, eps=self.eps)
        inv_Y = jnp.linalg.inv(Y)
        return to_psd(inv_Y, eps=self.eps)

    def update_state(self, state):
        eps = self.eps
        X = jnp.transpose(state["target"], (2, 0, 1))  # (T, B, B)
        V = jnp.transpose(state["basis"], (2, 0, 1))  # (K, B, B)
        H = state["activation"]  # (K, T)

        # --- basis (Cholesky + matrix-sqrt chain, ``psdtf.py:120-154``) ---
        inv_Y = self._model_inverse(V, H)
        YXY = to_psd(inv_Y @ X @ inv_Y, eps=eps)
        Hc = H.astype(V.dtype)
        P = to_psd(jnp.einsum("kt,tij->kij", Hc, inv_Y), eps=eps)
        Q = to_psd(jnp.einsum("kt,tij->kij", Hc, YXY), eps=eps)

        L = jnp.linalg.cholesky(Q)
        if not jnp.iscomplexobj(X):
            L = L.real
        Lh = jnp.swapaxes(L, -2, -1).conj()
        LVPVL = to_psd(Lh @ V @ P @ V @ L, eps=eps)
        w, v = jnp.linalg.eigh(LVPVL)
        w = jnp.sqrt(jnp.maximum(w, 0))
        sqrt_LVPVL = to_psd((v * w[..., None, :]) @ jnp.swapaxes(v, -2, -1).conj(), eps=eps)
        inv_sqrt = jnp.linalg.inv(sqrt_LVPVL)
        V = to_psd(V @ L @ inv_sqrt @ Lh @ V, eps=eps)

        # --- activation (trace-ratio rule, ``psdtf.py:156-176``) ---
        inv_Y = self._model_inverse(V, H)
        inv_YV = inv_Y[None] @ V[:, None]  # (K, T, B, B)
        inv_YX = inv_Y @ X  # (T, B, B)
        num = jnp.einsum("ktij,tji->kt", inv_YV, inv_YX).real
        den = jnp.trace(inv_YV, axis1=-2, axis2=-1).real
        num = jnp.maximum(num, 0)
        den = jnp.maximum(den, eps)
        H = H * jnp.sqrt(num / den)

        basis = jnp.transpose(V, (1, 2, 0))
        if self.normalize:
            basis, H = self._normalize(basis, H)
        return {"target": state["target"], "basis": basis, "activation": H}


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
