"""Nonnegative tensor factorization (3-way CP with nonnegativity).

Parity target: reference ``src/algorithm/ntf.py:8-102`` (``EUCNTF``):
``X[c, f, t] ≈ Σ_k Z[c, k] T[f, k] V[k, t]`` with Euclidean multiplicative
updates.  API: ``Z, T, V = model(target, iteration=N)`` on a nonnegative
``(n_channels, n_bins, n_frames)`` tensor.

TPU notes: each factor's numerator/denominator is a pair of tensor
contractions (``einsum``) that XLA lowers to batched MXU matmuls; the
reference's broadcast-then-sum materializations of ``(N, I, K, J)`` tensors
are avoided entirely.
"""

import jax.numpy as jnp
import numpy as np

from ..runtime.solver import IterativeSolver

EPS = 1e-12


class NTFBase(IterativeSolver):
    state_fields = ("partitioning", "basis", "activation")
    record_initial_loss = False

    def __init__(self, n_basis=2, eps=EPS):
        super().__init__(callbacks=None, recordable_loss=True, eps=eps)
        self.n_basis = n_basis

    def prepare_state_kwargs(self, target, state_kwargs):
        n_channels, n_bins, n_frames = target.shape
        if "partitioning" not in state_kwargs:
            state_kwargs["partitioning"] = np.random.rand(n_channels, self.n_basis)
        if "basis" not in state_kwargs:
            state_kwargs["basis"] = np.random.rand(n_bins, self.n_basis)
        if "activation" not in state_kwargs:
            state_kwargs["activation"] = np.random.rand(self.n_basis, n_frames)
        return state_kwargs

    def init_state(self, target, partitioning=None, basis=None, activation=None):
        return {
            "target": target.real if jnp.iscomplexobj(target) else target,
            "partitioning": partitioning,
            "basis": basis,
            "activation": activation,
        }

    def reconstruct(self, state):
        Z, T, V = state["partitioning"], state["basis"], state["activation"]
        return jnp.einsum("ck,fk,kt->cft", Z, T, V)

    def finalize(self, state):
        return state["partitioning"], state["basis"], state["activation"]

    def __call__(self, target, iteration=100, **kwargs):
        return super().__call__(np.asarray(target), iteration=iteration, **kwargs)


class EUCNTF(NTFBase):
    """Euclidean NTF multiplicative updates (``ntf.py:50-102``)."""

    def update_state(self, state):
        eps = self.eps
        X = state["target"]
        Z, T, V = state["partitioning"], state["basis"], state["activation"]

        # basis: numerator Σ_{c,t} X Z V, denominator Σ_{c,t} X̂ Z V
        X_hat = jnp.einsum("ck,fk,kt->cft", Z, T, V)
        num = jnp.maximum(jnp.einsum("cft,ck,kt->fk", X, Z, V), eps)
        den = jnp.maximum(jnp.einsum("cft,ck,kt->fk", X_hat, Z, V), eps)
        T = T * (num / den)

        X_hat = jnp.einsum("ck,fk,kt->cft", Z, T, V)
        num = jnp.maximum(jnp.einsum("cft,ck,fk->kt", X, Z, T), eps)
        den = jnp.maximum(jnp.einsum("cft,ck,fk->kt", X_hat, Z, T), eps)
        V = V * (num / den)

        X_hat = jnp.einsum("ck,fk,kt->cft", Z, T, V)
        num = jnp.maximum(jnp.einsum("cft,fk,kt->ck", X, T, V), eps)
        den = jnp.maximum(jnp.einsum("cft,fk,kt->ck", X_hat, T, V), eps)
        Z = Z * (num / den)

        return {"target": X, "partitioning": Z, "basis": T, "activation": V}

    def nll(self, state):
        return ((state["target"] - self.reconstruct(state)) ** 2).sum()
