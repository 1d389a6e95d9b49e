"""Frequency-domain ICA (FDICA) solver family.

Parity targets (reference ``src/bss/fdica.py``):
  * ``GradLaplaceFDICA`` — gradient descent on the per-bin Laplace FDICA NLL
    with score ``Φ = Y/|Y|`` (``fdica.py:203-247``);
  * ``NaturalGradLaplaceFDICA`` — natural gradient ``ΔW = (Φ Y^H/T − I) W``;
    ``is_holonomic=False`` raises like the reference (``fdica.py:283``);
  * greedy permutation alignment after the iteration loop
    (``fdica.py:106-138``) — host-side, see
    :mod:`audio_source_separation_tpu.algorithm.permutation`.
"""

import jax.numpy as jnp
import numpy as np

from ..algorithm.permutation import solve_permutation
from ..ops.fast_linalg import batched_log_abs_det
from ..algorithm.projection_back import projection_back
from ..ops.packing import jit_complex
from ..utils.flooring import floor_below
from .iva import IVABase

EPS = 1e-12


class FDICABase(IVABase):
    """Shared FDICA machinery (``bss/fdica.py:8-150``)."""

    state_fields = ("demix_filter", "estimation")

    def nll(self, state):
        """Per-bin Laplace NLL: ``Σ_f (2 Σ_n mean_t |Y| − 2 log|det W_f|)``
        (``fdica.py:241-247``)."""
        W = state["demix_filter"]
        Y = state["estimation"]  # == separate(X, W) (update invariant)
        loss = 2 * jnp.abs(Y).sum(axis=0).mean(axis=1) - 2 * batched_log_abs_det(W)
        return loss.sum()

    def _score(self, Yb):
        """Laplace score ``Y / |Y|`` on bins-major ``(F, N, T)``."""
        denominator = floor_below(jnp.abs(Yb), self.eps)
        return Yb / denominator

    def __repr__(self):
        return "FDICA()"


class GradFDICABase(FDICABase):
    def __init__(
        self,
        lr=1e-1,
        reference_id=0,
        callbacks=None,
        recordable_loss=True,
        eps=EPS,
    ):
        super().__init__(callbacks=callbacks, recordable_loss=recordable_loss, eps=eps)
        self.lr = lr
        self.reference_id = reference_id

    def finalize(self, state):
        # device part only; permutation alignment happens host-side in
        # _run_finalize (sequential greedy algorithm)
        X, W = state["input"], state["demix_filter"]
        Y = self.separate(X, W)
        scale = projection_back(Y, reference=X[self.reference_id])
        return Y * scale[..., None]

    def _run_finalize(self, state):
        from ..ops.packing import to_host

        host = to_host(state)
        W = solve_permutation(host["demix_filter"], host["estimation"], eps=self.eps)
        self.demix_filter = W

        def device_finalize(X, W):
            Y = self.separate(X, W)
            scale = projection_back(Y, reference=X[self.reference_id])
            return Y * scale[..., None]

        output = jit_complex(device_finalize)(host["input"], W)
        return output

    def __repr__(self):
        return "GradFDICA(lr={})".format(self.lr)


def _component_rows(W):
    n_sources, n_channels = W.shape[1], W.shape[2]
    return [[W[:, s, c] for c in range(n_channels)] for s in range(n_sources)]


def _stack_rows(rows):
    return jnp.stack([jnp.stack(row, axis=-1) for row in rows], axis=1)


class GradLaplaceFDICA(GradFDICABase):
    """Plain-gradient Laplace FDICA (``fdica.py:203-247``).

    Component-layout body for square W with C ≤ 4 (the transposes and the
    tile-padded (F, C, C) delta of the matrix formulation dominated its
    runtime — see :func:`ops.ip_components.natural_grad_step_components`);
    matrix fallback otherwise.
    """

    def _score_direct(self, Y):
        """Laplace score on estimate-major ``(N, F, T)``."""
        return Y / floor_below(jnp.abs(Y), self.eps)

    def update_state(self, state):
        X, W = state["input"], state["demix_filter"]
        n_frames = X.shape[-1]
        if W.shape[1] == W.shape[2] and W.shape[1] <= 4:
            from ..ops.ip_components import (
                plain_grad_step_components,
                separate_components,
            )

            Y = state["estimation"]  # == separate(X, W) (update invariant)
            rows = plain_grad_step_components(
                _component_rows(W), X, self._score_direct(Y), self.lr
            )
            return dict(
                state,
                demix_filter=_stack_rows(rows),
                estimation=separate_components(rows, X),
            )
        Y = self.separate(X, W)
        X_h = jnp.transpose(X, (1, 2, 0)).conj()
        W_invH = jnp.swapaxes(jnp.linalg.inv(W), -2, -1).conj()
        Phi = self._score(jnp.transpose(Y, (1, 0, 2)))
        delta = (Phi @ X_h) / n_frames - W_invH
        W = W - self.lr * delta
        return dict(
            state, demix_filter=W, estimation=self.separate(X, W)
        )


class NaturalGradLaplaceFDICA(GradFDICABase):
    """Natural-gradient Laplace FDICA (``fdica.py:249-301``); component-
    layout body like :class:`GradLaplaceFDICA` (no inverse needed)."""

    def __init__(self, lr=1e-1, reference_id=0, is_holonomic=True, **kwargs):
        super().__init__(lr=lr, reference_id=reference_id, **kwargs)
        self.is_holonomic = is_holonomic

    def _score_direct(self, Y):
        return Y / floor_below(jnp.abs(Y), self.eps)

    def update_state(self, state):
        if not self.is_holonomic:
            raise NotImplementedError("only suports for is_holonomic = True")
        X, W = state["input"], state["demix_filter"]
        n_channels = X.shape[0]
        n_frames = X.shape[-1]
        if W.shape[1] == W.shape[2] and W.shape[1] <= 4:
            from ..ops.ip_components import (
                natural_grad_step_components,
                separate_components,
            )

            Y = state["estimation"]  # == separate(X, W) (update invariant)
            rows = natural_grad_step_components(
                _component_rows(W), Y, self._score_direct(Y), self.lr
            )
            return dict(
                state,
                demix_filter=_stack_rows(rows),
                estimation=separate_components(rows, X),
            )
        Y = self.separate(X, W)
        Yb = jnp.transpose(Y, (1, 0, 2))
        Y_h = jnp.swapaxes(Yb, -2, -1).conj()
        eye = jnp.eye(n_channels, dtype=X.dtype)
        Phi = self._score(Yb)
        delta = ((Phi @ Y_h) / n_frames - eye) @ W
        W = W - self.lr * delta
        return dict(
            state, demix_filter=W, estimation=self.separate(X, W)
        )

    def __repr__(self):
        return "NaturalGradLaplaceFDICA(lr={}, is_holonomic={})".format(
            self.lr, self.is_holonomic
        )
