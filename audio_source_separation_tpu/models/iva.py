"""Independent vector analysis (IVA) solver family.

Parity targets (reference ``src/bss/iva.py``):
  * ``GradLaplaceIVA`` / ``NaturalGradLaplaceIVA`` — gradient / natural-gradient
    descent on the Laplace IVA negative log-likelihood (``iva.py:196-287``);
  * ``AuxLaplaceIVA`` / ``AuxGaussIVA`` — auxiliary-function IVA with spatial
    algorithms IP (``iva.py:481-523``), ISS (``iva.py:525-542``) and
    IP2/pairwise (``iva.py:544-599``);
  * stubs (``SparseAuxIVA``, ``SparseProxIVA``) raise exactly like the
    reference (``iva.py:804-815, 906-916``).

TPU design: state is an explicit pytree ``{input, demix_filter, estimation,
step_count}`` iterated by the scan runtime; the per-bin C×C hot ops live in
:mod:`audio_source_separation_tpu.ops` (weighted covariance without
materializing the ``(F,T,C,C)`` outer-product tensor, batched IP row solves
with a cheap condition guard, ISS rank-1 sweeps, closed-form 2×2 eig for IP2
instead of general complex ``eig`` which is not TPU-native).
"""

import jax.numpy as jnp
import numpy as np

from ..algorithm.projection_back import projection_back
from ..ops.packing import jit_complex, realify, to_host
from ..ops.covariance import weighted_covariance
from ..ops.eig2 import generalized_eig2x2_descending
from ..ops.fast_linalg import batched_log_abs_det
from ..ops.ip import cond_guard, ip_update
from ..ops.iss import iss_sweep
from ..runtime.solver import IterativeSolver
from ..utils.flooring import floor_below

EPS = 1e-12
THRESHOLD = 1e12

__algorithms_spatial__ = ["IP", "IVA", "ISS", "IPA", "pairwise", "IP1", "IP2"]


class IVABase(IterativeSolver):
    """Shared IVA machinery: separation, demixing-filter LS fit, state init.

    Mirrors ``IVAbase`` (``bss/iva.py:22-128``)."""

    state_fields = ("demix_filter", "estimation")
    invariant_fields = ("input", "pair_products")

    def __init__(self, callbacks=None, recordable_loss=True, eps=EPS):
        super().__init__(callbacks=callbacks, recordable_loss=recordable_loss, eps=eps)

    @staticmethod
    def separate(input, demix_filter):
        """``Y = W X`` per bin: ``(C,F,T) × (F,N,C) → (N,F,T)``
        (``bss/iva.py:105-117``).

        For the small channel counts BSS lives at (C ≤ 4) the per-bin matmul
        runs as component sums — ``Σ_c w[n,c,f]·X[c,f,t]`` elementwise over
        ``(F, T)`` — which avoids BOTH 15 MB layout transposes
        ``(C,F,T) ⇄ (F,C,T)`` the matrix form would copy per iteration."""
        n_sources, n_channels = demix_filter.shape[1], demix_filter.shape[2]
        if n_channels <= 4:
            from ..ops.ip_components import separate_components

            rows = [
                [demix_filter[:, s, c] for c in range(n_channels)]
                for s in range(n_sources)
            ]
            return separate_components(rows, input)
        X = jnp.transpose(input, (1, 0, 2))  # (F, C, T)
        Y = demix_filter @ X  # (F, N, T)
        return jnp.transpose(Y, (1, 0, 2))

    @staticmethod
    def compute_demix_filter(estimation, input):
        """LS fit ``W = Y X^H (X X^H)^{-1}`` per bin (``bss/iva.py:119-125``)."""
        X, Y = input, estimation
        X_h = jnp.transpose(X, (1, 2, 0)).conj()  # (F, T, C)
        XXh = jnp.transpose(X, (1, 0, 2)) @ X_h  # (F, C, C)
        YXh = jnp.transpose(Y, (1, 0, 2)) @ X_h  # (F, N, C)
        # W = YXh @ inv(XXh): solve the adjoint system (XXh is Hermitian)
        W = jnp.swapaxes(
            jnp.linalg.solve(XXh, jnp.swapaxes(YXh, -2, -1).conj()), -2, -1
        ).conj()
        return W

    def _default_filter(self, X):
        n_channels, n_bins, _ = X.shape
        W = jnp.eye(n_channels, n_channels, dtype=X.dtype)
        return jnp.tile(W, (n_bins, 1, 1))

    # solvers whose updates accumulate weighted covariances set this to True;
    # the stacked real pair-product planes are then precomputed once per run
    # and every covariance accumulation becomes a single real GEMM over the
    # frame axis (see ops/ip_components.py)
    use_pair_products = False

    def init_state(self, X, demix_filter=None, estimation=None):
        n_channels, n_bins, n_frames = X.shape
        self.n_sources = self.n_channels = n_channels
        self.n_bins, self.n_frames = n_bins, n_frames
        if demix_filter is None:
            demix_filter = self._default_filter(X)
        else:
            demix_filter = jnp.asarray(demix_filter, dtype=X.dtype)
        # the reference always re-derives the estimates from W at reset
        # (``bss/iva.py:59``, ``bss/ilrma.py:77``) — a passed ``estimation``
        # only seeds ISS (which drops W); this keeps the invariant
        # ``estimation == separate(X, demix_filter)`` so updates can reuse it
        if estimation is None or not self._is_iss_like():
            estimation = self.separate(X, demix_filter)
        else:
            estimation = jnp.asarray(estimation, dtype=X.dtype)
        state = {"input": X, "demix_filter": demix_filter, "estimation": estimation}
        if self.use_pair_products:
            from ..ops.ip_components import pair_products_planes

            state["pair_products"] = pair_products_planes(X)
        return state

    def _is_iss_like(self):
        return getattr(self, "algorithm_spatial", None) == "ISS"

    def scan_derived_fields(self):
        """``estimation == separate(input, W)`` is an update invariant for
        every W-carrying mode, so the scan re-derives it instead of carrying
        ~15 MB of estimates whose output-pinned layout pessimizes the loop
        (ISS has no W — there the estimates ARE the state)."""
        if self._is_iss_like():
            return ()
        return ("estimation",)

    def restore_state(self, state):
        if "estimation" in state or self._is_iss_like():
            return state
        X = state["input"]
        if "demix_components" in state:
            from ..ops.ip_components import separate_components

            Wc = state["demix_components"]
            rows = [
                [Wc[s, c] for c in range(Wc.shape[1])]
                for s in range(Wc.shape[0])
            ]
            return dict(state, estimation=separate_components(rows, X))
        return dict(state, estimation=self.separate(X, state["demix_filter"]))

    def field_axes(self):
        """Shardable axes of the IVA-family state (see
        :meth:`IterativeSolver.use_mesh`)."""
        return {
            "input": {"bins": 1, "frames": 2},
            "demix_filter": {"bins": 0},
            "demix_components": {"bins": 2},
            "estimation": {"bins": 1, "frames": 2},
            "pair_products": {"bins": 1, "frames": 2},
        }

    def pad_state_kwarg(self, field, value, pad, axis):
        """Padded bins get IDENTITY demixing rows (zeros would make the
        per-bin log-dets −inf); everything else zero-pads."""
        if field == "demix_filter":
            n, c = value.shape[-2], value.shape[-1]
            eye = np.broadcast_to(np.eye(n, c, dtype=value.dtype), (pad, n, c))
            return np.concatenate([value, eye], axis=0)
        return super().pad_state_kwarg(field, value, pad, axis)

    def _weighted_covariance(self, state, inv_weights):
        planes = state.get("pair_products")
        if planes is not None:
            from ..ops.ip_components import weighted_covariance_planes_array

            return weighted_covariance_planes_array(
                planes, inv_weights, flatten=self._covariance_flatten()
            )
        return weighted_covariance(state["input"], inv_weights)

    def _ip_sweep(self, state, inv_weights):
        """Covariance accumulation + IP row sweep; fully component-layout when
        the guard allows (the (F, C, C) matrix layout pads trailing dims ~256×
        on TPU tiles — see ops/ip_components.py)."""
        W = state["demix_filter"]
        planes = state.get("pair_products")
        if (
            planes is not None
            and self.guard in ("one_norm", "none")
            and W.shape[-1] <= 4
        ):
            from ..ops.ip_components import ip_sweep_from_planes

            return ip_sweep_from_planes(
                W,
                planes,
                inv_weights,
                threshold=self.threshold,
                guard=self.guard,
                flatten=self._covariance_flatten(),
            )
        U = self._weighted_covariance(state, inv_weights)
        return ip_update(W, U, threshold=self.threshold, guard=self.guard)

    def __repr__(self):
        return "IVA()"


class GradIVABase(IVABase):
    """Gradient-descent IVA base (``bss/iva.py:130-194``)."""

    def __init__(
        self,
        lr=1e-1,
        reference_id=0,
        callbacks=None,
        apply_projection_back=True,
        recordable_loss=True,
        eps=EPS,
    ):
        super().__init__(callbacks=callbacks, recordable_loss=recordable_loss, eps=eps)
        self.lr = lr
        self.reference_id = reference_id
        self.apply_projection_back = apply_projection_back

    def finalize(self, state):
        X, W = state["input"], state["demix_filter"]
        output = self.separate(X, W)
        if self.apply_projection_back:
            scale = projection_back(output, reference=X[self.reference_id])
            output = output * scale[..., None]
        return output

    def _score(self, Yb):
        """Laplace score ``Y / sqrt(Σ_f |Y|²)`` on bins-major ``(F, N, T)``."""
        P = jnp.abs(Yb) ** 2
        denominator = floor_below(jnp.sqrt(P.sum(axis=0)), self.eps)
        return Yb / denominator

    def nll(self, state):
        W = state["demix_filter"]
        Y = state["estimation"]  # == separate(X, W) (update invariant)
        P = jnp.sum(jnp.abs(Y) ** 2, axis=1)  # (N, T)
        return (
            2 * jnp.sqrt(P).sum(axis=0).mean()
            - 2 * batched_log_abs_det(W).sum()
        )

    def __repr__(self):
        return "GradIVA(lr={lr})".format(lr=self.lr)


def _grad_component_rows(W):
    n_sources, n_channels = W.shape[1], W.shape[2]
    return [[W[:, s, c] for c in range(n_channels)] for s in range(n_sources)]


def _grad_stack_rows(rows):
    return jnp.stack([jnp.stack(row, axis=-1) for row in rows], axis=1)


class GradLaplaceIVA(GradIVABase):
    """Plain-gradient Laplace IVA: ``ΔW = Φ X^H / T − W^{-H}``
    (``bss/iva.py:196-241``).  Component-layout body for square W with
    C ≤ 4 (see :func:`ops.ip_components.plain_grad_step_components`)."""

    def _score_direct(self, Y):
        """Multivariate Laplace score on estimate-major ``(N, F, T)``."""
        P = jnp.abs(Y) ** 2
        denom = floor_below(jnp.sqrt(P.sum(axis=1)), self.eps)  # (N, T)
        return Y / denom[:, None, :]

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
                _grad_component_rows(W), X, self._score_direct(Y), self.lr
            )
            return dict(
                state,
                demix_filter=_grad_stack_rows(rows),
                estimation=separate_components(rows, X),
            )
        Y = self.separate(X, W)
        X_h = jnp.transpose(X, (1, 2, 0)).conj()  # (F, T, C)
        W_invH = jnp.swapaxes(jnp.linalg.inv(W), -2, -1).conj()
        Phi = self._score(jnp.transpose(Y, (1, 0, 2)))  # (F, N, T)
        delta = (Phi @ X_h) / n_frames - W_invH
        W = W - self.lr * delta
        return dict(
            state, demix_filter=W, estimation=self.separate(X, W)
        )


class NaturalGradLaplaceIVA(GradIVABase):
    """Natural-gradient Laplace IVA: ``ΔW = (Φ Y^H / T − I) W``
    (``bss/iva.py:243-287``); component-layout body like
    :class:`GradLaplaceIVA` (no inverse needed)."""

    def _score_direct(self, Y):
        P = jnp.abs(Y) ** 2
        denom = floor_below(jnp.sqrt(P.sum(axis=1)), self.eps)  # (N, T)
        return Y / denom[:, None, :]

    def update_state(self, state):
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
                _grad_component_rows(W), Y, self._score_direct(Y), self.lr
            )
            return dict(
                state,
                demix_filter=_grad_stack_rows(rows),
                estimation=separate_components(rows, X),
            )
        Y = self.separate(X, W)
        Yb = jnp.transpose(Y, (1, 0, 2))  # (F, N, T)
        Y_h = jnp.swapaxes(Yb, -2, -1).conj()  # (F, T, N)
        eye = jnp.eye(n_channels, dtype=X.dtype)
        Phi = self._score(Yb)
        delta = ((Phi @ Y_h) / n_frames - eye) @ W
        W = W - self.lr * delta
        return dict(
            state, demix_filter=W, estimation=self.separate(X, W)
        )

    def __repr__(self):
        return "NaturalGradIVA(lr={lr})".format(lr=self.lr)


class AuxIVABase(IVABase):
    """Auxiliary-function IVA base (``bss/iva.py:289-386``).

    ``algorithm_spatial``: 'IP'/'IP1' (iterative projection), 'ISS' (rank-1
    source steering, demixing-filter-free), 'IP2'/'pairwise' (pairwise joint
    diagonalization).  'IPA' raises, like the reference (``iva.py:601-602``).
    """

    state_fields = ("demix_filter", "estimation", "step_count")
    use_pair_products = True

    def __init__(
        self,
        algorithm_spatial="IP",
        reference_id=0,
        callbacks=None,
        apply_projection_back=True,
        recordable_loss=True,
        eps=EPS,
        threshold=THRESHOLD,
        guard="one_norm",
        iss_compat=False,
    ):
        super().__init__(callbacks=callbacks, recordable_loss=recordable_loss, eps=eps)
        self.algorithm_spatial = algorithm_spatial
        self.reference_id = reference_id
        self.apply_projection_back = apply_projection_back
        self.threshold = threshold
        self.guard = guard
        # opt-in reference-exact ISS self-steering scale (see ops/iss.py)
        self.iss_compat = iss_compat
        if self.algorithm_spatial not in __algorithms_spatial__:
            raise ValueError(
                "Not support {} based spatial updates.".format(self.algorithm_spatial)
            )

    @property
    def _is_iss(self):
        return self.algorithm_spatial == "ISS"

    # round-4 experiment toggle: when True (and the component/planes guard
    # conditions hold), the scan never materializes the complex estimates —
    # the contrasts' frame weights come from ONE real GEMM over the
    # invariant pair-product planes (ops/ip_components.py::frame_power_sums)
    power_scan = True

    @property
    def _power_only_scan(self):
        return (
            self.power_scan
            and self.algorithm_spatial in ("IP", "IP1", "IVA")
            and self.use_pair_products
            and self.guard in ("one_norm", "none")
            and getattr(self, "n_channels", 99) is not None
            and getattr(self, "n_channels", 99) <= 4
        )

    @property
    def derived_in_carry(self):
        """Measured (round 3, canonical config): carrying the estimates in
        the scan (with the layout-anchoring probe, see
        :meth:`IterativeSolver.scan_probe`) is 2.6× for the component-IP
        scan (8.3k → 22.3k iters/s) and 4.3× for the planes-IP2 scan
        (3.8k → 16.4k), but NEUTRAL-TO-NEGATIVE for ISS (0.76×) and the
        ILRMA/MNMF families (0.87-0.94×) — enabled for IP and IP2/pairwise
        here only.  In the round-4 power-only scan mode the estimates do
        not exist inside the loop at all, so there is nothing to carry."""
        if self._power_only_scan:
            return False
        return self.algorithm_spatial in ("IP", "IP1", "IVA", "IP2", "pairwise")

    def scan_restore_state(self, state):
        if (
            self._power_only_scan
            and "estimation" not in state
            and "pair_products" in state
            and "demix_components" in state
        ):
            return state  # the update reads only the planes + W components
        return self.restore_state(state)

    @property
    def _is_pairwise(self):
        return self.algorithm_spatial in ("pairwise", "IP2")

    def _component_filter_mode(self, n_channels):
        """Whether the scan carries the demixing rows as components
        ``(N, C, F)`` instead of ``(F, N, C)``: the matrix layout's tiny
        trailing dims pad to the (8 × 128) TPU tile, so just carrying W
        through the scan costs ~250× its payload in HBM traffic per
        iteration."""
        return (
            self.algorithm_spatial in ("IP", "IP1", "IVA")
            and self.use_pair_products
            and self.guard in ("one_norm", "none")
            and n_channels <= 4
        )

    def init_state(self, X, demix_filter=None, estimation=None):
        state = super().init_state(X, demix_filter=demix_filter, estimation=estimation)
        if self._is_iss:
            # ISS never materializes W during iterations (``bss/iva.py:356-360``)
            del state["demix_filter"]
        elif self._component_filter_mode(X.shape[0]):
            W = state.pop("demix_filter")
            state["demix_components"] = jnp.transpose(W, (1, 2, 0))
        if self._is_pairwise:
            state["step_count"] = jnp.zeros((), dtype=jnp.int32)
        return state

    def source_weights(self, Y):
        """Per-(source, frame) auxiliary variance ``R`` — contrast-specific."""
        raise NotImplementedError

    def source_weights_from_power_sums(self, psum, n_bins):
        """``source_weights`` restated on the bin-summed powers ``psum =
        Σ_f |Y|² (N, T)`` — the power-only scan's form (both contrasts'
        weights are bin reductions of the power)."""
        raise NotImplementedError

    def _frame_power_sums_state(self, state):
        """``Σ_f |Y|² (N, T)`` from whichever representation the state
        carries (complex estimates in eager mode, planes + components in
        the power-only scan)."""
        if "estimation" in state:
            return jnp.sum(jnp.abs(state["estimation"]) ** 2, axis=1)
        from ..ops.ip_components import frame_power_sums

        Wc = state["demix_components"]
        rows = [
            [Wc[s, c] for c in range(Wc.shape[1])]
            for s in range(Wc.shape[0])
        ]
        return frame_power_sums(rows, state["pair_products"])

    def update_state(self, state):
        if self.algorithm_spatial in ("IP", "IP1", "IVA"):
            return self._update_ip(state)
        if self._is_iss:
            return self._update_iss(state)
        if self._is_pairwise:
            return self._update_pairwise(state)
        raise ValueError(
            "Not support {} based spatial updates.".format(self.algorithm_spatial)
        )

    def _update_ip(self, state):
        X = state["input"]
        if "estimation" not in state and "demix_components" in state:
            # power-only scan: frame weights from one real GEMM over the
            # invariant planes; the complex estimates are never built
            from ..ops.ip_components import (
                frame_power_sums,
                ip_update_components,
                weighted_covariance_components,
            )

            Wc = state["demix_components"]  # (N, C, F)
            n_sources, n_channels = Wc.shape[0], Wc.shape[1]
            W_rows = [
                [Wc[s, c] for c in range(n_channels)] for s in range(n_sources)
            ]
            psum = frame_power_sums(W_rows, state["pair_products"])
            R = floor_below(
                self.source_weights_from_power_sums(psum, X.shape[1]),
                self.eps,
            )
            U = weighted_covariance_components(
                state["pair_products"], 1.0 / R, flatten=self._covariance_flatten()
            )
            W_rows = ip_update_components(
                W_rows, U, threshold=self.threshold, guard=self.guard
            )
            return dict(
                state,
                demix_components=jnp.stack(
                    [jnp.stack(row) for row in W_rows]
                ),
            )
        Y = state["estimation"]
        R = floor_below(self.source_weights(Y), self.eps)  # (N, T)
        if "demix_components" in state:
            # fully component-layout iteration: covariance GEMM → IP row
            # sweep → separation without ever materializing (F, N, C)
            from ..ops.ip_components import (
                ip_update_components,
                separate_components,
                weighted_covariance_components,
            )

            Wc = state["demix_components"]  # (N, C, F)
            n_sources, n_channels = Wc.shape[0], Wc.shape[1]
            W_rows = [
                [Wc[s, c] for c in range(n_channels)] for s in range(n_sources)
            ]
            U = weighted_covariance_components(
                state["pair_products"], 1.0 / R, flatten=self._covariance_flatten()
            )
            W_rows = ip_update_components(
                W_rows, U, threshold=self.threshold, guard=self.guard
            )
            return dict(
                state,
                demix_components=jnp.stack(
                    [jnp.stack(row) for row in W_rows]
                ),
                estimation=separate_components(W_rows, X),
            )
        W = self._ip_sweep(state, 1.0 / R)
        return dict(state, demix_filter=W, estimation=self.separate(X, W))

    def _update_iss(self, state):
        X, Y = state["input"], state["estimation"]
        R = floor_below(self.source_weights(Y), self.eps)
        Y = iss_sweep(Y, 1.0 / R, compat=getattr(self, "iss_compat", False))
        return dict(state, estimation=Y)

    def _update_pairwise(self, state):
        X, W, Y = state["input"], state["demix_filter"], state["estimation"]
        n_sources = Y.shape[0]
        k = state["step_count"]
        m = k % n_sources
        n = (k + 1) % n_sources

        Y_m = jnp.take(Y, m, axis=0)  # (F, T)
        Y_n = jnp.take(Y, n, axis=0)
        R_mn = self.source_weights(jnp.stack([Y_m, Y_n], axis=0))  # (2, T)
        R_mn = floor_below(R_mn, self.eps)

        # planes fast path: the matrix IP2 chain materializes tile-padded
        # (F, C, C)/(F, C, 2) tensors and two batched LU inverses per step
        # (measured 262 iters/s vs >8k for the planes path)
        planes = state.get("pair_products")
        n_channels = W.shape[-1]
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
                state,
                demix_filter=W,
                estimation=self.separate(X, W),
                step_count=k + 1,
            )

        U_mn = self._weighted_covariance(state, 1.0 / R_mn)  # (2, F, C, C)
        U_m, U_n = U_mn[0], U_mn[1]

        n_bins, n_channels = W.shape[0], W.shape[-1]
        eye = jnp.eye(n_channels, dtype=W.dtype)
        E_mn = jnp.stack(
            [jnp.take(eye, m, axis=0), jnp.take(eye, n, axis=0)], axis=-1
        )  # (C, 2)
        E_mn = jnp.broadcast_to(E_mn, (n_bins, n_channels, 2))

        WU_m, WU_n = W @ U_m, W @ U_n
        WU_m_inv, WU_n_inv = jnp.linalg.inv(WU_m), jnp.linalg.inv(WU_n)
        ok_m = cond_guard(WU_m, WU_m_inv, threshold=self.threshold, guard=self.guard)
        ok_n = cond_guard(WU_n, WU_n_inv, threshold=self.threshold, guard=self.guard)

        P_m, P_n = WU_m_inv @ E_mn, WU_n_inv @ E_mn  # (F, C, 2)
        V_m = jnp.swapaxes(P_m, -2, -1).conj() @ U_m @ P_m  # (F, 2, 2)
        V_n = jnp.swapaxes(P_n, -2, -1).conj() @ U_n @ P_n
        v_m, v_n = generalized_eig2x2_descending(V_m, V_n)  # (F, 2) each

        vVv_m = jnp.einsum("fi,fij,fj->f", v_m.conj(), V_m, v_m)
        vVv_n = jnp.einsum("fi,fij,fj->f", v_n.conj(), V_n, v_n)
        v_m = v_m / jnp.sqrt(vVv_m)[:, None]
        v_n = v_n / jnp.sqrt(vVv_n)[:, None]
        w_m = jnp.einsum("fci,fi->fc", P_m, v_m).conj()
        w_n = jnp.einsum("fci,fi->fc", P_n, v_n).conj()

        W = W.at[:, m, :].set(jnp.where(ok_m[:, None], w_m, W[:, m, :]))
        W = W.at[:, n, :].set(jnp.where(ok_n[:, None], w_n, W[:, n, :]))

        return dict(
            state,
            demix_filter=W,
            estimation=self.separate(X, W),
            step_count=k + 1,
        )

    def _materialized_filter(self, state):
        if "demix_components" in state:
            return jnp.transpose(state["demix_components"], (2, 0, 1))
        if "demix_filter" in state:
            return state["demix_filter"]
        return self.compute_demix_filter(state["estimation"], state["input"])

    def _log_abs_det_filter(self, state):
        """``log|det W_f| (F,)`` without materializing the matrix layout in
        component mode."""
        if "demix_components" in state:
            from ..ops.ip_components import det_components

            Wc = state["demix_components"]
            M = [
                [Wc[i, j] for j in range(Wc.shape[1])]
                for i in range(Wc.shape[0])
            ]
            return jnp.log(jnp.abs(det_components(M, Wc.shape[0])))
        return batched_log_abs_det(self._materialized_filter(state))

    def finalize(self, state):
        X = state["input"]
        # estimation == separate(X, demix_filter) is maintained by every update
        Y = state["estimation"]
        if self.apply_projection_back:
            scale = projection_back(Y, reference=X[self.reference_id])
            Y = Y * scale[..., None]
        return Y

    def _sync_attributes(self, state_packed):
        host_state = super()._sync_attributes(state_packed)
        if "demix_components" in host_state:
            # public attribute keeps the reference layout (F, N, C)
            self.demix_filter = np.transpose(
                host_state["demix_components"], (2, 0, 1)
            )
        if self._is_iss:
            # the reference materializes W for callbacks (``bss/iva.py:407-418``)
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
        return "AuxIVA(algorithm_spatial={})".format(self.algorithm_spatial)


class AuxLaplaceIVA(AuxIVABase):
    """AuxIVA with the Laplace (spherical ℓ₂) contrast
    (``bss/iva.py:388-619``)."""

    def source_weights(self, Y):
        P = jnp.abs(Y) ** 2  # (N, F, T)
        return jnp.sqrt(P.sum(axis=1))  # (N, T)

    def source_weights_from_power_sums(self, psum, n_bins):
        return jnp.sqrt(psum)

    def nll(self, state):
        X = state["input"]
        n_frames = X.shape[-1]
        P = self._frame_power_sums_state(state)  # Σ_f |Y|² (N, T)
        R = 2 * jnp.sqrt(P)
        return R.sum() - 2 * n_frames * self._log_abs_det_filter(state).sum()

    def supports_bin_padding(self):
        """Zero bins are exactly neutral for the Laplace-AuxIVA IP paths:
        the frame weights ``R = √(Σ_f |Y_f|²)`` SUM over bins (zeros
        contribute nothing), padded covariances are zero so the
        ill-conditioning guard keeps the identity rows, and the padded
        ``log|det I| = 0`` terms leave the NLL exact.  ISS has no guard
        (its least-squares demix-filter materialization is 0/0 on empty
        bins), so only the IP/IP2 family opts in."""
        return self.algorithm_spatial in ("IP", "IP1", "IP2", "pairwise")

    def __repr__(self):
        return "AuxLaplaceIVA(algorithm_spatial={})".format(self.algorithm_spatial)


class AuxGaussIVA(AuxIVABase):
    """AuxIVA with the time-varying Gaussian contrast
    (``bss/iva.py:621-802``); IP2/IPA raise like the reference
    (``iva.py:777-781``)."""

    def __init__(self, algorithm_spatial="IP", **kwargs):
        super().__init__(algorithm_spatial=algorithm_spatial, **kwargs)

    def source_weights(self, Y):
        P = jnp.abs(Y) ** 2
        return P.mean(axis=1)  # (N, T)

    def source_weights_from_power_sums(self, psum, n_bins):
        return psum / n_bins

    def _update_pairwise(self, state):
        raise NotImplementedError("In progress...")

    def nll(self, state):
        X = state["input"]
        n_bins, n_frames = X.shape[1], X.shape[2]
        psum = self._frame_power_sums_state(state)  # Σ_f |Y|² (N, T)
        R = floor_below(psum / n_bins, self.eps)
        return n_bins * jnp.sum(jnp.log(R)) - 2 * n_frames * (
            self._log_abs_det_filter(state).sum()
        )

    def __repr__(self):
        return "AuxGaussIVA(algorithm_spatial={})".format(self.algorithm_spatial)


class SparseAuxIVA(AuxIVABase):
    """Stub, as in the reference (``bss/iva.py:804-815``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        raise NotImplementedError("in progress")


class OverAuxIVABase(AuxIVABase):
    """Overdetermined AuxIVA base (``bss/iva.py:817-821``)."""

    def __init__(self, algorithm_spatial, n_sources=None, **kwargs):
        super().__init__(algorithm_spatial=algorithm_spatial, **kwargs)
        self.n_sources = n_sources


class OverAuxLaplaceIVA(OverAuxIVABase, AuxLaplaceIVA):
    """Overdetermined Laplace AuxIVA via per-bin PCA reduction.

    The reference's skeleton (``bss/iva.py:823-829``) has no update rules; its
    working overdetermined path is PCA → AuxIVA → projection-back onto the
    unreduced mixture (``bss/iva.py:1092-1102``), which is what this class
    productizes.
    """

    def __call__(self, input, iteration=100, **kwargs):
        from ..transform.pca import pca

        import numpy as np

        input = np.asarray(input)
        n_sources = self.n_sources or input.shape[0]
        if n_sources < input.shape[0]:
            reduced = jit_complex(lambda X: pca(X, n_sources=n_sources))(input)
        else:
            reduced = input
        apply_pb = self.apply_projection_back
        self.apply_projection_back = False
        try:
            Y = super().__call__(reduced, iteration=iteration, **kwargs)
        finally:
            self.apply_projection_back = apply_pb
        if self.apply_projection_back:
            ref = input[self.reference_id]
            Y = jit_complex(
                lambda Y, ref: Y * projection_back(Y, reference=ref)[..., None]
            )(Y, ref)
            self.estimation = Y
        return Y
