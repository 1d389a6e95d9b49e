"""Independent positive semidefinite tensor analysis (IPSDTA).

Parity targets (reference ``src/bss/ipsdta.py``):
  * ``GaussIPSDTA`` (``ipsdta.py:155-1081``) — block-diagonal
    frequency-covariance source model: bins partitioned into ``n_blocks``
    blocks; basis = per-(source, basis, block) PSD matrices.  Two author
    modes (``ipsdta.py:165-196``): **Ikeshita** = EM source update
    (``:365-508``) + fixed-point spatial update with the auxiliary ``Lambda``
    (``:690-818``); **Kondo** = MM source update with matrix-square-root
    chains ``U ← U S^{1/2}(S^{1/2} U T U S^{1/2})^{-1/2} S^{1/2} U``
    (``:510-623``) + VCD (vector-wise coordinate descent) spatial update with
    the ``η/η̂`` root formula (``:820-975``); trace normalization
    (``:977-1005``); NLL with block log-dets via ``eigvalsh`` (``:1015-1081``).
  * ``tIPSDTA`` (``ipsdta.py:1083-1899``) — Student-t variant (Kondo MM+VCD
    only) with the posterior weight ``π = (ν+2F)/(ν + 2·y^H R^{-1} y)``.

TPU design decisions (documented divergences are representational only —
the math is the same):
  * the reference's dual low/high block code paths become ONE uniform padded
    block layout with masking (:class:`~audio_source_separation_tpu.ops.blocks.BlockLayout`);
    basis is exposed as a single padded array
    ``(n_sources, n_blocks, block_size, block_size, n_basis)``;
  * the reference materializes six-dimensional
    ``(S, K, T, blocks, B, B)`` intermediates (``ipsdta.py:385-386``); here
    every EM/MM statistic is re-expressed as an einsum over the posterior
    quantities ``z = R^{-1} y`` — closed forms
    ``U_new = U A U + U`` with ``A = mean_t V (z z^H − R^{-1})`` for the EM
    basis step, and ``tr(U^{-1}Φ) = V² z^H U z + V·B − V² tr(R^{-1}U)`` for
    the EM activation step — which are algebraically identical to the
    reference's updates but never build the rank-6 tensor;
  * matrix square roots / inverse square roots go through Hermitian ``eigh``
    with the reference's clip-at-zero + ``to_PSD`` guard chain.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..algorithm.projection_back import projection_back
from ..ops.blocks import BlockLayout
from ..ops.fast_linalg import (
    add_diag_hermitian_compact,
    add_diag_planes,
    batched_eigvalsh,
    batched_inv,
    batched_log_abs_det,
    compact_entry,
    expand_hermitian_compact_trailing,
    hermitian_compact_from_entries,
    inv_hermitian_compact,
    inv_planes,
    matmul_planes,
    matmul_small,
    psd_inv_hermitian_compact,
    psd_inv_planes,
    psd_parts_hermitian_compact,
    psd_parts_planes,
    square_hermitian_compact,
    trace_hermitian_compact,
)
from ..ops.ip_components import (
    _plane_index,
    det_components,
    solve_column_components,
)
from ..utils.flooring import floor_below
from ..utils.linalg import to_psd
from .iva import IVABase

EPS = 1e-12

__authors_ipsdta__ = ["ikeshita", "kondo"]

__kwargs_ikeshita_ipsdta__ = {"n_blocks": 1024, "spatial_iteration": 1}
__kwargs_kondo_ipsdta__ = {"n_blocks": 1024, "spatial_iteration": 10}


# --------------------------------------------------------------------------- #
# fused spectral helpers — ONE eigh supplying whole to_PSD/inv/sqrt chains.
#
# The reference guards every block matrix with to_PSD (eigvalsh + scalar shift,
# ``utils/utils_linalg.py:9-31``) and then separately inverts / square-roots /
# eig-decomposes the SAME matrix (``bss/ipsdta.py:536-621``).  Since to_PSD's
# shift is a scalar multiple of the identity, the eigenbasis is shared by the
# whole chain: one eigh yields to_PSD(M), to_PSD(inv(...)), and the matrix
# square root with *identical* semantics — cutting the per-iteration count of
# eigendecompositions on ``(S, T|K, n_blocks, B, B)`` tensors by ~4×.
# --------------------------------------------------------------------------- #
def _herm(M):
    return (M + jnp.swapaxes(M, -2, -1).conj()) / 2


def _spectral(v, w):
    """``v · diag(w) · v^H`` (w real)."""
    return (v * w[..., None, :].astype(v.dtype)) @ jnp.swapaxes(v, -2, -1).conj()


def _psd_parts(M, eps=EPS):
    """``(R, wR)`` with ``R = to_psd(M, eps)`` (exact reference semantics:
    hermitize + ``(eps·tr − min(min_eig, 0))·I``) and ``wR`` its eigenvalues.
    Eigenvalues come from the closed forms (``ops/fast_linalg``) for the
    B ≤ 3 block sizes — no iterative eigensolver on the hot
    ``(S, T, n_blocks, B, B)`` tensors."""
    H = _herm(M)
    w = batched_eigvalsh(H)
    delta = jnp.minimum(jnp.min(w, axis=-1), 0)
    trace = jnp.trace(H, axis1=-2, axis2=-1).real
    shift = eps * trace - delta
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)
    return H + shift[..., None, None] * eye, w + shift[..., None]


def _psd_inv(R, eps=EPS, psd=True):
    """``inv(R)`` of a (to_psd-projected, hence invertible) block matrix via
    the closed-form adjugate (B ≤ 3); ``psd=True`` applies the reference's
    trailing ``to_psd(inv(R))`` — R's eigenvalues are positive, so the
    inverse's are too and the shift reduces to the ``eps·tr`` ridge."""
    inv = batched_inv(R)
    if psd:
        inv = _herm(inv)
        ridge = eps * jnp.trace(inv, axis1=-2, axis2=-1).real
        eye = jnp.eye(inv.shape[-1], dtype=inv.dtype)
        inv = inv + ridge[..., None, None] * eye
    return inv


# --------------------------------------------------------------------------- #
# planes-layout duals of the PSD chain: block-matrix axes LEAD
# (``P (B, B, ...batch)``), so every entry is a fully-tiled plane over
# (frames, blocks) and no array with a tiny minor dimension ever crosses a
# fusion boundary (the matrix layout pads B ≤ 3 minors to the 8×128 tile —
# up to ~100× the HBM traffic of the payload).  Shared closed forms live in
# ``ops/fast_linalg`` (same math as the matrix versions, entry-by-entry).
# --------------------------------------------------------------------------- #
_psd_parts_planes = psd_parts_planes
_psd_inv_planes = psd_inv_planes


def _to_psd_planes(P, eps=EPS):
    projected, _ = psd_parts_planes(P, eps=eps)
    return projected


def _psd_ridge(S, eps=EPS):
    """``to_psd`` of an already-PSD matrix: the min-eigenvalue delta is 0, so
    the shift reduces to the ``eps·trace`` identity ridge."""
    S = _herm(S)
    ridge = eps * jnp.trace(S, axis1=-2, axis2=-1).real
    eye = jnp.eye(S.shape[-1], dtype=S.dtype)
    return S + ridge[..., None, None] * eye


def _psd_sqrt_fused(M, eps=EPS):
    """``_psd_sqrt(to_psd(M, eps))`` with ONE eigh (the to_psd shift is
    scalar·I, so the eigenbasis is shared)."""
    H = _herm(M)
    w, v = jnp.linalg.eigh(H)
    delta = jnp.minimum(jnp.min(w, axis=-1), 0)
    trace = jnp.trace(H, axis1=-2, axis2=-1).real
    shift = eps * trace - delta
    sw = jnp.sqrt(jnp.maximum(w + shift[..., None], 0))
    return _psd_ridge(_spectral(v, sw), eps=eps)


def _sqrt_and_invsqrt_after_psd(C, pad_diag, eps=EPS):
    """The reference's sqrt chain tail (``ipsdta.py:585-621``) fused into one
    eigh: given ``C`` (zero padded rows/cols), computes

      ``E = pad_identity(to_psd(C, eps))``, ``sqrt_E = to_psd(E^{1/2})`` and
      ``inv_sqrt_E = to_psd(inv(sqrt_E))``

    returning ``(sqrt_E, inv_sqrt_E)``.  The eigh runs on
    ``herm(C) + pad_diag``; since C's padded rows/cols are zero, the to_psd
    delta/trace of herm(C) are recovered exactly from that decomposition
    (padded slots contribute eigenvalue 1 > 0 and trace ``n_pad``).
    """
    H = _herm(C)
    n_pad = jnp.trace(pad_diag, axis1=-2, axis2=-1).real
    Hp = H + pad_diag
    w, v = jnp.linalg.eigh(Hp)
    delta = jnp.minimum(jnp.min(w, axis=-1), 0)
    trace = jnp.trace(Hp, axis1=-2, axis2=-1).real - n_pad
    shift = eps * trace - delta
    wE = w + shift[..., None]

    sw = jnp.sqrt(jnp.maximum(wE, 0))
    ridge1 = eps * sw.sum(axis=-1)
    eye = jnp.eye(C.shape[-1], dtype=C.dtype)
    sqrt_E = _herm(_spectral(v, sw)) + ridge1[..., None, None] * eye

    iw = 1.0 / (sw + ridge1[..., None])
    ridge2 = eps * iw.sum(axis=-1)
    inv_sqrt_E = _herm(_spectral(v, iw)) + ridge2[..., None, None] * eye
    return sqrt_E, inv_sqrt_E


def _f32_matmuls(fn):
    """Force float32 matmul/einsum multiplies inside a traced stage.

    TPU's DEFAULT matmul precision (bfloat16 multiplies) destabilizes the
    block-PSD chains — the covariances assembled from reduced-precision
    contractions go indefinite, their adjugate inverses blow up, and the
    solver NaNs within one iteration (measured on hardware; CPU float32 is
    fine).  IPSDTA's contractions are memory-bound, so full-precision
    multiplies cost nothing."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


class IPSDTABase(IVABase):
    """Shared IPSDTA machinery (``bss/ipsdta.py:22-153``)."""

    state_fields = (
        "demix_filter",
        "estimation",
        "basis",
        "activation",
        "fixed_point",
    )

    def field_axes(self):
        """Shardable axes of the IPSDTA state (see
        :meth:`IterativeSolver.use_mesh`).

        IPSDTA is the one family where the block model COUPLES neighboring
        bins (``bss/ipsdta.py:269-273``): every update works on whole
        ``(block, B, B)`` covariances.  Bin sharding therefore happens at
        BLOCK granularity — the basis shards along its block axis, the
        bin-axis fields along bins, and :meth:`_validate_mesh` requires the
        block partition to align with the shards (uniform blocks, block
        count divisible by the mesh axis) so every device owns whole blocks
        and the blocked gathers stay shard-local.  In frames mode everything
        per-frame shards and the ``Σ_t`` statistics become psums; the
        activations ``(S, K, T)`` shard along frames.
        """
        return {
            "input": {"bins": 1, "frames": 2},
            "demix_filter": {"bins": 0},
            "estimation": {"bins": 1, "frames": 2},
            "basis": {"bins": 1},  # (S, n_blocks, B, B, K): block axis
            "activation": {"frames": -1},  # (S, K, T)
            "fixed_point": {"bins": -1},  # (S, n_bins)
        }

    def _validate_mesh(self, input):
        if self._shard_mode != "bins":
            return
        n_bins = input.shape[1]
        layout = self._layout(n_bins)
        n_dev = self._mesh.shape[self._shard_axis_name]
        if layout.n_remains != 0 or layout.n_blocks % n_dev != 0:
            raise ValueError(
                "use_mesh(mode='bins'): IPSDTA blocks couple bins, so bin "
                "shards must align with whole blocks — requires a uniform "
                "block partition (n_bins % n_blocks == 0; here {} % {} = {}) "
                "and n_blocks divisible by the {}-way mesh axis (here "
                "{} % {} = {}).  Use mode='frames' or adjust "
                "n_blocks/the STFT size.".format(
                    n_bins,
                    layout.n_blocks,
                    layout.n_remains,
                    n_dev,
                    layout.n_blocks,
                    n_dev,
                    layout.n_blocks % n_dev,
                )
            )

    def __init__(
        self,
        n_basis=10,
        normalize=True,
        callbacks=None,
        reference_id=0,
        recordable_loss=True,
        eps=EPS,
    ):
        super().__init__(callbacks=callbacks, recordable_loss=recordable_loss, eps=eps)
        self.n_basis = n_basis
        self.normalize = normalize
        self.reference_id = reference_id
        # planes-layout source/fixed-point steps (bit-parity tested toggle;
        # applies when block_size ≤ 3).  Round 4 gated this OFF on the
        # compiled-body cost model (planes ~double modeled bytes); the
        # round-5 on-chip A/B (benchmarks/planes_ab.py, PLANES_AB.json)
        # measured planes FASTER for every author at the canonical
        # 1024-block geometry — Kondo 82.5 → 114.3 iters/s (1.39×),
        # Ikeshita 73.3 → 94.9 (1.29×), tIPSDTA 69.8 → 74.9 (1.07×) —
        # another cost-model-lies datum (it cannot see tile-padding and
        # layout-copy costs of the (B, B)-minor batched dots).  Default ON.
        self.source_planes = True
        # K = 2 matrix-pencil source streams (round 5) — flipped per class
        # after the on-chip A/B; see ``_update_source_mm_pencil``
        self.source_pencil = False
        # compact-Hermitian planes source/spatial/nll streams (round 5):
        # R, R⁻¹, R⁻² and every trace contraction on B² REAL planes (half
        # the streamed bytes of the complex planes path, real GEMMs instead
        # of complex), the whole chain batched over sources — see
        # ``_update_source_mm_compact``.  Bit-parity-tested toggle; default
        # ON, settled by the on-chip A/B (benchmarks/compact_ab.py,
        # COMPACT_AB.json: Kondo 108→186/171 = 1.6×, Ikeshita 1.2×,
        # tIPSDTA 1.4× at the canonical 1024-block geometry).
        self.source_compact = True


class GaussIPSDTA(IPSDTABase):
    """Gaussian IPSDTA (``bss/ipsdta.py:155-1081``)."""

    def __init__(
        self,
        n_basis=10,
        spatial_iteration=None,
        normalize=True,
        callbacks=None,
        reference_id=0,
        author="Kondo",
        recordable_loss=True,
        eps=EPS,
        **kwargs,
    ):
        super().__init__(
            n_basis=n_basis,
            normalize=normalize,
            callbacks=callbacks,
            reference_id=reference_id,
            recordable_loss=recordable_loss,
            eps=eps,
        )
        self.author = author
        if author.lower() == "ikeshita":
            defaults = __kwargs_ikeshita_ipsdta__
            self.algorithm_source = "em"
            self.algorithm_spatial = "fixed-point"
        elif author.lower() == "kondo":
            defaults = __kwargs_kondo_ipsdta__
            self.algorithm_source = "mm"
            self.algorithm_spatial = "vcd"
        else:
            raise ValueError("Not support {}'s IPSDTA".format(author))
        if set(kwargs) - set(defaults):
            raise ValueError("Invalid keywords.")
        for key, value in defaults.items():
            setattr(self, key, value)
        for key, value in kwargs.items():
            setattr(self, key, value)
        if spatial_iteration is not None:
            self.spatial_iteration = spatial_iteration

    # ------------------------------------------------------------------ #
    # init
    # ------------------------------------------------------------------ #
    def _layout(self, n_bins):
        layout = getattr(self, "_cached_layout", None)
        if layout is None or layout.n_bins != n_bins:
            n_blocks = min(self.n_blocks, n_bins)
            layout = BlockLayout(n_bins, n_blocks)
            self._cached_layout = layout
        return layout

    def prepare_state_kwargs(self, input, state_kwargs):
        n_channels, n_bins, n_frames = input.shape
        n_sources = n_channels
        layout = self._layout(n_bins)
        K, B = self.n_basis, layout.block_size
        r = layout.n_remains
        s = layout.n_neighbors
        nb = layout.n_blocks

        if "basis" not in state_kwargs:
            # diagonal random PSD blocks, reference draw order (low then high,
            # ``ipsdta.py:275-290``), packed into the uniform padded layout
            U = np.zeros((n_sources, K, nb, B, B))
            if r > 0:
                low = np.random.rand(n_sources, K, nb - r, s)
                high = np.random.rand(n_sources, K, r, s + 1)
                for j in range(s):
                    U[:, :, : nb - r, j, j] = low[..., j]
                for j in range(s + 1):
                    U[:, :, nb - r :, j, j] = high[..., j]
            else:
                diag = np.random.rand(n_sources, K, nb, s)
                for j in range(s):
                    U[:, :, :, j, j] = diag[..., j]
            # public layout: (n_sources, n_blocks, B, B, n_basis)
            state_kwargs["basis"] = U.transpose(0, 2, 3, 4, 1).astype(input.dtype)
        if "activation" not in state_kwargs:
            state_kwargs["activation"] = np.random.rand(n_sources, K, n_frames)
        if self.algorithm_spatial == "fixed-point" and "fixed_point" not in state_kwargs:
            state_kwargs["fixed_point"] = np.ones(
                (n_sources, n_bins), dtype=input.dtype
            )
        return state_kwargs

    @_f32_matmuls
    def init_state(self, X, demix_filter=None, estimation=None, basis=None,
                   activation=None, fixed_point=None):
        state = super().init_state(X, demix_filter=demix_filter, estimation=estimation)
        state["basis"] = basis
        state["activation"] = activation
        if fixed_point is not None:
            state["fixed_point"] = fixed_point
        if self.normalize:
            state = self._normalize_psdtf(state)
        return state

    # ------------------------------------------------------------------ #
    # shared block quantities
    # ------------------------------------------------------------------ #
    def _U_kmajor(self, state):
        """basis in compute layout ``(S, K, n_blocks, B, B)``."""
        return jnp.transpose(state["basis"], (0, 4, 1, 2, 3))

    def _R_blocks_parts(self, U, V, layout):
        """``R = Σ_k U_k V_kt → (S, T, n_blocks, B, B)``, to_psd-projected on
        the identity-padded blocks, plus its eigenvalues (``(R, wR)``, closed
        forms for B ≤ 3) so log-dets come for free."""
        R = jnp.einsum("skbij,skt->stbij", U, V.astype(U.dtype))
        return _psd_parts(layout.pad_identity(R), eps=self.eps)

    def _y_blocks(self, Y, layout):
        """estimates ``(S, F, T) → (S, T, n_blocks, B)`` zero-padded."""
        Yt = jnp.transpose(Y, (0, 2, 1))  # (S, T, F)
        return layout.gather(Yt)

    # ------------------------------------------------------------------ #
    # source model — EM (Ikeshita, ``ipsdta.py:365-508``)
    # ------------------------------------------------------------------ #
    def _update_source_em(self, state, layout):
        eps = self.eps
        U = self._U_kmajor(state)  # (S, K, nb, B, B)
        V = state["activation"]  # (S, K, T)
        X = state["input"]
        Y = state["estimation"]  # == separate(X, W) (update invariant)
        y = self._y_blocks(Y, layout)  # (S, T, nb, B)
        n_bins = X.shape[1]

        R, _ = self._R_blocks_parts(U, V, layout)  # (S, T, nb, B, B)
        inv_R = _psd_inv(R, psd=False)
        z = jnp.einsum("stbij,stbj->stbi", inv_R, y)  # R⁻¹ y

        # --- basis:  U_new,k = U_k A_k U_k + U_k  with
        # A_k = mean_t V_kt (z_t z_t^H − R_t⁻¹) — the closed form of the
        # reference's mean_t Φ/V (Φ = ŷŷ^H + R̂; the V division cancels)
        zz_minus = (
            z[..., :, None] * z[..., None, :].conj() - inv_R
        )  # (S, T, nb, B, B)
        A = jnp.einsum(
            "skt,stbij->skbij", V.astype(zz_minus.dtype), zz_minus
        ) / V.shape[-1]
        U_new = U @ A @ U + U
        U_new = to_psd(layout.zero_padding_matrix(U_new), eps=eps)
        U_new = layout.zero_padding_matrix(U_new)
        state = dict(
            state, basis=jnp.transpose(U_new, (0, 2, 3, 4, 1))
        )

        # --- activation: V_new = tr(U⁻¹Φ)/n_bins
        #   = [V² Σ_b z^H U z + V·n_bins − V² Σ_b tr(R⁻¹U)] / n_bins
        U = self._U_kmajor(state)
        R, _ = self._R_blocks_parts(U, V, layout)
        inv_R = _psd_inv(R, psd=False)
        z = jnp.einsum("stbij,stbj->stbi", inv_R, y)
        zUz = jnp.einsum("stbi,skbij,stbj->skt", z.conj(), U, z).real
        trRU = jnp.einsum("stbij,skbji->skt", inv_R, U).real
        V_new = (V**2 * zUz + V * n_bins - V**2 * trRU) / n_bins
        V_new = jnp.maximum(V_new, 0.0)
        return dict(state, activation=V_new)

    # ------------------------------------------------------------------ #
    # source model — MM (Kondo, ``ipsdta.py:510-688``)
    # ------------------------------------------------------------------ #
    def _update_source_mm(self, state, layout):
        eps = self.eps
        U = self._U_kmajor(state)
        V = state["activation"]
        Y = state["estimation"]  # == separate(X, W) (update invariant)
        y = self._y_blocks(Y, layout)
        B = layout.block_size
        pad_diag = (~layout.valid).astype(U.real.dtype)[..., None] * jnp.eye(
            B, dtype=U.dtype
        )

        # --- basis (matrix-sqrt chain).  The reference materializes the
        # rank-6 ``R⁻¹(yy^H + εI)R⁻¹`` tensor; here ``S_k = Σ_t V·(zz^H)``
        # accumulates the z outer products directly in the t-contraction
        # (never materializing the (S,T,nb,B,B) outer-product tensor) plus
        # the ε·Σ_t V·R⁻²  term — algebraically identical.
        R, _ = self._R_blocks_parts(U, V, layout)
        inv_R = _psd_inv(R, eps=eps, psd=True)
        z = jnp.einsum("stbij,stbj->stbi", inv_R, y)
        Vc = V.astype(U.dtype)
        inv2 = matmul_small(inv_R, inv_R)
        S_k = jnp.einsum("skt,stbi,stbj->skbij", Vc, z, z.conj()) + eps * (
            jnp.einsum("skt,stbij->skbij", Vc, inv2)
        )
        T_k = jnp.einsum("skt,stbij->skbij", Vc, inv_R)

        sqrt_S = _psd_sqrt_fused(layout.pad_identity(S_k), eps=eps)
        sqrt_STUTS, inv_sqrt = _sqrt_and_invsqrt_after_psd(
            sqrt_S @ U @ T_k @ U @ sqrt_S, pad_diag, eps=eps
        )
        del sqrt_STUTS  # only the inverse square root feeds the update
        U_new = to_psd(U @ sqrt_S @ inv_sqrt @ sqrt_S @ U, eps=eps)
        U_new = layout.zero_padding_matrix(U_new)
        state = dict(state, basis=jnp.transpose(U_new, (0, 2, 3, 4, 1)))

        # --- activation (trace ratio, ``ipsdta.py:625-688``).  With
        # yy_psd = y y^H + d·I (the eps ridge chain produces the scalar
        # d = eps + eps·tr(y y^H + eps·I)), the numerator
        # tr(R⁻¹ U R⁻¹ yy_psd) = z^H U z + d·tr(U R⁻²) by trace cyclicity —
        # no (S,T,nb,B,B) matmuls or rank-6 einsums.
        U = self._U_kmajor(state)
        R, _ = self._R_blocks_parts(U, V, layout)
        inv_R = _psd_inv(R, eps=eps, psd=True)
        z = jnp.einsum("stbij,stbj->stbi", inv_R, y)
        ynorm = jnp.einsum("stbi,stbi->stb", y.conj(), y).real
        # the reference's ridge chain yy → _psd_ridge(yy + eps·I) produces
        # yy_psd = y y^H + d·I with the scalar d below
        d = eps + eps * (ynorm + B * eps)
        inv2_d = d[..., None, None].astype(U.dtype) * (matmul_small(inv_R, inv_R))
        zUz = jnp.einsum("stbi,skbij,stbj->skt", z.conj(), U, z).real
        num = zUz + jnp.einsum("skbij,stbji->skt", U, inv2_d).real
        den = jnp.einsum("stbij,skbji->skt", inv_R, U).real
        num = jnp.maximum(num, 0)
        den = floor_below(den, eps)
        V_new = V * jnp.sqrt(num / den)
        return dict(state, activation=V_new)

    # ------------------------------------------------------------------ #
    # source model — planes layout (round 4): the matrix-layout source
    # steps above stream (S, T, n_blocks, B, B) tensors whose B ≤ 3 minors
    # pad to the 8×128 tile wherever fusion materializes them; these duals
    # keep the tiny (B, B) axes LEADING (same convention as the VCD planes
    # sweep) so every array crossing a fusion boundary is a fully-tiled
    # (T, n_blocks) plane, and every t-contraction is one (K, T)×(T, nb)
    # GEMM per entry.  Math identical entry-by-entry (same closed forms,
    # ``ops/fast_linalg``); gated by ``self.source_planes``.
    # ------------------------------------------------------------------ #
    def _source_planes_preamble(self, state, layout):
        """Shared planes operands: ``UP (S, K, B, B, nb)``,
        ``YP (B, S, T, nb)`` (zero-padded), and the identity pad
        ``padP (B, B, nb)`` injected into every block covariance."""
        U = self._U_kmajor(state)  # (S, K, nb, B, B)
        B = layout.block_size
        UP = jnp.transpose(U, (0, 1, 3, 4, 2))  # (S, K, B, B, nb)
        y = self._y_blocks(state["estimation"], layout)  # (S, T, nb, B)
        YP = jnp.transpose(y, (3, 0, 1, 2))  # (B, S, T, nb)
        invf = jnp.transpose(~layout.valid).astype(U.real.dtype)  # (B, nb)
        padP = jnp.eye(B, dtype=U.dtype)[:, :, None] * invf[None]  # (B, B, nb)
        return U, UP, YP, padP

    def _source_R_inv_planes(self, UP_n, V_n, padP, psd, eps):
        """Per-source ``R = Σ_k U_k V_kt`` (identity-padded, to_psd) and its
        adjugate inverse in planes ``(B, B, T, nb)`` — the planes dual of
        ``_R_blocks_parts`` + ``_psd_inv``."""
        RP = jnp.einsum("kijb,kt->ijtb", UP_n, V_n.astype(UP_n.dtype))
        RP = RP + padP[:, :, None, :]
        RP, _ = _psd_parts_planes(RP, eps=eps)
        # multi-consumer barrier (round 5): the inverse feeds z, R^-2, T_k
        # and the trace denominators; without it XLA re-expands the
        # closed-form eigvalsh producer chain into every consumer (the
        # Ozerov E/M lever, CLAUDE.md round 4)
        return jax.lax.optimization_barrier(
            _psd_inv_planes(RP, eps=eps, psd=psd)
        )

    @staticmethod
    def _solve_y_planes(IP, YP_n):
        """``z = R⁻¹y`` as B planes ``(T, nb)``."""
        B = IP.shape[0]
        return jax.lax.optimization_barrier(
            [sum(IP[i, j] * YP_n[j] for j in range(B)) for i in range(B)]
        )

    def _update_source_em_planes(self, state, layout):
        """Planes dual of :meth:`_update_source_em` (Ikeshita)."""
        eps = self.eps
        V = state["activation"]  # (S, K, T)
        n_bins = state["input"].shape[1]
        n_sources = V.shape[0]
        n_frames = V.shape[-1]
        U, UP, YP, padP = self._source_planes_preamble(state, layout)
        B = layout.block_size

        # --- basis:  U_new,k = U_k A_k U_k + U_k
        A_rows = []
        for n in range(n_sources):
            IP = self._source_R_inv_planes(UP[n], V[n], padP, False, eps)
            Z = self._solve_y_planes(IP, YP[:, n])
            Vc = V[n].astype(U.dtype)
            A_rows.append(
                jnp.stack(
                    [
                        jnp.stack(
                            [
                                jnp.einsum(
                                    "kt,tb->kb",
                                    Vc,
                                    Z[i] * Z[j].conj() - IP[i, j],
                                )
                                for j in range(B)
                            ]
                        )
                        for i in range(B)
                    ]
                )
            )  # (B, B, K, nb)
        A = jnp.stack(A_rows)  # (S, B, B, K, nb)
        A = jnp.transpose(A, (0, 3, 4, 1, 2)) / n_frames  # (S, K, nb, B, B)
        U_new = U @ A @ U + U
        U_new = to_psd(layout.zero_padding_matrix(U_new), eps=eps)
        U_new = layout.zero_padding_matrix(U_new)
        state = dict(state, basis=jnp.transpose(U_new, (0, 2, 3, 4, 1)))

        # --- activation: V_new = [V²(z^H U z) + V·n_bins − V²·tr(R⁻¹U)]/n_bins
        U, UP, YP, padP = self._source_planes_preamble(state, layout)
        zUz_rows, trRU_rows = [], []
        for n in range(n_sources):
            IP = self._source_R_inv_planes(UP[n], V[n], padP, False, eps)
            Z = self._solve_y_planes(IP, YP[:, n])
            zUz = sum(
                jnp.einsum(
                    "kb,tb->kt", UP[n, :, i, j], Z[i].conj() * Z[j]
                )
                for i in range(B)
                for j in range(B)
            ).real
            trRU = sum(
                jnp.einsum("kb,tb->kt", UP[n, :, j, i], IP[i, j])
                for i in range(B)
                for j in range(B)
            ).real
            zUz_rows.append(zUz)
            trRU_rows.append(trRU)
        zUz = jnp.stack(zUz_rows)  # (S, K, T)
        trRU = jnp.stack(trRU_rows)
        V_new = (V**2 * zUz + V * n_bins - V**2 * trRU) / n_bins
        return dict(state, activation=jnp.maximum(V_new, 0.0))

    def _update_source_mm_planes(self, state, layout):
        """Planes dual of :meth:`_update_source_mm` (Kondo)."""
        eps = self.eps
        V = state["activation"]
        n_sources = V.shape[0]
        U, UP, YP, padP = self._source_planes_preamble(state, layout)
        B = layout.block_size
        pad_diag = (~layout.valid).astype(U.real.dtype)[..., None] * jnp.eye(
            B, dtype=U.dtype
        )

        # --- basis (matrix-sqrt chain on the SMALL (S, K, nb, B, B)
        # statistics; only S_k/T_k accumulate over frames, in planes)
        Sk_rows, Tk_rows = [], []
        for n in range(n_sources):
            IP = self._source_R_inv_planes(UP[n], V[n], padP, True, eps)
            Z = self._solve_y_planes(IP, YP[:, n])
            inv2 = jax.lax.optimization_barrier(matmul_planes(IP, IP))
            Vc = V[n].astype(U.dtype)
            Sk_rows.append(
                jnp.stack(
                    [
                        jnp.stack(
                            [
                                jnp.einsum(
                                    "kt,tb->kb",
                                    Vc,
                                    Z[i] * Z[j].conj() + eps * inv2[i, j],
                                )
                                for j in range(B)
                            ]
                        )
                        for i in range(B)
                    ]
                )
            )  # (B, B, K, nb)
            Tk_rows.append(
                jnp.stack(
                    [
                        jnp.stack(
                            [
                                jnp.einsum("kt,tb->kb", Vc, IP[i, j])
                                for j in range(B)
                            ]
                        )
                        for i in range(B)
                    ]
                )
            )
        S_k = jnp.transpose(jnp.stack(Sk_rows), (0, 3, 4, 1, 2))
        T_k = jnp.transpose(jnp.stack(Tk_rows), (0, 3, 4, 1, 2))

        sqrt_S = _psd_sqrt_fused(layout.pad_identity(S_k), eps=eps)
        sqrt_STUTS, inv_sqrt = _sqrt_and_invsqrt_after_psd(
            sqrt_S @ U @ T_k @ U @ sqrt_S, pad_diag, eps=eps
        )
        del sqrt_STUTS  # only the inverse square root feeds the update
        U_new = to_psd(U @ sqrt_S @ inv_sqrt @ sqrt_S @ U, eps=eps)
        U_new = layout.zero_padding_matrix(U_new)
        state = dict(state, basis=jnp.transpose(U_new, (0, 2, 3, 4, 1)))

        # --- activation (trace ratio) — same algebra as the matrix path:
        # num = z^H U z + d·tr(U R⁻²), den = tr(R⁻¹U)
        U, UP, YP, padP = self._source_planes_preamble(state, layout)
        num_rows, den_rows = [], []
        for n in range(n_sources):
            IP = self._source_R_inv_planes(UP[n], V[n], padP, True, eps)
            Z = self._solve_y_planes(IP, YP[:, n])
            ynorm = sum((YP[i, n].conj() * YP[i, n]).real for i in range(B))
            d = eps + eps * (ynorm + B * eps)  # (T, nb)
            inv2 = jax.lax.optimization_barrier(matmul_planes(IP, IP))
            zUz = sum(
                jnp.einsum(
                    "kb,tb->kt", UP[n, :, i, j], Z[i].conj() * Z[j]
                )
                for i in range(B)
                for j in range(B)
            ).real
            tr_inv2_d = sum(
                jnp.einsum(
                    "kb,tb->kt",
                    UP[n, :, i, j],
                    d.astype(U.dtype) * inv2[j, i],
                )
                for i in range(B)
                for j in range(B)
            ).real
            den = sum(
                jnp.einsum("kb,tb->kt", UP[n, :, j, i], IP[i, j])
                for i in range(B)
                for j in range(B)
            ).real
            num_rows.append(zUz + tr_inv2_d)
            den_rows.append(den)
        num = jnp.maximum(jnp.stack(num_rows), 0)
        den = floor_below(jnp.stack(den_rows), eps)
        V_new = V * jnp.sqrt(num / den)
        return dict(state, activation=V_new)

    # ------------------------------------------------------------------ #
    # source model — compact-Hermitian planes (round 5).  The planes source
    # steps above stream COMPLEX (B, B) entry planes for fields that are all
    # Hermitian (R, R⁻¹, R⁻², the zzᴴ outer products, S_k/T_k/A_k and every
    # trace contraction): B² complex planes where B² REAL planes suffice
    # (diagonals + one (re, im) pair per c < d — the ``_plane_index``
    # convention the IP components already use).  These duals halve the
    # streamed bytes of the measured-dominant source stage
    # (benchmarks/STAGES.json: 8.5 of 8.9 ms/iteration for Kondo) and turn
    # every frame contraction into a REAL GEMM.  Math identical
    # entry-by-entry (same closed forms, ``ops/fast_linalg`` compact duals);
    # gated by ``self.source_compact`` (on-chip A/B, benchmarks/compact_ab.py).
    # ------------------------------------------------------------------ #
    def _source_compact_basis(self, state, layout):
        """Basis operands for the compact chains: ``U (S, K, nb, B, B)``
        (for the tiny basis-chain matmuls) and its compact planes
        ``UC (S, K, B², nb)`` (real).  Recomputed after the basis half-step;
        the data operands (:meth:`_source_compact_preamble`) are not."""
        U = self._U_kmajor(state)  # (S, K, nb, B, B)
        B = layout.block_size
        UP = jnp.transpose(U, (0, 1, 3, 4, 2))  # (S, K, B, B, nb)
        UC = jnp.moveaxis(
            hermitian_compact_from_entries(lambda c, d: UP[:, :, c, d], B),
            0,
            2,
        )  # (S, K, B², nb)
        return U, UC

    def _source_compact_preamble(self, state, layout):
        """Shared compact operands: ``U``/``UC`` (see
        :meth:`_source_compact_basis`), ``YP (B, S, T, nb)`` (complex,
        zero-padded), and the compact identity pad ``padC (B², nb)``."""
        U, UC = self._source_compact_basis(state, layout)
        B = layout.block_size
        y = self._y_blocks(state["estimation"], layout)  # (S, T, nb, B)
        YP = jnp.transpose(y, (3, 0, 1, 2))  # (B, S, T, nb)
        invf = jnp.transpose(~layout.valid).astype(U.real.dtype)  # (B, nb)
        padC = jnp.concatenate(
            [invf, jnp.zeros((B * B - B,) + invf.shape[1:], invf.dtype)]
        )
        return U, UC, YP, padC

    def _source_R_inv_compact(self, UC, V, padC, psd, eps):
        """Compact dual of :meth:`_source_R_inv_planes`, batched over
        sources: ``R = Σ_k U_k V_kt`` (identity-padded, to_psd) and its
        adjugate inverse as B² real planes ``(B², S, T, nb)`` (barriered —
        same multi-consumer lever).  The source axis rides INSIDE the planes
        so the whole chain is one kernel stream instead of S duplicates."""
        RC = jnp.einsum("skpb,skt->pstb", UC, V.astype(UC.dtype))  # real GEMM per plane
        RC = RC + padC[:, None, None, :]
        RC, _ = psd_parts_hermitian_compact(RC, eps=eps)
        return jax.lax.optimization_barrier(
            psd_inv_hermitian_compact(RC, eps=eps, psd=psd)
        )

    @staticmethod
    def _solve_y_compact(IC, YP):
        """``z = R⁻¹y`` as B complex planes ``(S, T, nb)`` from compact R⁻¹
        ``(B², S, T, nb)``."""
        B = int(round(IC.shape[0] ** 0.5))
        return jax.lax.optimization_barrier(
            [
                sum(compact_entry(IC, i, j) * YP[j] for j in range(B))
                for i in range(B)
            ]
        )

    @staticmethod
    def _trace_contract_compact(UC, planes, conjugate):
        """``Σ_ij U_ij P_ij`` (``conjugate=False``) or ``Σ_ij Ū_ij P_ij``
        (``conjugate=True``) for compact Hermitian ``U (S, K, B², nb)`` and
        ``P (B², S, T, nb)`` — a real scalar per (s, k, t), so the whole
        double sum is ONE real GEMM with ±2 off-diagonal weights (the
        conjugate-pair terms collapse to ``2·Re``)."""
        B = int(round(planes.shape[0] ** 0.5))
        _, order = _plane_index(B)
        w = [
            1.0
            if c == d
            else (2.0 if kind == "re" or conjugate else -2.0)
            for kind, c, d in order
        ]
        wts = jnp.asarray(w, UC.dtype)
        return jnp.einsum(
            "skpb,pstb->skt", UC * wts[None, None, :, None], planes
        )

    def _update_source_em_compact(self, state, layout):
        """Compact dual of :meth:`_update_source_em_planes` (Ikeshita),
        source-batched."""
        eps = self.eps
        V = state["activation"]  # (S, K, T)
        n_bins = state["input"].shape[1]
        n_frames = V.shape[-1]
        U, UC, YP, padC = self._source_compact_preamble(state, layout)
        B = layout.block_size

        # --- basis:  U_new,k = U_k A_k U_k + U_k,
        # A_k = mean_t V (zz^H − R⁻¹) accumulated on compact planes
        IC = self._source_R_inv_compact(UC, V, padC, False, eps)
        Z = self._solve_y_compact(IC, YP)
        AC = (
            hermitian_compact_from_entries(
                lambda c, d: Z[c] * Z[d].conj(), B
            )
            - IC
        )
        A = expand_hermitian_compact_trailing(
            jnp.transpose(jnp.einsum("skt,pstb->skpb", V.astype(UC.dtype), AC), (0, 1, 3, 2)),
            B,
        ) / n_frames  # (S, K, nb, B, B)
        U_new = U @ A @ U + U
        U_new = to_psd(layout.zero_padding_matrix(U_new), eps=eps)
        U_new = layout.zero_padding_matrix(U_new)
        state = dict(state, basis=jnp.transpose(U_new, (0, 2, 3, 4, 1)))

        # --- activation: V_new = [V²(z^H U z) + V·n_bins − V²·tr(R⁻¹U)]/n_bins
        # (YP/padC are data-side — unchanged by the basis half-step)
        U, UC = self._source_compact_basis(state, layout)
        IC = self._source_R_inv_compact(UC, V, padC, False, eps)
        Z = self._solve_y_compact(IC, YP)
        Pz = hermitian_compact_from_entries(
            lambda c, d: Z[c].conj() * Z[d], B
        )
        zUz = self._trace_contract_compact(UC, Pz, False)  # (S, K, T)
        trRU = self._trace_contract_compact(UC, IC, True)
        V_new = (V**2 * zUz + V * n_bins - V**2 * trRU) / n_bins
        return dict(state, activation=jnp.maximum(V_new, 0.0))

    def _update_source_mm_compact(self, state, layout):
        """Compact dual of :meth:`_update_source_mm_planes` (Kondo),
        source-batched."""
        eps = self.eps
        V = state["activation"]
        U, UC, YP, padC = self._source_compact_preamble(state, layout)
        B = layout.block_size
        pad_diag = (~layout.valid).astype(U.real.dtype)[..., None] * jnp.eye(
            B, dtype=U.dtype
        )

        # --- basis (matrix-sqrt chain on the SMALL (S, K, nb, B, B)
        # statistics; S_k/T_k accumulate over frames on compact planes)
        IC = self._source_R_inv_compact(UC, V, padC, True, eps)
        Z = self._solve_y_compact(IC, YP)
        inv2 = jax.lax.optimization_barrier(square_hermitian_compact(IC))
        SC = (
            hermitian_compact_from_entries(
                lambda c, d: Z[c] * Z[d].conj(), B
            )
            + eps * inv2
        )
        S_k = expand_hermitian_compact_trailing(
            jnp.transpose(jnp.einsum("skt,pstb->skpb", V.astype(UC.dtype), SC), (0, 1, 3, 2)),
            B,
        )
        T_k = expand_hermitian_compact_trailing(
            jnp.transpose(jnp.einsum("skt,pstb->skpb", V.astype(UC.dtype), IC), (0, 1, 3, 2)),
            B,
        )

        sqrt_S = _psd_sqrt_fused(layout.pad_identity(S_k), eps=eps)
        _, inv_sqrt = _sqrt_and_invsqrt_after_psd(
            sqrt_S @ U @ T_k @ U @ sqrt_S, pad_diag, eps=eps
        )
        U_new = to_psd(U @ sqrt_S @ inv_sqrt @ sqrt_S @ U, eps=eps)
        U_new = layout.zero_padding_matrix(U_new)
        state = dict(state, basis=jnp.transpose(U_new, (0, 2, 3, 4, 1)))

        # --- activation (trace ratio): num = z^H U z + d·tr(U R⁻²),
        # den = tr(R⁻¹U) — three real GEMMs total
        # (YP/padC are data-side — unchanged by the basis half-step)
        U, UC = self._source_compact_basis(state, layout)
        IC = self._source_R_inv_compact(UC, V, padC, True, eps)
        Z = self._solve_y_compact(IC, YP)
        ynorm = sum((YP[i].conj() * YP[i]).real for i in range(B))
        d = eps + eps * (ynorm + B * eps)  # (S, T, nb)
        inv2 = jax.lax.optimization_barrier(square_hermitian_compact(IC))
        Pz = hermitian_compact_from_entries(
            lambda c, dd: Z[c].conj() * Z[dd], B
        )
        zUz = self._trace_contract_compact(UC, Pz, False)
        tr_inv2_d = self._trace_contract_compact(UC, inv2 * d[None], True)
        den = self._trace_contract_compact(UC, IC, True)
        num = jnp.maximum(zUz + tr_inv2_d, 0)
        den = floor_below(den, eps)
        V_new = V * jnp.sqrt(num / den)
        return dict(state, activation=V_new)

    # ------------------------------------------------------------------ #
    # source model — K = 2 matrix-pencil streams (round 5).  The per-stage
    # attribution (benchmarks/STAGES.json) measures the source MM step at
    # ~95% of the Kondo iteration, dominated by the B² (T, n_blocks) plane
    # streams (R, its adjugate inverse, R⁻², z).  For n_basis = 2 the block
    # model ``R_t = V₁ₜU₁ + V₂ₜU₂`` is a matrix PENCIL per (source, block):
    # one B×B generalized eigendecomposition ``GᴴU₁G = I, GᴴU₂G = diag(d)``
    # (batched over blocks, ONCE per step instead of per frame)
    # diagonalizes every frame — ``R_t⁻¹ = G diag(1/w_t) Gᴴ`` with
    # ``w = V₁ₜ + V₂ₜd`` — so the streams collapse from B² planes to the B
    # diagonal planes ``ỹ = Gᴴy`` and ``w``:
    #
    # * ``Σ_t V·zzᴴ + ε Σ_t V·R⁻² = G [Σ_t V·(qqᴴ + ε·M∘(r rᵀ))] Gᴴ`` with
    #   ``q = ỹ/w``, ``r = 1/w``, ``M = GᴴG`` (per-block constant),
    # * ``Σ_t V·R⁻¹ = G diag(Σ_t V/w) Gᴴ``,
    # * the activation trace ratios are fully diagonal:
    #   ``zᴴU₁z = Σᵢ|ỹᵢ|²/wᵢ²``, ``zᴴU₂z = Σᵢ dᵢ|ỹᵢ|²/wᵢ²``,
    #   ``tr(U₁R⁻²) = Σᵢ Mᵢᵢ/wᵢ²``, ``tr(R⁻¹U₁) = Σᵢ 1/wᵢ`` (and d-weighted
    #   duals for U₂) — the second inverse stream never exists.
    #
    # Padded block slots are injected into U₁ at a HUGE scale κ = 1/eps_mach
    # (instead of the matrix path's unit pad): the invalid eigendirections
    # stay exactly decoupled (U is zero-padded rows+cols) with ỹ = 0, d = 0,
    # M_ii = 1/κ, so their spurious contributions are O(1/κ) — below
    # roundoff — and no masking is needed; the basis chain's invalid slots
    # are re-padded/zeroed downstream exactly as in the planes path.
    # Documented divergence (same class as LDPSDTF's pencil): the reference's
    # per-frame to_psd projection + adjugate-inverse floors on R become the
    # frame-relative eigenvalue floor ``w ≥ deps·Σw`` in the pencil frame —
    # trajectory-parity tested against the planes path at float64.
    # ------------------------------------------------------------------ #
    def _pencil_blocks(self, U1, U2, layout):
        """Batched per-block pencil of ``(U₁, U₂)`` (..., nb, B, B):
        returns ``(G, d, Mdiag)`` with ``GᴴÛ₁G = I``, ``GᴴU₂G = diag(d≥0)``
        and ``Mdiag = diag(GᴴG)`` (real)."""
        from jax.scipy.linalg import solve_triangular

        B = layout.block_size
        rdt = U1.real.dtype
        deps = max(self.eps, 100 * float(jnp.finfo(rdt).eps))
        eye = jnp.eye(B, dtype=U1.dtype)
        pad = (~layout.valid).astype(rdt)[..., None] * eye  # (nb, B, B)
        kappa = 1.0 / float(jnp.finfo(rdt).eps)
        tr = jnp.trace(U1, axis1=-2, axis2=-1).real
        ridge = deps * tr + float(np.sqrt(jnp.finfo(rdt).tiny))
        U1h = _herm(U1) + ridge[..., None, None] * eye + kappa * pad
        L = jnp.linalg.cholesky(U1h)
        Z = solve_triangular(L, _herm(U2), lower=True)
        M = solve_triangular(L, jnp.swapaxes(Z, -2, -1).conj(), lower=True)
        d, Q = jnp.linalg.eigh(_herm(M))
        d = jnp.maximum(d, 0)
        G = solve_triangular(jnp.swapaxes(L, -2, -1).conj(), Q, lower=False)
        Mdiag = jnp.einsum("...ji,...ji->...i", G.conj(), G).real
        return G, d, Mdiag

    def _pencil_w_planes(self, V_n, d_n):
        """Per-direction pencil eigenvalue planes ``w_i (T, nb)`` with the
        frame-relative dtype-aware floor standing in for the matrix path's
        to_psd/adjugate guards."""
        w = [
            V_n[0][:, None] + V_n[1][:, None] * d_n[:, i][None, :]
            for i in range(d_n.shape[-1])
        ]
        deps = max(self.eps, 100 * float(jnp.finfo(w[0].dtype).eps))
        wsum = sum(w)
        floor = jnp.maximum(deps * wsum, jnp.finfo(w[0].dtype).tiny)
        return [jnp.maximum(wi, floor) for wi in w]

    def _update_source_mm_pencil(self, state, layout):
        """K = 2 pencil dual of :meth:`_update_source_mm_planes` (Kondo)."""
        eps = self.eps
        V = state["activation"]
        n_sources = V.shape[0]
        U, UP, YP, padP = self._source_planes_preamble(state, layout)
        B = layout.block_size
        pad_diag = (~layout.valid).astype(U.real.dtype)[..., None] * jnp.eye(
            B, dtype=U.dtype
        )

        # --- basis statistics in the pencil frame of the CURRENT basis ---
        G1, d1, _ = self._pencil_blocks(U[:, 0], U[:, 1], layout)
        Sk_list, Tk_list = [], []
        for n in range(n_sources):
            Gn, dn = G1[n], d1[n]
            yt = [
                sum(Gn[:, j, i].conj() * YP[j, n] for j in range(B))
                for i in range(B)
            ]
            w = self._pencil_w_planes(V[n], dn)
            q = [yt[i] / w[i] for i in range(B)]
            rinv = [1.0 / w[i] for i in range(B)]
            Vc = V[n].astype(U.dtype)
            Mfull = jnp.einsum("bji,bjk->bik", Gn.conj(), Gn)  # (nb, B, B)
            E = jnp.stack(
                [
                    jnp.stack(
                        [
                            jnp.einsum("kt,tb->kb", Vc, q[i] * q[j].conj())
                            + (eps * Mfull[:, i, j])[None, :]
                            * jnp.einsum("kt,tb->kb", Vc, rinv[i] * rinv[j])
                            for j in range(B)
                        ]
                    )
                    for i in range(B)
                ]
            )  # (B, B, K, nb)
            E = jnp.transpose(E, (2, 3, 0, 1))  # (K, nb, B, B)
            t_diag = jnp.transpose(
                jnp.stack(
                    [jnp.einsum("kt,tb->kb", Vc, rinv[i]) for i in range(B)]
                ),
                (1, 2, 0),
            )  # (K, nb, B)
            Gh = jnp.swapaxes(Gn, -2, -1).conj()
            Sk_list.append(Gn[None] @ E @ Gh[None])
            Tk_list.append((Gn[None] * t_diag[..., None, :]) @ Gh[None])
        S_k = jnp.stack(Sk_list)  # (S, K, nb, B, B)
        T_k = jnp.stack(Tk_list)

        # --- basis (identical matrix-sqrt chain to the planes path) ---
        sqrt_S = _psd_sqrt_fused(layout.pad_identity(S_k), eps=eps)
        sqrt_STUTS, inv_sqrt = _sqrt_and_invsqrt_after_psd(
            sqrt_S @ U @ T_k @ U @ sqrt_S, pad_diag, eps=eps
        )
        del sqrt_STUTS  # only the inverse square root feeds the update
        U_new = to_psd(U @ sqrt_S @ inv_sqrt @ sqrt_S @ U, eps=eps)
        U_new = layout.zero_padding_matrix(U_new)
        state = dict(state, basis=jnp.transpose(U_new, (0, 2, 3, 4, 1)))

        # --- activation: diagonal traces in the UPDATED pencil frame ---
        U = self._U_kmajor(state)
        G2, d2, M2 = self._pencil_blocks(U[:, 0], U[:, 1], layout)
        num_rows, den_rows = [], []
        for n in range(n_sources):
            Gn, dn, Mn = G2[n], d2[n], M2[n]
            yt = [
                sum(Gn[:, j, i].conj() * YP[j, n] for j in range(B))
                for i in range(B)
            ]
            w = self._pencil_w_planes(V[n], dn)
            ynorm = sum((YP[i, n].conj() * YP[i, n]).real for i in range(B))
            dpl = eps + eps * (ynorm + B * eps)  # the reference ridge scalar
            r = [
                (jnp.abs(yt[i]) ** 2 + dpl * Mn[:, i][None, :]) / (w[i] * w[i])
                for i in range(B)
            ]
            num1 = sum(r)
            num2 = sum(r[i] * dn[:, i][None, :] for i in range(B))
            # tr(R⁻¹U₁) = Σᵢ (GᴴU₁G)ᵢᵢ/wᵢ — on the κ-padded eigendirections
            # GᴴU₁G is exactly 0 (U₁ is zero-padded), NOT 1, so the diagonal
            # c1 must be computed (once per block, not per frame) rather than
            # assumed identity; d = diag(GᴴU₂G) is exact by construction.
            c1 = jnp.einsum(
                "bji,bjk,bki->bi", Gn.conj(), U[n, 0], Gn
            ).real  # (nb, B)
            den1 = sum(c1[:, i][None, :] / w[i] for i in range(B))
            den2 = sum(dn[:, i][None, :] / w[i] for i in range(B))
            num_rows.append(jnp.stack([num1.sum(-1), num2.sum(-1)]))
            den_rows.append(jnp.stack([den1.sum(-1), den2.sum(-1)]))
        num = jnp.maximum(jnp.stack(num_rows), 0)
        den = floor_below(jnp.stack(den_rows), eps)
        V_new = V * jnp.sqrt(num / den)
        return dict(state, activation=V_new)

    # ------------------------------------------------------------------ #
    # spatial model — VCD (Kondo, ``ipsdta.py:820-975``)
    # ------------------------------------------------------------------ #
    def _update_spatial_vcd(self, state, layout, n_spatial=1):
        """VCD sweeps (``ipsdta.py:820-975``).  All ``n_spatial`` sweeps run
        inside one call so the sweep-invariant quantities — the block source
        covariances ``R_n`` (basis/activation only), their inverses, the
        per-(source, bin) spatial covariances ``Q`` and the blocked data
        tensors — are computed ONCE instead of per sweep (the reference
        recomputes them every sweep; Kondo's default is 10 sweeps/iteration).

        Dispatches to the planes-layout implementation (every per-block /
        per-bin small-matrix quantity carried with its tiny axes LEADING and
        the (frames, blocks) axes in the tile) when the closed forms cover the
        block/channel sizes; the matrix-layout variant is the generic
        fallback."""
        W = state["demix_filter"]
        n_sources, n_channels = W.shape[1], W.shape[2]
        if layout.block_size <= 3 and n_channels <= 3 and n_sources == n_channels:
            return self._update_spatial_vcd_planes(state, layout, n_spatial)
        return self._update_spatial_vcd_matrix(state, layout, n_spatial)

    def _vcd_data_planes(self, state, layout):
        """Shared VCD planes preamble: the blocked mixture/demixer in planes
        layout — ``XP (B, C, T, nb)``, ``WP (B, N, C, nb)`` (invalid slots
        identity-padded), and the boolean valid plane ``(B, nb)``."""
        X = state["input"]  # (C, F, T)
        W = state["demix_filter"]  # (F, N, C)
        n_sources, n_channels = W.shape[1], W.shape[2]
        Xg = layout.gather(jnp.transpose(X, (0, 2, 1)))  # (C, T, nb, B)
        XP = jnp.transpose(Xg, (3, 0, 1, 2))  # (B, C, T, nb)
        Wg = layout.gather(jnp.transpose(W, (1, 2, 0)))  # (N, C, nb, B)
        WP = jnp.transpose(Wg, (3, 0, 1, 2))  # (B, N, C, nb)
        eyeNC = jnp.eye(n_sources, n_channels, dtype=W.dtype)
        validB = jnp.transpose(layout.valid)  # (B, nb)
        WP = jnp.where(~validB[:, None, None, :], eyeNC[:, :, None], WP)
        return XP, WP, validB

    def _vcd_source_invariants_planes(self, state, layout):
        """Per-source sweep invariants in planes layout: the to_psd-projected
        source-covariance inverses — entry accessor ``Rinv(n, i, j)`` (complex
        ``(T, nb)`` plane) plus real diagonals ``diag(n, j)``.  With
        ``source_compact`` the inverses materialize as B² REAL planes (half
        the bytes every one of the ``spatial_iteration`` sweeps re-reads);
        otherwise as complex ``(B, B, T, nb)`` planes."""
        eps = self.eps
        U = self._U_kmajor(state)  # (S, K, nb, B, B)
        V = state["activation"]  # (S, K, T)
        B = layout.block_size
        n_sources = U.shape[0]
        if self.source_compact:
            _, UC, _, padC = self._source_compact_preamble(state, layout)
            IC = self._source_R_inv_compact(UC, V, padC, True, eps)
            return (
                lambda n, i, j: compact_entry(IC, i, j)[n],
                lambda n, j: IC[j, n],
            )
        UP = jnp.transpose(U, (0, 1, 3, 4, 2))  # (S, K, B, B, nb)
        invf = jnp.transpose(~layout.valid).astype(U.real.dtype)  # (B, nb)
        padP = jnp.eye(B, dtype=U.dtype)[:, :, None] * invf[None]  # (B, B, nb)
        Rinv_all, diag_all = [], []
        for n in range(n_sources):
            RP = jnp.einsum("kijb,kt->ijtb", UP[n], V[n].astype(U.dtype))
            RP = RP + padP[:, :, None, :]
            RP, _ = _psd_parts_planes(RP, eps=eps)
            RinvP = _psd_inv_planes(RP, eps=eps, psd=True)  # (B, B, T, nb)
            Rinv_all.append(RinvP)
            diag_all.append(
                jnp.stack([RinvP[j, j].real for j in range(B)])
            )  # (B, T, nb)
        return (
            lambda n, i, j: Rinv_all[n][i, j],
            lambda n, j: diag_all[n][j],
        )

    @staticmethod
    def _vcd_q_planes(wxt, XP_j, n_frames, n_channels, eps):
        """Spatial covariance ``Q (C, C, nb)`` for one in-block bin from the
        real frame weights ``wxt (T, nb)`` — Hermitian upper triangle built
        from fused plane products, to_psd-projected."""
        rows = [[None] * n_channels for _ in range(n_channels)]
        for c in range(n_channels):
            for d in range(c, n_channels):
                q = jnp.sum(wxt * XP_j[c] * XP_j[d].conj(), axis=0) / n_frames
                rows[c][d] = q
                if d != c:
                    rows[d][c] = q.conj()
        return _to_psd_planes(jnp.stack([jnp.stack(r) for r in rows]), eps=eps)

    @staticmethod
    def _vcd_row_update(WP, Xw, QP_j, Qinv_j, gamma, n, j, valid_j, XP_j, eps):
        """The VCD root formula (``ipsdta.py:942-973``) for row (n, j) in
        component land; returns the functionally-updated ``(WP, Xw)``."""
        C = WP.shape[2]
        WQ = [
            [
                sum(WP[j, m, c] * QP_j[c, d] for c in range(C))
                for d in range(C)
            ]
            for m in range(WP.shape[1])
        ]
        det = det_components(WQ, C)
        zeta = solve_column_components(WQ, C, n, det=det)  # C × (nb,)
        zeta_hat = [
            sum(Qinv_j[c, d] * gamma[d] for d in range(C)) for c in range(C)
        ]
        Qz = [sum(QP_j[c, d] * zeta[d] for d in range(C)) for c in range(C)]
        Qzh = [
            sum(QP_j[c, d] * zeta_hat[d] for d in range(C)) for c in range(C)
        ]
        eta = sum((zeta[c].conj() * Qz[c]).real for c in range(C))
        eta_hat = sum(zeta[c].conj() * Qzh[c] for c in range(C))

        eta = floor_below(eta, eps)
        small = jnp.abs(eta_hat) < eps
        eta_hat_f = jnp.where(small, eps, eta_hat)
        weight = (eta_hat_f / (2 * eta)) * (
            1 - jnp.sqrt(1 + 4 * eta / (jnp.abs(eta_hat_f) ** 2))
        )
        weight = jnp.where(small, 1 / jnp.sqrt(eta), weight)
        w_row = [
            jnp.where(
                valid_j,
                (weight * zeta[c] - zeta_hat[c]).conj(),
                WP[j, n, c],
            )
            for c in range(C)
        ]
        WP = WP.at[j, n].set(jnp.stack(w_row))
        Xw = Xw.at[j].set(
            sum(XP_j[c].conj() * w_row[c].conj()[None, :] for c in range(C))
        )
        return WP, Xw

    def _vcd_scatter_planes(self, WP, layout):
        W_new = layout.scatter(jnp.transpose(WP, (1, 2, 3, 0)))  # (N, C, F)
        return jnp.transpose(W_new, (2, 0, 1))

    def _update_spatial_vcd_planes(self, state, layout, n_spatial=1):
        """Planes-layout VCD: identical update order and guards as the matrix
        variant, but every small-matrix quantity keeps its tiny axes leading —
        the whole per-(source, bin) body fuses into a handful of full-tile
        elementwise/reduce kernels with zero (…, B, B)/(…, C, C) arrays
        crossing fusion boundaries."""
        eps = self.eps
        X = state["input"]
        n_sources, n_channels = (
            state["demix_filter"].shape[1],
            state["demix_filter"].shape[2],
        )
        B = layout.block_size
        n_frames = X.shape[-1]

        XP, WP0, validB = self._vcd_data_planes(state, layout)
        Rinv_entry, Rinv_diag = self._vcd_source_invariants_planes(
            state, layout
        )

        # Q and its adjugate inverse are sweep-invariant in the Gauss VCD
        Q_all, Qinv_all = [], []
        for n in range(n_sources):
            Q_n = jnp.stack(
                [
                    self._vcd_q_planes(
                        Rinv_diag(n, j), XP[j], n_frames, n_channels, eps
                    )
                    for j in range(B)
                ]
            )  # (B, C, C, nb)
            Q_all.append(Q_n)
            Qinv_all.append(
                jnp.stack([inv_planes(Q_n[j]) for j in range(B)])
            )

        def sweep(_, WP):
            for n in range(n_sources):
                Q_n, Qinv_n = Q_all[n], Qinv_all[n]
                Xw = jnp.stack(
                    [
                        sum(
                            XP[i, c].conj() * WP[i, n, c].conj()[None, :]
                            for c in range(n_channels)
                        )
                        for i in range(B)
                    ]
                )  # (B, T, nb)
                for j in range(B):
                    coupled = sum(
                        Rinv_entry(n, i, j) * Xw[i]
                        for i in range(B)
                        if i != j
                    )
                    gamma = [
                        jnp.sum(coupled * XP[j, c], axis=0) / n_frames
                        for c in range(n_channels)
                    ]
                    WP, Xw = self._vcd_row_update(
                        WP, Xw, Q_n[j], Qinv_n[j], gamma, n, j,
                        validB[j], XP[j], eps,
                    )
            return WP

        WP = jax.lax.fori_loop(0, n_spatial, sweep, WP0)
        W_new = self._vcd_scatter_planes(WP, layout)
        return dict(
            state,
            demix_filter=W_new,
            estimation=self.separate(state["input"], W_new),
        )

    def _update_spatial_vcd_matrix(self, state, layout, n_spatial=1):
        """Matrix-layout VCD fallback (blocks/channels beyond the closed
        forms).  The per-row solves use the closed-form C×C inverses
        (``ops/fast_linalg``) batched over blocks."""
        eps = self.eps
        X = state["input"]  # (C, F, T)
        W = state["demix_filter"]  # (F, N, C)
        U = self._U_kmajor(state)
        V = state["activation"]
        n_sources, n_channels = W.shape[1], W.shape[2]
        B = layout.block_size
        n_frames = X.shape[-1]

        # X in block layout: (T, nb, B, C), zero-padded
        Xt = jnp.transpose(X, (2, 1, 0))  # (T, F, C)
        Xb = layout.gather(jnp.moveaxis(Xt, -1, 0))  # (C, T, nb, B)
        Xb = jnp.transpose(Xb, (1, 2, 3, 0))  # (T, nb, B, C)
        # W in block layout: (nb, B, N, C); padded rows get identity rows so
        # downstream solves stay well-posed (masked out at scatter)
        Wb = layout.gather(jnp.transpose(W, (1, 2, 0)))  # (N, C, nb, B)
        Wb = jnp.transpose(Wb, (2, 3, 0, 1))  # (nb, B, N, C)
        eyeNC = jnp.eye(n_sources, n_channels, dtype=W.dtype)
        invalid = (~layout.valid)[..., None, None]
        Wb = jnp.where(invalid, eyeNC, Wb)

        XX = Xb[..., :, None] * Xb[..., None, :].conj()  # (T, nb, B, C, C)
        mask_offdiag = 1 - jnp.eye(B)
        # j-major (leading in-block-bin axis) copies so every per-j body
        # slices a LEADING axis (minor-axis slicing re-lays-out per body)
        Xbj = jnp.moveaxis(Xb, 2, 0)  # (B, T, nb, C)
        XXj = jnp.moveaxis(XX, 2, 0)  # (B, T, nb, C, C)

        # ---- sweep invariants (depend only on the source model) ----
        inv_Rj_all, Q_all, Qinv_all = [], [], []
        for n in range(n_sources):
            R_n = jnp.einsum(
                "kbij,kt->tbij", U[n], V[n].astype(U.dtype)
            )
            R_n_psd, _ = _psd_parts(layout.pad_identity(R_n), eps=eps)
            inv_R_n = _psd_inv(R_n_psd, eps=eps, psd=True)  # (T, nb, B, B)
            inv_R_diag = jnp.diagonal(inv_R_n, axis1=-2, axis2=-1).real
            # Q[j] for every in-block bin j in one contraction
            Q_n = (
                jnp.einsum("tbj,tbjcd->jbcd", inv_R_diag, XX) / n_frames
            )  # (B, nb, C, C)
            inv_Rj_all.append(jnp.moveaxis(inv_R_n, 3, 0))  # (B, T, nb, B)
            Q_n = to_psd(Q_n, eps=eps)
            Q_all.append(Q_n)
            Qinv_all.append(batched_inv(Q_n))

        def sweep(_, Wb):
            for n in range(n_sources):
                inv_Rj, Q_n, Qinv_n = inv_Rj_all[n], Q_all[n], Qinv_all[n]
                # demixed projections of source n (j-major rows), updated
                # row-wise below
                Xw_n = jnp.einsum(
                    "tbic,bic->ibt", Xb.conj(), Wb[:, :, n, :].conj()
                )  # (B, nb, T)

                for j in range(B):
                    Q = Q_n[j]  # (nb, C, C)

                    # gamma: cross-bin coupling within the block (off-diagonal)
                    RXXw = jnp.einsum(
                        "tbi,tbc,ibt->bic",
                        inv_Rj[j],
                        Xbj[j],
                        Xw_n,
                    ) / n_frames
                    gamma = jnp.einsum(
                        "i,bic->bc", mask_offdiag[j].astype(RXXw.real.dtype), RXXw
                    )

                    WQ = Wb[:, j] @ Q  # (nb, N, C)
                    zeta = batched_inv(WQ)[..., :, n]  # solve(WQ, e_n)
                    zeta_hat = jnp.einsum("bcd,bd->bc", Qinv_n[j], gamma)
                    eta = jnp.einsum("bc,bcd,bd->b", zeta.conj(), Q, zeta).real
                    eta_hat = jnp.einsum("bc,bcd,bd->b", zeta.conj(), Q, zeta_hat)

                    eta = floor_below(eta, eps)
                    small = jnp.abs(eta_hat) < eps
                    eta_hat_f = jnp.where(small, eps, eta_hat)
                    weight = (eta_hat_f / (2 * eta)) * (
                        1 - jnp.sqrt(1 + 4 * eta / (jnp.abs(eta_hat_f) ** 2))
                    )
                    weight = jnp.where(small, 1 / jnp.sqrt(eta), weight)
                    w_new = weight[:, None] * zeta - zeta_hat
                    valid_j = layout.valid[:, j][:, None]
                    w_row = jnp.where(valid_j, w_new.conj(), Wb[:, j, n, :])
                    Wb = Wb.at[:, j, n, :].set(w_row)
                    # refresh only the changed projection row
                    Xw_n = Xw_n.at[j].set(
                        jnp.einsum("tbc,bc->bt", Xbj[j].conj(), w_row.conj())
                    )
            return Wb

        # identical sweeps roll into one compiled body (Kondo's default is
        # 10 sweeps/iteration; unrolling them 10x explodes the program)
        Wb = jax.lax.fori_loop(0, n_spatial, sweep, Wb)

        # scatter back to (F, N, C)
        W_new = layout.scatter(jnp.transpose(Wb, (2, 3, 0, 1)))  # (N, C, F)
        W_new = jnp.transpose(W_new, (2, 0, 1))
        return dict(
            state,
            demix_filter=W_new,
            estimation=self.separate(state["input"], W_new),
        )

    # ------------------------------------------------------------------ #
    # spatial model — fixed point (Ikeshita, ``ipsdta.py:690-818``)
    # ------------------------------------------------------------------ #
    def _fixed_point_G(self, state, layout):
        """The fixed-point statistics
        ``G[s, b, (j,c), (k,d)] = mean_t R̄⁻¹[s,t,b,j,k] X[t,b,j,c] X*[t,b,k,d]``
        — the only frame-dimension work in the spatial update."""
        eps = self.eps
        X = state["input"]
        U = self._U_kmajor(state)
        V = state["activation"]
        n_sources, n_channels = V.shape[0], X.shape[0]
        n_frames = X.shape[-1]
        B = layout.block_size

        if self.source_planes and B <= 3:
            # planes dual: R̄⁻¹ entries and the blocked mixture stay
            # fully-tiled (T, nb) planes; each G entry is one fused
            # multiply + frame reduction.  With ``source_compact`` the
            # inverse is held as B² REAL planes (``R̄⁻¹ = conj(R⁻¹)`` for
            # Hermitian R — the conj is a lazy im-plane sign flip).
            UP = jnp.transpose(U, (0, 1, 3, 4, 2))  # (S, K, B, B, nb)
            invf = jnp.transpose(~layout.valid).astype(U.real.dtype)
            XP, _, _ = self._vcd_data_planes(state, layout)  # (B, C, T, nb)
            if self.source_compact:
                UC = jnp.moveaxis(
                    hermitian_compact_from_entries(
                        lambda c, d: UP[:, :, c, d], B
                    ),
                    0,
                    2,
                )  # (S, K, B², nb)
                padC = jnp.concatenate(
                    [invf, jnp.zeros((B * B - B,) + invf.shape[1:], invf.dtype)]
                )
                RC = jnp.einsum("skpb,skt->pstb", UC, V.astype(UC.dtype))
                RC = RC + padC[:, None, None, :]
                RC, _ = psd_parts_hermitian_compact(RC, eps=eps)
                ICe = jax.lax.optimization_barrier(
                    inv_hermitian_compact(RC, ridge=eps)
                )  # (B², S, T, nb)
            else:
                padP = jnp.eye(B, dtype=U.dtype)[:, :, None] * invf[None]
            G_rows = []
            for n in range(n_sources):
                if self.source_compact:
                    entry = lambda j, k: compact_entry(ICe, j, k)[n].conj()  # noqa: E731
                else:
                    RP = jnp.einsum(
                        "kijb,kt->ijtb", UP[n], V[n].astype(U.dtype)
                    )
                    RP = RP + padP[:, :, None, :]
                    RP, _ = _psd_parts_planes(RP, eps=eps)
                    RcInv = inv_planes(
                        add_diag_planes(
                            jnp.conj(RP), jnp.full(RP.shape[2:], eps)
                        )
                    )  # (B, B, T, nb)
                    entry = lambda j, k: RcInv[j, k]  # noqa: E731
                rows = [
                    [
                        jnp.einsum(
                            "tb,tb->b",
                            entry(j, k) * XP[j, c],
                            XP[k, d].conj(),
                        )
                        for k in range(B)
                        for d in range(n_channels)
                    ]
                    for j in range(B)
                    for c in range(n_channels)
                ]
                G_rows.append(jnp.stack([jnp.stack(r, -1) for r in rows], -2))
            return jnp.stack(G_rows) / n_frames  # (S, nb, BC, BC)

        R, _ = self._R_blocks_parts(U, V, layout)  # (S, T, nb, B, B)
        inv_Rc = batched_inv(R.conj() + eps * jnp.eye(B, dtype=R.dtype))

        Xt = jnp.transpose(X, (2, 1, 0))  # (T, F, C)
        Xb = layout.gather(jnp.moveaxis(Xt, -1, 0))  # (C, T, nb, B)
        Xb = jnp.transpose(Xb, (1, 2, 3, 0))  # (T, nb, B, C)

        G = jnp.einsum(
            "stbjk,tbjc,tbkd->sbjckd", inv_Rc, Xb, Xb.conj()
        ) / n_frames
        return G.reshape(
            n_sources, layout.n_blocks, B * n_channels, B * n_channels
        )

    def _update_spatial_fixed_point(self, state, layout):
        eps = self.eps
        X = state["input"]
        W = state["demix_filter"]  # (F, N, C) = W_Hermite rows
        Lambda = state["fixed_point"]  # (S, F)
        n_sources, n_channels = W.shape[1], W.shape[2]
        B = layout.block_size

        G = self._fixed_point_G(state, layout)  # (S, nb, BC, BC)
        # identity-pad invalid (j, c) slots so G stays invertible
        valid_jc = jnp.repeat(layout.valid, n_channels, axis=-1)  # (nb, B·C)
        pad = (~valid_jc).astype(G.real.dtype)
        G = to_psd(G, eps=eps) + pad[..., None] * jnp.eye(
            B * n_channels, dtype=G.dtype
        )
        # thousands of tiny (BC, BC) systems — but NOT the adjugate/Schur
        # closed form here: G spans the mixture's full dynamic range and the
        # blockwise-Schur complement cancels catastrophically at float32 on
        # real music (NaN by iteration 4 on sample-song where batched LU
        # survives the same 1e12 transient; the 1e-12 to_psd ridge is below
        # f32 roundoff).  Pivoted LU is the robustness choice.
        inv_G = jnp.linalg.inv(G)
        inv_G6 = inv_G.reshape(n_sources, layout.n_blocks, B, n_channels, B, n_channels)
        # inv_G_Hermite[s,b,j,k,c,d] = conj(inv_G[s,b,(k,d),(j,c)])
        inv_G_H = jnp.transpose(inv_G6.conj(), (0, 1, 4, 2, 5, 3))
        # → indexes [s, b, j, k, c, d]

        A = batched_inv(W) if W.shape[-1] <= 3 else jnp.linalg.inv(W)
        # (F, C, S) mixing — adjugate closed form for the tiny C ≤ 3 rows
        A = jnp.transpose(A, (2, 0, 1))  # (S, F, C)
        Ab = layout.gather(jnp.moveaxis(A, -1, 1))  # (S, C, nb, B)
        Ab = jnp.transpose(Ab, (0, 2, 3, 1))  # (S, nb, B, C)

        Bmat = jnp.einsum("sbjc,sbjkcd,sbkd->sbjk", Ab.conj(), inv_G_H, Ab)

        Lb = layout.gather(Lambda)  # (S, nb, B)
        denom = jnp.einsum("sbkj,sbk->sbj", Bmat, Lb.conj())
        denom = jnp.where(jnp.abs(denom) < eps, eps, denom)
        Lb_new = 1 / denom  # (S, nb, B)
        Lb_new = layout.mask_vector(Lb_new)

        # w[s,b,(j,c)] = Σ_{k,d} inv_G[(j,c),(k,d)] · Λ_new[k] · A[(k,d)]
        w = jnp.einsum(
            "sbjckd,sbk,sbkd->sbjc", inv_G6, Lb_new, Ab
        )  # (S, nb, B, C)
        W_rows = layout.scatter(jnp.transpose(w, (0, 3, 1, 2)))  # (S, C, F)
        W_new = jnp.transpose(W_rows, (2, 0, 1)).conj()  # (F, S, C) Hermite rows

        Lambda_new = layout.scatter(Lb_new)  # (S, F)
        return dict(
            state,
            demix_filter=W_new,
            fixed_point=Lambda_new,
            estimation=self.separate(state["input"], W_new),
        )

    # ------------------------------------------------------------------ #
    # normalization + NLL
    # ------------------------------------------------------------------ #
    def _normalize_psdtf(self, state):
        """Trace normalization over blocks (``ipsdta.py:983-1005``)."""
        U = self._U_kmajor(state)
        V = state["activation"]
        trace = jnp.trace(U, axis1=-2, axis2=-1).real.sum(axis=2)  # (S, K)
        U = U / trace[:, :, None, None, None]
        V = V * trace[:, :, None]
        return dict(
            state, basis=jnp.transpose(U, (0, 2, 3, 4, 1)), activation=V
        )

    @_f32_matmuls
    def update_state(self, state):
        layout = self._layout(state["input"].shape[1])
        # planes source steps use the closed-form B <= 3 linalg duals; larger
        # blocks (e.g. the 256-block quality geometry, B = 9) stay on the
        # matrix path with its iterative eigh
        planes = self.source_planes and layout.block_size <= 3
        compact = planes and self.source_compact
        if self.algorithm_source == "em":
            state = (
                self._update_source_em_compact
                if compact
                else self._update_source_em_planes
                if planes
                else self._update_source_em
            )(state, layout)
        else:
            # K = 2 pencil streams (Kondo MM; tIPSDTA overrides the method
            # with the π-weighted dual) — gate settled per class on chip
            pencil = (
                planes and self.source_pencil and self.n_basis == 2
            )
            state = (
                self._update_source_mm_pencil
                if pencil
                else self._update_source_mm_compact
                if compact
                else self._update_source_mm_planes
                if planes
                else self._update_source_mm
            )(state, layout)
        if self.normalize:
            state = self._normalize_psdtf(state)
        if self.algorithm_spatial == "fixed-point":
            for _ in range(self.spatial_iteration):
                state = self._update_spatial_fixed_point(state, layout)
        else:
            # all VCD sweeps in one call: sweep-invariant covariances are
            # hoisted (the reference recomputes them every sweep)
            state = self._update_spatial_vcd(
                state, layout, n_spatial=self.spatial_iteration
            )
        return state

    @_f32_matmuls
    def nll(self, state):
        """``Σ(y^H R⁻¹ y + logdet R) − 2T Σ log|det W|`` with eigvalsh-floored
        block log-dets (``ipsdta.py:1015-1081``)."""
        eps = self.eps
        layout = self._layout(state["input"].shape[1])
        X, W = state["input"], state["demix_filter"]
        n_frames = X.shape[-1]
        logdet_W = batched_log_abs_det(W)
        if (
            self.source_planes
            and self.source_compact
            and layout.block_size <= 3
        ):
            # compact dual: the whole per-frame chain on B² real planes —
            # the matrix path materializes (S, T, nb, B, B) tensors whose
            # B ≤ 3 minors pad to the 8×128 tile
            V = state["activation"]
            _, UC, YP, padC = self._source_compact_preamble(state, layout)
            B = layout.block_size
            RC = jnp.einsum("skpb,skt->pstb", UC, V.astype(UC.dtype))
            RC = RC + padC[:, None, None, :]
            RC, w = psd_parts_hermitian_compact(RC, eps=eps)
            IC = psd_inv_hermitian_compact(RC, eps=eps, psd=True)
            Z = [
                sum(compact_entry(IC, i, j) * YP[j] for j in range(B))
                for i in range(B)
            ]
            yRy = sum(
                (YP[i].conj() * Z[i]).real for i in range(B)
            ).sum(axis=-1)  # (S, T)
            # padded dims contribute log(1) = 0 via the injected identity
            logdet = jnp.log(jnp.maximum(w, eps)).sum(axis=(0, -1))  # (S, T)
            return jnp.sum(yRy + logdet) - 2 * n_frames * logdet_W.sum()

        Y = state["estimation"]  # == separate(X, W) (update invariant)
        y = self._y_blocks(Y, layout)
        U = self._U_kmajor(state)
        V = state["activation"]

        # closed-form eigenvalues supply both the log-det and (via the
        # adjugate inverse) the quadratic form — no eigensolver in the loss
        R, wR = self._R_blocks_parts(U, V, layout)
        inv_R = _psd_inv(R, eps=eps, psd=True)
        z = jnp.einsum("stbij,stbj->stbi", inv_R, y)
        yRy = jnp.einsum("stbi,stbi->st", y.conj(), z).real

        # padded dims contribute log(1) = 0 via the injected identity
        logdet_R = jnp.log(jnp.maximum(wR, eps)).sum(axis=(-2, -1))  # (S, T)

        return jnp.sum(yRy + logdet_R) - 2 * n_frames * logdet_W.sum()

    @_f32_matmuls
    def finalize(self, state):
        X = state["input"]
        Y = state["estimation"]  # == separate(X, W) (update invariant)
        scale = projection_back(Y, reference=X[self.reference_id])
        return Y * scale[..., None]

    def __repr__(self):
        return (
            "Gauss-IPSDTA(n_basis={}, normalize={}, algorithm(source)={}, "
            "algorithm(spatial)={}, n_blocks={}, author={})".format(
                self.n_basis,
                self.normalize,
                self.algorithm_source,
                self.algorithm_spatial,
                self.n_blocks,
                self.author,
            )
        )


class TIPSDTA(GaussIPSDTA):
    """Student-t IPSDTA (``bss/ipsdta.py:1083-1899``), Kondo MM+VCD only.

    The Student-t posterior weight ``π = (ν + 2·n_bins) / (ν + 2·y^H R^{-1} y)``
    (``ipsdta.py:1299, 1364``) scales the frame statistics in both the source
    MM updates and the VCD spatial covariance.
    """

    def __init__(
        self,
        n_basis=10,
        nu=1.0,
        spatial_iteration=None,
        normalize=True,
        callbacks=None,
        reference_id=0,
        author="Kondo",
        recordable_loss=True,
        eps=EPS,
        **kwargs,
    ):
        if author.lower() != "kondo":
            raise ValueError("Only Kondo's (MM + VCD) t-IPSDTA is supported.")
        super().__init__(
            n_basis=n_basis,
            spatial_iteration=spatial_iteration,
            normalize=normalize,
            callbacks=callbacks,
            reference_id=reference_id,
            author=author,
            recordable_loss=recordable_loss,
            eps=eps,
            **kwargs,
        )
        self.nu = nu

    def _pi_weight(self, state, layout):
        """Posterior weights ``π (S, T)``."""
        X = state["input"]
        n_bins = X.shape[1]
        Y = state["estimation"]  # == separate(X, W) (update invariant)
        y = self._y_blocks(Y, layout)
        U = self._U_kmajor(state)
        V = state["activation"]
        R, _ = self._R_blocks_parts(U, V, layout)
        inv_R = _psd_inv(R, psd=False)
        z = jnp.einsum("stbij,stbj->stbi", inv_R, y)
        yRy = jnp.einsum("stbi,stbi->st", y.conj(), z).real
        return (self.nu + 2 * n_bins) / (self.nu + 2 * yRy)

    def _update_source_mm(self, state, layout):
        # the t-MM updates are the Gaussian updates with the per-frame
        # posterior weight π applied to the data statistics (y y^H terms)
        pi = self._pi_weight(state, layout)  # (S, T)
        V = state["activation"]
        eps = self.eps
        U = self._U_kmajor(state)
        Y = state["estimation"]  # == separate(X, W) (update invariant)
        y = self._y_blocks(Y, layout)
        B = layout.block_size
        pad_diag = (~layout.valid).astype(U.real.dtype)[..., None] * jnp.eye(
            B, dtype=U.dtype
        )

        R, _ = self._R_blocks_parts(U, V, layout)
        inv_R = _psd_inv(R, eps=eps, psd=True)
        z = jnp.einsum("stbij,stbj->stbi", inv_R, y)
        # fold the posterior weight into the activations for the weighted
        # t-contractions; the (S,T,nb,B,B) outer-product tensor is never
        # materialized (accumulated in the contraction, as in the Gauss MM)
        Vp = (V * pi[:, None, :]).astype(U.dtype)
        Vc = V.astype(U.dtype)
        inv2 = matmul_small(inv_R, inv_R)
        S_k = jnp.einsum("skt,stbi,stbj->skbij", Vp, z, z.conj()) + eps * (
            jnp.einsum("skt,stbij->skbij", Vp, inv2)
        )
        T_k = jnp.einsum("skt,stbij->skbij", Vc, inv_R)

        sqrt_S = _psd_sqrt_fused(layout.pad_identity(S_k), eps=eps)
        _, inv_sqrt = _sqrt_and_invsqrt_after_psd(
            sqrt_S @ U @ T_k @ U @ sqrt_S, pad_diag, eps=eps
        )
        U_new = to_psd(U @ sqrt_S @ inv_sqrt @ sqrt_S @ U, eps=eps)
        U_new = layout.zero_padding_matrix(U_new)
        state = dict(state, basis=jnp.transpose(U_new, (0, 2, 3, 4, 1)))

        # activation: π recomputed with the updated basis (the reference
        # recomputes it inside update_activation_mm, ``ipsdta.py:1420-1470``)
        # and applied to the summed numerator only
        pi2 = self._pi_weight(state, layout)
        U = self._U_kmajor(state)
        R, _ = self._R_blocks_parts(U, V, layout)
        inv_R = _psd_inv(R, eps=eps, psd=True)
        z = jnp.einsum("stbij,stbj->stbi", inv_R, y)
        # tr(R⁻¹ U R⁻¹ (y y^H + ε I)) = z^H U z + ε·tr(U R⁻²) (trace cyclic)
        inv2_e = eps * (matmul_small(inv_R, inv_R))
        zUz = jnp.einsum("stbi,skbij,stbj->skt", z.conj(), U, z).real
        num = zUz + jnp.einsum("skbij,stbji->skt", U, inv2_e).real
        den = jnp.einsum("stbij,skbji->skt", inv_R, U).real
        num = jnp.maximum(pi2[:, None, :] * num, 0)
        den = floor_below(den, eps)
        V_new = V * jnp.sqrt(num / den)
        return dict(state, activation=V_new)

    def _pi_weight_planes(self, n, UP, YP, V, padP, n_bins, eps):
        """Planes dual of :meth:`_pi_weight` for one source: ``π_n (T,)``."""
        B = UP.shape[2]
        IP = self._source_R_inv_planes(UP[n], V[n], padP, False, eps)
        Z = self._solve_y_planes(IP, YP[:, n])
        yRy = sum((YP[i, n].conj() * Z[i]).real for i in range(B)).sum(axis=-1)
        return (self.nu + 2 * n_bins) / (self.nu + 2 * yRy)

    def _update_source_mm_planes(self, state, layout):
        """Planes dual of the t-MM source step: the Gauss planes MM with the
        posterior weight π folded into the frame statistics."""
        eps = self.eps
        V = state["activation"]
        n_sources = V.shape[0]
        n_bins = state["input"].shape[1]
        U, UP, YP, padP = self._source_planes_preamble(state, layout)
        B = layout.block_size
        pad_diag = (~layout.valid).astype(U.real.dtype)[..., None] * jnp.eye(
            B, dtype=U.dtype
        )

        Sk_rows, Tk_rows = [], []
        for n in range(n_sources):
            pi = self._pi_weight_planes(n, UP, YP, V, padP, n_bins, eps)
            IP = self._source_R_inv_planes(UP[n], V[n], padP, True, eps)
            Z = self._solve_y_planes(IP, YP[:, n])
            inv2 = jax.lax.optimization_barrier(matmul_planes(IP, IP))
            Vp = (V[n] * pi[None, :]).astype(U.dtype)
            Vc = V[n].astype(U.dtype)
            Sk_rows.append(
                jnp.stack(
                    [
                        jnp.stack(
                            [
                                jnp.einsum(
                                    "kt,tb->kb",
                                    Vp,
                                    Z[i] * Z[j].conj() + eps * inv2[i, j],
                                )
                                for j in range(B)
                            ]
                        )
                        for i in range(B)
                    ]
                )
            )
            Tk_rows.append(
                jnp.stack(
                    [
                        jnp.stack(
                            [
                                jnp.einsum("kt,tb->kb", Vc, IP[i, j])
                                for j in range(B)
                            ]
                        )
                        for i in range(B)
                    ]
                )
            )
        S_k = jnp.transpose(jnp.stack(Sk_rows), (0, 3, 4, 1, 2))
        T_k = jnp.transpose(jnp.stack(Tk_rows), (0, 3, 4, 1, 2))

        sqrt_S = _psd_sqrt_fused(layout.pad_identity(S_k), eps=eps)
        _, inv_sqrt = _sqrt_and_invsqrt_after_psd(
            sqrt_S @ U @ T_k @ U @ sqrt_S, pad_diag, eps=eps
        )
        U_new = to_psd(U @ sqrt_S @ inv_sqrt @ sqrt_S @ U, eps=eps)
        U_new = layout.zero_padding_matrix(U_new)
        state = dict(state, basis=jnp.transpose(U_new, (0, 2, 3, 4, 1)))

        # activation: π recomputed with the updated basis, applied to num
        U, UP, YP, padP = self._source_planes_preamble(state, layout)
        num_rows, den_rows = [], []
        for n in range(n_sources):
            pi2 = self._pi_weight_planes(n, UP, YP, V, padP, n_bins, eps)
            IP = self._source_R_inv_planes(UP[n], V[n], padP, True, eps)
            Z = self._solve_y_planes(IP, YP[:, n])
            inv2 = jax.lax.optimization_barrier(matmul_planes(IP, IP))
            zUz = sum(
                jnp.einsum(
                    "kb,tb->kt", UP[n, :, i, j], Z[i].conj() * Z[j]
                )
                for i in range(B)
                for j in range(B)
            ).real
            tr_inv2_e = sum(
                jnp.einsum("kb,tb->kt", UP[n, :, i, j], eps * inv2[j, i])
                for i in range(B)
                for j in range(B)
            ).real
            den = sum(
                jnp.einsum("kb,tb->kt", UP[n, :, j, i], IP[i, j])
                for i in range(B)
                for j in range(B)
            ).real
            num_rows.append(pi2[None, :] * (zUz + tr_inv2_e))
            den_rows.append(den)
        num = jnp.maximum(jnp.stack(num_rows), 0)
        den = floor_below(jnp.stack(den_rows), eps)
        V_new = V * jnp.sqrt(num / den)
        return dict(state, activation=V_new)

    def _pi_and_R_inv_compact(self, UC, YP, V, padC, n_bins, eps):
        """Compact dual of :meth:`_pi_weight_planes` FUSED with the MM's
        ``R⁻¹``: one adjugate inverse serves both — π reads the plain
        (psd=False) inverse, the MM statistics its ``eps·trace``-ridged
        (psd=True) variant, which is additive on the diagonal planes.  The
        planes path re-derives the whole R chain for π (two barriered
        producer chains XLA cannot merge); here they share exactly.
        Returns ``(π (S, T), IC (B², S, T, nb))``."""
        B = int(round(UC.shape[2] ** 0.5))
        RC = jnp.einsum("skpb,skt->pstb", UC, V.astype(UC.dtype))
        RC = RC + padC[:, None, None, :]
        RC, _ = psd_parts_hermitian_compact(RC, eps=eps)
        IC0 = jax.lax.optimization_barrier(inv_hermitian_compact(RC))
        Z0 = self._solve_y_compact(IC0, YP)
        yRy = sum((YP[i].conj() * Z0[i]).real for i in range(B)).sum(axis=-1)
        pi = (self.nu + 2 * n_bins) / (self.nu + 2 * yRy)
        IC = add_diag_hermitian_compact(
            IC0, eps * trace_hermitian_compact(IC0)
        )
        return pi, jax.lax.optimization_barrier(IC)

    def _update_source_mm_compact(self, state, layout):
        """Compact-Hermitian dual of the t-MM source step: the Gauss compact
        MM with the posterior weight π folded into the frame statistics."""
        eps = self.eps
        V = state["activation"]
        n_bins = state["input"].shape[1]
        U, UC, YP, padC = self._source_compact_preamble(state, layout)
        B = layout.block_size
        pad_diag = (~layout.valid).astype(U.real.dtype)[..., None] * jnp.eye(
            B, dtype=U.dtype
        )

        pi, IC = self._pi_and_R_inv_compact(UC, YP, V, padC, n_bins, eps)
        Z = self._solve_y_compact(IC, YP)
        inv2 = jax.lax.optimization_barrier(square_hermitian_compact(IC))
        SC = (
            hermitian_compact_from_entries(
                lambda c, d: Z[c] * Z[d].conj(), B
            )
            + eps * inv2
        )
        Vp = V * pi[:, None, :]
        S_k = expand_hermitian_compact_trailing(
            jnp.transpose(jnp.einsum("skt,pstb->skpb", Vp.astype(UC.dtype), SC), (0, 1, 3, 2)),
            B,
        )
        T_k = expand_hermitian_compact_trailing(
            jnp.transpose(jnp.einsum("skt,pstb->skpb", V.astype(UC.dtype), IC), (0, 1, 3, 2)),
            B,
        )

        sqrt_S = _psd_sqrt_fused(layout.pad_identity(S_k), eps=eps)
        _, inv_sqrt = _sqrt_and_invsqrt_after_psd(
            sqrt_S @ U @ T_k @ U @ sqrt_S, pad_diag, eps=eps
        )
        U_new = to_psd(U @ sqrt_S @ inv_sqrt @ sqrt_S @ U, eps=eps)
        U_new = layout.zero_padding_matrix(U_new)
        state = dict(state, basis=jnp.transpose(U_new, (0, 2, 3, 4, 1)))

        # activation: π recomputed with the updated basis, applied to num
        # (YP/padC are data-side — unchanged by the basis half-step)
        U, UC = self._source_compact_basis(state, layout)
        pi2, IC = self._pi_and_R_inv_compact(UC, YP, V, padC, n_bins, eps)
        Z = self._solve_y_compact(IC, YP)
        inv2 = jax.lax.optimization_barrier(square_hermitian_compact(IC))
        Pz = hermitian_compact_from_entries(
            lambda c, dd: Z[c].conj() * Z[dd], B
        )
        zUz = self._trace_contract_compact(UC, Pz, False)
        tr_inv2_e = self._trace_contract_compact(UC, eps * inv2, True)
        den = self._trace_contract_compact(UC, IC, True)
        num = jnp.maximum(pi2[:, None, :] * (zUz + tr_inv2_e), 0)
        den = floor_below(den, eps)
        V_new = V * jnp.sqrt(num / den)
        return dict(state, activation=V_new)

    def _update_source_mm_pencil(self, state, layout):
        """K = 2 pencil dual of the t-MM source step: the Gauss pencil with
        the posterior weight ``π`` folded into the frame statistics.  In the
        pencil frame ``π`` itself is diagonal —
        ``yᴴR⁻¹y = Σ_blocks Σᵢ |ỹᵢ|²/wᵢ`` — so the weight costs B extra
        plane reductions, not an inverse stream.  Same documented-divergence
        guards as the Gauss pencil (frame-relative ``w`` floor)."""
        eps, nu = self.eps, self.nu
        V = state["activation"]
        n_sources = V.shape[0]
        n_bins = state["input"].shape[1]
        U, UP, YP, padP = self._source_planes_preamble(state, layout)
        B = layout.block_size
        pad_diag = (~layout.valid).astype(U.real.dtype)[..., None] * jnp.eye(
            B, dtype=U.dtype
        )

        # --- basis statistics in the pencil frame of the CURRENT basis ---
        G1, d1, _ = self._pencil_blocks(U[:, 0], U[:, 1], layout)
        Sk_list, Tk_list = [], []
        for n in range(n_sources):
            Gn, dn = G1[n], d1[n]
            yt = [
                sum(Gn[:, j, i].conj() * YP[j, n] for j in range(B))
                for i in range(B)
            ]
            w = self._pencil_w_planes(V[n], dn)
            yRy = sum(
                (jnp.abs(yt[i]) ** 2 / w[i]) for i in range(B)
            ).sum(axis=-1)
            pi = (nu + 2 * n_bins) / (nu + 2 * yRy)  # (T,)
            q = [yt[i] / w[i] for i in range(B)]
            rinv = [1.0 / w[i] for i in range(B)]
            Vp = (V[n] * pi[None, :]).astype(U.dtype)
            Vc = V[n].astype(U.dtype)
            Mfull = jnp.einsum("bji,bjk->bik", Gn.conj(), Gn)  # (nb, B, B)
            E = jnp.stack(
                [
                    jnp.stack(
                        [
                            jnp.einsum("kt,tb->kb", Vp, q[i] * q[j].conj())
                            + (eps * Mfull[:, i, j])[None, :]
                            * jnp.einsum("kt,tb->kb", Vp, rinv[i] * rinv[j])
                            for j in range(B)
                        ]
                    )
                    for i in range(B)
                ]
            )  # (B, B, K, nb)
            E = jnp.transpose(E, (2, 3, 0, 1))  # (K, nb, B, B)
            t_diag = jnp.transpose(
                jnp.stack(
                    [jnp.einsum("kt,tb->kb", Vc, rinv[i]) for i in range(B)]
                ),
                (1, 2, 0),
            )  # (K, nb, B)
            Gh = jnp.swapaxes(Gn, -2, -1).conj()
            Sk_list.append(Gn[None] @ E @ Gh[None])
            Tk_list.append((Gn[None] * t_diag[..., None, :]) @ Gh[None])
        S_k = jnp.stack(Sk_list)  # (S, K, nb, B, B)
        T_k = jnp.stack(Tk_list)

        # --- basis (identical matrix-sqrt chain to the planes path) ---
        sqrt_S = _psd_sqrt_fused(layout.pad_identity(S_k), eps=eps)
        _, inv_sqrt = _sqrt_and_invsqrt_after_psd(
            sqrt_S @ U @ T_k @ U @ sqrt_S, pad_diag, eps=eps
        )
        U_new = to_psd(U @ sqrt_S @ inv_sqrt @ sqrt_S @ U, eps=eps)
        U_new = layout.zero_padding_matrix(U_new)
        state = dict(state, basis=jnp.transpose(U_new, (0, 2, 3, 4, 1)))

        # --- activation: π recomputed in the UPDATED pencil frame, applied
        # to the numerator only (plain-ε ridge, matching the planes t-path) —
        U = self._U_kmajor(state)
        G2, d2, M2 = self._pencil_blocks(U[:, 0], U[:, 1], layout)
        num_rows, den_rows = [], []
        for n in range(n_sources):
            Gn, dn, Mn = G2[n], d2[n], M2[n]
            yt = [
                sum(Gn[:, j, i].conj() * YP[j, n] for j in range(B))
                for i in range(B)
            ]
            w = self._pencil_w_planes(V[n], dn)
            yRy = sum(
                (jnp.abs(yt[i]) ** 2 / w[i]) for i in range(B)
            ).sum(axis=-1)
            pi2 = (nu + 2 * n_bins) / (nu + 2 * yRy)  # (T,)
            r = [
                (jnp.abs(yt[i]) ** 2 + eps * Mn[:, i][None, :])
                / (w[i] * w[i])
                for i in range(B)
            ]
            num1 = sum(r)
            num2 = sum(r[i] * dn[:, i][None, :] for i in range(B))
            # c1 = diag(GᴴU₁G): exactly 0 on κ-padded eigendirections
            c1 = jnp.einsum(
                "bji,bjk,bki->bi", Gn.conj(), U[n, 0], Gn
            ).real  # (nb, B)
            den1 = sum(c1[:, i][None, :] / w[i] for i in range(B))
            den2 = sum(dn[:, i][None, :] / w[i] for i in range(B))
            num_rows.append(
                pi2[None, :] * jnp.stack([num1.sum(-1), num2.sum(-1)])
            )
            den_rows.append(jnp.stack([den1.sum(-1), den2.sum(-1)]))
        num = jnp.maximum(jnp.stack(num_rows), 0)
        den = floor_below(jnp.stack(den_rows), eps)
        V_new = V * jnp.sqrt(num / den)
        return dict(state, activation=V_new)

    def _update_spatial_vcd_planes(self, state, layout, n_spatial=1):
        """Planes-layout t-VCD (``ipsdta.py:1472-1660``): the Gauss planes VCD
        with the posterior weight ``π_n(t)`` recomputed inside every
        per-(source, bin) body from the CURRENT demixing rows and folded into
        the frame statistics (so ``Q`` is NOT sweep-invariant here)."""
        eps, nu = self.eps, self.nu
        X = state["input"]
        n_sources, n_channels = (
            state["demix_filter"].shape[1],
            state["demix_filter"].shape[2],
        )
        n_bins = X.shape[1]
        B = layout.block_size
        n_frames = X.shape[-1]

        XP, WP0, validB = self._vcd_data_planes(state, layout)
        Rinv_entry, Rinv_diag = self._vcd_source_invariants_planes(
            state, layout
        )

        def sweep(_, WP):
            for n in range(n_sources):
                Xw = jnp.stack(
                    [
                        sum(
                            XP[i, c].conj() * WP[i, n, c].conj()[None, :]
                            for c in range(n_channels)
                        )
                        for i in range(B)
                    ]
                )  # (B, T, nb)
                for j in range(B):
                    # posterior weight from the CURRENT rows:
                    # π = (ν + 2F) / (ν + 2·y^H R⁻¹ y), y = conj(Xw)
                    y = [Xw[i].conj() for i in range(B)]
                    z = [
                        sum(Rinv_entry(n, i, k) * y[k] for k in range(B))
                        for i in range(B)
                    ]
                    yRy = sum(
                        (y[i].conj() * z[i]).real for i in range(B)
                    ).sum(axis=1)  # (T,)
                    pi_n = (nu + 2 * n_bins) / (nu + 2 * yRy)  # (T,)

                    wxt = pi_n[:, None] * Rinv_diag(n, j)  # (T, nb)
                    Q_j = self._vcd_q_planes(
                        wxt, XP[j], n_frames, n_channels, eps
                    )
                    Qinv_j = inv_planes(Q_j)

                    coupled = pi_n[:, None].astype(XP.dtype) * sum(
                        Rinv_entry(n, i, j) * Xw[i]
                        for i in range(B)
                        if i != j
                    )
                    gamma = [
                        jnp.sum(coupled * XP[j, c], axis=0) / n_frames
                        for c in range(n_channels)
                    ]
                    WP, Xw = self._vcd_row_update(
                        WP, Xw, Q_j, Qinv_j, gamma, n, j,
                        validB[j], XP[j], eps,
                    )
            return WP

        WP = jax.lax.fori_loop(0, n_spatial, sweep, WP0)
        W_new = self._vcd_scatter_planes(WP, layout)
        return dict(
            state,
            demix_filter=W_new,
            estimation=self.separate(state["input"], W_new),
        )

    def _update_spatial_vcd_matrix(self, state, layout, n_spatial=1):
        """Matrix-layout t-VCD fallback (blocks/channels beyond the closed
        forms)."""
        eps, nu = self.eps, self.nu
        X = state["input"]
        W = state["demix_filter"]
        U = self._U_kmajor(state)
        V = state["activation"]
        n_sources, n_channels = W.shape[1], W.shape[2]
        n_bins = X.shape[1]
        B = layout.block_size
        n_frames = X.shape[-1]

        Xt = jnp.transpose(X, (2, 1, 0))  # (T, F, C)
        Xb = layout.gather(jnp.moveaxis(Xt, -1, 0))  # (C, T, nb, B)
        Xb = jnp.transpose(Xb, (1, 2, 3, 0))  # (T, nb, B, C)
        Wb = layout.gather(jnp.transpose(W, (1, 2, 0)))  # (N, C, nb, B)
        Wb = jnp.transpose(Wb, (2, 3, 0, 1))  # (nb, B, N, C)
        eyeNC = jnp.eye(n_sources, n_channels, dtype=W.dtype)
        invalid = (~layout.valid)[..., None, None]
        Wb = jnp.where(invalid, eyeNC, Wb)

        XX = Xb[..., :, None] * Xb[..., None, :].conj()  # (T, nb, B, C, C)
        mask_offdiag = 1 - jnp.eye(B)
        Xbj = jnp.moveaxis(Xb, 2, 0)  # (B, T, nb, C)
        XXj = jnp.moveaxis(XX, 2, 0)  # (B, T, nb, C, C)

        # sweep-invariant source spectra (j-major for leading-axis slicing)
        inv_Rj_all, inv_R_diagj_all = [], []
        for n in range(n_sources):
            R_n = jnp.einsum("kbij,kt->tbij", U[n], V[n].astype(U.dtype))
            R_n_psd, _ = _psd_parts(layout.pad_identity(R_n), eps=eps)
            inv_R_n = _psd_inv(R_n_psd, eps=eps, psd=True)  # (T, nb, B, B)
            inv_Rj_all.append(jnp.moveaxis(inv_R_n, 3, 0))  # (B, T, nb, B)
            inv_R_diagj_all.append(
                jnp.moveaxis(
                    jnp.diagonal(inv_R_n, axis1=-2, axis2=-1).real, 2, 0
                )  # (B, T, nb)
            )

        def sweep(_, Wb):
            for n in range(n_sources):
                inv_Rj = inv_Rj_all[n]
                inv_R_diagj = inv_R_diagj_all[n]
                Xw_n = jnp.einsum(
                    "tbic,bic->ibt", Xb.conj(), Wb[:, :, n, :].conj()
                )  # (B, nb, T)

                for j in range(B):
                    # posterior weight from the CURRENT rows
                    y_n = Xw_n.conj()  # (B', nb, T)
                    z = jnp.einsum("jtbi,jbt->ibt", inv_Rj, y_n)
                    yRy = jnp.einsum("ibt,ibt->t", y_n.conj(), z).real
                    pi_n = (nu + 2 * n_bins) / (nu + 2 * yRy)  # (T,)

                    # NOTE: fold π into the other real factor BEFORE the
                    # einsum — the 3-operand form "t,tb,tbcd->bcd" SIGABRTs
                    # the TPU compiler (bisected; XLA bug workaround)
                    Q = jnp.einsum(
                        "tb,tbcd->bcd",
                        pi_n[:, None] * inv_R_diagj[j],
                        XXj[j],
                    ) / n_frames
                    Q = to_psd(Q, eps=eps)

                    RXXw = jnp.einsum(
                        "tbi,tbc,ibt->bic",
                        pi_n[:, None, None].astype(Xb.dtype) * inv_Rj[j],
                        Xbj[j],
                        Xw_n,
                    ) / n_frames
                    gamma = jnp.einsum(
                        "i,bic->bc", mask_offdiag[j].astype(RXXw.real.dtype), RXXw
                    )

                    WQ = Wb[:, j] @ Q
                    zeta = batched_inv(WQ)[..., :, n]  # solve(WQ, e_n)
                    zeta_hat = jnp.einsum("bcd,bd->bc", batched_inv(Q), gamma)
                    eta = jnp.einsum("bc,bcd,bd->b", zeta.conj(), Q, zeta).real
                    eta_hat = jnp.einsum("bc,bcd,bd->b", zeta.conj(), Q, zeta_hat)

                    eta = floor_below(eta, eps)
                    small = jnp.abs(eta_hat) < eps
                    eta_hat_f = jnp.where(small, eps, eta_hat)
                    weight = (eta_hat_f / (2 * eta)) * (
                        1 - jnp.sqrt(1 + 4 * eta / (jnp.abs(eta_hat_f) ** 2))
                    )
                    weight = jnp.where(small, 1 / jnp.sqrt(eta), weight)
                    w_new = weight[:, None] * zeta - zeta_hat
                    valid_j = layout.valid[:, j][:, None]
                    w_row = jnp.where(valid_j, w_new.conj(), Wb[:, j, n, :])
                    Wb = Wb.at[:, j, n, :].set(w_row)
                    Xw_n = Xw_n.at[j].set(
                        jnp.einsum("tbc,bc->bt", Xbj[j].conj(), w_row.conj())
                    )
            return Wb

        Wb = jax.lax.fori_loop(0, n_spatial, sweep, Wb)

        W_new = layout.scatter(jnp.transpose(Wb, (2, 3, 0, 1)))
        W_new = jnp.transpose(W_new, (2, 0, 1))
        return dict(
            state,
            demix_filter=W_new,
            estimation=self.separate(state["input"], W_new),
        )

    @_f32_matmuls
    def nll(self, state):
        """t-NLL (``ipsdta.py:1694-1760``):
        ``Σ logdet R + (ν+2F)/2 · Σ log(1 + 2/ν·y^H R⁻¹ y) − 2T log|det W|``."""
        eps = self.eps
        layout = self._layout(state["input"].shape[1])
        X, W = state["input"], state["demix_filter"]
        n_bins = X.shape[1]
        n_frames = X.shape[-1]
        Y = state["estimation"]  # == separate(X, W) (update invariant)
        y = self._y_blocks(Y, layout)
        U = self._U_kmajor(state)
        V = state["activation"]
        R, wR = self._R_blocks_parts(U, V, layout)
        inv_R = _psd_inv(R, eps=eps, psd=True)
        z = jnp.einsum("stbij,stbj->stbi", inv_R, y)
        yRy = jnp.einsum("stbi,stbi->st", y.conj(), z).real
        logdet_R = jnp.log(jnp.maximum(wR, eps)).sum(axis=(-2, -1))
        logdet_W = batched_log_abs_det(W)
        nu = self.nu
        return (
            logdet_R.sum()
            + (nu + 2 * n_bins) / 2 * jnp.sum(jnp.log(1 + (2 / nu) * yRy))
            - 2 * n_frames * logdet_W.sum()
        )

    def __repr__(self):
        return "t-IPSDTA(n_basis={}, nu={}, n_blocks={}, author={})".format(
            self.n_basis, self.nu, self.n_blocks, self.author
        )
