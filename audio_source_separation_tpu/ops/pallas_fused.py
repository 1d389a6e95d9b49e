"""Fused AuxIVA-IP iteration as ONE Pallas program — the TPU "native layer"
for the benchmark hot loop (reference kernel ``bss/iva.py:481-523``).

Why one kernel: the XLA component-layout path (ops/ip_components.py) reads
the pair-product planes (~15 MB), reads X again for the separation (~15 MB),
writes Y (~15 MB) and re-reads Y for the next iteration's weights and the
NLL (~15 MB) — ~60 MB of HBM traffic per iteration, measured ~230 µs/iter.
This kernel restructures the iteration around the observation that **every
per-bin quantity is local to its frequency tile**; the only cross-bin values
are the (tiny) per-(source, frame) weight sums and the log-det scalar:

  * pair products are recomputed on the fly from the X tile in VMEM (4 VPU
    ops) instead of being stored/streamed as a second 15 MB array;
  * the demixed estimates Y are NEVER materialized: the kernel computes the
    per-tile partial sums ``Σ_f |y_nft|²`` (all any consumer needs — the next
    iteration's weights R and the NLL) while the tile is in VMEM;
  * the IP chain (covariance contraction → guarded row solve → normalize)
    runs per tile in real-component arithmetic (complex is carried as
    (re, im) planes; Mosaic has no complex type).

Per-iteration HBM traffic drops to ONE read of X (~15 MB) plus small
(W components, (N, T) weight sums) — the bandwidth speed-of-light for this
update.

MEASURED OUTCOME (v5e, canonical 2×2049×469 config, sustained device time by
scan-length differencing — see bench.py): this kernel runs at ~58 µs/iter;
the XLA component-layout path (ops/ip_components.py) runs at ~25-40 µs/iter.
XLA's own fusion already keeps Y out of HBM and reaches the traffic bound,
and its pipelining beats this kernel's (the revisited (N, T) accumulator
block serializes the grid).  The kernel is therefore NOT the default hot
path — it is kept as the measured, parity-tested record of the experiment
(round-1's "fuse everything into one Pallas program" hypothesis), and as the
starting point if XLA's fusion ever regresses.  Zero-padded bins/frames are
exact no-ops: a padded bin's covariance is singular, so
the reference's condition guard (NaN κ₁ compares false) keeps the identity
rows, their estimates are zero, and their log-det is zero — the same
semantics the reference's guard gives real ill-conditioned bins.

C = 2 sources/channels (the canonical determined stereo case).  The public
entry :func:`fused_auxiva_ip_run` scans the kernel over iterations and
returns the demixing components, per-iteration NLLs and final weight sums.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _iter_kernel(
    winv_ref, x_ref, w_ref, wout_ref, psum_ref, logdet_ref, *, n_frames, threshold
):
    """One AuxIVA-IP iteration on one frequency tile.

    Refs:
      winv_ref: (2, T) f32 — reciprocal source weights 1/R (this iteration).
      x_ref:    (4, Ft, T) f32 — X as planes [x0re, x0im, x1re, x1im].
      w_ref:    (8, Ft) f32 — W rows as planes [w_sc(re|im) for s,c in order].
      wout_ref: (8, Ft) f32 — updated W planes.
      psum_ref: (2, T) f32 — Σ_f |y_nft|² accumulated across tiles.
      logdet_ref: (1, 1) f32 — Σ_f log|det W_f| accumulated across tiles.
    """
    x0re, x0im = x_ref[0], x_ref[1]
    x1re, x1im = x_ref[2], x_ref[3]

    # pair-product planes on the fly (compact Hermitian layout,
    # ops/ip_components.py:_plane_index): p00, p11 real; p01 = x0 x1^*
    p00 = x0re * x0re + x0im * x0im
    p11 = x1re * x1re + x1im * x1im
    pre = x0re * x1re + x0im * x1im
    pim = x0im * x1re - x0re * x1im

    wvT = winv_ref[:].T  # (T, 2)
    scale = 1.0 / n_frames
    U00 = jnp.dot(p00, wvT, preferred_element_type=jnp.float32) * scale  # (Ft, 2)
    U11 = jnp.dot(p11, wvT, preferred_element_type=jnp.float32) * scale
    Ure = jnp.dot(pre, wvT, preferred_element_type=jnp.float32) * scale
    Uim = jnp.dot(pim, wvT, preferred_element_type=jnp.float32) * scale

    w = [
        [
            (w_ref[0], w_ref[1]),
            (w_ref[2], w_ref[3]),
        ],
        [
            (w_ref[4], w_ref[5]),
            (w_ref[6], w_ref[7]),
        ],
    ]

    # sequential IP sweep over sources (true data dependency, bss/iva.py:503)
    for n in range(2):
        # U_n as complex components: [ [u00, u01], [u01^*, u11] ]
        u00 = U00[:, n]
        u11 = U11[:, n]
        ure = Ure[:, n]
        uim = Uim[:, n]
        U = [
            [(u00, jnp.zeros_like(u00)), (ure, uim)],
            [(ure, -uim), (u11, jnp.zeros_like(u11))],
        ]

        # WU[s][j] = Σ_c w[s][c] · U[c][j]
        WU = [[None, None], [None, None]]
        for s in range(2):
            for j in range(2):
                acc_r = acc_i = None
                for c in range(2):
                    tr, ti = _cmul(w[s][c][0], w[s][c][1], U[c][j][0], U[c][j][1])
                    acc_r = tr if acc_r is None else acc_r + tr
                    acc_i = ti if acc_i is None else acc_i + ti
                WU[s][j] = (acc_r, acc_i)

        # det(WU) and the adjugate column n (Cramer row solve)
        ad_r, ad_i = _cmul(WU[0][0][0], WU[0][0][1], WU[1][1][0], WU[1][1][1])
        bc_r, bc_i = _cmul(WU[0][1][0], WU[0][1][1], WU[1][0][0], WU[1][0][1])
        det_r, det_i = ad_r - bc_r, ad_i - bc_i
        det_sq = det_r * det_r + det_i * det_i
        inv_det_r, inv_det_i = det_r / det_sq, -det_i / det_sq

        # inv(WU) = adj / det;  w_n = column n of the inverse
        adj = [
            [WU[1][1], (-WU[0][1][0], -WU[0][1][1])],
            [(-WU[1][0][0], -WU[1][0][1]), WU[0][0]],
        ]
        inv = [[None, None], [None, None]]
        for i_ in range(2):
            for j in range(2):
                inv[i_][j] = _cmul(adj[i_][j][0], adj[i_][j][1], inv_det_r, inv_det_i)
        wn = [inv[0][n], inv[1][n]]  # (c,) column n

        # κ₁ guard = ‖WU‖₁ ‖WU⁻¹‖₁ (ops/ip.py one_norm semantics)
        def _abs(z):
            return jnp.sqrt(z[0] * z[0] + z[1] * z[1])

        norm = jnp.maximum(
            _abs(WU[0][0]) + _abs(WU[1][0]), _abs(WU[0][1]) + _abs(WU[1][1])
        )
        inv_norm = jnp.maximum(
            _abs(inv[0][0]) + _abs(inv[1][0]), _abs(inv[0][1]) + _abs(inv[1][1])
        )
        ok = norm * inv_norm < threshold

        # w^H U_n w (real) and the normalized Hermitian row
        Uw = [None, None]
        for c in range(2):
            acc_r = acc_i = None
            for d in range(2):
                tr, ti = _cmul(U[c][d][0], U[c][d][1], wn[d][0], wn[d][1])
                acc_r = tr if acc_r is None else acc_r + tr
                acc_i = ti if acc_i is None else acc_i + ti
            Uw[c] = (acc_r, acc_i)
        wUw = (
            wn[0][0] * Uw[0][0] + wn[0][1] * Uw[0][1]
            + wn[1][0] * Uw[1][0] + wn[1][1] * Uw[1][1]
        )
        denom = jnp.sqrt(wUw)
        for c in range(2):
            new_r = wn[c][0] / denom
            new_i = -wn[c][1] / denom
            w[n][c] = (
                jnp.where(ok, new_r, w[n][c][0]),
                jnp.where(ok, new_i, w[n][c][1]),
            )

    wout_ref[0], wout_ref[1] = w[0][0]
    wout_ref[2], wout_ref[3] = w[0][1]
    wout_ref[4], wout_ref[5] = w[1][0]
    wout_ref[6], wout_ref[7] = w[1][1]

    # demixed estimates for this tile (never written to HBM): y_n = Σ_c w_nc x_c
    ps = []
    for n in range(2):
        ar, ai = _cmul(
            w[n][0][0][:, None], w[n][0][1][:, None], x0re, x0im
        )
        br, bi = _cmul(
            w[n][1][0][:, None], w[n][1][1][:, None], x1re, x1im
        )
        yre, yim = ar + br, ai + bi
        ps.append(jnp.sum(yre * yre + yim * yim, axis=0))  # (T,)
    p_tile = jnp.stack(ps)  # (2, T)

    # log|det W| over the tile
    ad_r, ad_i = _cmul(w[0][0][0], w[0][0][1], w[1][1][0], w[1][1][1])
    bc_r, bc_i = _cmul(w[0][1][0], w[0][1][1], w[1][0][0], w[1][0][1])
    det_r, det_i = ad_r - bc_r, ad_i - bc_i
    ld_tile = 0.5 * jnp.sum(jnp.log(det_r * det_r + det_i * det_i))

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        psum_ref[:] = p_tile
        logdet_ref[0, 0] = ld_tile

    @pl.when(jnp.logical_not(first))
    def _():
        psum_ref[:] = psum_ref[:] + p_tile
        logdet_ref[0, 0] = logdet_ref[0, 0] + ld_tile


def fused_auxiva_ip_iter(
    X4, Wc, winv, tile=128, threshold=1e12, interpret=False, n_frames=None
):
    """One fused iteration.

    Args:
        X4: ``(4, F, T)`` f32 planes of the stereo mixture (F a multiple of
            ``tile``; zero-pad extra bins — exact no-ops, see module doc).
        Wc: ``(8, F)`` f32 demixing-row planes.
        winv: ``(2, T)`` f32 reciprocal weights ``1/R``.
    Returns:
        ``(Wc_new (8, F), psum (2, T), logdet ())``.
    """
    _, F, T = X4.shape
    n_tiles = F // tile
    n_frames = float(T if n_frames is None else n_frames)

    kernel = functools.partial(
        _iter_kernel, n_frames=n_frames, threshold=threshold
    )
    Wc_new, psum, logdet = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((2, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile, T), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, F), jnp.float32),
            jax.ShapeDtypeStruct((2, T), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(winv, X4, Wc)
    return Wc_new, psum, logdet[0, 0]


def pack_planes(X):
    """Complex stereo mixture ``(2, F, T)`` → f32 planes ``(4, F, T)``."""
    return jnp.stack([X[0].real, X[0].imag, X[1].real, X[1].imag]).astype(
        jnp.float32
    )


def pad_bins(X4, tile=128):
    """Zero-pad the bin axis to a multiple of ``tile`` (exact no-op bins)."""
    F = X4.shape[1]
    F_pad = -(-F // tile) * tile
    if F_pad == F:
        return X4, F
    pad = [(0, 0), (0, F_pad - F), (0, 0)]
    return jnp.pad(X4, pad), F


def pad_frames(X4, multiple=128):
    """Zero-pad the frame axis to a lane-aligned multiple — unaligned rows
    (e.g. T = 469 → 1876-byte transfers) collapse the HBM→VMEM DMA
    bandwidth.  Zero frames are exact no-ops: their pair products are zero
    (no covariance contribution; the true frame count normalizes separately)
    and they add zero to the weight sums."""
    T = X4.shape[-1]
    T_pad = -(-T // multiple) * multiple
    if T_pad == T:
        return X4, T
    pad = [(0, 0)] * (X4.ndim - 1) + [(0, T_pad - T)]
    return jnp.pad(X4, pad), T


def identity_w_planes(F):
    """W = I demixing rows as ``(8, F)`` planes."""
    Wc = jnp.zeros((8, F), dtype=jnp.float32)
    return Wc.at[0].set(1.0).at[6].set(1.0)


def fused_auxiva_ip_run(
    X4,
    Wc0,
    iterations,
    eps=EPS,
    threshold=1e12,
    tile=128,
    interpret=False,
    n_frames=None,
):
    """Scan the fused iteration; matches the semantics of
    ``ops/ip_components.auxiva_ip_step_components`` (same NLL definition).

    Args:
        X4: ``(4, F_padded, T_padded)`` planes (use :func:`pack_planes` +
            :func:`pad_bins` + :func:`pad_frames`).
        Wc0: ``(8, F_padded)`` initial demixing planes.
        n_frames: TRUE frame count when the frame axis is padded.
    Returns:
        ``(Wc (8, F_padded), nlls (iterations,), psum (2, T_padded))``.
    """
    if n_frames is None:
        n_frames = X4.shape[-1]

    # initial weight sums from Y0 = W0 X (for W0 = I this is Σ_f |x_n|²)
    def y0_psum(X4, Wc):
        w = Wc.reshape(2, 2, 2, -1)  # (s, c, re/im, F)
        x = X4.reshape(2, 2, X4.shape[1], X4.shape[-1])  # (c, re/im, F, T)
        yre = jnp.einsum("scf,cft->sft", w[:, :, 0], x[:, 0]) - jnp.einsum(
            "scf,cft->sft", w[:, :, 1], x[:, 1]
        )
        yim = jnp.einsum("scf,cft->sft", w[:, :, 0], x[:, 1]) + jnp.einsum(
            "scf,cft->sft", w[:, :, 1], x[:, 0]
        )
        return (yre**2 + yim**2).sum(axis=1)  # (2, T)

    psum0 = y0_psum(X4, Wc0)

    def body(carry, _):
        Wc, psum = carry
        winv = 1.0 / jnp.maximum(jnp.sqrt(psum), eps)
        Wc, psum, logdet = fused_auxiva_ip_iter(
            X4,
            Wc,
            winv,
            tile=tile,
            threshold=threshold,
            interpret=interpret,
            n_frames=n_frames,
        )
        nll = 2.0 * jnp.sqrt(psum).sum() - 2.0 * n_frames * logdet
        return (Wc, psum), nll

    (Wc, psum), nlls = jax.lax.scan(body, (Wc0, psum0), None, length=iterations)
    return Wc, nlls, psum
