"""Pallas TPU kernels for the BSS hot ops.

This is the framework's native layer (the reference has no native code —
SURVEY.md §2: its hot NumPy idioms map to Pallas/XLA kernels here).  The
kernels operate on split real/imaginary planes (complex dtypes are not
supported inside Mosaic kernels) and are grid-tiled over the frequency-bin
axis so each tile's spectrogram slab stays resident in VMEM across the
channel-pair unrolled loop.

``weighted_covariance_pallas`` computes the SURVEY §7.1 kernel #1,

    U[n, f] = (1/T) Σ_t w[n, t] · x[:, f, t] x[:, f, t]^H,

fusing the pair products with the frame-axis contraction (one MXU dot per
channel pair per tile) — the XLA path materializes the ``C²·F·T`` pair
products in HBM first.  On non-TPU backends the kernel runs in interpreter
mode (tests), and :func:`weighted_covariance_auto` picks the best
implementation for the current backend.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cov_kernel(n_channels, n_sources, xr_ref, xi_ref, w_ref, ur_ref, ui_ref):
    """Per-tile body: xr/xi (C, F_tile, T), w (T, N) → U (N, F_tile, C, C)."""
    w = w_ref[:]  # (T, N)
    for c in range(n_channels):
        xr_c = xr_ref[c]  # (F_tile, T)
        xi_c = xi_ref[c]
        for d in range(n_channels):
            xr_d = xr_ref[d]
            xi_d = xi_ref[d]
            # x_c · conj(x_d): re = rr + ii, im = ir − ri (elementwise, VPU)
            prod_re = xr_c * xr_d + xi_c * xi_d  # (F_tile, T)
            prod_im = xi_c * xr_d - xr_c * xi_d
            # contract frames on the MXU: (F_tile, T) @ (T, N)
            u_re = jnp.dot(prod_re, w, preferred_element_type=jnp.float32)
            u_im = jnp.dot(prod_im, w, preferred_element_type=jnp.float32)
            for n in range(n_sources):
                ur_ref[n, :, c, d] = u_re[:, n]
                ui_ref[n, :, c, d] = u_im[:, n]


@functools.partial(jax.jit, static_argnames=("f_tile", "interpret"))
def _weighted_covariance_pallas(Xr, Xi, w, f_tile=256, interpret=False):
    n_channels, n_bins, n_frames = Xr.shape
    n_sources = w.shape[0]
    # pad bins to a tile multiple
    pad = (-n_bins) % f_tile
    if pad:
        Xr = jnp.pad(Xr, ((0, 0), (0, pad), (0, 0)))
        Xi = jnp.pad(Xi, ((0, 0), (0, pad), (0, 0)))
    padded_bins = n_bins + pad
    wT = jnp.transpose(w).astype(jnp.float32)  # (T, N)

    grid = (padded_bins // f_tile,)
    kernel = functools.partial(_cov_kernel, n_channels, n_sources)
    out_shape = [
        jax.ShapeDtypeStruct((n_sources, padded_bins, n_channels, n_channels), jnp.float32),
        jax.ShapeDtypeStruct((n_sources, padded_bins, n_channels, n_channels), jnp.float32),
    ]
    in_specs = [
        pl.BlockSpec(
            (n_channels, f_tile, n_frames),
            lambda i: (0, i, 0),
            memory_space=pl.ANY if interpret else pltpu.VMEM,
        ),
        pl.BlockSpec(
            (n_channels, f_tile, n_frames),
            lambda i: (0, i, 0),
            memory_space=pl.ANY if interpret else pltpu.VMEM,
        ),
        pl.BlockSpec(
            (n_frames, n_sources),
            lambda i: (0, 0),
            memory_space=pl.ANY if interpret else pltpu.VMEM,
        ),
    ]
    out_specs = [
        pl.BlockSpec(
            (n_sources, f_tile, n_channels, n_channels),
            lambda i: (0, i, 0, 0),
            memory_space=pl.ANY if interpret else pltpu.VMEM,
        ),
        pl.BlockSpec(
            (n_sources, f_tile, n_channels, n_channels),
            lambda i: (0, i, 0, 0),
            memory_space=pl.ANY if interpret else pltpu.VMEM,
        ),
    ]
    ur, ui = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(Xr.astype(jnp.float32), Xi.astype(jnp.float32), wT)
    ur = ur[:, :n_bins] / n_frames
    ui = ui[:, :n_bins] / n_frames
    return ur, ui


def weighted_covariance_pallas(X, weights, f_tile=256, interpret=None):
    """Pallas implementation of the weighted spatial covariance.

    Args:
        X: complex mixture ``(n_channels, n_bins, n_frames)``.
        weights: ``(n_sources, n_frames)`` real.
        interpret: force interpreter mode (defaults to True off-TPU).
    Returns:
        complex ``U (n_sources, n_bins, C, C)``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ur, ui = _weighted_covariance_pallas(
        X.real, X.imag, weights, f_tile=f_tile, interpret=interpret
    )
    return jax.lax.complex(ur, ui)
