"""Pure-functional sharded solver steps for multi-chip execution.

The reference is strictly single-process (SURVEY.md §2.6); this module adds the
TPU-native parallel layer: a batched AuxIVA/ILRMA update jitted over a 2-D
``(dp, tp)`` device mesh —

  * ``dp`` (data parallel): independent mixtures along a batch axis;
  * ``tp`` (tensor parallel): the frequency-bin axis, since every per-bin C×C
    update is independent.  The only cross-bin dependency is the source-weight
    reduction ``R = f(Σ_bins |Y|²)`` — XLA turns it into a single all-reduce
    over the ``tp`` axis riding the ICI; everything else is collective-free.

Frame-axis (sequence-parallel analogue) sharding — the covariance
accumulation becomes a ``psum`` over frame shards — and the general
mesh-aware path for EVERY scan-mode solver live in the solver runtime:
``solver.use_mesh(mesh, mode='bins'|'frames')``
(:meth:`audio_source_separation_tpu.runtime.solver.IterativeSolver.use_mesh`,
equivalence-tested at canonical shapes in ``tests/test_mesh_runtime.py``).
This module keeps the hand-written batched AuxIVA-IP step used by the
driver's dry run and the DP throughput bench.
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

from ..ops.covariance import (
    weighted_covariance,
    weighted_covariance_from_pairs,
)
from ..ops.fast_linalg import batched_log_abs_det
from ..ops.ip import ip_update


def auxiva_ip_step(X, W, PP=None, eps=1e-8, threshold=1e12, use_pallas=False):
    """One AuxIVA-IP iteration as a pure function (single mixture).

    Args:
        X: ``(n_channels, n_bins, n_frames)`` complex mixture.
        W: ``(n_bins, n_sources, n_channels)`` demixing filters.
        PP: optional precomputed channel pair products (see
            :func:`~audio_source_separation_tpu.ops.covariance.pair_products`);
            pass it when iterating so the weighted covariance is a single GEMM.
    Returns:
        ``(W_new, nll)``.
    """
    Y = jnp.einsum("fnc,cft->nft", W, X)
    P_ = jnp.abs(Y) ** 2
    R = jnp.maximum(jnp.sqrt(P_.sum(axis=1)), eps)  # (N, T)
    # Default is the XLA covariance path (pair-product GEMM): this step is
    # also compiled under GSPMD sharding, where a Pallas call would force
    # replication of its operands.  Single-device callers (bench) opt into
    # the fused Pallas kernel with ``use_pallas=True``.
    if use_pallas:
        from ..ops.covariance import weighted_covariance_auto

        U = weighted_covariance_auto(X, 1.0 / R, PP=PP, use_pallas=True)
    elif PP is None:
        U = weighted_covariance(X, 1.0 / R)
    else:
        U = weighted_covariance_from_pairs(PP, 1.0 / R)
    W = ip_update(W, U, threshold=threshold)
    Y = jnp.einsum("fnc,cft->nft", W, X)
    n_frames = X.shape[-1]
    nll = (2 * jnp.sqrt(jnp.sum(jnp.abs(Y) ** 2, axis=1))).sum() - 2 * n_frames * (
        batched_log_abs_det(W).sum()
    )
    return W, nll


def auxiva_ip_step_carry(X, W, Y, PP=None, eps=1e-8, threshold=1e12, use_pallas=False):
    """AuxIVA-IP iteration carrying the estimates ``Y`` through the scan —
    saves one separation per iteration (``Y`` entering equals
    ``separate(X, W)`` for the carried ``W``, exactly the reference's state).

    Returns ``(W_new, Y_new, nll)``.
    """
    P_ = jnp.abs(Y) ** 2
    R = jnp.maximum(jnp.sqrt(P_.sum(axis=1)), eps)  # (N, T)
    if use_pallas:
        from ..ops.covariance import weighted_covariance_auto

        U = weighted_covariance_auto(X, 1.0 / R, PP=PP, use_pallas=True)
    elif PP is None:
        U = weighted_covariance(X, 1.0 / R)
    else:
        U = weighted_covariance_from_pairs(PP, 1.0 / R)
    W = ip_update(W, U, threshold=threshold)
    Y = jnp.einsum("fnc,cft->nft", W, X)
    n_frames = X.shape[-1]
    nll = (2 * jnp.sqrt(jnp.sum(jnp.abs(Y) ** 2, axis=1))).sum() - 2 * n_frames * (
        batched_log_abs_det(W).sum()
    )
    return W, Y, nll


def auxiva_ip_step_binsmajor(Xf, W, Yf, PP, eps=1e-8, threshold=1e12):
    """AuxIVA-IP iteration in bins-major layout — the zero-transpose hot loop.

    All per-iteration tensors keep the frequency axis leading so every op is
    either a bin-batched matmul or an elementwise/reduction over aligned
    layouts (the ``(C, F, T) ⇄ (F, C, T)`` transposes of the public layout
    would otherwise copy ~15 MB per iteration):

    Args:
        Xf: mixture ``(n_bins, n_channels, n_frames)``.
        W: demixing filters ``(n_bins, n_sources, n_channels)``.
        Yf: current estimates ``(n_bins, n_sources, n_frames)``.
        PP: pair products ``(C, C, n_bins, n_frames)`` (loop-invariant).
    Returns:
        ``(W_new, Yf_new, nll)``.
    """
    n_frames = Xf.shape[-1]
    P_ = jnp.abs(Yf) ** 2
    R = jnp.maximum(jnp.sqrt(P_.sum(axis=0)), eps)  # (N, T)
    U = weighted_covariance_from_pairs(PP, 1.0 / R)  # (N, F, C, C)
    W = ip_update(W, U, threshold=threshold)
    Yf = W @ Xf  # (F, N, T) — bin-batched matmul, no transposes
    nll = (2 * jnp.sqrt(jnp.sum(jnp.abs(Yf) ** 2, axis=0))).sum() - 2 * n_frames * (
        batched_log_abs_det(W).sum()
    )
    return W, Yf, nll


def auxiva_ip_step_stacked(X2, W2, eps=1e-8, threshold=1e12):
    """Real-boundary variant: complex arrays carried as a stacked leading
    (re, im) axis — ``X2 (2, C, F, T)``, ``W2 (2, F, N, C)`` — because the TPU
    runtime does not accept complex buffers at the executable boundary."""
    X = jax.lax.complex(X2[0], X2[1])
    W = jax.lax.complex(W2[0], W2[1])
    W, nll = auxiva_ip_step(X, W, eps=eps, threshold=threshold)
    return jnp.stack([W.real, W.imag]), nll


batched_auxiva_ip_step = jax.vmap(
    auxiva_ip_step_stacked, in_axes=(0, 0), out_axes=(0, 0)
)


def make_mesh_2d(n_devices=None, devices=None):
    """A ``(dp, tp)`` mesh: dp gets the largest power-of-two factor ≤ √n."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    dp = 1
    while dp * 2 <= n // (dp * 2) and n % (dp * 2) == 0:
        dp *= 2
    tp = n // dp
    return Mesh(np.array(devices).reshape(dp, tp), axis_names=("dp", "tp"))


def make_sharded_train_step(mesh):
    """Jit the batched AuxIVA-IP step with (dp, tp) shardings over ``mesh``.

    Input layout (stacked-real boundary): ``X (batch, 2, C, F, T)`` sharded
    ``P('dp', None, None, 'tp', None)``; ``W (batch, 2, F, N, C)`` sharded
    ``P('dp', None, 'tp', None, None)``.
    """
    x_sharding = NamedSharding(mesh, P("dp", None, None, "tp", None))
    w_sharding = NamedSharding(mesh, P("dp", None, "tp", None, None))
    nll_sharding = NamedSharding(mesh, P("dp"))

    step = jax.jit(
        batched_auxiva_ip_step,
        in_shardings=(x_sharding, w_sharding),
        out_shardings=(w_sharding, nll_sharding),
    )
    return step, x_sharding, w_sharding
