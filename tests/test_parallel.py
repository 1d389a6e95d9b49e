"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_source_separation_tpu.parallel.mesh import make_mesh, shard_spectrogram
from audio_source_separation_tpu.parallel.sharded import (
    auxiva_ip_step,
    auxiva_ip_step_stacked,
    make_mesh_2d,
    make_sharded_train_step,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_2d_factorization():
    mesh = make_mesh_2d(8)
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8
    assert mesh.shape["dp"] == 2 and mesh.shape["tp"] == 4


def test_sharded_step_matches_single_device(rng):
    """The (dp, tp)-sharded batched step must produce the same numbers as the
    unsharded single-example step."""
    batch, C, F, T = 4, 2, 32, 24
    X2 = rng.randn(batch, 2, C, F, T).astype(np.float64)
    W2 = np.zeros((batch, 2, F, C, C))
    W2[:, 0] = np.eye(C)

    mesh = make_mesh_2d(8)
    step, x_sharding, w_sharding = make_sharded_train_step(mesh)
    with mesh:
        Xs = jax.device_put(jnp.asarray(X2), x_sharding)
        Ws = jax.device_put(jnp.asarray(W2), w_sharding)
        W_out, nll_out = step(Xs, Ws)
        W_out = np.asarray(jax.device_get(W_out))
        nll_out = np.asarray(jax.device_get(nll_out))

    for b in range(batch):
        W_ref, nll_ref = jax.jit(auxiva_ip_step_stacked)(
            jnp.asarray(X2[b]), jnp.asarray(W2[b])
        )
        np.testing.assert_allclose(W_out[b], np.asarray(W_ref), atol=1e-8)
        np.testing.assert_allclose(nll_out[b], float(nll_ref), rtol=1e-10)


def test_shard_spectrogram_pads_bins(rng):
    mesh = make_mesh(8)
    X = rng.randn(2, 33, 10) + 1j * rng.randn(2, 33, 10)
    # complex spectrograms can't cross the boundary on TPU; on CPU it's fine
    Xs, n_bins = shard_spectrogram(jnp.asarray(X), mesh)
    assert n_bins == 33
    assert Xs.shape[1] % 8 == 0
    np.testing.assert_allclose(np.asarray(Xs)[:, :33], X)
    np.testing.assert_allclose(np.asarray(Xs)[:, 33:], 0)


def test_pair_product_covariance_consistency(rng):
    """pair-product GEMM path == direct einsum path."""
    from audio_source_separation_tpu.ops.covariance import (
        pair_products,
        weighted_covariance,
        weighted_covariance_from_pairs,
    )

    X = jnp.asarray(rng.randn(3, 17, 21) + 1j * rng.randn(3, 17, 21))
    w2 = jnp.asarray(np.abs(rng.randn(2, 21)) + 0.1)
    w3 = jnp.asarray(np.abs(rng.randn(2, 17, 21)) + 0.1)
    PP = pair_products(X)
    np.testing.assert_allclose(
        np.asarray(weighted_covariance_from_pairs(PP, w2)),
        np.asarray(weighted_covariance(X, w2)),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(weighted_covariance_from_pairs(PP, w3)),
        np.asarray(weighted_covariance(X, w3)),
        atol=1e-10,
    )


def test_fast_linalg_closed_forms(rng):
    from audio_source_separation_tpu.ops.fast_linalg import (
        batched_det,
        batched_inv,
        batched_log_abs_det,
    )

    for n in (2, 3, 4):
        A = jnp.asarray(
            rng.randn(6, n, n) + 1j * rng.randn(6, n, n)
        ) + 2 * jnp.eye(n)
        np.testing.assert_allclose(
            np.asarray(batched_det(A)), np.linalg.det(np.asarray(A)), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(batched_inv(A)), np.linalg.inv(np.asarray(A)), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(batched_log_abs_det(A)),
            np.log(np.abs(np.linalg.det(np.asarray(A)))),
            atol=1e-9,
        )


def test_batch_separate_matches_loop(rng):
    """Batched vmap separation == per-example solves (AuxIVA, no host RNG)."""
    from audio_source_separation_tpu.models import AuxLaplaceIVA
    from audio_source_separation_tpu.parallel import batch_separate, make_mesh_2d
    from conftest import make_mixture

    batch = 3
    Xs = np.stack([make_mixture(rng, n_channels=2, n_bins=17, n_frames=24) for _ in range(batch)])

    solver = AuxLaplaceIVA(algorithm_spatial="IP")
    outputs, losses = batch_separate(solver, Xs, iteration=5)
    assert outputs.shape == (batch, 2, 17, 24)
    assert losses.shape == (batch, 5)

    for b in range(batch):
        s = AuxLaplaceIVA(algorithm_spatial="IP")
        Y = s(Xs[b], iteration=5)
        np.testing.assert_allclose(outputs[b], np.asarray(Y), atol=1e-8)
        np.testing.assert_allclose(losses[b], np.asarray(s.loss[1:]), rtol=1e-10)


def test_batch_separate_ilrma_with_mesh(rng):
    """Batched ILRMA over the (dp, tp) mesh runs and matches unsharded."""
    from audio_source_separation_tpu.models import GaussILRMA
    from audio_source_separation_tpu.parallel import batch_separate, make_mesh_2d
    from conftest import make_mixture

    batch = 2
    Xs = np.stack([make_mixture(rng, n_channels=2, n_bins=16, n_frames=24) for _ in range(batch)])

    np.random.seed(111)
    solver = GaussILRMA(n_basis=2, recordable_loss=False)
    mesh = make_mesh_2d(8)
    with mesh:
        outputs, _ = batch_separate(solver, Xs, iteration=4, mesh=mesh)

    np.random.seed(111)
    solver2 = GaussILRMA(n_basis=2, recordable_loss=False)
    outputs2, _ = batch_separate(solver2, Xs, iteration=4)
    np.testing.assert_allclose(outputs, outputs2, atol=1e-8)


def test_pallas_covariance_interpret_matches_xla(rng):
    """Pallas covariance kernel (interpret mode on CPU) == XLA einsum."""
    from audio_source_separation_tpu.ops.covariance import weighted_covariance
    from audio_source_separation_tpu.ops.pallas_kernels import (
        weighted_covariance_pallas,
    )

    X = jnp.asarray(
        (rng.randn(2, 70, 33) + 1j * rng.randn(2, 70, 33)).astype(np.complex64)
    )
    w = jnp.asarray((np.abs(rng.randn(2, 33)) + 0.1).astype(np.float32))
    U_ref = np.asarray(weighted_covariance(X, w))
    U_pal = np.asarray(weighted_covariance_pallas(X, w, f_tile=32))
    np.testing.assert_allclose(U_pal, U_ref, rtol=1e-4, atol=1e-5)
