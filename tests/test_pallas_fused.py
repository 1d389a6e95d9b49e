"""Parity tests for the fused AuxIVA-IP Pallas kernel (interpret mode on the
CPU backend; the real-TPU timing story is documented in
``ops/pallas_fused.py`` and ``benchmarks/RESULTS.md``)."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_source_separation_tpu.ops.ip_components import (
    auxiva_ip_step_components,
    pair_products_planes,
    separate_components,
)
from audio_source_separation_tpu.ops.pallas_fused import (
    fused_auxiva_ip_run,
    identity_w_planes,
    pack_planes,
    pad_bins,
    pad_frames,
)

from conftest import make_mixture


def _mixture(rng, F=200, T=37):
    S = rng.randn(2, F, T) * np.abs(rng.randn(2, 1, T)) + 1j * rng.randn(2, F, T)
    A = np.array([[1.0, 0.7], [0.6, 1.0]])
    return np.einsum("cn,nft->cft", A, S).astype(np.complex64)


def test_fused_kernel_matches_component_path(rng):
    X = _mixture(rng)
    F, T = X.shape[1], X.shape[2]
    Xj = jnp.asarray(X)

    planes = pair_products_planes(Xj)
    eye = np.eye(2, dtype=np.complex64)
    W_rows = [
        [jnp.asarray((eye[s, c] * np.ones(F)).astype(np.complex64)) for c in range(2)]
        for s in range(2)
    ]
    Y = separate_components(W_rows, Xj)
    nlls_ref = []
    for _ in range(8):
        W_rows, Y, nll = auxiva_ip_step_components(Xj, W_rows, Y, planes, eps=1e-8)
        nlls_ref.append(float(nll))

    X4 = pack_planes(Xj)
    X4p, _ = pad_bins(X4, tile=128)
    X4p, T_true = pad_frames(X4p, 128)
    Wc0 = identity_w_planes(X4p.shape[1])
    Wc, nlls, _ = jax.jit(
        lambda a, b: fused_auxiva_ip_run(a, b, 8, interpret=True, n_frames=T_true)
    )(X4p, Wc0)

    np.testing.assert_allclose(np.asarray(nlls), np.array(nlls_ref), rtol=3e-5)

    # demixing filters match on the true bins…
    Wref = np.stack(
        [np.stack([np.asarray(W_rows[s][c]) for c in range(2)]) for s in range(2)]
    )
    Wf = np.asarray(Wc).reshape(2, 2, 2, -1)
    Wfused = Wf[:, :, 0, :F] + 1j * Wf[:, :, 1, :F]
    np.testing.assert_allclose(Wfused, Wref, atol=3e-4)

    # …and the zero-padded bins are exact no-ops (identity rows kept by the
    # condition guard, as for any singular-covariance bin)
    Wpad = Wf[:, :, 0, F:] + 1j * Wf[:, :, 1, F:]
    np.testing.assert_array_equal(
        Wpad, np.eye(2, dtype=np.complex64)[:, :, None] * np.ones(Wpad.shape[-1])
    )
