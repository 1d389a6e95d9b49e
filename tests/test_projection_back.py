"""Parity tests for projection_back / minimum_distortion_principle against a
direct NumPy least-squares computation (reference semantics,
algorithm/projection_back.py:3-34)."""

import numpy as np

from audio_source_separation_tpu.algorithm import (
    projection_back,
    minimum_distortion_principle,
)


def numpy_projection_back(Y, reference):
    if reference.ndim == 2:
        X = reference[None]
    else:
        X = reference
    Xb = X.transpose(1, 0, 2)
    Yb = Y.transpose(1, 0, 2)
    Yh = Yb.transpose(0, 2, 1).conj()
    A = Xb @ Yh @ np.linalg.inv(Yb @ Yh)
    if reference.ndim == 2:
        return A[:, 0, :].transpose(1, 0)
    return A.transpose(1, 2, 0)


def _random_complex(rng, *shape):
    return rng.randn(*shape) + 1j * rng.randn(*shape)


def test_projection_back_2d(rng):
    Y = _random_complex(rng, 3, 7, 20)
    ref = _random_complex(rng, 7, 20)
    got = np.asarray(projection_back(Y, ref))
    expected = numpy_projection_back(Y, ref)
    assert got.shape == (3, 7)
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_projection_back_3d(rng):
    Y = _random_complex(rng, 3, 7, 20)
    ref = _random_complex(rng, 4, 7, 20)
    got = np.asarray(projection_back(Y, ref))
    expected = numpy_projection_back(Y, ref)
    assert got.shape == (4, 3, 7)
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_projection_back_exact_recovery(rng):
    """If Y = diag scaling of mixture channels, projection back onto channel 0
    must recover the exact inverse scales."""
    X = _random_complex(rng, 2, 5, 50)
    scales = _random_complex(rng, 2, 5)
    Y = X * scales[..., None]
    got = np.asarray(projection_back(Y, X[0]))
    # applying the scale restores the channel-0 image: scale = X0 / Y per bin
    restored = Y * got[..., None]
    np.testing.assert_allclose(restored[0], X[0], atol=1e-8)


def test_mdp_2d(rng):
    Y = _random_complex(rng, 3, 7, 20)
    ref = _random_complex(rng, 7, 20)
    got = np.asarray(minimum_distortion_principle(Y, ref))
    expected = (Y.conj() * ref[None]).sum(axis=2) / (np.abs(Y) ** 2).sum(axis=2)
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_mdp_3d(rng):
    Y = _random_complex(rng, 2, 7, 20)
    ref = _random_complex(rng, 3, 7, 20)
    got = np.asarray(minimum_distortion_principle(Y, ref))
    assert got.shape == (3, 2, 7)
