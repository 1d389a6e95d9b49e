"""MNMF family tests: Sawada MNMF, Ozerov EM, FastMNMF — loss decrease,
separation quality, normalization invariants."""

import numpy as np
import pytest

from audio_source_separation_tpu.models import (
    FastMultichannelISNMF,
    MultichannelISNMF,
    MultichanneltNMF,
)
from audio_source_separation_tpu.transform import stft, istft

from conftest import synth_convolutive_mixture


def _si_sdr(e, t):
    a = np.sum(e * t) / np.sum(t**2)
    p = a * t
    return 10 * np.log10(np.sum(p**2) / np.sum((e - p) ** 2))


def _pair(est, images):
    a = np.mean([_si_sdr(est[0], images[0]), _si_sdr(est[1], images[1])])
    b = np.mean([_si_sdr(est[0], images[1]), _si_sdr(est[1], images[0])])
    return max(a, b)


def test_sawada_mnmf_loss_decreases(rng):
    mixture, _ = synth_convolutive_mixture(rng, n_sources=2, n_samples=4000)
    X = np.asarray(stft(mixture, fft_size=128, hop_size=64))
    np.random.seed(111)
    solver = MultichannelISNMF(n_basis=2, author="Sawada")
    Y = solver(X, iteration=10)
    losses = np.asarray(solver.loss)
    assert len(losses) == 11
    assert losses[-1] < losses[0], losses
    assert Y.shape == X.shape


def test_sawada_mnmf_separates(rng):
    mixture, images = synth_convolutive_mixture(rng, n_sources=2, n_samples=8000)
    fft_size, hop_size = 256, 128
    X = np.asarray(stft(mixture, fft_size=fft_size, hop_size=hop_size))
    np.random.seed(111)
    solver = MultichannelISNMF(n_basis=4, author="Sawada", recordable_loss=False)
    Y = solver(X, iteration=30)
    y = np.asarray(istft(Y, fft_size=fft_size, hop_size=hop_size, length=mixture.shape[-1]))
    assert _pair(y, images) > _pair(mixture, images) + 3.0


def test_sawada_mnmf_spatial_stays_psd_and_normalized(rng):
    mixture, _ = synth_convolutive_mixture(rng, n_sources=2, n_samples=4000)
    X = np.asarray(stft(mixture, fft_size=128, hop_size=64))
    np.random.seed(111)
    solver = MultichannelISNMF(n_basis=2, author="Sawada", recordable_loss=False)
    solver(X, iteration=5)
    H = np.asarray(solver.spatial)
    assert (np.linalg.eigvalsh(H) > -1e-6).all()
    np.testing.assert_allclose(
        np.trace(H, axis1=-2, axis2=-1).real, 1.0, atol=1e-4
    )


def test_sawada_invalid_kwargs_rejected():
    with pytest.raises(ValueError):
        MultichannelISNMF(n_basis=2, author="Sawada", bogus_kwarg=1)


def test_ozerov_mnmf_runs_and_loss_decreases(rng):
    mixture, _ = synth_convolutive_mixture(rng, n_sources=2, n_samples=4000)
    X = np.asarray(stft(mixture, fft_size=128, hop_size=64))
    np.random.seed(111)
    with pytest.warns(UserWarning):
        solver = MultichannelISNMF(n_basis=2, author="Ozerov")
    Y = solver(X, iteration=15)
    losses = np.asarray(solver.loss)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert Y.shape == X.shape


def test_ozerov_mnmf_monotone_on_quiet_mixture(rng):
    """Regression lock for the Ozerov EM fixes (likelihood-preserving W·λ²
    normalization, sequential M step, floored divisions/noise diagonal,
    data-scaled init): on a QUIET mixture (|x|² ~ 1e-5, real-world scale) the
    reference's formulation increases the NLL from the first iteration and
    overflows within ~5; the fixed EM must decrease monotonically."""
    mixture, _ = synth_convolutive_mixture(rng, n_sources=2, n_samples=4000)
    mixture = mixture * 1e-2  # quiet, real-world-recording scale
    X = np.asarray(stft(mixture, fft_size=128, hop_size=64))
    np.random.seed(111)
    with pytest.warns(UserWarning):
        solver = MultichannelISNMF(n_basis=2, author="Ozerov")
    Y = solver(X, iteration=20)
    losses = np.asarray(solver.loss)
    assert np.isfinite(losses).all(), losses
    diffs = np.diff(losses)
    assert (diffs <= np.abs(losses[0]) * 1e-9).all(), losses
    assert np.isfinite(np.asarray(Y)).all()


def test_ozerov_annealing_schedule(rng):
    """Simulated annealing (Ozerov & Févotte 2010, ``annealing=True``): the
    noise variance follows the geometric decay floor instead of the M-step
    estimate.  Early iterations must sit AT the (large) annealed level; the
    level decays toward the M-step regime; the run stays finite."""
    mixture, _ = synth_convolutive_mixture(rng, n_sources=2, n_samples=4000)
    X = np.asarray(stft(mixture, fft_size=128, hop_size=64))

    np.random.seed(111)
    with pytest.warns(UserWarning):
        solver = MultichannelISNMF(
            n_basis=2, author="Ozerov",
            annealing=True, annealing_iterations=10,
            annealing_start=1.0, annealing_end=1e-4,
        )
    solver(X, iteration=3)
    p_bar = solver._anneal_base
    sigma_b = np.asarray(solver.noise_covariance)
    assert np.isfinite(np.asarray(solver.loss)).all()
    # after 3 updates the schedule level is s0·(s1/s0)^(2/10); every entry
    # sits at or slightly above it (max(M-step estimate, level))
    level_after = 1.0 * p_bar * (1e-4) ** (2 / 10)
    assert sigma_b.min() >= level_after * (1 - 1e-9)
    assert sigma_b.min() <= level_after * 1.05

    # annealing off: behavior unchanged (step_count never enters the state)
    np.random.seed(111)
    with pytest.warns(UserWarning):
        plain = MultichannelISNMF(n_basis=2, author="Ozerov")
    plain(X, iteration=3)
    assert not hasattr(plain, "step_count")


def test_ozerov_invalid_kwargs_rejected():
    with pytest.raises(ValueError):
        MultichannelISNMF(n_basis=2, author="Ozerov", bogus_kwarg=1)


def test_fastmnmf_loss_decreases(rng):
    mixture, _ = synth_convolutive_mixture(rng, n_sources=2, n_samples=8000)
    X = np.asarray(stft(mixture, fft_size=256, hop_size=128))
    np.random.seed(111)
    solver = FastMultichannelISNMF(n_basis=2)
    Y = solver(X, iteration=15)
    losses = np.asarray(solver.loss)
    assert losses[-1] < losses[0], losses
    # normalization makes strict monotonicity approximate; forbid big jumps
    assert (np.diff(losses) <= np.abs(losses[:-1]) * 0.05 + 1.0).all(), losses
    assert Y.shape == X.shape


def test_fastmnmf_separates(rng):
    mixture, images = synth_convolutive_mixture(rng, n_sources=2, n_samples=8000)
    fft_size, hop_size = 256, 128
    X = np.asarray(stft(mixture, fft_size=fft_size, hop_size=hop_size))
    np.random.seed(111)
    solver = FastMultichannelISNMF(n_basis=4, recordable_loss=False)
    Y = solver(X, iteration=40)
    y = np.asarray(istft(Y, fft_size=fft_size, hop_size=hop_size, length=mixture.shape[-1]))
    assert _pair(y, images) > _pair(mixture, images) + 3.0


def test_fastmnmf_normalization_invariants(rng):
    mixture, _ = synth_convolutive_mixture(rng, n_sources=2, n_samples=4000)
    X = np.asarray(stft(mixture, fft_size=128, hop_size=64))
    np.random.seed(111)
    solver = FastMultichannelISNMF(n_basis=3, recordable_loss=False)
    solver(X, iteration=5)
    g = np.asarray(solver.spatial_covariance)
    W = np.asarray(solver.basis)
    np.testing.assert_allclose(g.sum(axis=2), 1.0, atol=1e-5)
    np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-5)


def test_fastmnmf_partitioning_raises():
    with pytest.raises(ValueError):
        FastMultichannelISNMF(n_basis=2, partitioning=True)


def test_multichannel_tnmf_warns():
    with pytest.warns(UserWarning):
        MultichanneltNMF(n_basis=2)


def test_sawada_riccati_planes_matches_matrix(rng):
    """The ``riccati_planes`` toggle (round 5: the whole spatial Riccati
    chain on compact Hermitian planes) is output-invariant through the full
    jitted solver at float64."""
    mixture, _ = synth_convolutive_mixture(rng, n_sources=2, n_samples=4000)
    X = np.asarray(stft(mixture, fft_size=128, hop_size=64))
    outs, losses = [], []
    for flag in (False, True):
        np.random.seed(111)
        solver = MultichannelISNMF(n_basis=2, author="Sawada")
        solver.riccati_planes = flag
        outs.append(np.asarray(solver(X, iteration=5)))
        losses.append(np.asarray(solver.loss))
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-8)
    np.testing.assert_allclose(outs[1], outs[0], atol=1e-8, rtol=1e-6)
