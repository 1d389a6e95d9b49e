"""Tests for FDICA (incl. permutation alignment), beamformers, and
PDS/ProxLaplaceIVA."""

import numpy as np
import pytest

from audio_source_separation_tpu.algorithm.permutation import solve_permutation
from audio_source_separation_tpu.models import (
    GradLaplaceFDICA,
    NaturalGradLaplaceFDICA,
    ProxLaplaceIVA,
    SparseProxIVA,
    DelaySumBeamformer,
    MVDRBeamformer,
    MaxSNRBeamformer,
    mvdr_beamform,
)
from audio_source_separation_tpu.transform import stft, istft

from conftest import make_mixture, synth_convolutive_mixture


# --------------------------------------------------------------------------- #
# FDICA
# --------------------------------------------------------------------------- #
def test_permutation_alignment_restores_order(rng):
    """Scramble per-bin source order of a structured signal; alignment must
    restore consistent envelopes across bins."""
    n_sources, n_bins, n_frames = 2, 24, 64
    env = np.stack([
        np.abs(np.sin(np.linspace(0, 6 * np.pi, n_frames))) + 0.05,
        np.abs(np.cos(np.linspace(0, 10 * np.pi, n_frames))) + 0.05,
    ])  # (2, T) distinct envelopes
    Y = env[:, None, :] * (rng.randn(n_sources, n_bins, n_frames) * 0.05 + 1.0)
    Y = Y.astype(np.complex128)
    W = np.tile(np.eye(2, dtype=np.complex128), (n_bins, 1, 1))
    # scramble half the bins
    flipped = rng.rand(n_bins) < 0.5
    Y_scrambled = Y.copy()
    for f in range(n_bins):
        if flipped[f]:
            Y_scrambled[:, f, :] = Y_scrambled[::-1, f, :]
    W_aligned = solve_permutation(W, Y_scrambled)
    # applying the aligned W's permutation to scrambled Y restores envelopes:
    # bins where W row 0 selects channel 1 are exactly the flipped ones
    selected = np.argmax(np.abs(W_aligned[:, 0, :]), axis=-1)
    assert (selected == flipped.astype(int)).all() or (
        selected == 1 - flipped.astype(int)
    ).all()


@pytest.mark.parametrize("cls", [GradLaplaceFDICA, NaturalGradLaplaceFDICA])
def test_fdica_loss_decreases(rng, cls):
    X = make_mixture(rng, n_channels=2, n_bins=17, n_frames=64)
    solver = cls(lr=0.05)
    Y = solver(X, iteration=30)
    losses = np.asarray(solver.loss)
    assert losses[-1] < losses[0]
    assert Y.shape == X.shape


def test_fdica_separates_convolutive_mixture(rng):
    mixture, images = synth_convolutive_mixture(rng, n_sources=2, n_samples=16000)
    X = stft(mixture, fft_size=512, hop_size=256)
    solver = NaturalGradLaplaceFDICA(lr=0.1, recordable_loss=False)
    Y = solver(X, iteration=100)
    y = np.asarray(istft(Y, fft_size=512, hop_size=256, length=mixture.shape[-1]))

    def si_sdr(e, t):
        a = np.sum(e * t) / np.sum(t**2)
        p = a * t
        return 10 * np.log10(np.sum(p**2) / np.sum((e - p) ** 2))

    def pair(est):
        a = np.mean([si_sdr(est[0], images[0]), si_sdr(est[1], images[1])])
        b = np.mean([si_sdr(est[0], images[1]), si_sdr(est[1], images[0])])
        return max(a, b)

    assert pair(y) > pair(mixture) + 3.0


def test_natural_grad_fdica_nonholonomic_raises(rng):
    X = make_mixture(rng, n_channels=2, n_bins=9, n_frames=16)
    solver = NaturalGradLaplaceFDICA(lr=0.1, is_holonomic=False)
    with pytest.raises(NotImplementedError):
        solver(X, iteration=1)


# --------------------------------------------------------------------------- #
# Beamformers
# --------------------------------------------------------------------------- #
def _steering_setup(rng, n_bins=33, n_channels=4, n_frames=500):
    """Point source with known steering vector + white noise."""
    a = np.exp(
        2j * np.pi * rng.rand(n_bins, n_channels)
    ) / np.sqrt(n_channels)  # (F, C)
    s = rng.randn(n_bins, n_frames) + 1j * rng.randn(n_bins, n_frames)
    noise = 0.1 * (
        rng.randn(n_channels, n_bins, n_frames)
        + 1j * rng.randn(n_channels, n_bins, n_frames)
    )
    X = a.T[:, :, None] * s[None] + noise  # (C, F, T)
    A = a[:, :, None]  # (F, C, 1) single source
    return X, A, s


def test_delay_sum_beamformer(rng):
    X, A, s = _steering_setup(rng)
    bf = DelaySumBeamformer(steering_vector=A)
    Y = bf(X)
    assert Y.shape == (1, 33, 500)
    # output should correlate strongly with the source image at mic 0
    img = A[:, 0, 0][:, None] * s
    corr = np.abs(np.vdot(Y[0], img)) / (np.linalg.norm(Y[0]) * np.linalg.norm(img))
    assert corr > 0.95


def test_mvdr_beamformer_improves_snr(rng):
    X, A, s = _steering_setup(rng)
    bf = MVDRBeamformer(steering_vector=A)
    Y = bf(X)
    img = A[:, 0, 0][:, None] * s  # source image at mic 0

    def err(est):
        alpha = np.vdot(img, est) / np.vdot(img, img)
        return np.linalg.norm(est - alpha * img) / np.linalg.norm(img)

    assert err(Y[0]) < err(X[0])


def test_mvdr_with_explicit_covariance(rng):
    """The reference wrapper has a latent TypeError here (beamform.py:117);
    ours honors the covariance."""
    X, A, s = _steering_setup(rng)
    Xb = X.transpose(1, 0, 2)
    R = np.mean(Xb[:, :, None, :] * Xb[:, None, :, :].conj(), axis=3)
    bf = MVDRBeamformer(steering_vector=A)
    Y1 = bf(X, covariance=R)
    Y2 = np.asarray(bf(X))
    np.testing.assert_allclose(Y1, Y2, atol=1e-5)


def test_max_snr_beamformer(rng):
    X, A, s = _steering_setup(rng)
    a = A[:, :, 0]
    Rs = a[:, :, None] * a[:, None, :].conj() * np.mean(
        np.abs(s) ** 2, axis=1
    )[:, None, None]
    Rn = 0.01 * np.tile(np.eye(4), (33, 1, 1))
    bf = MaxSNRBeamformer()
    Y = bf(X, signal_covariance=Rs, noise_covariance=Rn)
    img = A[:, 0, 0][:, None] * s
    corr = np.abs(np.vdot(Y[0], img)) / (np.linalg.norm(Y[0]) * np.linalg.norm(img))
    assert corr > 0.95


# --------------------------------------------------------------------------- #
# ProxLaplaceIVA
# --------------------------------------------------------------------------- #
def test_prox_iva_loss_decreases(rng):
    X = make_mixture(rng, n_channels=2, n_bins=17, n_frames=48)
    solver = ProxLaplaceIVA(step=0.5)
    Y = solver(X, iteration=50)
    losses = np.asarray(solver.loss)
    assert losses[-1] < losses[0], losses[:5]
    assert Y.shape == X.shape


def test_prox_iva_separates(rng):
    mixture, images = synth_convolutive_mixture(rng, n_sources=2, n_samples=8000)
    X = stft(mixture, fft_size=256, hop_size=128)
    solver = ProxLaplaceIVA(recordable_loss=False)
    Y = solver(X, iteration=100)
    y = np.asarray(istft(Y, fft_size=256, hop_size=128, length=mixture.shape[-1]))

    def si_sdr(e, t):
        a = np.sum(e * t) / np.sum(t**2)
        p = a * t
        return 10 * np.log10(np.sum(p**2) / np.sum((e - p) ** 2))

    def pair(est):
        a = np.mean([si_sdr(est[0], images[0]), si_sdr(est[1], images[1])])
        b = np.mean([si_sdr(est[0], images[1]), si_sdr(est[1], images[0])])
        return max(a, b)

    assert pair(y) > pair(mixture) + 3.0, (pair(mixture), pair(y))


def test_sparse_prox_iva_raises():
    with pytest.raises(NotImplementedError):
        SparseProxIVA()


def test_native_permutation_matches_numpy(rng):
    """The C permutation solver (if the toolchain builds it) must produce the
    exact permutations of the NumPy fallback."""
    from audio_source_separation_tpu.native import solve_permutation_native
    import itertools

    n_sources, n_bins, n_frames = 3, 24, 40
    Y = np.abs(rng.randn(n_sources, n_bins, n_frames)) + 0.05
    P = Y.transpose(1, 0, 2)
    norm = np.sqrt(np.sum(P**2, axis=1, keepdims=True))
    P = P / np.maximum(norm, 1e-12)
    correlation = np.sum(P @ P.transpose(0, 2, 1), axis=(1, 2))
    order = np.argsort(correlation)

    perms = solve_permutation_native(P, order)
    if perms is None:
        pytest.skip("native toolchain unavailable")

    # numpy reference of the greedy loop
    expected = np.tile(np.arange(n_sources), (n_bins, 1))
    crit = P[order[0]].copy()
    permutations = list(itertools.permutations(range(n_sources)))
    for idx in range(1, n_bins):
        f = order[idx]
        best, best_perm = -np.inf, None
        for perm in permutations:
            score = np.sum(crit * P[f, perm, :])
            if score > best:
                best, best_perm = score, perm
        crit = crit + P[f, best_perm, :]
        expected[f] = best_perm
    np.testing.assert_array_equal(perms, expected)
