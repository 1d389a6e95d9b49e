"""Tests for metrics, callbacks, synthesis harness, and misc parity stubs."""

import os

import numpy as np
import pytest

from audio_source_separation_tpu.utils import (
    si_sdr,
    pit_si_sdr,
    si_sdr_improvement,
    bss_eval_sources,
    convolutive_mixture,
    synthetic_room_impulse_responses,
    SDRImprovementCallback,
    StateSnapshotCallback,
    LossLogger,
    mu_law_compand,
    inv_mu_law_compand,
)
from audio_source_separation_tpu.algorithm.ica import FixedPointICA
from audio_source_separation_tpu.models.psdtf import nonparallel_inv


def test_si_sdr_basic(rng):
    t = rng.randn(1000)
    np.testing.assert_allclose(float(si_sdr(3.0 * t, t)), 160, atol=40)  # near-inf
    noisy = t + 0.1 * rng.randn(1000)
    value = float(si_sdr(noisy, t))
    assert 15 < value < 25


def test_pit_si_sdr_picks_best_permutation(rng):
    a, b = rng.randn(500), rng.randn(500)
    targets = np.stack([a, b])
    estimates = np.stack([b + 0.01 * rng.randn(500), a + 0.01 * rng.randn(500)])
    value, perm = pit_si_sdr(estimates, targets)
    assert perm == (1, 0)
    assert value > 30


def test_si_sdr_improvement(rng):
    a, b = rng.randn(500), rng.randn(500)
    targets = np.stack([a, b])
    mixture_ref = a + b
    estimates = targets + 0.01 * rng.randn(2, 500)
    gain = si_sdr_improvement(estimates, mixture_ref, targets)
    assert gain > 20


def test_bss_eval_sources_identity(rng):
    refs = rng.randn(2, 2000)
    sdr, sir, sar, perm = bss_eval_sources(refs, refs[::-1], filter_length=8)
    assert (sdr > 80).all()
    assert list(perm) == [1, 0]
    # noisy estimates: sdr finite and ordered sensibly
    ests = refs + 0.1 * rng.randn(2, 2000)
    sdr, sir, sar, perm = bss_eval_sources(refs, ests, filter_length=8)
    assert (sdr > 10).all() and (sir >= sdr - 1).all()


def test_bss_eval_projection_matches_naive_lstsq(rng):
    """The FFT block-Toeplitz joint projection equals the explicit
    shift-matrix least squares (the BSS Eval definition) on small signals."""
    from audio_source_separation_tpu.utils.metrics import _fir_projections

    n, L = 257, 6
    refs = rng.randn(2, n)
    est = rng.randn(n)
    proj = _fir_projections(refs, est, L, range(2))
    # naive: columns are zero-padded shifts of each reference
    n_out = n + L - 1
    columns = []
    for j in range(2):
        for a in range(L):
            col = np.zeros(n_out)
            col[a : a + n] = refs[j]
            columns.append(col)
    A = np.stack(columns, axis=1)
    est_pad = np.zeros(n_out)
    est_pad[:n] = est
    naive, *_ = np.linalg.lstsq(A, est_pad, rcond=None)
    naive_proj = A @ naive
    np.testing.assert_allclose(proj, naive_proj, atol=1e-8)


def test_bss_eval_filter_invariance(rng):
    """An estimate that is an FIR filtering of its reference (within
    filter_length taps) scores near-perfect SDR — the v3 semantics the old
    independent-projection variant lacked for correlated references."""
    refs = rng.randn(2, 4000)
    h = rng.randn(5)
    filtered = np.stack(
        [np.convolve(refs[0], h)[:4000], np.convolve(refs[1], h[::-1])[:4000]]
    )
    sdr, sir, sar, perm = bss_eval_sources(refs, filtered, filter_length=16)
    # SDR is bounded by the convolution-tail edge effect (the truncated
    # estimate's tail is outside the projection span — mir_eval behaves the
    # same); SIR shows the near-perfect interference rejection
    assert (sdr > 25).all()
    assert (sir > 40).all()
    assert list(perm) == [0, 1]


def test_bss_eval_improvement_positive_for_separation(rng):
    from audio_source_separation_tpu.utils.metrics import bss_eval_improvement

    a, b = rng.randn(3000), rng.randn(3000)
    targets = np.stack([a, b])
    mixture_ref = a + b
    estimates = targets + 0.05 * rng.randn(2, 3000)
    gain = bss_eval_improvement(estimates, mixture_ref, targets, filter_length=32)
    assert gain > 15


def test_convolutive_mixture_shapes(rng):
    sources = rng.randn(2, 4000)
    rirs = synthetic_room_impulse_responses(2, 3, taps=32)
    mixture, images = convolutive_mixture(sources, rirs)
    assert mixture.shape == (3, 4000)
    assert images.shape == (2, 3, 4000)
    np.testing.assert_allclose(images.sum(axis=0), mixture)


def test_callbacks_end_to_end(rng, tmp_path):
    from audio_source_separation_tpu.models import GaussILRMA
    from audio_source_separation_tpu.transform import stft

    from conftest import synth_convolutive_mixture

    mixture, images = synth_convolutive_mixture(rng, n_sources=2, n_samples=4000)
    fft_size, hop_size = 256, 128
    X = stft(mixture, fft_size=fft_size, hop_size=hop_size)

    printed = []
    sdri = SDRImprovementCallback(
        images, fft_size=fft_size, hop_size=hop_size, length=mixture.shape[-1]
    )
    snap = StateSnapshotCallback(str(tmp_path), fields=("basis", "activation"))
    logger = LossLogger(stride=2, printer=printed.append)

    np.random.seed(111)
    solver = GaussILRMA(n_basis=2, callbacks=[sdri, snap, logger])
    solver(X, iteration=4)

    assert len(sdri.history) == 5  # init + 4 iterations
    assert sdri.history[-1] >= sdri.history[0] - 1.0
    files = sorted(os.listdir(tmp_path))
    assert len(files) == 5
    payload = np.load(os.path.join(tmp_path, files[-1]))
    assert "basis" in payload and "activation" in payload
    assert len(printed) >= 2


def test_bss_eval_callback_end_to_end(rng):
    from audio_source_separation_tpu.models import GaussILRMA
    from audio_source_separation_tpu.transform import stft
    from audio_source_separation_tpu.utils import BSSEvalCallback

    from conftest import synth_convolutive_mixture

    mixture, images = synth_convolutive_mixture(rng, n_sources=2, n_samples=4000)
    fft_size, hop_size = 256, 128
    X = stft(mixture, fft_size=fft_size, hop_size=hop_size)

    cb = BSSEvalCallback(
        images,
        fft_size=fft_size,
        hop_size=hop_size,
        length=mixture.shape[-1],
        filter_length=32,
        stride=2,
    )
    np.random.seed(111)
    solver = GaussILRMA(n_basis=2, callbacks=cb)
    solver(X, iteration=4)

    # init + iterations 2 and 4 (stride 2)
    assert len(cb.history) == 3
    sdr, sir, sar = cb.history[-1]
    assert sdr.shape == (2,) and np.isfinite(sdr).all()
    assert np.isfinite(sir).all() and np.isfinite(sar).all()
    assert len(cb.sdri_history) == 3
    assert cb.sdri_history[-1] >= cb.sdri_history[0] - 1.0


def test_mu_law_roundtrip(rng):
    x = np.clip(rng.randn(100) * 0.3, -1, 1)
    y = mu_law_compand(x)
    np.testing.assert_allclose(inv_mu_law_compand(y), x, atol=1e-12)


def test_fixed_point_ica_stub():
    ica = FixedPointICA(n_channels=4)
    assert ica.demix_filter.shape == (4, 4)


def test_nonparallel_inv(rng):
    A = rng.randn(5, 3, 3)
    A = A @ A.transpose(0, 2, 1) + 0.5 * np.eye(3)
    np.testing.assert_allclose(nonparallel_inv(A), np.linalg.inv(A), atol=1e-8)
    np.testing.assert_allclose(
        nonparallel_inv(A, use_cholesky=False), np.linalg.inv(A), atol=1e-8
    )


def test_checkpoint_save_load_resume(rng, tmp_path):
    from audio_source_separation_tpu.models import GaussILRMA
    from conftest import make_mixture

    X = make_mixture(rng, n_channels=2, n_bins=17, n_frames=24)
    np.random.seed(111)
    s1 = GaussILRMA(n_basis=3, recordable_loss=False)
    s1(X, iteration=3)
    ckpt = str(tmp_path / "state.npz")
    s1.save_state(ckpt)

    s2 = GaussILRMA(n_basis=3, recordable_loss=False)
    s2(X, iteration=2, **GaussILRMA.load_state(ckpt))

    np.random.seed(111)
    s3 = GaussILRMA(n_basis=3, recordable_loss=False)
    s3(X, iteration=5)
    np.testing.assert_allclose(
        np.asarray(s2.demix_filter), np.asarray(s3.demix_filter), atol=1e-8
    )


def test_benchmark_solver_runs(rng):
    from audio_source_separation_tpu.models import AuxLaplaceIVA
    from audio_source_separation_tpu.runtime import benchmark_solver
    from conftest import make_mixture

    X = make_mixture(rng, n_channels=2, n_bins=17, n_frames=24)
    ips, compile_s = benchmark_solver(AuxLaplaceIVA(), X, iteration=5)
    assert ips > 0 and compile_s > 0


def test_iteration_timer(rng):
    from audio_source_separation_tpu.models import AuxLaplaceIVA
    from audio_source_separation_tpu.runtime import IterationTimer
    from conftest import make_mixture

    X = make_mixture(rng)
    timer = IterationTimer()
    AuxLaplaceIVA(callbacks=timer, recordable_loss=False)(X, iteration=3)
    assert len(timer.durations) == 3


def test_mird_prepare_driver_synthetic_fallback(tmp_path):
    """The D1 preparation driver (reference egs/bss-example/iva/local/
    prepare.py:20-77): degree-grid x 8-mic MIRD convolution reproducing the
    reference's file layout, on the synthetic geometry fallback (offline)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    try:
        from prepare_mixture import prepare_mird
    finally:
        sys.path.pop(0)
    from audio_source_separation_tpu.utils import read_wav

    root = str(tmp_path / "data")
    written = prepare_mird(
        root, titles=("aew", "axb"), degrees=[0, 330], duration=0.1
    )
    assert len(written) == 2 * 2 * 8  # titles x degrees x mics
    for title in ("aew", "axb"):
        base = os.path.join(root, "cmu_us_{}_arctic/trimmed".format(title))
        assert os.path.exists(os.path.join(base, "source-16000.wav"))
        for deg in (0, 330):
            for mic in range(8):
                p = os.path.join(
                    base, "convolved-16000_deg{}-mic{}.wav".format(deg, mic)
                )
                assert os.path.exists(p), p
    x, sr = read_wav(written[0])
    assert sr == 16000 and np.isfinite(x).all() and np.abs(x).max() > 0


def test_mird_geometry_rirs_delays_follow_angle():
    """Far-field geometry: at +90 deg the wavefront reaches the far mic last;
    the per-mic direct-path delay ordering must follow the array axis."""
    from audio_source_separation_tpu.utils.synthesis import mird_geometry_rirs

    rir = mird_geometry_rirs(90, mic_intervals="8-8-8-8-8-8-8", samples=512)
    assert rir.shape == (512, 8)
    peaks = np.argmax(np.abs(rir), axis=0)
    assert np.all(np.diff(peaks) >= 0) and peaks[-1] > peaks[0]

    rir_neg = mird_geometry_rirs(270, mic_intervals="8-8-8-8-8-8-8", samples=512)
    peaks_neg = np.argmax(np.abs(rir_neg), axis=0)
    assert np.all(np.diff(peaks_neg) <= 0) and peaks_neg[0] > peaks_neg[-1]
