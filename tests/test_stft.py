"""scipy-parity tests for the STFT frontend (SURVEY.md §7.1 requirement)."""

import numpy as np
import pytest
from scipy import signal as ss

from audio_source_separation_tpu.transform import (
    stft,
    istft,
    build_window,
    build_optimal_window,
)


@pytest.mark.parametrize("fft_size,hop_size", [(8, 2), (16, 8), (64, 16), (512, 256)])
@pytest.mark.parametrize("window_fn", ["hann", "hamming"])
def test_stft_matches_scipy(rng, fft_size, hop_size, window_fn):
    T = 1000
    x = rng.randn(T)
    _, _, expected = ss.stft(
        x, nperseg=fft_size, noverlap=fft_size - hop_size, window=window_fn
    )
    actual = np.asarray(stft(x, fft_size=fft_size, hop_size=hop_size, window_fn=window_fn))
    assert actual.shape == expected.shape
    np.testing.assert_allclose(actual, expected, atol=1e-12)


def test_stft_batched(rng):
    x = rng.randn(3, 500)
    _, _, expected = ss.stft(x, nperseg=64, noverlap=48)
    actual = np.asarray(stft(x, fft_size=64, hop_size=16))
    np.testing.assert_allclose(actual, expected, atol=1e-12)


@pytest.mark.parametrize("fft_size,hop_size", [(8, 2), (64, 16), (512, 256)])
def test_istft_matches_scipy(rng, fft_size, hop_size):
    T = 2000
    x = rng.randn(T)
    _, _, Z = ss.stft(x, nperseg=fft_size, noverlap=fft_size - hop_size)
    _, expected = ss.istft(Z, nperseg=fft_size, noverlap=fft_size - hop_size)
    actual = np.asarray(istft(Z, fft_size=fft_size, hop_size=hop_size))
    assert actual.shape == expected.shape
    np.testing.assert_allclose(actual, expected, atol=1e-12)


def test_roundtrip_with_length(rng):
    T = 3333
    x = rng.randn(2, T)
    X = stft(x, fft_size=256, hop_size=128)
    y = np.asarray(istft(X, fft_size=256, hop_size=128, length=T))
    assert y.shape == (2, T)
    np.testing.assert_allclose(y, x, atol=1e-10)


def test_build_window_matches_scipy():
    for fn, ref in [("hann", "hann"), ("hamming", "hamming")]:
        w = np.asarray(build_window(32, window_fn=fn))
        expected = ss.get_window(ref, 32)
        np.testing.assert_allclose(w, expected, atol=1e-12)


def test_build_window_rejects_unknown():
    with pytest.raises(ValueError):
        build_window(32, window_fn="kaiser")


def test_build_optimal_window_cola():
    w = build_window(16, "hann")
    opt = np.asarray(build_optimal_window(w, hop_size=4))
    assert opt.shape == (16,)
    # hann with 75% overlap satisfies COLA: OLA of w*opt should be constant 1
    total = np.zeros(64)
    for start in range(0, 48, 4):
        total[start : start + 16] += np.asarray(w) * opt
    np.testing.assert_allclose(total[16:32], 1.0, atol=1e-10)
