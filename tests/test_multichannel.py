"""Higher channel-count coverage (C=3, C=4): separation quality and the
overdetermined FastMNMF configuration from BASELINE.md."""

import numpy as np
import pytest

from audio_source_separation_tpu.models import (
    AuxLaplaceIVA,
    FastMultichannelISNMF,
    GaussILRMA,
)
from audio_source_separation_tpu.transform import istft, stft
from audio_source_separation_tpu.utils import (
    convolutive_mixture,
    synthetic_room_impulse_responses,
)


def _sources(rng, n_sources, n_samples=12000, sr=16000):
    t = np.arange(n_samples) / sr
    mods = [3.0, 5.0, 7.0, 11.0]
    out = []
    for n in range(n_sources):
        env = 0.5 * (1 + np.sign(np.sin(2 * np.pi * mods[n] * t + 0.7 * n)))
        env = np.convolve(env, np.ones(64) / 64, mode="same")
        out.append(env * rng.randn(n_samples))
    return np.stack(out)


def _si_sdr(e, t):
    a = np.sum(e * t) / np.sum(t**2)
    p = a * t
    return 10 * np.log10(np.sum(p**2) / np.sum((e - p) ** 2))


def _pit(est, refs):
    import itertools

    n = len(refs)
    best = -np.inf
    for perm in itertools.permutations(range(n)):
        v = np.mean([_si_sdr(est[i], refs[perm[i]]) for i in range(n)])
        best = max(best, v)
    return best


def test_auxiva_three_channels(rng):
    srcs = _sources(rng, 3)
    rirs = synthetic_room_impulse_responses(3, 3, taps=8)
    mixture, images = convolutive_mixture(srcs, rirs)
    X = stft(mixture, fft_size=512, hop_size=256)
    solver = AuxLaplaceIVA(recordable_loss=False)
    Y = solver(np.asarray(X), iteration=30)
    y = np.asarray(istft(Y, fft_size=512, hop_size=256, length=mixture.shape[-1]))
    refs = [images[n, 0] for n in range(3)]
    assert _pit(y, refs) > _pit(mixture, refs) + 3.0


def test_ilrma_three_channels(rng):
    srcs = _sources(rng, 3)
    rirs = synthetic_room_impulse_responses(3, 3, taps=8)
    mixture, images = convolutive_mixture(srcs, rirs)
    X = stft(mixture, fft_size=512, hop_size=256)
    np.random.seed(111)
    solver = GaussILRMA(n_basis=2, recordable_loss=False)
    Y = solver(np.asarray(X), iteration=30)
    y = np.asarray(istft(Y, fft_size=512, hop_size=256, length=mixture.shape[-1]))
    refs = [images[n, 0] for n in range(3)]
    assert _pit(y, refs) > _pit(mixture, refs) + 3.0


def test_fastmnmf_four_mics_two_sources(rng):
    """BASELINE.md config: FastMNMF full-rank spatial model, 4-channel input,
    n_sources=2 (overdetermined)."""
    srcs = _sources(rng, 2, n_samples=8000)
    rirs = synthetic_room_impulse_responses(2, 4, taps=8)
    mixture, images = convolutive_mixture(srcs, rirs)
    X = stft(mixture, fft_size=256, hop_size=128)
    np.random.seed(111)
    solver = FastMultichannelISNMF(n_basis=4, n_sources=2, recordable_loss=True)
    Y = solver(np.asarray(X), iteration=30)
    assert Y.shape[0] == 2
    losses = np.asarray(solver.loss)
    assert losses[-1] < losses[0]
    y = np.asarray(istft(Y, fft_size=256, hop_size=128, length=mixture.shape[-1]))
    refs = [images[n, 0] for n in range(2)]
    assert _pit(y, refs) > _pit(mixture[:2], refs) + 2.0
