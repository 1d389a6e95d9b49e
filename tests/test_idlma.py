"""IDLMA tests: host-callable DNN (numpy and torch) and jittable JAX DNN
variance models; oracle-variance separation quality."""

import numpy as np
import pytest

from audio_source_separation_tpu.models import GaussIDLMA, torch_dnn
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


def _setup(rng, n_samples=8000, fft_size=256, hop_size=128):
    mixture, images = synth_convolutive_mixture(rng, n_sources=2, n_samples=n_samples)
    X = np.asarray(stft(mixture, fft_size=fft_size, hop_size=hop_size))
    S = np.asarray(stft(images, fft_size=fft_size, hop_size=hop_size))
    return mixture, images, X, S


def test_idlma_with_oracle_numpy_dnn(rng):
    """An 'oracle DNN' returning the true source amplitudes should drive IDLMA
    to strong separation — the pure host-callable path."""
    mixture, images, X, S = _setup(rng)
    oracle_amp = np.abs(S)

    def oracle_dnn(amp_in):
        return oracle_amp

    solver = GaussIDLMA()
    Y = solver(X, iteration=10, dnn=oracle_dnn)
    y = np.asarray(istft(Y, fft_size=256, hop_size=128, length=mixture.shape[-1]))
    losses = np.asarray(solver.loss)
    assert len(losses) == 11
    assert _pair(y, images) > _pair(mixture, images) + 5.0


def test_idlma_with_jax_dnn_scan(rng):
    """A jittable JAX variance model runs fully inside lax.scan."""
    import jax.numpy as jnp

    mixture, images, X, S = _setup(rng)
    oracle_amp = jnp.asarray(np.abs(S))

    def jax_dnn(amp_in):
        # smooth the running estimate toward the oracle (jit-safe)
        return 0.5 * amp_in + 0.5 * oracle_amp

    solver = GaussIDLMA(jax_dnn=True)
    Y = solver(X, iteration=10, dnn=jax_dnn)
    y = np.asarray(istft(Y, fft_size=256, hop_size=128, length=mixture.shape[-1]))
    assert _pair(y, images) > _pair(mixture, images) + 3.0
    losses = np.asarray(solver.loss)
    assert np.isfinite(losses).all()


def test_idlma_with_torch_module(rng):
    """The reference's execution model: a PyTorch module under no_grad."""
    torch = pytest.importorskip("torch")

    mixture, images, X, S = _setup(rng, n_samples=4000)
    oracle_amp = torch.tensor(np.abs(S), dtype=torch.float32)

    class OracleNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.dummy = torch.nn.Parameter(torch.zeros(1))

        def forward(self, x):
            return oracle_amp + 0 * self.dummy

    solver = GaussIDLMA()
    Y = solver(X, iteration=5, dnn=torch_dnn(OracleNet()))
    assert Y.shape == X.shape
    assert np.isfinite(np.asarray(solver.loss)).all()


def test_idlma_callback(rng):
    mixture, images, X, S = _setup(rng, n_samples=4000)
    seen = []
    solver = GaussIDLMA(callback=lambda s: seen.append(np.asarray(s.demix_filter)))
    solver(X, iteration=3, dnn=lambda amp: np.abs(np.asarray(S)))
    assert len(seen) == 3
