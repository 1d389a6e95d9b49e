"""Test configuration: CPU backend with 8 virtual devices and float64.

Tests run on a virtual 8-device CPU mesh (no multi-chip hardware available);
x64 is enabled so numerical-parity tests against NumPy/SciPy references are
meaningful at double precision.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be imported by a pytest plugin; the backend is initialized
# lazily, so config updates still take effect here.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(111)


def make_mixture(rng, n_channels=2, n_bins=17, n_frames=32, dtype=np.complex128):
    """Random complex mixture spectrogram with reproducible seeding."""
    X = rng.randn(n_channels, n_bins, n_frames) + 1j * rng.randn(
        n_channels, n_bins, n_frames
    )
    return X.astype(dtype)


@pytest.fixture
def mixture(rng):
    return make_mixture(rng)


def synth_convolutive_mixture(rng, n_sources=2, n_samples=16000, sr=16000, taps=8):
    """Synthesize a tiny instantaneous+short-FIR convolutive mixture of
    amplitude-modulated tones (stands in for the reference's MIRD fixtures)."""
    t = np.arange(n_samples) / sr
    sources = []
    mods = [3.0, 5.0, 7.0, 11.0]
    for n in range(n_sources):
        # broadband speech-like sources: noise carriers with distinct
        # on/off amplitude envelopes (IVA exploits envelope independence)
        env = 0.5 * (1 + np.sign(np.sin(2 * np.pi * mods[n] * t + 0.7 * n)))
        env = np.convolve(env, np.ones(64) / 64, mode="same")
        s = env * rng.randn(n_samples)
        sources.append(s)
    sources = np.stack(sources)  # (n_sources, n_samples)
    mixture = np.zeros((n_sources, n_samples))
    images_ref = np.zeros((n_sources, n_samples))  # per-source image at mic 0
    for m in range(n_sources):
        for n in range(n_sources):
            h = 0.2 * rng.randn(taps) * np.exp(-0.7 * np.arange(taps))
            delay = (3 * m + 5 * n) % taps
            h[delay] += 1.0 if m == n else 0.8
            contribution = np.convolve(sources[n], h)[:n_samples]
            mixture[m] += contribution
            if m == 0:
                images_ref[n] = contribution
    return mixture, images_ref
