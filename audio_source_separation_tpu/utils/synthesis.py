"""Convolutive-mixture synthesis (the ``egs/*/prepare.sh`` pipeline as a
library function).

The reference's driver layer (8 near-identical copies of
``egs/bss-example/*/local/prepare.py:49-77``) downloads CMU-ARCTIC speech and
MIRD room impulse responses, trims sources to a common length, and convolves
each source with the RIR for its angle at every microphone.  This module is
that synthesis step as a function over user-supplied sources and impulse
responses (no network access), plus a deterministic synthetic-RIR generator
for tests/benchmarks.
"""

import numpy as np


def convolutive_mixture(sources, impulse_responses, n_samples=None):
    """Mix sources through per-(source, mic) impulse responses.

    Args:
        sources: ``(n_sources, n_samples)`` dry signals.
        impulse_responses: ``(n_sources, n_mics, taps)`` RIRs.
        n_samples: output length (default: source length).
    Returns:
        ``(mixture (n_mics, n_samples), images (n_sources, n_mics, n_samples))``
        where ``images[n, m]`` is source ``n``'s contribution at mic ``m``
        (the ground truth for image-domain SI-SDR).
    """
    sources = np.asarray(sources)
    impulse_responses = np.asarray(impulse_responses)
    n_sources, length = sources.shape
    _, n_mics, _ = impulse_responses.shape
    if n_samples is None:
        n_samples = length

    images = np.zeros((n_sources, n_mics, n_samples))
    for n in range(n_sources):
        for m in range(n_mics):
            conv = np.convolve(sources[n], impulse_responses[n, m])
            images[n, m] = conv[:n_samples]
    mixture = images.sum(axis=0)
    return mixture, images


def synthetic_room_impulse_responses(
    n_sources, n_mics, taps=64, decay=0.3, seed=111, sr=16000, max_delay=8
):
    """Deterministic exponential-decay RIRs with distinct direct-path delays
    per (source, mic) — a network-free stand-in for the MIRD fixtures."""
    rng = np.random.RandomState(seed)
    rirs = np.zeros((n_sources, n_mics, taps))
    for n in range(n_sources):
        for m in range(n_mics):
            delay = (3 * m + 5 * n) % max_delay
            tail = rng.randn(taps) * np.exp(-np.arange(taps) / (decay * taps))
            rirs[n, m] = 0.2 * tail
            rirs[n, m, delay] += 1.0 if (m % n_sources) == n else 0.8
    return rirs


# --------------------------------------------------------------------------- #
# MIRD geometry (the reference's egs data-preparation fixtures)
# --------------------------------------------------------------------------- #
# The reference convolves CMU-ARCTIC speech with measured MIRD impulse
# responses on an 8-mic linear array at 13 angles
# (``egs/bss-example/iva/local/prepare.py:49-77``).  MIRD's angle grid,
# encoded as in its filenames: 0..90 in 15° steps plus 270..345 (= −90..−15).
MIRD_DEGREES = [0, 15, 30, 45, 60, 75, 90, 270, 285, 300, 315, 330, 345]


def mird_geometry_rirs(
    degree,
    mic_intervals="3-3-3-8-3-3-3",
    distance=1.0,
    reverb=0.16,
    sr=16000,
    samples=None,
    seed=111,
    sound_speed=343.0,
):
    """Synthetic far-field RIRs on the MIRD linear-array geometry — the
    network-free stand-in for the measured MIRD .mat files.

    Geometry matches the dataset the reference downloads: a linear array
    whose adjacent-mic spacings are given in centimetres by ``mic_intervals``
    (MIRD configurations ``"8-8-8-8-8-8-8"`` and ``"3-3-3-8-3-3-3"``), source
    at ``distance`` metres and ``degree`` on MIRD's angle grid (0..90 and
    270..345 ≡ −90..−15).  Each mic gets a windowed-sinc fractional-delay
    direct path (far-field delay ``x_m sin θ / c``) plus a causal
    exponentially-decaying diffuse tail calibrated to T60 = ``reverb``.

    Returns ``(samples, n_mics)`` — the orientation of the reference's
    ``loadmat(...)['impulse_response']``.
    """
    intervals_cm = [float(v) for v in str(mic_intervals).split("-")]
    positions = np.concatenate([[0.0], np.cumsum(intervals_cm)]) / 100.0
    positions = positions - positions.mean()
    n_mics = len(positions)
    theta = np.deg2rad(degree if degree <= 90 else degree - 360)
    if samples is None:
        samples = int(0.5 * sr)

    t60_samples = max(int(reverb * sr), 1)
    n = np.arange(samples)
    decay = np.exp(-6.908 * n / t60_samples)  # −60 dB at T60
    rng = np.random.RandomState(seed + int(degree))
    rir = np.zeros((samples, n_mics))
    base_delay = distance / sound_speed * sr + 8.0  # headroom for the sinc
    for m in range(n_mics):
        tau = base_delay + positions[m] * np.sin(theta) / sound_speed * sr
        x = n - tau
        window = 0.5 * (1 + np.cos(np.pi * np.clip(x / 8.0, -1, 1)))
        direct = np.sinc(x) * window / max(distance, 1e-3)
        tail = 0.12 * rng.randn(samples) * decay / max(distance, 1e-3)
        tail[: int(np.floor(tau)) + 1] = 0.0  # causal
        rir[:, m] = direct + tail
    return rir
