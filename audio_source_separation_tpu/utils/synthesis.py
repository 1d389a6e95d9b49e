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
