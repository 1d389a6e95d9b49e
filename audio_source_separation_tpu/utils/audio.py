"""WAV I/O and companding (host-side, NumPy).

Parity target: reference ``src/utils/utils_audio.py:4-24``.  I/O stays on the
host (it feeds HBM once per mixture); companding also has jnp-compatible math.
"""

import numpy as np
from scipy.io import wavfile


def read_wav(path):
    """Read a WAV file; int16 data is scaled by 1/32768 (reference convention)."""
    sr, signal = wavfile.read(path)
    if signal.dtype == np.int16:
        signal = signal / 32768
    elif signal.dtype == np.int32:
        signal = signal / 2147483648
    elif signal.dtype == np.uint8:
        signal = (signal.astype(np.float64) - 128) / 128
    else:
        signal = signal.astype(np.float64)
    return signal, sr


def write_wav(path, signal, sr, channel_last=True):
    """Write float signal as int16 WAV, scaled by 32768 and clipped."""
    signal = np.asarray(signal) * 32768
    signal = np.clip(signal, -32768, 32767).astype(np.int16)
    if signal.ndim not in (1, 2):
        raise ValueError("Only 1D or 2D signals are supported.")
    if signal.ndim == 2 and not channel_last:
        signal = signal.T
    wavfile.write(path, sr, signal)


def mu_law_compand(x, mu=255):
    return np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)


def inv_mu_law_compand(y, mu=255):
    return np.sign(y) * ((1 + mu) ** np.abs(y) - 1) / mu
