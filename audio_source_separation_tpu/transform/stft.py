"""STFT / iSTFT frontend (pure JAX, scipy-parity).

The reference wraps ``scipy.signal.stft/istft`` with
``nperseg=fft_size, noverlap=fft_size-hop_size, window='hann'``
(``src/transform/stft.py:4-17``, byte-duplicated in ``src/algorithm/stft.py``).
This module re-implements those exact semantics as framing + rFFT so the whole
transform stays on the TPU (strided gather → window multiply → batched rFFT on
static shapes), verified bit-for-bit against scipy in ``tests/test_stft.py``.

scipy semantics reproduced:
  * periodic (``sym=False``) hann/hamming windows;
  * ``boundary='zeros'``: pad ``nperseg//2`` zeros on both ends;
  * ``padded=True``: zero-pad so the signal divides into whole hops;
  * forward scaling by ``1 / window.sum()`` (scipy ``mode='stft'``);
  * inverse: irfft, scale by ``window.sum()``, windowed overlap-add
    normalized by the OLA of ``window**2`` (guarded at ``1e-10``), then the
    boundary padding is trimmed.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _is_tracing(*values):
    return any(isinstance(v, jax.core.Tracer) for v in values)


def build_window(fft_size, window_fn="hann", dtype=jnp.float64):
    """Periodic (DFT-even) analysis window; reference ``transform/stft.py:19-27``."""
    n = np.arange(fft_size)
    if window_fn == "hann":
        window = 0.5 - 0.5 * np.cos(2 * np.pi * n / fft_size)
    elif window_fn == "hamming":
        window = 0.54 - 0.46 * np.cos(2 * np.pi * n / fft_size)
    elif window_fn in ("boxcar", "rectangular", None):
        window = np.ones(fft_size)
    else:
        raise ValueError("Not support {} window.".format(window_fn))
    return jnp.asarray(window, dtype=dtype)


def build_optimal_window(window, hop_size=None):
    """COLA-normalized synthesis window; reference ``transform/stft.py:29-47``."""
    window = jnp.asarray(window)
    window_length = window.shape[0]
    if hop_size is None:
        hop_size = window_length // 2
    n_shifts = window_length // hop_size
    shifts = jnp.stack(
        [jnp.roll(window, hop_size * idx) for idx in range(n_shifts)], axis=0
    )
    norm = jnp.sum(shifts**2, axis=0)
    return window / norm


def _frame_indices(n_samples, fft_size, hop_size):
    n_frames = 1 + (n_samples - fft_size) // hop_size
    starts = np.arange(n_frames) * hop_size
    return starts[:, None] + np.arange(fft_size)[None, :]


def stft(input, fft_size, hop_size=None, window_fn="hann", normalize=False):
    """Short-time Fourier transform.

    Args:
        input: real signal ``(..., n_samples)``.
        fft_size: FFT / window length (scipy ``nperseg``).
        hop_size: hop length (scipy ``nperseg - noverlap``); default ``fft_size//2``.
    Returns:
        complex spectrogram ``(..., n_bins, n_frames)`` with
        ``n_bins = fft_size//2 + 1``, matching
        ``scipy.signal.stft(x, nperseg=fft_size, noverlap=fft_size-hop_size)``.

    Inside ``jit`` this traces as pure jnp ops; called eagerly it runs jitted
    with a real-valued boundary and returns host NumPy (the TPU runtime does
    not support complex buffers at the executable boundary).
    """
    if not _is_tracing(input):
        return _eager_stft(
            np.asarray(input), fft_size, hop_size, window_fn
        )
    if hop_size is None:
        hop_size = fft_size // 2
    x = jnp.asarray(input)
    real_dtype = jnp.result_type(x.dtype, jnp.float32)
    x = x.astype(real_dtype)
    window = build_window(fft_size, window_fn=window_fn, dtype=real_dtype)

    half = fft_size // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, half)])
    n_samples = x.shape[-1]
    # scipy `padded=True`: extend to a whole number of hops
    remainder = (n_samples - fft_size) % hop_size
    if remainder != 0:
        pad = hop_size - remainder
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        n_samples += pad

    idx = _frame_indices(n_samples, fft_size, hop_size)
    frames = x[..., idx] * window  # (..., n_frames, fft_size)
    spec = jnp.fft.rfft(frames, axis=-1) / jnp.sum(window)
    return jnp.swapaxes(spec, -2, -1)  # (..., n_bins, n_frames)


def istft(input, fft_size, hop_size=None, window_fn="hann", normalize=False, length=None):
    """Inverse STFT matching ``scipy.signal.istft`` (boundary trim included).

    Args:
        input: complex spectrogram ``(..., n_bins, n_frames)``.
        length: optional truncation of the output (reference
            ``transform/stft.py:11-17`` truncates to ``length``).
    Returns:
        real signal ``(..., n_samples)``.

    Eager calls run jitted with a real-pair input boundary and return host
    NumPy (see :func:`stft`).
    """
    if not _is_tracing(input):
        return _eager_istft(input, fft_size, hop_size, window_fn, length)
    if hop_size is None:
        hop_size = fft_size // 2
    X = jnp.asarray(input)
    n_frames = X.shape[-1]
    real_dtype = jnp.finfo(X.dtype).dtype if jnp.iscomplexobj(X) else X.dtype
    window = build_window(fft_size, window_fn=window_fn, dtype=real_dtype)

    frames = jnp.fft.irfft(jnp.swapaxes(X, -2, -1), n=fft_size, axis=-1)
    frames = frames * jnp.sum(window) * window  # (..., n_frames, fft_size)

    n_samples = fft_size + (n_frames - 1) * hop_size
    idx = _frame_indices(n_samples, fft_size, hop_size)  # (n_frames, fft_size)

    flat_frames = frames.reshape((-1, n_frames, fft_size))
    out = jnp.zeros((flat_frames.shape[0], n_samples), dtype=real_dtype)
    out = out.at[:, idx].add(flat_frames)
    norm = jnp.zeros((n_samples,), dtype=real_dtype)
    norm = norm.at[idx].add(window**2)
    out = out / jnp.where(norm > 1e-10, norm, 1.0)
    out = out.reshape(X.shape[:-2] + (n_samples,))

    half = fft_size // 2
    out = out[..., half : n_samples - half]
    if length is not None:
        out = out[..., :length]
    return out


# --------------------------------------------------------------------------- #
# eager (host-boundary) paths
# --------------------------------------------------------------------------- #
@functools.lru_cache(maxsize=64)
def _jitted_stft(fft_size, hop_size, window_fn):
    from ..ops.packing import realify

    return jax.jit(
        realify(
            lambda x: stft(x, fft_size=fft_size, hop_size=hop_size, window_fn=window_fn)
        )
    )


def _eager_stft(x, fft_size, hop_size, window_fn):
    from ..ops.packing import to_host

    fn = _jitted_stft(fft_size, hop_size, window_fn)
    return to_host(fn(x))


@functools.lru_cache(maxsize=64)
def _jitted_istft(fft_size, hop_size, window_fn, length):
    from ..ops.packing import realify

    return jax.jit(
        realify(
            lambda X: istft(
                X,
                fft_size=fft_size,
                hop_size=hop_size,
                window_fn=window_fn,
                length=length,
            )
        )
    )


def _eager_istft(X, fft_size, hop_size, window_fn, length):
    from ..ops.packing import pack, to_host

    fn = _jitted_istft(fft_size, hop_size, window_fn, length)
    return to_host(fn(pack(np.asarray(X))))
