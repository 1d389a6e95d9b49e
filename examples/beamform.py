#!/usr/bin/env python
"""Beamforming driver with geometry-derived steering vectors — the library
equivalent of the reference's ``egs/bss-example/{dsbf,mvdr}`` notebooks and
the ``_test`` driver in ``bss/beamform.py:199-233``: a linear microphone
array, far-field steering vectors from source angles, DSBF or MVDR.

Example (2 sources at 0° and 90°, 8-mic linear array):
    python examples/beamform.py --input mixture8ch.wav --method mvdr \
        --degrees 0 90 --mic-positions -0.13 -0.10 -0.07 -0.04 0.04 0.07 0.10 0.13
"""

import argparse
import json
import os

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import audio_source_separation_tpu as asst
from audio_source_separation_tpu.models import DelaySumBeamformer, MVDRBeamformer
from audio_source_separation_tpu.utils import read_wav, write_wav

SOUND_SPEED = 340.0


def linear_array_steering(degrees, mic_positions, n_bins, sr, fft_size):
    """Far-field steering vectors for a linear array on the x-axis
    (reference geometry: ``beamform.py:199-203``).

    Returns ``(n_bins, n_mics, n_sources)`` complex.
    """
    degrees = np.asarray(degrees, dtype=float) / 180 * np.pi
    source_dir = np.stack([np.sin(degrees), np.cos(degrees)], axis=1)  # (S, 2)
    mic_positions = np.asarray(mic_positions, dtype=float)
    if mic_positions.ndim == 1:
        mic_positions = np.stack(
            [mic_positions, np.zeros_like(mic_positions)], axis=1
        )  # (M, 2)
    frequency = np.arange(n_bins) * sr / fft_size
    delay = mic_positions @ source_dir.T / SOUND_SPEED  # (M, S) seconds
    steering = np.exp(2j * np.pi * frequency[:, None, None] * delay[None])
    return steering / np.sqrt(mic_positions.shape[0])


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="multichannel WAV")
    parser.add_argument("--method", default="mvdr", choices=["dsbf", "mvdr"])
    parser.add_argument("--degrees", type=float, nargs="+", required=True)
    parser.add_argument("--mic-positions", type=float, nargs="+", required=True,
                        help="x-coordinates (meters) of the linear array")
    parser.add_argument("--fft-size", type=int, default=2048)
    parser.add_argument("--hop-size", type=int, default=None)
    parser.add_argument("--reference-id", type=int, default=0)
    parser.add_argument("--out", default="beamformed")
    args = parser.parse_args()
    hop = args.hop_size or args.fft_size // 2

    x, sr = read_wav(args.input)
    x = x.T  # (n_mics, n_samples)
    if x.shape[0] != len(args.mic_positions):
        raise SystemExit("channel count != number of mic positions")

    X = np.asarray(asst.stft(x, fft_size=args.fft_size, hop_size=hop))
    n_bins = X.shape[1]
    steering = linear_array_steering(
        args.degrees, args.mic_positions, n_bins, sr, args.fft_size
    )

    if args.method == "dsbf":
        beamformer = DelaySumBeamformer(
            steering_vector=steering, reference_id=args.reference_id
        )
    else:
        beamformer = MVDRBeamformer(
            steering_vector=steering, reference_id=args.reference_id
        )
    Y = beamformer(X)
    y = np.asarray(
        asst.istft(Y, fft_size=args.fft_size, hop_size=hop, length=x.shape[-1])
    )

    os.makedirs(args.out, exist_ok=True)
    for n in range(y.shape[0]):
        write_wav(os.path.join(args.out, "source_{}.wav".format(n)), y[n], sr)
    print(json.dumps({"method": args.method, "outputs": int(y.shape[0])}))


if __name__ == "__main__":
    main()
