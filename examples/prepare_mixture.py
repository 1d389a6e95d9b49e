#!/usr/bin/env python
"""Synthesize a convolutive mixture from dry source WAVs — the library
equivalent of the reference's ``egs/*/prepare.sh`` + ``local/prepare.py``
(which download CMU-ARCTIC + MIRD; this version takes local WAVs and either
user-supplied RIRs (.npy, shape (n_sources, n_mics, taps)) or deterministic
synthetic RIRs).

Example:
    python examples/prepare_mixture.py --sources a.wav b.wav --mics 2 \
        --out /tmp/mix && ls /tmp/mix
"""

import argparse
import os

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from audio_source_separation_tpu.utils import (
    convolutive_mixture,
    read_wav,
    synthetic_room_impulse_responses,
    write_wav,
)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sources", nargs="+", required=True)
    parser.add_argument("--rirs", default=None, help=".npy (n_sources, n_mics, taps)")
    parser.add_argument("--mics", type=int, default=2)
    parser.add_argument("--taps", type=int, default=64)
    parser.add_argument("--seed", type=int, default=111)
    parser.add_argument("--out", default="mixture")
    args = parser.parse_args()

    signals, sr = [], None
    for path in args.sources:
        s, rate = read_wav(path)
        if s.ndim > 1:
            s = s[:, 0]
        signals.append(s)
        sr = rate
    length = min(len(s) for s in signals)
    sources = np.stack([s[:length] for s in signals])

    if args.rirs:
        rirs = np.load(args.rirs)
    else:
        rirs = synthetic_room_impulse_responses(
            len(sources), args.mics, taps=args.taps, seed=args.seed
        )

    mixture, images = convolutive_mixture(sources, rirs)
    os.makedirs(args.out, exist_ok=True)
    write_wav(os.path.join(args.out, "mixture.wav"), mixture.T, sr)
    for n in range(images.shape[0]):
        write_wav(os.path.join(args.out, "image_{}_mic0.wav".format(n)), images[n, 0], sr)
    print("wrote mixture ({} mics) and {} reference images to {}".format(
        mixture.shape[0], images.shape[0], args.out))


if __name__ == "__main__":
    main()
