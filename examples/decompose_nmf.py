#!/usr/bin/env python
"""Single-channel NMF decomposition driver — the library equivalent of the
reference's ``egs/nmf-example`` notebooks: wav → power spectrogram →
NMF(basis, activation) → per-basis Wiener-masked reconstructions.

Example:
    python examples/decompose_nmf.py --input sample.wav --metric EUC \
        --n-basis 6 --iterations 100 --out /tmp/nmf
"""

import argparse
import json
import os

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import audio_source_separation_tpu as asst
from audio_source_separation_tpu.models import EUCNMF, KLNMF, ISNMF, TNMF, CauchyNMF
from audio_source_separation_tpu.utils import read_wav, write_wav

METRICS = {
    "EUC": EUCNMF,
    "KL": KLNMF,
    "IS": ISNMF,
    "t": TNMF,
    "Cauchy": CauchyNMF,
}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True)
    parser.add_argument("--metric", default="EUC", choices=sorted(METRICS))
    parser.add_argument("--n-basis", type=int, default=6)
    parser.add_argument("--iterations", type=int, default=100)
    parser.add_argument("--fft-size", type=int, default=1024)
    parser.add_argument("--hop-size", type=int, default=256)
    parser.add_argument("--seed", type=int, default=111)
    parser.add_argument("--out", default="nmf")
    args = parser.parse_args()

    x, sr = read_wav(args.input)
    if x.ndim > 1:
        x = x[:, 0]
    X = np.asarray(asst.stft(x, fft_size=args.fft_size, hop_size=args.hop_size))
    power = np.abs(X) ** 2

    np.random.seed(args.seed)
    model = METRICS[args.metric](n_basis=args.n_basis)
    T, V = model(power, iteration=args.iterations)
    T, V = np.asarray(T), np.asarray(V)

    os.makedirs(args.out, exist_ok=True)
    np.savez(os.path.join(args.out, "factors.npz"), basis=T, activation=V)

    # per-basis Wiener reconstruction (notebook cells' separation demo)
    TV = np.maximum(T @ V, 1e-12)
    for k in range(args.n_basis):
        mask = np.outer(T[:, k], V[k]) / TV
        y = np.asarray(
            asst.istft(
                X * mask, fft_size=args.fft_size, hop_size=args.hop_size, length=len(x)
            )
        )
        write_wav(os.path.join(args.out, "basis_{}.wav".format(k)), y, sr)

    print(
        json.dumps(
            {
                "metric": args.metric,
                "loss_first": model.loss[0],
                "loss_last": model.loss[-1],
                "n_basis": args.n_basis,
            }
        )
    )


if __name__ == "__main__":
    main()
