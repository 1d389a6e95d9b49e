#!/usr/bin/env python
"""End-to-end separation driver — the library equivalent of the reference's
``egs/bss-example`` notebooks (SURVEY.md §3.6 pipeline):

    wav → STFT → solver(X, iteration=N) → iSTFT → wavs (+ loss curve)

Examples:
    python examples/separate.py --input mixture.wav --method auxiva --iterations 50
    python examples/separate.py --input /root/reference/dataset/sample-song/sample-2_mixture_16000.wav \
        --method ilrma --n-basis 2 --fft-size 4096 --iterations 100 --out /tmp/sep
"""

import argparse
import json
import os

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import audio_source_separation_tpu as asst
from audio_source_separation_tpu.models import (
    AuxGaussIVA,
    AuxLaplaceIVA,
    FastMultichannelISNMF,
    GaussIDLMA,
    GaussILRMA,
    GaussIPSDTA,
    GradLaplaceFDICA,
    MultichannelISNMF,
    NaturalGradLaplaceFDICA,
    ProxLaplaceIVA,
    TILRMA,
)
from audio_source_separation_tpu.utils import read_wav, write_wav


def idlma_jax_mlp(n_bins, n_sources, hidden=1024, num_layers=2, seed=111):
    """Per-source MLP variance model mirroring the reference IDLMA example
    (``egs/sss-example/idlma/test_gauss-idlma.ipynb`` cells 12-13: one
    ``n_bins → hidden → n_bins`` ReLU MLP per source over frame-batched
    amplitude spectra; the notebook runs it UNtrained — "Actually, we have
    to train DNN beforehand" — so untrained weights here are example
    parity, not a quality claim).  Returns a jittable JAX callable, so the
    whole IDLMA loop compiles into one on-device scan (``jax_dnn=True``)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    dims = [n_bins] + [hidden] * (num_layers - 1) + [n_bins]
    params = []
    for _ in range(n_sources):
        layers = []
        for d_in, d_out in zip(dims[:-1], dims[1:]):
            bound = 1.0 / np.sqrt(d_in)  # torch.nn.Linear default init
            layers.append(
                (
                    jnp.asarray(rng.uniform(-bound, bound, (d_in, d_out))),
                    jnp.asarray(rng.uniform(-bound, bound, (d_out,))),
                )
            )
        params.append(layers)

    def dnn(amp):  # (n_sources, n_bins, n_frames) amplitude → variance model
        outs = []
        for s in range(len(params)):
            h = amp[s].T  # (n_frames, n_bins): frames are the batch
            for W, b in params[s]:
                h = jnp.maximum(h @ W + b, 0.0)  # every layer ends in ReLU
            outs.append(h.T)
        return jnp.stack(outs)

    return dnn


def build_solver(args):
    if args.method == "auxiva":
        return AuxLaplaceIVA(algorithm_spatial=args.spatial)
    if args.method == "auxiva-gauss":
        return AuxGaussIVA(algorithm_spatial=args.spatial)
    if args.method == "proxiva":
        return ProxLaplaceIVA()
    if args.method == "fdica":
        return NaturalGradLaplaceFDICA(lr=args.lr)
    if args.method == "fdica-grad":
        return GradLaplaceFDICA(lr=args.lr)
    if args.method == "ilrma":
        return GaussILRMA(n_basis=args.n_basis, algorithm_spatial=args.spatial)
    if args.method == "tilrma":
        return TILRMA(n_basis=args.n_basis, nu=args.nu)
    if args.method == "mnmf":
        return MultichannelISNMF(n_basis=args.n_basis, author="Sawada")
    if args.method == "fastmnmf":
        return FastMultichannelISNMF(n_basis=args.n_basis)
    if args.method == "ipsdta":
        return GaussIPSDTA(n_basis=args.n_basis, author="Kondo", n_blocks=args.n_blocks)
    if args.method == "idlma":
        # DNN-informed separation (reference egs/sss-example/idlma): the
        # variance MLP runs INSIDE the jitted scan (jax_dnn=True)
        return GaussIDLMA(normalize="projection-back", jax_dnn=True)
    raise ValueError("unknown method {}".format(args.method))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="multichannel WAV file")
    parser.add_argument("--method", default="auxiva")
    parser.add_argument("--spatial", default="IP", help="IP | ISS | IP2")
    parser.add_argument("--iterations", type=int, default=50)
    parser.add_argument("--fft-size", type=int, default=2048)
    parser.add_argument("--hop-size", type=int, default=None)
    parser.add_argument("--n-basis", type=int, default=10)
    parser.add_argument("--n-blocks", type=int, default=None)
    parser.add_argument("--nu", type=float, default=1000.0)
    parser.add_argument("--lr", type=float, default=0.1)
    parser.add_argument(
        "--hidden", type=int, default=1024,
        help="idlma: hidden width of the per-source variance MLP",
    )
    parser.add_argument("--seed", type=int, default=111)
    parser.add_argument("--out", default="separated")
    args = parser.parse_args()
    hop = args.hop_size or args.fft_size // 2
    if args.n_blocks is None:
        args.n_blocks = (args.fft_size // 2 + 1) // 2

    x, sr = read_wav(args.input)
    if x.ndim == 1:
        raise SystemExit("input must be multichannel")
    x = x.T  # (n_channels, n_samples)

    X = asst.stft(x, fft_size=args.fft_size, hop_size=hop)
    np.random.seed(args.seed)
    solver = build_solver(args)
    call_kwargs = {}
    if args.method == "idlma":
        call_kwargs["dnn"] = idlma_jax_mlp(
            n_bins=args.fft_size // 2 + 1,
            n_sources=x.shape[0],
            hidden=args.hidden,
            seed=args.seed,
        )
    Y = solver(np.asarray(X), iteration=args.iterations, **call_kwargs)
    y = np.asarray(asst.istft(Y, fft_size=args.fft_size, hop_size=hop, length=x.shape[-1]))

    os.makedirs(args.out, exist_ok=True)
    for n in range(y.shape[0]):
        write_wav(os.path.join(args.out, "source_{}.wav".format(n)), y[n], sr)
    summary = {
        "method": args.method,
        "iterations": args.iterations,
        "loss_first": solver.loss[0] if solver.loss else None,
        "loss_last": solver.loss[-1] if solver.loss else None,
        "outputs": y.shape[0],
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
