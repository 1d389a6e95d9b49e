#!/usr/bin/env python
"""Worked walkthrough: the reference notebooks' full workflow as one script.

Reproduces ``/root/reference/egs/bss-example/ilrma/test_gauss-ilrma.ipynb``
end to end (cells 17-75): prepare a convolutive 2-mic mixture on the MIRD
array geometry, run GaussILRMA with per-iteration observability callbacks,
and write out

  * ``loss_curve.csv``  + ``loss_curve.png``  — the NLL trajectory (cell 61's
    loss plot),
  * ``sdri_curve.csv``  + ``sdri_curve.png``  — per-iteration PIT SI-SDR
    improvement via :class:`utils.callbacks.SDRImprovementCallback` (the
    notebook's ``record_sdri`` pattern, cells 66-72),
  * ``state/state_*.npz``                     — per-iteration basis/activation
    snapshots (cell 75's ``BasisActivationSaver``),
  * ``source_*.wav``                          — the separated sources.

PNG plots are written when matplotlib is importable and skipped otherwise
(the CSVs always exist).  Run:

    python examples/walkthrough.py --out /tmp/walkthrough

Switch solvers with ``--method`` (auxiva | ilrma); everything else mirrors
the notebook defaults (fft 2048, hop 1024, 50 iterations, seed 111).
"""

import argparse
import csv
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import audio_source_separation_tpu as asst
from audio_source_separation_tpu.models import AuxLaplaceIVA, GaussILRMA
from audio_source_separation_tpu.utils import write_wav
from audio_source_separation_tpu.utils.callbacks import (
    SDRImprovementCallback,
    StateSnapshotCallback,
)


def make_mixture(sr=16000, seconds=4.0, degrees=(45, 315), mics=(3, 4), seed=111):
    """Two speech-like sources through the MIRD 8-mic array geometry (the
    notebooks' measured-RIR setup; synthetic RIRs on the same geometry when
    the dataset download is absent — see examples/prepare_mixture.py)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from prepare_mixture import _synthetic_speech

    from audio_source_separation_tpu.utils.synthesis import mird_geometry_rirs

    n = int(seconds * sr)
    sources = np.stack(
        [_synthetic_speech(i, n_samples=n, seed=seed) for i in range(len(degrees))]
    )
    mixture = np.zeros((len(mics), n))
    images = np.zeros((len(degrees), n))
    for s, deg in enumerate(degrees):
        rir = mird_geometry_rirs(deg, samples=int(0.1 * sr), seed=seed)
        for mi, m in enumerate(mics):
            contrib = np.convolve(sources[s], rir[:, m])[:n]
            mixture[mi] += contrib
            if mi == 0:
                images[s] = contrib
    return mixture, images, sr


def write_curve(path, values, header):
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["iteration", header])
        for i, v in enumerate(values):
            writer.writerow([i, v])


def maybe_plot(path, values, ylabel):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # noqa: BLE001 — plotting is optional
        return False
    fig, ax = plt.subplots(figsize=(6, 3.5))
    ax.plot(range(len(values)), values)
    ax.set_xlabel("iteration")
    ax.set_ylabel(ylabel)
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return True


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--method", default="ilrma", choices=["ilrma", "auxiva"])
    parser.add_argument("--iterations", type=int, default=50)
    parser.add_argument("--fft-size", type=int, default=2048)
    parser.add_argument("--n-basis", type=int, default=4)
    parser.add_argument("--seed", type=int, default=111)
    parser.add_argument("--out", default="walkthrough_out")
    args = parser.parse_args()
    hop = args.fft_size // 2
    os.makedirs(args.out, exist_ok=True)

    # 1. mixture preparation (notebook cells 17-23)
    mixture, images, sr = make_mixture(seed=args.seed)
    X = np.asarray(asst.stft(mixture, fft_size=args.fft_size, hop_size=hop))

    # 2. observability: per-iteration SDRi + state snapshots (cells 66-75).
    #    Callbacks switch the runtime to the per-step jitted loop, exactly the
    #    reference's execution model.
    sdri_cb = SDRImprovementCallback(
        targets=images, fft_size=args.fft_size, hop_size=hop,
        length=mixture.shape[-1],
    )
    callbacks = [sdri_cb]
    if args.method == "ilrma":
        callbacks.append(
            StateSnapshotCallback(os.path.join(args.out, "state"))
        )

    # 3. solver run (cells 56-60)
    np.random.seed(args.seed)
    if args.method == "ilrma":
        solver = GaussILRMA(n_basis=args.n_basis, callbacks=callbacks)
    else:
        solver = AuxLaplaceIVA(algorithm_spatial="IP", callbacks=callbacks)
    Y = solver(X, iteration=args.iterations)
    y = np.asarray(
        asst.istft(Y, fft_size=args.fft_size, hop_size=hop, length=mixture.shape[-1])
    )

    # 4. artifacts: loss curve, SDRi curve, separated wavs.  The improvement
    # baseline is the quality table's convention (benchmarks/QUALITY.md):
    # PIT SI-SDR of the repeated reference-mic mixture against the images.
    from audio_source_separation_tpu.utils.metrics import pit_si_sdr

    before, _ = pit_si_sdr(
        np.broadcast_to(mixture[0][None], images.shape), images
    )
    sdri_improvement = [v - before for v in sdri_cb.history]
    write_curve(os.path.join(args.out, "loss_curve.csv"), solver.loss, "nll")
    write_curve(
        os.path.join(args.out, "sdri_curve.csv"), sdri_improvement, "si_sdr_improvement_db"
    )
    plotted = maybe_plot(
        os.path.join(args.out, "loss_curve.png"), solver.loss, "negative log-likelihood"
    )
    maybe_plot(
        os.path.join(args.out, "sdri_curve.png"), sdri_improvement, "SI-SDRi (dB)"
    )
    for n in range(y.shape[0]):
        write_wav(os.path.join(args.out, "source_{}.wav".format(n)), y[n], sr)
    write_wav(os.path.join(args.out, "mixture_ref_mic.wav"), mixture[0], sr)

    summary = {
        "method": args.method,
        "iterations": args.iterations,
        "loss_first": float(solver.loss[0]),
        "loss_last": float(solver.loss[-1]),
        "si_sdr_improvement_db": float(sdri_improvement[-1]),
        "plots": bool(plotted),
        "out": args.out,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
