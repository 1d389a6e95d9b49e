#!/usr/bin/env python
"""Separation-quality benchmark: SI-SDR improvement on MIRD-geometry
convolutive speech mixtures — the reference's de-facto quality metric
(notebook SDRi callbacks, ``egs/bss-example/ilrma/test_gauss-ilrma.ipynb``
cells 66-72), productized as a reproducible table.

Fixture: two deterministic speech-like sources convolved through the MIRD
8-mic array geometry (``utils.synthesis.mird_geometry_rirs``; the measured
MIRD .mat files are used instead when present under ``--data-root``), sources
at 45° and 315°, mics 3 and 4 (the 8 cm center pair).  Ground truth = source
images at the reference mic; metric = PIT SI-SDR improvement over the
mixture.  Writes benchmarks/QUALITY.md.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
)

import jax


def make_fixture(sr=16000, seconds=4.0, degrees=(45, 315), mics=(3, 4), seed=111):
    from prepare_mixture import _synthetic_speech
    from audio_source_separation_tpu.utils.synthesis import mird_geometry_rirs

    n = int(seconds * sr)
    sources = np.stack([_synthetic_speech(i, n_samples=n, seed=seed) for i in range(len(degrees))])
    taps = int(0.1 * sr)
    mixture = np.zeros((len(mics), n))
    images = np.zeros((len(degrees), n))  # at reference mic (mics[0])
    for s, deg in enumerate(degrees):
        rir = mird_geometry_rirs(deg, samples=taps, seed=seed)  # (taps, 8)
        for mi, m in enumerate(mics):
            contrib = np.convolve(sources[s], rir[:, m])[:n]
            mixture[mi] += contrib
            if mi == 0:
                images[s] = contrib
    return mixture, images


def main():
    import audio_source_separation_tpu as asst
    from audio_source_separation_tpu.models import (
        AuxGaussIVA,
        AuxLaplaceIVA,
        ConsistentGaussILRMA,
        FastMultichannelISNMF,
        GaussILRMA,
        GaussIPSDTA,
        MultichannelISNMF,
        NaturalGradLaplaceFDICA,
        ProxLaplaceIVA,
        TILRMA,
        TIPSDTA,
    )
    from audio_source_separation_tpu.utils.metrics import si_sdr_improvement

    fft_size, hop = 2048, 1024
    mixture, images = make_fixture()
    X = np.asarray(asst.stft(mixture, fft_size=fft_size, hop_size=hop))

    # every solver family runs on REAL mixtures on the actual backend — this
    # doubles as the hardware-numerics validation sweep (it caught TPU's
    # default bf16 matmul precision NaN'ing the IPSDTA block chains)
    configs = [
        ("AuxIVA-IP", 50, lambda: AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=False)),
        ("AuxIVA-ISS", 100, lambda: AuxLaplaceIVA(algorithm_spatial="ISS", recordable_loss=False)),
        ("AuxIVA-IP2", 100, lambda: AuxLaplaceIVA(algorithm_spatial="IP2", recordable_loss=False)),
        ("AuxGaussIVA-IP", 50, lambda: AuxGaussIVA(algorithm_spatial="IP", recordable_loss=False)),
        ("GaussILRMA (K=4)", 50, lambda: GaussILRMA(n_basis=4, recordable_loss=False)),
        ("tILRMA (K=4, nu=1000)", 50, lambda: TILRMA(n_basis=4, nu=1000, recordable_loss=False)),
        ("ConsistentILRMA (K=4)", 50, lambda: ConsistentGaussILRMA(n_basis=4, fft_size=fft_size, hop_size=hop, recordable_loss=False)),
        ("FastMNMF (K=4)", 50, lambda: FastMultichannelISNMF(n_basis=4, recordable_loss=False)),
        ("Sawada MNMF (K=4)", 30, lambda: MultichannelISNMF(n_basis=4, recordable_loss=False)),
        ("Ozerov MNMF (K=4)", 50, lambda: MultichannelISNMF(n_basis=4, author="Ozerov", recordable_loss=False)),
        ("NatGradFDICA", 100, lambda: NaturalGradLaplaceFDICA(recordable_loss=False)),
        ("ProxLaplaceIVA", 100, lambda: ProxLaplaceIVA(recordable_loss=False)),
        ("GaussIPSDTA Kondo (K=2)", 20, lambda: GaussIPSDTA(n_basis=2, author="Kondo", n_blocks=256, recordable_loss=False)),
        ("GaussIPSDTA Ikeshita (K=2)", 20, lambda: GaussIPSDTA(n_basis=2, author="Ikeshita", n_blocks=256, recordable_loss=False)),
        ("tIPSDTA (K=2, nu=1000)", 20, lambda: TIPSDTA(n_basis=2, nu=1000, n_blocks=256, recordable_loss=False)),
    ]

    rows = []
    for name, iters, factory in configs:
        np.random.seed(111)
        solver = factory()
        try:
            Y = solver(X, iteration=iters)
            y = np.asarray(
                asst.istft(Y, fft_size=fft_size, hop_size=hop, length=mixture.shape[-1])
            )
            sdri = si_sdr_improvement(y, mixture[0], images)
            rows.append((name, iters, sdri))
            print(json.dumps({"solver": name, "iterations": iters,
                              "si_sdr_improvement_db": round(float(sdri), 2)}), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"solver": name, "error": str(exc)[:200]}), flush=True)

    # overdetermined path: 4 mics → 2 sources via per-bin PCA reduction +
    # AuxIVA + projection back onto the unreduced mixture (the reference's
    # working overdetermined recipe, ``bss/iva.py:1092-1102``)
    try:
        name, iters = "OverAuxIVA (4 mics → 2 src)", 50
        from audio_source_separation_tpu.models import OverAuxLaplaceIVA

        mixture4, images4 = make_fixture(mics=(2, 3, 4, 5))
        X4 = np.asarray(asst.stft(mixture4, fft_size=fft_size, hop_size=hop))
        np.random.seed(111)
        solver = OverAuxLaplaceIVA(
            algorithm_spatial="IP", n_sources=2, recordable_loss=False
        )
        Y = solver(X4, iteration=iters)
        y = np.asarray(
            asst.istft(Y, fft_size=fft_size, hop_size=hop, length=mixture4.shape[-1])
        )
        sdri = si_sdr_improvement(y, mixture4[0], images4)
        rows.append((name, iters, sdri))
        print(json.dumps({"solver": name, "iterations": iters,
                          "si_sdr_improvement_db": round(float(sdri), 2)}), flush=True)
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({"solver": name, "error": str(exc)[:200]}), flush=True)

    # Ozerov EM as published: seeded from another separator (the mixing
    # estimate A = W⁻¹ of a short AuxIVA run) and evaluated as the source
    # IMAGE at the reference mic (a_ref,s · ŝ_s — the same convention every
    # other row uses; the posterior source ŝ itself differs from the image
    # by the per-bin steering filter, which SI-SDR penalizes)
    try:
        name, iters = "Ozerov MNMF (AuxIVA-seeded, ref-mic image)", 50
        from audio_source_separation_tpu.models import AuxLaplaceIVA

        iva = AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=False)
        iva(X, iteration=20)
        A0 = np.linalg.inv(np.asarray(iva.demix_filter))  # (F, C, S)
        np.random.seed(111)
        solver = MultichannelISNMF(n_basis=4, author="Ozerov", recordable_loss=False)
        Y = np.asarray(solver(X, iteration=iters, mix_filter=A0))
        A = np.asarray(solver.mix_filter)
        Y = Y * A[:, 0, :].T[:, :, None]
        y = np.asarray(
            asst.istft(Y, fft_size=fft_size, hop_size=hop, length=mixture.shape[-1])
        )
        sdri = si_sdr_improvement(y, mixture[0], images)
        rows.append((name, iters, sdri))
        print(json.dumps({"solver": name, "iterations": iters,
                          "si_sdr_improvement_db": round(float(sdri), 2)}), flush=True)
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({"solver": name, "error": str(exc)[:200]}), flush=True)

    lines = [
        "# Separation quality (SI-SDR improvement)",
        "",
        "Fixture: 2 deterministic speech-like sources at 45°/315° through the",
        "MIRD 8-mic array geometry (synthetic RIRs on the measured dataset's",
        "geometry, T60 = 0.16 s), center 8 cm mic pair, 4 s at 16 kHz,",
        "fft 2048 / hop 1024; ground truth = source images at the reference",
        "mic; metric = permutation-invariant SI-SDR improvement over the",
        "mixture (`utils.metrics.si_sdr_improvement`).  Backend: `{}`.".format(
            jax.default_backend()
        ),
        "",
        "| Solver | iterations | SI-SDRi (dB) |",
        "|---|---|---|",
    ]
    for name, iters, sdri in rows:
        lines.append("| {} | {} | {:+.2f} |".format(name, iters, sdri))
    lines += [
        "",
        "Notes:",
        "- Sawada MNMF (full-rank spatial covariances from identity init) is known to",
        "  converge very slowly — the CPU float64 run gives the same +0.0 dB at 30",
        "  iterations; the reference's own examples run it for hundreds of iterations",
        "  or seed it from ILRMA.",
        "- Ozerov MNMF follows the reference's output convention (posterior source",
        "  ŝ, not its image at a mic) and random mixing init; EM from random init",
        "  does not separate this fixture and SI-SDR additionally penalizes the",
        "  per-bin steering filter between ŝ and the image target.  The",
        "  'AuxIVA-seeded, ref-mic image' row is the published usage pattern (seed",
        "  A = W⁻¹ from a cheap separator, evaluate a_ref·ŝ) on the SAME fixed EM.",
        "- ProxLaplaceIVA's negative dB is reproduced exactly on CPU float64: the PDS",
        "  method is step-size/regularizer sensitive and the defaults do not suit this",
        "  fixture; it is included as the hardware-numerics check, not as a tuned",
        "  result.",
        "- This table doubles as the HARDWARE validation sweep: it caught TPU's",
        "  default bf16 matmul precision NaN'ing the IPSDTA block chains and the",
        "  batched-LU inverse kernel faulting on the Sawada (F,T,C,C) batches (both",
        "  fixed — see models/ipsdta.py, ops/fast_linalg.py).",
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "QUALITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
