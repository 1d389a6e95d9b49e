#!/usr/bin/env python
"""Round-5 on-chip A/B: Sawada MNMF ``riccati_planes`` gate.

The spatial Riccati chain was the measured-dominant Sawada stage
(STAGES.json 'spatial (Riccati)').  The planes arm runs the whole
``A^{-1/2}(A^{1/2}BA^{1/2})^{1/2}A^{-1/2}`` chain on compact Hermitian
planes of shape ``(C², S, F)`` so none of its intermediates materializes
in the tile-padded ``(F, S, 2, 2)`` matrix layout; the matrix arm is the
round-4 path (planes frame-contractions, matrix Riccati).

Gate decisions are settled ONLY by this measurement (CLAUDE.md: the cost
model lies both ways).  Writes rows incrementally to RICCATI_AB.json so a
dropped tunnel keeps completed rows.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from audio_source_separation_tpu.models import CovarianceISNMF, MultichannelISNMF
from audio_source_separation_tpu.runtime import benchmark_solver

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "RICCATI_AB.json")


def make_input(n_channels=2, n_bins=2049, n_frames=469, dtype=np.complex64):
    rng = np.random.RandomState(111)
    S = rng.randn(n_channels, n_bins, n_frames) * np.abs(
        rng.randn(n_channels, 1, n_frames)
    ) + 1j * rng.randn(n_channels, n_bins, n_frames)
    A = np.array([[1.0, 0.7], [0.6, 1.0]])
    return np.einsum("cd,dft->cft", A, S).astype(dtype)


def bench(row, X, iters, rows, flag, factory=None):
    np.random.seed(111)
    solver = (factory or (lambda: MultichannelISNMF(n_basis=10, recordable_loss=False)))()
    solver.riccati_planes = flag
    try:
        ips, compile_s = benchmark_solver(solver, X, iteration=iters)
        row = dict(row, iters_per_sec=round(ips, 1), compile_s=round(compile_s, 1))
    except Exception as exc:  # noqa: BLE001 — record and continue
        row = dict(row, error=str(exc)[:200])
    rows.append(row)
    print(json.dumps(row), flush=True)
    with open(OUT, "w") as f:
        json.dump({"rows": rows}, f, indent=1)


def main():
    X = make_input()
    cov_target = np.einsum("cft,dft->ftcd", X, X.conj()).astype(np.complex64)
    rows = []
    # interleave arms twice so tunnel drift can't masquerade as a gate win
    for rep in (1, 2):
        for flag in (True, False):
            mode = "riccati_planes" if flag else "riccati_matrix"
            bench(
                {"solver": "Sawada MNMF (K=10)", "mode": mode, "rep": rep},
                X, 100, rows, flag,
            )
            bench(
                {"solver": "CovarianceISNMF (K=10)", "mode": mode, "rep": rep},
                cov_target, 50, rows, flag,
                factory=lambda: CovarianceISNMF(n_basis=10),
            )


if __name__ == "__main__":
    main()
