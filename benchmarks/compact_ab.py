#!/usr/bin/env python
"""Round-5 on-chip A/B: IPSDTA ``source_compact`` — the compact-Hermitian
planes source chains (R, R⁻¹, R⁻², zzᴴ and every trace contraction on B²
REAL planes; half the streamed bytes of the complex planes path, real GEMMs
instead of complex) vs the round-4 complex planes path, per author, at the
canonical 1024-block geometry (B = 2, 2049 bins → remainder block).

Differenced methodology (benchmark_solver); arms interleaved twice so
tunnel drift cannot masquerade as a gate decision.  Writes rows
incrementally to COMPACT_AB.json so a dropped tunnel keeps completed rows.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from audio_source_separation_tpu.models import GaussIPSDTA, TIPSDTA
from audio_source_separation_tpu.runtime import benchmark_solver

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "COMPACT_AB.json")


def make_input(n_channels=2, n_bins=2049, n_frames=469, dtype=np.complex64):
    rng = np.random.RandomState(111)
    S = rng.randn(n_channels, n_bins, n_frames) * np.abs(
        rng.randn(n_channels, 1, n_frames)
    ) + 1j * rng.randn(n_channels, n_bins, n_frames)
    A = np.array([[1.0, 0.7], [0.6, 1.0]])
    return np.einsum("cd,dft->cft", A, S).astype(dtype)


def bench(row, factory, X, iters, rows, flag):
    np.random.seed(111)
    solver = factory()
    solver.source_compact = flag
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
    rows = []
    configs = [
        ("IPSDTA Kondo (K=2, 1024 blocks)",
         lambda: GaussIPSDTA(n_basis=2, author="Kondo", recordable_loss=False)),
        ("IPSDTA Ikeshita (K=2, 1024 blocks)",
         lambda: GaussIPSDTA(n_basis=2, author="Ikeshita", recordable_loss=False)),
        ("tIPSDTA (K=2, 1024 blocks)",
         lambda: TIPSDTA(n_basis=2, nu=1000, recordable_loss=False)),
    ]
    for rep in (1, 2):
        for name, factory in configs:
            for flag in (True, False):
                bench(
                    {"solver": name, "rep": rep,
                     "mode": "compact" if flag else "planes"},
                    factory, X, 5, rows, flag,
                )


if __name__ == "__main__":
    main()
