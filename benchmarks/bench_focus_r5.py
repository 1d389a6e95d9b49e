#!/usr/bin/env python
"""Round-5 focused on-chip rows: ComplexEUCNMF (basis-leading phasor
planes, commit 57516d2) and LDPSDTF (K=2 matrix-pencil path) at HEAD.

Matches run_all.py's canonical workloads exactly so rows are comparable
with RESULTS.md; writes rows incrementally to FOCUS_R5.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from audio_source_separation_tpu.models import ComplexEUCNMF, LDPSDTF
from audio_source_separation_tpu.runtime import benchmark_solver

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "FOCUS_R5.json")


def make_input(n_channels=2, n_bins=2049, n_frames=469, dtype=np.complex64):
    rng = np.random.RandomState(111)
    S = rng.randn(n_channels, n_bins, n_frames) * np.abs(
        rng.randn(n_channels, 1, n_frames)
    ) + 1j * rng.randn(n_channels, n_bins, n_frames)
    A = np.array([[1.0, 0.7], [0.6, 1.0]])
    return np.einsum("cd,dft->cft", A, S).astype(dtype)


def main():
    X = make_input()
    rng_g = np.random.RandomState(7)
    B = 64
    bases = [rng_g.randn(B, B) for _ in range(2)]
    gram = np.einsum(
        "kij,kt->ijt",
        np.stack([a @ a.T + 0.5 * np.eye(B) for a in bases]),
        np.abs(rng_g.randn(2, X.shape[-1])) + 0.2,
    )

    only = sys.argv[1:] or None
    rows = []
    for name, iters, factory, target in [
        ("ComplexEUCNMF (K=10, 1 ch)", 300, lambda: ComplexEUCNMF(n_basis=10), X[0]),
        ("LDPSDTF (K=2, B=64)", 300, lambda: LDPSDTF(n_basis=2), gram),
    ]:
        if only and not any(o.lower() in name.lower() for o in only):
            continue
        np.random.seed(111)
        solver = factory()
        try:
            ips, compile_s = benchmark_solver(solver, target, iteration=iters)
            row = {"solver": name, "iters_per_sec": round(ips, 1),
                   "compile_s": round(compile_s, 1)}
        except Exception as exc:  # noqa: BLE001 — record and continue
            row = {"solver": name, "error": str(exc)[:200]}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(OUT, "w") as f:
            json.dump({"rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
