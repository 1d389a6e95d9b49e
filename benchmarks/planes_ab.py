#!/usr/bin/env python
"""Round-4 A/B measurements on the real chip, differenced methodology:

1. Sawada MNMF optimization barriers (X̂ / X̂⁻¹ / X̂⁻¹XX̂⁻¹) — the
   multi-consumer fusion lever (CLAUDE.md round 4).  The "off" arm patches
   ``jax.lax.optimization_barrier`` to identity during tracing, which
   reproduces the pre-barrier fusion behavior exactly.
2. IPSDTA ``source_planes`` toggle (planes-layout source steps + the
   Ikeshita fixed-point G statistics) per author, at the canonical
   1024-block geometry (B = 3).

Writes rows incrementally to PLANES_AB.json so a dropped tunnel keeps
completed rows.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from audio_source_separation_tpu.models import (
    GaussIPSDTA,
    MultichannelISNMF,
    TIPSDTA,
)
from audio_source_separation_tpu.runtime import benchmark_solver

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANES_AB.json")


def make_input(n_channels=2, n_bins=2049, n_frames=469, dtype=np.complex64):
    rng = np.random.RandomState(111)
    S = rng.randn(n_channels, n_bins, n_frames) * np.abs(
        rng.randn(n_channels, 1, n_frames)
    ) + 1j * rng.randn(n_channels, n_bins, n_frames)
    A = np.array([[1.0, 0.7], [0.6, 1.0]])
    return np.einsum("cd,dft->cft", A, S).astype(dtype)


def bench(row, factory, X, iters, rows, setup=None, patch_barrier=False):
    orig = jax.lax.optimization_barrier
    if patch_barrier:
        jax.lax.optimization_barrier = lambda x: x
    try:
        np.random.seed(111)
        solver = factory()
        if setup:
            setup(solver)
        try:
            ips, compile_s = benchmark_solver(solver, X, iteration=iters)
            row = dict(row, iters_per_sec=round(ips, 1),
                       compile_s=round(compile_s, 1))
        except Exception as exc:  # noqa: BLE001 — record and continue
            row = dict(row, error=str(exc)[:200])
    finally:
        jax.lax.optimization_barrier = orig
    rows.append(row)
    print(json.dumps(row), flush=True)
    with open(OUT, "w") as f:
        json.dump({"rows": rows}, f, indent=1)


def main():
    X = make_input()
    rows = []

    saw = lambda: MultichannelISNMF(n_basis=10, recordable_loss=False)  # noqa: E731
    bench({"solver": "Sawada MNMF (K=10)", "mode": "barrier"}, saw, X, 100, rows)
    bench({"solver": "Sawada MNMF (K=10)", "mode": "no barrier"}, saw, X, 100,
          rows, patch_barrier=True)

    def planes_setup(flag):
        def setup(solver):
            solver.source_planes = flag

        return setup

    ipsdta_configs = [
        ("IPSDTA Kondo (K=2, 1024 blocks)",
         lambda: GaussIPSDTA(n_basis=2, author="Kondo", recordable_loss=False)),
        ("IPSDTA Ikeshita (K=2, 1024 blocks)",
         lambda: GaussIPSDTA(n_basis=2, author="Ikeshita", recordable_loss=False)),
        ("tIPSDTA (K=2, 1024 blocks)",
         lambda: TIPSDTA(n_basis=2, nu=1000, recordable_loss=False)),
    ]
    for name, factory in ipsdta_configs:
        for flag in (True, False):
            bench(
                {"solver": name, "mode": "planes" if flag else "matrix"},
                factory, X, 5, rows, setup=planes_setup(flag),
            )


if __name__ == "__main__":
    main()
