#!/usr/bin/env python
"""A/B measurement: power-only scan vs complex-restore scan, per family.

Round-4 experiment — the power-only mode (ops/ip_components.py::
quadratic_power_planes / frame_power_sums) never materializes the complex
(N, F, T) estimates inside the scan.  This script measures both modes on
the canonical BASELINE.md config with the differenced methodology
(runtime/profiling.py::benchmark_solver) and writes rows incrementally to
POWER_AB.json so a dropped tunnel doesn't lose the completed rows.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from audio_source_separation_tpu.models import (
    AuxGaussIVA,
    AuxLaplaceIVA,
    ConsistentGaussILRMA,
    FastMultichannelISNMF,
    GaussILRMA,
    TILRMA,
)
from audio_source_separation_tpu.runtime import benchmark_solver

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "POWER_AB.json")


def make_input(n_channels=2, n_bins=2049, n_frames=469, dtype=np.complex64):
    rng = np.random.RandomState(111)
    S = rng.randn(n_channels, n_bins, n_frames) * np.abs(
        rng.randn(n_channels, 1, n_frames)
    ) + 1j * rng.randn(n_channels, n_bins, n_frames)
    A = np.array([[1.0, 0.7], [0.6, 1.0]])[:n_channels, :n_channels]
    return np.einsum("cn,nft->cft", A, S).astype(dtype)


def force_complex(solver):
    """Per-instance override of the power-only gate (same trick as the
    toggle-equivalence tests).

    FastMNMF has no ``_power_only_scan`` gate — its power path is the
    carried ``qx_power`` computed via ``quadratic_power_planes`` whenever
    ``pair_products`` is in the state — so its "complex" arm overrides
    ``_compute_qx_power`` to take the complex-materialize fallback (the
    diagonalizer's planes IP sweep, a separate round-3 lever, stays on in
    both arms: this A/B isolates the |Qx|² representation only)."""
    if isinstance(solver, FastMultichannelISNMF):
        base_compute = type(solver)._compute_qx_power

        def _complex_qx(state):
            return base_compute(
                {k: v for k, v in state.items() if k != "pair_products"}
            )

        solver.__class__ = type(
            "NoPower" + type(solver).__name__,
            (type(solver),),
            {"_compute_qx_power": staticmethod(_complex_qx)},
        )
        return solver
    if hasattr(type(solver), "power_scan"):
        solver.power_scan = False
        return solver
    solver.__class__ = type(
        "NoPower" + type(solver).__name__,
        (type(solver),),
        {"_power_only_scan": property(lambda s: False)},
    )
    return solver


def main():
    X = make_input()
    configs = [
        ("AuxIVA-IP", 4000,
         lambda: AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=False)),
        ("AuxGaussIVA-IP", 4000,
         lambda: AuxGaussIVA(algorithm_spatial="IP", recordable_loss=False)),
        ("GaussILRMA (K=10)", 300,
         lambda: GaussILRMA(n_basis=10, recordable_loss=False)),
        ("GaussILRMA-IP2 (K=10)", 300,
         lambda: GaussILRMA(n_basis=10, algorithm_spatial="IP2",
                            recordable_loss=False)),
        ("tILRMA (K=10)", 300,
         lambda: TILRMA(n_basis=10, nu=1000, recordable_loss=False)),
        ("ConsistentILRMA (K=10)", 100,
         lambda: ConsistentGaussILRMA(n_basis=10, fft_size=4096,
                                      hop_size=2048, recordable_loss=False)),
        ("FastMNMF (K=10)", 150,
         lambda: FastMultichannelISNMF(n_basis=10, recordable_loss=False)),
    ]

    rows = []
    for name, iters, factory in configs:
        for mode in ("power", "complex"):
            np.random.seed(111)
            solver = factory()
            if mode == "complex":
                solver = force_complex(solver)
            try:
                ips, compile_s = benchmark_solver(solver, X, iteration=iters)
                row = {"solver": name, "mode": mode,
                       "iters_per_sec": round(ips, 1),
                       "compile_s": round(compile_s, 1)}
            except Exception as exc:  # noqa: BLE001 — record and continue
                row = {"solver": name, "mode": mode, "error": str(exc)[:200]}
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(OUT, "w") as f:
                json.dump({"rows": rows}, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
