#!/usr/bin/env python
"""Extended benchmark sweep: iterations/sec for the headline solvers on the
current backend (TPU by default).  `bench.py` stays the driver's single-line
headline; this script records the broader table in benchmarks/RESULTS.md.

Uses the same canonical config as BASELINE.md (2-channel, fft 4096 → 2049
bins, ~60 s at 16 kHz → 469 frames).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from audio_source_separation_tpu.models import (
    AuxLaplaceIVA,
    FastMultichannelISNMF,
    GaussILRMA,
    NaturalGradLaplaceFDICA,
    TILRMA,
)
from audio_source_separation_tpu.runtime import benchmark_solver


def make_input(n_channels=2, n_bins=2049, n_frames=469, dtype=np.complex64):
    rng = np.random.RandomState(111)
    S = rng.randn(n_channels, n_bins, n_frames) * np.abs(
        rng.randn(n_channels, 1, n_frames)
    ) + 1j * rng.randn(n_channels, n_bins, n_frames)
    A = np.array([[1.0, 0.7], [0.6, 1.0]])[:n_channels, :n_channels]
    return np.einsum("cn,nft->cft", A, S).astype(dtype)


def main():
    X = make_input()
    configs = [
        ("AuxIVA-IP", lambda: AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=False)),
        ("AuxIVA-ISS", lambda: AuxLaplaceIVA(algorithm_spatial="ISS", recordable_loss=False)),
        ("GaussILRMA (K=10)", lambda: GaussILRMA(n_basis=10, recordable_loss=False)),
        ("tILRMA (K=10)", lambda: TILRMA(n_basis=10, nu=1000, recordable_loss=False)),
        ("FastMNMF (K=10)", lambda: FastMultichannelISNMF(n_basis=10, recordable_loss=False)),
        ("NatGradFDICA", lambda: NaturalGradLaplaceFDICA(recordable_loss=False)),
    ]
    results = []
    for name, factory in configs:
        np.random.seed(111)
        solver = factory()
        t0 = time.perf_counter()
        try:
            ips, compile_s = benchmark_solver(solver, X, iteration=30)
            results.append((name, ips, compile_s))
            print(json.dumps({"solver": name, "iters_per_sec": round(ips, 2),
                              "compile_plus_first_exec_s": round(compile_s, 1)}), flush=True)
        except Exception as exc:  # noqa: BLE001 — record and continue
            print(json.dumps({"solver": name, "error": str(exc)[:200]}), flush=True)
    backend = jax.default_backend()
    lines = [
        "# Benchmark results",
        "",
        "Backend: `{}`; config: 2 ch, 2049 bins (fft 4096), 469 frames,".format(backend),
        "complex64; iterations/sec of the jitted 30-iteration scan",
        "(loss recording off; `jax.device_get` sync).",
        "",
        "| Solver | iters/s | compile + first exec (s) |",
        "|---|---|---|",
    ]
    for name, ips, compile_s in results:
        lines.append("| {} | {:.1f} | {:.1f} |".format(name, ips, compile_s))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "RESULTS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
