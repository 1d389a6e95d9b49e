#!/usr/bin/env python
"""IPSDTA throughput at the canonical config (2 ch, 2049 bins, 469 frames).

Both GaussIPSDTA author modes + tIPSDTA; low iteration count (the block-PSD
machinery is the heaviest family in the repo).  Prints one JSON line per
config.  Usage: python benchmarks/bench_ipsdta.py [iters]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_source_separation_tpu.models import GaussIPSDTA, TIPSDTA
from audio_source_separation_tpu.runtime import benchmark_solver
from run_all import make_input


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    X = make_input()
    configs = [
        ("GaussIPSDTA (Kondo MM+VCD)", lambda: GaussIPSDTA(n_basis=2, author="Kondo", recordable_loss=False)),
        ("GaussIPSDTA (Ikeshita EM+FP)", lambda: GaussIPSDTA(n_basis=2, author="Ikeshita", recordable_loss=False)),
        ("tIPSDTA (Kondo)", lambda: TIPSDTA(n_basis=2, nu=1000, recordable_loss=False)),
    ]
    for name, factory in configs:
        np.random.seed(111)
        solver = factory()
        try:
            t0 = time.perf_counter()
            ips, compile_s = benchmark_solver(solver, X, iteration=iters)
            print(
                json.dumps(
                    {
                        "solver": name,
                        "iters_per_sec": round(ips, 3),
                        "compile_plus_first_exec_s": round(compile_s, 1),
                    }
                ),
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — record and continue
            print(json.dumps({"solver": name, "error": str(exc)[:300]}), flush=True)


if __name__ == "__main__":
    main()
