#!/usr/bin/env python
"""Round-5 on-chip A/B: IPSDTA K = 2 pencil source streams vs planes.

The per-stage attribution (STAGES.json) puts the Kondo source MM step at
~95% of the iteration, dominated by the B² (T, n_blocks) plane streams of
R / R⁻¹ / R⁻² / z.  For n_basis = 2 one generalized eigh per (source,
block) simultaneously diagonalizes every frame (models/ipsdta.py
``_update_source_mm_pencil``), collapsing the streams to B diagonal
planes.  Gate is settled HERE, on chip — not by the cost model
(CLAUDE.md: the cost model lies both ways).

Writes rows incrementally to PENCIL_AB.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from audio_source_separation_tpu.models import GaussIPSDTA, TIPSDTA
from audio_source_separation_tpu.runtime import benchmark_solver
from planes_ab import make_input

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PENCIL_AB.json")

CONFIGS = [
    ("IPSDTA Kondo (K=2, 1024 blocks)",
     lambda: GaussIPSDTA(n_basis=2, author="Kondo", recordable_loss=False)),
    # tIPSDTA's planes path re-runs the R⁻¹/z streams for the π weight in
    # BOTH half-steps; the pencil reads π off the diagonal planes for free,
    # so the relative saving should be larger than the Gauss case.
    ("tIPSDTA (K=2, 1024 blocks)",
     lambda: TIPSDTA(n_basis=2, nu=1000, recordable_loss=False)),
]


def main():
    X = make_input()
    rows = []
    for name, factory in CONFIGS:
        for flag in (True, False):
            np.random.seed(111)
            solver = factory()
            solver.source_pencil = flag
            row = {
                "solver": name,
                "mode": "pencil" if flag else "planes",
            }
            try:
                ips, compile_s = benchmark_solver(solver, X, iteration=5)
                row = dict(
                    row,
                    iters_per_sec=round(ips, 1),
                    compile_s=round(compile_s, 1),
                )
            except Exception as exc:  # noqa: BLE001 — record and continue
                row = dict(row, error=str(exc)[:300])
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(OUT, "w") as f:
                json.dump({"rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
