#!/usr/bin/env python
"""dp×tp mesh-shape sweep on a virtual device mesh (VERDICT r4 item 9).

Runs the PRODUCTION batched scan (``parallel.batch.batch_separate`` — the
same code path users get) over every 2-D factorization of an 8-device mesh
and records wall-clock per configuration.  On the virtual CPU mesh these
numbers demonstrate that each (dp, tp) sharding compiles, executes, and
keeps results finite with the expected collectives — they are NOT TPU
performance numbers (one host executes all 8 "devices"); the on-chip DP
scaling table (``throughput.py``) carries the measured throughput story.

Writes MESH_SWEEP.json; ``run_all.py`` folds the table into RESULTS.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEVICES = 8
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEVICES}"
    ).strip()

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from jax.sharding import Mesh

from audio_source_separation_tpu.models import AuxLaplaceIVA, GaussILRMA
from audio_source_separation_tpu.parallel.batch import batch_separate

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "MESH_SWEEP.json")

BATCH = 8          # divides every dp in the sweep
F = 256            # divides every tp in the sweep
T = 64
ITERS = 20


def make_batch(seed=111):
    rng = np.random.RandomState(seed)
    S = rng.randn(BATCH, 2, F, T) * np.abs(rng.randn(BATCH, 2, 1, T)) + 1j * rng.randn(
        BATCH, 2, F, T
    )
    A = np.array([[1.0, 0.7], [0.6, 1.0]])
    return np.einsum("cn,bnft->bcft", A, S).astype(np.complex64)


def factorizations(n):
    d = 1
    while d <= n:
        if n % d == 0:
            yield d, n // d
        d *= 2


def main():
    X = make_batch()
    rows = []
    for name, factory in (
        ("AuxIVA-IP", lambda: AuxLaplaceIVA(algorithm_spatial="IP")),
        ("GaussILRMA (K=4)", lambda: GaussILRMA(n_basis=4)),
    ):
        for dp, tp in factorizations(N_DEVICES):
            devices = np.array(jax.devices()[:N_DEVICES]).reshape(dp, tp)
            mesh = Mesh(devices, axis_names=("dp", "tp"))
            np.random.seed(111)
            solver = factory()
            t0 = time.time()
            outs, losses = batch_separate(
                solver, X, iteration=ITERS, mesh=mesh
            )
            wall = time.time() - t0
            # second call reuses nothing across mesh shapes (new program per
            # sharding), so report a warm re-run of the same shape
            np.random.seed(111)
            solver = factory()
            t0 = time.time()
            outs, losses = batch_separate(
                solver, X, iteration=ITERS, mesh=mesh
            )
            warm = time.time() - t0
            ok = bool(np.isfinite(outs).all()) and (
                losses is None or bool(np.isfinite(np.asarray(losses)).all())
            )
            row = {
                "solver": name,
                "dp": dp,
                "tp": tp,
                "batch": BATCH,
                "bins": F,
                "iters": ITERS,
                "cold_s": round(wall, 2),
                "warm_s": round(warm, 2),
                "finite": ok,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(OUT, "w") as f:
                json.dump({"rows": rows, "n_devices": N_DEVICES}, f, indent=1)


if __name__ == "__main__":
    main()
