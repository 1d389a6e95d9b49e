#!/usr/bin/env python
"""Data-parallel scaling study: mixtures/sec vs batch size for the three
headline families (VERDICT r3 item 5 — replaces the single batch-16 AuxIVA
number).

Each configuration vmaps the solver's functional core (same machinery as
``parallel.batch.batch_separate``) over a leading mixture axis, keeps the
batch DEVICE-RESIDENT, and times repeated executions with a scalar sync —
host I/O over this development tunnel (~30 MB/s) is not representative of
production ingest, so inputs are transferred once per family and sliced on
device.  The returned scalar folds the finalized estimates AND the final
NLL so the whole per-mixture pipeline (iterations + finalize/projection
back) stays live under DCE.

Writes a JSON line per (solver, batch) and a markdown table to stdout for
RESULTS.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audio_source_separation_tpu.models import (
    AuxLaplaceIVA,
    FastMultichannelISNMF,
    GaussILRMA,
)
from audio_source_separation_tpu.ops.packing import pack, unpack

BATCHES = (1, 4, 16, 64)
N_ITER = 30
C, F, T = 2, 2049, 469  # canonical BASELINE.md config


def make_batch(batch, seed=111):
    rng = np.random.RandomState(seed)
    S = rng.randn(batch, C, F, T) * np.abs(rng.randn(batch, C, 1, T)) + 1j * rng.randn(
        batch, C, F, T
    )
    A = np.array([[1.0, 0.7], [0.6, 1.0]])
    return np.einsum("cn,bnft->bcft", A, S).astype(np.complex64)


def build_run(solver, X_host, iteration=N_ITER):
    """jit(vmapped scan + finalize) for a batch; returns (run, Xp, kwargs_p)
    with packed HOST pytrees (callers device_put once)."""
    batch = X_host.shape[0]
    solver.set_shape_metadata(X_host[0])
    per_example = []
    for b in range(batch):
        np.random.seed(111)  # reference seed convention per example
        per_example.append(solver.prepare_state_kwargs(X_host[b], {}))
    stacked = {
        k: np.stack([kw[k] for kw in per_example]) for k in per_example[0]
    }

    def single_run(Xb, kw):
        state = solver.init_state(Xb, **kw)

        def body(s, _):
            return solver.update_state(s), jnp.zeros(())

        state, _ = jax.lax.scan(body, state, None, length=iteration)
        out = solver.finalize(state)
        # scalar fold: keeps iterations AND finalize live, syncs ~8 bytes
        return jnp.sum(jnp.abs(out) ** 2) + solver.nll(state).real

    def batched(Xp, kwargs_p):
        return jnp.sum(jax.vmap(single_run)(unpack(Xp), unpack(kwargs_p)))

    return jax.jit(batched), pack(X_host), pack(stacked)


def main():
    results = []
    X_all = make_batch(max(BATCHES))
    families = [
        ("AuxIVA-IP", lambda: AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=False)),
        ("GaussILRMA (K=10)", lambda: GaussILRMA(n_basis=10, recordable_loss=False)),
        ("FastMNMF (K=10)", lambda: FastMultichannelISNMF(n_basis=10, recordable_loss=False)),
    ]
    for name, factory in families:
        for batch in BATCHES:
            try:
                solver = factory()
                run, Xp, kwargs_p = build_run(solver, X_all[:batch])
                Xp = jax.device_put(Xp)
                kwargs_p = jax.device_put(kwargs_p)
                t0 = time.perf_counter()
                _ = jax.device_get(run(Xp, kwargs_p))  # compile + warm
                compile_s = time.perf_counter() - t0
                n_rep = max(2, min(10, 64 // batch))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(n_rep):
                        out = run(Xp, kwargs_p)
                    _ = jax.device_get(out)
                    best = min(best, (time.perf_counter() - t0) / n_rep)
                rate = batch / best
                rec = {
                    "solver": name,
                    "batch": batch,
                    "mixtures_per_sec": round(rate, 2),
                    "sec_per_mixture": round(best / batch, 4),
                    "compile_plus_first_exec_s": round(compile_s, 1),
                }
                results.append(rec)
                print(json.dumps(rec), flush=True)
            except Exception as exc:  # noqa: BLE001 — record and continue
                print(
                    json.dumps({"solver": name, "batch": batch, "error": str(exc)[:200]}),
                    flush=True,
                )

    # markdown for RESULTS.md
    print("\n| Solver | " + " | ".join("batch {}".format(b) for b in BATCHES) + " |")
    print("|---|" + "---|" * len(BATCHES))
    for name, _ in families:
        row = [name]
        for batch in BATCHES:
            match = [r for r in results if r["solver"] == name and r["batch"] == batch]
            row.append("{:.1f}".format(match[0]["mixtures_per_sec"]) if match else "—")
        print("| " + " | ".join(row) + " |")
    print(
        "\nconfig: {} ch, {} bins, {} frames, {} iterations, device-resident".format(
            C, F, T, N_ITER
        )
    )
    # artifact consumed by run_all.py when it regenerates RESULTS.md
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "DP_SWEEP.json"
    )
    with open(out, "w") as f:
        json.dump(
            {
                "rows": results,
                "batches": list(BATCHES),
                "config": "{} ch, {} bins, {} frames, {} iterations".format(
                    C, F, T, N_ITER
                ),
            },
            f,
            indent=1,
        )
    print("wrote", out)


if __name__ == "__main__":
    main()
