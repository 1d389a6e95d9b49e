#!/usr/bin/env python
"""Per-stage attribution for the two sub-floor EM families (VERDICT r3
items 1 & 4): FastMNMF (NMF / SCM / diagonalizer / normalize+|Qx|2) and
Ozerov (E step vs full EM iteration).

Each stage is timed as its OWN jitted scan (same two-length differencing as
``benchmark_solver`` — the stage function replaces ``update_state`` via the
``update_fn`` hook), plus XLA's post-fusion cost analysis of the stage body.
Stage scans share the solver's carried-state layout, so per-stage rates are
comparable to the full-update row; stages overlap where the algorithm
recomputes shared terms (e.g. FastMNMF's model power R is rebuilt by every
stage, exactly as the reference rebuilds it — ``mnmf.py:789-852``), so the
stage sum exceeding the full-iteration time by that overlap is expected and
is itself the attribution signal.

Run on the TPU after ``run_all.py``; paste the table into RESULTS.md.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from audio_source_separation_tpu.models import (
    FastMultichannelISNMF,
    MultichannelISNMF,
)
from audio_source_separation_tpu.runtime import (
    benchmark_solver,
    scan_cost_analysis,
)


def make_input(n_channels=2, n_bins=2049, n_frames=469, dtype=np.complex64):
    rng = np.random.RandomState(0)
    scale = np.exp(-np.linspace(0, 4, n_bins))[:, None]
    X = rng.randn(n_channels, n_bins, n_frames) + 1j * rng.randn(
        n_channels, n_bins, n_frames
    )
    return (X * scale).astype(dtype)


def bench_stage(name, factory, X, update_fn_of, iters, rows):
    np.random.seed(111)
    solver = factory()
    update_fn = update_fn_of(solver)
    try:
        ips, compile_s = benchmark_solver(
            solver, X, iteration=iters, update_fn=update_fn
        )
        np.random.seed(111)
        try:
            s2 = factory()
            bytes_it, flops_it = scan_cost_analysis(
                s2, X, update_fn=update_fn_of(s2)
            )
        except Exception:  # noqa: BLE001 — cost analysis is best-effort
            bytes_it = flops_it = None
        ms = 1e3 / ips
        rec = {"stage": name, "iters_per_sec": round(ips, 1),
               "ms_per_iter": round(ms, 3)}
        if bytes_it is not None:
            rec["xla_op_level_mb"] = round(bytes_it / 1e6, 1)
            rec["xla_gflops"] = round(flops_it / 1e9, 2)
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({"stage": name, "error": str(exc)[:200]}), flush=True)


def fastmnmf_stages():
    X = make_input()
    rows = []
    factory = lambda: FastMultichannelISNMF(n_basis=10, recordable_loss=False)  # noqa: E731

    def norm_qx(solver):
        def fn(state):
            s2 = solver._normalize_state(state)
            return dict(s2, qx_power=solver._compute_qx_power(s2))

        return fn

    # stage scans sized so the DIFFERENCED device time is tens of ms —
    # the first cut used 200-iter scans for every stage and the fast
    # stages (scm, diagonalizer) differenced BELOW the tunnel's ±1-2 ms
    # jitter, printing nonsense rates (1.8e11 iters/s)
    stages = [
        ("FastMNMF full iteration", lambda s: s.update_state, 150),
        ("  nmf (W+H MU)", lambda s: s._update_nmf, 2000),
        ("  scm (g MU)", lambda s: s._update_scm, 2000),
        ("  diagonalizer (Q IP sweep)", lambda s: s._update_diagonalizer, 1500),
        ("  normalize + |Qx|^2 refresh", norm_qx, 600),
    ]
    for name, ufo, iters in stages:
        bench_stage(name, factory, X, ufo, iters, rows)
    return rows


def sawada_stages():
    X = make_input()
    rows = []
    factory = lambda: MultichannelISNMF(n_basis=10, recordable_loss=False)  # noqa: E731

    stages = [
        ("Sawada full iteration", lambda s: s.update_state, 100),
        ("  basis MU", lambda s: s._update_sawada_basis, 300),
        ("  activation MU", lambda s: s._update_sawada_activation, 300),
        ("  latent MU", lambda s: s._update_sawada_latent, 300),
        ("  spatial (Riccati)", lambda s: s._update_sawada_spatial, 300),
    ]
    for name, ufo, iters in stages:
        bench_stage(name, factory, X, ufo, iters, rows)
    return rows


def ipsdta_stages():
    """Kondo (MM source + VCD spatial): attribute the signed bound — which
    half of the 84 iters/s iteration actually costs (the serial VCD sweep
    was the structural argument; this measures it)."""
    from audio_source_separation_tpu.models import GaussIPSDTA
    from audio_source_separation_tpu.models.ipsdta import _f32_matmuls

    X = make_input()
    rows = []
    factory = lambda: GaussIPSDTA(  # noqa: E731
        n_basis=2, author="Kondo", recordable_loss=False
    )

    def source_only(solver):
        @_f32_matmuls
        def fn(state):
            layout = solver._layout(state["input"].shape[1])
            planes = solver.source_planes and layout.block_size <= 3
            upd = (
                solver._update_source_mm_compact
                if planes and solver.source_compact
                else solver._update_source_mm_planes
                if planes
                else solver._update_source_mm
            )
            return solver._normalize_psdtf(upd(state, layout))

        return fn

    def spatial_only(solver):
        @_f32_matmuls
        def fn(state):
            layout = solver._layout(state["input"].shape[1])
            return solver._update_spatial_vcd(
                state, layout, n_spatial=solver.spatial_iteration
            )

        return fn

    stages = [
        ("IPSDTA Kondo full iteration", lambda s: s.update_state, 10),
        ("  source MM + normalize", source_only, 20),
        ("  spatial VCD sweep", spatial_only, 20),
    ]
    for name, ufo, iters in stages:
        bench_stage(name, factory, X, ufo, iters, rows)
    return rows


def ipsdta_ikeshita_stages():
    """Ikeshita (EM source + fixed-point spatial): attribute the source EM
    chains vs the fixed-point G/inverse stage (whose (S, nb, BC, BC) = 4×4
    inverses and to_psd eigh are OUTSIDE the n ≤ 3 closed forms)."""
    from audio_source_separation_tpu.models import GaussIPSDTA
    from audio_source_separation_tpu.models.ipsdta import _f32_matmuls

    X = make_input()
    rows = []
    factory = lambda: GaussIPSDTA(  # noqa: E731
        n_basis=2, author="Ikeshita", recordable_loss=False
    )

    def source_only(solver):
        @_f32_matmuls
        def fn(state):
            layout = solver._layout(state["input"].shape[1])
            planes = solver.source_planes and layout.block_size <= 3
            upd = (
                solver._update_source_em_compact
                if planes and solver.source_compact
                else solver._update_source_em_planes
                if planes
                else solver._update_source_em
            )
            return solver._normalize_psdtf(upd(state, layout))

        return fn

    def spatial_only(solver):
        @_f32_matmuls
        def fn(state):
            layout = solver._layout(state["input"].shape[1])
            for _ in range(solver.spatial_iteration):
                state = solver._update_spatial_fixed_point(state, layout)
            return state

        return fn

    stages = [
        ("IPSDTA Ikeshita full iteration", lambda s: s.update_state, 10),
        ("  source EM + normalize", source_only, 20),
        ("  spatial fixed-point", spatial_only, 20),
    ]
    for name, ufo, iters in stages:
        bench_stage(name, factory, X, ufo, iters, rows)
    return rows


def ozerov_stages():
    X = make_input()
    rows = []
    factory = lambda: MultichannelISNMF(  # noqa: E731
        n_basis=10, author="Ozerov", recordable_loss=False
    )

    def e_only(solver):
        def fn(state):
            Sx, sigma_s = solver._sigma_components(state)
            M2, v = solver._collapsed_posteriors(state, Sx, sigma_s)
            S = solver.n_sources
            # reduce EVERY posterior plane so none of the E step is DCE'd,
            # then fold an exact *1.0 (= s/s) into a carried field so the
            # next scan iteration depends on this one (defeats XLA's
            # loop-invariant hoisting without changing any value)
            total = sum(
                jnp.abs(M2[s][r]).sum() for s in range(S) for r in range(S)
            ) + (jnp.abs(v) ** 2).sum() + sigma_s.sum()
            one = (total / total).astype(state["basis"].dtype)
            return dict(state, basis=state["basis"] * one)

        return fn

    stages = [
        ("Ozerov full EM iteration", lambda s: s.update_state, 150),
        ("  E step (Sigma_x planes -> M2, v)", e_only, 400),
    ]
    for name, ufo, iters in stages:
        bench_stage(name, factory, X, ufo, iters, rows)
    return rows


def main():
    fast = fastmnmf_stages()
    oz = ozerov_stages()
    saw = sawada_stages()
    ips = ipsdta_stages()
    ike = ipsdta_ikeshita_stages()
    rows = fast + oz + saw + ips + ike
    print("\n| Stage | iters/s | ms/iter | XLA op MB | XLA GFLOP |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            "| {} | {} | {} | {} | {} |".format(
                r["stage"], r.get("iters_per_sec", "-"),
                r.get("ms_per_iter", "-"), r.get("xla_op_level_mb", "-"),
                r.get("xla_gflops", "-"),
            )
        )
    # artifact consumed by run_all.py when it regenerates RESULTS.md
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "STAGES.json")
    with open(out, "w") as f:
        json.dump({"rows": rows}, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
