#!/usr/bin/env python
"""Extended benchmark sweep: iterations/sec for the headline solvers on the
current backend (TPU by default).  `bench.py` stays the driver's single-line
headline; this script records the broader table in benchmarks/RESULTS.md.

Uses the same canonical config as BASELINE.md (2-channel, fft 4096 → 2049
bins, ~60 s at 16 kHz → 469 frames).

METHODOLOGY: one jitted call through the development TPU tunnel costs a
fixed ~7-9 ms dispatch round trip, so naive per-call rates measure the
tunnel, not the chip.  ``benchmark_solver`` times two scan lengths and
reports the differenced sustained device rate (see
``runtime/profiling.py``); ``bench.py`` uses the same differencing on the
raw component-layout kernel.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from audio_source_separation_tpu.models import (
    AuxGaussIVA,
    AuxLaplaceIVA,
    CauchyNMF,
    ComplexEUCNMF,
    ConsistentGaussILRMA,
    CovarianceISNMF,
    EUCNMF,
    EUCNTF,
    FastMultichannelISNMF,
    GaussILRMA,
    GaussIPSDTA,
    GradLaplaceFDICA,
    GradLaplaceIVA,
    ISNMF,
    KLNMF,
    LDPSDTF,
    MultichannelISNMF,
    NaturalGradLaplaceFDICA,
    NaturalGradLaplaceIVA,
    ProxLaplaceIVA,
    TILRMA,
    TIPSDTA,
    TNMF,
)
from audio_source_separation_tpu.runtime import (
    benchmark_solver,
    measure_memory_bandwidth,
    scan_cost_analysis,
    state_payload_bytes,
)


def make_input(n_channels=2, n_bins=2049, n_frames=469, dtype=np.complex64):
    rng = np.random.RandomState(111)
    S = rng.randn(n_channels, n_bins, n_frames) * np.abs(
        rng.randn(n_channels, 1, n_frames)
    ) + 1j * rng.randn(n_channels, n_bins, n_frames)
    A = np.array([[1.0, 0.7], [0.6, 1.0]])[:n_channels, :n_channels]
    return np.einsum("cn,nft->cft", A, S).astype(dtype)


def bench_idlma(short=20, long_=200, hidden=512):
    """Fully-jitted DNN-informed separation (IDLMA ``jax_dnn=True``): the
    variance MLP (F → hidden → F, per source/frame) runs INSIDE the scan, so
    each iteration is IP + separation + two MXU GEMMs.  Differenced rate like
    ``benchmark_solver`` (IDLMA has its own driver loop, not the scan
    runtime)."""
    import jax
    import jax.numpy as jnp

    from audio_source_separation_tpu.models import GaussIDLMA

    X = make_input()
    F = X.shape[1]
    rng = np.random.RandomState(111)
    W1 = jnp.asarray((rng.randn(hidden, F) * 0.01).astype(np.float32))
    W2 = jnp.asarray((rng.randn(F, hidden) * 0.01).astype(np.float32))

    def mlp(amp):  # (S, F, T) → positive variances (S, F, T)
        h = jax.nn.relu(jnp.einsum("hf,sft->sht", W1, amp))
        return jax.nn.softplus(jnp.einsum("fh,sht->sft", W2, h)) + 1e-3

    # time the jitted scan DIRECTLY with on-device state: a full __call__
    # moves ~45 MB through the development tunnel (~1.4 s at its ~30 MB/s),
    # which swamps the per-iteration device time entirely (measured: a
    # 200-iteration call times the same as a 20-iteration one)
    from audio_source_separation_tpu.ops.packing import pack

    solver = GaussIDLMA(jax_dnn=True)
    n_channels, n_bins, n_frames = X.shape
    solver.n_sources = solver.n_channels = n_channels
    solver.n_bins, solver.n_frames = n_bins, n_frames
    solver.dnn = mlp
    W0 = np.tile(np.eye(n_channels, dtype=X.dtype), (n_bins, 1, 1))
    state = jax.device_put(
        {
            "input": pack(X),
            "demix_filter": pack(W0),
            "dnn_output": jnp.ones((n_channels, n_bins, n_frames)),
        }
    )
    run_s = jax.jit(solver._jax_scan_fn(short))
    run_l = jax.jit(solver._jax_scan_fn(long_))

    t0 = time.perf_counter()
    _ = jax.device_get(run_l(state)[1])
    compile_s = time.perf_counter() - t0
    _ = jax.device_get(run_s(state)[1])

    def timed(fn, windows=4):
        best = float("inf")
        for _ in range(windows):
            t0 = time.perf_counter()
            _ = jax.device_get(fn(state)[1])  # losses (n,) — tiny transfer
            best = min(best, time.perf_counter() - t0)
        return best

    t_s, t_l = timed(run_s), timed(run_l)
    return (long_ - short) / max(t_l - t_s, 1e-9), compile_s


def bench_dp_throughput(batch=16, n_iter=30):
    """Data-parallel mixtures/sec: batched AuxIVA-IP via the vmapped
    component-layout scan (see benchmarks/throughput.py for the sweep)."""
    import jax.numpy as jnp

    from audio_source_separation_tpu.ops.ip_components import (
        auxiva_ip_step_components,
        pair_products_planes,
        separate_components,
    )

    rng = np.random.RandomState(111)
    C, F, T = 2, 1025, 256

    def single(X2):
        Xc = jax.lax.complex(X2[0], X2[1])
        planes = pair_products_planes(Xc)
        eye = jnp.eye(C, dtype=Xc.dtype)
        W_rows = [
            [jnp.broadcast_to(eye[s, c], (F,)) for c in range(C)] for s in range(C)
        ]
        Y = separate_components(W_rows, Xc)

        def body(carry, _):
            W_rows, Y = carry
            W_rows, Y, nll = auxiva_ip_step_components(Xc, W_rows, Y, planes)
            return (W_rows, Y), nll

        (_, _), nlls = jax.lax.scan(body, (W_rows, Y), None, length=n_iter)
        return nlls[-1]

    X2 = jnp.asarray(rng.randn(batch, 2, C, F, T).astype(np.float32))
    run = jax.jit(jax.vmap(single))
    _ = jax.device_get(run(X2))  # compile + warm
    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = run(X2)
    _ = jax.device_get(out)
    elapsed = time.perf_counter() - t0
    return batch * n_rep / elapsed, "{}ch, {} bins, {} frames, {} iters".format(
        C, F, T, n_iter
    )


def main():
    X = make_input()
    # scan lengths sized so the DIFFERENCED device time (long − short) is
    # tens of ms — well above the shared tunnel's ±1-2 ms per-call jitter;
    # 30-iteration scans on the >5k iters/s solvers measured the jitter.
    # Re-sized round 5 for the >50k iters/s rows: the round-4 power-only
    # AuxIVA scan made 400 iterations ~4 ms of device time, and the row
    # swung 77k-126k run-to-run (benchmark_solver now warns on <10 ms
    # windows)
    configs = [
        ("AuxIVA-IP", 4000, lambda: AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=False)),
        ("AuxIVA-ISS", 400, lambda: AuxLaplaceIVA(algorithm_spatial="ISS", recordable_loss=False)),
        ("AuxIVA-IP2", 300, lambda: AuxLaplaceIVA(algorithm_spatial="IP2", recordable_loss=False)),
        ("GaussILRMA-IP2 (K=10)", 300, lambda: GaussILRMA(n_basis=10, algorithm_spatial="IP2", recordable_loss=False)),
        ("GaussILRMA (K=10)", 300, lambda: GaussILRMA(n_basis=10, recordable_loss=False)),
        ("tILRMA (K=10)", 300, lambda: TILRMA(n_basis=10, nu=1000, recordable_loss=False)),
        ("FastMNMF (K=10)", 100, lambda: FastMultichannelISNMF(n_basis=10, recordable_loss=False)),
        ("Sawada MNMF (K=10)", 100, lambda: MultichannelISNMF(n_basis=10, recordable_loss=False)),
        ("Ozerov MNMF (K=10)", 50, lambda: MultichannelISNMF(n_basis=10, author="Ozerov", recordable_loss=False)),
        ("NatGradFDICA", 400, lambda: NaturalGradLaplaceFDICA(recordable_loss=False)),
        ("GradLaplaceIVA", 400, lambda: GradLaplaceIVA(recordable_loss=False)),
        ("NatGradLaplaceIVA", 400, lambda: NaturalGradLaplaceIVA(recordable_loss=False)),
        ("ProxLaplaceIVA", 400, lambda: ProxLaplaceIVA(recordable_loss=False)),
        ("ConsistentILRMA (K=10)", 100, lambda: ConsistentGaussILRMA(n_basis=10, fft_size=4096, hop_size=2048, recordable_loss=False)),
        ("GaussIPSDTA Kondo (K=2, 1024 blocks)", 5, lambda: GaussIPSDTA(n_basis=2, author="Kondo", recordable_loss=False)),
        ("GaussIPSDTA Ikeshita (K=2, 1024 blocks)", 5, lambda: GaussIPSDTA(n_basis=2, author="Ikeshita", recordable_loss=False)),
        ("tIPSDTA Kondo (K=2, 1024 blocks)", 5, lambda: TIPSDTA(n_basis=2, nu=1000, recordable_loss=False)),
        ("AuxGaussIVA-IP", 4000, lambda: AuxGaussIVA(algorithm_spatial="IP", recordable_loss=False)),
        ("GradLaplaceFDICA", 400, lambda: GradLaplaceFDICA(recordable_loss=False)),
    ]
    # roofline denominator: the chip's SUSTAINED copy bandwidth, measured on
    # the actual device (triad kernel, differenced scan lengths)
    try:
        peak_gbs = measure_memory_bandwidth()
        print(json.dumps({"measured_hbm_bandwidth_gb_s": round(peak_gbs, 1)}), flush=True)
    except Exception as exc:  # noqa: BLE001
        peak_gbs = None
        print(json.dumps({"hbm_probe_error": str(exc)[:200]}), flush=True)

    results = []

    def bench_one(name, iters, factory, target):
        np.random.seed(111)
        solver = factory()
        try:
            ips, compile_s = benchmark_solver(solver, target, iteration=iters)
            np.random.seed(111)
            try:
                bytes_it, flops_it = scan_cost_analysis(factory(), target)
            except Exception:  # noqa: BLE001 — cost analysis is best-effort
                bytes_it = flops_it = None
            np.random.seed(111)
            try:
                payload = state_payload_bytes(factory(), target)
            except Exception:  # noqa: BLE001
                payload = None
            results.append((name, ips, compile_s, bytes_it, flops_it, payload))
            rec = {"solver": name, "iters_per_sec": round(ips, 2),
                   "compile_plus_first_exec_s": round(compile_s, 1)}
            if payload is not None:
                rec["state_payload_mb"] = round(payload / 1e6, 1)
                rec["floor_gb_s"] = round(payload * ips / 1e9, 1)
                if peak_gbs:
                    rec["floor_pct_of_copy_bw"] = round(
                        100 * payload * ips / 1e9 / peak_gbs, 1
                    )
            if bytes_it is not None:
                rec["xla_op_level_mb_per_iter"] = round(bytes_it / 1e6, 1)
            print(json.dumps(rec), flush=True)
        except Exception as exc:  # noqa: BLE001 — record and continue
            print(json.dumps({"solver": name, "error": str(exc)[:200]}), flush=True)

    for name, iters, factory in configs:
        bench_one(name, iters, factory, X)

    # L3 factorization components on their native targets (VERDICT r3
    # item 3 — every non-stub solver class gets a measured row).  Targets:
    # P1 = single-channel power spectrogram; P3 = multichannel power tensor;
    # cov = observed covariance planes (the covariance-domain Sawada
    # factorizer, ``nmf.py:678-815``); gram = K PSD Gram planes over frames
    # (LD-PSDTF's time-domain frame model, ``psdtf.py:88-176``; B = 64 taps).
    P1 = (np.abs(X[0]) ** 2).astype(np.float32)
    P3 = (np.abs(X) ** 2).astype(np.float32)
    cov_target = np.einsum("cft,dft->ftcd", X, X.conj()).astype(np.complex64)
    rng_g = np.random.RandomState(7)
    B = 64
    bases = [rng_g.randn(B, B) for _ in range(2)]
    gram = np.einsum(
        "kij,kt->ijt",
        np.stack([a @ a.T + 0.5 * np.eye(B) for a in bases]),
        np.abs(rng_g.randn(2, X.shape[-1])) + 0.2,
    )
    factor_configs = [
        ("ISNMF (K=10, 1 ch)", 4000, lambda: ISNMF(n_basis=10), P1),
        ("EUCNMF (K=10, 1 ch)", 8000, lambda: EUCNMF(n_basis=10), P1),
        ("KLNMF (K=10, 1 ch)", 4000, lambda: KLNMF(n_basis=10), P1),
        ("tNMF (K=10, 1 ch)", 2000, lambda: TNMF(n_basis=10), P1),
        ("CauchyNMF (K=10, 1 ch)", 4000, lambda: CauchyNMF(n_basis=10), P1),
        ("ComplexEUCNMF (K=10, 1 ch)", 300, lambda: ComplexEUCNMF(n_basis=10), X[0]),
        ("EUCNTF (K=10)", 3000, lambda: EUCNTF(n_basis=10), P3),
        ("CovarianceISNMF (K=10)", 50, lambda: CovarianceISNMF(n_basis=10), cov_target),
        ("LDPSDTF (K=2, B=64)", 60, lambda: LDPSDTF(n_basis=2), gram),
    ]
    for name, iters, factory, target in factor_configs:
        bench_one(name, iters, factory, target)

    try:
        ips, compile_s = bench_idlma()
        results.append(("GaussIDLMA (jax MLP 2049-512-2049)", ips, compile_s, None, None, None))
        print(json.dumps({"solver": "GaussIDLMA (jax MLP)", "iters_per_sec": round(ips, 2),
                          "compile_plus_first_exec_s": round(compile_s, 1)}), flush=True)
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({"solver": "GaussIDLMA", "error": str(exc)[:200]}), flush=True)

    try:
        dp_rate, dp_config = bench_dp_throughput()
        print(json.dumps({"dp_batch16_mixtures_per_sec": round(dp_rate, 1),
                          "config": dp_config}), flush=True)
    except Exception as exc:  # noqa: BLE001
        dp_rate, dp_config = None, str(exc)[:200]

    backend = jax.default_backend()
    lines = [
        "# Benchmark results",
        "",
        "Backend: `{}`; config: 2 ch, 2049 bins (fft 4096), 469 frames,".format(backend),
        "complex64; SUSTAINED device iterations/sec of the jitted",
        "solver-runtime scan (loss recording off; `jax.device_get` sync).",
        "",
        "Methodology: one jitted call through the development TPU tunnel",
        "costs a fixed ~7-9 ms dispatch round trip; rates are therefore",
        "computed by differencing two scan lengths (the fixed cost cancels),",
        "min-time over several windows — `benchmark_solver` in",
        "`runtime/profiling.py`.  `bench.py`'s headline uses the same",
        "differencing on the raw component-layout kernel.  (Round-1 numbers",
        "divided one call's time by 30 iterations and were dominated by the",
        "dispatch: they understate the chip ~4-10x.)  Scan lengths are sized",
        "so the differenced device time is tens of ms: the tunnel adds",
        "±1-2 ms of per-call jitter, which at 30-iteration scans swung the",
        ">5k iters/s rows by up to ±2x run-to-run (observed both ways).",
        "Round 5 re-sized the >50k iters/s rows to 2000-8000-iteration",
        "scans: the round-4 power-only speedup had shrunk AuxIVA-IP's",
        "400-iteration window to ~4 ms, and the published row swung",
        "77k-126k across regenerations (`benchmark_solver` now warns on",
        "<10 ms windows).  Rows older than this regeneration that quoted",
        "~102k AuxIVA-IP were high-side jitter samples of the same program",
        "measured at ~85k here.",
        "",
        "The dominant optimization across the heavy families is the PLANES",
        "LAYOUT: every per-bin/per-block small matrix keeps its tiny",
        "(C, B <= 3) axes LEADING and the (bins/frames) axes in the TPU tile",
        "— a materialized (F, T, 2, 2) array pads its minors to the 8x128",
        "tile at ~256x the payload's HBM traffic per read.  Round-over-round",
        "(same hardware): Sawada MNMF 5.6 -> 1166 iters/s (208x), Ozerov EM",
        "152 -> 475, IPSDTA Kondo 0.19 -> 16.6 -> 84.6 (445x vs round 1),",
        "tIPSDTA (compile-failed in round 1) -> 14.7 -> 69.7, Ikeshita",
        "0.23 -> 75.6, and (round 3) the gradient families: NatGradFDICA",
        "1648 -> 17188 iters/s (10.4x) by restating the whole natural-grad",
        "step in component layout — the cross-moments G = mean_t phi conj(y)",
        "become (F,)-plane frame reductions and the (N, F, T) <-> (F, N, T)",
        "transposes and tile-padded (F, C, C) deltas disappear",
        "(ops/ip_components.py::natural_grad_step_components).  AuxIVA-IP's",
        "solver runtime reached the raw kernel (8.1k -> 21.6k) via the",
        "LAYOUT-ANCHORING PROBE: with Pair jit inputs and no live",
        "per-iteration scan output XLA assigns the carried estimates a",
        "catastrophic layout; carrying them in the scan (never in the scan",
        "result) + one |Y|^2 reduction per iteration as a real jit output",
        "restores the fast layout (runtime/solver.py::scan_probe; enabled",
        "only where measured to win - see CLAUDE.md).",
        "Further IPSDTA levers: closed-form block",
        "eigenvalues/adjugate inverses, fused to_PSD/inv/sqrt chains,",
        "trace-cyclic re-derivations that never build rank-6 tensors,",
        "unrolled small matmuls, hoisted VCD sweep invariants.  IPSDTA",
        "forces float32 matmul precision (TPU's default bf16 NaNs the",
        "block-PSD chains; ~15% cost).  lax.scan CARRIES are exempt from",
        "the planes rule — XLA assigns compact carry layouts (measured",
        "neutral on AuxIVA).",
        "",
        "GaussIDLMA runs its own fully-jitted loop (variance MLP inside the",
        "scan; per-iteration loss recording is part of its execution model",
        "and included in its rate).  Its row times the jitted scan with",
        "device-resident state: a full __call__ moves ~45 MB through the",
        "~30 MB/s development tunnel (~1.4 s fixed), which swamps any",
        "iteration count.",
        "",
        "ROOFLINE COLUMNS (VERDICT r2 item 3).  The denominator is the chip's",
        "MEASURED sustained copy bandwidth (`measure_memory_bandwidth`: a",
        "scanned 256 MB triad with the same differenced timing{}).".format(
            " — {:.0f} GB/s on this run".format(peak_gbs) if peak_gbs else ""
        ),
        "Two traffic numerators bracket the truth:",
        "`state MB` is the per-iteration FLOOR — the full state payload",
        "(input + invariant planes + carried/derived fields) touched ONCE",
        "(`state_payload_bytes`); `floor GB/s` = state MB × iters/s, and",
        "`% copy BW` is that floor against the measured bandwidth — a row at",
        "~100% is pinned to HBM; a row ABOVE 100% proves part of its working",
        "set stays VMEM-resident across scan iterations (XLA keeps",
        "loop-invariant/carried buffers on-chip when they fit — the",
        "component/planes layouts make the working set small enough).",
        "`XLA op MB` is the compiled body's op-level cost analysis",
        "(`scan_cost_analysis`) — an upper bound counted before fusion",
        "eliminates intermediate materializations.",
        "",
        "| Solver | iters/s | state MB | floor GB/s | % copy BW | XLA op MB | compile + first exec (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, ips, compile_s, bytes_it, flops_it, payload in results:
        if payload is not None:
            gbs = payload * ips / 1e9
            pct = "{:.0f}%".format(100 * gbs / peak_gbs) if peak_gbs else "—"
            lines.append(
                "| {} | {:.1f} | {:.1f} | {:.1f} | {} | {} | {:.1f} |".format(
                    name, ips, payload / 1e6, gbs, pct,
                    "{:.0f}".format(bytes_it / 1e6) if bytes_it else "—",
                    compile_s,
                )
            )
        else:
            lines.append(
                "| {} | {:.1f} | — | — | — | — | {:.1f} |".format(
                    name, ips, compile_s
                )
            )
    lines += [
        "",
        "Slow-looking rows, with their signed bound (VERDICT r2 items 3/8):",
        "",
        "- **IPSDTA (69-83 iters/s)**: bound by its own op volume, not by",
        "  unfinished optimization.  The op-level cost analysis models",
        "  ~16-21 GB/iteration — the MM/EM source step rebuilds the blocked",
        "  covariance chains `R = Σ_k U_k V_kt → eig → inv/sqrt` twice per",
        "  iteration over (S, T, n_blocks, B, B), and the VCD spatial sweep",
        "  is `spatial_iteration × n_sources × block_size` (= 60 at the",
        "  canonical config) SEQUENTIAL row updates whose coordinate-descent",
        "  order is the algorithm (each update consumes the row written by",
        "  the previous one — reference `bss/ipsdta.py:820-975`; batching",
        "  them would change semantics).  At 83 iters/s the op-level rate is",
        "  already ~1.6 TB/s — ABOVE the chip's copy bandwidth — i.e. XLA's",
        "  fusion is already eliminating most op-level traffic; what remains",
        "  is the eigen-chain intermediates' real traffic plus the serial",
        "  sweep's latency, the two structural terms the planes layout",
        "  cannot remove.  (Round-over-round: 0.19 → 16.6 → 84.6 iters/s.)",
        "- **ILRMA family (~30% floor)**: the floor counts STATE arrays only;",
        "  their NMF MU sweeps read/write K-factor model intermediates (TV",
        "  reconstructions, per-channel powers) that are not state — the",
        "  op-level column shows ~10× the floor, and the measured time matches",
        "  that op-level traffic after typical fusion at the measured bandwidth.",
        "  These rows sit at their real traffic bound, not at an optimization gap",
        "  (probe/carry variants measured 0.87–1.02×).",
        "- **FastMNMF** (round 4: 1,840 → ~3,300 iters/s, 1.8×): every (S, F, T)",
        "  intermediate was eliminated by reassociating the MU contractions —",
        "  the frame/bin reduction lands in a tiny (S, K, M, F) tensor FIRST",
        "  and g folds into W so the model power R is ONE (M·F, S·K)×(S·K, T)",
        "  GEMM with Λ = WH never materialized.  What remains per iteration is",
        "  structural: four R rebuilds (the reference recomputes R after every",
        "  factor update — `mnmf.py:789-852`), six (M, F, T)-operand GEMMs,",
        "  one |Qx|² refresh reading X, and the diagonalizer's weighted",
        "  covariance — a fused-traffic model of ~170-200 MB/iteration, i.e.",
        "  ~0.2 ms at copy bandwidth vs ~0.3 ms measured (within 1.5× of the",
        "  model; the per-stage table below signs the attribution).",
        "- **Ozerov MNMF** (round 4: 451 → ~2,300 iters/s, 5.2×): the E step's",
        "  collapsed posteriors (v, Hermitian M2, σ_s) are materialized ONCE",
        "  behind `lax.optimization_barrier` — without it XLA re-expanded the",
        "  lazy adjugate/Σx chains into every M-step consumer (R_xs, R_ss,",
        "  B_post, both MU contractions), duplicating ~2 GB/iteration; the",
        "  (S, S) normal solve uses the adjugate closed form instead of a",
        "  batched LU.  The E step alone runs ~10.7k iters/s (table below),",
        "  so the EM is now M-step/consumer-bound, not posterior-bound.",
        "  Late round 4 hoisted R_xx = mean_t(x x^H) out of the scan as an",
        "  invariant (a pure function of the mixture) and KEPT the lazy",
        "  per-entry frame reductions for R_xs/R_ss: the 'single batched",
        "  t-contraction einsum' variant modeled fewer bytes (680.7 → 411.9",
        "  MB/iter by cost_analysis) but HALVED the chip rate — t-contracting",
        "  dots layout-copy the (·, F, T) planes to frame-major — and was",
        "  reverted (commit 0476085; see docs/PERFORMANCE.md 'the cost model",
        "  lies both ways').",
        "- **OverAuxIVA**: no separate row — its overdetermined path is PCA",
        "  (one host-jit call) + the AuxIVA-IP scan on the reduced channels",
        "  (`models/iva.py:682-712`), so its per-iteration rate IS the",
        "  AuxIVA-IP row on the reduced mixture.",
        "- **Sawada MNMF**: runs with float32 matmul precision — bf16",
        "  multiplies NaN the EM after ~40 iterations (QUALITY.md sweep);",
        "  full-precision trace/Riccati contractions cost ~2× its bf16 rate",
        "  (1129 → 609 iters/s), the price of correctness at production",
        "  iteration counts.  Round 4 barriers the X̂ reconstruction, its",
        "  adjugate inverse and X̂⁻¹XX̂⁻¹ (each feeds 2-3 downstream",
        "  contractions; the Ozerov E/M multi-consumer lever) — same",
        "  semantics, measured on this run's row.",
        "- **IPSDTA planes source/fixed-point steps**: the",
        "  (S, T, n_blocks, B, B) source chains and the fixed-point G",
        "  statistics have planes-layout duals (`source_planes` toggle,",
        "  bit-parity tested).  Round 4 gated them OFF on the compiled-body",
        "  cost model (planes ~double modeled bytes/FLOPs); the round-5",
        "  ON-CHIP A/B (`planes_ab.py`, table below) measures planes FASTER",
        "  for every author — Kondo 1.39×, Ikeshita 1.29×, tIPSDTA 1.07× —",
        "  the model cannot see the tile-padding/layout-copy cost of the",
        "  (B, B)-minor batched dots.  Default ON since round 5.  Round 5",
        "  then rebuilt the whole iteration on COMPACT-Hermitian planes",
        "  batched over sources (`source_compact`, table below): B² real",
        "  planes instead of complex entry planes, every trace contraction",
        "  one ±2-weighted real GEMM, the t-path's π weight sharing one",
        "  adjugate with the MM statistics — Kondo 1.6×, Ikeshita 1.2×,",
        "  tIPSDTA 1.4× on top of the planes path.  The stage is",
        "  KERNEL-COUNT bound, not bandwidth bound (planes are ~2 MB):",
        "  source-batching alone moved Kondo 143 → 186 iters/s.",
        "- **Round-5 levers**: LDPSDTF replaces the reference's 8×",
        "  batched-eigvalsh + 3× LU chain with a K=2 matrix-PENCIL path",
        "  (one B×B generalized eigendecomposition per iteration",
        "  simultaneously diagonalizes every frame; no (T, B, B) eigh at",
        "  all — `models/psdtf.py`); the activation trace ratios are",
        "  diagonal in the updated pencil frame and trace normalization",
        "  rescales the pencil exactly, so ONE factorization per iteration",
        "  serves basis, activation, carry, and loss (2.3 → 1,556 iters/s",
        "  cumulative).  ComplexEUCNMF carries the phase as unit-phasor",
        "  planes (no per-iteration exp/angle transcendental sweeps),",
        "  collapses the /Beta quotients into two GEMMs, and stores the",
        "  planes basis-LEADING (K, F, T) so tiles cover the big axes",
        "  (833 → 5,126 iters/s cumulative — `models/nmf.py`).  Ozerov and",
        "  LDPSDTF run in equilibrated frames (per-bin / per-frame;",
        "  float32-robust on real music; exactly invariant, oracle-tested).",
        "- **Compact Hermitian planes** (late round 4): a Hermitian",
        "  (C, C, F, T) field stores as C² REAL planes (diagonals + re/im",
        "  per off-diagonal; `ops/fast_linalg.py` compact closed forms) —",
        "  HALF the bytes of complex planes for every barriered",
        "  intermediate, with traces pair-reduced over the upper triangle.",
        "  Sawada MNMF X̂/X̂⁻¹/X̂⁻¹XX̂⁻¹ + the spatial frame contraction:",
        "  compiled-body cost 1,319 → 739 MB/iteration.  CovarianceISNMF",
        "  (the covariance-domain factorizer) additionally reassociates its",
        "  MU trace ratios into plane-level GEMMs (spatial coefficients",
        "  fold into T; V/T contract against each compact plane once) so",
        "  the complex (F, K, T) basis-activation product and the per-basis",
        "  (K, F, T) trace tensors never materialize: 4,929 → 565",
        "  MB/iteration (8.7×).  Round 5 extends the planes layout to the",
        "  spatial RICCATI CHAIN itself (closed-form 2×2 fractional powers",
        "  on compact planes, `solve_riccati_hermitian_compact`): Sawada",
        "  2.4×, CovarianceISNMF 6.5× on chip (A/B table below).",
        "  FastMNMF's MU E-GEMMs are written",
        "  big-operand-first so the (M, F, T) operands keep the frame axis",
        "  minor on both dot sides (the reversed forms layout-copied 7.7 MB",
        "  per GEMM).",
    ]
    # per-stage attribution table (benchmarks/bench_stages.py artifact)
    stages_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "STAGES.json"
    )
    if os.path.exists(stages_path):
        with open(stages_path) as f:
            stage_rows = json.load(f)["rows"]
        lines += [
            "",
            "## Per-stage attribution (FastMNMF / Ozerov EM / Sawada / IPSDTA)",
            "",
            "Each stage timed as its own jitted scan (same differencing;",
            "`bench_stages.py`); stages overlap where the algorithm rebuilds",
            "shared terms (FastMNMF rebuilds R in every stage, exactly as the",
            "reference does), so stage times exceeding the full iteration by",
            "that overlap is the attribution signal, not an error.",
            "",
            "| Stage | iters/s | ms/iter | XLA op MB/iter |",
            "|---|---|---|---|",
        ]
        for r in stage_rows:
            lines.append(
                "| {} | {} | {} | {} |".format(
                    r["stage"].replace("  ", "&nbsp;&nbsp;"),
                    r.get("iters_per_sec", "—"),
                    r.get("ms_per_iter", "—"),
                    r.get("xla_op_level_mb", "—"),
                )
            )

    # DP batch-scaling table (benchmarks/throughput.py artifact)
    dp_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "DP_SWEEP.json"
    )
    if os.path.exists(dp_path):
        with open(dp_path) as f:
            dp = json.load(f)
        batches = dp["batches"]
        lines += [
            "",
            "## Data-parallel scaling (mixtures/s vs batch)",
            "",
            "vmapped functional core, device-resident batch, scalar sync",
            "(`throughput.py`); config: {}.".format(dp["config"]),
            "",
            "| Solver | " + " | ".join("batch {}".format(b) for b in batches) + " |",
            "|---|" + "---|" * len(batches),
        ]
        names = []
        for r in dp["rows"]:
            if r["solver"] not in names:
                names.append(r["solver"])
        for name in names:
            row = [name]
            for b in batches:
                match = [
                    r
                    for r in dp["rows"]
                    if r["solver"] == name and r["batch"] == b
                    and "mixtures_per_sec" in r
                ]
                row.append(
                    "{:.1f}".format(match[0]["mixtures_per_sec"])
                    if match
                    else "—"
                )
            lines.append("| " + " | ".join(row) + " |")
    elif dp_rate is not None:
        lines += [
            "",
            "Data-parallel throughput (batched AuxIVA-IP, vmapped scan,",
            "{}): **{:.0f} mixtures/s** at batch 16.".format(dp_config, dp_rate),
        ]
    # dp×tp mesh-shape sweep (benchmarks/mesh_sweep.py artifact, virtual mesh)
    mesh_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "MESH_SWEEP.json"
    )
    if os.path.exists(mesh_path):
        with open(mesh_path) as f:
            mesh_data = json.load(f)
        lines += [
            "",
            "## Mesh-shape sweep (dp × tp, {}-device virtual mesh)".format(
                mesh_data.get("n_devices", 8)
            ),
            "",
            "Production `batch_separate` scan over every 2-D factorization of",
            "the mesh (`mesh_sweep.py`).  Virtual CPU devices: these rows",
            "prove each sharding compiles/executes with finite results and",
            "bound the GSPMD partitioning overhead — they are NOT TPU",
            "throughput (one host serves all 8 devices; the on-chip DP table",
            "above carries the measured scaling).",
            "",
            "| Solver | dp×tp | cold s | warm s | finite |",
            "|---|---|---|---|---|",
        ]
        for r in mesh_data["rows"]:
            lines.append(
                "| {} | {}×{} | {} | {} | {} |".format(
                    r["solver"], r["dp"], r["tp"], r["cold_s"], r["warm_s"],
                    "yes" if r["finite"] else "NO",
                )
            )

    # round-4 barrier / planes-layout A/B (benchmarks/planes_ab.py artifact)
    planes_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "PLANES_AB.json"
    )
    if os.path.exists(planes_path):
        with open(planes_path) as f:
            planes_rows = [
                r for r in json.load(f)["rows"] if "iters_per_sec" in r
            ]
        by_solver = {}
        for r in planes_rows:
            by_solver.setdefault(r["solver"], {})[r["mode"]] = r["iters_per_sec"]
        pairs = [
            (name, modes[a], modes[b], a, b)
            for name, modes in by_solver.items()
            for a, b in (("barrier", "no barrier"), ("planes", "matrix"))
            if a in modes and b in modes
        ]
        if pairs:
            lines += [
                "",
                "## Barrier / planes-layout A/B (round 4)",
                "",
                "Same solver, same config (`planes_ab.py`, differenced",
                "methodology).  `barrier` = multi-consumer intermediates",
                "materialized behind `lax.optimization_barrier` (Sawada X̂",
                "chain); `planes` = planes-layout IPSDTA source/fixed-point",
                "steps (`source_planes`) vs the matrix-layout path.",
                "",
                "| Solver | on iters/s | off iters/s | on/off |",
                "|---|---|---|---|",
            ]
            for name, on, off, a, b in pairs:
                lines.append(
                    "| {} ({} vs {}) | {:.0f} | {:.0f} | {:.2f}x |".format(
                        name, a, b, on, off, on / off
                    )
                )

    # round-5 planes Riccati A/B (benchmarks/riccati_ab.py artifact)
    riccati_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "RICCATI_AB.json"
    )
    if os.path.exists(riccati_path):
        with open(riccati_path) as f:
            ric_rows = [
                r for r in json.load(f)["rows"] if "iters_per_sec" in r
            ]
        if ric_rows:
            lines += [
                "",
                "## Planes Riccati A/B (round 5)",
                "",
                "Same solver, same config (`riccati_ab.py`, differenced",
                "methodology, arms interleaved twice).  `planes` runs the whole",
                "spatial Riccati chain A^{-1/2}(A^{1/2}BA^{1/2})^{1/2}A^{-1/2}",
                "on compact Hermitian planes (closed-form 2×2 fractional powers,",
                "`ops/fast_linalg.py::solve_riccati_hermitian_compact`) so none",
                "of its intermediates materializes in the tile-padded",
                "(F, ·, 2, 2) matrix layout; `matrix` is the round-4 path.",
                "Gate `riccati_planes` defaults ON (settled here, not by the",
                "cost model).  CovarianceISNMF (K = 10 solves per bin) also",
                "drops compile + first-exec 287 s → ~5 s.",
                "",
                "| Solver | rep | planes iters/s | matrix iters/s | planes/matrix |",
                "|---|---|---|---|---|",
            ]
            by_key = {}
            for r in ric_rows:
                by_key.setdefault((r["solver"], r.get("rep", 1)), {})[
                    r["mode"]
                ] = r["iters_per_sec"]
            for (name, rep), modes in sorted(by_key.items()):
                if "riccati_planes" in modes and "riccati_matrix" in modes:
                    lines.append(
                        "| {} | {} | {:.0f} | {:.0f} | {:.2f}x |".format(
                            name, rep, modes["riccati_planes"],
                            modes["riccati_matrix"],
                            modes["riccati_planes"] / modes["riccati_matrix"],
                        )
                    )

    # round-5 compact-Hermitian IPSDTA A/B (benchmarks/compact_ab.py artifact)
    compact_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "COMPACT_AB.json"
    )
    if os.path.exists(compact_path):
        with open(compact_path) as f:
            cp_rows = [
                r for r in json.load(f)["rows"] if "iters_per_sec" in r
            ]
        if cp_rows:
            lines += [
                "",
                "## IPSDTA compact-Hermitian planes A/B (round 5)",
                "",
                "Same solver, same config (`compact_ab.py`, differenced",
                "methodology, arms interleaved twice).  `compact` runs the",
                "whole IPSDTA iteration — source R/R⁻¹/R⁻²/zzᴴ chains, every",
                "trace contraction (real GEMMs over ±2-weighted upper-triangle",
                "planes), the VCD sweep invariants, the fixed-point G, and the",
                "NLL — on B² REAL compact planes batched over sources (one",
                "kernel stream instead of S duplicates); `planes` is the",
                "round-4 complex-planes path.  Gate `source_compact` defaults",
                "ON (settled here, not by the cost model).",
                "",
                "| Solver | rep | compact iters/s | planes iters/s | compact/planes |",
                "|---|---|---|---|---|",
            ]
            by_key = {}
            for r in cp_rows:
                by_key.setdefault((r["solver"], r.get("rep", 1)), {})[
                    r["mode"]
                ] = r["iters_per_sec"]
            for (name, rep), modes in sorted(by_key.items()):
                if "compact" in modes and "planes" in modes:
                    lines.append(
                        "| {} | {} | {:.0f} | {:.0f} | {:.2f}x |".format(
                            name, rep, modes["compact"], modes["planes"],
                            modes["compact"] / modes["planes"],
                        )
                    )

    # power-only vs complex-restore scan A/B (benchmarks/power_ab.py artifact)
    power_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "POWER_AB.json"
    )
    if os.path.exists(power_path):
        with open(power_path) as f:
            power_rows = [
                r for r in json.load(f)["rows"] if "iters_per_sec" in r
            ]
        by_solver = {}
        for r in power_rows:
            by_solver.setdefault(r["solver"], {})[r["mode"]] = r["iters_per_sec"]
        pairs = {
            name: modes
            for name, modes in by_solver.items()
            if "power" in modes and "complex" in modes
        }
        if pairs:
            lines += [
                "",
                "## Power-only scan A/B (round 4)",
                "",
                "Same solver, same config; `power` never materializes the",
                "complex (N, F, T) estimates inside the scan (|Y|² restored as",
                "an all-real quadratic form over the invariant pair-product",
                "planes, `ops/ip_components.py`); `complex` is the former",
                "restore path (`power_ab.py`, differenced methodology).",
                "",
                "| Solver | power iters/s | complex iters/s | power/complex |",
                "|---|---|---|---|",
            ]
            for name, modes in pairs.items():
                lines.append(
                    "| {} | {:.0f} | {:.0f} | {:.2f}x |".format(
                        name,
                        modes["power"],
                        modes["complex"],
                        modes["power"] / modes["complex"],
                    )
                )

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "RESULTS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
