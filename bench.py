"""Benchmark: AuxIVA-IP solver iterations/sec on TPU vs the NumPy reference.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

The workload matches the reference's canonical config (BASELINE.md): 2-channel
mixture, fft 4096 (2049 bins), ~60 s at 16 kHz (469 frames).  The baseline is
a faithful NumPy implementation of the same AuxIVA-IP update math the
reference runs (weighted covariance via materialized outer products + per-bin
cond/solve, ``/root/reference/src/bss/iva.py:481-523``), timed on this host
and cached in ``.bench_baseline.json`` (~1 min to measure; delete the file to
re-measure).

METHODOLOGY (round 2): one jitted call through this development tunnel has a
fixed ~7-9 ms dispatch round trip (measured: a do-nothing jitted call costs
the same as a 30-iteration solver scan).  Per-iteration numbers computed as
``30 iters / call time`` therefore measure the TUNNEL, not the chip — round
1's "4344 iters/s ⇒ 230 µs/iter" was exactly that.  The headline now reports
the sustained device rate by DIFFERENCING two scan lengths
(``(L_long − L_short) / (t_long − t_short)``, min-time over several windows),
which cancels the fixed dispatch cost; measured sustained device time for
this workload is ~25-50 µs/iteration.  ``benchmarks/RESULTS.md`` uses the
same differencing through ``benchmark_solver`` for every solver family.
"""

import json
import os
import time

import numpy as np

_BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json"
)

N_CHANNELS = 2
N_BINS = 2049
N_FRAMES = 469
ITERS = 30
EPS = 1e-12
THRESHOLD = 1e12


def make_input(dtype=np.complex128):
    rng = np.random.RandomState(111)
    # a "mixture-like" spectrogram: two modulated noise sources, instantaneously mixed
    S = rng.randn(2, N_BINS, N_FRAMES) * np.abs(
        rng.randn(2, 1, N_FRAMES)
    ) + 1j * rng.randn(2, N_BINS, N_FRAMES)
    A = np.array([[1.0, 0.7], [0.6, 1.0]])
    X = np.einsum("cn,nft->cft", A, S).astype(dtype)
    return X


# --------------------------------------------------------------------------- #
# NumPy baseline (the reference's update math, same op sequence)
# --------------------------------------------------------------------------- #
def numpy_auxiva_ip(X, n_iter):
    n_channels, n_bins, n_frames = X.shape
    W = np.tile(np.eye(n_channels, dtype=X.dtype), (n_bins, 1, 1))
    Xb = X.transpose(1, 2, 0)  # (F, T, C)
    E = np.eye(n_channels)
    for _ in range(n_iter):
        Y = np.einsum("fnc,cft->nft", W, X)
        R = np.sqrt((np.abs(Y) ** 2).sum(axis=1))
        R = np.maximum(R, EPS)
        XX = Xb[:, :, :, None] * Xb[:, :, None, :].conj()  # (F, T, C, C)
        for n in range(n_channels):
            U_n = (XX / R[n][None, :, None, None]).mean(axis=1)
            WU = W @ U_n
            condition = np.linalg.cond(WU) < THRESHOLD
            w = np.linalg.solve(WU, np.tile(E[n], (n_bins, 1))[..., None])[..., 0]
            wUw = np.einsum("fc,fcd,fd->f", w.conj(), U_n, w).real
            w_new = w.conj() / np.sqrt(wUw)[:, None]
            W[:, n, :] = np.where(condition[:, None], w_new, W[:, n, :])
    return W


def bench_numpy(X, use_cache=True):
    """NumPy-reference iterations/sec, cached on disk (the measurement costs
    ~1 min per run and the baseline is a property of the host, not the build)."""
    key = "numpy_auxiva_ip_2ch_fft4096"
    if use_cache and os.path.exists(_BASELINE_CACHE):
        try:
            with open(_BASELINE_CACHE) as f:
                cached = json.load(f)
            if key in cached:
                return cached[key]
        except (ValueError, OSError):
            pass
    # time a few iterations, extrapolate
    n_iter = 3
    numpy_auxiva_ip(X, 1)  # warm caches
    start = time.perf_counter()
    numpy_auxiva_ip(X, n_iter)
    elapsed = time.perf_counter() - start
    ips = n_iter / elapsed
    if use_cache:
        try:
            with open(_BASELINE_CACHE, "w") as f:
                json.dump({key: ips}, f)
        except OSError:
            pass
    return ips


# --------------------------------------------------------------------------- #
# JAX/TPU path
# --------------------------------------------------------------------------- #
def bench_jax(X):
    import jax
    import jax.numpy as jnp

    from audio_source_separation_tpu.parallel.sharded import auxiva_ip_step

    # real-array boundary: complex spectrogram packed on host as (re, im)
    X2 = jnp.asarray(
        np.stack([X.real, X.imag]).astype(np.float32)
    )  # (2, C, F, T)
    n_channels, n_bins = X2.shape[1], X2.shape[2]
    W2_0 = jnp.stack(
        [
            jnp.tile(jnp.eye(n_channels, dtype=jnp.float32), (n_bins, 1, 1)),
            jnp.zeros((n_bins, n_channels, n_channels), dtype=jnp.float32),
        ]
    )

    from audio_source_separation_tpu.ops.ip_components import (
        auxiva_ip_step_components,
        pair_products_planes,
        separate_components,
    )

    n_channels = X.shape[0]
    n_bins = X.shape[1]

    # Component layout (ops/ip_components.py): every per-bin CxC quantity is a
    # set of (F,)-component vectors with the bin axis in lanes — avoids the
    # ~256x tile padding of (F, 2, 2) tensors that otherwise dominates the
    # iteration, and the covariance contraction is one real f32 GEMM.
    @jax.jit
    def run(X2, W2):
        Xc = jax.lax.complex(X2[0], X2[1])
        planes = pair_products_planes(Xc)  # loop-invariant
        W0c = jax.lax.complex(W2[0], W2[1])
        W_rows = [
            [W0c[:, s, c] for c in range(n_channels)] for s in range(n_channels)
        ]
        Y0 = separate_components(W_rows, Xc)

        def body(carry, _):
            W_rows, Y = carry
            W_rows, Y, nll = auxiva_ip_step_components(Xc, W_rows, Y, planes)
            return (W_rows, Y), nll

        (W_rows, _), nlls = jax.lax.scan(body, (W_rows, Y0), None, length=ITERS)
        W = jnp.stack(
            [jnp.stack(row, axis=-1) for row in W_rows], axis=1
        )  # (F, N, C)
        return jnp.stack([W.real, W.imag]), nlls

    # two scan lengths; the fixed per-call tunnel dispatch (~7-9 ms) cancels
    # in the difference (see module docstring).  The long scan is sized so
    # the differenced device time is ~20+ ms — well above the tunnel's
    # ±1-2 ms per-call jitter.  jax.device_get is the only reliable
    # completion barrier on this backend.
    short, long_ = ITERS, 30 * ITERS

    @jax.jit
    def run_long(X2, W2):
        Xc = jax.lax.complex(X2[0], X2[1])
        planes = pair_products_planes(Xc)
        W0c = jax.lax.complex(W2[0], W2[1])
        W_rows = [
            [W0c[:, s, c] for c in range(n_channels)] for s in range(n_channels)
        ]
        Y0 = separate_components(W_rows, Xc)

        def body(carry, _):
            W_rows, Y = carry
            W_rows, Y, nll = auxiva_ip_step_components(Xc, W_rows, Y, planes)
            return (W_rows, Y), nll

        (W_rows, _), nlls = jax.lax.scan(body, (W_rows, Y0), None, length=long_)
        return nlls

    X2 = jax.device_put(X2)
    W2_0 = jax.device_put(W2_0)
    _, nll = run(X2, W2_0)
    nll_host = jax.device_get(nll)
    assert np.isfinite(nll_host).all()
    _ = jax.device_get(run_long(X2, W2_0))

    # min-time over several windows (shared tunnel: high run-to-run variance)
    def min_time(fn, n_windows=5):
        best = float("inf")
        for _ in range(n_windows):
            start = time.perf_counter()
            out = fn()
            _ = jax.device_get(out)
            best = min(best, time.perf_counter() - start)
        return best

    t_short = min_time(lambda: run(X2, W2_0)[1])
    t_long = min_time(lambda: run_long(X2, W2_0))
    marginal = max(t_long - t_short, 1e-9) / (long_ - short)
    return 1.0 / marginal


def bench_solver_runtime(X):
    """Sustained rate of the PRODUCTION solver runtime (IterativeSolver scan
    with the invariant/derived carry split), same differencing methodology —
    the number a user's ``solver(X, iteration=N)`` call sustains on device."""
    from audio_source_separation_tpu.models import AuxLaplaceIVA
    from audio_source_separation_tpu.runtime import benchmark_solver

    solver = AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=False)
    # 4000 iterations: at the power-only scan's ~100k iters/s a 400-iter
    # window is ~4 ms of device time — inside the tunnel's ±1-2 ms per-call
    # jitter (observed swings 77k-126k); 4000 gives a ~40 ms differenced
    # window and run-to-run stability
    ips, _ = benchmark_solver(solver, X.astype(np.complex64), iteration=4000)
    return ips


def main():
    X = make_input()
    jax_ips = bench_jax(X)
    solver_ips = bench_solver_runtime(X)
    numpy_ips = bench_numpy(X)
    # ONE line, TWO self-describing metrics (VERDICT r2 item 5): the headline
    # is the raw component-layout kernel scan; "solver_runtime" is the full
    # IterativeSolver production path on the same workload.  Both use the
    # dispatch-cancelling differenced methodology.
    result = {
        "metric": "auxiva_ip_component_kernel_iters_per_sec_2ch_fft4096",
        "value": round(jax_ips, 3),
        "unit": "iters/s",
        "vs_baseline": round(jax_ips / numpy_ips, 2),
        "solver_runtime": {
            "metric": "auxiva_ip_solver_runtime_iters_per_sec_2ch_fft4096",
            "value": round(solver_ips, 3),
            "unit": "iters/s",
            "vs_baseline": round(solver_ips / numpy_ips, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
