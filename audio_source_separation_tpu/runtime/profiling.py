"""Tracing / profiling hooks.

The reference has no profiling anywhere (SURVEY.md §5: loss history is its
only per-iteration trace).  TPU-native observability:

  * :func:`trace` — context manager around ``jax.profiler.trace`` producing a
    TensorBoard-compatible XPlane trace of every compiled program;
  * :class:`IterationTimer` — a callback measuring wall-clock per iteration
    (host-visible; in callback mode each step is synchronized anyway);
  * :func:`benchmark_solver` — compile once, time a scan of N iterations with
    a proper device sync (``jax.device_get`` — on some TPU transports
    ``block_until_ready`` returns before execution completes).
"""

import contextlib
import time

import jax
import numpy as np

from ..ops.packing import pack, unpack


@contextlib.contextmanager
def trace(log_dir):
    """Profile everything inside the block into ``log_dir`` (TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class IterationTimer:
    """Callback recording wall-clock seconds between iterations."""

    def __init__(self):
        self.timestamps = []

    def __call__(self, solver):
        self.timestamps.append(time.perf_counter())

    @property
    def durations(self):
        return np.diff(self.timestamps)


def benchmark_solver(solver, X, iteration=30, warmup=True, short=None):
    """Sustained device iterations/sec for a solver's jitted scan.

    One jitted call through the development TPU tunnel carries a fixed
    ~7-9 ms dispatch round trip, which at 30-iteration scans dominates the
    measurement.  This times TWO scan lengths (``short`` and ``iteration``)
    and reports the differenced rate
    ``(iteration − short) / (t_long − t_short)`` — the fixed dispatch cost
    cancels, leaving the device's sustained per-iteration time (min-time over
    several windows; ``jax.device_get`` as the only reliable barrier).

    Returns ``(iterations_per_sec, compile_seconds)``.
    """
    import jax.numpy as jnp

    X = np.asarray(X)
    solver.set_shape_metadata(X)
    kwargs = solver.prepare_state_kwargs(X, {})
    Xp = jax.device_put(pack(X))
    kwargs_p = jax.device_put(pack({k: np.asarray(v) for k, v in kwargs.items()}))
    if short is None:
        short = max(1, iteration // 10)

    def make(n_iter):
        def run(Xp, kwargs_p):
            state = solver.init_state(unpack(Xp), **unpack(kwargs_p))
            # same invariant/derived split as the solver runtime's scan
            # (IterativeSolver._scan_fn): loop-invariant state threads into
            # the body as closed-over tracers, derived state is re-derived
            # at the body head instead of carried
            inv = {k: state[k] for k in solver.invariant_fields if k in state}
            derived = tuple(
                k for k in solver.scan_derived_fields() if k in state
            )
            var = {
                k: v
                for k, v in state.items()
                if k not in inv and k not in derived
            }
            var_keys = tuple(var)

            def body(s, _):
                full = solver.update_state(solver.restore_state(dict(inv, **s)))
                return {k: full[k] for k in var_keys}, jnp.zeros(())

            var, _ = jax.lax.scan(body, var, None, length=n_iter)
            return solver.nll(solver.restore_state(dict(inv, **var)))

        return jax.jit(run)

    jit_long = make(iteration)
    jit_short = make(short)

    t0 = time.perf_counter()
    out = jit_long(Xp, kwargs_p)
    _ = jax.device_get(out)
    compile_seconds = time.perf_counter() - t0
    _ = jax.device_get(jit_short(Xp, kwargs_p))

    def min_time(fn, n_windows=4):
        best = float("inf")
        for _ in range(n_windows):
            t0 = time.perf_counter()
            out = fn(Xp, kwargs_p)
            _ = jax.device_get(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t_long = min_time(jit_long)
    t_short = min_time(jit_short)
    marginal = max(t_long - t_short, 1e-9) / (iteration - short)
    return 1.0 / marginal, compile_seconds
