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


def benchmark_solver(solver, X, iteration=30, warmup=True):
    """Iterations/sec for a solver's jitted scan on the current backend.

    Returns ``(iterations_per_sec, compile_seconds)``.
    """
    import jax.numpy as jnp

    X = np.asarray(X)
    solver.set_shape_metadata(X)
    kwargs = solver.prepare_state_kwargs(X, {})
    Xp = pack(X)
    kwargs_p = pack({k: np.asarray(v) for k, v in kwargs.items()})

    def run(Xp, kwargs_p):
        state = solver.init_state(unpack(Xp), **unpack(kwargs_p))

        def body(s, _):
            return solver.update_state(s), jnp.zeros(())

        state, _ = jax.lax.scan(body, state, None, length=iteration)
        return solver.nll(state)

    jitted = jax.jit(run)
    t0 = time.perf_counter()
    out = jitted(Xp, kwargs_p)
    _ = jax.device_get(out)
    compile_seconds = time.perf_counter() - t0

    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = jitted(Xp, kwargs_p)
    _ = jax.device_get(out)
    elapsed = time.perf_counter() - t0
    return (iteration * n_rep) / elapsed, compile_seconds
