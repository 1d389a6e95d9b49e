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
import warnings

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


def benchmark_solver(solver, X, iteration=30, warmup=True, short=None, update_fn=None):
    """Sustained device iterations/sec for a solver's jitted scan.

    One jitted call through the development TPU tunnel carries a fixed
    ~7-9 ms dispatch round trip, which at 30-iteration scans dominates the
    measurement.  This times TWO scan lengths (``short`` and ``iteration``)
    and reports the differenced rate
    ``(iteration − short) / (t_long − t_short)`` — the fixed dispatch cost
    cancels, leaving the device's sustained per-iteration time (min-time over
    several windows; ``jax.device_get`` as the only reliable barrier).

    ``update_fn`` (state → state, default ``solver.update_state``) lets a
    per-stage bench scan ONE stage of a composite update in isolation — the
    basis of the stage-attribution tables in benchmarks/RESULTS.md.

    Returns ``(iterations_per_sec, compile_seconds)``.
    """
    import jax.numpy as jnp

    if update_fn is None:
        update_fn = solver.update_state

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
            # (IterativeSolver._scan_fn), including the derived_in_carry
            # mode (derived fields ride in the carry but never reach the
            # scan result)
            inv = {k: state[k] for k in solver.invariant_fields if k in state}
            derived = tuple(
                k for k in solver.scan_derived_fields() if k in state
            )
            carried_derived = solver.derived_in_carry
            var = {
                k: v
                for k, v in state.items()
                if k not in inv and (carried_derived or k not in derived)
            }
            var_keys = tuple(var)

            def body(s, _):
                full = dict(inv, **s)
                if not carried_derived:
                    full = solver.scan_restore_state(full)
                full = update_fn(full)
                probe = solver.scan_probe(full)
                out = jnp.zeros(()) if probe is None else probe
                return {k: full[k] for k in var_keys}, out

            var, ys = jax.lax.scan(body, var, None, length=n_iter)
            true_state = {k: v for k, v in var.items() if k not in derived}
            # ys must be a REAL jit output: a live per-iteration scan output
            # is what anchors the carry layout (see IterativeSolver.scan_probe)
            return solver.nll(solver.restore_state(dict(inv, **true_state))), ys

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
    if t_long - t_short < 0.010:
        # The tunnel adds ±1-2 ms per-call jitter; a differenced window this
        # small produces rates that swing ±30% run-to-run (observed: the
        # power-only AuxIVA-IP scan at 400 iterations printed 77k, 102k and
        # 126k iters/s on consecutive runs, and twice the difference
        # collapsed to ~0).  Size ``iteration`` so the differenced device
        # time is tens of ms.
        warnings.warn(
            "benchmark_solver: differenced window is {:.1f} ms (< 10 ms); "
            "rate is jitter-dominated — increase `iteration`".format(
                1e3 * (t_long - t_short)
            ),
            RuntimeWarning,
        )
    marginal = max(t_long - t_short, 1e-9) / (iteration - short)
    return 1.0 / marginal, compile_seconds


def _cost_dict(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return ca or {}


def scan_cost_analysis(solver, X, iteration=None, short=None, update_fn=None):
    """XLA-modeled cost of one solver iteration: ``(bytes_per_iter,
    flops_per_iter)``.

    Compiles the scan BODY as a standalone program — ``restore_state`` (the
    derived-field recompute the scan performs every iteration) followed by
    ``update_state``, with the post-init state as I/O — and reads the
    compiled module's ``cost_analysis()``.  These are post-optimization
    (post-fusion) figures, i.e. the traffic/FLOP model XLA itself plans
    for — not a hand traffic model.  (The scan program itself is useless
    here: XLA's cost analysis counts a While body once regardless of trip
    count.)  ``iteration``/``short`` are accepted for signature symmetry
    with :func:`benchmark_solver` and ignored.
    """
    X = np.asarray(X)
    solver.set_shape_metadata(X)
    kwargs = solver.prepare_state_kwargs(X, {})
    Xp = pack(X)
    kwargs_p = pack({k: np.asarray(v) for k, v in kwargs.items()})

    state_shapes = jax.eval_shape(
        lambda Xp, kp: pack(solver.init_state(unpack(Xp), **unpack(kp))),
        Xp,
        kwargs_p,
    )
    derived = tuple(
        k for k in solver.scan_derived_fields() if k in state_shapes
    )
    carried = {k: v for k, v in state_shapes.items() if k not in derived}

    if update_fn is None:
        update_fn = solver.update_state

    def body(sp):
        full = update_fn(solver.scan_restore_state(unpack(sp)))
        return pack({k: full[k] for k in carried})

    compiled = jax.jit(body).lower(carried).compile()
    cost = _cost_dict(compiled)
    return cost.get("bytes accessed", 0.0), cost.get("flops", 0.0)


def state_payload_bytes(solver, X):
    """Conservative per-iteration HBM-traffic FLOOR: the byte size of the
    full solver state (input, precomputed invariants, carried and derived
    fields), i.e. the cost of touching every state array ONCE per
    iteration.  Real traffic is at least this unless the working set stays
    VMEM-resident across scan iterations; op-level totals
    (:func:`scan_cost_analysis`) bound it from above (pre-fusion)."""
    X = np.asarray(X)
    solver.set_shape_metadata(X)
    kwargs = solver.prepare_state_kwargs(X, {})
    Xp = pack(X)
    kwargs_p = pack({k: np.asarray(v) for k, v in kwargs.items()})
    state_shapes = jax.eval_shape(
        lambda Xp, kp: pack(solver.init_state(unpack(Xp), **unpack(kp))),
        Xp,
        kwargs_p,
    )
    return sum(
        int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(state_shapes)
    )


def measure_memory_bandwidth(n_elems=1 << 26, iters=64, windows=4):
    """Empirical sustained HBM bandwidth (GB/s) via a scanned triad kernel
    (``y ← a·x + y``: 2 reads + 1 write of an ``n_elems`` f32 array per
    iteration), with the same two-length differencing as
    :func:`benchmark_solver` so the tunnel dispatch cancels.  This is the
    measured roofline DENOMINATOR on the actual chip — no datasheet numbers.
    """
    import jax.numpy as jnp

    x = jax.device_put(jnp.ones((n_elems,), jnp.float32))
    y = jax.device_put(jnp.full((n_elems,), 0.5, jnp.float32))

    def make(n_iter):
        @jax.jit
        def run(x, y):
            def body(y, _):
                return x * 1.0000001 + y * 0.9999999, ()

            y, _ = jax.lax.scan(body, y, None, length=n_iter)
            return y.sum()

        return run

    short = max(1, iters // 8)
    jit_long, jit_short = make(iters), make(short)
    _ = jax.device_get(jit_long(x, y))
    _ = jax.device_get(jit_short(x, y))

    def min_time(fn):
        best = float("inf")
        for _ in range(windows):
            t0 = time.perf_counter()
            _ = jax.device_get(fn(x, y))
            best = min(best, time.perf_counter() - t0)
        return best

    t_long, t_short = min_time(jit_long), min_time(jit_short)
    per_iter = max(t_long - t_short, 1e-12) / (iters - short)
    bytes_per_iter = 3.0 * n_elems * 4
    return bytes_per_iter / per_iter / 1e9
