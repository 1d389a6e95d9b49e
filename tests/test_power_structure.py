"""Structural guard for the round-4 power-only scan mode.

The numeric toggle-equivalence tests (test_iva.py / test_ilrma.py) prove the
power-only scan computes the same answer as the complex-restore scan — but a
future in-scan consumer of ``state["estimation"]`` would silently flip the
body back to materializing the complex (N, F, T) estimates every iteration,
losing the measured perf win while all numeric tests stay green.  This test
replays exactly the scan-body composition of
``runtime/solver.py::IterativeSolver._scan_fn`` (invariant/derived split →
``scan_restore_state`` → ``update_state`` → re-project onto the carry keys)
and asserts the STRUCTURE: no complex estimate in the body state, and no
carried complex array at spectrogram scale.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from audio_source_separation_tpu.models import (
    AuxGaussIVA,
    AuxLaplaceIVA,
    GaussILRMA,
    TILRMA,
)
from tests.conftest import make_mixture


def scan_body_once(solver, X):
    """Replicate one trip through the scan body exactly as ``_scan_fn``
    composes it, eagerly, and return (full body state, carried subset)."""
    import jax

    state_kwargs = solver.prepare_state_kwargs(X, {})
    state = solver.init_state(jnp.asarray(X), **state_kwargs)
    # __call__ runs init_state inside jit, so state leaves are device arrays;
    # eagerly they may still be numpy (host RNG inits) — normalize
    state = jax.tree_util.tree_map(jnp.asarray, state)

    inv = {k: state[k] for k in solver.invariant_fields if k in state}
    derived = tuple(k for k in solver.scan_derived_fields() if k in state)
    assert not solver.derived_in_carry  # power mode never carries estimates
    var = {k: v for k, v in state.items() if k not in inv and k not in derived}

    full = solver.scan_restore_state(dict(inv, **var))
    full = solver.update_state(full)
    carried = {k: full[k] for k in var if k in full}
    return full, carried


def assert_power_structure(solver, X):
    n_bins, n_frames = X.shape[1], X.shape[2]
    solver.set_shape_metadata(X)  # the gate reads n_channels
    assert solver._power_only_scan  # contract: the config qualifies
    full, carried = scan_body_once(solver, X)

    # the body never materializes the complex estimates
    assert "estimation" not in full
    # the power statistic, if restored, is real
    if "estimation_power" in full:
        assert not jnp.iscomplexobj(full["estimation_power"])

    # no carried complex array at spectrogram scale: the invariant
    # pair-product planes are closed over (not carried), so anything
    # complex in the carry must be o(F*T) — demixing rows/components only
    for k, v in carried.items():
        for leaf in _leaves(v):
            if jnp.iscomplexobj(leaf):
                assert leaf.size < n_bins * n_frames, (
                    "carried complex array {!r} has spectrogram scale "
                    "{}".format(k, leaf.shape)
                )


def _leaves(v):
    import jax

    return [x for x in jax.tree_util.tree_leaves(v) if hasattr(x, "size")]


@pytest.mark.parametrize("n_channels", [2, 3, 4])
def test_auxiva_power_body_structure(rng, n_channels):
    X = make_mixture(rng, n_channels=n_channels, n_bins=17, n_frames=40)
    for cls in (AuxLaplaceIVA, AuxGaussIVA):
        solver = cls(algorithm_spatial="IP")
        np.random.seed(111)
        assert_power_structure(solver, X)


@pytest.mark.parametrize(
    "make",
    [
        lambda: GaussILRMA(n_basis=2, algorithm_spatial="IP", normalize="power"),
        lambda: GaussILRMA(n_basis=2, algorithm_spatial="IP2", normalize="power"),
        lambda: TILRMA(n_basis=2, nu=1, normalize="power"),
    ],
    ids=["gauss-ip", "gauss-ip2", "t-nu1"],
)
def test_ilrma_power_body_structure(rng, make):
    X = make_mixture(rng, n_channels=2, n_bins=17, n_frames=40)
    solver = make()
    np.random.seed(111)
    assert_power_structure(solver, X)


def test_complex_mode_still_restores_estimation(rng):
    """Control: with the gate forced off, the body restores the complex
    estimates (the structural assertions above are about the gate, not about
    the runtime losing fields)."""
    X = make_mixture(rng, n_channels=2, n_bins=17, n_frames=40)
    solver = AuxLaplaceIVA(algorithm_spatial="IP")
    solver.power_scan = False
    np.random.seed(111)
    solver.set_shape_metadata(X)
    state_kwargs = solver.prepare_state_kwargs(X, {})
    state = solver.init_state(jnp.asarray(X), **state_kwargs)
    inv = {k: state[k] for k in solver.invariant_fields if k in state}
    derived = tuple(k for k in solver.scan_derived_fields() if k in state)
    var = {
        k: v
        for k, v in state.items()
        if k not in inv and (solver.derived_in_carry or k not in derived)
    }
    full = dict(inv, **var)
    if not solver.derived_in_carry:
        full = solver.scan_restore_state(full)
    assert "estimation" in full
    assert jnp.iscomplexobj(full["estimation"])
