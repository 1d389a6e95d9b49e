"""Mesh-aware solver runtime: sharded-vs-single-device equivalence at the
CANONICAL shapes (F=2049 bins / T=469 frames, BASELINE.md config) on the
8-virtual-device CPU mesh.

Covers VERDICT r1 item 1: any scan-mode solver runs under a mesh via
``solver.use_mesh(mesh, mode=...)`` with explicit in/out shardings on the
whole state pytree; ``mode='bins'`` is tensor-parallel over frequency,
``mode='frames'`` is the sequence-parallel analogue (covariance
accumulations become psum over frame shards).
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_source_separation_tpu.models import (
    AuxLaplaceIVA,
    FastMultichannelISNMF,
    GaussILRMA,
)

N_BINS, N_FRAMES = 2049, 469


def _canonical_mixture(rng, n_channels=2, n_bins=N_BINS, n_frames=N_FRAMES):
    S = rng.randn(n_channels, n_bins, n_frames) * np.abs(
        rng.randn(n_channels, 1, n_frames)
    ) + 1j * rng.randn(n_channels, n_bins, n_frames)
    A = np.array([[1.0, 0.7], [0.6, 1.0]])[:n_channels, :n_channels]
    return np.einsum("cn,nft->cft", A, S)


def _mesh_1d(n=8, axis="tp"):
    devices = jax.devices()
    assert len(devices) >= 8, "conftest requests 8 virtual CPU devices"
    return Mesh(np.array(devices[:n]), axis_names=(axis,))


# XLA shards axes evenly: the canonical F = 2049 = 3·683 shards over a
# 3-device mesh axis, T = 469 = 7·67 over a 7-device one (both carved from
# the 8 virtual devices).  An 8-way run at a divisible size is tested below.
@pytest.mark.parametrize("mode,n_dev", [("bins", 3), ("frames", 7)])
def test_auxiva_ip_sharded_matches_single(rng, mode, n_dev):
    X = _canonical_mixture(rng)

    single = AuxLaplaceIVA(algorithm_spatial="IP")
    out_single = single(X, iteration=10)

    sharded = AuxLaplaceIVA(algorithm_spatial="IP")
    sharded.use_mesh(_mesh_1d(n_dev), mode=mode)
    out_sharded = sharded(X, iteration=10)

    np.testing.assert_allclose(
        np.asarray(sharded.loss), np.asarray(single.loss), rtol=1e-9
    )
    np.testing.assert_allclose(out_sharded, out_single, atol=1e-8)


def test_auxiva_ip_8way_bins_divisible(rng):
    X = _canonical_mixture(rng, n_bins=2048)
    single = AuxLaplaceIVA(algorithm_spatial="IP")
    out_single = single(X, iteration=8)
    sharded = AuxLaplaceIVA(algorithm_spatial="IP")
    sharded.use_mesh(_mesh_1d(8), mode="bins")
    out_sharded = sharded(X, iteration=8)
    np.testing.assert_allclose(
        np.asarray(sharded.loss), np.asarray(single.loss), rtol=1e-9
    )
    np.testing.assert_allclose(out_sharded, out_single, atol=1e-8)


def test_use_mesh_indivisible_raises(rng):
    X = _canonical_mixture(rng, n_bins=33, n_frames=16)
    solver = AuxLaplaceIVA(algorithm_spatial="IP")
    solver.use_mesh(_mesh_1d(8), mode="bins")
    with pytest.raises(ValueError, match="not divisible"):
        solver(X, iteration=1)


def test_gauss_ilrma_sharded_matches_single(rng):
    X = _canonical_mixture(rng)

    np.random.seed(111)
    single = GaussILRMA(n_basis=4)
    out_single = single(X, iteration=8)

    np.random.seed(111)
    sharded = GaussILRMA(n_basis=4)
    sharded.use_mesh(_mesh_1d(3), mode="bins")
    out_sharded = sharded(X, iteration=8)

    np.testing.assert_allclose(
        np.asarray(sharded.loss), np.asarray(single.loss), rtol=1e-9
    )
    np.testing.assert_allclose(out_sharded, out_single, atol=1e-8)


def test_fastmnmf_sharded_matches_single(rng):
    X = _canonical_mixture(rng)

    np.random.seed(111)
    single = FastMultichannelISNMF(n_basis=4)
    out_single = single(X, iteration=6)

    np.random.seed(111)
    sharded = FastMultichannelISNMF(n_basis=4)
    sharded.use_mesh(_mesh_1d(3), mode="bins")
    out_sharded = sharded(X, iteration=6)

    np.testing.assert_allclose(
        np.asarray(sharded.loss), np.asarray(single.loss), rtol=1e-9
    )
    np.testing.assert_allclose(out_sharded, out_single, atol=1e-8)


def test_batch_separate_output_stays_distributed(rng):
    """batch_separate with a (dp, tp) mesh pins explicit out_shardings — the
    separated batch comes back dp/tp-distributed, not gathered."""
    from audio_source_separation_tpu.parallel import batch_separate

    devices = jax.devices()
    mesh = Mesh(np.array(devices[:8]).reshape(4, 2), axis_names=("dp", "tp"))

    X = np.stack(
        [_canonical_mixture(rng, n_bins=64, n_frames=32) for _ in range(4)]
    )
    solver = AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=False)
    outputs_p, _ = batch_separate(solver, X, iteration=3, mesh=mesh, host=False)

    expected = NamedSharding(mesh, P("dp", None, "tp", None))
    assert outputs_p.re.sharding.is_equivalent_to(expected, 4)
    assert outputs_p.im.sharding.is_equivalent_to(expected, 4)

    # and it matches the unsharded batched run
    from audio_source_separation_tpu.ops.packing import to_host

    solver2 = AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=False)
    outputs_ref, _ = batch_separate(solver2, X, iteration=3)
    np.testing.assert_allclose(to_host(outputs_p), outputs_ref, atol=1e-10)


# --------------------------------------------------------------------------- #
# zero-bin padding for indivisible F (use_mesh pad_bins=True)
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("spatial", ["IP", "IP2"])
def test_auxiva_pad_bins_matches_single(rng, spatial):
    """F = 33 on the 8-way mesh pads to 40; padded bins are exactly neutral
    for the AuxIVA IP/IP2 paths (output AND loss)."""
    X = _canonical_mixture(rng, n_bins=33, n_frames=24)

    single = AuxLaplaceIVA(algorithm_spatial=spatial)
    out_single = single(X, iteration=6)

    padded = AuxLaplaceIVA(algorithm_spatial=spatial)
    padded.use_mesh(_mesh_1d(8), mode="bins", pad_bins=True)
    out_padded = padded(X, iteration=6)

    assert out_padded.shape == out_single.shape
    np.testing.assert_allclose(
        np.asarray(padded.loss), np.asarray(single.loss), rtol=1e-9
    )
    np.testing.assert_allclose(out_padded, out_single, atol=1e-10)


def test_auxiva_pad_bins_warm_start(rng):
    """Warm-started demixing filters get identity rows on padded bins."""
    X = _canonical_mixture(rng, n_bins=33, n_frames=24)
    W0 = np.stack(
        [np.eye(2) + 0.1j * rng.randn(2, 2) for _ in range(33)]
    ).astype(np.complex128)

    single = AuxLaplaceIVA(algorithm_spatial="IP")
    out_single = single(X, iteration=4, demix_filter=W0)

    padded = AuxLaplaceIVA(algorithm_spatial="IP")
    padded.use_mesh(_mesh_1d(8), mode="bins", pad_bins=True)
    out_padded = padded(X, iteration=4, demix_filter=W0)

    np.testing.assert_allclose(
        np.asarray(padded.loss), np.asarray(single.loss), rtol=1e-9
    )
    np.testing.assert_allclose(out_padded, out_single, atol=1e-10)


def test_gauss_ilrma_pad_bins_matches_single(rng):
    """ILRMA (power normalization) under padding: identical outputs; the loss
    differs only by the iteration-independent log(eps) constant of the
    padded bins."""
    X = _canonical_mixture(rng, n_bins=33, n_frames=24)

    np.random.seed(111)
    single = GaussILRMA(n_basis=3)
    out_single = single(X, iteration=6)

    np.random.seed(111)
    padded = GaussILRMA(n_basis=3)
    padded.use_mesh(_mesh_1d(8), mode="bins", pad_bins=True)
    out_padded = padded(X, iteration=6)

    np.testing.assert_allclose(out_padded, out_single, atol=1e-8)
    offsets = np.asarray(padded.loss) - np.asarray(single.loss)
    np.testing.assert_allclose(offsets, offsets[0], rtol=1e-9)


def test_pad_bins_attributes_match_input_geometry(rng):
    """After a padded run the PUBLIC attributes (demix_filter, estimation)
    are cropped back to the true bin count — they must agree with the input
    geometry, not the padded device shapes."""
    X = _canonical_mixture(rng, n_bins=33, n_frames=24)
    solver = AuxLaplaceIVA(algorithm_spatial="IP")
    solver.use_mesh(_mesh_1d(8), mode="bins", pad_bins=True)
    out = solver(X, iteration=3)
    assert out.shape == (2, 33, 24)
    assert solver.demix_filter.shape == (33, 2, 2)
    assert solver.estimation.shape == (2, 33, 24)
    assert solver.input.shape == (2, 33, 24)


def test_pad_bins_unsupported_raises(rng):
    """ISS has no covariance guard — padding is not neutral and must raise."""
    X = _canonical_mixture(rng, n_bins=33, n_frames=16)
    solver = AuxLaplaceIVA(algorithm_spatial="ISS")
    solver.use_mesh(_mesh_1d(8), mode="bins", pad_bins=True)
    with pytest.raises(ValueError, match="does not support"):
        solver(X, iteration=1)


# --------------------------------------------------------------------------- #
# collective-pattern assertions (compiled HLO inspection)
# --------------------------------------------------------------------------- #
def _compiled_step_hlo(solver, X):
    """Compile the solver's sharded update step exactly as the runtime does
    and return the optimized HLO text."""
    from audio_source_separation_tpu.ops.packing import pack

    solver.set_shape_metadata(X)
    kwargs = solver.prepare_state_kwargs(X, {})
    Xp = pack(np.asarray(X))
    kwargs_p = pack({k: np.asarray(v) for k, v in kwargs.items()})
    state_shapes = jax.eval_shape(solver._init_fn(), Xp, kwargs_p)
    state_sh = solver._sharding_tree(state_shapes)
    init = jax.jit(solver._init_fn(), out_shardings=state_sh)
    state = init(Xp, kwargs_p)
    step = jax.jit(
        solver._step_fn(), in_shardings=(state_sh,), out_shardings=state_sh
    )
    return step.lower(state).compile().as_text()


def test_bins_sharded_auxiva_collective_pattern(rng):
    """Bins-sharded AuxIVA: the ONLY cross-device traffic in an iteration is
    the all-reduce for the cross-bin frame weights ``R = √(Σ_f |Y_f|²)`` —
    per-bin covariance/IP/separation must stay collective-free, and nothing
    may gather the sharded state."""
    X = _canonical_mixture(rng, n_bins=64, n_frames=32)
    solver = AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=False)
    solver.use_mesh(_mesh_1d(8), mode="bins")
    hlo = _compiled_step_hlo(solver, X)
    # NOTE: exact collective counts are XLA-version-sensitive (fusion may
    # split/merge all-reduces); the load-bearing assertions are that at least
    # one reduction exists and that NOTHING gathers or reshards the
    # bin-sharded state (those would break the TP scaling story).
    assert hlo.count(" all-reduce") >= 1, "expected the R-reduction all-reduce"
    assert " all-gather" not in hlo, "sharded state was gathered"
    assert " all-to-all" not in hlo, "unexpected resharding"


def test_frames_sharded_auxiva_collective_pattern(rng):
    """Frames-sharded AuxIVA (the sequence-parallel analogue): covariance
    accumulations over frames become all-reduces; the frame-sharded
    estimates must never be gathered."""
    X = _canonical_mixture(rng, n_bins=32, n_frames=64)
    solver = AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=False)
    solver.use_mesh(_mesh_1d(8), mode="frames")
    hlo = _compiled_step_hlo(solver, X)
    assert hlo.count(" all-reduce") >= 1, "expected covariance psum"
    assert " all-gather" not in hlo, "frame-sharded state was gathered"
