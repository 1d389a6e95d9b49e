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
    GaussIDLMA,
    GaussILRMA,
    GaussIPSDTA,
    ISNMF,
    MultichannelISNMF,
    ProxLaplaceIVA,
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
# full-family sharded-vs-single equivalence (VERDICT r2 item 1: back the
# "every scan-mode solver runs under a mesh" claim row by row)
# --------------------------------------------------------------------------- #
def _run_pair(make, X, mode, n_dev, iteration, **callkw):
    """Run the same seeded solver single-device and sharded; return both."""
    np.random.seed(111)
    single = make()
    out_single = single(X, iteration=iteration, **callkw)
    np.random.seed(111)
    sharded = make()
    sharded.use_mesh(_mesh_1d(n_dev), mode=mode)
    out_sharded = sharded(X, iteration=iteration, **callkw)
    return single, out_single, sharded, out_sharded


def _assert_equivalent(single, out_single, sharded, out_sharded,
                       loss_rtol=1e-9, out_atol=1e-8):
    if single.loss is not None:
        np.testing.assert_allclose(
            np.asarray(sharded.loss), np.asarray(single.loss), rtol=loss_rtol
        )
    np.testing.assert_allclose(out_sharded, out_single, atol=out_atol)


@pytest.mark.parametrize("mode,n_dev", [("bins", 3), ("frames", 7)])
def test_sawada_mnmf_sharded_matches_single(rng, mode, n_dev):
    X = _canonical_mixture(rng)
    pair = _run_pair(
        lambda: MultichannelISNMF(n_basis=2), X, mode, n_dev, iteration=3
    )
    _assert_equivalent(*pair, out_atol=1e-7)


def test_ozerov_mnmf_sharded_matches_single(rng):
    X = _canonical_mixture(rng)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)  # "in progress"
        pair = _run_pair(
            lambda: MultichannelISNMF(n_basis=2, author="Ozerov"),
            X, "bins", 3, iteration=3,
        )
    _assert_equivalent(*pair, out_atol=1e-7)


@pytest.mark.parametrize("make,label", [
    (lambda: GaussILRMA(n_basis=4), "ilrma"),
    (lambda: FastMultichannelISNMF(n_basis=4), "fastmnmf"),
])
def test_frames_sharded_matches_single(rng, make, label):
    """The sequence-parallel analogue for the ILRMA/FastMNMF families: frame
    shards, covariance accumulations as psums (canonical T = 469 = 7·67)."""
    X = _canonical_mixture(rng)
    pair = _run_pair(make, X, "frames", 7, iteration=5)
    _assert_equivalent(*pair)


# IPSDTA runs at a reduced (but uniform-block) scale: canonical-scale IPSDTA
# is minutes/iteration on the CPU test backend, and the sharding semantics
# are shape-independent.  The bins mode shards at BLOCK granularity (blocks
# couple bins — ``/root/reference/src/bss/ipsdta.py:269-273``).
@pytest.mark.parametrize("author,mode", [
    ("Kondo", "bins"),
    ("Kondo", "frames"),
    ("Ikeshita", "bins"),
])
def test_ipsdta_sharded_matches_single(rng, author, mode):
    X = _canonical_mixture(rng, n_bins=256, n_frames=64)
    pair = _run_pair(
        lambda: GaussIPSDTA(
            n_basis=2, author=author, n_blocks=128, spatial_iteration=2
        ),
        X, mode, 4, iteration=2,
    )
    _assert_equivalent(*pair)


@pytest.mark.parametrize("author,mode", [("Kondo", "bins"), ("Ikeshita", "frames")])
def test_ipsdta_source_planes_sharded_matches_single(rng, author, mode):
    """The planes-layout source steps (round 4, ``source_planes``) preserve
    mesh equivalence: every planes contraction stays shard-local in bins
    mode and psums in frames mode exactly like the matrix path."""
    X = _canonical_mixture(rng, n_bins=256, n_frames=64)

    def make():
        solver = GaussIPSDTA(
            n_basis=2, author=author, n_blocks=128, spatial_iteration=2
        )
        solver.source_planes = True
        return solver

    pair = _run_pair(make, X, mode, 4, iteration=2)
    _assert_equivalent(*pair)


@pytest.mark.parametrize("author,mode", [("Kondo", "bins"), ("Ikeshita", "frames")])
def test_ipsdta_source_compact_sharded_matches_single(rng, author, mode):
    """The compact-Hermitian source chains (round 5, ``source_compact``)
    preserve mesh equivalence: the B² real planes carry the (blocks) axis in
    the tile exactly like the complex planes, so bins mode stays shard-local
    and frames mode psums identically."""
    X = _canonical_mixture(rng, n_bins=256, n_frames=64)

    def make():
        solver = GaussIPSDTA(
            n_basis=2, author=author, n_blocks=128, spatial_iteration=2
        )
        solver.source_compact = True
        return solver

    pair = _run_pair(make, X, mode, 4, iteration=2)
    _assert_equivalent(*pair)


def test_ipsdta_bins_misaligned_blocks_raise(rng):
    """Non-uniform block partitions cannot align with bin shards — the
    mesh-compatibility hook must reject them with a clear message."""
    X = _canonical_mixture(rng, n_bins=258, n_frames=16)  # 258 % 128 != 0
    solver = GaussIPSDTA(n_basis=2, n_blocks=128, spatial_iteration=1)
    solver.use_mesh(_mesh_1d(2), mode="bins")
    with pytest.raises(ValueError, match="whole blocks"):
        solver(X, iteration=1)


@pytest.mark.parametrize("mode,n_dev", [("bins", 4), ("frames", 4)])
def test_covariance_isnmf_sharded_matches_single(rng, mode, n_dev):
    """The covariance-domain factorizer (4-D target (F, T, C, C)) under the
    mesh: bins-mode shards the bin axis (activation contraction all-reduces),
    frames-mode shards frames (basis/spatial psums + the init-time bin-scale
    mean)."""
    from audio_source_separation_tpu.models import CovarianceISNMF

    F, T, C = 24, 16, 2
    X = _canonical_mixture(rng, n_channels=C, n_bins=F, n_frames=T)
    target = np.einsum("cft,dft->ftcd", X, X.conj())

    np.random.seed(111)
    single = CovarianceISNMF(n_basis=3)
    out_single = single(target, iteration=5)

    np.random.seed(111)
    sharded = CovarianceISNMF(n_basis=3)
    sharded.use_mesh(_mesh_1d(n_dev), mode=mode)
    out_sharded = sharded(target, iteration=5)

    # frames mode reassociates the init-time bin-scale frame mean across
    # shards: the equilibration scale differs at fp-rounding level, which
    # the loss's logdet(X) term amplifies to a constant ~1e-7-relative
    # offset (iterates track to the same tolerance)
    np.testing.assert_allclose(
        np.asarray(sharded.loss), np.asarray(single.loss), rtol=1e-6
    )
    for a, b in zip(out_sharded, out_single):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7, rtol=1e-6
        )


def _freq_mixing_mlp(rng, n_bins):
    """Tiny jittable frequency-mixing MLP variance model (stands in for the
    reference's trained DNN, ``sss/idlma.py:212-225``)."""
    import jax.numpy as jnp

    W1 = jnp.asarray(rng.randn(n_bins, 32) * 0.1)
    W2 = jnp.asarray(rng.randn(32, n_bins) * 0.1)

    def dnn(amp):  # (S, F, T)
        h = jnp.maximum(jnp.einsum("sft,fh->sht", amp, W1), 0.0)
        return jnp.maximum(jnp.einsum("sht,hf->sft", h, W2), 1e-3)

    return dnn


@pytest.mark.parametrize("mode,n_dev", [("bins", 3), ("frames", 7)])
def test_idlma_jax_dnn_sharded_matches_single(rng, mode, n_dev):
    X = _canonical_mixture(rng, n_bins=2049, n_frames=469)
    dnn = _freq_mixing_mlp(rng, 2049)
    pair = _run_pair(
        lambda: GaussIDLMA(jax_dnn=True), X, mode, n_dev, iteration=3, dnn=dnn
    )
    _assert_equivalent(*pair)


def test_idlma_host_dnn_mesh_raises(rng):
    X = _canonical_mixture(rng, n_bins=33, n_frames=16)
    solver = GaussIDLMA(jax_dnn=False)
    solver.use_mesh(_mesh_1d(3), mode="bins")
    with pytest.raises(ValueError, match="jax_dnn"):
        solver(X, iteration=1, dnn=lambda a: np.maximum(a, 1e-3))


@pytest.mark.parametrize("mode,n_dev", [("bins", 3), ("frames", 7)])
def test_prox_sharded_matches_single(rng, mode, n_dev):
    X = _canonical_mixture(rng)
    pair = _run_pair(
        lambda: ProxLaplaceIVA(step=0.5), X, mode, n_dev, iteration=5
    )
    _assert_equivalent(*pair)


@pytest.mark.parametrize("mode,n_dev", [("bins", 3), ("frames", 7)])
def test_isnmf_2d_sharded_matches_single(rng, mode, n_dev):
    """Single-channel NMF shards its 2-D (n_bins, n_frames) target: the MU
    cross-axis contractions become psums."""
    P = np.abs(_canonical_mixture(rng)[0]) ** 2
    pair = _run_pair(lambda: ISNMF(n_basis=4), P, mode, n_dev, iteration=5)
    single, out_single, sharded, out_sharded = pair
    np.testing.assert_allclose(
        np.asarray(sharded.loss), np.asarray(single.loss), rtol=1e-9
    )
    for a, b in zip(out_sharded, out_single):
        np.testing.assert_allclose(a, b, atol=1e-8)


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


@pytest.mark.parametrize("mode,n_dev", [("bins", 3), ("frames", 7)])
def test_complex_eucnmf_sharded_matches_single(rng, mode, n_dev):
    """ComplexEUCNMF under the mesh runtime: the (K, F, T) phasor planes
    shard with the target; basis/activation GEMM reductions psum."""
    from audio_source_separation_tpu.models import ComplexEUCNMF

    X = _canonical_mixture(rng)[0]  # complex (F, T)

    np.random.seed(111)
    single = ComplexEUCNMF(n_basis=10)
    T1, V1, P1 = single(X, iteration=8)

    np.random.seed(111)
    sharded = ComplexEUCNMF(n_basis=10)
    sharded.use_mesh(_mesh_1d(n_dev), mode=mode)
    T2, V2, P2 = sharded(X, iteration=8)

    np.testing.assert_allclose(
        np.asarray(sharded.loss), np.asarray(single.loss), rtol=1e-9
    )
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T1), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(V2), np.asarray(V1), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(P2), np.asarray(P1), rtol=1e-8, atol=1e-10)


def test_ldpsdtf_sharded_matches_single(rng):
    """LDPSDTF frames-mode (sequence-parallel) equivalence at the canonical
    frame count: Σ_t sufficient statistics (P, Q) and the NLL psum across
    frame shards; the B×B pencil factorizations run replicated."""
    from audio_source_separation_tpu.models import LDPSDTF

    B, T = 16, N_FRAMES
    bases = [rng.randn(B, B) for _ in range(2)]
    gram = np.einsum(
        "kij,kt->ijt",
        np.stack([a @ a.T + 0.5 * np.eye(B) for a in bases]),
        np.abs(rng.randn(2, T)) + 0.2,
    )

    np.random.seed(111)
    single = LDPSDTF(n_basis=2)
    V1, H1 = single(gram, iteration=8)

    np.random.seed(111)
    sharded = LDPSDTF(n_basis=2)
    sharded.use_mesh(_mesh_1d(7), mode="frames")
    V2, H2 = sharded(gram, iteration=8)

    np.testing.assert_allclose(
        np.asarray(sharded.loss), np.asarray(single.loss), rtol=1e-9
    )
    np.testing.assert_allclose(np.asarray(V2), np.asarray(V1), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), rtol=1e-8, atol=1e-12)
