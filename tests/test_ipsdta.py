"""IPSDTA tests: block layout correctness, loss decrease for both author
modes (Kondo MM+VCD, Ikeshita EM+fixed-point), padded-block invariants, and
separation quality."""

import numpy as np
import pytest

from audio_source_separation_tpu.models import GaussIPSDTA, TIPSDTA
from audio_source_separation_tpu.ops.blocks import BlockLayout
from audio_source_separation_tpu.transform import stft, istft

from conftest import synth_convolutive_mixture


# --------------------------------------------------------------------------- #
# BlockLayout
# --------------------------------------------------------------------------- #
def test_block_layout_uniform():
    layout = BlockLayout(n_bins=12, n_blocks=4)
    assert layout.n_neighbors == 3 and layout.n_remains == 0
    assert layout.block_size == 3
    x = np.arange(12.0)
    blocked = np.asarray(layout.gather(x))
    assert blocked.shape == (4, 3)
    np.testing.assert_allclose(blocked.reshape(-1), x)
    np.testing.assert_allclose(np.asarray(layout.scatter(blocked)), x)


def test_block_layout_with_remains():
    # 13 bins, 4 blocks: sizes 3,3,3,4 (reference: trailing blocks larger)
    layout = BlockLayout(n_bins=13, n_blocks=4)
    assert layout.n_neighbors == 3 and layout.n_remains == 1
    assert layout.block_size == 4
    assert list(layout.sizes) == [3, 3, 3, 4]
    x = np.arange(13.0) + 1
    blocked = np.asarray(layout.gather(x))
    assert blocked.shape == (4, 4)
    # padded slots are zero
    assert blocked[0, 3] == 0 and blocked[2, 3] == 0
    np.testing.assert_allclose(np.asarray(layout.scatter(blocked)), x)


def test_block_layout_pad_identity():
    import jax.numpy as jnp

    layout = BlockLayout(n_bins=7, n_blocks=3)  # sizes 2,2,3, B=3
    M = jnp.zeros((3, 3, 3))
    P = np.asarray(layout.pad_identity(M))
    # block 0 and 1 have padded slot at j=2
    assert P[0, 2, 2] == 1.0 and P[1, 2, 2] == 1.0 and P[2, 2, 2] == 0.0
    assert np.linalg.matrix_rank(P[0] + np.diag([1, 1, 0])) == 3


# --------------------------------------------------------------------------- #
# solvers
# --------------------------------------------------------------------------- #
def _mixture_spectrogram(rng, n_samples=8000, fft_size=64, hop_size=32):
    mixture, images = synth_convolutive_mixture(rng, n_sources=2, n_samples=n_samples)
    X = np.asarray(stft(mixture, fft_size=fft_size, hop_size=hop_size))
    return mixture, images, X


@pytest.mark.parametrize("n_blocks", [8, 11])  # 11 → non-uniform blocks (33 bins)
def test_gauss_ipsdta_kondo_loss_decreases(rng, n_blocks):
    mixture, images, X = _mixture_spectrogram(rng)
    np.random.seed(111)
    solver = GaussIPSDTA(
        n_basis=2, author="Kondo", n_blocks=n_blocks, spatial_iteration=2
    )
    Y = solver(X, iteration=8)
    losses = np.asarray(solver.loss)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert Y.shape == (2,) + X.shape[1:]


def test_gauss_ipsdta_ikeshita_loss_decreases(rng):
    mixture, images, X = _mixture_spectrogram(rng)
    np.random.seed(111)
    solver = GaussIPSDTA(n_basis=2, author="Ikeshita", n_blocks=8)
    Y = solver(X, iteration=8)
    losses = np.asarray(solver.loss)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def _si_sdr(e, t):
    a = np.sum(e * t) / np.sum(t**2)
    p = a * t
    return 10 * np.log10(np.sum(p**2) / np.sum((e - p) ** 2))


def _pair(est, images):
    a = np.mean([_si_sdr(est[0], images[0]), _si_sdr(est[1], images[1])])
    b = np.mean([_si_sdr(est[0], images[1]), _si_sdr(est[1], images[0])])
    return max(a, b)


def test_gauss_ipsdta_separates(rng):
    mixture, images, X = _mixture_spectrogram(rng, n_samples=8000, fft_size=128, hop_size=64)
    np.random.seed(111)
    solver = GaussIPSDTA(
        n_basis=2, author="Kondo", n_blocks=13, spatial_iteration=3,
        recordable_loss=False,
    )
    Y = solver(X, iteration=15)
    y = np.asarray(istft(Y, fft_size=128, hop_size=64, length=mixture.shape[-1]))
    assert _pair(y, images) > _pair(mixture, images) + 2.0


def test_ipsdta_basis_stays_psd_and_padded(rng):
    mixture, images, X = _mixture_spectrogram(rng)
    np.random.seed(111)
    solver = GaussIPSDTA(n_basis=2, author="Kondo", n_blocks=11, spatial_iteration=1)
    solver(X, iteration=3)
    U = np.asarray(solver.basis)  # (S, nb, B, B, K)
    layout = solver._layout(X.shape[1])
    valid = np.asarray(layout.valid)
    Uk = U.transpose(0, 4, 1, 2, 3)
    # padded rows/cols are zero
    for b in range(layout.n_blocks):
        for j in range(layout.block_size):
            if not valid[b, j]:
                assert np.abs(Uk[:, :, b, j, :]).max() == 0
                assert np.abs(Uk[:, :, b, :, j]).max() == 0
    # valid sub-blocks are PSD
    eig = np.linalg.eigvalsh(Uk + 1e-10 * np.eye(layout.block_size))
    assert (eig > -1e-6).all()


def test_tipsdta_loss_decreases(rng):
    mixture, images, X = _mixture_spectrogram(rng)
    np.random.seed(111)
    solver = TIPSDTA(n_basis=2, nu=100.0, n_blocks=8, spatial_iteration=2)
    Y = solver(X, iteration=6)
    losses = np.asarray(solver.loss)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_ipsdta_invalid_author():
    with pytest.raises(ValueError):
        GaussIPSDTA(author="unknown")
    with pytest.raises(ValueError):
        GaussIPSDTA(author="Kondo", bogus=3)
    with pytest.raises(ValueError):
        TIPSDTA(author="Ikeshita")


# --------------------------------------------------------------------------- #
# planes-layout VCD vs matrix-layout VCD (same math, different data layout)
# --------------------------------------------------------------------------- #
def _vcd_state(rng, cls, n_bins=10, n_blocks=4, **kw):
    """B = 3 with remainder blocks (10 bins / 4 blocks → sizes 2,2,3,3) — the
    same non-uniform geometry as the canonical 2049/1024 config."""
    S, T, K = 2, 6, 2
    X = (rng.randn(S, n_bins, T) + 1j * rng.randn(S, n_bins, T)).astype(
        np.complex128
    )
    np.random.seed(111)
    solver = cls(n_basis=K, n_blocks=n_blocks, recordable_loss=False, **kw)
    solver.set_shape_metadata(X)
    kwargs = solver.prepare_state_kwargs(X, {})
    import jax.numpy as jnp

    state = solver.init_state(
        jnp.asarray(X), **{k: jnp.asarray(v) for k, v in kwargs.items()}
    )
    return solver, state


@pytest.mark.parametrize("sweeps", [1, 3])
def test_vcd_planes_matches_matrix_gauss(rng, sweeps):
    solver, state = _vcd_state(rng, GaussIPSDTA, n_bins=10, n_blocks=4)
    layout = solver._layout(10)
    assert layout.block_size == 3 and layout.n_remains > 0
    out_p = solver._update_spatial_vcd_planes(state, layout, n_spatial=sweeps)
    out_m = solver._update_spatial_vcd_matrix(state, layout, n_spatial=sweeps)
    np.testing.assert_allclose(
        np.asarray(out_p["demix_filter"]),
        np.asarray(out_m["demix_filter"]),
        atol=1e-10,
        rtol=1e-8,
    )


def test_vcd_planes_matches_matrix_t(rng):
    solver, state = _vcd_state(rng, TIPSDTA, n_bins=10, n_blocks=4, nu=3.0)
    layout = solver._layout(10)
    out_p = solver._update_spatial_vcd_planes(state, layout, n_spatial=2)
    out_m = solver._update_spatial_vcd_matrix(state, layout, n_spatial=2)
    np.testing.assert_allclose(
        np.asarray(out_p["demix_filter"]),
        np.asarray(out_m["demix_filter"]),
        atol=1e-10,
        rtol=1e-8,
    )


# --------------------------------------------------------------------------- #
# planes-layout source steps vs matrix-layout (round 4; same closed forms)
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize(
    "cls,kw",
    [
        (GaussIPSDTA, {"author": "Kondo"}),
        (GaussIPSDTA, {"author": "Ikeshita"}),
        (TIPSDTA, {"nu": 1.0}),
    ],
    ids=["kondo-mm", "ikeshita-em", "t-mm-nu1"],
)
def test_source_planes_matches_matrix(rng, cls, kw):
    solver, state = _vcd_state(rng, cls, n_bins=10, n_blocks=4, **kw)
    layout = solver._layout(10)
    assert layout.block_size == 3 and layout.n_remains > 0
    if solver.algorithm_source == "em":
        out_m = solver._update_source_em(state, layout)
        out_p = solver._update_source_em_planes(state, layout)
    else:
        out_m = solver._update_source_mm(state, layout)
        out_p = solver._update_source_mm_planes(state, layout)
    for key in ("basis", "activation"):
        np.testing.assert_allclose(
            np.asarray(out_p[key]),
            np.asarray(out_m[key]),
            atol=1e-10,
            rtol=1e-8,
        )


def test_fixed_point_planes_matches_matrix(rng):
    """The fixed-point spatial statistics G (the only frame-dimension work
    in that update) match between the planes and matrix builders."""
    solver, state = _vcd_state(
        rng, GaussIPSDTA, n_bins=10, n_blocks=4, author="Ikeshita"
    )
    layout = solver._layout(10)
    solver.source_planes = False
    out_m = solver._update_spatial_fixed_point(state, layout)
    solver.source_planes = True
    out_p = solver._update_spatial_fixed_point(state, layout)
    for key in ("demix_filter", "fixed_point", "estimation"):
        np.testing.assert_allclose(
            np.asarray(out_p[key]),
            np.asarray(out_m[key]),
            atol=1e-10,
            rtol=1e-8,
        )


def test_source_planes_full_solver_parity(rng):
    """The source_planes toggle is output-invariant through the full jitted
    solver (3 iterations, remainder-block geometry)."""
    X = (rng.randn(2, 10, 6) + 1j * rng.randn(2, 10, 6)).astype(np.complex128)
    outs = []
    for flag in (False, True):
        solver = GaussIPSDTA(
            n_basis=2, n_blocks=4, recordable_loss=False, author="Kondo"
        )
        solver.source_planes = flag
        np.random.seed(111)
        outs.append(np.asarray(solver(X, iteration=3)))
    np.testing.assert_allclose(outs[1], outs[0], atol=1e-10, rtol=1e-8)


# --------------------------------------------------------------------------- #
# compact-Hermitian planes source steps vs complex planes (round 5; same
# closed forms restated on B² real planes — ulp-level FP reassociation only)
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize(
    "cls,kw",
    [
        (GaussIPSDTA, {"author": "Kondo"}),
        (GaussIPSDTA, {"author": "Ikeshita"}),
        (TIPSDTA, {"nu": 1.0}),
    ],
    ids=["kondo-mm", "ikeshita-em", "t-mm-nu1"],
)
def test_source_compact_matches_planes(rng, cls, kw):
    solver, state = _vcd_state(rng, cls, n_bins=10, n_blocks=4, **kw)
    layout = solver._layout(10)
    assert layout.block_size == 3 and layout.n_remains > 0  # pad slots live
    if solver.algorithm_source == "em":
        out_p = solver._update_source_em_planes(state, layout)
        out_c = solver._update_source_em_compact(state, layout)
    else:
        out_p = solver._update_source_mm_planes(state, layout)
        out_c = solver._update_source_mm_compact(state, layout)
    for key in ("basis", "activation"):
        np.testing.assert_allclose(
            np.asarray(out_c[key]),
            np.asarray(out_p[key]),
            atol=1e-10,
            rtol=1e-8,
        )


@pytest.mark.parametrize(
    "cls,kw",
    [
        (GaussIPSDTA, {"author": "Kondo"}),
        (TIPSDTA, {"nu": 3.0}),
    ],
    ids=["kondo-vcd", "t-vcd"],
)
def test_spatial_vcd_compact_matches_planes(rng, cls, kw):
    """The VCD sweeps read the source R⁻¹ invariants through the compact
    accessor — identical demixers either way."""
    solver, state = _vcd_state(rng, cls, n_bins=10, n_blocks=4, **kw)
    layout = solver._layout(10)
    solver.source_compact = False
    out_p = solver._update_spatial_vcd_planes(state, layout, n_spatial=2)
    solver.source_compact = True
    out_c = solver._update_spatial_vcd_planes(state, layout, n_spatial=2)
    np.testing.assert_allclose(
        np.asarray(out_c["demix_filter"]),
        np.asarray(out_p["demix_filter"]),
        atol=1e-10,
        rtol=1e-8,
    )


@pytest.mark.parametrize(
    "cls,kw",
    [
        (GaussIPSDTA, {"author": "Kondo"}),
        (TIPSDTA, {"nu": 3.0}),
    ],
    ids=["gauss", "t"],
)
def test_nll_compact_matches_matrix(rng, cls, kw):
    """The compact-planes NLL equals the matrix-layout NLL (same eigvalsh
    floors, same ridge chain)."""
    solver, state = _vcd_state(rng, cls, n_bins=10, n_blocks=4, **kw)
    solver.source_compact = False
    nll_m = float(solver.nll(state))
    solver.source_compact = True
    nll_c = float(solver.nll(state))
    np.testing.assert_allclose(nll_c, nll_m, rtol=1e-10)


def test_fixed_point_compact_matches_planes(rng):
    """Ikeshita fixed-point spatial statistics G through the compact
    R̄⁻¹ = conj(R⁻¹) planes."""
    solver, state = _vcd_state(
        rng, GaussIPSDTA, n_bins=10, n_blocks=4, author="Ikeshita"
    )
    layout = solver._layout(10)
    solver.source_compact = False
    out_p = solver._update_spatial_fixed_point(state, layout)
    solver.source_compact = True
    out_c = solver._update_spatial_fixed_point(state, layout)
    for key in ("demix_filter", "fixed_point", "estimation"):
        np.testing.assert_allclose(
            np.asarray(out_c[key]),
            np.asarray(out_p[key]),
            atol=1e-10,
            rtol=1e-8,
        )


@pytest.mark.parametrize(
    "cls,kw",
    [
        (GaussIPSDTA, {"author": "Kondo"}),
        (GaussIPSDTA, {"author": "Ikeshita"}),
        (TIPSDTA, {"nu": 1.0}),
    ],
    ids=["kondo-mm", "ikeshita-em", "t-mm-nu1"],
)
def test_source_compact_full_solver_parity(rng, cls, kw):
    """The source_compact toggle is output-invariant through the full jitted
    solver (3 iterations, remainder-block geometry)."""
    X = (rng.randn(2, 10, 6) + 1j * rng.randn(2, 10, 6)).astype(np.complex128)
    outs = []
    for flag in (False, True):
        solver = cls(n_basis=2, n_blocks=4, recordable_loss=False, **kw)
        solver.source_compact = flag
        np.random.seed(111)
        outs.append(np.asarray(solver(X, iteration=3)))
    np.testing.assert_allclose(outs[1], outs[0], atol=1e-9, rtol=1e-7)


# --------------------------------------------------------------------------- #
# K = 2 pencil source streams vs planes layout (round 5; documented-divergence
# guards: frame-relative pencil eigenvalue floor stands in for to_psd+adjugate)
# --------------------------------------------------------------------------- #
def test_source_pencil_matches_planes_step(rng):
    """One Kondo MM source step: the pencil path (one B×B generalized eigh
    per block instead of per-frame B² inverse streams) tracks the planes
    path at float64 on the remainder-block geometry (pad slots exercise the
    κ-decoupled eigendirections)."""
    solver, state = _vcd_state(rng, GaussIPSDTA, n_bins=10, n_blocks=4)
    layout = solver._layout(10)
    assert layout.n_remains > 0  # pad slots present
    out_p = solver._update_source_mm_planes(state, layout)
    out_q = solver._update_source_mm_pencil(state, layout)
    for key in ("basis", "activation"):
        np.testing.assert_allclose(
            np.asarray(out_q[key]),
            np.asarray(out_p[key]),
            atol=1e-10,
            rtol=1e-8,
        )


def test_source_pencil_full_solver_trajectory(rng):
    """The source_pencil toggle tracks the planes trajectory (outputs and
    loss) through the full jitted solver for 5 iterations."""
    X = (rng.randn(2, 10, 6) + 1j * rng.randn(2, 10, 6)).astype(np.complex128)
    outs, losses = [], []
    for flag in (False, True):
        solver = GaussIPSDTA(
            n_basis=2, n_blocks=4, recordable_loss=True, author="Kondo"
        )
        solver.source_pencil = flag
        np.random.seed(111)
        outs.append(np.asarray(solver(X, iteration=5)))
        losses.append(np.asarray(solver.loss))
    np.testing.assert_allclose(outs[1], outs[0], atol=1e-8, rtol=1e-6)
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-8)


def test_source_pencil_matches_planes_step_t(rng):
    """tIPSDTA: the π-weighted pencil source step tracks the planes step at
    float64 (π read off the diagonal pencil planes)."""
    solver, state = _vcd_state(rng, TIPSDTA, n_bins=10, n_blocks=4, nu=3.0)
    layout = solver._layout(10)
    out_p = solver._update_source_mm_planes(state, layout)
    out_q = solver._update_source_mm_pencil(state, layout)
    for key in ("basis", "activation"):
        np.testing.assert_allclose(
            np.asarray(out_q[key]),
            np.asarray(out_p[key]),
            atol=1e-10,
            rtol=1e-8,
        )


def test_source_pencil_full_solver_trajectory_t(rng):
    """tIPSDTA source_pencil toggle tracks the planes trajectory + loss."""
    X = (rng.randn(2, 10, 6) + 1j * rng.randn(2, 10, 6)).astype(np.complex128)
    outs, losses = [], []
    for flag in (False, True):
        solver = TIPSDTA(n_basis=2, n_blocks=4, recordable_loss=True, nu=3.0)
        solver.source_pencil = flag
        np.random.seed(111)
        outs.append(np.asarray(solver(X, iteration=5)))
        losses.append(np.asarray(solver.loss))
    # guard divergence (documented) compounds through the π-weighted VCD
    # sweeps: step parity is ~1e-11, trajectory drifts to ~1e-5 by iter 5
    np.testing.assert_allclose(outs[1], outs[0], atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(losses[1], losses[0], rtol=3e-5)
