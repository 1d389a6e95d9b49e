"""IVA solver tests: per-step numerical parity with a direct NumPy
implementation of the update math, loss monotonicity, and end-to-end
separation quality on synthetic convolutive mixtures."""

import numpy as np
import pytest

from audio_source_separation_tpu.models import (
    AuxGaussIVA,
    AuxLaplaceIVA,
    GradLaplaceIVA,
    NaturalGradLaplaceIVA,
)
from audio_source_separation_tpu.transform import stft, istft

from conftest import make_mixture, synth_convolutive_mixture

EPS = 1e-12


# --------------------------------------------------------------------------- #
# NumPy reference update (the AuxIVA-IP math, written directly from the
# update equations: weighted covariance + row-wise solve + normalize)
# --------------------------------------------------------------------------- #
def numpy_auxiva_ip_step(X, W, contrast="laplace"):
    n_channels, n_bins, n_frames = X.shape
    Y = np.einsum("fnc,cft->nft", W, X)
    P = np.abs(Y) ** 2
    if contrast == "laplace":
        R = np.sqrt(P.sum(axis=1))  # (N, T)
    else:
        R = P.mean(axis=1)
    R = np.maximum(R, EPS)
    Xb = X.transpose(1, 2, 0)  # (F, T, C)
    XX = Xb[:, :, :, None] * Xb[:, :, None, :].conj()  # (F, T, C, C)
    for n in range(n_channels):
        U_n = (XX / R[n][None, :, None, None]).mean(axis=1)  # (F, C, C)
        WU = W @ U_n
        e_n = np.zeros(n_channels)
        e_n[n] = 1
        w = np.linalg.solve(WU, np.tile(e_n, (n_bins, 1))[..., None])[..., 0]
        wUw = np.einsum("fc,fcd,fd->f", w.conj(), U_n, w)
        W[:, n, :] = w.conj() / np.sqrt(wUw)[:, None]
    return W


def numpy_laplace_nll(X, W):
    Y = np.einsum("fnc,cft->nft", W, X)
    P = np.sum(np.abs(Y) ** 2, axis=1)
    n_frames = X.shape[-1]
    return (2 * np.sqrt(P)).sum() - 2 * n_frames * np.log(
        np.abs(np.linalg.det(W))
    ).sum()


def test_auxiva_ip_step_parity(rng):
    """One jitted IP step must match the NumPy math to fp64 tolerance."""
    X = make_mixture(rng, n_channels=3, n_bins=11, n_frames=24)
    solver = AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=False)
    state = solver.init_state(X)
    new_state = solver.update_state(state)
    W_expected = numpy_auxiva_ip_step(X, np.tile(np.eye(3, dtype=X.dtype), (11, 1, 1)))
    np.testing.assert_allclose(
        np.asarray(solver._materialized_filter(new_state)), W_expected, atol=1e-10
    )


def test_auxiva_gauss_ip_step_parity(rng):
    X = make_mixture(rng, n_channels=2, n_bins=9, n_frames=16)
    solver = AuxGaussIVA(algorithm_spatial="IP", recordable_loss=False)
    state = solver.init_state(X)
    new_state = solver.update_state(state)
    W_expected = numpy_auxiva_ip_step(
        X, np.tile(np.eye(2, dtype=X.dtype), (9, 1, 1)), contrast="gauss"
    )
    np.testing.assert_allclose(
        np.asarray(solver._materialized_filter(new_state)), W_expected, atol=1e-10
    )


def test_auxiva_nll_parity(rng):
    X = make_mixture(rng, n_channels=2, n_bins=9, n_frames=16)
    solver = AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=True)
    solver(X, iteration=3)
    # recompute final nll in numpy from the solver's final state
    W = np.asarray(solver.demix_filter)
    np.testing.assert_allclose(solver.loss[-1], numpy_laplace_nll(X, W), rtol=1e-10)


@pytest.mark.parametrize("algorithm", ["IP", "ISS", "IP2"])
def test_auxiva_laplace_loss_monotone(rng, algorithm):
    X = make_mixture(rng, n_channels=2, n_bins=33, n_frames=64)
    solver = AuxLaplaceIVA(algorithm_spatial=algorithm)
    solver(X, iteration=10)
    losses = np.asarray(solver.loss)
    assert len(losses) == 11
    assert (np.diff(losses) <= 1e-6 * np.abs(losses[:-1])).all(), losses


@pytest.mark.parametrize("algorithm", ["IP", "ISS"])
def test_auxiva_gauss_loss_monotone(rng, algorithm):
    X = make_mixture(rng, n_channels=2, n_bins=33, n_frames=64)
    solver = AuxGaussIVA(algorithm_spatial=algorithm)
    solver(X, iteration=10)
    losses = np.asarray(solver.loss)
    assert (np.diff(losses) <= 1e-6 * np.abs(losses[:-1]) + 1e-8).all(), losses


def test_grad_iva_loss_decreases(rng):
    X = make_mixture(rng, n_channels=2, n_bins=17, n_frames=64)
    solver = GradLaplaceIVA(lr=0.05)
    solver(X, iteration=30)
    losses = np.asarray(solver.loss)
    assert losses[-1] < losses[0]


def test_natural_grad_iva_loss_decreases(rng):
    X = make_mixture(rng, n_channels=2, n_bins=17, n_frames=64)
    solver = NaturalGradLaplaceIVA(lr=0.1)
    solver(X, iteration=30)
    losses = np.asarray(solver.loss)
    assert losses[-1] < losses[0]


def _si_sdr(estimate, target):
    alpha = np.sum(estimate * target) / np.sum(target**2)
    projection = alpha * target
    noise = estimate - projection
    return 10 * np.log10(np.sum(projection**2) / np.sum(noise**2))


def _best_pairing_sisdr(estimates, sources):
    """max over permutations of mean SI-SDR (2-source)."""
    a = np.mean(
        [_si_sdr(estimates[0], sources[0]), _si_sdr(estimates[1], sources[1])]
    )
    b = np.mean(
        [_si_sdr(estimates[0], sources[1]), _si_sdr(estimates[1], sources[0])]
    )
    return max(a, b)


@pytest.mark.parametrize("algorithm", ["IP", "ISS", "IP2"])
def test_auxiva_separates_convolutive_mixture(rng, algorithm):
    mixture, sources = synth_convolutive_mixture(rng, n_sources=2, n_samples=16000)
    fft_size, hop_size = 512, 256
    X = stft(mixture, fft_size=fft_size, hop_size=hop_size)
    solver = AuxLaplaceIVA(algorithm_spatial=algorithm, recordable_loss=False)
    Y = solver(X, iteration=25)
    y = np.asarray(istft(Y, fft_size=fft_size, hop_size=hop_size, length=mixture.shape[-1]))
    before = _best_pairing_sisdr(mixture, sources)
    after = _best_pairing_sisdr(y, sources)
    assert after > before + 5.0, (before, after)


def test_callbacks_and_warm_start(rng):
    X = make_mixture(rng, n_channels=2, n_bins=9, n_frames=16)
    seen = []

    def record(solver):
        seen.append(np.asarray(solver.demix_filter).copy())

    solver = AuxLaplaceIVA(algorithm_spatial="IP", callbacks=record)
    solver(X, iteration=3)
    assert len(seen) == 4  # init + 3 iterations (reference bss/iva.py:407-441)

    # warm start: resuming 2+1 iterations == 3 straight iterations
    s1 = AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=False)
    s1(X, iteration=2)
    W2 = s1.demix_filter
    s2 = AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=False)
    s2(X, iteration=1, demix_filter=W2)
    s3 = AuxLaplaceIVA(algorithm_spatial="IP", recordable_loss=False)
    s3(X, iteration=3)
    np.testing.assert_allclose(
        np.asarray(s2.demix_filter), np.asarray(s3.demix_filter), atol=1e-10
    )


def test_iss_monotone_nll_and_matches_ip(rng):
    """The NLL-consistent ISS self-steering scale (``1 − √(T/D)``,
    ops/iss.py) restores the auxiliary-function guarantee: the NLL decreases
    monotonically at EVERY iteration (the reference's ``1 − 1/√D`` scale
    breaks this — see the compat parity test), and converges to the same
    optimum as IP."""
    X = make_mixture(rng, n_channels=2, n_bins=33, n_frames=64)
    iss = AuxLaplaceIVA(algorithm_spatial="ISS")
    iss(X, iteration=20)
    loss = np.asarray(iss.loss)
    diffs = np.diff(loss)
    assert np.all(diffs <= 1e-10 * np.abs(loss[:-1])), diffs

    ip = AuxLaplaceIVA(algorithm_spatial="IP")
    ip(X, iteration=20)
    assert abs(ip.loss[-1] - iss.loss[-1]) / abs(ip.loss[-1]) < 0.05


def test_extra_kwargs_become_attributes(rng):
    X = make_mixture(rng)
    sdri = []

    def cb(solver):
        solver.sdri.append(1)

    solver = AuxLaplaceIVA(callbacks=cb, recordable_loss=False)
    solver(X, iteration=2, sdri=sdri)
    assert solver.sdri is sdri and len(sdri) == 3


def test_overdetermined_auxiva(rng):
    """4 mics, 2 sources: PCA reduction + AuxIVA + projection back onto the
    unreduced mixture (the reference's working overdetermined path)."""
    from audio_source_separation_tpu.models import OverAuxLaplaceIVA
    from conftest import synth_convolutive_mixture
    from audio_source_separation_tpu.utils import convolutive_mixture, synthetic_room_impulse_responses
    from audio_source_separation_tpu.transform import stft as _stft, istft as _istft

    # 2 broadband sources at 4 mics
    t = np.arange(8000) / 16000.0
    srcs = []
    for n, f in enumerate([3.0, 5.0]):
        env = 0.5 * (1 + np.sign(np.sin(2 * np.pi * f * t + 0.7 * n)))
        env = np.convolve(env, np.ones(64) / 64, mode="same")
        srcs.append(env * rng.randn(8000))
    srcs = np.stack(srcs)
    rirs = synthetic_room_impulse_responses(2, 4, taps=8)
    mixture, images = convolutive_mixture(srcs, rirs)

    X = _stft(mixture, fft_size=512, hop_size=256)
    solver = OverAuxLaplaceIVA(algorithm_spatial="IP", n_sources=2, recordable_loss=False)
    Y = solver(np.asarray(X), iteration=25)
    assert Y.shape[0] == 2
    y = np.asarray(_istft(Y, fft_size=512, hop_size=256, length=mixture.shape[-1]))

    refs = images[:, 0]  # images at mic 0
    before = _best_pairing_sisdr(mixture[:2], refs)
    after = _best_pairing_sisdr(y, refs)
    assert after > before + 3.0, (before, after)


def test_auxiva_ipa_raises(rng):
    from conftest import make_mixture

    X = make_mixture(rng, n_channels=2, n_bins=9, n_frames=16)
    solver = AuxLaplaceIVA(algorithm_spatial="IPA", recordable_loss=False)
    with pytest.raises(ValueError):
        solver(X, iteration=1)


def numpy_auxiva_ip2_step(X, W, m, n, eps=EPS, threshold=1e12):
    """Literal reference IP2 step (bss/iva.py:544-599) with np.linalg.eig."""
    n_bins, _, n_channels = W.shape
    W = W.copy()
    Y = np.einsum("fnc,cft->nft", W, X)
    Y_m, Y_n = Y[m], Y[n]
    R_m = np.maximum(np.sqrt((np.abs(Y_m) ** 2).sum(axis=0)), eps)
    R_n = np.maximum(np.sqrt((np.abs(Y_n) ** 2).sum(axis=0)), eps)
    Xb = X.transpose(1, 2, 0)
    XX = Xb[:, :, :, None] * Xb[:, :, None, :].conj()
    U_m = (XX / R_m[None, :, None, None]).mean(axis=1)
    U_n = (XX / R_n[None, :, None, None]).mean(axis=1)
    e_m = np.zeros((n_bins, n_channels, 1))
    e_n = np.zeros((n_bins, n_channels, 1))
    e_m[:, m], e_n[:, n] = 1, 1
    E_mn = np.concatenate([e_m, e_n], axis=2)
    WU_m, WU_n = W @ U_m, W @ U_n
    cond_m = np.linalg.cond(WU_m) < threshold
    cond_n = np.linalg.cond(WU_n) < threshold
    P_m, P_n = np.linalg.inv(WU_m) @ E_mn, np.linalg.inv(WU_n) @ E_mn
    V_m = P_m.transpose(0, 2, 1).conj() @ U_m @ P_m
    V_n = P_n.transpose(0, 2, 1).conj() @ U_n @ P_n
    VV = np.linalg.inv(V_n) @ V_m
    eigval, v = np.linalg.eig(VV)
    order = np.argsort(eigval, axis=-1)[:, ::-1]
    v_t = v.swapaxes(-2, -1)
    v_sorted = np.take_along_axis(v_t, order[..., None], axis=-2)
    v_m, v_n = v_sorted[:, 0], v_sorted[:, 1]
    vVv_m = (v_m[:, None, :].conj() @ V_m @ v_m[:, :, None])[..., 0, 0]
    vVv_n = (v_n[:, None, :].conj() @ V_n @ v_n[:, :, None])[..., 0, 0]
    v_m = v_m / np.sqrt(vVv_m)[:, None]
    v_n = v_n / np.sqrt(vVv_n)[:, None]
    w_m = (P_m @ v_m[..., None])[..., 0].conj()
    w_n = (P_n @ v_n[..., None])[..., 0].conj()
    W[:, m, :] = np.where(cond_m[:, None], w_m, W[:, m, :])
    W[:, n, :] = np.where(cond_n[:, None], w_n, W[:, n, :])
    return W


def test_auxiva_ip2_step_parity(rng):
    """The closed-form 2x2 generalized eig must reproduce the reference's
    np.linalg.eig-based IP2 row updates (up to the eigvec phase, which the
    vVv normalization + conj cancels except for a unit phase on w; compare
    the separation-relevant quantity |w^H x| and the NLL instead)."""
    import jax.numpy as jnp

    X = make_mixture(rng, n_channels=2, n_bins=9, n_frames=32)
    solver = AuxLaplaceIVA(algorithm_spatial="IP2", recordable_loss=False, guard="svd")
    state = solver.init_state(X)
    new_state = solver.update_state(state)
    W_jax = np.asarray(new_state["demix_filter"])
    W_ref = numpy_auxiva_ip2_step(
        X, np.tile(np.eye(2, dtype=X.dtype), (9, 1, 1)), 0, 1
    )
    # rows may differ by a unit phase; compare phase-invariantly per (f, row)
    for f in range(9):
        for r in range(2):
            a, b = W_jax[f, r], W_ref[f, r]
            phase = np.vdot(b, a)
            phase = phase / np.abs(phase)
            np.testing.assert_allclose(a, phase * b, atol=1e-8)
    # and the NLL agrees exactly (phase-invariant)
    np.testing.assert_allclose(
        numpy_laplace_nll(X, W_jax), numpy_laplace_nll(X, W_ref), rtol=1e-10
    )


@pytest.mark.parametrize("n_channels", [2, 3, 4])
def test_power_only_scan_matches_complex_scan(rng, n_channels):
    """The round-4 power-only scan (no complex estimates inside the loop;
    frame weights from one real GEMM over the invariant pair-product planes)
    must reproduce the complex-carry scan to fp precision, for both
    contrasts and for every channel count the gate admits (C = 3 exercises
    the cross-term expansion, C = 4 the gate bound and the generic Laplace
    adjugates)."""
    X = make_mixture(rng, n_channels=n_channels, n_bins=17, n_frames=40)

    for cls in (AuxLaplaceIVA, AuxGaussIVA):
        outs = {}
        for mode in (True, False):
            solver = cls(algorithm_spatial="IP")
            solver.power_scan = mode
            np.random.seed(111)
            outs[mode] = np.asarray(solver(X, iteration=12))
            assert solver._power_only_scan is mode
        np.testing.assert_allclose(
            outs[True], outs[False], rtol=1e-8, atol=1e-10
        )
