"""ILRMA family tests: source-model parity against direct NumPy math, loss
monotonicity across spatial algorithms and normalizations, end-to-end
separation on synthetic convolutive mixtures and (if present) the reference's
bundled sample-song music mixture."""

import os

import numpy as np
import pytest

from audio_source_separation_tpu.models import (
    GaussILRMA,
    TILRMA,
    ConsistentGaussILRMA,
    GGDILRMA,
    KLILRMA,
)
from audio_source_separation_tpu.transform import stft, istft

from conftest import make_mixture, synth_convolutive_mixture

EPS = 1e-12


def numpy_ilrma_source_step(P, T, V, d=2.0, eps=EPS):
    """Direct NumPy implementation of the batched MU sweep (per-source)."""
    TV = np.maximum(T @ V, eps)
    division, TV_inv = P / TV ** ((d + 2) / d), 1 / TV
    TVV = np.maximum(TV_inv @ V.transpose(0, 2, 1), eps)
    T = T * (division @ V.transpose(0, 2, 1) / TVV) ** (d / (d + 2))
    TV = np.maximum(T @ V, eps)
    division, TV_inv = P / TV ** ((d + 2) / d), 1 / TV
    TTV = np.maximum(T.transpose(0, 2, 1) @ TV_inv, eps)
    V = V * (T.transpose(0, 2, 1) @ division / TTV) ** (d / (d + 2))
    return T, V


@pytest.mark.parametrize("domain", [2.0, 1.5])
def test_source_model_parity(rng, domain):
    import jax.numpy as jnp

    X = make_mixture(rng, n_channels=2, n_bins=11, n_frames=16)
    np.random.seed(111)
    solver = GaussILRMA(n_basis=3, domain=domain, recordable_loss=False, normalize=False)
    solver.set_shape_metadata(X)
    kwargs = solver.prepare_state_kwargs(X, {})
    state = solver.init_state(jnp.asarray(X), **{k: jnp.asarray(v) for k, v in kwargs.items()})
    new_state = solver._update_source_basic(state)
    P = np.abs(np.asarray(state["estimation"])) ** 2
    T_exp, V_exp = numpy_ilrma_source_step(
        P, np.asarray(kwargs["basis"]), np.asarray(kwargs["activation"]), d=domain
    )
    np.testing.assert_allclose(np.asarray(new_state["basis"]), T_exp, atol=1e-10)
    np.testing.assert_allclose(np.asarray(new_state["activation"]), V_exp, atol=1e-10)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"algorithm_spatial": "IP", "normalize": "power"},
        {"algorithm_spatial": "IP", "normalize": "projection-back"},
        {"algorithm_spatial": "IP", "normalize": "power", "partitioning": True},
        {"algorithm_spatial": "IP2", "normalize": "power"},
        {"algorithm_spatial": "IP", "normalize": "power", "domain": 1.5},
    ],
)
def test_gauss_ilrma_loss_decreases(rng, kwargs):
    X = make_mixture(rng, n_channels=2, n_bins=33, n_frames=48)
    np.random.seed(111)
    solver = GaussILRMA(n_basis=4, **kwargs)
    solver(X, iteration=10)
    losses = np.asarray(solver.loss)
    assert len(losses) == 11
    assert losses[-1] < losses[0], losses
    # normalization makes per-iteration monotonicity approximate; require
    # overall decrease and no catastrophic jumps
    assert (np.diff(losses) <= np.abs(losses[:-1]) * 0.05 + 1.0).all(), losses


def test_gauss_ilrma_iss_runs(rng):
    X = make_mixture(rng, n_channels=2, n_bins=17, n_frames=32)
    np.random.seed(111)
    with pytest.warns(UserWarning):
        solver = GaussILRMA(n_basis=3, algorithm_spatial="ISS")
    solver(X, iteration=8)
    losses = np.asarray(solver.loss)
    assert losses[-1] < losses[0]


def test_tilrma_loss_decreases(rng):
    X = make_mixture(rng, n_channels=2, n_bins=33, n_frames=48)
    np.random.seed(111)
    solver = TILRMA(n_basis=4, nu=1000)
    solver(X, iteration=10)
    losses = np.asarray(solver.loss)
    assert losses[-1] < losses[0], losses


def _si_sdr(estimate, target):
    alpha = np.sum(estimate * target) / np.sum(target**2)
    projection = alpha * target
    noise = estimate - projection
    return 10 * np.log10(np.sum(projection**2) / np.sum(noise**2))


def _best_pairing_sisdr(estimates, targets):
    a = np.mean([_si_sdr(estimates[0], targets[0]), _si_sdr(estimates[1], targets[1])])
    b = np.mean([_si_sdr(estimates[0], targets[1]), _si_sdr(estimates[1], targets[0])])
    return max(a, b)


def test_gauss_ilrma_separates_convolutive_mixture(rng):
    mixture, images = synth_convolutive_mixture(rng, n_sources=2, n_samples=16000)
    fft_size, hop_size = 512, 256
    X = stft(mixture, fft_size=fft_size, hop_size=hop_size)
    np.random.seed(111)
    solver = GaussILRMA(n_basis=2, recordable_loss=False)
    Y = solver(X, iteration=30)
    y = np.asarray(istft(Y, fft_size=fft_size, hop_size=hop_size, length=mixture.shape[-1]))
    before = _best_pairing_sisdr(mixture, images)
    after = _best_pairing_sisdr(y, images)
    assert after > before + 5.0, (before, after)


def test_consistent_gauss_ilrma(rng):
    mixture, images = synth_convolutive_mixture(rng, n_sources=2, n_samples=8000)
    fft_size, hop_size = 256, 128
    X = stft(mixture, fft_size=fft_size, hop_size=hop_size)
    np.random.seed(111)
    solver = ConsistentGaussILRMA(n_basis=2, fft_size=fft_size, hop_size=hop_size)
    Y = solver(X, iteration=10)
    losses = np.asarray(solver.loss)
    assert losses[-1] < losses[0]
    y = np.asarray(istft(Y, fft_size=fft_size, hop_size=hop_size, length=mixture.shape[-1]))
    after = _best_pairing_sisdr(y, images)
    before = _best_pairing_sisdr(mixture, images)
    assert after > before + 3.0, (before, after)


def test_ilrma_warm_start_and_callbacks(rng):
    X = make_mixture(rng, n_channels=2, n_bins=17, n_frames=24)
    seen = []
    np.random.seed(111)
    solver = GaussILRMA(n_basis=3, callbacks=lambda s: seen.append(s.basis.copy()))
    solver(X, iteration=3)
    assert len(seen) == 4

    np.random.seed(111)
    s1 = GaussILRMA(n_basis=3, recordable_loss=False)
    s1(X, iteration=2)
    s2 = GaussILRMA(n_basis=3, recordable_loss=False)
    s2(
        X,
        iteration=1,
        demix_filter=s1.demix_filter,
        basis=s1.basis,
        activation=s1.activation,
    )
    np.random.seed(111)
    s3 = GaussILRMA(n_basis=3, recordable_loss=False)
    s3(X, iteration=3)
    np.testing.assert_allclose(
        np.asarray(s2.demix_filter), np.asarray(s3.demix_filter), atol=1e-8
    )


SAMPLE_SONG = "/root/reference/dataset/sample-song/sample-2_mixture_16000.wav"


@pytest.mark.skipif(not os.path.exists(SAMPLE_SONG), reason="sample-song not available")
def test_gauss_ilrma_sample_song_improves_sisdr():
    """End-to-end music separation on the reference's bundled dataset (the
    reference's canonical ILRMA demo, egs/bss-example/ilrma)."""
    from scipy.signal import fftconvolve

    from audio_source_separation_tpu.utils import read_wav

    x, sr = read_wav(SAMPLE_SONG)
    x = x.T
    piano, _ = read_wav(SAMPLE_SONG.replace("mixture", "piano"))
    violin, _ = read_wav(SAMPLE_SONG.replace("mixture", "violin"))

    fft_size, hop_size = 2048, 1024
    X = stft(x, fft_size=fft_size, hop_size=hop_size)
    np.random.seed(111)
    solver = GaussILRMA(n_basis=2, recordable_loss=True)
    Y = solver(X, iteration=50)
    y = np.asarray(istft(Y, fft_size=fft_size, hop_size=hop_size, length=x.shape[-1]))

    losses = np.asarray(solver.loss)
    assert losses[-1] < losses[0]

    def best_lag_sisdr(est, stem):
        c = fftconvolve(est, stem[::-1], mode="full")
        lag = int(np.argmax(np.abs(c))) - (len(stem) - 1)
        if lag >= 0:
            e = est[lag : lag + len(stem)]
            t = stem[: len(e)]
        else:
            e = est[: len(stem) + lag]
            t = stem[-lag : -lag + len(e)]
        return _si_sdr(e, t)

    after = max(
        np.mean([best_lag_sisdr(y[0], piano), best_lag_sisdr(y[1], violin)]),
        np.mean([best_lag_sisdr(y[0], violin), best_lag_sisdr(y[1], piano)]),
    )
    before = max(
        np.mean([best_lag_sisdr(x[0], piano), best_lag_sisdr(x[1], violin)]),
        np.mean([best_lag_sisdr(x[0], violin), best_lag_sisdr(x[1], piano)]),
    )
    assert after > before, (before, after)


def test_ilrma_stubs_raise():
    with pytest.raises(NotImplementedError):
        GGDILRMA(n_basis=2)
    with pytest.raises(NotImplementedError):
        KLILRMA(n_basis=2)


def test_tilrma_nu1_float32_long_run_stays_finite(rng):
    """The reference default nu=1 at float32 (the TPU production dtype): the
    posterior weights span ~10 decades and the unguarded IP sweep NaN'd
    around iteration 70 on realistic mixtures (round-4 fix: Cholesky
    quadratic form + κ₁ guard + reference denominator floor).  Long f32 run
    must stay finite with a finite non-increasing-ish loss."""
    S = rng.randn(2, 33, 48) * np.abs(rng.randn(2, 1, 48)) + 1j * rng.randn(2, 33, 48)
    A = np.array([[1.0, 0.7], [0.6, 1.0]])
    X = np.einsum("cn,nft->cft", A, S).astype(np.complex64)

    np.random.seed(111)
    solver = TILRMA(n_basis=3, nu=1, recordable_loss=True)
    kwargs = {
        "basis": np.random.rand(2, 33, 3).astype(np.float32),
        "activation": np.random.rand(2, 3, 48).astype(np.float32),
    }
    Y = np.asarray(solver(X, iteration=150, **kwargs))
    assert np.isfinite(Y).all()
    # the t-NLL is not strictly monotone at f32 precision on noise-like
    # mixtures (guarded rows + rounding) — the regression target is
    # finiteness, the pre-fix run NaN'd
    assert np.isfinite(np.asarray(solver.loss)).all()


@pytest.mark.parametrize(
    "make",
    [
        lambda: GaussILRMA(n_basis=2, algorithm_spatial="IP", normalize="power"),
        lambda: GaussILRMA(n_basis=2, algorithm_spatial="IP2", normalize="power"),
        lambda: TILRMA(n_basis=2, nu=1, normalize="power"),
    ],
    ids=["gauss-ip", "gauss-ip2", "t-nu1"],
)
@pytest.mark.parametrize("n_channels", [2, 3])
def test_power_only_scan_matches_complex_scan(rng, make, n_channels):
    """Round-4 power-only scan (estimation_power restored from the planes
    quadratic form; no complex (N, F, T) estimate in the loop) must match
    the complex-restore scan to fp precision (C = 3 exercises the 9-plane
    cross-term expansion)."""
    X = make_mixture(rng, n_channels=n_channels, n_bins=17, n_frames=40)

    outs = {}
    for mode in (True, False):
        solver = make()
        assert solver._power_only_scan  # contract: config qualifies
        if not mode:
            # force the complex path by overriding the property per-instance
            type(solver)._power_only_scan  # (property lives on the class)
            solver.__class__ = type(
                "NoPower", (type(solver),), {"_power_only_scan": property(lambda s: False)}
            )
            assert not solver._power_only_scan
        np.random.seed(111)
        outs[mode] = np.asarray(solver(X, iteration=10))
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-8, atol=1e-10)


def test_consistent_ilrma_power_scan_matches_complex(rng):
    """ConsistentGaussILRMA folds projection-back into W per iteration; the
    power-mode Gram restatement must match the complex per-bin least squares."""
    from audio_source_separation_tpu.transform import stft as stft_t

    rng_np = np.random.RandomState(7)
    fft_size, hop_size = 32, 16
    x = rng_np.randn(2, 16 * fft_size)
    X = stft_t(x, fft_size=fft_size, hop_size=hop_size)

    outs = {}
    for mode in (True, False):
        solver = ConsistentGaussILRMA(
            n_basis=2, fft_size=fft_size, hop_size=hop_size
        )
        assert solver._power_only_scan
        if not mode:
            solver.__class__ = type(
                "NoPowerC",
                (ConsistentGaussILRMA,),
                {"_power_only_scan": property(lambda s: False)},
            )
            assert not solver._power_only_scan
        np.random.seed(111)
        outs[mode] = np.asarray(solver(X, iteration=8))
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-8, atol=1e-10)
