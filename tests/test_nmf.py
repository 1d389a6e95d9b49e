"""NMF/NTF/PSDTF family tests: update-rule parity against direct NumPy math,
loss monotonic decrease, and reconstruction quality."""

import numpy as np
import pytest

from audio_source_separation_tpu.models import (
    EUCNMF,
    KLNMF,
    ISNMF,
    TNMF,
    CauchyNMF,
    ComplexEUCNMF,
    EUCNTF,
    LDPSDTF,
)
from audio_source_separation_tpu.models.nmf import MultichannelISNMF

EPS = 1e-12


def _lowrank_target(rng, n_bins=33, n_frames=40, rank=3):
    T = np.abs(rng.randn(n_bins, rank)) + 0.1
    V = np.abs(rng.randn(rank, n_frames)) + 0.1
    return T @ V + 0.01 * np.abs(rng.randn(n_bins, n_frames))


def numpy_eucnmf_step(Z, T, V, d=2.0, eps=EPS):
    TV = np.maximum(T @ V, eps)
    TVV = np.maximum(TV ** ((4 - d) / d) @ V.T, eps)
    T = T * ((Z * TV ** ((2 - d) / d)) @ V.T / TVV) ** (d / (4 - d))
    TV = np.maximum(T @ V, eps)
    TTV = np.maximum(T.T @ TV ** ((4 - d) / d), eps)
    V = V * (T.T @ (Z * TV ** ((2 - d) / d)) / TTV) ** (d / (4 - d))
    return T, V


@pytest.mark.parametrize("domain", [2.0, 1.5])
def test_eucnmf_step_parity(rng, domain):
    Z = _lowrank_target(rng)
    model = EUCNMF(n_basis=4, domain=domain)
    np.random.seed(111)
    T0 = np.random.rand(33, 4)
    V0 = np.random.rand(4, 40)
    state = model.init_state(
        Z, basis=np.asarray(T0), activation=np.asarray(V0)
    )
    # jnp arrays go in via jnp conversion inside; run one raw update
    import jax.numpy as jnp

    state = {k: jnp.asarray(v) for k, v in state.items()}
    new_state = model.update_state(state)
    T_exp, V_exp = numpy_eucnmf_step(Z, T0.copy(), V0.copy(), d=domain)
    np.testing.assert_allclose(np.asarray(new_state["basis"]), T_exp, atol=1e-10)
    np.testing.assert_allclose(np.asarray(new_state["activation"]), V_exp, atol=1e-10)


@pytest.mark.parametrize(
    "cls,kwargs",
    [
        (EUCNMF, {}),
        (EUCNMF, {"domain": 1.5}),
        (KLNMF, {}),
        (KLNMF, {"domain": 1.2}),
        (ISNMF, {}),
        (ISNMF, {"algorithm": "me"}),
        (TNMF, {"nu": 100.0}),
        (CauchyNMF, {"algorithm": "mm"}),
        (CauchyNMF, {"algorithm": "me"}),
        (CauchyNMF, {"algorithm": "mm_fast"}),
    ],
)
def test_nmf_loss_decreases(rng, cls, kwargs):
    Z = _lowrank_target(rng)
    np.random.seed(111)
    model = cls(n_basis=4, **kwargs)
    T, V = model(Z, iteration=30)
    losses = np.asarray(model.loss)
    assert len(losses) == 30
    assert losses[-1] < losses[0]
    # MM iterations must not increase the loss (allow tiny fp slack)
    assert (np.diff(losses) <= np.abs(losses[:-1]) * 1e-5 + 1e-8).all()
    assert np.asarray(T).shape == (33, 4) and np.asarray(V).shape == (4, 40)


def test_nmf_reconstruction_quality(rng):
    Z = _lowrank_target(rng, rank=3)
    np.random.seed(111)
    model = EUCNMF(n_basis=3)
    T, V = model(Z, iteration=200)
    rel = np.linalg.norm(np.asarray(T) @ np.asarray(V) - Z) / np.linalg.norm(Z)
    assert rel < 0.05, rel


def test_nmf_warm_start(rng):
    Z = _lowrank_target(rng)
    np.random.seed(111)
    m1 = EUCNMF(n_basis=4)
    T1, V1 = m1(Z, iteration=5)
    m2 = EUCNMF(n_basis=4)
    T2, V2 = m2(Z, iteration=5, basis=T1, activation=V1)
    np.random.seed(111)
    m3 = EUCNMF(n_basis=4)
    T3, V3 = m3(Z, iteration=10)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T3), rtol=1e-8, atol=1e-10)


def test_complex_nmf(rng):
    X = (rng.randn(17, 24) + 1j * rng.randn(17, 24)) * 0.5
    np.random.seed(111)
    # regularizer=0: pure fit — loss must decrease monotonically; with the
    # default sparsity regularizer the *fit* loss may rise (penalty excluded
    # from the recorded loss), matching the reference math exactly.
    model = ComplexEUCNMF(n_basis=3, regularizer=0.0)
    T, V, Phi = model(X, iteration=20)
    losses = np.asarray(model.loss)
    assert losses[-1] < losses[0]
    assert (np.diff(losses) <= 1e-8).all()
    assert np.asarray(T).shape == (17, 3)
    assert np.asarray(Phi).shape == (17, 3, 24)
    recon = np.sum(
        np.asarray(T)[:, :, None] * np.asarray(V)[None] * np.exp(1j * np.asarray(Phi)),
        axis=1,
    )
    rel = np.linalg.norm(recon - X) / np.linalg.norm(X)
    assert rel < 0.9


def test_multichannel_isnmf(rng):
    # synthetic covariance data: two rank-1 spatial sources with low-rank spectra
    F, T, C, K = 9, 16, 2, 4
    a = rng.randn(F, 2, C) + 1j * rng.randn(F, 2, C)
    spat = a[..., :, None] * a[..., None, :].conj()  # (F, 2, C, C)
    spec = np.abs(rng.randn(F, 2)) + 0.1
    act = np.abs(rng.randn(2, T)) + 0.1
    X = np.einsum("fncd,fn,nt->ftcd", spat, spec, act)
    X = X + 0.01 * np.eye(C)

    np.random.seed(111)
    model = MultichannelISNMF(n_basis=K)
    H, Tb, V = model(X, iteration=15)
    losses = np.asarray(model.loss)
    assert losses[-1] < losses[0]
    assert np.asarray(H).shape == (F, K, C, C)
    # spatial matrices stay PSD (trace-normalized)
    eig = np.linalg.eigvalsh(np.asarray(H))
    assert (eig > -1e-8).all()
    np.testing.assert_allclose(
        np.trace(np.asarray(H), axis1=-2, axis2=-1).real, 1.0, atol=1e-6
    )


def test_multichannel_isnmf_float32_dynamic_range(rng):
    """Real spectrogram covariances span ~24 decades across bins/frames
    (digital silence next to loud passages); at float32 the unequilibrated
    adjugate/Riccati chains overflow (round-4 fix: per-bin equilibration in
    ``init_state``, scale-invariant ``_power_2x2``, eigvalsh-floored nll)."""
    F, T, C, K = 9, 16, 2, 3
    a = rng.randn(F, 2, C) + 1j * rng.randn(F, 2, C)
    spat = a[..., :, None] * a[..., None, :].conj()
    spec = (np.abs(rng.randn(F, 2)) + 0.1) * np.logspace(-12, 6, F)[:, None]
    act = np.abs(rng.randn(2, T)) + 0.1
    act[:, : T // 3] = 1e-14  # leading digital near-silence
    X = np.einsum("fncd,fn,nt->ftcd", spat, spec, act).astype(np.complex64)

    np.random.seed(111)
    model = MultichannelISNMF(n_basis=K)
    kwargs = model.prepare_state_kwargs(X, {})
    kwargs = {
        k: np.asarray(v, dtype=np.complex64 if np.iscomplexobj(v) else np.float32)
        for k, v in kwargs.items()
    }
    H, Tb, V = model(X, iteration=10, **kwargs)
    losses = np.asarray(model.loss)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    for arr in (H, Tb, V):
        assert np.all(np.isfinite(np.asarray(arr)))


def test_eucntf(rng):
    C, F, T, K = 3, 17, 20, 3
    Z = np.abs(rng.randn(C, K)) + 0.1
    Tb = np.abs(rng.randn(F, K)) + 0.1
    V = np.abs(rng.randn(K, T)) + 0.1
    X = np.einsum("ck,fk,kt->cft", Z, Tb, V)
    np.random.seed(111)
    model = EUCNTF(n_basis=K)
    Zo, To, Vo = model(X, iteration=50)
    losses = np.asarray(model.loss)
    assert losses[-1] < losses[0]
    recon = np.einsum("ck,fk,kt->cft", np.asarray(Zo), np.asarray(To), np.asarray(Vo))
    rel = np.linalg.norm(recon - X) / np.linalg.norm(X)
    assert rel < 0.1, rel


def test_ldpsdtf(rng):
    B, T, K = 6, 12, 2
    # synthetic PSD tensor from two PSD bases
    A1 = rng.randn(B, B)
    A2 = rng.randn(B, B)
    V1 = A1 @ A1.T + 0.5 * np.eye(B)
    V2 = A2 @ A2.T + 0.5 * np.eye(B)
    H = np.abs(rng.randn(K, T)) + 0.2
    X = np.einsum("kij,kt->ijt", np.stack([V1, V2]), H)

    np.random.seed(111)
    model = LDPSDTF(n_basis=K)
    V, Hout = model(X, iteration=20)
    losses = np.asarray(model.loss)
    assert losses[-1] < losses[0]
    assert np.asarray(V).shape == (B, B, K)
    # basis matrices stay PSD, trace-normalized
    Vb = np.asarray(V).transpose(2, 0, 1)
    assert (np.linalg.eigvalsh(Vb) > -1e-8).all()
    np.testing.assert_allclose(np.trace(Vb, axis1=-2, axis2=-1), 1.0, atol=1e-6)


def test_ldpsdtf_em_raises():
    with pytest.raises(NotImplementedError):
        LDPSDTF(n_basis=2, algorithm="em")


def test_complex_nmf_trajectory_matches_reference_math(rng):
    """Full 10-iteration trajectory parity with a literal NumPy port of the
    reference's ComplexEUCNMF update (algorithm/nmf.py:597-676)."""
    X = (rng.randn(11, 14) + 1j * rng.randn(11, 14)) * 0.5
    K, reg, p = 3, 0.1, 1

    def ref_run(X, iters):
        np.random.seed(111)
        n_bins, n_frames = X.shape
        T = np.random.rand(n_bins, K)
        V = np.random.rand(K, n_frames)
        np.random.rand(n_bins, K, n_frames)  # discarded random phase draw
        Phi = np.tile(np.angle(X)[:, None, :], (1, K, 1))

        def beta(T, V):
            TV = T[:, :, None] * V[None]
            s = TV.sum(axis=1, keepdims=True)
            s[s < EPS] = EPS
            return TV / s

        Beta = beta(T, V)
        for _ in range(iters):
            Ephi = np.exp(1j * Phi)
            B = Beta.copy()
            B[B < EPS] = EPS
            Xk = T[:, :, None] * V[None] * Ephi
            ZX = X - Xk.sum(axis=1)
            Z_bar = Xk + B * ZX[:, None, :]
            V_bar = V.copy()
            V_bar[V_bar < EPS] = EPS
            Re = np.real(Z_bar.conj() * Ephi)
            num = ((V[None] / B) * Re).sum(axis=2)
            den = np.sum(V[None] ** 2 / B, axis=2)
            den[den < EPS] = EPS
            T = num / den
            num = ((T[:, :, None] / B) * Re).sum(axis=0)
            den = np.sum(T[:, :, None] ** 2 / B, axis=0) + reg * p * V_bar ** (p - 2)
            den[den < EPS] = EPS
            V = num / den
            Phi = np.angle(Z_bar)
            T = T / T.sum(axis=0)
            Beta = beta(T, V)
        return T, V, Phi

    T_ref, V_ref, Phi_ref = ref_run(X, 10)
    np.random.seed(111)
    model = ComplexEUCNMF(n_basis=K, regularizer=reg, p=p)
    T, V, Phi = model(X, iteration=10)
    np.testing.assert_allclose(np.asarray(T), T_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(V), V_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Phi), Phi_ref, atol=1e-8)


def test_ldpsdtf_pencil_matches_generic_path(rng):
    """The K=2 matrix-pencil fast path (round 5) must track the generic
    eigh path: same trajectory up to the documented ridge-semantics
    differences (~1e-12 relative per iteration)."""
    B, T, K = 8, 10, 2
    A1 = rng.randn(B, B)
    A2 = rng.randn(B, B)
    H = np.abs(rng.randn(K, T)) + 0.2
    X = np.einsum(
        "kij,kt->ijt",
        np.stack([A1 @ A1.T + 0.5 * np.eye(B), A2 @ A2.T + 0.5 * np.eye(B)]),
        H,
    )

    class GenericLDPSDTF(LDPSDTF):
        _use_pencil = property(lambda self: False)

    np.random.seed(111)
    model = LDPSDTF(n_basis=K)
    V_p, H_p = model(X, iteration=10)
    loss_p = np.asarray(model.loss)
    np.random.seed(111)
    generic = GenericLDPSDTF(n_basis=K)
    V_g, H_g = generic(X, iteration=10)
    loss_g = np.asarray(generic.loss)
    np.testing.assert_allclose(np.asarray(V_p), np.asarray(V_g), rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(H_p), np.asarray(H_g), rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(loss_p, loss_g, rtol=1e-6)


def test_ldpsdtf_warm_start_round_trip(rng, tmp_path):
    """The per-frame equilibration (round 5) must round-trip through the
    public warm-start/checkpoint surfaces: finalize and attribute sync
    publish H in the INPUT frame, init_state re-equilibrates."""
    B, T, K = 8, 10, 2
    A1, A2 = rng.randn(B, B), rng.randn(B, B)
    H = np.abs(rng.randn(K, T)) + 0.2
    X = np.einsum(
        "kij,kt->ijt",
        np.stack([A1 @ A1.T + 0.5 * np.eye(B), A2 @ A2.T + 0.5 * np.eye(B)]),
        H,
    )

    np.random.seed(111)
    m1 = LDPSDTF(n_basis=K)
    V1, H1 = m1(X, iteration=5)
    m2 = LDPSDTF(n_basis=K)
    V2, H2 = m2(X, iteration=5, basis=V1, activation=H1)
    np.random.seed(111)
    m3 = LDPSDTF(n_basis=K)
    V3, H3 = m3(X, iteration=10)
    np.testing.assert_allclose(np.asarray(V2), np.asarray(V3), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(H2), np.asarray(H3), rtol=1e-7, atol=1e-10)

    # checkpoint surface: published attributes are in the input frame
    ckpt = str(tmp_path / "psdtf.npz")
    m1.save_state(ckpt)
    m4 = LDPSDTF(n_basis=K)
    V4, H4 = m4(X, iteration=5, **LDPSDTF.load_state(ckpt))
    np.testing.assert_allclose(np.asarray(V4), np.asarray(V3), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(H4), np.asarray(H3), rtol=1e-7, atol=1e-10)


def test_multichannel_isnmf_riccati_planes_matches_matrix(rng):
    """The ``riccati_planes`` toggle (round 5: the per-basis spatial Riccati
    chain on compact Hermitian planes) is output-invariant through the full
    jitted solver at float64."""
    F, T, C, K = 9, 16, 2, 4
    a = rng.randn(F, 2, C) + 1j * rng.randn(F, 2, C)
    spat = a[..., :, None] * a[..., None, :].conj()
    spec = np.abs(rng.randn(F, 2)) + 0.1
    act = np.abs(rng.randn(2, T)) + 0.1
    X = np.einsum("fncd,fn,nt->ftcd", spat, spec, act) + 0.01 * np.eye(C)

    outs, losses = [], []
    for flag in (False, True):
        np.random.seed(111)
        model = MultichannelISNMF(n_basis=K)
        model.riccati_planes = flag
        outs.append(model(X, iteration=8))
        losses.append(np.asarray(model.loss))
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-8)
    for got, want in zip(outs[1], outs[0]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-8, rtol=1e-6
        )
