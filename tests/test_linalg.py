"""Numerical tests for utils.linalg / algorithm.linalg / criterion against
straightforward NumPy computations."""

import numpy as np

from audio_source_separation_tpu.utils import to_hermite, to_psd, parallel_sort
from audio_source_separation_tpu.algorithm import solve_riccati
from audio_source_separation_tpu.algorithm.linalg import (
    sqrtm_hermitian,
    invsqrtm_hermitian,
)
from audio_source_separation_tpu.criterion import (
    is_divergence,
    generalized_kl_divergence,
    beta_divergence,
    logdet_divergence,
    multichannel_is_divergence,
    kl_divergence,
)


def random_psd(rng, *shape, n=4, complex_=True):
    if complex_:
        A = rng.randn(*shape, n, n) + 1j * rng.randn(*shape, n, n)
    else:
        A = rng.randn(*shape, n, n)
    return A @ np.swapaxes(A, -2, -1).conj() + 0.1 * np.eye(n)


def test_to_hermite(rng):
    X = rng.randn(5, 3, 3) + 1j * rng.randn(5, 3, 3)
    H = np.asarray(to_hermite(X))
    np.testing.assert_allclose(H, np.swapaxes(H, -2, -1).conj())
    np.testing.assert_allclose(H, (X + np.swapaxes(X, -2, -1).conj()) / 2)


def test_to_psd_makes_psd(rng):
    X = rng.randn(6, 4, 4) + 1j * rng.randn(6, 4, 4)
    X = (X + np.swapaxes(X, -2, -1).conj()) / 2  # Hermitian, indefinite
    P = np.asarray(to_psd(X))
    eigvals = np.linalg.eigvalsh(P)
    assert (eigvals >= -1e-10).all()
    # already-PSD input is changed only by the eps*trace ridge
    Q = random_psd(rng, 6, n=4)
    Q2 = np.asarray(to_psd(Q, eps=1e-12))
    np.testing.assert_allclose(Q2, Q, atol=1e-8)


def test_parallel_sort_matches_take_along_axis(rng):
    x = rng.randn(5, 4, 3) + 1j * rng.randn(5, 4, 3)
    order = np.argsort(rng.randn(5, 4), axis=-1)
    got = np.asarray(parallel_sort(x, order, axis=-2))
    expected = np.stack([x[i][order[i]] for i in range(5)])
    np.testing.assert_allclose(got, expected)


def test_parallel_sort_partial_order(rng):
    # order may select fewer elements than the axis length (Riccati use-case)
    x = rng.randn(3, 6, 2)
    order = np.argsort(rng.randn(3, 6), axis=-1)[:, :3]
    got = np.asarray(parallel_sort(x, order, axis=-2))
    assert got.shape == (3, 3, 2)
    expected = np.stack([x[i][order[i]] for i in range(3)])
    np.testing.assert_allclose(got, expected)


def test_sqrtm_hermitian(rng):
    A = random_psd(rng, 7, n=3)
    S = np.asarray(sqrtm_hermitian(A))
    np.testing.assert_allclose(S @ S, A, atol=1e-8)
    Si = np.asarray(invsqrtm_hermitian(A))
    eyes = np.broadcast_to(np.eye(3), (7, 3, 3))
    np.testing.assert_allclose(Si @ A @ Si, eyes, atol=1e-8)


def test_solve_riccati(rng):
    """H A H = B must hold for the PSD closed form (replaces the reference's
    general-eig block construction, algorithm/linalg.py:7-31)."""
    A = random_psd(rng, 5, n=3)
    B = random_psd(rng, 5, n=3)
    H = np.asarray(solve_riccati(A, B))
    np.testing.assert_allclose(H, np.swapaxes(H, -2, -1).conj(), atol=1e-10)
    np.testing.assert_allclose(H @ A @ H, B, atol=1e-7)
    assert (np.linalg.eigvalsh(H) >= -1e-9).all()


def test_divergences_nonnegative_and_zero_at_equality(rng):
    x = np.abs(rng.randn(4, 5)) + 0.1
    y = np.abs(rng.randn(4, 5)) + 0.1
    for div in (is_divergence, generalized_kl_divergence):
        loss = np.asarray(div(x, y))
        assert (loss >= -1e-10).all()
        np.testing.assert_allclose(np.asarray(div(x, x)), 0.0, atol=1e-9)
    loss = np.asarray(beta_divergence(x, y, beta=2))
    assert (loss >= -1e-10).all()
    np.testing.assert_allclose(np.asarray(beta_divergence(x, x, beta=2)), 0.0, atol=1e-9)


def test_beta2_is_half_squared_euclidean(rng):
    x = np.abs(rng.randn(6)) + 0.1
    y = np.abs(rng.randn(6)) + 0.1
    np.testing.assert_allclose(
        np.asarray(beta_divergence(x, y, beta=2)), (x - y) ** 2 / 2, atol=1e-12
    )


def test_kl_divergence_sums_leading_axis(rng):
    # the reference's kl_divergence has a torch-ism bug (divergence.py:18);
    # ours implements the documented intent
    x = np.abs(rng.randn(3, 4, 5)) + 0.1
    loss = np.asarray(kl_divergence(x, x))
    assert loss.shape == (4, 5)
    np.testing.assert_allclose(loss, 0.0, atol=1e-9)


def test_matrix_divergences(rng):
    X = random_psd(rng, 6, n=3)
    for div in (logdet_divergence, multichannel_is_divergence):
        same = np.asarray(div(X, X))
        np.testing.assert_allclose(same, 0.0, atol=1e-6)
        Y = random_psd(rng, 6, n=3)
        loss = np.asarray(div(X, Y))
        assert (loss >= -1e-6).all()


# --------------------------------------------------------------------------- #
# round-3 closed-form kernels: planes IP2 eig + SVD-free prox_logdet
# --------------------------------------------------------------------------- #
def test_eig2x2_planes_matches_matrix(rng):
    from audio_source_separation_tpu.ops.eig2 import (
        generalized_eig2x2_descending,
        generalized_eig2x2_descending_planes,
    )

    Vm = rng.randn(64, 2, 2) + 1j * rng.randn(64, 2, 2)
    Vm = Vm @ np.swapaxes(Vm, -2, -1).conj() + 0.1 * np.eye(2)
    Vn = rng.randn(64, 2, 2) + 1j * rng.randn(64, 2, 2)
    Vn = Vn @ np.swapaxes(Vn, -2, -1).conj() + 0.1 * np.eye(2)

    v1, v2 = generalized_eig2x2_descending(Vm, Vn)
    Vm_p = [[Vm[:, a, b] for b in range(2)] for a in range(2)]
    Vn_p = [[Vn[:, a, b] for b in range(2)] for a in range(2)]
    p1, p2 = generalized_eig2x2_descending_planes(Vm_p, Vn_p)
    np.testing.assert_allclose(np.stack(p1, -1), np.asarray(v1), atol=1e-10)
    np.testing.assert_allclose(np.stack(p2, -1), np.asarray(v2), atol=1e-10)


def test_ip2_pair_update_planes_matches_matrix_path(rng):
    """The planes IP2 kernel must reproduce the matrix-layout pairwise update
    exactly (same guards, both role orders of the pair)."""
    import jax.numpy as jnp

    from audio_source_separation_tpu.models import AuxLaplaceIVA

    X = (rng.randn(2, 33, 24) + 1j * rng.randn(2, 33, 24)).astype(np.complex128)
    X = np.einsum("cn,nft->cft", np.array([[1.0, 0.7], [0.6, 1.0]]), X)

    out = {}
    for guard in ("one_norm", "svd"):  # svd forces the matrix fallback
        solver = AuxLaplaceIVA(algorithm_spatial="IP2", guard=guard)
        out[guard] = solver(X, iteration=5)
        out[guard + "_W"] = np.asarray(solver.demix_filter)
    np.testing.assert_allclose(out["one_norm"], out["svd"], atol=1e-8)
    np.testing.assert_allclose(out["one_norm_W"], out["svd_W"], atol=1e-8)


def test_prox_logdet_planes_matches_svd(rng):
    import jax.numpy as jnp

    from audio_source_separation_tpu.models import ProxLaplaceIVA

    solver = ProxLaplaceIVA()
    W = jnp.asarray(rng.randn(57, 2, 2) + 1j * rng.randn(57, 2, 2))
    # include a near-singular matrix and a diagonal one (degenerate eigvec path)
    W = W.at[0].set(jnp.array([[1.0, 0.0], [0.0, 1e-9]], dtype=W.dtype))
    W = W.at[1].set(jnp.array([[2.0, 0.0], [0.0, 0.5]], dtype=W.dtype))
    for mu in (0.3, 1.0, 4.0):
        planes = np.asarray(solver._prox_logdet_planes_2x2(W, mu))
        U, s, V = np.linalg.svd(np.asarray(W))
        s = (s + np.sqrt(s**2 + 4 * mu)) / 2
        svd = (U * s[:, None, :]) @ V
        np.testing.assert_allclose(planes, svd, atol=1e-7)


def test_layout_probe_configuration_guard(rng):
    """The layout-anchoring probe (RESULTS.md: 3x on AuxIVA-IP) is a
    class-default contract — guard it so a refactor cannot silently disable
    the fast configuration."""
    import jax.numpy as jnp

    from audio_source_separation_tpu.models import AuxLaplaceIVA, GaussILRMA

    ip = AuxLaplaceIVA(algorithm_spatial="IP")
    ip2 = AuxLaplaceIVA(algorithm_spatial="IP2")
    iss = AuxLaplaceIVA(algorithm_spatial="ISS")
    assert ip.derived_in_carry and ip2.derived_in_carry
    assert not iss.derived_in_carry  # measured 0.76x — must stay off
    assert not GaussILRMA(n_basis=2).derived_in_carry  # measured 0.94x

    # the probe must be a LIVE reduction of the estimates when enabled
    state = {"estimation": jnp.ones((2, 5, 4), dtype=jnp.complex128)}
    probe = ip.scan_probe(state)
    assert probe is not None and probe.shape == ()
    assert iss.scan_probe(state) is None


def test_weighted_covariance_planes_stack_matches_components(rng):
    from audio_source_separation_tpu.ops.ip_components import (
        pair_products_planes,
        weighted_covariance_components,
        weighted_covariance_planes_stack,
    )

    X = rng.randn(2, 17, 12) + 1j * rng.randn(2, 17, 12)
    planes = pair_products_planes(X)
    w = np.abs(rng.randn(2, 12)) + 0.1
    comp = weighted_covariance_components(planes, 1.0 / w)
    stack = np.asarray(weighted_covariance_planes_stack(planes, 1.0 / w))
    for n in range(2):
        for c in range(2):
            for d in range(2):
                np.testing.assert_allclose(
                    stack[n, c, d], np.asarray(comp[n][c][d]), atol=1e-12
                )


def test_cholesky_quadratic_components_f32_nonnegative(rng):
    """The direct quadratic form w^H U w catastrophically cancels in float32
    (tILRMA nu=1 weights: O(1e8) terms cancel to O(1) — observed NaN at
    iteration ~70 on the quality fixture); the Cholesky sum-of-squares form
    must stay non-negative and match float64 on well-conditioned input."""
    import jax.numpy as jnp

    from audio_source_separation_tpu.ops.ip_components import (
        cholesky_quadratic_components,
    )

    F = 64
    a = (rng.randn(2, F) + 1j * rng.randn(2, F)).astype(np.complex64) * 1e4
    U = [
        [
            (a[c] * a[d].conj() + (1.0 if c == d else 0.0)).astype(np.complex64)
            for d in range(2)
        ]
        for c in range(2)
    ]
    # w ⊥ a: the true value is the tiny |w|²·jitter, buried under the
    # O(1e8) products — the direct sum goes NEGATIVE on ~half the bins here
    w = [np.conj(a[1]), -np.conj(a[0])]
    w = [(x / np.abs(a).max()).astype(np.complex64) for x in w]

    direct = sum(
        (np.conj(w[c]) * sum(U[c][d] * w[d] for d in range(2))).real
        for c in range(2)
    )
    assert (direct < 0).any(), "fixture no longer exercises the cancellation"

    chol = np.asarray(
        cholesky_quadratic_components(
            [[jnp.asarray(U[c][d]) for d in range(2)] for c in range(2)],
            [jnp.asarray(x) for x in w],
        )
    )
    assert (chol >= 0).all()

    # well-conditioned float64: must agree with the direct form to fp precision
    B = rng.randn(3, 3, F) + 1j * rng.randn(3, 3, F)
    U3 = [
        [
            sum(B[k][c] * B[k][d].conj() for k in range(3)) + (0.5 if c == d else 0)
            for d in range(3)
        ]
        for c in range(3)
    ]
    w3 = [rng.randn(F) + 1j * rng.randn(F) for _ in range(3)]
    expected = sum(
        (np.conj(w3[c]) * sum(U3[c][d] * w3[d] for d in range(3))).real
        for c in range(3)
    )
    got = np.asarray(
        cholesky_quadratic_components(
            [[jnp.asarray(U3[c][d]) for d in range(3)] for c in range(3)],
            [jnp.asarray(x) for x in w3],
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_psd_quadratic_form_matches_direct(rng):
    import jax.numpy as jnp

    from audio_source_separation_tpu.ops.ip import psd_quadratic_form

    U = random_psd(rng, 16, n=3)
    w = rng.randn(16, 3) + 1j * rng.randn(16, 3)
    expected = np.einsum("fc,fcd,fd->f", w.conj(), U, w).real
    got = np.asarray(psd_quadratic_form(jnp.asarray(U), jnp.asarray(w)))
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_quadratic_power_planes_matches_direct(rng):
    """Power-only scan primitive: |W X|² as an all-real quadratic form over
    the compact pair-product planes (ops/ip_components.py, round 4)."""
    import jax.numpy as jnp

    from audio_source_separation_tpu.ops.ip_components import (
        pair_products_planes,
        quadratic_power_planes,
    )

    for C in (2, 3, 4):
        X = rng.randn(C, 17, 12) + 1j * rng.randn(C, 17, 12)
        W = rng.randn(17, C, C) + 1j * rng.randn(17, C, C)
        planes = pair_products_planes(jnp.asarray(X))
        expected = np.abs(np.einsum("fnc,cft->nft", W, X)) ** 2
        got = np.asarray(quadratic_power_planes(jnp.asarray(W), planes))
        np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-10)


def test_frame_power_sums_matches_direct(rng):
    import jax.numpy as jnp

    from audio_source_separation_tpu.ops.ip_components import (
        frame_power_sums,
        pair_products_planes,
    )

    for C in (2, 3):
        X = rng.randn(C, 17, 12) + 1j * rng.randn(C, 17, 12)
        W = rng.randn(17, C, C) + 1j * rng.randn(17, C, C)
        planes = pair_products_planes(jnp.asarray(X))
        rows = [
            [jnp.asarray(W[:, n, c]) for c in range(C)] for n in range(C)
        ]
        Y = np.einsum("fnc,cft->nft", W, X)
        expected = np.sum(np.abs(Y) ** 2, axis=1)  # (N, T)
        got = np.asarray(frame_power_sums(rows, planes))
        np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_gram_components_matches_direct(rng):
    import jax.numpy as jnp

    from audio_source_separation_tpu.ops.ip_components import (
        gram_components,
        pair_products_planes,
    )

    for C in (2, 3):
        X = rng.randn(C, 9, 21) + 1j * rng.randn(C, 9, 21)
        G = gram_components(pair_products_planes(jnp.asarray(X)))
        for c in range(C):
            for d in range(C):
                expected = np.sum(X[c] * X[d].conj(), axis=-1)  # (F,)
                np.testing.assert_allclose(
                    np.asarray(G[c][d]), expected, rtol=1e-10
                )


def test_projection_back_components_matches_projection_back(rng):
    """The O(F) Gram restatement must reproduce the (F, T)-reduction
    projection_back exactly (same ridge convention)."""
    import jax.numpy as jnp

    from audio_source_separation_tpu.algorithm.projection_back import (
        projection_back,
    )
    from audio_source_separation_tpu.ops.ip_components import (
        gram_components,
        pair_products_planes,
        projection_back_components,
    )

    for C in (2, 3):
        X = rng.randn(C, 9, 31) + 1j * rng.randn(C, 9, 31)
        W = rng.randn(9, C, C) + 1j * rng.randn(9, C, C)
        Y = np.einsum("fnc,cft->nft", W, X)
        expected = np.asarray(
            projection_back(jnp.asarray(Y), reference=jnp.asarray(X[0]))
        )  # (N, F)
        planes = pair_products_planes(jnp.asarray(X))
        rows = [
            [jnp.asarray(W[:, n, c]) for c in range(C)] for n in range(C)
        ]
        got = np.stack(
            [
                np.asarray(s)
                for s in projection_back_components(
                    rows, gram_components(planes), reference_id=0
                )
            ]
        )
        np.testing.assert_allclose(got, expected, rtol=1e-8, atol=1e-10)


def test_compact_hermitian_roundtrip_and_closed_forms(rng):
    """Compact Hermitian planes (n² real planes) round-trip and det/inv/
    sandwich closed forms vs dense NumPy, n ∈ {1, 2, 3}."""
    import jax.numpy as jnp
    from audio_source_separation_tpu.ops.fast_linalg import (
        hermitian_compact_from_planes,
        expand_hermitian_compact,
        det_hermitian_compact,
        inv_hermitian_compact,
        sandwich_hermitian_compact,
        expand_hermitian_compact_trailing,
    )

    for n in (1, 2, 3):
        F, T = 5, 7
        A = random_psd(rng, F, T, n=n)  # (F, T, n, n)
        planes = jnp.asarray(np.moveaxis(A, (-2, -1), (0, 1)))  # (n, n, F, T)
        compact = hermitian_compact_from_planes(planes)  # (n², F, T)
        assert compact.shape == (n * n, F, T)
        assert not np.iscomplexobj(np.asarray(compact))
        back = np.moveaxis(np.asarray(expand_hermitian_compact(compact)), (0, 1), (-2, -1))
        np.testing.assert_allclose(back, A, atol=1e-12)

        det = np.asarray(det_hermitian_compact(compact))
        np.testing.assert_allclose(det, np.linalg.det(A).real, rtol=1e-10)

        ridge = 0.37
        det_r = np.asarray(det_hermitian_compact(compact, ridge=ridge))
        np.testing.assert_allclose(
            det_r, np.linalg.det(A + ridge * np.eye(n)).real, rtol=1e-10
        )

        inv_c = inv_hermitian_compact(compact, ridge=ridge)
        inv = np.moveaxis(
            np.asarray(expand_hermitian_compact(inv_c)), (0, 1), (-2, -1)
        )
        np.testing.assert_allclose(
            inv, np.linalg.inv(A + ridge * np.eye(n)), rtol=1e-8, atol=1e-10
        )

        X = random_psd(rng, F, T, n=n)
        x_compact = hermitian_compact_from_planes(
            jnp.asarray(np.moveaxis(X, (-2, -1), (0, 1)))
        )
        sand = sandwich_hermitian_compact(inv_c, x_compact)
        sand_dense = np.moveaxis(
            np.asarray(expand_hermitian_compact(sand)), (0, 1), (-2, -1)
        )
        np.testing.assert_allclose(
            sand_dense, inv @ X @ inv, rtol=1e-8, atol=1e-10
        )

        # trailing expansion of a frame-contracted compact field
        small = np.asarray(compact).sum(-1)  # (n², F)
        dense_small = np.asarray(
            expand_hermitian_compact_trailing(jnp.asarray(small.T), n)
        )  # (F, n, n)
        np.testing.assert_allclose(dense_small, A.sum(1), atol=1e-12)


def test_power_hermitian_compact_matches_matrix_power(rng):
    """The compact-planes 2×2 fractional power (round 5, the Sawada planes
    Riccati building block) matches ``hermitian_matrix_power`` entrywise,
    including the eps eigenvalue clip for negative powers."""
    import jax.numpy as jnp
    from audio_source_separation_tpu.algorithm.linalg import (
        hermitian_matrix_power,
    )
    from audio_source_separation_tpu.ops.fast_linalg import (
        expand_hermitian_compact,
        hermitian_compact_from_planes,
        power_hermitian_compact,
    )

    F, T = 5, 7
    A = random_psd(rng, F, T, n=2)
    compact = hermitian_compact_from_planes(
        jnp.asarray(np.moveaxis(A, (-2, -1), (0, 1)))
    )
    for power, eps in ((0.5, 0.0), (-0.5, 1e-12), (2.0, 0.0), (-1.0, 1e-9)):
        got = np.moveaxis(
            np.asarray(
                expand_hermitian_compact(
                    power_hermitian_compact(compact, power, eps=eps)
                )
            ),
            (0, 1),
            (-2, -1),
        )
        want = np.asarray(hermitian_matrix_power(jnp.asarray(A), power, eps=eps))
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
    # scale invariance across ~30 decades (the f32 dynamic-range requirement)
    for scale in (1e-20, 1e12):
        got = np.asarray(power_hermitian_compact(compact * scale, 0.5))
        np.testing.assert_allclose(
            got, np.asarray(power_hermitian_compact(compact, 0.5)) * scale**0.5,
            rtol=1e-8,
        )


def test_solve_riccati_hermitian_compact_matches_matrix(rng):
    """The planes Riccati (Sawada spatial update dual) solves H A H = B and
    matches the matrix closed form."""
    import jax.numpy as jnp
    from audio_source_separation_tpu.ops.fast_linalg import (
        expand_hermitian_compact,
        hermitian_compact_from_planes,
        solve_riccati_hermitian_compact,
    )

    F, T = 4, 6
    A = random_psd(rng, F, T, n=2)
    B = random_psd(rng, F, T, n=2)
    to_compact = lambda M: hermitian_compact_from_planes(  # noqa: E731
        jnp.asarray(np.moveaxis(M, (-2, -1), (0, 1)))
    )
    H_p = solve_riccati_hermitian_compact(to_compact(A), to_compact(B))
    H = np.moveaxis(
        np.asarray(expand_hermitian_compact(H_p)), (0, 1), (-2, -1)
    )
    np.testing.assert_allclose(H, np.swapaxes(H, -2, -1).conj(), atol=1e-10)
    np.testing.assert_allclose(H @ A @ H, B, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(
        H, np.asarray(solve_riccati(jnp.asarray(A), jnp.asarray(B))),
        rtol=1e-7, atol=1e-9,
    )


def test_blockwise_inv_matches_lu(rng):
    """The 2×2-block Schur closed-form inverse (Ikeshita fixed-point G
    systems) matches jnp.linalg.inv for even n with n/2 ≤ 3 and falls back
    cleanly outside the closed forms."""
    import jax.numpy as jnp
    from audio_source_separation_tpu.ops.fast_linalg import blockwise_inv

    for n in (2, 4, 6, 5, 8):
        A = rng.randn(7, n, n) + 1j * rng.randn(7, n, n)
        A = A @ np.swapaxes(A, -2, -1).conj() + n * np.eye(n)  # PD
        inv = np.asarray(blockwise_inv(jnp.asarray(A)))
        np.testing.assert_allclose(
            inv @ A, np.broadcast_to(np.eye(n), A.shape), atol=1e-9
        )
