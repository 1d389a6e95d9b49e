"""Closed-form 2×2 eigendecompositions for IP2 / pairwise spatial updates.

The reference's IP2 update (``bss/iva.py:578-588``, ``bss/ilrma.py:566-633``)
calls general complex ``np.linalg.eig`` on the 2×2 matrices
``V_n^{-1} V_m`` — general complex ``eig`` is not TPU-native, but a 2×2
eigenproblem has a closed form (characteristic polynomial + one sqrt), which
is both exact and dramatically cheaper than LAPACK dispatch.
"""

import jax.numpy as jnp


def eig2x2(A):
    """Closed-form eigendecomposition of batched 2×2 (complex) matrices.

    Returns ``(eigvals (..., 2), eigvecs (..., 2, 2))`` with eigenvectors in
    columns (``np.linalg.eig`` convention), unnormalized-then-normalized to
    unit length.  Eigenvalue order: descending by real part (the order IP2
    consumes after its ``argsort``/``parallel_sort`` step).
    """
    a = A[..., 0, 0]
    b = A[..., 0, 1]
    c = A[..., 1, 0]
    d = A[..., 1, 1]
    tr = a + d
    det = a * d - b * c
    disc = jnp.sqrt(tr * tr - 4 * det + 0j)
    lam1 = (tr + disc) / 2  # larger real part (principal sqrt has Re >= 0)
    lam2 = (tr - disc) / 2

    def eigvec(lam):
        # (A - lam I) v = 0:  v = [b, lam - a] unless that row degenerates,
        # then v = [lam - d, c]; for diagonal A fall back to basis vectors.
        use_row1 = jnp.abs(b) + jnp.abs(lam - a) > jnp.abs(c) + jnp.abs(lam - d)
        v0 = jnp.where(use_row1, b, lam - d)
        v1 = jnp.where(use_row1, lam - a, c)
        degenerate = (jnp.abs(v0) + jnp.abs(v1)) == 0
        near_a = jnp.abs(lam - a) <= jnp.abs(lam - d)
        v0 = jnp.where(degenerate, jnp.where(near_a, 1.0 + 0j, 0j), v0)
        v1 = jnp.where(degenerate, jnp.where(near_a, 0j, 1.0 + 0j), v1)
        norm = jnp.sqrt(jnp.abs(v0) ** 2 + jnp.abs(v1) ** 2)
        return jnp.stack([v0 / norm, v1 / norm], axis=-1)

    v1 = eigvec(lam1)
    v2 = eigvec(lam2)
    eigvals = jnp.stack([lam1, lam2], axis=-1)
    eigvecs = jnp.stack([v1, v2], axis=-1)  # columns
    return eigvals, eigvecs


def eig2x2_planes(a, b, c, d):
    """Planes-layout :func:`eig2x2`: the four 2×2 entries arrive as separate
    ``(...,)`` arrays (bins in the tile, no ``(F, 2, 2)`` materialization).
    Same formulas and degenerate handling; returns
    ``((lam1, lam2), (v1, v2))`` with each eigenvector a pair of planes."""
    tr = a + d
    det = a * d - b * c
    disc = jnp.sqrt(tr * tr - 4 * det + 0j)
    lam1 = (tr + disc) / 2
    lam2 = (tr - disc) / 2

    def eigvec(lam):
        use_row1 = jnp.abs(b) + jnp.abs(lam - a) > jnp.abs(c) + jnp.abs(lam - d)
        v0 = jnp.where(use_row1, b, lam - d)
        v1 = jnp.where(use_row1, lam - a, c)
        degenerate = (jnp.abs(v0) + jnp.abs(v1)) == 0
        near_a = jnp.abs(lam - a) <= jnp.abs(lam - d)
        v0 = jnp.where(degenerate, jnp.where(near_a, 1.0 + 0j, 0j), v0)
        v1 = jnp.where(degenerate, jnp.where(near_a, 0j, 1.0 + 0j), v1)
        norm = jnp.sqrt(jnp.abs(v0) ** 2 + jnp.abs(v1) ** 2)
        return (v0 / norm, v1 / norm)

    return (lam1, lam2), (eigvec(lam1), eigvec(lam2))


def generalized_eig2x2_descending_planes(Vm, Vn):
    """Planes-layout :func:`generalized_eig2x2_descending`: ``Vm``/``Vn`` are
    nested lists ``[a][b]`` of ``(...,)`` planes.  Returns
    ``(v_max, v_min)`` as pairs of planes."""
    det = Vn[0][0] * Vn[1][1] - Vn[0][1] * Vn[1][0]
    inv = [
        [Vn[1][1] / det, -Vn[0][1] / det],
        [-Vn[1][0] / det, Vn[0][0] / det],
    ]
    VV = [
        [
            inv[i][0] * Vm[0][j] + inv[i][1] * Vm[1][j]
            for j in range(2)
        ]
        for i in range(2)
    ]
    _, (v1, v2) = eig2x2_planes(VV[0][0], VV[0][1], VV[1][0], VV[1][1])
    return v1, v2


def generalized_eig2x2_descending(Vm, Vn):
    """Eigenvectors of ``V_n^{-1} V_m`` for batched 2×2 Hermitian pairs,
    ordered by descending eigenvalue (real part).

    Returns ``(v_max (..., 2), v_min (..., 2))`` — the rows the reference
    obtains via ``np.linalg.eig`` + ``parallel_sort`` (``bss/iva.py:578-584``).
    """
    det = Vn[..., 0, 0] * Vn[..., 1, 1] - Vn[..., 0, 1] * Vn[..., 1, 0]
    inv = (
        jnp.stack(
            [
                jnp.stack([Vn[..., 1, 1], -Vn[..., 0, 1]], axis=-1),
                jnp.stack([-Vn[..., 1, 0], Vn[..., 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        / det[..., None, None]
    )
    VV = inv @ Vm
    _, vecs = eig2x2(VV)
    return vecs[..., :, 0], vecs[..., :, 1]
