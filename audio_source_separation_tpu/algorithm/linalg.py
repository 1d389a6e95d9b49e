"""Algebraic Riccati solve and Hermitian matrix functions.

Parity target: reference ``src/algorithm/linalg.py:7-31`` solves
``H A H = B`` via a general complex eigendecomposition of the 2M×2M block
matrix ``[[0, -A], [-B, 0]]`` — general complex ``eig`` is **not TPU-native**.
In every reference call site (Sawada MNMF spatial update ``bss/mnmf.py:467``,
``algorithm/nmf.py:800``) ``A`` and ``B`` are Hermitian PSD, for which the
Riccati equation has the classical closed form

    H = A^{-1/2} (A^{1/2} B A^{1/2})^{1/2} A^{-1/2}

computable entirely with batched ``eigh`` (TPU-supported).  Verified against
the reference's eig-based construction in ``tests/test_linalg.py``.
"""

import jax.numpy as jnp

EPS = 1e-12


def hermitian_matrix_power(X, power, eps=0.0):
    """Batched Hermitian fractional matrix power via ``eigh``.

    Eigenvalues are clipped at ``eps`` (for negative powers, pass a positive
    ``eps`` to regularize near-singular inputs).
    """
    w, v = jnp.linalg.eigh(X)
    w = jnp.maximum(w, eps)
    pw = jnp.where(w > 0, w, 1.0) ** power
    pw = jnp.where(w > 0, pw, 0.0)
    return (v * pw[..., None, :]) @ jnp.swapaxes(v, -2, -1).conj()


def sqrtm_hermitian(X, eps=0.0):
    return hermitian_matrix_power(X, 0.5, eps=eps)


def invsqrtm_hermitian(X, eps=EPS):
    return hermitian_matrix_power(X, -0.5, eps=eps)


def solve_riccati(A, B, eps=EPS):
    """Solve ``H A H = B`` for Hermitian PSD ``A``, ``B`` (batched).

    Returns the Hermitian PSD solution ``H`` — the same branch the reference's
    eigenvector-sorting construction selects (``algorithm/linalg.py:7-31``).
    """
    A_sqrt = sqrtm_hermitian(A, eps=0.0)
    A_invsqrt = invsqrtm_hermitian(A, eps=eps)
    M = A_sqrt @ B @ A_sqrt
    M = (M + jnp.swapaxes(M, -2, -1).conj()) / 2
    M_sqrt = sqrtm_hermitian(M, eps=0.0)
    H = A_invsqrt @ M_sqrt @ A_invsqrt
    return (H + jnp.swapaxes(H, -2, -1).conj()) / 2
