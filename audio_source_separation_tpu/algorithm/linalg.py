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


def _power_2x2(X, power, eps=0.0):
    """Closed-form Hermitian 2×2 spectral power.

    For Hermitian M with eigenvalues λ₁ ≥ λ₂ and f applied spectrally,
    ``f(M) = a·M + b·I`` with the divided differences
    ``a = (f₁ − f₂)/(λ₁ − λ₂)``, ``b = (f₂λ₁ − f₁λ₂)/(λ₁ − λ₂)``
    (degenerate spectrum ⇒ M = λI ⇒ f(M) = f(λ)·I).  No ``eigh``: the TPU
    QDWH eigensolver can kernel-fault on hard batched 2×2 inputs (observed
    on hardware inside the Sawada MNMF Riccati chain), and the closed form
    is an order of magnitude faster anyway.
    """
    # scale-invariant evaluation: real covariance chains reach ~1e30-entry
    # matrices at float32 (Riccati M = A^{1/2}BA^{1/2} on near-silent
    # frames), where det = λ₁λ₂ overflows to inf and the divided
    # differences NaN.  Factor out a spectral-radius bound s (exact
    # algebra: f(M) = f(s·(M/s)) with the clip carried as eps/s).
    s = (
        jnp.abs(X[..., 0, 0].real)
        + jnp.abs(X[..., 1, 1].real)
        + 2 * jnp.abs(X[..., 0, 1])
    ) / 2
    s = jnp.maximum(s, jnp.finfo(s.dtype).tiny)
    Xn = X / s[..., None, None].astype(X.dtype)
    tr = Xn[..., 0, 0].real + Xn[..., 1, 1].real
    det = (Xn[..., 0, 0] * Xn[..., 1, 1] - Xn[..., 0, 1] * Xn[..., 1, 0]).real
    mean = tr / 2
    rad = jnp.sqrt(jnp.maximum(mean**2 - det, 0.0))
    l1, l2 = mean + rad, mean - rad  # eigenvalues of X / s, O(1)

    def f(w):
        w = jnp.maximum(w, eps / s)
        pw = jnp.where(w > 0, w, 1.0) ** power
        return jnp.where(w > 0, pw, 0.0)

    f1, f2 = f(l1), f(l2)
    gap = l1 - l2
    scale = jnp.maximum(jnp.maximum(jnp.abs(l1), jnp.abs(l2)), 1e-30)
    safe = gap > 1e-6 * scale
    gap_safe = jnp.where(safe, gap, 1.0)
    a = jnp.where(safe, (f1 - f2) / gap_safe, 0.0)
    b = jnp.where(safe, (f2 * l1 - f1 * l2) / gap_safe, f1)
    eye = jnp.eye(2, dtype=X.dtype)
    sp = s**power
    return sp[..., None, None].astype(X.dtype) * (
        a[..., None, None].astype(X.dtype) * Xn + b[..., None, None] * eye
    )


def hermitian_matrix_power(X, power, eps=0.0):
    """Batched Hermitian fractional matrix power — closed form for 2×2 (see
    :func:`_power_2x2`), ``eigh`` otherwise.

    Eigenvalues are clipped at ``eps`` (for negative powers, pass a positive
    ``eps`` to regularize near-singular inputs).
    """
    if X.shape[-1] == 2:
        return _power_2x2(X, power, eps=eps)
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
