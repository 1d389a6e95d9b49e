"""Batched linear-algebra helpers.

TPU-native equivalents of the reference's ``src/utils/utils_linalg.py:5-53``
(``to_Hermite`` / ``to_PSD`` / ``parallel_sort``).  All functions are pure,
jit-safe, and batched over arbitrary leading axes.
"""

import jax.numpy as jnp

EPS = 1e-12


def to_hermite(X, axis1=-2, axis2=-1):
    """Hermitian-symmetrize the trailing matrix axes.

    Parity target: reference ``utils/utils_linalg.py:5-7``.
    """
    return (X + jnp.swapaxes(X, axis1, axis2).conj()) / 2


def to_psd(X, eps=EPS):
    """Project batched matrices onto the PSD cone (trailing two axes).

    Hermitian-symmetrize, shift by the most negative eigenvalue (if any), and
    add an ``eps * trace`` identity ridge — same semantics as the reference's
    ``utils/utils_linalg.py:9-31`` (a hot helper in MNMF/IPSDTA/PSDTF).

    Eigenvalues come from the closed forms in ``ops/fast_linalg`` for n ≤ 3
    (the C×C / block-size cases — no iterative eigensolver on TPU),
    ``eigvalsh`` otherwise.
    """
    from ..ops.fast_linalg import batched_eigvalsh

    n = X.shape[-1]
    if jnp.iscomplexobj(X):
        X = (X + jnp.swapaxes(X, -2, -1).conj()) / 2
    else:
        X = (X + jnp.swapaxes(X, -2, -1)) / 2

    eigvals = batched_eigvalsh(X)
    delta = jnp.minimum(jnp.min(eigvals, axis=-1), 0)
    trace = jnp.trace(X, axis1=-2, axis2=-1).real
    eye = jnp.eye(n, dtype=X.dtype)
    shift = (eps * trace - delta)[..., None, None] * eye
    return X + shift


def parallel_sort(x, order, axis=-2):
    """Reorder slices of ``x`` along ``axis`` by per-batch index arrays.

    ``order`` has shape ``x.shape[:axis] + (k,)``; the result replaces
    ``x.shape[axis]`` with ``k``.  This is the batched-gather the reference
    implements with a flatten-and-offset trick (``utils/utils_linalg.py:33-53``,
    used by IP2 eigenvector ordering and the Riccati solver); on TPU it is a
    single ``take_along_axis``.
    """
    axis = axis % x.ndim
    order_expanded = order.reshape(order.shape + (1,) * (x.ndim - axis - 1))
    order_expanded = jnp.broadcast_to(
        order_expanded, order.shape + x.shape[axis + 1 :]
    )
    return jnp.take_along_axis(x, order_expanded, axis=axis)


def eye_like_filter(n_bins, n_sources, n_channels, dtype=jnp.complex64):
    """Identity-initialized demixing filter ``(n_bins, n_sources, n_channels)``.

    Matches the reference init convention (``bss/iva.py:53-55``).
    """
    W = jnp.eye(n_sources, n_channels, dtype=dtype)
    return jnp.tile(W, (n_bins, 1, 1))


def hermitian_outer(X):
    """Batched outer products ``x x^H`` along a trailing vector axis.

    ``X (..., C)`` → ``(..., C, C)``.
    """
    return X[..., :, None] * X[..., None, :].conj()


def quadratic_form(w, U):
    """Batched real quadratic form ``w^H U w`` for ``w (..., C)``, ``U (..., C, C)``."""
    return jnp.einsum("...c,...cd,...d->...", w.conj(), U, w).real
