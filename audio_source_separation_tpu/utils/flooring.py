"""Numerical-guard helpers.

The reference guards numerics by in-place flooring (``R[R < eps] = eps``,
e.g. ``bss/iva.py:497``) and PSD identity ridges (``bss/mnmf.py:386``).  Under
``jit`` those become pure ``jnp`` ops; these helpers centralize the semantics
so every solver floors identically.
"""

import jax.numpy as jnp

EPS = 1e-12
THRESHOLD = 1e12


def floor_below(x, eps=EPS):
    """``x`` with entries below ``eps`` replaced by ``eps`` (pure version of
    the reference's in-place ``x[x < eps] = eps``)."""
    return jnp.maximum(x, eps)


def identity_ridge(X, eps=EPS):
    """Add ``eps * I`` to the trailing matrix axes (pre-inverse ridge)."""
    n = X.shape[-1]
    return X + eps * jnp.eye(n, dtype=X.dtype)
