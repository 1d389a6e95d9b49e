"""Complex↔real-pair marshalling at jit boundaries.

TPU rationale: XLA:TPU supports complex math *inside* a compiled program, but
complex buffers at the host↔device boundary (transfers, executable I/O) are
not supported by the TPU runtime used here.  Every jitted entry point in this
framework therefore takes/returns **real** arrays only: complex leaves are
carried as :class:`Pair` pytree nodes (two real arrays), reconstructed with
``re + 1j·im`` on the first instruction inside the program and split back on
the last.  XLA internally represents complex values as (re, im) pairs anyway,
so this costs nothing after fusion; it only pins the representation at the
ABI.

This module is the single place that knows about the convention:

  * :class:`Pair` — registered pytree node holding ``re``/``im``;
  * :func:`pack` / :func:`unpack` — tree-wide complex ⇄ Pair conversion
    (work both on host values and on tracers inside jit);
  * :func:`to_host` — device → host NumPy (Pairs become complex ndarrays);
  * :func:`realify` — wrap a complex-pytree function into a real-boundary
    function suitable for ``jax.jit`` on TPU;
  * :func:`jit_complex` — convenience: jitted real-boundary callable that
    accepts/returns host complex values.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class Pair:
    """A complex array carried as two real arrays (pytree node)."""

    __slots__ = ("re", "im")

    def __init__(self, re, im):
        self.re = re
        self.im = im

    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.re.shape

    def __repr__(self):
        return "Pair(shape={}, dtype={})".format(
            getattr(self.re, "shape", "?"), getattr(self.re, "dtype", "?")
        )


def _is_pair(x):
    return isinstance(x, Pair)


def pack(tree):
    """Replace every complex leaf with a ``Pair(re, im)`` node."""

    def pack_leaf(v):
        if isinstance(v, Pair):
            return v
        if np.iscomplexobj(v):
            if isinstance(v, np.ndarray) or np.isscalar(v):
                v = np.asarray(v)
                return Pair(jnp.asarray(v.real.copy()), jnp.asarray(v.imag.copy()))
            return Pair(v.real, v.imag)
        return v

    return jax.tree.map(pack_leaf, tree, is_leaf=_is_pair)


def unpack(tree):
    """Reconstruct complex leaves from ``Pair`` nodes."""

    def unpack_leaf(v):
        if isinstance(v, Pair):
            return jax.lax.complex(v.re, v.im)
        return v

    return jax.tree.map(unpack_leaf, tree, is_leaf=_is_pair)


def to_host(tree):
    """Fetch a (possibly packed) pytree to host NumPy; Pairs → complex."""

    def fetch(v):
        if isinstance(v, Pair):
            return np.asarray(jax.device_get(v.re)) + 1j * np.asarray(
                jax.device_get(v.im)
            )
        if isinstance(v, jnp.ndarray):
            return np.asarray(jax.device_get(v))
        return v

    return jax.tree.map(fetch, tree, is_leaf=_is_pair)


def realify(fn):
    """Wrap ``fn`` (complex pytrees → complex pytrees) into a function with a
    real-only array boundary (Pairs outside, complex inside)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        args = unpack(args)
        kwargs = unpack(kwargs)
        return pack(fn(*args, **kwargs))

    return wrapped


def jit_complex(fn, **jit_kwargs):
    """Jit ``fn`` with the real boundary; call with host/NumPy complex values,
    receive host NumPy complex values."""
    jitted = jax.jit(realify(fn), **jit_kwargs)

    @functools.wraps(fn)
    def call(*args, **kwargs):
        out = jitted(*pack(args), **pack(kwargs))
        return to_host(out)

    return call
