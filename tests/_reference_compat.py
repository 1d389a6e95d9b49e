"""Shared helpers for importing the read-only NumPy reference.

Single home for the NumPy-1.x ``linalg.solve`` shim (the CLAUDE.md gotcha:
the reference calls ``solve(A (F,C,C), b (F,C))`` with stacked-vector
semantics that NumPy >= 2 no longer accepts) — used by
``tests/test_reference_parity.py``, ``tests/test_sample_song.py`` and
``benchmarks/quality.py`` so reference-semantics fixes land in one place.
"""

import contextlib
import importlib
import sys

import numpy as np

REFERENCE_SRC = "/root/reference/src"


@contextlib.contextmanager
def legacy_solve_shim(reference_src=REFERENCE_SRC):
    """Context with ``np.linalg.solve`` accepting NumPy-1.x stacked-vector
    RHS and ``reference_src`` on ``sys.path``; both restored on exit."""
    original_solve = np.linalg.solve

    def legacy_solve(a, b):
        a, b = np.asarray(a), np.asarray(b)
        if (
            b.ndim == a.ndim - 1
            and a.shape[:-2] == b.shape[:-1]
            and a.shape[-1] == b.shape[-1]
        ):
            return original_solve(a, b[..., None])[..., 0]
        return original_solve(a, b)

    sys.path.insert(0, reference_src)
    np.linalg.solve = legacy_solve
    try:
        yield
    finally:
        np.linalg.solve = original_solve
        try:
            sys.path.remove(reference_src)
        except (ValueError, AttributeError, TypeError):
            # interpreter shutdown: sys.path may already be torn down when a
            # deliberately-never-exited shim is finalized at exit
            pass


class reference_bss:
    """``with reference_bss("iva") as ref_iva:`` — import a reference
    ``bss.<module>`` with the legacy-solve shim active for the block."""

    def __init__(self, module):
        self.module = module
        self._cm = None

    def __enter__(self):
        self._cm = legacy_solve_shim()
        self._cm.__enter__()
        return importlib.import_module("bss." + self.module)

    def __exit__(self, *exc):
        return self._cm.__exit__(*exc)
