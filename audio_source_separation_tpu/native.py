"""Native (C) host-runtime components, loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; the host-side runtime pieces that are
inherently sequential — currently the FDICA frequency-permutation solver
(O(n_bins · n_sources!) greedy with a data-dependent accumulator,
``bss/fdica.py:106-138``) — have native C implementations under ``native/``,
compiled on first use with the system compiler and cached.  Everything has a
NumPy fallback, so the framework works without a toolchain.
"""

import ctypes
import os
import subprocess
import sysconfig

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_CACHE = {}


def _build_library(name):
    src = os.path.join(_NATIVE_DIR, name + ".c")
    if not os.path.exists(src):
        return None
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_NATIVE_DIR, "_" + name + suffix)
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        cc = os.environ.get("CC", "cc")
        cmd = [cc, "-O3", "-shared", "-fPIC", src, "-o", out]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            return None
    try:
        return ctypes.CDLL(out)
    except OSError:
        return None


def load(name):
    """Load (building if needed) a native library; None if unavailable."""
    if name not in _CACHE:
        _CACHE[name] = _build_library(name)
    return _CACHE[name]


def solve_permutation_native(P, order):
    """Native greedy permutation alignment.

    Args:
        P: normalized envelopes ``(n_bins, n_sources, n_frames)`` float64.
        order: bin processing order ``(n_bins,)`` int64.
    Returns:
        per-bin source permutations ``(n_bins, n_sources)`` int64, or None if
        the native library is unavailable or n_sources > 8.
    """
    lib = load("permutation")
    if lib is None:
        return None
    n_bins, n_sources, n_frames = P.shape
    if n_sources > 8:
        return None
    P = np.ascontiguousarray(P, dtype=np.float64)
    order = np.ascontiguousarray(order, dtype=np.int64)
    # output buffer: perms (n_bins, n_sources) int64 followed by a float64
    # criterion scratch (n_sources, n_frames) — see permutation.c
    scratch_longs = (n_sources * n_frames * 8 + 7) // 8
    out = np.zeros(n_bins * n_sources + scratch_longs, dtype=np.int64)
    fn = lib.solve_permutation
    fn.restype = ctypes.c_int
    status = fn(
        P.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        ctypes.c_long(n_bins),
        ctypes.c_long(n_sources),
        ctypes.c_long(n_frames),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    if status != 0:
        return None
    return out[: n_bins * n_sources].reshape(n_bins, n_sources).copy()
