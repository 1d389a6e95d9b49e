"""Frequency-permutation alignment for FDICA.

Parity target: reference ``src/bss/fdica.py:106-138`` — greedy bin-by-bin
alignment: normalize per-bin amplitude envelopes, order bins by their total
correlation score (ascending), then for each bin brute-force all ``S!`` source
permutations against the accumulated criterion envelope.

This is an inherently sequential host-side algorithm (O(F·S!) with a
data-dependent accumulation); it runs once after the solver loop, on NumPy —
the per-bin correlation scores that feed it are computed on device.
"""

import itertools

import numpy as np

EPS = 1e-12


def solve_permutation(W, Y, eps=EPS):
    """Align per-bin source permutations.

    Args:
        W: demixing filters ``(n_bins, n_sources, n_channels)`` (NumPy).
        Y: current estimates ``(n_sources, n_bins, n_frames)`` (NumPy).
    Returns:
        permutation-aligned ``W`` (NumPy copy).

    The sequential greedy core runs in native C when the toolchain is
    available (``native/permutation.c`` via
    :mod:`audio_source_separation_tpu.native`), with this NumPy
    implementation as the fallback; both produce identical permutations.
    """
    W = np.array(W)
    Y = np.asarray(Y)
    n_sources, n_bins, _ = Y.shape

    P = np.abs(Y).transpose(1, 0, 2)  # (n_bins, n_sources, n_frames)
    norm = np.sqrt(np.sum(P**2, axis=1, keepdims=True))
    norm[norm < eps] = eps
    P = P / norm
    correlation = np.sum(P @ P.transpose(0, 2, 1), axis=(1, 2))  # (n_bins,)
    indices = np.argsort(correlation)

    from ..native import solve_permutation_native

    perms = solve_permutation_native(P, indices)
    if perms is not None:
        for f in range(n_bins):
            W[f, :, :] = W[f, perms[f], :]
        return W

    permutations = list(itertools.permutations(range(n_sources)))
    min_idx = indices[0]
    P_criteria = P[min_idx]  # (n_sources, n_frames)

    for idx in range(1, n_bins):
        min_idx = indices[idx]
        P_max = None
        perm_max = None
        for perm in permutations:
            P_perm = np.sum(P_criteria * P[min_idx, perm, :])
            if P_max is None or P_perm > P_max:
                P_max = P_perm
                perm_max = perm
        P_criteria = P_criteria + P[min_idx, perm_max, :]
        W[min_idx, :, :] = W[min_idx, perm_max, :]

    return W
