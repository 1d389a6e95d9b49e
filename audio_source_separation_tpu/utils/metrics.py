"""Separation-quality metrics (SI-SDR, SDR, permutation-invariant pairing).

The reference has no metrics module — its de-facto quality metric is
``mir_eval.bss_eval_sources`` called from notebook callbacks
(``egs/bss-example/ilrma/test_gauss-ilrma.ipynb`` cells 66-72).  This module
productizes that: pure-jnp metrics usable on device, inside callbacks, or on
host NumPy arrays.

``bss_eval_sources`` here is the filter-invariant SDR/SIR/SAR triple in the
spirit of BSS Eval v3: the target projection allows a ``filter_length``-tap
FIR on each reference (mir_eval uses 512 taps), solved per source via a
least-squares Toeplitz system.
"""

import jax.numpy as jnp
import numpy as np


def si_sdr(estimate, target, eps=1e-12):
    """Scale-invariant SDR in dB (batched over leading axes; last axis time)."""
    estimate = jnp.asarray(estimate)
    target = jnp.asarray(target)
    alpha = jnp.sum(estimate * target, axis=-1, keepdims=True) / (
        jnp.sum(target**2, axis=-1, keepdims=True) + eps
    )
    projection = alpha * target
    noise = estimate - projection
    ratio = jnp.sum(projection**2, axis=-1) / (jnp.sum(noise**2, axis=-1) + eps)
    return 10 * jnp.log10(ratio + eps)


def pairwise_si_sdr(estimates, targets):
    """``(n_est, n_tgt)`` SI-SDR matrix."""
    return si_sdr(estimates[:, None, :], targets[None, :, :])


def _permutations(n):
    import itertools

    return list(itertools.permutations(range(n)))


def pit_si_sdr(estimates, targets):
    """Permutation-invariant mean SI-SDR and the best permutation.

    Returns ``(best_mean_si_sdr, best_permutation)`` — the host-side
    equivalent of the notebooks' eyeballed pairing.
    """
    matrix = np.asarray(pairwise_si_sdr(estimates, targets))
    n = matrix.shape[0]
    best, best_perm = -np.inf, None
    for perm in _permutations(n):
        value = np.mean([matrix[i, perm[i]] for i in range(n)])
        if value > best:
            best, best_perm = value, perm
    return float(best), best_perm


def si_sdr_improvement(estimates, mixture_ref, targets):
    """Mean PIT SI-SDR of the estimates minus that of the (repeated) mixture
    reference channel — the reference's per-iteration "SDR improvement"."""
    after, _ = pit_si_sdr(np.asarray(estimates), np.asarray(targets))
    mix = np.broadcast_to(
        np.asarray(mixture_ref)[None], np.asarray(targets).shape
    )
    before, _ = pit_si_sdr(mix, np.asarray(targets))
    return after - before


def _fir_project(estimate, target, filter_length):
    """Least-squares projection of ``estimate`` onto ``filter_length`` shifts
    of ``target`` (single pair, NumPy host math)."""
    n = len(estimate)
    # correlation matrix of target shifts (Toeplitz) and cross-correlations
    acorr = np.correlate(target, target, mode="full")[n - 1 : n - 1 + filter_length]
    G = np.empty((filter_length, filter_length))
    for i in range(filter_length):
        for j in range(filter_length):
            G[i, j] = acorr[abs(i - j)]
    d = np.array(
        [
            np.dot(estimate[i:], target[: n - i])
            for i in range(filter_length)
        ]
    )
    h = np.linalg.solve(G + 1e-10 * np.eye(filter_length), d)
    projection = np.zeros(n)
    for i in range(filter_length):
        projection[i:] += h[i] * target[: n - i]
    return projection


def bss_eval_sources(reference_sources, estimated_sources, filter_length=32):
    """Filter-invariant SDR / SIR / SAR with best-permutation selection.

    Args:
        reference_sources: ``(n_sources, n_samples)``.
        estimated_sources: ``(n_sources, n_samples)``.
        filter_length: allowed FIR distortion length (BSS Eval uses 512).
    Returns:
        ``(sdr, sir, sar, perm)`` NumPy arrays of shape ``(n_sources,)``.
    """
    refs = np.asarray(reference_sources, dtype=np.float64)
    ests = np.asarray(estimated_sources, dtype=np.float64)
    n_src = refs.shape[0]

    sdr_matrix = np.zeros((n_src, n_src))
    decomposition = {}
    for i in range(n_src):
        for j in range(n_src):
            s_target = _fir_project(ests[i], refs[j], filter_length)
            # interference: projection onto all references minus target part
            all_proj = sum(
                _fir_project(ests[i], refs[k], filter_length) for k in range(n_src)
            )
            e_interf = all_proj - s_target
            e_artif = ests[i] - all_proj
            decomposition[(i, j)] = (s_target, e_interf, e_artif)
            denom = np.sum((e_interf + e_artif) ** 2)
            sdr_matrix[i, j] = 10 * np.log10(
                np.sum(s_target**2) / max(denom, 1e-30)
            )

    best, best_perm = -np.inf, None
    for perm in _permutations(n_src):
        value = np.mean([sdr_matrix[perm[j], j] for j in range(n_src)])
        if value > best:
            best, best_perm = value, perm

    sdr = np.zeros(n_src)
    sir = np.zeros(n_src)
    sar = np.zeros(n_src)
    for j in range(n_src):
        i = best_perm[j]
        s_target, e_interf, e_artif = decomposition[(i, j)]
        sdr[j] = sdr_matrix[i, j]
        sir[j] = 10 * np.log10(
            np.sum(s_target**2) / max(np.sum(e_interf**2), 1e-30)
        )
        sar[j] = 10 * np.log10(
            np.sum((s_target + e_interf) ** 2) / max(np.sum(e_artif**2), 1e-30)
        )
    return sdr, sir, sar, np.asarray(best_perm)
