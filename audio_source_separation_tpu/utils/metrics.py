"""Separation-quality metrics (SI-SDR, SDR, permutation-invariant pairing).

The reference has no metrics module — its de-facto quality metric is
``mir_eval.bss_eval_sources`` called from notebook callbacks
(``egs/bss-example/ilrma/test_gauss-ilrma.ipynb`` cells 66-72).  This module
productizes that: pure-jnp metrics usable on device, inside callbacks, or on
host NumPy arrays.

``bss_eval_sources`` here is the filter-invariant SDR/SIR/SAR triple in the
BSS Eval v3 / mir_eval convention: each estimate is decomposed by
least-squares projection onto ``filter_length``-tap FIR filterings of the
references (512 taps, matching mir_eval) — ``s_target`` projects onto the
matched reference's shifts alone, the interference+target space projects
JOINTLY onto all references' shifts (one block-Toeplitz normal system),
and the permutation maximizes mean SIR, exactly as mir_eval selects it.
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


def _toeplitz(col, row):
    """scipy-free Toeplitz constructor (col = first column, row = first row)."""
    L = len(col)
    idx = np.arange(L)
    # element (a, b): col[a-b] when a >= b else row[b-a]
    diff = idx[:, None] - idx[None, :]
    out = np.where(diff >= 0, col[np.abs(diff)], row[np.abs(diff)])
    return out


def _fir_projections(refs, est, filter_length, which):
    """Least-squares projection of ``est`` onto ``filter_length``-tap FIR
    filterings of the rows of ``refs`` (jointly, via the block-Toeplitz
    normal equations computed with FFT correlations).

    Args:
        refs: ``(n_refs, n_samples)`` references spanning the projection space.
        est: ``(n_samples,)`` the signal being decomposed.
        which: iterable of row indices of ``refs`` to project onto.
    Returns:
        the projection, length ``n_samples + filter_length - 1``
        (the BSS Eval zero-padded convention).
    """
    which = list(which)
    sub = refs[which]
    n_refs, n_samp = sub.shape
    L = filter_length
    n_out = n_samp + L - 1
    n_fft = 1 << int(np.ceil(np.log2(n_out)))
    sf = np.fft.rfft(sub, n=n_fft, axis=1)
    ef = np.fft.rfft(est, n=n_fft)

    # Gram blocks: G[(j,a),(k,b)] = sum_u s_j[u] s_k[u + a - b] — a Toeplitz
    # in (a - b) built from the circular cross-correlation (no wraparound
    # because n_fft >= n_samp + L)
    G = np.empty((n_refs * L, n_refs * L))
    for j in range(n_refs):
        for k in range(j, n_refs):
            cc = np.fft.irfft(np.conj(sf[j]) * sf[k], n_fft)
            col = cc[:L]  # m = a - b >= 0
            row = np.concatenate(([cc[0]], cc[-(L - 1):][::-1])) if L > 1 else cc[:1]
            block = _toeplitz(col, row)
            G[j * L : (j + 1) * L, k * L : (k + 1) * L] = block
            if k != j:
                G[k * L : (k + 1) * L, j * L : (j + 1) * L] = block.T

    # cross term: d[(j,a)] = sum_u s_j[u] est[u + a]
    d = np.empty(n_refs * L)
    for j in range(n_refs):
        d[j * L : (j + 1) * L] = np.fft.irfft(np.conj(sf[j]) * ef, n_fft)[:L]

    ridge = 1e-10 * max(np.trace(G) / max(G.shape[0], 1), 1e-30)
    h = np.linalg.solve(G + ridge * np.eye(n_refs * L), d).reshape(n_refs, L)
    hf = np.fft.rfft(h, n=n_fft, axis=1)
    projection = np.fft.irfft((hf * sf).sum(axis=0), n_fft)[:n_out]
    return projection


def bss_eval_sources(reference_sources, estimated_sources, filter_length=512):
    """BSS Eval v3 SDR / SIR / SAR with mir_eval's permutation selection.

    The decomposition of estimate ``i`` against reference ``j``
    (``bss_eval_sources`` / ``bss_decomp_mtifilt`` convention):
    ``s_target`` = projection onto ``filter_length`` shifts of reference ``j``
    alone; ``P_all`` = JOINT projection onto all references' shifts;
    ``e_interf = P_all − s_target``; ``e_artif = est − P_all`` (signals
    zero-padded to ``n_samples + filter_length − 1``).  The permutation
    maximizes the mean SIR over sources, exactly as mir_eval selects it.

    Args:
        reference_sources: ``(n_sources, n_samples)``.
        estimated_sources: ``(n_sources, n_samples)``.
        filter_length: allowed FIR distortion length (512 = mir_eval default).
    Returns:
        ``(sdr, sir, sar, perm)`` NumPy arrays of shape ``(n_sources,)``,
        ordered by reference index (``perm[j]`` = estimate matched to
        reference ``j``).
    """
    refs = np.asarray(reference_sources, dtype=np.float64)
    ests = np.asarray(estimated_sources, dtype=np.float64)
    n_src, n_samp = refs.shape
    L = min(filter_length, n_samp)
    n_out = n_samp + L - 1

    sdr_m = np.zeros((n_src, n_src))
    sir_m = np.zeros((n_src, n_src))
    sar_m = np.zeros((n_src, n_src))
    for i in range(n_src):
        est_pad = np.zeros(n_out)
        est_pad[:n_samp] = ests[i]
        p_all = _fir_projections(refs, ests[i], L, range(n_src))
        e_artif = est_pad - p_all
        artif_energy = np.sum(e_artif**2)
        for j in range(n_src):
            s_target = _fir_projections(refs, ests[i], L, [j])
            e_interf = p_all - s_target
            target_energy = np.sum(s_target**2)
            interf_energy = np.sum(e_interf**2)
            sdr_m[i, j] = 10 * np.log10(
                target_energy / max(interf_energy + artif_energy, 1e-30)
            )
            sir_m[i, j] = 10 * np.log10(target_energy / max(interf_energy, 1e-30))
            sar_m[i, j] = 10 * np.log10(
                np.sum((s_target + e_interf) ** 2) / max(artif_energy, 1e-30)
            )

    best, best_perm = -np.inf, None
    for perm in _permutations(n_src):
        value = np.mean([sir_m[perm[j], j] for j in range(n_src)])
        if value > best:
            best, best_perm = value, perm

    idx = np.asarray(best_perm)
    cols = np.arange(n_src)
    return sdr_m[idx, cols], sir_m[idx, cols], sar_m[idx, cols], idx


def bss_eval_improvement(estimates, mixture_ref, targets, filter_length=512):
    """Mean BSS Eval SDR of the estimates minus that of the (repeated)
    mixture reference channel — the reference notebooks' ``record_sdri``
    quantity (``egs/bss-example/ilrma/test_gauss-ilrma.ipynb`` cells 66-72)."""
    ests = np.asarray(estimates)
    tgts = np.asarray(targets)
    after, _, _, _ = bss_eval_sources(tgts, ests, filter_length=filter_length)
    mix = np.broadcast_to(np.asarray(mixture_ref)[None], tgts.shape)
    before, _, _, _ = bss_eval_sources(tgts, mix, filter_length=filter_length)
    return float(np.mean(after) - np.mean(before))
