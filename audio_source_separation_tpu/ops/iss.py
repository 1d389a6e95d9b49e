"""Iterative-source-steering (ISS) rank-1 sweep — BSS hot op #3.

Reference kernel (``bss/iva.py:525-542``): demixing-filter-free updates
``Y ← Y − v_n ⊙ Y[n]`` with ``v_k = Σ_t(Y_k Y_n* / R_k) / Σ_t(|Y_n|² / R_k)``
swept sequentially over sources (true dependency).  Each inner reduction is a
frame-axis contraction batched over (source, bin) — pure VPU/MXU work with no
C×C solves at all.

Documented divergence from the reference: for the self-steering coefficient
the reference uses ``v_nn = 1 − 1/√D_nn`` with ``D_nn = Σ_t |Y_n|²/R_n``
(``bss/iva.py:539``), which minimizes an auxiliary function whose log-det term
is weighted by 1 instead of ``n_frames`` — inconsistent with its own NLL
(``bss/iva.py:617``: ``−2·n_frames·Σ log|det W|``) and therefore *increases*
that NLL on already-separated inputs.  The correct minimizer of the documented
NLL is ``v_nn = 1 − √(n_frames / D_nn)``, which is what this kernel uses by
default; it restores the auxiliary-function monotone-descent guarantee
(verified in ``tests/test_iva.py``).  ``compat=True`` reproduces the
reference's exact scaling so the divergence is regression-tested from both
sides (``tests/test_reference_parity.py``).
"""

import jax.numpy as jnp


def iss_sweep(Y, inv_R, compat=False):
    """One full ISS sweep.

    Args:
        Y: current estimates ``(n_sources, n_bins, n_frames)``.
        inv_R: reciprocal source weights — ``(n_sources, n_frames)`` (IVA,
            bin-coupled contrast) or ``(n_sources, n_bins, n_frames)`` (ILRMA,
            per-bin NMF variances, ``bss/ilrma.py:537-564``); ``1/R`` with
            ``R`` floored.
        compat: reproduce the reference's self-steering scale
            ``v_nn = 1 − 1/√D_nn`` (``bss/iva.py:539``) instead of the
            NLL-consistent ``1 − √(T/D_nn)`` (see module docstring).
    Returns:
        updated ``Y``.
    """
    n_sources = Y.shape[0]
    n_frames = Y.shape[-1]
    w = inv_R[:, None, :] if inv_R.ndim == 2 else inv_R
    for n in range(n_sources):
        Yn = Y[n]  # (n_bins, n_frames)
        U_n = jnp.sum(Y * Yn.conj() * w, axis=2)  # (n_sources, n_bins)
        D_n = jnp.sum(jnp.abs(Yn) ** 2 * w, axis=2).real  # (n_sources, n_bins)
        V_n = U_n / D_n
        scale = 1.0 if compat else n_frames
        V_n = V_n.at[n].set(1 - jnp.sqrt(scale / D_n[n]))
        Y = Y - V_n[:, :, None] * Yn
    return Y
