"""Closed-form batched small-matrix linear algebra.

XLA lowers ``jnp.linalg.inv/det/solve`` on batched tiny matrices to LU
routines with poor MXU/VPU utilization (2×2 and 3×3 blocks on 128-lane
hardware).  BSS works almost exclusively on C×C matrices with C ∈ {2, 3, 4}
batched over thousands of frequency bins, so closed forms (adjugate / cofactor
expansion) turn every solve into a handful of fused elementwise ops over the
bin axis — pure VPU work at full lane occupancy.

``batched_inv`` / ``batched_det`` dispatch on the static trailing dimension
and fall back to ``jnp.linalg`` for larger sizes.
"""

import functools

import jax
import jax.numpy as jnp


def f32_matmuls(fn):
    """Force float32 matmul/einsum multiplies inside a traced stage.

    TPU's DEFAULT matmul precision (bfloat16 multiplies) destabilizes
    inverse/PSD chains built from contractions: covariances assembled from
    reduced-precision products go indefinite, their adjugate inverses blow
    up, and the solver NaNs (measured on hardware for IPSDTA within one
    iteration and for Sawada MNMF after ~40 iterations / from seeded inits;
    CPU float32 is fine).  These contractions are memory-bound, so
    full-precision multiplies cost nothing."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


def det_2x2(A):
    return A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]


def inv_2x2(A, det=None):
    if det is None:
        det = det_2x2(A)
    inv = jnp.stack(
        [
            jnp.stack([A[..., 1, 1], -A[..., 0, 1]], axis=-1),
            jnp.stack([-A[..., 1, 0], A[..., 0, 0]], axis=-1),
        ],
        axis=-2,
    )
    return inv / det[..., None, None]


def det_3x3(A):
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def inv_3x3(A, det=None):
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    if det is None:
        det = det_3x3(A)
    cof = jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return cof / det[..., None, None]


def batched_det(A):
    """Determinant of batched square matrices; closed form for n ≤ 3."""
    n = A.shape[-1]
    if n == 1:
        return A[..., 0, 0]
    if n == 2:
        return det_2x2(A)
    if n == 3:
        return det_3x3(A)
    return jnp.linalg.det(A)


def batched_inv(A):
    """Inverse of batched square matrices; closed form for n ≤ 3."""
    n = A.shape[-1]
    if n == 1:
        return 1.0 / A
    if n == 2:
        return inv_2x2(A)
    if n == 3:
        return inv_3x3(A)
    return jnp.linalg.inv(A)


def hermitian_eigvalsh_2x2(A):
    a = A[..., 0, 0].real
    d = A[..., 1, 1].real
    b = A[..., 0, 1]
    mean = (a + d) / 2
    rad = jnp.sqrt(((a - d) / 2) ** 2 + jnp.abs(b) ** 2)
    return jnp.stack([mean - rad, mean + rad], axis=-1)


def hermitian_eigvalsh_3x3(A):
    """Closed-form (Cardano) eigenvalues of batched Hermitian 3×3 matrices,
    ascending — the standard trigonometric solution for the (real)
    characteristic cubic.  Exact-diagonal matrices (p₂ = 0) short-circuit to
    the mean eigenvalue."""
    q = jnp.trace(A, axis1=-2, axis2=-1).real / 3
    p1 = (
        jnp.abs(A[..., 0, 1]) ** 2
        + jnp.abs(A[..., 0, 2]) ** 2
        + jnp.abs(A[..., 1, 2]) ** 2
    )
    d0 = A[..., 0, 0].real - q
    d1 = A[..., 1, 1].real - q
    d2 = A[..., 2, 2].real - q
    p2 = d0**2 + d1**2 + d2**2 + 2 * p1
    degenerate = p2 <= 0
    p = jnp.sqrt(jnp.where(degenerate, 1.0, p2) / 6)
    eye = jnp.eye(3, dtype=A.dtype)
    Bm = (A - q[..., None, None] * eye) / p[..., None, None]
    r = jnp.clip(det_3x3(Bm).real / 2, -1.0, 1.0)
    phi = jnp.arccos(r) / 3
    two_pi_3 = 2 * jnp.pi / 3
    e_hi = q + 2 * p * jnp.cos(phi)
    e_lo = q + 2 * p * jnp.cos(phi + two_pi_3)
    e_mid = 3 * q - e_hi - e_lo
    eigs = jnp.stack([e_lo, e_mid, e_hi], axis=-1)
    return jnp.where(degenerate[..., None], q[..., None], eigs)


def batched_eigvalsh(A):
    """Eigenvalues of batched Hermitian matrices, ascending; closed forms for
    n ≤ 3 (pure VPU work — no iterative eigensolver), ``jnp.linalg.eigvalsh``
    fallback otherwise."""
    n = A.shape[-1]
    if n == 1:
        return A[..., 0].real
    if n == 2:
        return hermitian_eigvalsh_2x2(A)
    if n == 3:
        return hermitian_eigvalsh_3x3(A)
    return jnp.linalg.eigvalsh(A)


def matmul_small(A, B):
    """Batched matmul on trailing n×n axes via unrolled slice products for
    n ≤ 3 (XLA's batched-tiny-matmul lowering on TPU is ~10× slower than the
    equivalent elementwise ops on huge batches); ``@`` fallback otherwise."""
    n = A.shape[-1]
    if n > 3 or B.shape[-2] != n:
        return A @ B
    m = B.shape[-1]
    rows = []
    for i in range(n):
        cols = []
        for j in range(m):
            acc = A[..., i, 0] * B[..., 0, j]
            for k in range(1, n):
                acc = acc + A[..., i, k] * B[..., k, j]
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


# --------------------------------------------------------------------------- #
# planes layout: the matrix axes LEAD (``P (n, n, ...batch)``) so every slice
# ``P[i, j]`` is a fully-tiled plane over the batch axes.  The trailing-axes
# variants above still materialize ``(..., n, n)`` arrays whose tiny minor
# dims pad to the (8 × 128) tile — fine inside one fusion, but every array
# that crosses a fusion boundary in that layout costs ~(8·128)/n² its size in
# HBM traffic.  Hot block-diagonal solvers (IPSDTA VCD) keep ALL small-matrix
# quantities in planes layout end-to-end and use these duals instead.
# --------------------------------------------------------------------------- #
def det_planes(P):
    """Determinant from planes ``P (n, n, ...) → (...)``; closed form n ≤ 3."""
    n = P.shape[0]
    if n == 1:
        return P[0, 0]
    if n == 2:
        return P[0, 0] * P[1, 1] - P[0, 1] * P[1, 0]
    if n == 3:
        return (
            P[0, 0] * (P[1, 1] * P[2, 2] - P[1, 2] * P[2, 1])
            - P[0, 1] * (P[1, 0] * P[2, 2] - P[1, 2] * P[2, 0])
            + P[0, 2] * (P[1, 0] * P[2, 1] - P[1, 1] * P[2, 0])
        )
    raise ValueError("det_planes: closed forms cover n <= 3, got {}".format(n))


def inv_planes(P, det=None):
    """Inverse from planes ``P (n, n, ...) → (n, n, ...)``; adjugate, n ≤ 3."""
    n = P.shape[0]
    if det is None:
        det = det_planes(P)
    if n == 1:
        return (1.0 / det)[None, None]
    if n == 2:
        rows = [[P[1, 1], -P[0, 1]], [-P[1, 0], P[0, 0]]]
    elif n == 3:
        a, b, c = P[0, 0], P[0, 1], P[0, 2]
        d, e, f = P[1, 0], P[1, 1], P[1, 2]
        g, h, i = P[2, 0], P[2, 1], P[2, 2]
        rows = [
            [e * i - f * h, c * h - b * i, b * f - c * e],
            [f * g - d * i, a * i - c * g, c * d - a * f],
            [d * h - e * g, b * g - a * h, a * e - b * d],
        ]
    else:
        raise ValueError("inv_planes: closed forms cover n <= 3, got {}".format(n))
    return jnp.stack([jnp.stack(r) for r in rows]) / det


def hermitian_eigvalsh_planes(P):
    """Eigenvalues (ascending, stacked leading) of Hermitian planes
    ``P (n, n, ...) → (n, ...)``; same closed forms as
    :func:`hermitian_eigvalsh_2x2` / :func:`hermitian_eigvalsh_3x3`."""
    n = P.shape[0]
    if n == 1:
        return P[0, 0].real[None]
    if n == 2:
        a, d, b = P[0, 0].real, P[1, 1].real, P[0, 1]
        mean = (a + d) / 2
        rad = jnp.sqrt(((a - d) / 2) ** 2 + jnp.abs(b) ** 2)
        return jnp.stack([mean - rad, mean + rad])
    if n == 3:
        q = (P[0, 0].real + P[1, 1].real + P[2, 2].real) / 3
        p1 = (
            jnp.abs(P[0, 1]) ** 2
            + jnp.abs(P[0, 2]) ** 2
            + jnp.abs(P[1, 2]) ** 2
        )
        d0 = P[0, 0].real - q
        d1 = P[1, 1].real - q
        d2 = P[2, 2].real - q
        p2 = d0**2 + d1**2 + d2**2 + 2 * p1
        degenerate = p2 <= 0
        p = jnp.sqrt(jnp.where(degenerate, 1.0, p2) / 6)
        qc = q.astype(P.dtype)
        Bp = jnp.stack(
            [
                jnp.stack(
                    [
                        (P[i, j] - qc) / p if i == j else P[i, j] / p
                        for j in range(3)
                    ]
                )
                for i in range(3)
            ]
        )
        r = jnp.clip(det_planes(Bp).real / 2, -1.0, 1.0)
        phi = jnp.arccos(r) / 3
        two_pi_3 = 2 * jnp.pi / 3
        e_hi = q + 2 * p * jnp.cos(phi)
        e_lo = q + 2 * p * jnp.cos(phi + two_pi_3)
        e_mid = 3 * q - e_hi - e_lo
        eigs = jnp.stack([e_lo, e_mid, e_hi])
        return jnp.where(degenerate[None], q[None], eigs)
    raise ValueError(
        "hermitian_eigvalsh_planes: closed forms cover n <= 3, got {}".format(n)
    )


def matmul_planes(A, B):
    """Matrix product from planes ``A, B (n, n, ...) → (n, n, ...)`` —
    unrolled multiply-adds over fully-tiled entry planes."""
    n = A.shape[0]
    return jnp.stack(
        [
            jnp.stack(
                [sum(A[i, k] * B[k, j] for k in range(n)) for j in range(n)]
            )
            for i in range(n)
        ]
    )


def herm_planes(P):
    """Hermitian-symmetrize planes ``P (n, n, ...)``."""
    return (P + jnp.swapaxes(P, 0, 1).conj()) / 2


def add_diag_planes(P, s):
    """Add the real plane ``s (...)`` to the diagonal planes of ``P (n, n, ...)``."""
    n = P.shape[0]
    eye = jnp.eye(n, dtype=P.dtype).reshape((n, n) + (1,) * (P.ndim - 2))
    return P + eye * s[None, None].astype(P.dtype)


def trace_planes(P):
    """Real trace of planes ``P (n, n, ...) → (...)``."""
    n = P.shape[0]
    tr = P[0, 0].real
    for i in range(1, n):
        tr = tr + P[i, i].real
    return tr


def psd_parts_planes(P, eps=1e-12):
    """Planes dual of the reference ``to_PSD`` chain: returns
    ``(to_psd(P), eigenvalues-of-the-projection)`` — hermitize, shift by the
    most negative eigenvalue, add the ``eps·trace`` identity ridge
    (``utils/utils_linalg.py:9-31`` semantics)."""
    H = herm_planes(P)
    w = hermitian_eigvalsh_planes(H)  # (n, ...)
    delta = jnp.minimum(jnp.min(w, axis=0), 0)
    shift = eps * trace_planes(H) - delta
    return add_diag_planes(H, shift), w + shift[None]


def psd_inv_planes(R, eps=1e-12, psd=True):
    """Adjugate inverse of planes, with the reference's trailing
    ``to_psd(inv)`` ridge when ``psd=True`` (the input is already PSD, so the
    shift reduces to ``eps·trace``)."""
    inv = inv_planes(R)
    if psd:
        inv = herm_planes(inv)
        inv = add_diag_planes(inv, eps * trace_planes(inv))
    return inv


def blockwise_inv(A):
    """Closed-form inverse of batched ``(..., n, n)`` matrices with EVEN
    ``n`` and ``n/2 ≤ 3`` via 2×2-block Schur complements — the batched-LU
    ``jnp.linalg.inv`` loses to adjugate closed forms on thousands of tiny
    systems (the Ozerov lever, CLAUDE.md round 4).  Requires the leading
    principal ``n/2`` block to be invertible (true for the PSD-projected,
    identity-padded statistics this serves).  Falls back to
    ``jnp.linalg.inv`` outside the closed forms."""
    n = A.shape[-1]
    h = n // 2
    if n % 2 != 0 or h > 3:
        return jnp.linalg.inv(A)
    A11 = A[..., :h, :h]
    A12 = A[..., :h, h:]
    A21 = A[..., h:, :h]
    A22 = A[..., h:, h:]
    inv11 = batched_inv(A11)
    B = inv11 @ A12  # A₁₁⁻¹A₁₂
    S = A22 - A21 @ B  # Schur complement
    invS = batched_inv(S)
    C = A21 @ inv11  # A₂₁A₁₁⁻¹
    top_right = -B @ invS
    bottom_left = -invS @ C
    top_left = inv11 - top_right @ C
    return jnp.concatenate(
        [
            jnp.concatenate([top_left, top_right], axis=-1),
            jnp.concatenate([bottom_left, invS], axis=-1),
        ],
        axis=-2,
    )


def batched_log_abs_det(A):
    """``log |det A|`` for batched matrices, closed form for n ≤ 3."""
    n = A.shape[-1]
    if n <= 3:
        return jnp.log(jnp.abs(batched_det(A)))
    _, logdet = jnp.linalg.slogdet(A)
    return logdet.real


# --------------------------------------------------------------------------- #
# Compact Hermitian planes: a Hermitian (n, n, ...) field stored as n² REAL
# planes — n diagonal planes first, then an (re, im) pair per off-diagonal
# c < d (``ops.ip_components._plane_index`` ordering, the layout the solvers
# already use for observed covariances).  Every materialized Hermitian
# intermediate costs HALF the HBM traffic of complex (n, n, ...) planes
# (n² real planes vs 2·n²), which dominates the covariance-domain EM/MU
# chains (Sawada MNMF ``mnmf.py:216-217``, CovarianceISNMF) where X̂, X̂⁻¹
# and X̂⁻¹XX̂⁻¹ sit behind optimization barriers by design (CLAUDE.md
# round-4 multi-consumer lever).
# --------------------------------------------------------------------------- #
def compact_entry(planes, c, d):
    """Lazy complex ``(c, d)`` entry of a Hermitian matrix stored as compact
    real planes ``(n², ...)``; fuses into consumers."""
    from .ip_components import _plane_index

    n = int(round(planes.shape[0] ** 0.5))
    index, _ = _plane_index(n)
    if c == d:
        p = planes[index[("re", c, c)]]
        return jax.lax.complex(p, jnp.zeros_like(p))
    if c < d:
        return jax.lax.complex(
            planes[index[("re", c, d)]], planes[index[("im", c, d)]]
        )
    return jax.lax.complex(
        planes[index[("re", d, c)]], -planes[index[("im", d, c)]]
    )


def hermitian_compact_from_entries(entry, n):
    """Stack compact real planes from a complex entry function (evaluated on
    the upper triangle only — the function must describe a Hermitian field)."""
    from .ip_components import _plane_index

    _, order = _plane_index(n)
    return jnp.stack(
        [
            entry(c, d).real if kind == "re" else entry(c, d).imag
            for kind, c, d in order
        ]
    )


def expand_hermitian_compact(planes):
    """Compact real planes ``(n², ...)`` → complex planes ``(n, n, ...)``."""
    n = int(round(planes.shape[0] ** 0.5))
    return jnp.stack(
        [
            jnp.stack([compact_entry(planes, c, d) for d in range(n)])
            for c in range(n)
        ]
    )


def hermitian_compact_from_planes(P):
    """Complex planes ``(n, n, ...)`` → compact real planes ``(n², ...)``
    (reads the upper triangle only)."""
    return hermitian_compact_from_entries(lambda c, d: P[c, d], P.shape[0])


def det_hermitian_compact(planes, ridge=None):
    """Real determinant of a compact Hermitian field (optionally of
    ``M + ridge·I``); closed forms for n ≤ 3."""
    n = int(round(planes.shape[0] ** 0.5))
    if n == 1:
        d0 = planes[0]
        return d0 if ridge is None else d0 + ridge
    if n == 2:
        a, dd, br, bi = planes[0], planes[1], planes[2], planes[3]
        if ridge is not None:
            a, dd = a + ridge, dd + ridge
        return a * dd - (br * br + bi * bi)
    if n == 3:
        def e(c, d):
            ent = compact_entry(planes, c, d)
            if ridge is not None and c == d:
                ent = ent + ridge
            return ent

        det = (
            e(0, 0) * (e(1, 1) * e(2, 2) - e(1, 2) * e(2, 1))
            - e(0, 1) * (e(1, 0) * e(2, 2) - e(1, 2) * e(2, 0))
            + e(0, 2) * (e(1, 0) * e(2, 1) - e(1, 1) * e(2, 0))
        )
        return det.real
    raise ValueError(
        "det_hermitian_compact: closed forms cover n <= 3, got {}".format(n)
    )


def inv_hermitian_compact(planes, ridge=None, det=None):
    """Compact planes of ``(M + ridge·I)⁻¹`` for compact Hermitian ``M``
    (adjugate over a REAL determinant — the Hermitian determinant's exact
    imaginary cancellation is applied algebraically); n ≤ 3."""
    n = int(round(planes.shape[0] ** 0.5))
    if det is None:
        det = det_hermitian_compact(planes, ridge=ridge)
    if n == 1:
        return (1.0 / det)[None]
    if n == 2:
        a, dd, br, bi = planes[0], planes[1], planes[2], planes[3]
        if ridge is not None:
            a, dd = a + ridge, dd + ridge
        return jnp.stack([dd, a, -br, -bi]) / det
    if n == 3:
        def e(c, d):
            ent = compact_entry(planes, c, d)
            if ridge is not None and c == d:
                ent = ent + ridge
            return ent

        # adjugate rows of the general 3×3 (``inv_planes``), Hermitian
        # result: diagonals real, upper triangle (re, im)
        adj00 = (e(1, 1) * e(2, 2) - e(1, 2) * e(2, 1)).real
        adj11 = (e(0, 0) * e(2, 2) - e(0, 2) * e(2, 0)).real
        adj22 = (e(0, 0) * e(1, 1) - e(0, 1) * e(1, 0)).real
        adj01 = e(0, 2) * e(2, 1) - e(0, 1) * e(2, 2)
        adj02 = e(0, 1) * e(1, 2) - e(0, 2) * e(1, 1)
        adj12 = e(0, 2) * e(1, 0) - e(0, 0) * e(1, 2)
        return (
            jnp.stack(
                [
                    adj00,
                    adj11,
                    adj22,
                    adj01.real,
                    adj01.imag,
                    adj02.real,
                    adj02.imag,
                    adj12.real,
                    adj12.imag,
                ]
            )
            / det
        )
    raise ValueError(
        "inv_hermitian_compact: closed forms cover n <= 3, got {}".format(n)
    )


def sandwich_hermitian_compact(a_planes, x_planes):
    """Compact planes of ``A·X·A`` for compact Hermitian ``A = Aᴴ`` and
    ``X`` (the result is Hermitian: ``(AXA)ᴴ = AᴴXᴴAᴴ = AXA``)."""
    n = int(round(a_planes.shape[0] ** 0.5))

    def ent(c, d):
        return sum(
            compact_entry(a_planes, c, a)
            * compact_entry(x_planes, a, b)
            * compact_entry(a_planes, b, d)
            for a in range(n)
            for b in range(n)
        )

    return hermitian_compact_from_entries(ent, n)


def power_hermitian_compact(planes, power, eps=0.0):
    """Compact planes of the spectral power ``M^power`` for a compact
    Hermitian 2×2 field — the planes dual of
    ``algorithm.linalg._power_2x2`` (same scale-invariant divided-difference
    algebra, same ``eps`` eigenvalue clip), with every intermediate an
    elementwise op over the batch planes: nothing ever materializes in the
    tile-padded ``(..., 2, 2)`` matrix layout (a ``(F, S, 2, 2)`` complex
    array pads its minors to the 8×128 tile at ~256× the payload's HBM
    traffic — the round-3 planes rule)."""
    n = int(round(planes.shape[0] ** 0.5))
    if n != 2:
        raise ValueError(
            "power_hermitian_compact: closed form covers n == 2, got {}".format(n)
        )
    a, d, br, bi = planes[0], planes[1], planes[2], planes[3]
    # spectral-radius bound s factored out for scale invariance (exact
    # algebra: f(M) = f(s·(M/s)) with the clip carried as eps/s)
    abs_b = jnp.sqrt(br * br + bi * bi)
    s = (jnp.abs(a) + jnp.abs(d)) / 2 + abs_b
    s = jnp.maximum(s, jnp.finfo(s.dtype).tiny)
    an, dn, brn, bin_ = a / s, d / s, br / s, bi / s
    tr = an + dn
    det = an * dn - (brn * brn + bin_ * bin_)
    mean = tr / 2
    rad = jnp.sqrt(jnp.maximum(mean**2 - det, 0.0))
    l1, l2 = mean + rad, mean - rad  # eigenvalues of M / s, O(1)

    def f(w):
        w = jnp.maximum(w, eps / s)
        pw = jnp.where(w > 0, w, 1.0) ** power
        return jnp.where(w > 0, pw, 0.0)

    f1, f2 = f(l1), f(l2)
    gap = l1 - l2
    scale = jnp.maximum(jnp.maximum(jnp.abs(l1), jnp.abs(l2)), 1e-30)
    safe = gap > 1e-6 * scale
    gap_safe = jnp.where(safe, gap, 1.0)
    ca = jnp.where(safe, (f1 - f2) / gap_safe, 0.0)
    cb = jnp.where(safe, (f2 * l1 - f1 * l2) / gap_safe, f1)
    sp = s**power
    # f(M) = a·(M/s) + b·I, restated on the compact planes
    return sp * jnp.stack([ca * an + cb, ca * dn + cb, ca * brn, ca * bin_])


def solve_riccati_hermitian_compact(A_planes, B_planes, eps=1e-12):
    """Compact planes of the Hermitian PSD solution of ``H A H = B``
    (``H = A^{-1/2}(A^{1/2} B A^{1/2})^{1/2} A^{-1/2}``) — the planes dual
    of ``algorithm.linalg.solve_riccati`` for 2×2 operands.  The matrix
    path's explicit Hermitian symmetrizations are implicit here: every
    sandwich is Hermitian by construction (exact, not FP-order-dependent).
    Reference construction: ``src/algorithm/linalg.py:7-31`` (Sawada MNMF
    spatial update ``bss/mnmf.py:467``, ``algorithm/nmf.py:800``)."""
    A_sqrt = power_hermitian_compact(A_planes, 0.5, eps=0.0)
    A_invsqrt = power_hermitian_compact(A_planes, -0.5, eps=eps)
    M = sandwich_hermitian_compact(A_sqrt, B_planes)
    M_sqrt = power_hermitian_compact(M, 0.5, eps=0.0)
    return sandwich_hermitian_compact(A_invsqrt, M_sqrt)


def expand_hermitian_compact_trailing(small, n):
    """Trailing-compact real ``(..., n²)`` → complex ``(..., n, n)`` (for
    the TINY per-(bin, source) matrices produced by contracting compact
    planes over frames)."""
    from .ip_components import _plane_index

    index, _ = _plane_index(n)

    def ent(c, d):
        if c == d:
            p = small[..., index[("re", c, c)]]
            return jax.lax.complex(p, jnp.zeros_like(p))
        if c < d:
            return jax.lax.complex(
                small[..., index[("re", c, d)]], small[..., index[("im", c, d)]]
            )
        return jax.lax.complex(
            small[..., index[("re", d, c)]], -small[..., index[("im", d, c)]]
        )

    return jnp.stack(
        [jnp.stack([ent(c, d) for d in range(n)], -1) for c in range(n)], -2
    )


def trace_hermitian_compact(planes):
    """Real trace of a compact Hermitian field ``(n², ...) → (...)`` — the
    sum of the leading ``n`` diagonal planes."""
    n = int(round(planes.shape[0] ** 0.5))
    tr = planes[0]
    for i in range(1, n):
        tr = tr + planes[i]
    return tr


def eigvalsh_hermitian_compact(planes):
    """Eigenvalues (ascending, stacked leading) of a compact Hermitian field
    ``(n², ...) → (n, ...)`` — the compact dual of
    :func:`hermitian_eigvalsh_planes` (same closed forms, n ≤ 3), with
    ``|b|²`` taken directly from the (re, im) planes (no complex abs)."""
    n = int(round(planes.shape[0] ** 0.5))
    if n == 1:
        return planes[:1]
    if n == 2:
        a, d, br, bi = planes[0], planes[1], planes[2], planes[3]
        mean = (a + d) / 2
        rad = jnp.sqrt(((a - d) / 2) ** 2 + br * br + bi * bi)
        return jnp.stack([mean - rad, mean + rad])
    if n == 3:
        q = (planes[0] + planes[1] + planes[2]) / 3
        p1 = (
            planes[3] ** 2
            + planes[4] ** 2
            + planes[5] ** 2
            + planes[6] ** 2
            + planes[7] ** 2
            + planes[8] ** 2
        )
        d0 = planes[0] - q
        d1 = planes[1] - q
        d2 = planes[2] - q
        p2 = d0**2 + d1**2 + d2**2 + 2 * p1
        degenerate = p2 <= 0
        p = jnp.sqrt(jnp.where(degenerate, 1.0, p2) / 6)
        # det((M − q·I)/p) = det(M − q·I)/p³ — real by Hermiticity
        r = jnp.clip(
            det_hermitian_compact(planes, ridge=-q) / (2 * p**3), -1.0, 1.0
        )
        phi = jnp.arccos(r) / 3
        two_pi_3 = 2 * jnp.pi / 3
        e_hi = q + 2 * p * jnp.cos(phi)
        e_lo = q + 2 * p * jnp.cos(phi + two_pi_3)
        e_mid = 3 * q - e_hi - e_lo
        eigs = jnp.stack([e_lo, e_mid, e_hi])
        return jnp.where(degenerate[None], q[None], eigs)
    raise ValueError(
        "eigvalsh_hermitian_compact: closed forms cover n <= 3, got {}".format(n)
    )


def add_diag_hermitian_compact(planes, s):
    """Add the real plane ``s (...)`` to the diagonal planes of a compact
    Hermitian field ``(n², ...)``."""
    n = int(round(planes.shape[0] ** 0.5))
    return jnp.concatenate([planes[:n] + s[None], planes[n:]])


def psd_parts_hermitian_compact(planes, eps=1e-12):
    """Compact dual of :func:`psd_parts_planes` (the reference ``to_PSD``
    chain — shift by the most negative eigenvalue, ``eps·trace`` ridge);
    hermitization is implicit in the storage.  Returns
    ``(to_psd(M), eigenvalues-of-the-projection)``."""
    w = eigvalsh_hermitian_compact(planes)
    delta = jnp.minimum(jnp.min(w, axis=0), 0)
    shift = eps * trace_hermitian_compact(planes) - delta
    return add_diag_hermitian_compact(planes, shift), w + shift[None]


def psd_inv_hermitian_compact(planes, eps=1e-12, psd=True):
    """Compact dual of :func:`psd_inv_planes` — adjugate inverse over the
    REAL Hermitian determinant, plus the reference's trailing ``to_psd``
    ridge (``eps·trace``) when ``psd=True``."""
    inv = inv_hermitian_compact(planes)
    if psd:
        inv = add_diag_hermitian_compact(
            inv, eps * trace_hermitian_compact(inv)
        )
    return inv


def square_hermitian_compact(planes):
    """Compact planes of ``M @ M`` for compact Hermitian ``M`` (Hermitian:
    ``(MM)ᴴ = MᴴMᴴ = MM``)."""
    n = int(round(planes.shape[0] ** 0.5))

    def ent(c, d):
        return sum(
            compact_entry(planes, c, k) * compact_entry(planes, k, d)
            for k in range(n)
        )

    return hermitian_compact_from_entries(ent, n)
