"""Component-layout AuxIVA-IP step — the lane-friendly hot loop.

TPU arrays tile (sublane × lane) = (8 × 128) for f32; tensors with tiny
trailing dims like the demixing filters ``(F, 2, 2)`` pad 2 → 128 lanes and
2 → 8 sublanes (a ~256× memory blow-up), which makes the IP chain's many
small ops dominate the iteration (~420 µs/iter measured for fixed-U IP sweeps
at F=2049).  This module stores every per-bin C×C quantity as **components**:
python-indexed collections of ``(F,)``-shaped arrays with the bin axis in
lanes — full lane occupancy, and the whole IP chain fuses into a handful of
elementwise kernels.  All channel loops unroll at trace time (C ∈ {2, 3, 4}
in practice; determinants/adjugates are generic Laplace expansions).

Layouts:
  * ``W (n_sources, n_channels, F)`` complex — demixing rows as components;
  * ``X (C, F, T)`` complex — public layout, unchanged;
  * covariance contraction as ONE real f32 GEMM ``(2·C²·F, T) × (T, N)`` over
    stacked (re, im) pair-product planes (a complex GEMM with N=2 output
    columns lowers poorly).
"""

import jax.numpy as jnp


def _plane_index(C):
    """Compact Hermitian plane ordering: C diagonal real planes, then
    (re, im) pairs for each off-diagonal c < d — C² planes total instead of
    the naive 2·C² (``x_c x_d^* = conj(x_d x_c^*)``; diagonals are real)."""
    index = {}
    order = []
    for c in range(C):
        index[("re", c, c)] = len(order)
        order.append(("re", c, c))
    for c in range(C):
        for d in range(c + 1, C):
            index[("re", c, d)] = len(order)
            order.append(("re", c, d))
            index[("im", c, d)] = len(order)
            order.append(("im", c, d))
    return index, order


def pair_products_planes(X):
    """Compact real pair-product planes ``(C², F, T)`` exploiting Hermitian
    symmetry (halves the per-iteration covariance GEMM read vs storing all
    ``2·C²`` re/im planes)."""
    C = X.shape[0]
    _, order = _plane_index(C)
    planes = []
    for kind, c, d in order:
        prod = X[c] * X[d].conj()
        planes.append(prod.real if kind == "re" else prod.imag)
    return jnp.stack(planes)  # (C², F, T)


def quadratic_power_components(rows, planes):
    """:func:`quadratic_power_planes` on component rows: ``rows[n][c]`` are
    complex ``(F,)`` filter coefficients (``Y[n] = Σ_c rows[n][c]·X[c]``).
    Returns ``(N, F, T)`` real powers without materializing complex Y."""
    n_channels = len(rows[0])
    out = []
    for row in rows:
        acc = None
        for c in range(n_channels):
            term = (jnp.abs(row[c]) ** 2)[:, None] * planes[c]
            acc = term if acc is None else acc + term
        k = n_channels
        for c in range(n_channels):
            for d in range(c + 1, n_channels):
                a = row[c] * row[d].conj()
                acc = acc + 2.0 * (
                    a.real[:, None] * planes[k]
                    - a.imag[:, None] * planes[k + 1]
                )
                k += 2
        out.append(jnp.maximum(acc, 0.0))
    return jnp.stack(out)


def frame_power_sums(rows, planes):
    """``Σ_f |Σ_c rows[n][c]·x_c|² → (N, T)`` as ONE real GEMM over the
    pair-product planes — neither the complex estimates nor their ``(N, F,
    T)`` power are ever materialized.  This is the whole per-iteration
    estimate dependence of the AuxIVA contrasts (their auxiliary variances
    are bin-reductions of the power: ``iva.py:439-441, 689-691``).

    The quadratic expansion ``Σ_c |w_c|² P_cc + Σ_{c<d} 2(Re a·Re P_cd −
    Im a·Im P_cd)`` is a per-(n, f) REAL weight vector over the C² compact
    planes, so the bin reduction is ``einsum('npf,pft->nt')`` — a
    ``(N, C²·F) × (C²·F, T)`` GEMM reading the planes once."""
    n_channels = len(rows[0])
    wts = []
    for row in rows:
        per_plane = [jnp.abs(row[c]) ** 2 for c in range(n_channels)]
        for c in range(n_channels):
            for d in range(c + 1, n_channels):
                a = row[c] * row[d].conj()
                per_plane.append(2.0 * a.real)
                per_plane.append(-2.0 * a.imag)
        wts.append(jnp.stack(per_plane))  # (C², F)
    W = jnp.stack(wts)  # (N, C², F)
    # exact value is a sum of |·|² ≥ 0, but the cross-term expansion can
    # cancel slightly negative in f32 (same hazard as
    # quadratic_power_components; a demixing row that nulls the mixture in
    # a frame lands at rounding noise) — clamp so the downstream
    # sqrt(psum) contrasts never NaN before their eps floors
    return jnp.maximum(jnp.einsum("npf,pft->nt", W, planes), 0.0)


def gram_components(planes):
    """Frame-summed mixture Gram ``G[c][d] = Σ_t x_c x*_d`` as complex
    ``(F,)`` components, reassembled from the compact Hermitian planes.
    Loop-INVARIANT for any fixed mixture — compute once, close over the
    scan body."""
    C = int(round(planes.shape[0] ** 0.5))
    sums = planes.sum(axis=-1)  # (C², F) real
    index, _ = _plane_index(C)
    G = [[None] * C for _ in range(C)]
    for c in range(C):
        G[c][c] = sums[index[("re", c, c)]].astype(
            jnp.complex64 if sums.dtype == jnp.float32 else jnp.complex128
        )
        for d in range(c + 1, C):
            g = sums[index[("re", c, d)]] + 1j * sums[index[("im", c, d)]]
            G[c][d] = g
            G[d][c] = g.conj()
    return G


def projection_back_components(rows, G, reference_id=0, ridge_rel=1e-12):
    """Per-(source, bin) projection-back scales from filter components and
    the invariant mixture Gram — NO (N, F, T) complex estimate and no
    per-iteration (F, T) reductions (the frame sums live in ``G``).

    ``Y Y^H(i, j) = Σ_cd w_ic w*_jd G[c][d]`` and ``x_ref Y^H(j) =
    Σ_d w*_jd G[ref][d]`` are exact restatements of the least-squares fit
    ``A = X Y^H (Y Y^H)^{-1}`` (``algorithm/projection_back.py``, reference
    ``src/algorithm/projection_back.py:3-34``) — algebraically identical,
    fp-level divergence only.  Same relative-trace ridge as the planes path.

    Args:
      rows: ``rows[n][c]`` complex ``(F,)`` components of the demixing rows.
      G: output of :func:`gram_components`.
      reference_id: reference channel index.

    Returns:
      list of ``(F,)`` complex scales, one per source.
    """
    n_sources = len(rows)
    n_channels = len(rows[0])
    YY = [
        [
            sum(
                rows[i][c] * rows[j][d].conj() * G[c][d]
                for c in range(n_channels)
                for d in range(n_channels)
            )
            for j in range(n_sources)
        ]
        for i in range(n_sources)
    ]
    xY = [
        sum(rows[j][d].conj() * G[reference_id][d] for d in range(n_channels))
        for j in range(n_sources)
    ]
    trace = sum(YY[i][i].real for i in range(n_sources))
    ridge = (ridge_rel * trace + 1e-32).astype(YY[0][0].dtype)
    for i in range(n_sources):
        YY[i][i] = YY[i][i] + ridge
    # scale = xY · (YY)^{-1} row vector; closed-form adjugate solve on the
    # tiny (N, N) component system (N ≤ 3 everywhere this is used)
    det = det_components(YY, n_sources)
    scales = []
    for s in range(n_sources):
        # scale row vector = xY · YY^{-1}: element s is Σ_j xY[j]·inv[j][s],
        # i.e. the dot of xY with COLUMN s of YY^{-1} (adjugate column solve)
        col = solve_column_components(YY, n_sources, s, det=det)
        scales.append(sum(xY[j] * col[j] for j in range(n_sources)))
    return scales


def quadratic_power_planes(W, planes):
    """``P[n] = |Σ_c W[f, n, c] x_c|²`` directly from the REAL pair-product
    planes — no complex ``(N, F, T)`` estimate is ever materialized.

    ``|Σ_c w_c x_c|² = Σ_c |w_c|² P_cc + Σ_{c<d} 2(Re a·Re P_cd − Im a·Im
    P_cd)`` with ``a = w_c w*_d`` — an all-real fused elementwise pass over
    the planes.  Measured on-chip (round 4, canonical FastMNMF config): the
    complex per-row broadcast multiply over ``X`` + ``|·|²`` costs
    ~155 µs/iter; this form ~8 µs — the same planes-vs-complex-materialize
    lesson as the round-3 small-matrix layouts.  The exact value is ≥ 0 but
    the cross-term difference can cancel slightly negative in f32, so the
    result is clamped at 0.

    Args:
      W: ``(F, N, C)`` complex mixing rows (``Y[n] = Σ_c W[:, n, c]·X[c]``).
      planes: ``(C², F, T)`` compact Hermitian planes from
        :func:`pair_products_planes`.

    Returns:
      ``(N, F, T)`` real powers.
    """
    n_channels = int(round(planes.shape[0] ** 0.5))
    rows = [
        [W[:, n, c] for c in range(n_channels)] for n in range(W.shape[1])
    ]
    return quadratic_power_components(rows, planes)


def _covariance_planes(planes, weights, flatten=True):
    """Real contraction over frames → ``(P, F, N)`` with P = C² compact planes.

    2-D weights ``(N, T)``: one ``(P·F, T) × (T, N)`` GEMM;
    3-D weights ``(N, F, T)`` (ILRMA-style per-bin variances): a bin-batched
    GEMM via einsum.

    ``flatten=False`` keeps the (planes, bins) axes separate — required under
    a bins-sharded mesh, where merging the sharded bin axis into a flat GEMM
    dimension would defeat GSPMD propagation (forcing an all-gather); the
    einsum contracts over frames locally per bin shard.
    """
    P, F, T = planes.shape
    w = weights.astype(planes.dtype)
    if w.ndim == 2:
        if flatten:
            flat = planes.reshape(P * F, T)
            out = flat @ jnp.transpose(w) / T  # (P·F, N)
            return out.reshape(P, F, -1)
        return jnp.einsum("pft,nt->pfn", planes, w) / T
    return jnp.einsum("pft,nft->pfn", planes, w) / T


def _assemble_entry(out, index, c, d, n):
    """Complex ``U[c][d]`` (F,) from compact contraction output ``(P, F, N)``."""
    if c == d:
        re = out[index[("re", c, c)], :, n]
        return re + 0j
    if c < d:
        re = out[index[("re", c, d)], :, n]
        im = out[index[("im", c, d)], :, n]
        return re + 1j * im
    re = out[index[("re", d, c)], :, n]
    im = out[index[("im", d, c)], :, n]
    return re - 1j * im


def weighted_covariance_components(planes, weights, flatten=True):
    """``U[n][c][d] (F,) = (1/T) Σ_t w[n, (f,) t]·(x_c x_d^*)(f, t)``.

    Returns a nested list ``U[n][c][d]`` of complex ``(F,)``.
    """
    P = planes.shape[0]
    C = int(round(P**0.5))
    index, _ = _plane_index(C)
    n_sources = weights.shape[0]
    out = _covariance_planes(planes, weights, flatten=flatten)
    return [
        [
            [_assemble_entry(out, index, c, d, n) for d in range(C)]
            for c in range(C)
        ]
        for n in range(n_sources)
    ]


def weighted_covariance_planes_array(planes, weights, flatten=True):
    """Array-output variant: ``U (N, F, C, C)`` complex (for matrix-layout
    consumers like the IP2 pairwise math)."""
    P = planes.shape[0]
    C = int(round(P**0.5))
    index, _ = _plane_index(C)
    n_sources = weights.shape[0]
    out = _covariance_planes(planes, weights, flatten=flatten)
    rows = [
        [
            jnp.stack(
                [_assemble_entry(out, index, c, d, n) for d in range(C)], axis=-1
            )
            for c in range(C)
        ]
        for n in range(n_sources)
    ]
    return jnp.stack(
        [jnp.stack(r, axis=-2) for r in rows]
    )  # (N, F, C, C)


def ip_sweep_from_planes(
    W, planes, inv_weights, threshold=1e12, guard="one_norm", flatten=True,
    denom_floor=None,
):
    """Fused covariance + IP sweep fully in component land.

    Args:
        W: demixing filters ``(F, N, C)`` (public layout).
        planes: from :func:`pair_products_planes`.
        inv_weights: ``(N, T)`` or ``(N, F, T)`` reciprocal variances.
        denom_floor: optional floor on the ``sqrt(w^H U w)`` normalizer
            (the t-family's reference semantics, ``bss/ilrma.py:981``).
    Returns:
        updated ``W (F, N, C)``.
    """
    n_sources, n_channels = W.shape[1], W.shape[2]
    U = weighted_covariance_components(planes, inv_weights, flatten=flatten)
    W_rows = [[W[:, s, c] for c in range(n_channels)] for s in range(n_sources)]
    W_rows = ip_update_components(
        W_rows, U, threshold=threshold, guard=guard, denom_floor=denom_floor
    )
    return jnp.stack([jnp.stack(row, axis=-1) for row in W_rows], axis=1)


def separate_components(W_rows, X):
    """``Y[n] = Σ_c w[n][c][:, None] · X[c]`` — elementwise over (F, T).

    ``W_rows[n][c]`` are complex ``(F,)``; returns ``Y (N, F, T)``.
    """
    n_channels = X.shape[0]
    rows = []
    for w_row in W_rows:
        acc = w_row[0][:, None] * X[0]
        for c in range(1, n_channels):
            acc = acc + w_row[c][:, None] * X[c]
        rows.append(acc)
    return jnp.stack(rows)


def _det_components(M, idx_rows, idx_cols):
    """Laplace-expansion determinant of the submatrix ``M[idx_rows][idx_cols]``
    where ``M[i][j]`` are ``(F,)`` arrays (unrolled at trace time)."""
    if len(idx_rows) == 1:
        return M[idx_rows[0]][idx_cols[0]]
    i = idx_rows[0]
    total = None
    for pos, j in enumerate(idx_cols):
        minor = _det_components(
            M, idx_rows[1:], idx_cols[:pos] + idx_cols[pos + 1 :]
        )
        term = M[i][j] * minor
        if pos % 2 == 1:
            term = -term
        total = term if total is None else total + term
    return total


def det_components(M, n):
    """Determinant of an n×n component matrix (list-of-lists of (F,) arrays)."""
    return _det_components(M, tuple(range(n)), tuple(range(n)))


def solve_column_components(M, n, col, det=None):
    """Column ``col`` of ``M^{-1}`` via the adjugate (Cramer), components.

    ``inv[:, col][i] = cof(M)[col][i] / det = (-1)^{i+col} minor(col, i) / det``.
    """
    if det is None:
        det = det_components(M, n)
    rows = tuple(range(n))
    out = []
    for i in range(n):
        minor_rows = tuple(r for r in rows if r != col)
        minor_cols = tuple(c for c in rows if c != i)
        minor = (
            _det_components(M, minor_rows, minor_cols)
            if n > 1
            else jnp.ones_like(det)
        )
        sign = -1 if (i + col) % 2 else 1
        out.append(sign * minor / det)
    return out


def cholesky_quadratic_components(U_n, w, tiny=1e-32):
    """``w^H U w`` for a Hermitian PSD ``U`` in component layout, computed as
    ``‖L^H w‖²`` via a closed-form Cholesky — a sum of squares, non-negative
    by construction.

    The direct sum ``Σ w_c* U_cd w_d`` catastrophically cancels in float32
    when the source-model weights are extreme: tILRMA at the reference
    default ``nu=1`` produces ``1/Xi`` spanning ~10 decades, the covariance
    entries reach ~1e3 with ``w`` ~1e2, and the O(1e8) products cancel to an
    O(1) result — the f32 rounding noise then flips ``wUw`` negative and
    ``sqrt`` NaNs the whole filter (observed at iteration ~70 on the quality
    fixture).  Factoring first keeps every term non-negative; the inner
    cancellations happen inside ``|·|²`` and can only cost relative accuracy,
    never the sign.

    ``U_n[c][d]``: complex ``(F,)`` planes (Hermitian: ``U[d][c] = U[c][d]*``);
    ``w``: list of C complex ``(F,)`` components.  Zero pivots (clamped Schur
    complements of a numerically rank-deficient PSD matrix) zero their column,
    the exact completion for PSD inputs.
    """
    C = len(w)
    L = [[None] * C for _ in range(C)]
    for j in range(C):
        s = U_n[j][j].real - sum(jnp.abs(L[j][k]) ** 2 for k in range(j))
        s = jnp.maximum(s, 0.0)
        d = jnp.sqrt(s)
        L[j][j] = d
        if j + 1 < C:
            d_safe = jnp.maximum(d, tiny)
            for i in range(j + 1, C):
                off = U_n[i][j] - sum(
                    L[i][k] * jnp.conj(L[j][k]) for k in range(j)
                )
                L[i][j] = jnp.where(s > 0, off / d_safe, 0.0)
    wUw = None
    for i in range(C):
        t = sum(jnp.conj(L[j][i]) * w[j] for j in range(i, C))
        term = jnp.abs(t) ** 2
        wUw = term if wUw is None else wUw + term
    return wUw


def ip_update_components(W_rows, U, threshold=1e12, guard="one_norm", denom_floor=None):
    """IP sweep in component layout; same semantics as ``ops.ip.ip_update``.

    ``W_rows[s][c]``: complex ``(F,)`` (mutated functionally);
    ``U[n][c][d]``: complex ``(F,)``.
    ``denom_floor``: optional floor on ``sqrt(w^H U w)`` (reference t-ILRMA
    floors it at eps, ``bss/ilrma.py:981``; the Gauss family does not).
    Returns the updated nested list.
    """
    n_sources = len(W_rows)
    n_channels = len(W_rows[0])
    W_rows = [list(row) for row in W_rows]

    for n in range(n_sources):
        U_n = U[n]
        # WU[s][j] = Σ_c W[s][c]·U_n[c][j]
        WU = [
            [
                sum(W_rows[s][c] * U_n[c][j] for c in range(n_channels))
                for j in range(n_channels)
            ]
            for s in range(n_sources)
        ]
        det = det_components(WU, n_channels)
        w_n = solve_column_components(WU, n_channels, n, det=det)  # (C,) of (F,)

        if guard == "none":
            ok = None
        else:
            # κ₁ = ‖WU‖₁·‖WU⁻¹‖₁ with the full inverse from the adjugate
            inv_cols = [
                solve_column_components(WU, n_channels, j, det=det)
                for j in range(n_channels)
            ]
            norm = jnp.stack(
                [
                    sum(jnp.abs(WU[i][j]) for i in range(n_channels))
                    for j in range(n_channels)
                ]
            ).max(axis=0)
            inv_norm = jnp.stack(
                [
                    sum(jnp.abs(inv_cols[j][i]) for i in range(n_channels))
                    for j in range(n_channels)
                ]
            ).max(axis=0)
            ok = norm * inv_norm < threshold

        # w^H U_n w — Cholesky sum-of-squares form (f32-safe, see
        # cholesky_quadratic_components)
        wUw = cholesky_quadratic_components(U_n, w_n)
        denom = jnp.sqrt(wUw)
        if denom_floor is not None:
            denom = jnp.maximum(denom, denom_floor)
        for c in range(n_channels):
            new_c = w_n[c].conj() / denom
            if ok is not None:
                new_c = jnp.where(ok, new_c, W_rows[n][c])
            W_rows[n][c] = new_c
    return W_rows


def log_abs_det_components(W_rows, n_channels):
    """``Σ_f log|det W_f|`` from component layout."""
    det = det_components(
        [[W_rows[i][j] for j in range(n_channels)] for i in range(n_channels)],
        n_channels,
    )
    return jnp.log(jnp.abs(det))


def weighted_covariance_planes_stack(planes, weights, flatten=True):
    """Planes-output variant of :func:`weighted_covariance_components`:
    ``U (N, C, C, F)`` complex — tiny axes leading, bins in the tile (for
    the IP2 planes path)."""
    P = planes.shape[0]
    C = int(round(P**0.5))
    index, _ = _plane_index(C)
    n_sources = weights.shape[0]
    out = _covariance_planes(planes, weights, flatten=flatten)
    return jnp.stack(
        [
            jnp.stack(
                [
                    jnp.stack(
                        [_assemble_entry(out, index, c, d, n) for d in range(C)]
                    )
                    for c in range(C)
                ]
            )
            for n in range(n_sources)
        ]
    )  # (N, C, C, F)


def ip2_pair_update_planes(W, U_mn, m, n, threshold=1e12, guard="one_norm"):
    """Pairwise (IP2) update of demixing rows ``(m, n)`` with every per-bin
    small-matrix quantity in planes layout and the batched LU inverses
    replaced by adjugate closed forms (same math as the matrix path in
    ``models/iva.py::_update_pairwise`` / reference ``bss/iva.py:566-599``).

    The matrix formulation materializes a chain of ``(F, C, C)``/``(F, C, 2)``
    tensors (tile-padded ~256×) and runs TWO batched LU inverses per step —
    measured 262 iters/s at the canonical config vs >8,000 for the planes
    path of the same cost class.

    Args:
        W: ``(F, N, C)`` demixing filter (square, C ≤ 3 for the closed
            forms; callers dispatch).
        U_mn: ``(2, C, C, F)`` weighted covariances for sources (m, n).
        m, n: traced int32 scalars (the pair indices).
        guard: 'one_norm' or 'none' (callers keep 'svd' on the matrix path).
    Returns:
        updated ``W`` (same shape).
    """
    from .fast_linalg import det_planes, inv_planes

    n_channels = W.shape[-1]
    C = n_channels
    Wc = [[W[:, i, c] for c in range(C)] for i in range(C)]

    # WU[p][i][j] = Σ_c W[i][c] U[p][c][j] — stacked (C, C, 2, F) for the
    # planes det/inv duals (leading (n, n) axes)
    WU = jnp.stack(
        [
            jnp.stack(
                [
                    sum(Wc[i][c][None] * U_mn[:, c, j] for c in range(C))
                    for j in range(C)
                ]
            )
            for i in range(C)
        ]
    )  # (C_i, C_j, 2, F)
    det = det_planes(WU)
    inv = inv_planes(WU, det=det)  # (C, C, 2, F): inv[i][j] = WU^{-1}[i, j]

    if guard == "none":
        ok = None
    else:
        # κ₁ = ‖WU‖₁·‖WU⁻¹‖₁ (same semantics as ops.ip.cond_guard)
        norm = jnp.max(jnp.sum(jnp.abs(WU), axis=0), axis=0)  # (2, F)
        inv_norm = jnp.max(jnp.sum(jnp.abs(inv), axis=0), axis=0)
        ok = norm * inv_norm < threshold  # (2, F)

    # P[p] = WU_p^{-1} E_mn: columns m and n of the inverse → (C, 2cols, 2p, F)
    P_cols = jnp.stack(
        [jnp.take(inv, m, axis=1), jnp.take(inv, n, axis=1)], axis=1
    )  # (C_i, 2cols, 2p, F)

    # V[p][a][b] = Σ_{c,d} conj(P[c][a]) U_p[c][d] P[d][b] → per p a 2×2 of planes
    UP = [
        [
            sum(U_mn[:, c, d] * P_cols[d, b] for d in range(C))
            for b in range(2)
        ]
        for c in range(C)
    ]  # UP[c][b] (2p, F)
    V = [
        [
            sum(P_cols[c, a].conj() * UP[c][b] for c in range(C))
            for b in range(2)
        ]
        for a in range(2)
    ]  # V[a][b] (2p, F)

    from .eig2 import generalized_eig2x2_descending_planes

    Vm = [[V[a][b][0] for b in range(2)] for a in range(2)]
    Vn = [[V[a][b][1] for b in range(2)] for a in range(2)]
    v_m, v_n = generalized_eig2x2_descending_planes(Vm, Vn)

    def normalize(v, Vp):
        vVv = sum(
            v[a].conj() * Vp[a][b] * v[b] for a in range(2) for b in range(2)
        )
        scale = jnp.sqrt(vVv)
        return (v[0] / scale, v[1] / scale)

    v_m = normalize(v_m, Vm)
    v_n = normalize(v_n, Vn)

    # w_p[c] = conj(Σ_a P_p[c][a] v_p[a]); P_p = P_cols[:, :, p]
    w_m = jnp.stack(
        [
            (P_cols[c, 0, 0] * v_m[0] + P_cols[c, 1, 0] * v_m[1]).conj()
            for c in range(C)
        ],
        axis=-1,
    )  # (F, C)
    w_n = jnp.stack(
        [
            (P_cols[c, 0, 1] * v_n[0] + P_cols[c, 1, 1] * v_n[1]).conj()
            for c in range(C)
        ],
        axis=-1,
    )
    old_m = jnp.take(W, m, axis=1)
    old_n = jnp.take(W, n, axis=1)
    if ok is not None:
        w_m = jnp.where(ok[0][:, None], w_m, old_m)
        w_n = jnp.where(ok[1][:, None], w_n, old_n)
    W = _dynamic_set_row(W, m, w_m)
    W = _dynamic_set_row(W, n, w_n)
    return W


def _dynamic_set_row(W, idx, row):
    """``W[:, idx, :] = row`` with a traced ``idx`` (one-hot blend — a
    dynamic-update-slice on axis 1 would relayout the whole filter)."""
    onehot = (jnp.arange(W.shape[1]) == idx)[None, :, None]
    return jnp.where(onehot, row[:, None, :], W)


def natural_grad_step_components(W_rows, Y, Phi, lr):
    """One natural-gradient step ``W ← W − lr·((Φ Y^H/T − I) W)`` in
    component layout (FDICA/IVA gradient families).

    The matrix-layout formulation transposes the estimates twice per
    iteration ((N, F, T) ⇄ (F, N, T), ~15 MB each at the canonical config)
    and materializes (F, C, C) tensors whose 2×2 minors pad to the TPU tile
    at ~256× the payload traffic.  Here the cross-moments
    ``G[n][m] = mean_t Φ_n Ȳ_m`` are (F,)-plane frame reductions and the
    update is component-vector arithmetic — no transposes, no (F, C, C)
    arrays.

    Args:
        W_rows: nested list ``[n][c]`` of complex ``(F,)`` demixing rows.
        Y: estimates ``(N, F, T)`` (the ``separate(X, W)`` invariant).
        Phi: score ``(N, F, T)`` (contrast-specific).
        lr: learning rate.
    Returns: updated ``W_rows``.
    """
    n_sources = len(W_rows)
    n_channels = len(W_rows[0])
    n_frames = Y.shape[-1]
    G = [
        [(Phi[n] * Y[m].conj()).sum(axis=-1) / n_frames for m in range(n_sources)]
        for n in range(n_sources)
    ]
    new_rows = []
    for n in range(n_sources):
        row = []
        for c in range(n_channels):
            delta = None
            for m in range(n_sources):
                g = G[n][m] - 1.0 if m == n else G[n][m]
                term = g * W_rows[m][c]
                delta = term if delta is None else delta + term
            row.append(W_rows[n][c] - lr * delta)
        new_rows.append(row)
    return new_rows


def plain_grad_step_components(W_rows, X, Phi, lr):
    """One plain-gradient step ``W ← W − lr·(Φ X^H/T − W^{-H})`` in
    component layout; the inverse-Hermitian term comes from the adjugate
    (closed forms, square W, N ≤ 4 — see :func:`solve_column_components`).
    """
    n_sources = len(W_rows)
    n_channels = len(W_rows[0])
    n_frames = X.shape[-1]
    det = det_components(W_rows, n_sources)
    # inv_cols[n] = column n of W^{-1}: inv_cols[n][c] = (W^{-1})[c, n]
    inv_cols = [
        solve_column_components(W_rows, n_sources, n, det=det)
        for n in range(n_sources)
    ]
    new_rows = []
    for n in range(n_sources):
        row = []
        for c in range(n_channels):
            px = (Phi[n] * X[c].conj()).sum(axis=-1) / n_frames
            w_invh = inv_cols[n][c].conj()  # W^{-H}[n, c]
            row.append(W_rows[n][c] - lr * (px - w_invh))
        new_rows.append(row)
    return new_rows


def auxiva_ip_step_components(X, W_rows, Y, planes, eps=1e-8, threshold=1e12):
    """Full AuxIVA-IP iteration in component layout.

    Args:
        X: mixture ``(C, F, T)`` complex.
        W_rows: demixing components, nested list ``[s][c]`` of complex ``(F,)``.
        Y: current estimates ``(N, F, T)`` complex.
        planes: stacked pair-product planes from :func:`pair_products_planes`.
    Returns:
        ``(W_rows_new, Y_new, nll)``.
    """
    n_channels = X.shape[0]
    n_frames = X.shape[-1]
    P = jnp.abs(Y) ** 2
    R = jnp.maximum(jnp.sqrt(P.sum(axis=1)), eps)  # (N, T)
    U = weighted_covariance_components(planes, 1.0 / R)
    W_rows = ip_update_components(W_rows, U, threshold=threshold)
    Y = separate_components(W_rows, X)
    nll = (2 * jnp.sqrt(jnp.sum(jnp.abs(Y) ** 2, axis=1))).sum() - 2 * n_frames * (
        log_abs_det_components(W_rows, n_channels).sum()
    )
    return W_rows, Y, nll
