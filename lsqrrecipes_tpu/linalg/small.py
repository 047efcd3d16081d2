"""Closed-form solvers for tiny systems — the TPU-friendly hot path.

TPU XLA does not implement f64 LU decomposition, and even where LAPACK-style
ops exist they are the wrong tool for batches of thousands of <=16x16
systems: the right formulation is straight-line arithmetic on the VPU.
These helpers are pure elementwise jnp (no LinAlg custom calls), batched
over leading axes, and differentiable.
"""

import jax
import jax.numpy as jnp


def solve2(a, b):
    """Cramer solve of ``a[..., 2, 2] x = b[..., 2]`` -> ``(x, det)``."""
    det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    safe = jnp.where(det == 0, 1.0, det)
    x0 = (a[..., 1, 1] * b[..., 0] - a[..., 0, 1] * b[..., 1]) / safe
    x1 = (a[..., 0, 0] * b[..., 1] - a[..., 1, 0] * b[..., 0]) / safe
    return jnp.stack([x0, x1], axis=-1), det


def solve3(a, b):
    """Adjugate (Cramer) solve of ``a[..., 3, 3] x = b[..., 3]`` -> ``(x, det)``.

    Same arithmetic as the reference's hand-coded 3D sphere solver
    (``SphereParametersEstimator.hxx:115-163``).
    """
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c10 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c20 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c10 + a[..., 0, 2] * c20

    c01 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c21 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]

    c02 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c12 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]

    safe = jnp.where(det == 0, 1.0, det)
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x0 = (c00 * b0 + c01 * b1 + c02 * b2) / safe
    x1 = (c10 * b0 + c11 * b1 + c12 * b2) / safe
    x2 = (c20 * b0 + c21 * b1 + c22 * b2) / safe
    return jnp.stack([x0, x1, x2], axis=-1), det


def cholesky_solve_lanes(a, b, n: int):
    """Unrolled Cholesky solve in LANES form: ``a[i][j]`` and ``b[i]`` are
    lists of ``[...]``-shaped (typically ``[B]``) arrays.

    Same arithmetic as :func:`cholesky_solve_unrolled`, but the n x n
    structure lives in Python lists instead of trailing array dims — a
    ``[B, 4, 4]`` f64 array tiles its last two dims to (8, 128) on TPU
    (~85x padding) and every slice/transpose of it is a relayout; lists of
    ``[B]`` vectors stay dense.  Returns ``(x_list, min_pivot)``."""
    dtype = b[0].dtype
    tiny = jnp.finfo(dtype).tiny
    l = [[None] * n for _ in range(n)]
    min_pivot = None
    for j in range(n):
        s = a[j][j]
        for k in range(j):
            s = s - l[j][k] * l[j][k]
        min_pivot = s if min_pivot is None else jnp.minimum(min_pivot, s)
        ljj = jnp.sqrt(jnp.maximum(s, tiny))
        l[j][j] = ljj
        for i in range(j + 1, n):
            t = a[i][j]
            for k in range(j):
                t = t - l[i][k] * l[j][k]
            l[i][j] = t / ljj
    y = [None] * n
    for i in range(n):
        t = b[i]
        for k in range(i):
            t = t - l[i][k] * y[k]
        y[i] = t / l[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        t = y[i]
        for k in range(i + 1, n):
            t = t - l[k][i] * x[k]
        x[i] = t / l[i][i]
    return x, min_pivot


def cholesky_solve_unrolled(a, b, n: int):
    """Unrolled Cholesky solve of SPD ``a[..., n, n] x = b[..., n]``.

    Compile-time-unrolled (n is static, intended n <= ~16): pure arithmetic,
    no custom calls, works for f64 on TPU, vmappable and differentiable.
    Returns ``(x, min_pivot)`` — ``min_pivot`` (the smallest diagonal entry
    of L, squared curvature) is the degeneracy signal; non-SPD inputs yield
    min_pivot <= 0.
    """
    tiny = jnp.finfo(a.dtype).tiny
    l = [[None] * n for _ in range(n)]
    min_pivot = None
    for j in range(n):
        s = a[..., j, j]
        for k in range(j):
            s = s - l[j][k] * l[j][k]
        min_pivot = s if min_pivot is None else jnp.minimum(min_pivot, s)
        ljj = jnp.sqrt(jnp.maximum(s, tiny))
        l[j][j] = ljj
        for i in range(j + 1, n):
            t = a[..., i, j]
            for k in range(j):
                t = t - l[i][k] * l[j][k]
            l[i][j] = t / ljj
    # Forward substitution L y = b.
    y = [None] * n
    for i in range(n):
        t = b[..., i]
        for k in range(i):
            t = t - l[i][k] * y[k]
        y[i] = t / l[i][i]
    # Back substitution L^T x = y.
    x = [None] * n
    for i in reversed(range(n)):
        t = y[i]
        for k in range(i + 1, n):
            t = t - l[k][i] * x[k]
        x[i] = t / l[i][i]
    return jnp.stack(x, axis=-1), min_pivot


def solve_spd(a, b):
    """SPD solve dispatcher: closed forms for n <= 3, unrolled Cholesky
    beyond.  ``a[..., n, n] x = b[..., n]`` -> ``(x, valid_signal)`` where
    valid_signal > 0 indicates a well-posed system."""
    n = a.shape[-1]
    if n == 1:
        d = a[..., 0, 0]
        return b / jnp.where(d == 0, 1.0, d), d
    if n == 2:
        x, det = solve2(a, b)
        return x, det
    if n == 3:
        x, det = solve3(a, b)
        return x, det
    return cholesky_solve_unrolled(a, b, n)


def qr_solve_lanes(rows, rhs, eps=1e-5):
    """Householder least-squares solve in LANES form: batch on the LANES.

    ``rows``: list (length R) of lists (length C) of ``[B]`` vectors — the
    system matrix with every scalar a batch vector; ``rhs``: list of R
    ``[B]`` vectors.  Returns ``(x, ok)`` with ``x`` a list of C ``[B]``
    vectors and ``ok`` a ``[B]`` bool degeneracy gate (a Householder pivot
    collapsed — the rank-deficient case).

    Rationale: a ``[B, R, C]`` array tiles its LAST TWO dims to (8, 128) on
    TPU, so tiny per-hypothesis systems waste ~100x memory and lanes; lists
    of ``[B]`` vectors keep the batch on the lanes and every operation a
    full-width VPU op.  QR (not normal equations) keeps the conditioning
    un-squared, so float32 is accurate enough for vote-grade solutions.
    Columns are pre-scaled to unit norm (restored on output) so the pivot
    gate is relative.
    """
    nr = len(rows)
    nc = len(rows[0])
    a = [[rows[r][c] for c in range(nc)] for r in range(nr)]
    b = list(rhs)

    # Column equilibration.
    inv_scale = []
    for c in range(nc):
        norm2 = sum(a[r][c] * a[r][c] for r in range(nr))
        s = jax.lax.rsqrt(jnp.maximum(norm2, jnp.finfo(norm2.dtype).tiny))
        inv_scale.append(s)
        for r in range(nr):
            a[r][c] = a[r][c] * s

    ok = None
    for k in range(nc):
        sigma = sum(a[r][k] * a[r][k] for r in range(k, nr))
        norm = jnp.sqrt(sigma)
        good = norm > eps
        ok = good if ok is None else jnp.logical_and(ok, good)
        akk = a[k][k]
        alpha = jnp.where(akk >= 0, -norm, norm)
        vk = akk - alpha
        # v^T v = -2 alpha vk, so H = I + v v^T / (alpha vk).
        denom = alpha * vk
        inv_denom = 1.0 / jnp.where(good, denom, 1.0)
        for j in range(k + 1, nc):
            w = vk * a[k][j]
            for r in range(k + 1, nr):
                w = w + a[r][k] * a[r][j]
            w = w * inv_denom
            a[k][j] = a[k][j] + vk * w
            for r in range(k + 1, nr):
                a[r][j] = a[r][j] + a[r][k] * w
        w = vk * b[k]
        for r in range(k + 1, nr):
            w = w + a[r][k] * b[r]
        w = w * inv_denom
        b[k] = b[k] + vk * w
        for r in range(k + 1, nr):
            b[r] = b[r] + a[r][k] * w
        a[k][k] = alpha

    x = [None] * nc
    for i in reversed(range(nc)):
        t = b[i]
        for j in range(i + 1, nc):
            t = t - a[i][j] * x[j]
        diag = a[i][i]
        x[i] = t / jnp.where(jnp.abs(diag) > eps, diag, 1.0)
    return [x[c] * inv_scale[c] for c in range(nc)], ok


def qr_r_planar(a):
    """Householder QR, R factor only, in PLANAR form: ``a[n, n, B]`` with
    the batch on the LANES (rows axis 0, columns axis 1).  Returns the same
    layout with the upper triangle of R valid and the strict lower triangle
    ZEROED.  One ``lax.scan`` over the n Householder steps keeps the HLO
    graph tiny (a fully unrolled 31x31 factor took ~2 min of XLA compile;
    batched ``[B, n, n]`` QR custom calls are latency-bound, ~31 ms at
    B=2048; this is both small to compile and ~1 ms to run).

    NO column equilibration (deliberate — see
    ``ops/us_fast._plane_phantom_fit_slots``: rescaled columns change the
    smallest-singular-vector minimizer under noise).  Zero-norm pivot
    columns leave a zero on the diagonal; callers clamp the diagonal to
    their own noise floor before inverting.
    """
    n = a.shape[0]
    idx = jnp.arange(n)

    def step(am, k):
        ge = (idx >= k)[:, None]                        # [n, 1] row mask
        gt = (idx > k)[:, None]
        colk = jax.lax.dynamic_slice_in_dim(am, k, 1, axis=1)[:, 0, :]
        colk_ge = jnp.where(ge, colk, 0.0)              # [n, B]
        colk_gt = jnp.where(gt, colk, 0.0)
        sigma = jnp.sum(colk_ge * colk_ge, axis=0)      # [B]
        norm = jnp.sqrt(sigma)
        akk = jax.lax.dynamic_slice_in_dim(colk, k, 1, axis=0)[0]
        alpha = jnp.where(akk >= 0, -norm, norm)
        vk = akk - alpha
        denom = alpha * vk
        good = jnp.abs(denom) > 0
        inv_denom = jnp.where(good, 1.0 / jnp.where(good, denom, 1.0), 0.0)
        row_k = jax.lax.dynamic_slice_in_dim(am, k, 1, axis=0)[0]  # [n, B]
        # w[j] = (vk a[k, j] + sum_{r>k} a[r, k] a[r, j]) / denom, all j at
        # once; columns <= k of rows >= k take spent-Householder garbage
        # that nothing reads (the lower triangle is zeroed at the end).
        w = vk[None, :] * row_k + jnp.sum(colk_gt[:, None, :] * am, axis=0)
        w = w * inv_denom[None, :]
        am = am + colk_gt[:, None, :] * w[None, :, :]
        new_row_k = row_k + vk[None, :] * w
        new_row_k = jax.lax.dynamic_update_slice_in_dim(
            new_row_k, alpha[None, :], k, axis=0
        )
        am = jax.lax.dynamic_update_slice_in_dim(
            am, new_row_k[None], k, axis=0
        )
        return am, None

    am, _ = jax.lax.scan(step, a, idx)
    tri = (idx[:, None] <= idx[None, :])[:, :, None]
    return jnp.where(tri, am, 0.0)


def solve_rt_r_planar(r_planar, d, v):
    """``z = R^{-1} R^{-T} v`` in planar form (one inverse-iteration step
    with the normal matrix ``A^T A = R^T R``).  ``r_planar``: ``[n, n, B]``
    from :func:`qr_r_planar` (lower triangle zero); ``d``: ``[n, B]``
    diagonal, pre-clamped by the caller (the stored diagonal is IGNORED so
    clamping needs no matrix update); ``v``: ``[q, n, B]`` right-hand
    sides.  Returns ``[q, n, B]``."""
    n = d.shape[0]
    idx = jnp.arange(n)

    # Forward: R^T y = v.  acc[:, m] accumulates sum_{j<m} R[j, m] y_j;
    # the diagonal contribution R[i, i] y_i lands on already-consumed
    # positions and is harmless.
    def fwd(acc, k):
        vi = jax.lax.dynamic_slice_in_dim(v, k, 1, axis=1)[:, 0, :]
        ai = jax.lax.dynamic_slice_in_dim(acc, k, 1, axis=1)[:, 0, :]
        di = jax.lax.dynamic_slice_in_dim(d, k, 1, axis=0)[0]
        yi = (vi - ai) / di[None, :]                    # [q, B]
        ri = jax.lax.dynamic_slice_in_dim(r_planar, k, 1, axis=0)[0]
        acc = acc + ri[None, :, :] * yi[:, None, :]
        return acc, yi

    _, ys = jax.lax.scan(fwd, jnp.zeros_like(v), idx)   # [n, q, B]

    # Back: R z = y, descending; unfilled z positions are zero, so the
    # full-row dot picks up exactly sum_{j>i} R[i, j] z_j.
    def bwd(z, inp):
        k, yk = inp
        ri = jax.lax.dynamic_slice_in_dim(r_planar, k, 1, axis=0)[0]
        di = jax.lax.dynamic_slice_in_dim(d, k, 1, axis=0)[0]
        s = jnp.sum(ri[None, :, :] * z, axis=1)         # [q, B]
        zi = (yk - s) / di[None, :]
        z = jax.lax.dynamic_update_slice(z, zi[:, None, :], (0, k, 0))
        return z, None

    z, _ = jax.lax.scan(bwd, jnp.zeros_like(v), (idx[::-1], ys[::-1]))
    return z
