"""Batched fast-hypothesize path for the US-calibration estimators.

The generic engine vmaps each estimator's ``minimal_fit`` — for crosswire
that is a 12x12 f64 SVD pseudo-inverse per hypothesis
(``SinglePointTargetUSCalibrationParametersEstimator.cxx:120-270``), which
on TPU serializes into LinAlg custom calls.  This module replaces the whole
hypothesize+vote step with TPU-shaped batched arithmetic:

  * **Lanes-first layout.**  A ``[B, 12, 12]`` array tiles its last two dims
    to (8, 128) on TPU — ~100x padding waste (the repo's "[B, k, d]" trap).
    Every per-hypothesis scalar here is instead a ``[B]`` vector (batch on
    the lanes); the whole minimal fit is straight-line VPU code.
  * **f32 Householder QR** (:func:`lsqrrecipes_tpu.linalg.small.
    qr_solve_lanes`) on the minimal system — QR keeps the conditioning
    un-squared (normal equations in f32 lost ~2 digits and flipped vote
    blocks; f64 emulation was ~10x slower than the entire vote).  The
    equilibrated QR pivot gate is the f32 analogue of the reference's
    FLT_EPSILON rank test (``cxx:192-197``).
  * the closest-rotation orthonormalization (reference: SVD ``U V^T``,
    ``cxx:220-229``) as a **Newton polar iteration** ``X <- (X + X^-T)/2``
    with adjugate inverses — the raw frame ``[c1/|c1|, c2/|c2|, r1 x r2]``
    has det >= 0, so the polar factor is the same rotation the SVD gives;
  * batched gimbal-safe Euler-ZYX extraction (``cxx:230-247``);
  * a **compact matmul vote** that exploits R2's orthogonality:
    ``||R2 img + t2 - t1||^2 = ||img + R2^T t2 - R2^T t1||^2``, so each
    residual component is affine in only 15 per-element features
    ``[u, v, 1, R2^T t2 (3), vec(R2) (9)]`` (crosswire; pointer needs just 6
    with ``w = R2^T (p - t2)``) instead of 31 — and the products run as
    3-pass bf16-split matmuls (exact for bf16-split operands, ~2^-22
    relative) rather than 6-pass HIGHEST.

Everything runs in float32 (throughput path — the f64 engine retains exact
reference semantics); counts can differ from the f64 vote by border-point
flips, same contract as the fused Pallas families.
"""

import functools

import jax
import jax.numpy as jnp

from lsqrrecipes_tpu.linalg.small import qr_solve_lanes


def _split3_matmul(a, f):
    """~f32-accurate ``a[B, K] @ f[n, K]^T`` in three bf16-pass products.

    Splitting each operand into bf16 high + low parts makes every partial
    product exactly representable in a bf16-multiply/f32-accumulate pass;
    dropping the lo*lo term leaves ~2^-22 relative error.
    """
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    f_hi = f.astype(jnp.bfloat16).astype(jnp.float32)
    f_lo = f - f_hi

    def d(x, y):
        return jnp.einsum("bk,nk->bn", x, y)

    return d(a_hi, f_hi) + d(a_hi, f_lo) + d(a_lo, f_hi)


# ---------------------------------------------------------------------------
# Lanes-form 3x3 helpers (nested lists of [B] vectors)
# ---------------------------------------------------------------------------


def _cof3_lanes(x):
    """Cofactor matrix of a lanes-form 3x3 (cyclic-index expansion)."""
    c = [[None] * 3 for _ in range(3)]
    for i in range(3):
        i1, i2 = (i + 1) % 3, (i + 2) % 3
        for j in range(3):
            j1, j2 = (j + 1) % 3, (j + 2) % 3
            c[i][j] = x[i1][j1] * x[i2][j2] - x[i1][j2] * x[i2][j1]
    return c


def polar3_lanes(m, iters: int = 5):
    """Closest rotation to a lanes-form 3x3 with det > 0 via Newton polar
    iteration ``X <- (X + X^-T) / 2`` — quadratic convergence, no SVD.
    Returns ``(R, ok)``."""
    x = m
    ok = None
    for _ in range(iters):
        c = _cof3_lanes(x)
        det = x[0][0] * c[0][0] + x[0][1] * c[0][1] + x[0][2] * c[0][2]
        good = jnp.abs(det) > 1e-9
        ok = good if ok is None else jnp.logical_and(ok, good)
        inv = 1.0 / jnp.where(good, det, 1.0)
        x = [
            [0.5 * (x[i][j] + c[i][j] * inv) for j in range(3)]
            for i in range(3)
        ]
    return x, ok


def euler_zyx_plus_lanes(r):
    """Lanes-form '+sqrt' Euler-ZYX extraction with the gimbal branch
    (``SinglePointTarget...cxx:230-247``): returns ``(wz, wy, wx)`` [B]."""
    wy = jnp.arctan2(-r[2][0], jnp.sqrt(r[0][0] ** 2 + r[1][0] ** 2))
    small_angle = 0.008726535498373935
    half_pi = 1.5707963267948966
    gimbal = jnp.logical_not(
        jnp.logical_and(
            jnp.abs(wy - half_pi) > small_angle,
            jnp.abs(wy + half_pi) > small_angle,
        )
    )
    cy = jnp.where(gimbal, 1.0, jnp.cos(wy))
    wz = jnp.where(gimbal, 0.0, jnp.arctan2(r[1][0] / cy, r[0][0] / cy))
    wx = jnp.where(
        gimbal,
        jnp.arctan2(r[0][1], r[1][1]),
        jnp.arctan2(r[2][1] / cy, r[2][2] / cy),
    )
    return wz, wy, wx


def _orthonormalize_lanes(c1, c2):
    """Lanes-form scales + closest rotation from raw scaled columns
    (reference semantics, ``cxx:204-229``).  ``c1``/``c2``: length-3 lists of
    [B] vectors -> ``(m_x, m_y, r3, ok)`` with r3 a lanes-form 3x3."""
    n1 = c1[0] * c1[0] + c1[1] * c1[1] + c1[2] * c1[2]
    n2 = c2[0] * c2[0] + c2[1] * c2[1] + c2[2] * c2[2]
    ok = jnp.logical_and(n1 > 1e-20, n2 > 1e-20)
    i1 = jax.lax.rsqrt(jnp.maximum(n1, 1e-30))
    i2 = jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
    r1 = [c1[i] * i1 for i in range(3)]
    r2 = [c2[i] * i2 for i in range(3)]
    r3col = [
        r1[1] * r2[2] - r1[2] * r2[1],
        r1[2] * r2[0] - r1[0] * r2[2],
        r1[0] * r2[1] - r1[1] * r2[0],
    ]
    raw = [[r1[i], r2[i], r3col[i]] for i in range(3)]
    rot, pok = polar3_lanes(raw)
    return n1 * i1, n2 * i2, rot, jnp.logical_and(ok, pok)


# ---------------------------------------------------------------------------
# Minimal fits (lanes-form f32 QR)
# ---------------------------------------------------------------------------


# Fits consume "slot" accessors: slot(a, f) -> the [B] lane vector of
# per-element feature f of sample slot a.  Slot feature layouts:
#   crosswire: [vec(R2) 9, t2 3, u, v]                  (F = 14)
#   pointer:   [vec(R2) 9, t2 3, u, v, p 3]             (F = 17)
# The same fit code then runs off materialized [B, k, F] samples (engine
# fit_and_vote hook) or off planar [k*F, B] sampling planes (the
# zero-materialization structured sweep) without caring which.


def _crosswire_fit_slots(slot, k: int):
    """Minimal 3k x 12 system ``[u R2 | v R2 | R2 | -I] x = -t2``
    (``SinglePointTarget...cxx:120-270``) in lanes form ->
    ``(params[B, 20], valid[B])``."""
    zero = jnp.zeros_like(slot(0, 12))
    one = zero + 1.0
    rows, rhs = [], []
    for a in range(k):
        u, v = slot(a, 12), slot(a, 13)
        for j in range(3):
            row = [None] * 12
            for c in range(3):
                r_jc = slot(a, 3 * j + c)
                row[c] = u * r_jc
                row[3 + c] = v * r_jc
                row[6 + c] = r_jc
                row[9 + c] = -one if j == c else zero
            rows.append(row)
            rhs.append(-slot(a, 9 + j))
    x, valid = qr_solve_lanes(rows, rhs)

    m_x, m_y, r3, ok = _orthonormalize_lanes(x[0:3], x[3:6])
    wz, wy, wx = euler_zyx_plus_lanes(r3)
    cols = (
        [x[9 + i] for i in range(3)]                 # t1
        + [x[6 + i] for i in range(3)]               # t3
        + [wz, wy, wx, m_x, m_y]
        + [m_x * r3[i][0] for i in range(3)]
        + [m_y * r3[i][1] for i in range(3)]
        + [r3[i][2] for i in range(3)]
    )
    return jnp.stack(cols, axis=-1), jnp.logical_and(valid, ok)


def _pointer_fit_slots(slot, k: int):
    """Minimal 3k x 9 system ``[u R2 | v R2 | R2] x = p - t2``
    (``cxx:763-914``) -> ``(params[B, 17], valid[B])``."""
    rows, rhs = [], []
    for a in range(k):
        u, v = slot(a, 12), slot(a, 13)
        for j in range(3):
            row = [None] * 9
            for c in range(3):
                r_jc = slot(a, 3 * j + c)
                row[c] = u * r_jc
                row[3 + c] = v * r_jc
                row[6 + c] = r_jc
            rows.append(row)
            rhs.append(slot(a, 14 + j) - slot(a, 9 + j))
    x, valid = qr_solve_lanes(rows, rhs)

    m_x, m_y, r3, ok = _orthonormalize_lanes(x[0:3], x[3:6])
    wz, wy, wx = euler_zyx_plus_lanes(r3)
    cols = (
        [x[6 + i] for i in range(3)]                 # t3
        + [wz, wy, wx, m_x, m_y]
        + [m_x * r3[i][0] for i in range(3)]
        + [m_y * r3[i][1] for i in range(3)]
        + [r3[i][2] for i in range(3)]
    )
    return jnp.stack(cols, axis=-1), jnp.logical_and(valid, ok)


# ---------------------------------------------------------------------------
# Plane phantom (k = 31): batched homogeneous null-vector fit
# ---------------------------------------------------------------------------
#
# The reference computes the null vector of the homogeneous 31x31 system by
# SVD per sample (``PlanePhantomUSCalibrationParametersEstimator.cxx:137-355``);
# vmapping that f64 SVD serializes into LinAlg custom calls.  Here the null
# direction comes from INVERSE ITERATION on the shifted normal matrix
# ``G = A^T A + lambda I``: one batched matmul, one batched Cholesky, and a
# fixed number of batched triangular solves — no SVD, no convergence loop,
# everything pipelined across the batch by XLA.
#
# The fit runs in the DATA dtype (f64 under the engine) rather than the f32
# used everywhere else in this module, and that is deliberate: at reference
# noise levels the (equilibrated) spectrum has sigma_31 ~ 3e-4 with gap
# sigma_30 - sigma_31 ~ 5e-4, so any f32 factorization (backward error
# ~1e-6 * ||A||) perturbs the null direction by ~1e-2 — which the t2-column
# scales amplify into millimetres of t3 error and tens of flipped votes
# (measured).  In f64 the squared spectrum still sits ~8 orders above the
# rounding floor, so normal equations are safe and the direction matches
# the reference SVD's to ~1e-9.  Column equilibration is NOT applied: under
# noise the rescaled system has a genuinely different minimizer, and the
# reference SVD runs on the raw system.  The vote stays f32.
#
# A second, deflated inverse iteration estimates sigma_30 (second-smallest),
# reproducing the reference's unique-null-space rank gate: duplicate rows
# from replication padding give a >= 2-dim null space and are rejected.

# The reference's FLT_EPSILON-relative rank gate (``cxx:205-218``):
# sigma_30 must exceed FLT_EPS * max(sigma_0, 1).  Duplicate-row degeneracy
# gives sigma_30 ~ dtype-eps * sigma_0, genuine 31-pose samples sit orders
# of magnitude above the gate.
_PHANTOM_FLT_EPS = 1.192092896e-07


def _phantom_rows_from_slots(slot, k):
    """``[B, 31, 31]`` homogeneous rows ``[u vec(R2), v vec(R2), vec(R2),
    t2, 1]`` (``PlanePhantom...cxx:137-203``) from crosswire slot features.

    The Kronecker block ``[u r, v r, r] = [u, v, 1] (x) r`` is built as ONE
    broadcast multiply: the scalarized 961-op version cost 8 ms of the
    fit's 62 ms at B=2048 in emulated f64 (measured)."""
    sf = jnp.stack(
        [
            jnp.stack([slot(a, f) for f in range(14)], axis=-1)
            for a in range(k)
        ],
        axis=1,
    )                                              # [B, k, 14]
    r = sf[..., 0:9]
    t = sf[..., 9:12]
    u = sf[..., 12:13]
    v = sf[..., 13:14]
    one = jnp.ones_like(u)
    w = jnp.concatenate([u, v, one], axis=-1)      # [B, k, 3]
    a1 = (w[..., :, None] * r[..., None, :]).reshape(*r.shape[:-1], 27)
    return jnp.concatenate([a1, t, one], axis=-1)  # [B, k, 31]


def _tri_inv_lower(l):
    """Batched lower-triangular inverse by divide-and-conquer.

    ``inv([[A, 0], [C, D]]) = [[A^-1, 0], [-D^-1 C A^-1, D^-1]]`` recursed
    to 1x1/2x2 base cases: ~2 batched matmuls per level instead of XLA's
    sequential per-column TriangularSolve scan — the scan is latency-bound
    in emulated f64 (a 31-column solve cost 24 ms at B=2048; this is ~3 ms)."""
    m = l.shape[-1]
    if m == 1:
        return 1.0 / l
    if m == 2:
        a = l[..., 0:1, 0:1]
        c = l[..., 1:2, 0:1]
        d = l[..., 1:2, 1:2]
        ai, di = 1.0 / a, 1.0 / d
        zero = jnp.zeros_like(c)
        return jnp.concatenate(
            [
                jnp.concatenate([ai, zero], axis=-1),
                jnp.concatenate([-di * c * ai, di], axis=-1),
            ],
            axis=-2,
        )
    h = m // 2
    ai = _tri_inv_lower(l[..., :h, :h])
    di = _tri_inv_lower(l[..., h:, h:])
    ci = -jnp.einsum(
        "...ij,...jk,...kl->...il", di, l[..., h:, :h], ai
    )
    top = jnp.concatenate([ai, jnp.zeros_like(l[..., :h, h:])], axis=-1)
    return jnp.concatenate(
        [top, jnp.concatenate([ci, di], axis=-1)], axis=-2
    )


def _plane_phantom_fit_slots(slot, k: int):
    """Batched k=31 minimal fit -> ``(params[B, 41], valid[B])``.

    Null vector by inverse iteration (see module comment), then the
    reference's reconstruction (``PlanePhantom...cxx:204-355``) vectorized
    over the batch: column-group averaging, Newton-polar orthonormalization,
    gimbal-safe Euler extraction, derived-entry expansion."""
    a = _phantom_rows_from_slots(slot, k)         # [B, k, 31], data dtype
    # NO column equilibration: under noise the smallest singular vector of a
    # rescaled system is a DIFFERENT minimizer, and the reference SVD runs on
    # the raw system (cxx:205-218).  f64 absorbs the squared conditioning.
    g = jnp.einsum(
        "bki,bkj->bij", a, a, precision=jax.lax.Precision.HIGHEST
    )
    trace = jnp.trace(g, axis1=-2, axis2=-1)
    lam = (1e3 * jnp.finfo(g.dtype).eps) * jnp.maximum(trace, 1.0)
    eye = jnp.eye(31, dtype=g.dtype)
    chol = jnp.linalg.cholesky(g + lam[:, None, None] * eye)
    chol_ok = jnp.all(jnp.isfinite(chol), axis=(1, 2))
    chol = jnp.where(chol_ok[:, None, None], chol, eye)

    # Explicit (G + lam I)^{-1} = L^{-T} L^{-1} with the triangular inverse
    # computed by divide-and-conquer matmuls (see :func:`_tri_inv_lower`);
    # every inverse-iteration step is then a batched matvec.  Per-iteration
    # TriangularSolves lower to sequential latency-bound scans in emulated
    # f64 and cost ~10x more (measured).
    linv = _tri_inv_lower(chol)
    minv = jnp.einsum("bki,bkj->bij", linv, linv)      # L^{-T} L^{-1}

    def inv_apply(v):
        # (G + lam I)^{-1} v — inverse iteration step toward the smallest
        # right-singular direction of Ae.
        return jnp.einsum("bij,bj->bi", minv, v)

    def normalize(v):
        return v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30
        )

    def sigma_sq(v):
        return jnp.einsum("bi,bij,bj->b", v, g, v)

    bsz = a.shape[0]
    x = jnp.ones((bsz, 31), g.dtype) / jnp.sqrt(31.0)
    # Convergence ratio per step is (sigma31^2+lam)/(sigma30^2+lam) <~ 0.2
    # at reference noise but degrades on marginal-gap samples; 10 steps
    # keep the worst measured sample inside the vote's border-flip scale
    # (8 steps flipped counts).
    for _ in range(10):
        x = normalize(inv_apply(x))
    # Deflated second vector -> sigma_30^2 estimate, plus a power-iteration
    # sigma_0^2 estimate, reproducing the reference's rank gate
    # ``s[29] > FLT_EPS * max(s[0], 1)`` (``cxx:205-218`` via
    # ``us_calibration.py:547``).
    y = jnp.tile(
        jnp.asarray([1.0, -1.0], g.dtype), 16
    )[:31] / jnp.sqrt(31.0)
    y = jnp.broadcast_to(y, (bsz, 31))
    for _ in range(4):
        y = inv_apply(y)
        y = normalize(y - jnp.sum(x * y, axis=-1, keepdims=True) * x)
    p = jnp.broadcast_to(
        jnp.ones((31,), g.dtype) / jnp.sqrt(31.0), (bsz, 31)
    )
    for _ in range(2):
        p = normalize(jnp.einsum("bij,bj->bi", g, p))
    sig0_sq = sigma_sq(p)
    rank_ok = sigma_sq(y) > _PHANTOM_FLT_EPS**2 * jnp.maximum(sig0_sq, 1.0)

    xr = x
    denom = jnp.linalg.norm(xr[:, 27:30], axis=-1)
    nondeg = denom > 1e-30
    xr = xr / jnp.where(nondeg, denom, 1.0)[:, None]

    r1 = xr[:, 27:30]                             # R1 row 3 (plane normal)
    t1_z = xr[:, 30]
    wy1 = jnp.arctan2(-r1[:, 0], jnp.sqrt(r1[:, 1] ** 2 + r1[:, 2] ** 2))
    small_angle = 0.008726535498373935
    half_pi = 1.5707963267948966
    gimbal = jnp.logical_not(
        jnp.logical_and(
            jnp.abs(wy1 - half_pi) > small_angle,
            jnp.abs(wy1 + half_pi) > small_angle,
        )
    )
    cy1 = jnp.where(gimbal, 1.0, jnp.cos(wy1))
    wx1 = jnp.where(
        gimbal, 0.0, jnp.arctan2(r1[:, 1] / cy1, r1[:, 2] / cy1)
    )

    inv = 1.0 / jnp.where(jnp.abs(r1) > 1e-30, r1, 1.0)
    c1 = jnp.mean(xr[:, 0:9].reshape(-1, 3, 3) * inv[:, :, None], axis=1)
    c2 = jnp.mean(xr[:, 9:18].reshape(-1, 3, 3) * inv[:, :, None], axis=1)
    t3 = jnp.mean(xr[:, 18:27].reshape(-1, 3, 3) * inv[:, :, None], axis=1)

    m_x, m_y, r3, ok = _orthonormalize_lanes(
        [c1[:, 0], c1[:, 1], c1[:, 2]], [c2[:, 0], c2[:, 1], c2[:, 2]]
    )
    wz3, wy3, wx3 = euler_zyx_plus_lanes(r3)
    col0 = [r3[i][0] for i in range(3)]
    col1 = [r3[i][1] for i in range(3)]
    m1 = [m_x * r1[:, j] * col0[c] for j in range(3) for c in range(3)]
    m2 = [m_y * r1[:, j] * col1[c] for j in range(3) for c in range(3)]
    m3 = [r1[:, j] * t3[:, c] for j in range(3) for c in range(3)]
    cols = (
        [wy1, wx1, t1_z, t3[:, 0], t3[:, 1], t3[:, 2], wz3, wy3, wx3, m_x, m_y]
        + m1 + m2 + m3 + [r1[:, 0], r1[:, 1], r1[:, 2]]
    )
    valid = jnp.logical_and(
        jnp.logical_and(chol_ok, rank_ok), jnp.logical_and(nondeg, ok)
    )
    return jnp.stack(cols, axis=-1), valid


# ---------------------------------------------------------------------------
# Compact votes (R2-orthogonality form)
# ---------------------------------------------------------------------------


def _features_crosswire(data):
    """``[n, 15]`` = ``[u, v, 1, R2^T t2 (3), vec(R2) (9)]`` (f32)."""
    frames, q = data
    f32 = jnp.float32
    r2 = jnp.asarray(frames.r, f32)
    t2 = jnp.asarray(frames.t, f32)
    q32 = jnp.asarray(q, f32)
    rt2 = jnp.einsum("nij,ni->nj", r2, t2)
    return jnp.concatenate(
        [
            q32,
            jnp.ones((q32.shape[0], 1), f32),
            rt2,
            r2.reshape(-1, 9),
        ],
        axis=-1,
    )


def _vote_rows_crosswire(params):
    """``a_j[B, 15]`` with ``e_j = u c1_j + v c2_j + t3_j + (R2^T t2)_j
    - (R2 col j) . t1``; vec(R2) is row-major so column j lives at 3k+j."""
    bsz = params.shape[0]
    dt = params.dtype
    t1 = params[:, 0:3]
    rows = []
    for j in range(3):
        rblock = jnp.zeros((bsz, 3, 3), dt).at[:, :, j].set(-t1).reshape(bsz, 9)
        rows.append(
            jnp.concatenate(
                [
                    params[:, 11 + j : 12 + j],        # c1_j = m_x R3(j, 0)
                    params[:, 14 + j : 15 + j],        # c2_j
                    params[:, 3 + j : 4 + j],          # t3_j
                    jnp.zeros((bsz, 3), dt).at[:, j].set(1.0),
                    rblock,
                ],
                axis=-1,
            )
        )
    return rows


def _features_pointer(data):
    """``[n, 6]`` = ``[u, v, 1, R2^T (p - t2) (3)]`` (f32)."""
    frames, q, p = data
    f32 = jnp.float32
    r2 = jnp.asarray(frames.r, f32)
    w = jnp.einsum(
        "nij,ni->nj", r2, jnp.asarray(p, f32) - jnp.asarray(frames.t, f32)
    )
    q32 = jnp.asarray(q, f32)
    return jnp.concatenate(
        [q32, jnp.ones((q32.shape[0], 1), f32), w], axis=-1
    )


def _vote_rows_pointer(params):
    """``a_j[B, 6]``: ``e_j = u c1_j + v c2_j + t3_j - w_j``."""
    bsz = params.shape[0]
    dt = params.dtype
    rows = []
    for j in range(3):
        rows.append(
            jnp.concatenate(
                [
                    params[:, 8 + j : 9 + j],
                    params[:, 11 + j : 12 + j],
                    params[:, j : j + 1],              # t3_j
                    jnp.zeros((bsz, 3), dt).at[:, j].set(-1.0),
                ],
                axis=-1,
            )
        )
    return rows


def _features_phantom(data):
    """``[n, 31]`` f32 = ``[u vec(R2) 9, v vec(R2) 9, vec(R2) 9, t2 3, 1]``
    (the f32 twin of ``us_calibration._crosswire_features``)."""
    frames, q = data
    f32 = jnp.float32
    r2 = jnp.asarray(frames.r, f32).reshape(-1, 9)
    t2 = jnp.asarray(frames.t, f32)
    q32 = jnp.asarray(q, f32)
    return jnp.concatenate(
        [
            q32[:, 0:1] * r2,
            q32[:, 1:2] * r2,
            r2,
            t2,
            jnp.ones((q32.shape[0], 1), f32),
        ],
        axis=-1,
    )


def _vote_rows_phantom(params):
    """Single scalar residual: ``a[B, 31] = [m1, m2, m3, r1_row3, t1_z]``
    (``PlanePhantom...cxx:73-117``)."""
    return [jnp.concatenate([params[:, 11:41], params[:, 2:3]], axis=-1)]


# Per-element slot-feature builders ([n, F], f32).
def _slot_features_crosswire(data):
    frames, q = data
    f32 = jnp.float32
    return jnp.concatenate(
        [
            jnp.asarray(frames.r, f32).reshape(-1, 9),
            jnp.asarray(frames.t, f32),
            jnp.asarray(q, f32),
        ],
        axis=-1,
    )


def _slot_features_pointer(data):
    frames, q, p = data
    f32 = jnp.float32
    return jnp.concatenate(
        [
            jnp.asarray(frames.r, f32).reshape(-1, 9),
            jnp.asarray(frames.t, f32),
            jnp.asarray(q, f32),
            jnp.asarray(p, f32),
        ],
        axis=-1,
    )


def _slot_features_phantom(data):
    """Crosswire slot layout but PRESERVING the input dtype: the k=31 fit
    deliberately runs in the engine's f64 (see the plane-phantom section
    comment) while the vote features stay f32."""
    frames, q = data
    return jnp.concatenate(
        [frames.r.reshape(-1, 9), frames.t, q], axis=-1
    )


def _samples_to_slot_features(kind, samples):
    """Materialized engine samples (pytree with leading [B, k]) -> the same
    [B, k, F] slot-feature layout the planar sweep uses."""
    flat = jax.tree_util.tree_map(
        lambda a: a.reshape(-1, *a.shape[2:]), samples
    )
    _, _, _, _, slot_features, _ = _KINDS[kind]
    f = slot_features(flat)
    leading = jax.tree_util.tree_leaves(samples)[0].shape[:2]
    return f.reshape(*leading, f.shape[-1])


_KINDS = {
    "crosswire": (_crosswire_fit_slots, 4, _vote_rows_crosswire,
                  _features_crosswire, _slot_features_crosswire, 20),
    "pointer": (_pointer_fit_slots, 3, _vote_rows_pointer,
                _features_pointer, _slot_features_pointer, 17),
    # plane phantom shares the crosswire slot layout (same data pytree)
    "plane_phantom": (_plane_phantom_fit_slots, 31, _vote_rows_phantom,
                      _features_phantom, _slot_features_phantom, 41),
}


def _fit_vote_chunk(kind, delta_sq, slot, feats):
    fit, k, vote_rows, _, _, _ = _KINDS[kind]
    params, valid = fit(slot, k)
    d2 = None
    # The plane-phantom fit returns f64 params; the vote always runs f32.
    for a_j in vote_rows(params.astype(feats.dtype)):
        e = _split3_matmul(a_j, feats)
        d2 = e * e if d2 is None else d2 + e * e
    counts = jnp.sum(d2 < delta_sq, axis=-1)
    return jnp.where(valid, counts, -1), params


def _chunk_size(bsz, n, k=4):
    # ~4M residual cells per chunk keeps the [chunk, n] vote tile VMEM-sized;
    # the k*k bound keeps the plane-phantom [chunk, 31, 31] normal matrices
    # (and their Cholesky workspace) similarly bounded.
    return min(bsz, max(256, (1 << 22) // max(n, k * k)))


@functools.partial(jax.jit, static_argnames=("kind", "delta_sq", "chunk"))
def _fit_and_vote_planes(kind, delta_sq, chunk, planes, feats):
    """planes: [k, F, B] sampling planes (B on lanes)."""
    nparams = _KINDS[kind][5]
    nc = planes.shape[-1] // chunk
    chunked = jnp.moveaxis(
        planes.reshape(*planes.shape[:-1], nc, chunk), -2, 0
    )  # [nc, k, F, chunk]

    def step(pl_chunk):
        return _fit_vote_chunk(
            kind, delta_sq, lambda a, f: pl_chunk[a, f], feats
        )

    counts, params = jax.lax.map(step, chunked)
    return counts.reshape(-1), params.reshape(-1, nparams)


def _structured_shifts(n: int, k: int, groups: int):
    """The exact shift scheme of ``sampling.structured_samples`` (static,
    derived from (groups, k)) so the planar sweep evaluates the identical
    hypothesis set."""
    import numpy as np

    rng = np.random.default_rng(1234567 + groups * 1000003 + k)
    shifts = []
    for _ in range(groups):
        pool = rng.choice(np.arange(1, n), size=k - 1, replace=False)
        shifts.append([0] + sorted(int(s) for s in pool))
    return shifts


def structured_sweep(kind, est, data, key, groups: int):
    """Zero-materialization structured hypothesize+vote.

    Permutation + static rolls build the sampling planes in planar
    ``[k, F, groups * n]`` form (batch on the LANES — a ``[B, k, 3, 3]``
    sample pytree pads its trailing dims to (8, 128) tiles and its HBM
    round-trip costs ~10x the whole fit+vote).  The hypothesis set is
    IDENTICAL to ``sampling.structured_samples`` with the same key/groups.
    Returns ``(counts int32[B], params f32[B, P])``.
    """
    fit, k, _, features, slot_features, _ = _KINDS[kind]
    feats_elem = slot_features(data)          # [n, F]
    feats_vote = features(data)               # [n, K]
    n = feats_elem.shape[0]
    perm = jax.random.permutation(key, n)
    planar = feats_elem[perm].T               # [F, n]
    slots = []
    for shifts in _structured_shifts(n, k, groups):
        slots.append(
            jnp.stack(
                [jnp.roll(planar, -s, axis=1) for s in shifts], axis=0
            )
        )                                     # [k, F, n]
    planes = jnp.concatenate(slots, axis=-1)  # [k, F, groups * n]
    chunk = _chunk_size(planes.shape[-1], n, k)
    # groups * n is a multiple of n and chunk divides it by construction
    # only when chunk | n or n | chunk; pad up to the next chunk multiple.
    bsz = planes.shape[-1]
    padded = -(-bsz // chunk) * chunk
    if padded != bsz:
        planes = jnp.concatenate(
            [planes, planes[..., : padded - bsz]], axis=-1
        )
    counts, params = _fit_and_vote_planes(
        kind, float(est.delta_squared), chunk, planes, feats_vote
    )
    return counts[:bsz], params[:bsz]


@functools.partial(jax.jit, static_argnames=("kind", "delta_sq", "chunk"))
def _fit_and_vote_samples(kind, delta_sq, chunk, slot_feats, feats):
    """slot_feats: [B, k, F] materialized samples (parity/test path)."""
    nparams = _KINDS[kind][5]
    nc = slot_feats.shape[0] // chunk
    chunked = slot_feats.reshape(nc, chunk, *slot_feats.shape[1:])

    def step(sf):
        return _fit_vote_chunk(
            kind, delta_sq, lambda a, f: sf[:, a, f], feats
        )

    counts, params = jax.lax.map(step, chunked)
    return counts.reshape(-1), params.reshape(-1, nparams)


def fit_and_vote(kind, est, samples, data):
    """Batched hypothesize+vote on MATERIALIZED samples (the engine's
    ``fit_and_vote`` hook; the throughput path is :func:`structured_sweep`).

    ``samples``: estimator data pytree with leading ``[B, k]``; returns
    ``(counts int32[B], params f32[B, P])``.  Chunked internally; B is
    padded to a chunk multiple (padding rows computed and discarded).
    """
    _, _, _, features, _, _ = _KINDS[kind]
    slot_feats = _samples_to_slot_features(kind, samples)
    feats = features(data)
    n = feats.shape[0]
    bsz = slot_feats.shape[0]
    chunk = _chunk_size(bsz, n, _KINDS[kind][1])
    padded = -(-bsz // chunk) * chunk
    if padded != bsz:
        slot_feats = jnp.concatenate(
            [
                slot_feats,
                jnp.broadcast_to(
                    slot_feats[:1], (padded - bsz, *slot_feats.shape[1:])
                ),
            ]
        )
    counts, params = _fit_and_vote_samples(
        kind, float(est.delta_squared), chunk, slot_feats, feats
    )
    return counts[:bsz], params[:bsz]
