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
    with ``w = R2^T (p - t2)``) instead of 31 — run as HIGHEST-precision
    (true-f32) dots: a 3-pass bf16-split product loses ~2^-17 relative on
    the chip (the lo parts re-round to bf16 inside a DEFAULT dot) and
    flipped up to 6 border votes per hypothesis, and the vote is a
    negligible fraction of the fit cost here.

Everything runs in float32 (throughput path — the f64 engine retains exact
reference semantics); counts can differ from the f64 vote by border-point
flips, same contract as the fused Pallas families.
"""

import functools

import jax
import jax.numpy as jnp

from lsqrrecipes_tpu.config import HALF_PI, SMALL_ANGLE
from lsqrrecipes_tpu.linalg.small import qr_solve_lanes


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
    gimbal = jnp.logical_not(
        jnp.logical_and(
            jnp.abs(wy - HALF_PI) > SMALL_ANGLE,
            jnp.abs(wy + HALF_PI) > SMALL_ANGLE,
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


def _crosswire_fit_slots(slot_pl, k: int):
    """Minimal 3k x 12 system ``[u R2 | v R2 | R2 | -I] x = -t2``
    (``SinglePointTarget...cxx:120-270``) in lanes form ->
    ``(params[B, 20], valid[B])``.  ``slot_pl``: ``[k, F, B]`` planes."""
    slot = lambda a, f: slot_pl[a, f]
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


def _pointer_fit_slots(slot_pl, k: int):
    """Minimal 3k x 9 system ``[u R2 | v R2 | R2] x = p - t2``
    (``cxx:763-914``) -> ``(params[B, 17], valid[B])``.
    ``slot_pl``: ``[k, F, B]`` planes."""
    slot = lambda a, f: slot_pl[a, f]
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
# direction comes from a MIXED-PRECISION two-stage scheme:
#
#   1. f32 stage (fast, native arithmetic): the R factor of A by the
#      planar-scanned Householder QR (``linalg.small.qr_r_planar``; the
#      matrix lives as ``[31, 31, B]`` with the batch on the LANES —
#      factoring A itself, NOT the normal matrix, keeps the conditioning
#      un-squared) — then a 4-vector block inverse iteration with
#      ``(A^T A)^{-1} = R^{-1} R^{-T}`` as scanned triangular solves.  At
#      reference noise the raw spectrum has sigma_31 ~ 2e-7 * sigma_0 and
#      sigma_30 ~ 1e-5 * sigma_0; the f32 QR backward error
#      (~1.2e-7 * ||A||) sits BETWEEN them, so the iteration isolates a
#      subspace containing the null direction to ~1e-2 and the
#      {sigma_31, sigma_30} pair to ~4e-3 — but cannot resolve the pair.
#   2. f64 Rayleigh-Ritz (small, emulated arithmetic only where it pays):
#      project the exact ``A^T A`` onto the 4-dim f32 subspace
#      (``S = (A V)^T (A V)``, planar broadcast-reductions), extract the
#      smallest Ritz pair by 4x4 shifted inverse iteration, and expand.
#      Within the captured subspace the f64 projection resolves the tiny
#      sigma_30/sigma_31 gap exactly; measured direction error vs the f64
#      SVD null vector is <= 1.1e-5 rad (votes flip at ~1e-2).
#
# A pure-f32 factorization of the NORMAL matrix cannot work here: the
# squared spectrum puts sigma_31^2 ~ 4e-14 and sigma_30^2 ~ 1.2e-10 (of
# sigma_0^2) both below the f32 rounding floor of G (~1.2e-7), which is
# exactly the measured failure mode (null direction scrambled by ~1e-2,
# millimetres of t3 error, tens of flipped votes).  The previous all-f64
# design (normal matrix + Cholesky + D&C triangular inverse + 10 inverse
# iterations) was correct but spent ~80% of its time in emulated-f64
# matmuls; this scheme keeps f64 only for the A build, the thin subspace
# projection, the 4x4 Ritz solve, and the reconstruction.  Batched
# ``[B, n, n]`` forms of ANY of these steps (QR/Cholesky custom calls, D&C
# triangular inverses, small matmuls, 4x4 Jacobi chains) are latency- and
# layout-bound on TPU — tiny trailing dims tile to (8, 128) — and fully
# unrolled scalar forms blow up XLA compile time; planar-with-lax.scan is
# the working point.  Column equilibration is NOT applied: under noise the
# rescaled system has a genuinely different minimizer, and the reference
# SVD runs on the raw system.  The vote stays f32.
#
# The second Ritz value estimates sigma_30^2 (second-smallest), reproducing
# the reference's unique-null-space rank gate: duplicate rows from
# replication padding give a >= 2-dim null space whose two exact-null
# directions both ride the clamped-pivot amplification into the subspace,
# so the gate sees ritz_30 ~ 0 and rejects.  Ritz values only ever
# OVER-estimate eigenvalues (min-max), so the gate never turns more
# permissive for degenerate samples than the reference's.

# The reference's FLT_EPSILON-relative rank gate (``cxx:205-218``):
# sigma_30 must exceed FLT_EPS * max(sigma_0, 1).  Duplicate-row degeneracy
# gives sigma_30 ~ dtype-eps * sigma_0, genuine 31-pose samples sit orders
# of magnitude above the gate.
_PHANTOM_FLT_EPS = 1.192092896e-07

# k=31 f32 stage: True = the fused Pallas QR+subspace kernel
# (ops/phantom_qr.py); False = the XLA planar-scan stage (kept as the
# parity/fallback path — both feed the same f64 Rayleigh-Ritz tail).
_USE_QR_KERNEL = True

# Ritz projection W = A V in double-single (pair-of-f32) arithmetic instead
# of emulated f64: True = _ds_project (native-f32 Dekker-split exact
# products + TwoSum accumulation, f64 kept only for the [q, q, B] Ritz
# matrix), False = the plain f64 broadcast-reduce.  Chip traces put the f64
# projection at ~24% of the sweep (docs/PHANTOM_STAGES); the DS form does
# the O(q * 31 * 31 * B) work in native f32.  Parity: tests/test_us_
# calibration.py pins DS-vs-f64 on CPU (real f64), scripts/chip_check.py
# (us_plane_phantom) and scripts/verify_phantom_chip.py gate the chip.
_USE_DS_RITZ = True


def _ds_project(a_pl, a32, v_pl, dt):
    """``W = A V`` with A double-single, exact products, compensated sums.

    ``a_pl [31, 31, B]`` f64, ``a32`` its f32 rounding, ``v_pl [q, 31, B]``
    f32 (exact).  Returns the PAIR ``(s, e)`` of f32 streams with
    ``W ~= s + e`` (callers needing one array take ``s.astype(dt) +
    e.astype(dt)``; :func:`_ds_gram` consumes the pair directly).

    Error budget (why pair-f32 is enough here): per-term products are EXACT
    (12-bit Dekker splits of a32 and v; the residue ``a_err = A - a32`` is
    ~2^-24 ||A|| so its plain-f32 product rounding is ~2^-48 ||A||); the
    dominant-partial accumulation runs TwoSum with the compensation stream
    absorbing the small partials, leaving |W - A V| ~ 2^-31 ||A|| * 31 —
    ~1e-3 RELATIVE to the near-null columns ||A v|| ~ sigma_31.  The Ritz
    matrix S = W^T W (computed in f64 from the recombined pairs) then
    carries sigma_31^2 / sigma_30^2 to ~1e-3 — resolving their 1e-4 ratio
    and leaving the null-direction rotation at ~(sigma_31/sigma_30) * 1e-3
    ~ 1e-7 rad (votes flip at ~1e-2, the f64 path measured 1.1e-5)."""
    f32 = jnp.float32
    a_err = (a_pl - a32.astype(dt)).astype(f32)          # [31, 31, B]

    split = f32(4097.0)                                  # 2^12 + 1

    def dekker(x):
        t = x * split
        hi = t - (t - x)
        return hi, x - hi

    ah, al = dekker(a32)
    vh, vl = dekker(v_pl)

    # Accumulators are q SEPARATE [31, B] arrays: a [q=4, 31, B] carry
    # tiles as T(4, 128) — half the sublanes idle on every op (measured
    # the projection's dominant fusion at 2x its dense cost); lists of
    # [31, B] stay on full (8, 128) tiles, and the per-column a-slices
    # are shared across the q loop.
    q = v_pl.shape[0]
    w_s = [None] * q
    w_e = [None] * q
    for qi in range(q):
        s = None
        e = None
        for c in range(31):
            ahc, alc = ah[:, c], al[:, c]                # [31, B]
            aec = a_err[:, c]
            vhc, vlc = vh[qi, c][None], vl[qi, c][None]  # [1, B]
            vc = v_pl[qi, c][None]
            p1 = ahc * vhc                               # exact (12x12 bit)
            p_err = (ahc * vlc + alc * vhc) + alc * vlc + aec * vc
            if s is None:
                s, e = p1, p_err
                continue
            # TwoSum(s, p1): exact sum + rounding term into the e stream.
            t = s + p1
            bp = t - s
            err = (s - (t - bp)) + (p1 - bp)
            s = t
            e = e + (err + p_err)
        # Compress the pair: s holds only the hi*vh partial sum, so for
        # near-null columns s and e cancel against each other (both ~2^-12
        # ||A|| while w ~ sigma_31).  One TwoSum renormalizes to |lo| <=
        # 2^-23 |hi|, which is what lets _ds_gram drop the lo*lo' term.
        hi = s + e
        bp = hi - s
        w_s[qi] = hi
        w_e[qi] = (s - (hi - bp)) + (e - bp)
    return w_s, w_e


def _ds_gram(w_s, w_e, dt):
    """Ritz matrix ``S = W^T W`` from the pair streams, native f32.

    ``w_s`` / ``w_e``: length-q lists of [31, B] f32 (see _ds_project).
    S's entries carry NO catastrophic cancellation (W's columns are the
    already-cancelled outputs) and the pair arrives COMPRESSED
    (|lo| <= 2^-23 |hi|), so ``S = sum_r hi hi' + (hi lo' + lo hi')`` is
    per-entry relative-accurate to ~31 * 2^-24 and the dropped lo lo'
    term is ~2^-46 relative (pinned by the eigenvalue check in
    tests/test_us_calibration.py).  The 4x4 SOLVES stay f64 — their
    condition (sigma_28^2 / sigma_31^2 ~ 1e9) is beyond f32 Cholesky —
    but they are O(q^2 B), not O(q^2 31 B).  Returns the nested
    ``[q][q]`` list of [B] vectors the lanes-form solves consume."""
    q = len(w_s)
    g = [[None] * q for _ in range(q)]
    for i in range(q):
        for j in range(i, q):
            ss = jnp.sum(w_s[i] * w_s[j], axis=0)
            cross = jnp.sum(
                w_s[i] * w_e[j] + w_e[i] * w_s[j], axis=0
            )
            g[i][j] = g[j][i] = (ss + cross).astype(dt)
    return g





def _plane_phantom_fit_slots(slot_pl, k: int):
    """Batched k=31 minimal fit -> ``(params[B, 41], valid[B])``.

    ``slot_pl``: planar ``[31, 14, B]`` slot features (engine dtype).
    Null vector by the mixed-precision f32-QR + f64-Rayleigh-Ritz scheme
    (see module comment), then the reference's reconstruction
    (``PlanePhantom...cxx:204-355``) vectorized over the batch:
    column-group averaging, Newton-polar orthonormalization, gimbal-safe
    Euler extraction, derived-entry expansion."""
    dt = slot_pl.dtype
    f32 = jnp.float32
    bsz = slot_pl.shape[-1]

    # Homogeneous rows [u vec(R2), v vec(R2), vec(R2), t2, 1]
    # (``PlanePhantom...cxx:137-203``) built directly in PLANAR
    # [31 rows, 31 cols, B] form: two broadcast multiplies + a concat.
    # NO column equilibration: under noise the smallest singular vector of a
    # rescaled system is a DIFFERENT minimizer, and the reference SVD runs on
    # the raw system (cxx:205-218).
    r_feat = slot_pl[:, 0:9]                            # [31, 9, B]
    t_feat = slot_pl[:, 9:12]
    u_feat = slot_pl[:, 12:13]
    v_feat = slot_pl[:, 13:14]
    one = jnp.ones_like(u_feat)
    a_pl = jnp.concatenate(
        [u_feat * r_feat, v_feat * r_feat, r_feat, t_feat, one], axis=1
    )                                                   # [31, 31, B]

    # ---- f32 stage, PLANAR form: R factor of A, un-squared conditioning.
    # The matrix lives as [31, 31, B] with the batch on the lanes and the
    # factorization/solves are lax.scans of vector arithmetic: batched
    # [B, 31, 31] QR custom calls / D&C triangular inverses / small matmuls
    # are all latency- and layout-bound (31/35/2-10 ms at B=2048), and a
    # fully unrolled scalar form takes minutes of XLA compile.
    from lsqrrecipes_tpu.linalg.small import (
        qr_r_planar,
        solve_rt_r_planar,
    )

    a32 = a_pl.astype(f32)                              # [31, 31, B]
    from lsqrrecipes_tpu.ops.fused_sweep import _auto_interpret

    if _USE_QR_KERNEL and not _auto_interpret():
        # Fused Pallas QR + inverse-iteration subspace (ops/phantom_qr.py):
        # identical arithmetic with the panel VMEM-resident and every step
        # unrolled — replaces the qr_r_planar scan + the per-iteration
        # triangular-solve scans below.  Real-chip only: the ~3k-op
        # unrolled kernel takes ~10 min of XLA-CPU compile in interpret
        # mode (Mosaic compiles it in seconds), so CPU tests exercise the
        # XLA stage below and the Pallas stage is gated by
        # scripts/chip_check.py (us_plane_phantom) on hardware — the same
        # split every fused family uses.
        from lsqrrecipes_tpu.ops.phantom_qr import phantom_subspace

        v_pl = phantom_subspace(a32, interpret=False)
        fac_ok = jnp.all(jnp.isfinite(v_pl), axis=(0, 1))
        return _phantom_ritz_and_reconstruct(a_pl, a32, v_pl, fac_ok, dt)
    r_pl = qr_r_planar(a32)
    fac_ok = jnp.all(jnp.isfinite(r_pl), axis=(0, 1))
    # Clamp pivots at the f32 noise floor: exact-null pivots underflow to
    # rounding noise anyway; degenerate (duplicate-row) samples would
    # otherwise put inf into the solves.  The clamp keeps the null-space
    # amplification at ~1/eps^2 per iteration — one step isolates it.
    diag = jnp.diagonal(r_pl, axis1=0, axis2=1).T       # [31, B]
    # Absolute floor 1e-6: real systems always have mx >= O(1) (the
    # homogeneous ones-column), so only all-zero/duplicate degenerate
    # samples hit it — and it keeps their solve values ~1e6 instead of the
    # 1e30s whose squares go inf (and crawl on CPU denormal handling).
    floor = jnp.maximum(
        jnp.finfo(f32).eps * jnp.max(jnp.abs(diag), axis=0, keepdims=True),
        1e-6,
    )
    mag = jnp.maximum(jnp.abs(diag), floor)
    d_clamped = jnp.where(diag < 0, -mag, mag)

    # Block inverse iteration with (A^T A)^{-1} = R^{-1} R^{-T}: 4 fixed
    # deterministic start vectors, 3 steps, Gram-Schmidt between steps.
    q = 4
    import numpy as _np

    starts = []
    for j in range(q):
        c = _np.cos(_np.arange(31) * (j + 1) * 0.7) + 0.1
        starts.append(c / _np.linalg.norm(c))
    v_pl = jnp.broadcast_to(
        jnp.asarray(_np.stack(starts), _np.float32)[:, :, None],
        (q, 31, bsz),
    )

    def _norm_pl(v):
        n2 = jnp.sum(v * v, axis=1, keepdims=True)
        return v * jax.lax.rsqrt(jnp.maximum(n2, 1e-30))

    # Two iterations suffice: each step amplifies the small-sigma subspace
    # by ~(sigma_30/sigma_31)^2 >= 1e4 through R^{-1} R^{-T}, and the f64
    # Rayleigh-Ritz below only needs the subspace to CONTAIN the null
    # direction, not resolve it (3 iterations measured identical counts on
    # the chip gate and the golden outlier data; the third cost ~2ms/sweep).
    for _ in range(2):
        v_pl = _norm_pl(solve_rt_r_planar(r_pl, d_clamped, v_pl))
        cols = []
        for j in range(q):
            c = v_pl[j]
            for p in cols:
                c = c - jnp.sum(p * c, axis=0, keepdims=True) * p
            n2 = jnp.sum(c * c, axis=0, keepdims=True)
            cols.append(c * jax.lax.rsqrt(jnp.maximum(n2, 1e-30)))
        v_pl = jnp.stack(cols)

    return _phantom_ritz_and_reconstruct(a_pl, a32, v_pl, fac_ok, dt)


def _phantom_ritz_and_reconstruct(a_pl, a32, v_pl, fac_ok, dt):
    """Shared tail of the k=31 fit: f64 Rayleigh-Ritz null vector from the
    f32 subspace, rank gate, and the reference's reconstruction
    (``PlanePhantom...cxx:204-355``)."""
    import numpy as _np

    from lsqrrecipes_tpu.linalg.small import cholesky_solve_lanes

    f32 = jnp.float32
    bsz = a_pl.shape[-1]
    q = v_pl.shape[0]

    # ---- f64 Rayleigh-Ritz: resolve the sigma_30/sigma_31 gap exactly.
    # Project the exact A^T A onto the 4-dim subspace with planar
    # broadcast-reductions (no batched matmuls), then extract the smallest
    # Ritz pair by 4x4 shifted inverse iteration with the unrolled lanes
    # Cholesky (a 4x4 Jacobi sweep chain compiled ~12 s; this is ~200 ops).
    v64_pl = v_pl.astype(dt)                            # [q, 31, B]
    if _USE_DS_RITZ and dt == jnp.float64:
        w_s, w_e = _ds_project(a_pl, a32, v_pl, dt)     # q-lists of [31, B]
        sg = _ds_gram(w_s, w_e, dt)                     # [q][q] of [B]
    else:
        w_pl = jnp.sum(
            a_pl[None, :, :, :] * v64_pl[:, None, :, :], axis=2
        )
        s_pl = jnp.sum(w_pl[:, None, :, :] * w_pl[None, :, :, :], axis=2)
        sg = [[s_pl[i, j] for j in range(q)] for i in range(q)]
    # All 4x4 work in LANES-LIST form: a [B, 4, 4] f64 array tiles its
    # trailing dims to (8, 128) (~85x padding) and [B, 4] vectors pad
    # their 4 lanes to 128 — the measured cost of this stage was layout,
    # not arithmetic (docs/PHANTOM_STAGES.json).  sg[i][j] entries are
    # [B] vectors; every op below is dense [B] arithmetic.
    tiny = jnp.finfo(dt).tiny
    trace = sg[0][0] + sg[1][1] + sg[2][2] + sg[3][3]
    shift = 100.0 * jnp.finfo(dt).eps * trace + tiny
    s_ll = [
        [sg[i][j] + shift if i == j else sg[i][j] for j in range(q)]
        for i in range(q)
    ]

    def _unit_l(c):
        nrm = jnp.sqrt(sum(ci * ci for ci in c))
        inv = 1.0 / jnp.maximum(nrm, tiny)
        return [ci * inv for ci in c]

    zeros_b = jnp.zeros((bsz,), dt)
    ones_b = jnp.ones((bsz,), dt)

    # Smallest Ritz vector: the first subspace vector is the f32 null
    # estimate, so e_0 always has O(1) overlap; two inverse-iteration steps
    # (ratio ~ sigma_31^2 / sigma_30^2 ~ 1e-4 per step) polish it to f64.
    c = [ones_b] + [zeros_b] * (q - 1)
    for _ in range(2):
        c, _ = cholesky_solve_lanes(s_ll, c, q)
        c = _unit_l(c)
    x_pl = sum(c[j][None, :] * v64_pl[j] for j in range(q))  # [31, B]
    xn = 1.0 / jnp.maximum(
        jnp.sqrt(jnp.sum(x_pl * x_pl, axis=0)), tiny
    )
    xq = [x_pl[i] * xn for i in range(31)]              # 31 x [B] lanes

    # Rank gate ``s[29] > FLT_EPS * max(s[0], 1)`` (``cxx:205-218`` via
    # ``us_calibration.py``): sigma_30^2 from the deflated second Ritz
    # value (a Rayleigh quotient orthogonal to the first — an over-estimate,
    # so never laxer than the reference), sigma_0^2 by two power-iteration
    # steps in planar f32 (the gate threshold needs ~1e-3, not f64).
    def _deflate(y):
        d = sum(ci * yi for ci, yi in zip(c, y))
        return _unit_l([yi - d * ci for ci, yi in zip(c, y)])

    y = _deflate([zeros_b, ones_b] + [zeros_b] * (q - 2))
    for _ in range(2):
        y, _ = cholesky_solve_lanes(s_ll, y, q)
        y = _deflate(y)
    sy = [sum(sg[i][j] * y[j] for j in range(q)) for i in range(q)]
    lam1 = sum(y[i] * sy[i] for i in range(q))

    pv = jnp.full((31, bsz), _np.float32(1.0 / _np.sqrt(31.0)), f32)

    def _gram_apply(p):
        # A^T (A p) in planar form: two masked-broadcast reductions.
        ap = jnp.sum(a32 * p[None, :, :], axis=1)       # [31 rows, B]
        return jnp.sum(a32 * ap[:, None, :], axis=0)    # [31 cols, B]

    def _norm_cols(p):
        n2 = jnp.sum(p * p, axis=0, keepdims=True)
        return p * jax.lax.rsqrt(jnp.maximum(n2, 1e-30))

    for _ in range(2):
        pv = _norm_cols(_gram_apply(pv))
    sig0_sq = jnp.sum(pv * _gram_apply(pv), axis=0).astype(dt)
    rank_ok = lam1 > _PHANTOM_FLT_EPS**2 * jnp.maximum(sig0_sq, 1.0)
    chol_ok = fac_ok  # factorization-health gate (name kept for the mask)

    # Reconstruction entirely in LANES form on the 31 [B] rows of the null
    # vector: the previous [B, 31] transpose + [B, 3, 3] mean/reshape ops
    # paid (8, 128) padding on 3x3 trailing dims (the "other" bucket of
    # docs/PHANTOM_STAGES.json — ~2.2 ms/sweep at B=32k, mostly layout).
    denom = jnp.sqrt(xq[27] ** 2 + xq[28] ** 2 + xq[29] ** 2)
    nondeg = denom > 1e-30
    invd = 1.0 / jnp.where(nondeg, denom, 1.0)
    xr = [xi * invd for xi in xq]

    r1 = [xr[27], xr[28], xr[29]]                 # R1 row 3 (plane normal)
    t1_z = xr[30]
    wy1 = jnp.arctan2(-r1[0], jnp.sqrt(r1[1] ** 2 + r1[2] ** 2))
    gimbal = jnp.logical_not(
        jnp.logical_and(
            jnp.abs(wy1 - HALF_PI) > SMALL_ANGLE,
            jnp.abs(wy1 + HALF_PI) > SMALL_ANGLE,
        )
    )
    cy1 = jnp.where(gimbal, 1.0, jnp.cos(wy1))
    wx1 = jnp.where(
        gimbal, 0.0, jnp.arctan2(r1[1] / cy1, r1[2] / cy1)
    )

    inv = [1.0 / jnp.where(jnp.abs(r1[j]) > 1e-30, r1[j], 1.0)
           for j in range(3)]
    c1 = [sum(xr[3 * j + cc] * inv[j] for j in range(3)) / 3.0
          for cc in range(3)]
    c2 = [sum(xr[9 + 3 * j + cc] * inv[j] for j in range(3)) / 3.0
          for cc in range(3)]
    t3 = [sum(xr[18 + 3 * j + cc] * inv[j] for j in range(3)) / 3.0
          for cc in range(3)]

    m_x, m_y, r3, ok = _orthonormalize_lanes(c1, c2)
    wz3, wy3, wx3 = euler_zyx_plus_lanes(r3)
    col0 = [r3[i][0] for i in range(3)]
    col1 = [r3[i][1] for i in range(3)]
    m1 = [m_x * r1[j] * col0[cc] for j in range(3) for cc in range(3)]
    m2 = [m_y * r1[j] * col1[cc] for j in range(3) for cc in range(3)]
    m3 = [r1[j] * t3[cc] for j in range(3) for cc in range(3)]
    cols = (
        [wy1, wx1, t1_z, t3[0], t3[1], t3[2], wz3, wy3, wx3, m_x, m_y]
        + m1 + m2 + m3 + [r1[0], r1[1], r1[2]]
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


def _fit_vote_chunk(kind, delta_sq, slot_pl, feats):
    """slot_pl: planar ``[k, F, B]`` slot-feature array.  Fits receive the
    ARRAY (not a per-entry getter): the plane-phantom fit consumes whole
    planes, and rebuilding its 31x31 rows through 400+ scalar slices cost
    ~15 s of XLA compile per jit."""
    fit, k, vote_rows, _, _, _ = _KINDS[kind]
    params, valid = fit(slot_pl, k)
    d2 = None
    # The plane-phantom fit returns f64 params; the vote always runs f32.
    # HIGHEST-precision dots (true-f32 six-pass): the 3-pass bf16-split vote
    # lost ~2^-17 relative ON CHIP (the lo parts re-round to bf16 inside a
    # DEFAULT dot), flipping up to 6 border votes per hypothesis at tracker
    # magnitudes; the vote is tiny next to the fit, so the 2x dot cost is
    # noise.
    for a_j in vote_rows(params.astype(feats.dtype)):
        e = jnp.einsum(
            "bk,nk->bn", a_j, feats, precision=jax.lax.Precision.HIGHEST
        )
        d2 = e * e if d2 is None else d2 + e * e
    counts = jnp.sum(d2 < delta_sq, axis=-1)
    return jnp.where(valid, counts, -1), params


def _chunk_size(bsz, n, k=4):
    # ~4M residual cells per chunk keeps the [chunk, n] vote tile VMEM-sized;
    # the k*k bound keeps the plane-phantom [chunk, 31, 31] planar scan
    # carries VMEM-resident (chip traces show them in S(1); an un-chunked
    # whole-batch variant measured 3x SLOWER at B=32k — the [31, 31, 32768]
    # carries stream HBM on every one of the 31 scan steps).  Rounded DOWN
    # to a lane-tile multiple so chunk slices land on 128-aligned offsets.
    c = max(256, (1 << 22) // max(n, k * k))
    c = max(128, (c // 128) * 128)
    return min(bsz, c)  # a small (sharded) batch stays one whole chunk


@functools.partial(jax.jit, static_argnames=("kind", "delta_sq", "chunk"))
def _fit_and_vote_planes(kind, delta_sq, chunk, planes, feats):
    """planes: [k, F, B] sampling planes (B on lanes).

    Chunks are taken as dynamic LANE-axis slices of the intact planes
    (offsets are multiples of the 128-aligned ``chunk``) instead of
    pre-splitting into a ``[nc, k, F, chunk]`` array: the pre-split
    version's per-iteration slices carried a degenerate (1, 128) tile
    (sublane dim = the size-1 chunk axis) — 8x the sublane traffic,
    ~1.3 ms/sweep at B=32k on the phantom (docs/PHANTOM_STAGES.json)."""
    nc = planes.shape[-1] // chunk

    def step(carry, i):
        pl_chunk = jax.lax.dynamic_slice_in_dim(
            planes, i * chunk, chunk, axis=-1
        )
        return carry, _fit_vote_chunk(kind, delta_sq, pl_chunk, feats)

    _, (counts, params) = jax.lax.scan(step, 0, jnp.arange(nc))
    return counts.reshape(-1), params.reshape(-1, params.shape[-1])


def build_sampling_planes(kind, data, key, groups: int):
    """Planar sampling-plane construction: permutation + static rolls ->
    ``(planes [k, F, groups * n], vote_feats [n, K])``.

    Shared by the single-device sweep and the hypothesis-axis sharded sweep
    (``parallel.fused.sharded_us_sweep``) so both evaluate the hypothesis
    set of ``sampling.structured_samples`` with the same key/groups.
    """
    from lsqrrecipes_tpu.ransac.sampling import structured_shift_table

    import numpy as np

    _, k, _, features, slot_features, _ = _KINDS[kind]
    feats_elem = slot_features(data)          # [n, F]
    feats_vote = features(data)               # [n, K]
    n = feats_elem.shape[0]
    perm = jax.random.permutation(key, n)
    planar = feats_elem[perm].T               # [F, n]

    # groups * k rolls is THE dominant cost of a structured sweep at large
    # group counts (k=31 phantom at groups=512 would emit ~16k roll ops;
    # the round-4 chip breakdown measured plane construction at ~75% of the
    # whole phantom sweep).  All shifts are mod n, so roll once per UNIQUE
    # shift value (U <= n) and assemble the [k, F, groups * n] planes with
    # one static block-gather — identical output, ~U + 2 ops.
    table = np.asarray(structured_shift_table(n, k, groups)) % n  # [G, k]
    uniq, inv = np.unique(table, return_inverse=True)
    rolled = jnp.stack(
        [planar if s == 0 else jnp.roll(planar, -int(s), axis=1)
         for s in uniq]
    )                                         # [U, F, n]
    sel = jnp.asarray(inv.reshape(table.shape).T, jnp.int32)      # [k, G]
    planes = rolled[sel]                      # [k, G, F, n]
    planes = jnp.moveaxis(planes, 2, 1).reshape(k, planar.shape[0], -1)
    return planes, feats_vote


def structured_sweep(kind, est, data, key, groups: int):
    """Zero-materialization structured hypothesize+vote.

    Permutation + static rolls build the sampling planes in planar
    ``[k, F, groups * n]`` form (batch on the LANES — a ``[B, k, 3, 3]``
    sample pytree pads its trailing dims to (8, 128) tiles and its HBM
    round-trip costs ~10x the whole fit+vote).  The hypothesis set is
    IDENTICAL to ``sampling.structured_samples`` with the same key/groups.
    Returns ``(counts int32[B], params f32[B, P])``.
    """
    k = _KINDS[kind][1]
    planes, feats_vote = build_sampling_planes(kind, data, key, groups)
    n = feats_vote.shape[0]
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
        return _fit_vote_chunk(kind, delta_sq, jnp.moveaxis(sf, 0, -1), feats)

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
