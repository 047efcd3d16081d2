"""Whole-sweep fused RANSAC kernels: ONE ``pallas_call`` per sweep.

The per-step megakernel (``ops/sphere_ransac.py``) scans kernel launches and
keeps the running best on the host side of a ``lax.scan``: each step pays a
launch, a ``[1, B]`` counts + ``[8, B]`` params HBM round trip, an XLA argmax
and a gather — profiled at ~60% of wall time.  Here the ENTIRE sweep is one
kernel:

  * ``grid = (total_groups,)``: TPU grid steps execute sequentially on the
    core, so the running best lives in an SMEM scratch scalar plus an
    ``[8, 128]`` output block that every step maps to ``(0, 0)`` (the
    standard Pallas accumulation pattern) — per-step HBM traffic is ZERO;
  * shifts are hashed from ``program_id`` in-kernel (odd-multiplier
    bijection of the shift-tuple index space), so there is no shift table;
  * each sample slot draws from FOUR independent permutations laid out as
    one ``[d, 5n]`` plane (perm0|perm1|perm2|perm3|perm0), so a 128-aligned
    window has ``4n/128`` positions and the k-slot tuple pool is
    ``(4n/128)^k`` — 2^20 for the sphere at n=1024, where the per-step
    kernel's ``(n/128)^4 = 4096`` pool was exhausted after 32 steps of 128
    groups, silently repeating hypothesis sets;
  * the winner's parameter column is extracted in-kernel with an iota
    one-hot contraction, only on steps that improve the best (rare after
    warm-up).

Estimator-specific minimal fit + vote logic plugs in as a ``fit_vote``
closure over ``[1, n_h]`` lane-row slices; the vote itself is the affine band
trick (``ops/sphere_ransac._make_megakernel``): any predicate of the form
``lo <= q(p) < hi`` with ``q`` affine in the point-feature rows becomes
``|e| < 1`` for a single K-row MXU product ``e = P^T A``.  Hypotheses ride
the LANES of ``e`` (points on sublanes), so the point reduction is a sublane
sum that lands counts directly on a lane row — no relayout, no transpose
(explicit transposes miscompile on this toolchain).

Reference semantics covered per estimator (citations into /root/reference):
sphere ``SphereParametersEstimator.hxx:80-163,255-264``; plane
``PlaneParametersEstimator.hxx:48-69,195-203``; kD line
``LineParametersEstimator.hxx:23-48,135-150``; 2D line
``Line2DParametersEstimator.cxx:11-32,119-123``.
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HASH_A = 1103515245   # odd => bijection of the shift-tuple index space
_GUARD = 1e30          # pad-column sentinel: |e| >> 1 for any live hypothesis
_PARAM_ROWS = 16       # output block sublanes: params + count, zero padded

SPHERE_EPS = 1e-9      # SphereParametersEstimator.hxx:11 (f32 fast path)
_NORM2_EPS = 1e-20     # f32 collinearity gate on squared cross-product norm


def sweep_static(n: int, k_slots: int):
    """Static shift-hash constants; n must be ``128 * 2^k`` lanes."""
    assert n % 128 == 0, "fused sweep requires n divisible by 128"
    m = (4 * n) // 128
    b = m.bit_length() - 1
    assert (1 << b) == m, "fused sweep requires n = 128 * 2^k"
    assert k_slots * b <= 31, "shift hash exceeds 31 bits"
    return m, b, (1 << (k_slots * b)) - 1


def fit_size(n: int, k_slots: int) -> int:
    """Smallest sampling width ``128 * 2^j >= n`` whose shift hash fits.

    Data sizes that are not ``128 * 2^k`` are handled by REPLICATING
    observations up to ``fit_size`` for the sampling planes only (points
    duplicated into a minimal sample self-mask through the degeneracy
    gates; the slight sampling-frequency bias of the duplicated prefix is
    a documented deviation) — the VOTE always runs against the original
    observations with 1e30 guard padding, so inlier counts stay exact.
    """
    nf = 128
    while nf < n:
        nf *= 2
    sweep_static(nf, k_slots)  # raises if the shift hash cannot cover nf
    return nf


def shift_units(g, j, b, m, mask):
    """Slot-j window index (in 128-lane units) for group g — int32-safe."""
    return (((g * _HASH_A) & mask) >> (b * j)) & (m - 1)


def slot_planes(points, key, k_slots: int):
    """Per-slot coordinate planes ``[k_slots * d, 5n]``: four independent
    permutations concatenated, wrap-padded with the first (row = d*j + c)."""
    n, d = points.shape
    keys = jax.random.split(key, 4 * k_slots)
    pts32 = jnp.asarray(points, jnp.float32)
    rows = []
    for j in range(k_slots):
        planes = [
            pts32[jax.random.permutation(keys[4 * j + i], n)].T for i in range(4)
        ]
        rows.append(jnp.concatenate(planes + [planes[0]], axis=1))
    return jnp.concatenate(rows, axis=0)


def _pad_features(feats, n_fit: int):
    """Tile a ``[n, F]`` feature matrix up to ``[n_fit, F]`` by repetition."""
    n = feats.shape[0]
    if n == n_fit:
        return feats
    reps = -(-n_fit // n)
    return jnp.concatenate([feats] * reps, axis=0)[:n_fit]


def pack_feature_rows(points, with_pp: bool):
    """``[n, d] -> P[d+2, n_pad]`` feature rows for the band product:
    ``[coords..., 1, guard]`` where guard is ``|p|^2`` (``with_pp``) or 0 on
    live columns and 1e30 on padding columns (pads can never satisfy any
    band whose guard coefficient is positive)."""
    n, d = points.shape
    n_pad = -(-n // 128) * 128
    pts = jnp.asarray(points, jnp.float32)
    p = jnp.zeros((d + 2, n_pad), jnp.float32)
    p = p.at[0:d, :n].set(pts.T)
    p = p.at[d, :n].set(1.0)
    p = p.at[d + 1, n:].set(jnp.float32(_GUARD))
    if with_pp:
        p = p.at[d + 1, :n].set(jnp.sum(pts * pts, axis=1))
    return p


def _dot_f32x3(p, a):
    """~f32-accurate MXU product in 3 bf16 passes.

    Mosaic's DEFAULT f32 dot is ONE bf16xbf16 pass (4e-3 relative — too
    coarse for residual votes at tracker magnitudes) and HIGHEST is six;
    splitting each operand into bf16 high + low parts and dropping the
    lo*lo term gives ~2^-22 relative in three passes (Precision.HIGH is
    not lowered by Mosaic).
    """
    dims = (((0,), (0,)), ((), ()))
    p_hi = p.astype(jnp.bfloat16).astype(jnp.float32)
    p_lo = p - p_hi
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi

    def d(x, y):
        return jax.lax.dot_general(x, y, dims, preferred_element_type=jnp.float32)

    return d(p_hi, a_hi) + d(p_hi, a_lo) + d(p_lo, a_hi)


def _chunked_counts(p, body, chunk: int = 512):
    """Accumulate ``sum(body(p_chunk), axis=0)`` over point-column chunks.

    Component votes keep several ``[n_pad, n_h]`` products live at once;
    at n=1024 that blows the 16 MB scoped-VMEM limit, so the vote walks the
    point axis in 512-column chunks (chunk must be a multiple of 128)."""
    total = None
    for c0 in range(0, p.shape[1], chunk):
        cnt = jnp.sum(body(p[:, c0 : c0 + chunk]), axis=0, keepdims=True)
        total = cnt if total is None else total + cnt
    return total


def _band_counts(a_rows, p):
    """``counts[1, n_h]`` for the affine band test ``|P^T A| < 1``."""
    a = jnp.concatenate(a_rows, axis=0)
    dims = (((0,), (0,)), ((), ()))
    e = jax.lax.dot_general(p, a, dims, preferred_element_type=jnp.float32)
    agree = (jnp.abs(e) < 1.0).astype(jnp.float32)
    return jnp.sum(agree, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# fit_vote closures: slot_row(c, j) -> [1, n] lane row of coordinate c of
# sample slot j; p_ref holds the matching pack_feature_rows output.  Each
# returns (counts[1, n] f32 — already 0 on degenerate lanes, param rows).
# ---------------------------------------------------------------------------


@functools.cache
def sphere3d_fit_vote(delta: float):
    """Cramer circumsphere (``SphereParametersEstimator.hxx:115-163``) +
    shell band ``(r-delta)^2 <= dist^2 < (r+delta)^2``; needs ``with_pp``."""

    def fit_vote(slot_row, p):
        pts = [[slot_row(c, j) for c in range(3)] for j in range(4)]

        # Equal-radius system: row_i = p0 - p_i, rhs_i = row_i . (p0 + p_i),
        # center = adj(rows) rhs / (2 det).  Built as row/cofactor lists.
        rows = [[pts[0][c] - pts[i][c] for c in range(3)] for i in (1, 2, 3)]
        rhs = [
            sum(rows[i][c] * (pts[0][c] + pts[i + 1][c]) for c in range(3))
            for i in range(3)
        ]

        def cof(i, j):
            i1, i2 = [a for a in range(3) if a != i]
            j1, j2 = [a for a in range(3) if a != j]
            sign = 1.0 if (i + j) % 2 == 0 else -1.0
            return sign * (
                rows[i1][j1] * rows[i2][j2] - rows[i1][j2] * rows[i2][j1]
            )

        adj = [[cof(j, i) for j in range(3)] for i in range(3)]  # transpose
        det = sum(rows[0][j] * adj[j][0] for j in range(3))
        degenerate = jnp.abs(det) < SPHERE_EPS
        det = jnp.where(degenerate, 1.0, 2.0 * det)

        center = [
            sum(adj[i][j] * rhs[j] for j in range(3)) / det for i in range(3)
        ]
        cx, cy, cz = center
        r = jnp.sqrt(
            sum((pts[0][c] - center[c]) ** 2 for c in range(3))
        )

        # |e| < 1 with e = w*dist^2 + o, dist^2 = pp - 2 c.p + cc.
        cc = cx * cx + cy * cy + cz * cz
        hi = (r + delta) ** 2
        lo_root = jnp.maximum(r - delta, 0.0)
        lo = lo_root * lo_root
        width = jnp.maximum(hi - lo, jnp.float32(1e-30))
        w = jnp.where(degenerate, 0.0, 2.0 / width)
        o = jnp.where(degenerate, 2.0, -(hi + lo) / width)
        counts = _band_counts(
            [w * (-2.0 * cx), w * (-2.0 * cy), w * (-2.0 * cz), w * cc + o, w],
            p,
        )
        # w = 0 on degenerate lanes also zeroes the w * 1e30 pad-guard term,
        # which would let every replication-pad column vote (e = 0); zero the
        # whole lane instead of relying on the guard.
        counts = counts * jnp.where(degenerate, 0.0, 1.0)
        return counts, [cx, cy, cz, r]

    return fit_vote


@functools.cache
def plane3d_fit_vote(delta: float):
    """Cross-product plane (``PlaneParametersEstimator.hxx:48-69``) + signed
    distance band (``:195-203``); plain guard (no pp row)."""
    inv_delta = 1.0 / float(delta)

    def fit_vote(slot_row, p):
        s = [[slot_row(c, j) for c in range(3)] for j in range(3)]
        v1 = [s[1][c] - s[0][c] for c in range(3)]
        v2 = [s[2][c] - s[0][c] for c in range(3)]
        nx = v1[1] * v2[2] - v1[2] * v2[1]
        ny = v1[2] * v2[0] - v1[0] * v2[2]
        nz = v1[0] * v2[1] - v1[1] * v2[0]
        norm2 = nx * nx + ny * ny + nz * nz
        degenerate = norm2 < _NORM2_EPS
        inv = jax.lax.rsqrt(jnp.where(degenerate, 1.0, norm2))
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        d_off = nx * s[0][0] + ny * s[0][1] + nz * s[0][2]

        w = jnp.where(degenerate, 0.0, inv_delta)
        o = jnp.where(degenerate, 2.0, -d_off * inv_delta)
        counts = _band_counts([w * nx, w * ny, w * nz, o, w], p)
        counts = counts * jnp.where(degenerate, 0.0, 1.0)  # pad-guard: see sphere3d
        return counts, [nx, ny, nz, s[0][0], s[0][1], s[0][2]]

    return fit_vote


@functools.cache
def line2d_fit_vote(delta: float):
    """Two-point 2D line (``Line2DParametersEstimator.cxx:11-32``): n = unit
    perpendicular of p1 - p0, degenerate when the points are closer than
    delta; signed-distance band (``:119-123``)."""
    inv_delta = 1.0 / float(delta)
    delta_sq = float(delta) * float(delta)

    def fit_vote(slot_row, p):
        x0, y0 = slot_row(0, 0), slot_row(1, 0)
        x1, y1 = slot_row(0, 1), slot_row(1, 1)
        dx, dy = x1 - x0, y1 - y0
        dist2 = dx * dx + dy * dy
        degenerate = dist2 < delta_sq
        inv = jax.lax.rsqrt(jnp.where(degenerate, 1.0, dist2))
        nx, ny = dy * inv, -dx * inv   # matches Line2DEstimator's sign
        d_off = nx * x0 + ny * y0

        w = jnp.where(degenerate, 0.0, inv_delta)
        o = jnp.where(degenerate, 2.0, -d_off * inv_delta)
        counts = _band_counts([w * nx, w * ny, o, w], p)
        counts = counts * jnp.where(degenerate, 0.0, 1.0)  # pad-guard: see sphere3d
        return counts, [nx, ny, x0, y0]

    return fit_vote


@functools.cache
def line3d_fit_vote(delta: float):
    """Two-point 3D line (``LineParametersEstimator.hxx:23-48``), orthogonal
    distance^2 band (``:135-150``): dist^2 = |p-a|^2 - (u.(p-a))^2 needs two
    band products (e1 = u.(p-a) affine, e2 = |p-a|^2 via the pp row)."""
    delta_sq = float(delta) * float(delta)

    def fit_vote(slot_row, p):
        a = [slot_row(c, 0) for c in range(3)]
        p1 = [slot_row(c, 1) for c in range(3)]
        d = [a[c] - p1[c] for c in range(3)]
        dist2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        degenerate = dist2 < delta_sq
        inv = jax.lax.rsqrt(jnp.where(degenerate, 1.0, dist2))
        u = [d[c] * inv for c in range(3)]
        ua = u[0] * a[0] + u[1] * a[1] + u[2] * a[2]
        aa = a[0] * a[0] + a[1] * a[1] + a[2] * a[2]

        zeros = jnp.zeros_like(ua)
        a1 = jnp.concatenate([u[0], u[1], u[2], -ua, zeros], axis=0)
        a2 = jnp.concatenate(
            [-2.0 * a[0], -2.0 * a[1], -2.0 * a[2], aa, jnp.ones_like(aa)],
            axis=0,
        )

        # The e2 rows carry |p|^2 terms O(1e3-1e4); a single-pass (bf16) dot
        # leaves absolute error in dist^2 comparable to delta^2 at tracker
        # magnitudes, so both products use the 3-pass bf16-split dot.
        def body(pc):
            e1 = _dot_f32x3(pc, a1)
            e2 = _dot_f32x3(pc, a2)
            return ((e2 - e1 * e1) < delta_sq).astype(jnp.float32)

        counts = _chunked_counts(p, body)
        counts = counts * jnp.where(degenerate, 0.0, 1.0)
        return counts, [u[0], u[1], u[2], a[0], a[1], a[2]]

    return fit_vote


@functools.cache
def pivot_fit_vote(delta: float):
    """Pivot calibration, fully fused (k = 3 tracked frames).

    The reference solves the stacked ``[R_i  -I][t_D; t_W] = -t_i`` system by
    9x6 SVD pseudo-inverse (``PivotCalibrationParametersEstimator.cxx:9-51``).
    For orthonormal R the normal matrix has closed structure
    ``[[3I, -S^T], [-S, 3I]]`` with ``S = sum R_i``, so the minimal fit
    reduces to a 3x3 Schur solve:

        (9I - S S^T) t_W = 3 sum t - S sum(R^T t),   t_D = (S^T t_W - u)/3

    (Cramer, ~90 VPU ops/lane); degenerate when det(9I - S S^T) ~ 0 — i.e.
    all three rotations (nearly) equal, exactly the rank<6 case the
    reference's SVD gate rejects.

    The vote ``||R_i t_D + t_i - t_W||^2 < delta^2``
    (``PivotCalibrationParametersEstimator.cxx:108-123``) expands into an
    affine band over K = 17 per-frame feature rows
    ``[t (3), R^T t (3), vec(R) (9), 1, |t|^2]``:

        dist^2 = |t|^2 - 2 t_W . t + 2 t_D . (R^T t)
                 - 2 sum_jk (t_D[k] t_W[j]) R[j,k] + |t_D|^2 + |t_W|^2

    so one K=17 MXU product votes every (hypothesis, frame) pair.
    Slot feature rows (15): [vec(R) 9, t 3, R^T t 3].
    """
    delta_sq = float(delta) * float(delta)

    def fit_vote(slot_row, p):
        # Per-slot features: rows 0-8 = R[j, k] at 3j+k, 9-11 = t, 12-14 = R^T t.
        def ssum(c):
            return slot_row(c, 0) + slot_row(c, 1) + slot_row(c, 2)

        s = [[ssum(3 * j + k) for k in range(3)] for j in range(3)]  # sum R
        v = [ssum(9 + a) for a in range(3)]                          # sum t
        u = [ssum(12 + a) for a in range(3)]                         # sum R^T t

        # N = 9I - S S^T (symmetric), rhs = 3v - S u.
        def dotr(a, b):
            return s[a][0] * s[b][0] + s[a][1] * s[b][1] + s[a][2] * s[b][2]

        n00 = 9.0 - dotr(0, 0)
        n11 = 9.0 - dotr(1, 1)
        n22 = 9.0 - dotr(2, 2)
        n01 = -dotr(0, 1)
        n02 = -dotr(0, 2)
        n12 = -dotr(1, 2)
        r0 = 3.0 * v[0] - (s[0][0] * u[0] + s[0][1] * u[1] + s[0][2] * u[2])
        r1 = 3.0 * v[1] - (s[1][0] * u[0] + s[1][1] * u[1] + s[1][2] * u[2])
        r2 = 3.0 * v[2] - (s[2][0] * u[0] + s[2][1] * u[1] + s[2][2] * u[2])

        c00 = n11 * n22 - n12 * n12
        c01 = n02 * n12 - n01 * n22
        c02 = n01 * n12 - n02 * n11
        det = n00 * c00 + n01 * c01 + n02 * c02
        degenerate = jnp.abs(det) < 1e-6
        det = jnp.where(degenerate, 1.0, det)
        c11 = n00 * n22 - n02 * n02
        c12 = n01 * n02 - n00 * n12
        c22 = n00 * n11 - n01 * n01

        tw0 = (c00 * r0 + c01 * r1 + c02 * r2) / det
        tw1 = (c01 * r0 + c11 * r1 + c12 * r2) / det
        tw2 = (c02 * r0 + c12 * r1 + c22 * r2) / det
        td = [
            (s[0][k] * tw0 + s[1][k] * tw1 + s[2][k] * tw2 - u[k]) / 3.0
            for k in range(3)
        ]

        # Vote by direct residual components: e_j = (R t_D + t - t_W)_j as
        # three K=17 products.  The single-product quadratic expansion
        # (|t|^2 - 2 t_W.t + ...) cancels ~1e4-magnitude terms down to
        # ~delta^2 and drowns in the MXU's default bf16-multiply passes;
        # components stay O(residual) so the 3-pass split product is exact
        # enough.  The pad guard (|t|^2 = 1e30 column) folds into e_0.
        tw = [tw0, tw1, tw2]
        zeros = jnp.zeros_like(tw0)
        ones = jnp.ones_like(tw0)
        dims = (((0,), (0,)), ((), ()))

        def a_matrix(j):
            t_rows = [ones if a == j else zeros for a in range(3)]
            rt_rows = [zeros, zeros, zeros]
            r_rows = [
                td[k] if jj == j else zeros for jj in range(3) for k in range(3)
            ]
            guard = ones if j == 0 else zeros
            return jnp.concatenate(
                t_rows + rt_rows + r_rows + [-tw[j], guard], axis=0
            )

        a_mats = [a_matrix(j) for j in range(3)]

        def body(pc):
            dist2 = None
            for a in a_mats:
                e = _dot_f32x3(pc, a)
                dist2 = e * e if dist2 is None else dist2 + e * e
            return (dist2 < delta_sq).astype(jnp.float32)

        counts = _chunked_counts(p, body)
        counts = counts * jnp.where(degenerate, 0.0, 1.0)
        return counts, [td[0], td[1], td[2], tw0, tw1, tw2]

    return fit_vote


def _pivot_features(frames):
    """Frame batch -> per-observation slot features ``[n, 15]``."""
    r = jnp.asarray(frames.r, jnp.float32)
    t = jnp.asarray(frames.t, jnp.float32)
    rt = jnp.einsum("nij,ni->nj", r, t)
    return jnp.concatenate([r.reshape(r.shape[0], 9), t, rt], axis=1)


def _pivot_p(frames):
    """Vote feature rows ``[17, n_pad]`` = [t(3), R^T t(3), vec(R)(9), 1,
    guard]; the guard row is 0 on live columns and 1e30 on padding."""
    r = jnp.asarray(frames.r, jnp.float32)
    t = jnp.asarray(frames.t, jnp.float32)
    n = t.shape[0]
    n_pad = -(-n // 128) * 128
    rt = jnp.einsum("nij,ni->nj", r, t)
    p = jnp.zeros((17, n_pad), jnp.float32)
    p = p.at[0:3, :n].set(t.T)
    p = p.at[3:6, :n].set(rt.T)
    p = p.at[6:15, :n].set(r.reshape(n, 9).T)
    p = p.at[15, :n].set(1.0)
    p = p.at[16, n:].set(jnp.float32(_GUARD))
    return p


@functools.cache
def absolute_orientation_fit_vote(delta: float):
    """Absolute orientation (rigid registration), fully fused (k = 3 pairs).

    Minimal fit mirrors the reference's orthonormal-frame construction
    (``AbsoluteOrientationParametersEstimator.cxx:14-101``): per point set,
    x = normalize(p0 - mean), y = Gram-Schmidt of (p1 - mean), z = x cross y;
    ``R = R2 R1^T``, ``t = mean2 - R mean1``; collinear triples (|z|^2 below
    the f32 gate) are degenerate.  The vote
    ``||R p1 + t - p2||^2 < delta^2`` (``:316-327``) runs as three direct
    residual-component products via the 3-pass bf16-split dot (safe at
    tracker magnitudes).  Slot feature rows (6): [p1 (3), p2 (3)]; kernel
    param rows (12): [vec(R) 9, t 3] — the host converts to the estimator's
    ``[q (4), t (3)]`` via quaternion extraction.
    """
    delta_sq = float(delta) * float(delta)

    def fit_vote(slot_row, p):
        def pts(base):
            return [[slot_row(base + c, j) for c in range(3)] for j in range(3)]

        first = pts(0)    # first[j][c]
        second = pts(3)

        def build_frame(q):
            mean = [(q[0][c] + q[1][c] + q[2][c]) / 3.0 for c in range(3)]
            x = [q[0][c] - mean[c] for c in range(3)]
            xn2 = x[0] * x[0] + x[1] * x[1] + x[2] * x[2]
            xr = jax.lax.rsqrt(jnp.maximum(xn2, 1e-30))
            x = [x[c] * xr for c in range(3)]
            y = [q[1][c] - mean[c] for c in range(3)]
            d = y[0] * x[0] + y[1] * x[1] + y[2] * x[2]
            y = [y[c] - d * x[c] for c in range(3)]
            yn2 = y[0] * y[0] + y[1] * y[1] + y[2] * y[2]
            yr = jax.lax.rsqrt(jnp.maximum(yn2, 1e-30))
            y = [y[c] * yr for c in range(3)]
            z = [
                x[1] * y[2] - x[2] * y[1],
                x[2] * y[0] - x[0] * y[2],
                x[0] * y[1] - x[1] * y[0],
            ]
            zn2 = z[0] * z[0] + z[1] * z[1] + z[2] * z[2]
            deg = zn2 < 1e-12
            return x, y, z, mean, deg

        x1, y1, z1, m1, d1 = build_frame(first)
        x2, y2, z2, m2, d2 = build_frame(second)
        degenerate = jnp.logical_or(d1, d2)

        # R = R2 R1^T with columns (x, y, z): R[a][b] = x2a x1b + y2a y1b + z2a z1b.
        r = [
            [
                x2[a] * x1[b] + y2[a] * y1[b] + z2[a] * z1[b]
                for b in range(3)
            ]
            for a in range(3)
        ]
        t = [
            m2[a] - (r[a][0] * m1[0] + r[a][1] * m1[1] + r[a][2] * m1[2])
            for a in range(3)
        ]

        # e_j = sum_k R[j,k] p1[k] + t_j - p2[j]; pad guard folds into e_0.
        zeros = jnp.zeros_like(t[0])
        ones = jnp.ones_like(t[0])
        dims = (((0,), (0,)), ((), ()))

        def a_matrix(j):
            p1_rows = [r[j][k] for k in range(3)]
            p2_rows = [-ones if a == j else zeros for a in range(3)]
            guard = ones if j == 0 else zeros
            return jnp.concatenate(p1_rows + p2_rows + [t[j], guard], axis=0)

        a_mats = [a_matrix(j) for j in range(3)]

        def body(pc):
            dist2 = None
            for a in a_mats:
                e = _dot_f32x3(pc, a)
                dist2 = e * e if dist2 is None else dist2 + e * e
            return (dist2 < delta_sq).astype(jnp.float32)

        counts = _chunked_counts(p, body)
        counts = counts * jnp.where(degenerate, 0.0, 1.0)
        rows = [r[a][b] for a in range(3) for b in range(3)] + t
        return counts, rows

    return fit_vote


def _absor_features(data):
    """(first[n, 3], second[n, 3]) -> slot features [n, 6]."""
    first, second = data
    return jnp.concatenate(
        [jnp.asarray(first, jnp.float32), jnp.asarray(second, jnp.float32)],
        axis=1,
    )


def _absor_p(data):
    """Vote feature rows [8, n_pad] = [p1 (3), p2 (3), 1, guard]."""
    first, second = data
    n = first.shape[0]
    n_pad = -(-n // 128) * 128
    p = jnp.zeros((8, n_pad), jnp.float32)
    p = p.at[0:3, :n].set(jnp.asarray(first, jnp.float32).T)
    p = p.at[3:6, :n].set(jnp.asarray(second, jnp.float32).T)
    p = p.at[6, :n].set(1.0)
    p = p.at[7, n:].set(jnp.float32(_GUARD))
    return p


def _absor_post(rows):
    """Kernel rows [vec(R) 9, t 3] -> estimator params [q (4), t (3)]."""
    from lsqrrecipes_tpu.geometry import rotations

    r = jnp.asarray(rows[0:9], jnp.float64).reshape(3, 3)
    q = rotations.quaternion_from_matrix(r)
    return jnp.concatenate([q, jnp.asarray(rows[9:12], jnp.float64)])


@functools.cache
def ray3d_fit_vote(params: tuple):
    """Ray intersection, fully fused (k = 2 rays; ``params = (delta,
    cross_eps)``).

    Minimal fit is the Graphics-Gems midpoint of the common perpendicular
    with near-parallel and negative-ray-parameter rejection
    (``RayIntersectionParametersEstimator.cxx:9-69``).  The vote mirrors
    ``agree`` (``:164-179``): perpendicular foot with t >= 0, via
    ``t = n.(x-p)``, ``dist^2 = |x-p|^2 - t^2 (2 - |n|^2)`` — three
    3-pass split products over feature rows
    ``[p (3), n (3), n.p, 1, |n|^2, |p|^2]`` (the |p|^2 row doubles as the
    1e30 pad guard).  Slot feature rows (6): [p (3), n (3)].
    """
    delta, cross_eps = params
    delta_sq = float(delta) * float(delta)

    def fit_vote(slot_row, p):
        pa = [slot_row(c, 0) for c in range(3)]
        na = [slot_row(3 + c, 0) for c in range(3)]
        pb = [slot_row(c, 1) for c in range(3)]
        nb = [slot_row(3 + c, 1) for c in range(3)]

        def cross(u, v):
            return [
                u[1] * v[2] - u[2] * v[1],
                u[2] * v[0] - u[0] * v[2],
                u[0] * v[1] - u[1] * v[0],
            ]

        def dot3(u, v):
            return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]

        p21 = [pb[c] - pa[c] for c in range(3)]
        cr = cross(na, nb)
        denom = dot3(cr, cr)
        nonparallel = denom >= cross_eps
        safe = jnp.where(nonparallel, denom, 1.0)
        t1 = dot3(cr, cross(p21, nb)) / safe
        t2 = dot3(cr, cross(p21, na)) / safe
        degenerate = jnp.logical_not(
            jnp.logical_and(nonparallel, jnp.logical_and(t1 >= 0, t2 >= 0))
        )
        x = [0.5 * (pa[c] + t1 * na[c] + pb[c] + t2 * nb[c]) for c in range(3)]
        xx = dot3(x, x)

        zeros = jnp.zeros_like(xx)
        ones = jnp.ones_like(xx)
        dims = (((0,), (0,)), ((), ()))

        # P rows: [p (3), n (3), n.p, 1, |n|^2, |p|^2(pad 1e30)].
        a_t = jnp.concatenate(
            [zeros] * 3 + x + [-ones, zeros, zeros, zeros], axis=0
        )                                                   # n.x - n.p
        a_d2 = jnp.concatenate(
            [-2.0 * x[0], -2.0 * x[1], -2.0 * x[2]]
            + [zeros] * 3 + [zeros, xx, zeros, ones], axis=0
        )                                                   # |x-p|^2 (+pad)
        a_nn = jnp.concatenate([zeros] * 8 + [ones, zeros], axis=0)

        def body(pc):
            e_t = _dot_f32x3(pc, a_t)
            e_nn = _dot_f32x3(pc, a_nn)
            q = e_t * e_t * (2.0 - e_nn)
            front = (e_t >= 0.0).astype(jnp.float32)
            e_d2 = _dot_f32x3(pc, a_d2)
            return front * ((e_d2 - q) < delta_sq).astype(jnp.float32)

        counts = _chunked_counts(p, body)
        counts = counts * jnp.where(degenerate, 0.0, 1.0)
        return counts, x

    return fit_vote


def _ray_features(data):
    """Ray3D batch -> slot features [n, 6] = [p, n]."""
    return jnp.concatenate(
        [jnp.asarray(data.p, jnp.float32), jnp.asarray(data.n, jnp.float32)],
        axis=1,
    )


def _ray_p(data):
    """Vote feature rows [10, n_pad] = [p(3), n(3), n.p, 1, |n|^2, |p|^2]."""
    pts = jnp.asarray(data.p, jnp.float32)
    dirs = jnp.asarray(data.n, jnp.float32)
    n = pts.shape[0]
    n_pad = -(-n // 128) * 128
    p = jnp.zeros((10, n_pad), jnp.float32)
    p = p.at[0:3, :n].set(pts.T)
    p = p.at[3:6, :n].set(dirs.T)
    p = p.at[6, :n].set(jnp.sum(dirs * pts, axis=1))
    p = p.at[7, :n].set(1.0)
    p = p.at[8, :n].set(jnp.sum(dirs * dirs, axis=1))
    p = p.at[9, :].set(jnp.float32(_GUARD))
    p = p.at[9, :n].set(jnp.sum(pts * pts, axis=1))
    return p


@functools.cache
def dense_linear6_fit_vote(delta: float):
    """Dense 6-unknown linear system ``A x = b``, fully fused (k = 6 rows).

    The reference solves the square minimal system by SVD pseudo-inverse
    with a rank gate (``DenseLinearEquationSystemParametersEstimator.hxx:
    16-49``); here the equivalent normal equations ``(A^T A) x = A^T b``
    are solved by a fully unrolled 6x6 Cholesky on lane rows (SPD for
    nonsingular A; tiny pivots flag the degenerate rank<6 case the
    reference's gate rejects — an f32 fast-path deviation, the f64 engine
    path keeps exact reference semantics).  The vote ``|a^T x - b| < delta``
    (``:111-119``) is one K=9 band product via the bf16-split dot.
    Slot feature rows (7): ``[a_0..a_5, b]``.
    """
    inv_delta = 1.0 / float(delta)
    eps = 1e-10

    def fit_vote(slot_row, p):
        rows = [[slot_row(c, j) for c in range(7)] for j in range(6)]

        # Normal equations over the 6 sampled rows.
        m = [[None] * 6 for _ in range(6)]
        v = [None] * 6
        for i in range(6):
            for jj in range(i, 6):
                m[i][jj] = sum(rows[s][i] * rows[s][jj] for s in range(6))
            v[i] = sum(rows[s][i] * rows[s][6] for s in range(6))

        # Unrolled Cholesky M = L L^T with degenerate-pivot tracking.
        l = [[None] * 6 for _ in range(6)]
        bad = None
        for i in range(6):
            s = m[i][i]
            for k in range(i):
                s = s - l[i][k] * l[i][k]
            pivot_bad = s < eps
            bad = pivot_bad if bad is None else jnp.logical_or(bad, pivot_bad)
            l[i][i] = jnp.sqrt(jnp.maximum(s, eps))
            for jj in range(i + 1, 6):
                t = m[i][jj]
                for k in range(i):
                    t = t - l[jj][k] * l[i][k]
                l[jj][i] = t / l[i][i]
        degenerate = bad

        # Forward then back substitution.
        y = [None] * 6
        for i in range(6):
            t = v[i]
            for k in range(i):
                t = t - l[i][k] * y[k]
            y[i] = t / l[i][i]
        x = [None] * 6
        for i in reversed(range(6)):
            t = y[i]
            for k in range(i + 1, 6):
                t = t - l[k][i] * x[k]
            x[i] = t / l[i][i]

        # Band |a^T x - b| < delta over P rows [a(6), b, 1, guard].
        w = jnp.where(degenerate, 0.0, inv_delta)
        o = jnp.where(degenerate, 2.0, 0.0)
        a_mat = jnp.concatenate(
            [w * x[c] for c in range(6)] + [-w, o, w], axis=0
        )

        def body(pc):
            e = _dot_f32x3(pc, a_mat)
            return (jnp.abs(e) < 1.0).astype(jnp.float32)

        counts = _chunked_counts(p, body)
        counts = counts * jnp.where(degenerate, 0.0, 1.0)  # pad-guard: see sphere3d
        return counts, x

    return fit_vote


@functools.cache
def crosswire_fit_vote(delta: float):
    """Crosswire US calibration, fully fused (k = 4 tracked images).

    The reference solves the minimal 12x12 system
    ``[u R2 | v R2 | R2 | -I] x = -t2`` by SVD pseudo-inverse and
    orthonormalizes the scaled rotation columns by SVD U V^T
    (``SinglePointTargetUSCalibrationParametersEstimator.cxx:120-270``).
    In-kernel: the lanes-form Householder QR (``linalg.small.
    qr_solve_lanes`` — straight-line VPU code, hypotheses on the lanes) and
    the Newton polar iteration (``ops.us_fast.polar3_lanes``) replace both
    SVDs.  The vote exploits R2's orthogonality:
    ``||R2 img + t2 - t1||^2 = ||img + R2^T t2 - R2^T t1||^2``, three K=16
    3-pass split products over feature rows
    ``[u, v, 1, R2^T t2 (3), vec(R2) (9), guard]`` (guard = 0 live / 1e30
    pad, folded into e_0).  Slot feature rows (14): [vec(R2) 9, t2 3, u, v].
    Kernel param rows (15): [t1 3, t3 3, c1 3, c2 3, c3 3] — the host
    post-process derives scales and Euler angles for the winner only.
    """
    from lsqrrecipes_tpu.linalg.small import qr_solve_lanes
    from lsqrrecipes_tpu.ops.us_fast import polar3_lanes

    delta_sq = float(delta) * float(delta)

    def fit_vote(slot_row, p):
        zero = slot_row(12, 0) * 0.0   # derived from loaded data, not a splat
        one = zero + 1.0
        rows, rhs = [], []
        for a in range(4):
            u, v = slot_row(12, a), slot_row(13, a)
            for j in range(3):
                row = [None] * 12
                for c in range(3):
                    r_jc = slot_row(3 * j + c, a)
                    row[c] = u * r_jc
                    row[3 + c] = v * r_jc
                    row[6 + c] = r_jc
                    row[9 + c] = -one if j == c else zero
                rows.append(row)
                rhs.append(-slot_row(9 + j, a))
        x, ok = qr_solve_lanes(rows, rhs)

        # Scales + closest rotation from the raw scaled columns.
        n1 = x[0] * x[0] + x[1] * x[1] + x[2] * x[2]
        n2 = x[3] * x[3] + x[4] * x[4] + x[5] * x[5]
        ok = jnp.logical_and(ok, jnp.logical_and(n1 > 1e-20, n2 > 1e-20))
        i1 = jax.lax.rsqrt(jnp.maximum(n1, 1e-30))
        i2 = jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
        r1 = [x[i] * i1 for i in range(3)]
        r2c = [x[3 + i] * i2 for i in range(3)]
        r3col = [
            r1[1] * r2c[2] - r1[2] * r2c[1],
            r1[2] * r2c[0] - r1[0] * r2c[2],
            r1[0] * r2c[1] - r1[1] * r2c[0],
        ]
        raw = [[r1[i], r2c[i], r3col[i]] for i in range(3)]
        rot, pok = polar3_lanes(raw)
        degenerate = jnp.logical_not(jnp.logical_and(ok, pok))
        m_x = n1 * i1
        m_y = n2 * i2
        c1 = [m_x * rot[i][0] for i in range(3)]
        c2 = [m_y * rot[i][1] for i in range(3)]
        c3 = [rot[i][2] for i in range(3)]
        t3 = [x[6 + i] for i in range(3)]
        t1 = [x[9 + i] for i in range(3)]

        # Vote: e_j = u c1_j + v c2_j + t3_j + (R2^T t2)_j - (R2 col j).t1
        # over P rows [u, v, 1, rt2 (3), vec(R2) (9), guard].
        zeros = zero
        ones = one

        def a_matrix(j):
            delta_rows = [ones if m == j else zeros for m in range(3)]
            vec_rows = [
                -t1[k] if jj == j else zeros
                for k in range(3)
                for jj in range(3)
            ]
            guard = ones if j == 0 else zeros
            return jnp.concatenate(
                [c1[j], c2[j], t3[j]] + delta_rows + vec_rows + [guard],
                axis=0,
            )

        a_mats = [a_matrix(j) for j in range(3)]

        def body(pc):
            d2 = None
            for a in a_mats:
                e = _dot_f32x3(pc, a)
                d2 = e * e if d2 is None else d2 + e * e
            return (d2 < delta_sq).astype(jnp.float32)

        counts = _chunked_counts(p, body)
        counts = counts * jnp.where(degenerate, 0.0, 1.0)
        return counts, t1 + t3 + c1 + c2 + c3

    return fit_vote


def _crosswire_fused_features(data):
    """(Frame[n], q[n, 2]) -> slot features [n, 14] = [vec(R2), t2, u, v]."""
    frames, q = data
    f32 = jnp.float32
    return jnp.concatenate(
        [
            jnp.asarray(frames.r, f32).reshape(-1, 9),
            jnp.asarray(frames.t, f32),
            jnp.asarray(q, f32),
        ],
        axis=1,
    )


def _crosswire_fused_p(data):
    """Vote feature rows [16, n_pad] = [u, v, 1, R2^T t2 (3), vec(R2) (9),
    guard]; guard = 0 live / 1e30 pad."""
    frames, q = data
    f32 = jnp.float32
    r = jnp.asarray(frames.r, f32)
    t = jnp.asarray(frames.t, f32)
    q32 = jnp.asarray(q, f32)
    n = q32.shape[0]
    n_pad = -(-n // 128) * 128
    rt2 = jnp.einsum("nij,ni->nj", r, t)
    p = jnp.zeros((16, n_pad), f32)
    p = p.at[0:2, :n].set(q32.T)
    p = p.at[2, :n].set(1.0)
    p = p.at[3:6, :n].set(rt2.T)
    p = p.at[6:15, :n].set(r.reshape(n, 9).T)
    p = p.at[15, n:].set(jnp.float32(_GUARD))
    return p


def _crosswire_post(rows):
    """Kernel rows [t1 3, t3 3, c1 3, c2 3, c3 3] -> the estimator's
    20-parameter layout (scales + gimbal-safe Euler derived host-side)."""
    from lsqrrecipes_tpu.estimators.us_calibration import _extract_euler_plus

    v = jnp.asarray(rows, jnp.float64)
    c1, c2, c3 = v[6:9], v[9:12], v[12:15]
    m_x = jnp.linalg.norm(c1)
    m_y = jnp.linalg.norm(c2)
    r3 = jnp.stack(
        [
            c1 / jnp.where(m_x > 0, m_x, 1.0),
            c2 / jnp.where(m_y > 0, m_y, 1.0),
            c3,
        ],
        axis=1,
    )
    wz, wy, wx = _extract_euler_plus(r3)
    return jnp.concatenate(
        [v[0:3], v[3:6], jnp.stack([wz, wy, wx, m_x, m_y]), c1, c2, c3]
    )


def pointer_fit_vote(delta: float):
    """Calibrated-pointer US calibration, fully fused (k = 3 images).

    The reference solves the minimal 9x9 system ``[u R2 | v R2 | R2] x =
    p - t2`` by SVD pseudo-inverse and orthonormalizes the scaled rotation
    columns (``SinglePointTargetUSCalibrationParametersEstimator.cxx:
    671-914``).  In-kernel this is the crosswire recipe minus the t1
    unknowns: lanes-form Householder QR + Newton polar iteration.  The vote
    uses R2's orthogonality — ``||R2(u c1 + v c2 + t3) + t2 - p||^2 =
    ||u c1 + v c2 + t3 - w||^2`` with ``w = R2^T (p - t2)`` precomputed per
    datum — three K=8 3-pass split products over feature rows
    ``[u, v, 1, w (3), guard]`` (guard = 0 live / 1e30 pad, folded into
    e_0).  Slot feature rows (17): [vec(R2) 9, t2 3, u, v, p 3].  Kernel
    param rows (12): [t3 3, c1 3, c2 3, c3 3] — scales and Euler angles are
    derived host-side for the winner only.
    """
    from lsqrrecipes_tpu.linalg.small import qr_solve_lanes
    from lsqrrecipes_tpu.ops.us_fast import polar3_lanes

    delta_sq = float(delta) * float(delta)

    def fit_vote(slot_row, p):
        zero = slot_row(12, 0) * 0.0   # derived from loaded data, not a splat
        one = zero + 1.0
        rows, rhs = [], []
        for a in range(3):
            u, v = slot_row(12, a), slot_row(13, a)
            for j in range(3):
                row = [None] * 9
                for c in range(3):
                    r_jc = slot_row(3 * j + c, a)
                    row[c] = u * r_jc
                    row[3 + c] = v * r_jc
                    row[6 + c] = r_jc
                rows.append(row)
                rhs.append(slot_row(14 + j, a) - slot_row(9 + j, a))
        x, ok = qr_solve_lanes(rows, rhs)

        # Scales + closest rotation from the raw scaled columns.
        n1 = x[0] * x[0] + x[1] * x[1] + x[2] * x[2]
        n2 = x[3] * x[3] + x[4] * x[4] + x[5] * x[5]
        ok = jnp.logical_and(ok, jnp.logical_and(n1 > 1e-20, n2 > 1e-20))
        i1 = jax.lax.rsqrt(jnp.maximum(n1, 1e-30))
        i2 = jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
        r1 = [x[i] * i1 for i in range(3)]
        r2c = [x[3 + i] * i2 for i in range(3)]
        r3col = [
            r1[1] * r2c[2] - r1[2] * r2c[1],
            r1[2] * r2c[0] - r1[0] * r2c[2],
            r1[0] * r2c[1] - r1[1] * r2c[0],
        ]
        raw = [[r1[i], r2c[i], r3col[i]] for i in range(3)]
        rot, pok = polar3_lanes(raw)
        degenerate = jnp.logical_not(jnp.logical_and(ok, pok))
        m_x = n1 * i1
        m_y = n2 * i2
        c1 = [m_x * rot[i][0] for i in range(3)]
        c2 = [m_y * rot[i][1] for i in range(3)]
        c3 = [rot[i][2] for i in range(3)]
        t3 = [x[6 + i] for i in range(3)]

        # Vote: e_j = u c1_j + v c2_j + t3_j - w_j over P rows
        # [u, v, 1, w (3), guard].
        zeros = zero
        ones = one

        def a_matrix(j):
            w_rows = [-ones if m == j else zeros for m in range(3)]
            guard = ones if j == 0 else zeros
            return jnp.concatenate(
                [c1[j], c2[j], t3[j]] + w_rows + [guard], axis=0
            )

        a_mats = [a_matrix(j) for j in range(3)]

        def body(pc):
            d2 = None
            for a in a_mats:
                e = _dot_f32x3(pc, a)
                d2 = e * e if d2 is None else d2 + e * e
            return (d2 < delta_sq).astype(jnp.float32)

        counts = _chunked_counts(p, body)
        counts = counts * jnp.where(degenerate, 0.0, 1.0)
        return counts, t3 + c1 + c2 + c3

    return fit_vote


def _pointer_fused_features(data):
    """(Frame[n], q[n, 2], p[n, 3]) -> slot features [n, 17] =
    [vec(R2), t2, u, v, p]."""
    frames, q, p = data
    f32 = jnp.float32
    return jnp.concatenate(
        [
            jnp.asarray(frames.r, f32).reshape(-1, 9),
            jnp.asarray(frames.t, f32),
            jnp.asarray(q, f32),
            jnp.asarray(p, f32),
        ],
        axis=1,
    )


def _pointer_fused_p(data):
    """Vote feature rows [7, n_pad] = [u, v, 1, R2^T (p - t2) (3), guard];
    guard = 0 live / 1e30 pad."""
    frames, q, p = data
    f32 = jnp.float32
    r = jnp.asarray(frames.r, f32)
    q32 = jnp.asarray(q, f32)
    w = jnp.einsum(
        "nij,ni->nj", r, jnp.asarray(p, f32) - jnp.asarray(frames.t, f32)
    )
    n = q32.shape[0]
    n_pad = -(-n // 128) * 128
    rows = jnp.zeros((7, n_pad), f32)
    rows = rows.at[0:2, :n].set(q32.T)
    rows = rows.at[2, :n].set(1.0)
    rows = rows.at[3:6, :n].set(w.T)
    rows = rows.at[6, n:].set(jnp.float32(_GUARD))
    return rows


def _pointer_post(rows):
    """Kernel rows [t3 3, c1 3, c2 3, c3 3] -> the estimator's 17-parameter
    layout (scales + gimbal-safe Euler derived host-side)."""
    from lsqrrecipes_tpu.estimators.us_calibration import _extract_euler_plus

    v = jnp.asarray(rows, jnp.float64)
    c1, c2, c3 = v[3:6], v[6:9], v[9:12]
    m_x = jnp.linalg.norm(c1)
    m_y = jnp.linalg.norm(c2)
    r3 = jnp.stack(
        [
            c1 / jnp.where(m_x > 0, m_x, 1.0),
            c2 / jnp.where(m_y > 0, m_y, 1.0),
            c3,
        ],
        axis=1,
    )
    wz, wy, wx = _extract_euler_plus(r3)
    return jnp.concatenate(
        [v[0:3], jnp.stack([wz, wy, wx, m_x, m_y]), c1, c2, c3]
    )


def _dense6_features(data):
    return jnp.asarray(data, jnp.float32)


def _dense6_p(data):
    """Vote feature rows [9, n_pad] = [a(6), b, 1, guard]."""
    rows = jnp.asarray(data, jnp.float32)
    n = rows.shape[0]
    n_pad = -(-n // 128) * 128
    p = jnp.zeros((9, n_pad), jnp.float32)
    p = p.at[0:7, :n].set(rows.T)
    p = p.at[7, :n].set(1.0)
    p = p.at[8, n:].set(jnp.float32(_GUARD))
    return p


# ---------------------------------------------------------------------------
# Generic sweep kernel
# ---------------------------------------------------------------------------


def _make_kernel(
    fit_vote,
    k_slots: int,
    d: int,
    n: int,
    b: int,
    m: int,
    mask: int,
    gps: int,
    vote_cols: int,
):
    """gps = groups evaluated per grid step (hypothesis width gps*n amortizes
    the per-step scalar work); vote_cols = number of point columns the
    in-kernel ranking vote sees (< n_pad enables preemptive-RANSAC scoring:
    rank on a random subsample, caller full-votes the winner)."""
    n_h = gps * n

    def kernel(coords_ref, p_ref, best_ref, count_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _init():
            count_ref[0] = jnp.float32(-1.0)
            best_ref[:, :] = jnp.zeros_like(best_ref)

        def slot_row(c, j):
            row = d * j + c
            segs = []
            for q in range(gps):
                units = shift_units(g * gps + q, j, b, m, mask)
                off = pl.multiple_of(units * 128, 128)
                segs.append(coords_ref[row : row + 1, pl.ds(off, n)])
            return segs[0] if gps == 1 else jnp.concatenate(segs, axis=1)

        p_vote = p_ref[:, 0:vote_cols]
        counts, param_rows = fit_vote(slot_row, p_vote)
        cmax = jnp.max(counts, axis=1, keepdims=True)[0, 0]

        @pl.when(cmax > count_ref[0])
        def _update():
            count_ref[0] = cmax
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_h), 1)
            idx = jnp.min(
                jnp.where(counts == cmax, iota, n_h), axis=1, keepdims=True
            )[0, 0]
            onehot = (iota == idx).astype(jnp.float32)
            zeros = jnp.zeros_like(counts)
            pad = [zeros] * (_PARAM_ROWS - len(param_rows) - 1)
            params_all = jnp.concatenate(param_rows + [counts] + pad, axis=0)
            col = jnp.sum(params_all * onehot, axis=1, keepdims=True)
            best_ref[:, :] = jnp.broadcast_to(col, best_ref.shape)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "fit_vote", "k_slots", "d", "total_groups", "n", "gps", "vote_cols",
        "interpret",
    ),
)
def _sweep_call(fit_vote, coords, p, k_slots, d, total_groups, n, gps,
                vote_cols, interpret=False):
    with jax.enable_x64(False):
        m, b, mask = sweep_static(n, k_slots)
        kernel = _make_kernel(fit_vote, k_slots, d, n, b, m, mask, gps, vote_cols)
        return pl.pallas_call(
            kernel,
            grid=(-(-total_groups // gps),),
            interpret=interpret,
            in_specs=[
                pl.BlockSpec(coords.shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(p.shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (_PARAM_ROWS, 128), lambda g: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((_PARAM_ROWS, 128), jnp.float32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        )(coords, p)


def _point_features(dim):
    def features(data):
        pts = jnp.asarray(data, jnp.float32)
        assert pts.ndim == 2 and pts.shape[1] == dim
        return pts

    return features


def _point_check(dim):
    def check(data):
        return getattr(data, "ndim", 0) == 2 and data.shape[1] == dim

    return check


_FAMILIES = {
    # name: (factory, k_slots, feat_rows, n_param_rows, features, pack_p, check)
    "sphere3d": (sphere3d_fit_vote, 4, 3, 4, _point_features(3),
                 lambda d: pack_feature_rows(d, True), _point_check(3)),
    "plane3d": (plane3d_fit_vote, 3, 3, 6, _point_features(3),
                lambda d: pack_feature_rows(d, False), _point_check(3)),
    "line3d": (line3d_fit_vote, 2, 3, 6, _point_features(3),
               lambda d: pack_feature_rows(d, True), _point_check(3)),
    "line2d": (line2d_fit_vote, 2, 2, 4, _point_features(2),
               lambda d: pack_feature_rows(d, False), _point_check(2)),
    "pivot": (pivot_fit_vote, 3, 15, 6, _pivot_features, _pivot_p,
              lambda d: hasattr(d, "r") and hasattr(d, "t")),
    "absolute_orientation": (
        absolute_orientation_fit_vote, 3, 6, 12, _absor_features, _absor_p,
        lambda d: isinstance(d, (tuple, list)) and len(d) == 2
        and getattr(d[0], "ndim", 0) == 2 and d[0].shape[1] == 3,
    ),
    "ray3d": (ray3d_fit_vote, 2, 6, 3, _ray_features, _ray_p,
              lambda d: hasattr(d, "p") and hasattr(d, "n")),
    "dense_linear6": (dense_linear6_fit_vote, 6, 7, 6, _dense6_features,
                      _dense6_p, _point_check(7)),
    "crosswire": (
        crosswire_fit_vote, 4, 14, 15, _crosswire_fused_features,
        _crosswire_fused_p,
        lambda d: isinstance(d, (tuple, list)) and len(d) == 2
        and hasattr(d[0], "r") and getattr(d[1], "ndim", 0) == 2
        and d[1].shape[1] == 2,
    ),
    "pointer": (
        pointer_fit_vote, 3, 17, 12, _pointer_fused_features,
        _pointer_fused_p,
        lambda d: isinstance(d, (tuple, list)) and len(d) == 3
        and hasattr(d[0], "r") and getattr(d[1], "ndim", 0) == 2
        and d[1].shape[1] == 2 and getattr(d[2], "ndim", 0) == 2
        and d[2].shape[1] == 3,
    ),
}

# Optional host-side conversion from kernel param rows to the estimator's
# native layout (applied by fused_sweep on the winning column).
_POSTPROCESS = {
    "absolute_orientation": _absor_post,
    "crosswire": _crosswire_post,
    "pointer": _pointer_post,
}


def _data_n(data):
    return jax.tree_util.tree_leaves(data)[0].shape[0]


def supports_data(family: str, data) -> bool:
    """True if the fused sweep covers this (family, data) pair."""
    if family not in _FAMILIES:
        return False
    _, k_slots, _, _, _, _, check = _FAMILIES[family]
    try:
        if not check(data):
            return False
        fit_size(_data_n(data), k_slots)
    except AssertionError:
        return False
    return True


def _auto_interpret() -> bool:
    """Interpret-mode default: True when the computation will land on the
    host CPU (tests/dry runs), False on a real chip."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", None) == "cpu"
    return jax.default_backend() == "cpu"


def fused_sweep(
    family: str,
    data,
    key,
    total_groups: int,
    delta: float,
    groups_per_step: int = 1,
    vote_subsample: int = 0,
    interpret=None,
):
    """Run a whole fused sweep: ``total_groups * n`` hypotheses, one kernel.

    ``data`` is the estimator's native data (a point array, or a Frame batch
    for the pivot family).  Returns ``(best_count int32[], best_params
    f32[n_param_rows])`` with the estimator's native param layout.  All
    hypothesis shift tuples are distinct while
    ``total_groups <= (4n/128)^k``.

    ``groups_per_step`` evaluates several groups per grid step (hypothesis
    width ``gps * n``), amortizing the per-step scalar work at the cost of a
    ``gps``-times-larger VMEM band matrix.

    ``vote_subsample`` (a multiple of 128, < n) switches the in-kernel
    ranking vote to a random observation subsample — preemptive-RANSAC-style
    scoring: every hypothesis is still fitted, but ranked by its inlier
    count on ``vote_subsample`` observations (a uniform random subset, fixed
    per sweep); the returned count is the winner's SUBSAMPLE count, so
    callers must re-vote the winner on the full data (``ransac_fused_sweep``
    does).  This trades exact vote ranking for an
    ~``n/vote_subsample``-fold cut in MXU work; with a clear dominant
    structure the selected consensus is the same.  0 = exact full vote.

    ``interpret`` runs the kernel in Pallas interpret mode; the default
    (``None``) auto-selects interpret when the default device is the host
    CPU (tests / virtual-mesh dry runs).  Interpret mode is NOT a numerics
    gate; real-chip behavior is verified by ``scripts/chip_check.py``.
    """
    factory, k_slots, feat_rows, npr, features, pack_p, _check = _FAMILIES[family]
    n = _data_n(data)
    n_fit = fit_size(n, k_slots)  # validates early
    delta_arg = tuple(delta) if isinstance(delta, (tuple, list)) else float(delta)
    if vote_subsample:
        assert vote_subsample % 128 == 0 and 0 < vote_subsample <= n
        key, sub = jax.random.split(key)
        # The kernel ranks on the FIRST vote_subsample feature columns, so
        # shuffle the observation order once per sweep (the guard row layout
        # is preserved by permuting before packing).
        perm = jax.random.permutation(sub, n)
        p = pack_p(jax.tree_util.tree_map(lambda a: a[perm], data))
        vote_cols = vote_subsample
    else:
        p = pack_p(data)
        vote_cols = p.shape[1]
    coords = slot_planes(_pad_features(features(data), n_fit), key, k_slots)
    if interpret is None:
        interpret = _auto_interpret()
    best = _sweep_call(
        factory(delta_arg), coords, p, k_slots, feat_rows, total_groups, n_fit,
        groups_per_step, vote_cols, bool(interpret),
    )
    params = best[0:npr, 0]
    post = _POSTPROCESS.get(family)
    if post is not None:
        params = post(params)
    return best[npr, 0].astype(jnp.int32), params


def reference_samples(family: str, data, key, total_groups: int):
    """Pure-jnp reconstruction of the sweep's hypothesis set (tests):
    feature-row samples ``[total_groups * n, k_slots, feat_rows]`` (for point
    families this is the engine's ``[B, k, d]`` sample layout; pivot rows
    are ``[vec(R) 9, t 3, R^T t 3]``)."""
    _, k_slots, feat_rows, _, features, _, _ = _FAMILIES[family]
    n = fit_size(_data_n(data), k_slots)
    m, b, mask = sweep_static(n, k_slots)
    planes = slot_planes(_pad_features(features(data), n), key, k_slots)
    slots = []
    for j in range(k_slots):
        segs = []
        for g in range(total_groups):
            s = int(shift_units(g, j, b, m, mask)) * 128
            segs.append(planes[feat_rows * j : feat_rows * (j + 1), s : s + n])
        slots.append(jnp.concatenate(segs, axis=1))         # [F, B]
    stacked = jnp.stack(slots, axis=0)                      # [k, F, B]
    return jnp.transpose(stacked, (2, 0, 1))
