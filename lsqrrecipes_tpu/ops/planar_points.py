"""Planar (lanes-batched) f64 structured sweep for the 3D sphere.

The faithful-f64 generic engine (``ransac.engine.hypothesize_and_vote``)
pays three TPU taxes on its way to ~1x a single x86 core: threefry index
generation + row gathers for ``[B, k]`` samples, the ``[B, k, d]`` sample
layout whose tiny trailing dims tile to (8, 128) — a ``[8192, 4, 3]`` f64
array occupies 64 MB — and vmapped Cramer fits whose reductions run across
those padded axes.  This module removes all three while KEEPING the
reference's f64 semantics exactly:

  * sampling is the engine's structured permutation + static-shift scheme
    (same shift table, same hypothesis sets as ``structured_samples``),
    built as contiguous rolls of a ``[d, n]`` plane — no gathers;
  * the minimal circumsphere fit is the reference's equal-radius Cramer
    system (``SphereParametersEstimator.hxx:80-163``, ``|det| < SPHERE_EPS``
    gate) evaluated as pure lane arithmetic on ``[B]`` vectors;
  * the vote is the estimator's own exact ``agree`` semantics
    (``| ||p-c|| - r | < delta``), evaluated sqrt-free as the equivalent
    squared band ``(max(r-delta,0))^2 < d2 < (r+delta)^2`` — by default in
    CERTIFIED double-single pair-f32 arithmetic (``_ds_vote_counts``:
    exact split products + compensated sums; every cell decided exactly
    over the f64 inputs except within ~2^-45 * scale of the band edge),
    with the all-f64 evaluation retained as ``vote="f64"`` — the parity
    oracle, bit-identical to the estimator vote path.

Fits and gates are exact f64 throughout; no Pallas.  The chip's f64 is
emulated at ~2.9 G madd/s, which made the all-f64 vote product 77% of the
sweep (docs/PERF.md "generic engine") — the DS vote does that work in
native f32 without changing which points vote on any workload that does
not place a point within ~2^-45 * scale of the band boundary (the f64
engine itself differs from the reference's differently-associated C++
expression at the ~2^-52 level, so this contract is smaller in measure
than the one it inherits).
"""

import functools

import jax
import jax.numpy as jnp

from lsqrrecipes_tpu.config import SPHERE_EPS
from lsqrrecipes_tpu.ransac.sampling import structured_shift_table

_F32 = jnp.float32
_SPLIT = 4097.0  # 2^12 + 1 (Dekker)


def _pair_of_f64(x):
    """Exact f64 -> (hi, lo) f32 pair: hi = fl32(x), lo = fl32(x - hi)."""
    hi = x.astype(_F32)
    lo = (x - hi.astype(x.dtype)).astype(_F32)
    return hi, lo


def _dekker(x):
    """Exact 12-bit split of an f32: x = hi + lo, products of his exact."""
    t = x * _F32(_SPLIT)
    hi = t - (t - x)
    return hi, x - hi


def _two_sum(a, b):
    s = a + b
    bp = s - a
    return s, (a - (s - bp)) + (b - bp)


def _ds_point_pack(points):
    """Point-side DS operands, computed ONCE per sweep: pair splits and
    Dekker sub-splits of each coordinate plus the p2 pair.  Hoisted out of
    the vote so a chunked sweep does not redo the O(n) splitting per
    chunk."""
    ph = [None] * 3
    pl = [None] * 3
    phh = [None] * 3
    phl = [None] * 3
    for d in range(3):
        ph[d], pl[d] = _pair_of_f64(points[:, d])        # [n]
        phh[d], phl[d] = _dekker(ph[d])
    p2 = jnp.sum(points * points, axis=-1)               # [n] f64
    p2h, p2l = _pair_of_f64(p2)
    return ph, pl, phh, phl, p2h, p2l


def _ds_vote_counts(point_pack, c_bt, r, delta):
    """Certified double-single band vote: counts [B] for |dist - r| < delta.

    All per-cell arithmetic is native f32 on PAIRS (hi, lo): operands
    split exactly from their f64 values, products made exact by 12-bit
    Dekker splits, sums compensated by TwoSum.  Every cell is decided
    exactly as in real arithmetic over the f64 INPUT values unless
    |d2 - (r +- delta)^2| < ~2^-45 * scale — two orders tighter than the
    2^-52-level divergence the f64 engine itself has vs the reference's
    differently-associated expression (``SphereParametersEstimator.hxx:
    255-264`` computes ||p-c|| by subtract-square-sum; the engine uses
    p2 - 2 c.p + c2 — both round), so the boundary-tie contract is
    unchanged in kind and smaller in measure.  Exactly-representable
    workloads (integer coordinates) incur NO rounding anywhere and match
    the f64 vote bit-for-bit (tests pin this).  vs the emulated-f64
    einsum this is ~2.9 G f64-madd/s -> native-f32 VPU work.

    ``point_pack`` from :func:`_ds_point_pack` (shared across chunks).
    """
    ph, pl, phh, phl, p2h, p2l = point_pack
    ch = [None] * 3
    cl = [None] * 3
    chh = [None] * 3
    chl = [None] * 3
    for d in range(3):
        ch[d], cl[d] = _pair_of_f64(c_bt[:, d])          # [B]
        chh[d], chl[d] = _dekker(ch[d])

    # Hypothesis-side constants in f64, then exact pair splits:
    # a2 = c2 - hi2 and a2l = c2 - lo2 fold the band edges into the
    # d2-expression so the comparison is against 2 c.p directly:
    #   d2 < hi2  <=>  (p2 + c2 - hi2) < 2 c.p ... sign care -> keep
    # the straightforward form instead: diff = p2 - 2cp + c2 - bound.
    c2 = jnp.sum(c_bt * c_bt, axis=-1)                   # [B] f64
    rp = r + delta
    rm = r - delta
    hi2 = rp * rp
    lo2 = rm * rm

    # Per-hypothesis f64 combinations, split once: q_hi = c2 - hi2,
    # q_lo = c2 - lo2 (exact f64 rounding, part of the "input values").
    qh_hi, qh_lo = _pair_of_f64(c2 - hi2)                # [B]
    ql_hi, ql_lo = _pair_of_f64(c2 - lo2)

    # cp pair over the 3 dims: exact products + TwoSum accumulation.
    s = None
    e = None
    for d in range(3):
        prod = ch[d][:, None] * ph[d][None, :]           # [B, n]
        err = (
            (chh[d][:, None] * phh[d][None, :] - prod)
            + chh[d][:, None] * phl[d][None, :]
            + chl[d][:, None] * phh[d][None, :]
        ) + chl[d][:, None] * phl[d][None, :]
        cross = ch[d][:, None] * pl[d][None, :] + cl[d][:, None] * ph[d][None, :]
        if s is None:
            s, e = prod, err + cross
        else:
            s, t = _two_sum(s, prod)
            e = e + (t + err + cross)

    # diff_hi = p2 - 2 cp + (c2 - hi2): hi parts via TwoSum, lo parts
    # accumulated plainly (all ~2^-24 of the his).
    m2s = -2.0 * s                                       # exact (power of 2)
    m2e = -2.0 * e
    u, ue = _two_sum(p2h[None, :], m2s)
    v, ve = _two_sum(u, qh_hi[:, None])
    diff_hi = v
    diff_lo = ue + ve + (p2l[None, :] + m2e + qh_lo[:, None])
    lt_hi = (diff_hi + diff_lo) < 0.0

    v2, v2e = _two_sum(u, ql_hi[:, None])
    dlo_lo = ue + v2e + (p2l[None, :] + m2e + ql_lo[:, None])
    gt_lo = (v2 + dlo_lo) > 0.0
    # Lower edge vanishes when r < delta; at r == delta, q_lo == c2 and
    # the same comparison is exactly the strict d2 > 0 test.
    gt_lo = jnp.where((rm >= 0.0)[:, None], gt_lo, True)

    return jnp.sum(lt_hi & gt_lo, axis=-1).astype(jnp.int32)


def _slot_planes(points_t, table, groups, j):
    segs = [
        jnp.roll(points_t, -int(table[g][j]), axis=1) for g in range(groups)
    ]
    return segs[0] if groups == 1 else jnp.concatenate(segs, axis=1)


@functools.partial(jax.jit, static_argnames=("groups", "chunk", "vote"))
def sphere3d_planar_sweep(points, key, groups: int, delta: float,
                          chunk: int = 0, vote: str = "ds"):
    """``groups * n`` structured hypotheses -> ``(counts [B], params [B, 4])``.

    Identical hypothesis sets to
    ``structured_samples(key, points, 4, groups)`` (same permutation, same
    static shift table); degenerate fits forced to count -1.  ``chunk``
    bounds the ``[chunk, n]`` vote buffer (0 = whole batch at once).

    ``vote``: ``"ds"`` (default) decides the band with certified
    double-single pair-f32 arithmetic — native VPU speed, every cell exact
    over the f64 inputs except within ~2^-45 * scale of the band edge
    (see :func:`_ds_vote_counts`; the emulated-f64 product it replaces was
    77% of the sweep).  ``"f64"`` evaluates the squared band entirely in
    f64 — bit-identical to the estimator vote path — and remains the
    parity oracle (count equality between the two is pinned in
    tests/test_ops.py on bench-style and exactly-representable data).
    """
    n, d = points.shape
    assert d == 3
    perm = jax.random.permutation(key, n)
    pts_t = points[perm].T                                 # [3, n]
    table = structured_shift_table(n, 4, groups)

    q0, q1, q2, q3 = (_slot_planes(pts_t, table, groups, j) for j in range(4))

    # Equal-radius system rows m_i = q0 - q_{i+1} (3 rows of [3, B]),
    # rhs_i = m_i . (q0 + q_{i+1}); center = adj(M) rhs / (2 det M).
    rest = (q1, q2, q3)
    m = [q0 - q for q in rest]                             # rows: [3, B] each
    rhs = [jnp.sum(mi * (q0 + qi), axis=0) for mi, qi in zip(m, rest)]

    def cof(r1, r2, c1, c2):
        return m[r1][c1] * m[r2][c2] - m[r1][c2] * m[r2][c1]

    # adj[i][j] = cofactor(j, i)
    adj = [[cof((j + 1) % 3, (j + 2) % 3, (i + 1) % 3, (i + 2) % 3)
            for j in range(3)] for i in range(3)]
    det = m[0][0] * adj[0][0] + m[0][1] * adj[1][0] + m[0][2] * adj[2][0]
    valid = jnp.abs(det) >= SPHERE_EPS
    inv2det = 0.5 / jnp.where(valid, det, 1.0)
    center = jnp.stack(
        [(adj[i][0] * rhs[0] + adj[i][1] * rhs[1] + adj[i][2] * rhs[2])
         * inv2det for i in range(3)]
    )                                                      # [3, B]
    r = jnp.sqrt(jnp.sum((q0 - center) ** 2, axis=0))      # [B]

    # Exact agree vote, sqrt-free: |sqrt(max(d2,0)) - r| < delta is, in real
    # arithmetic, the squared band  (max(r-delta,0))^2 < d2 < (r+delta)^2
    # (strict at the lower edge, so r == delta still demands d2 > 0).  The
    # band edges are per-hypothesis constants computed once per column; the
    # per-cell work drops from emulated-f64 sqrt+abs+compare to two compares,
    # with the dominant d2 term still one [B, 3] @ [3, n] matmul on the MXU.
    # ``SphereParametersEstimator.hxx:255-264`` is the predicate being
    # squared; the literal |sqrt - r| form survives as the parity oracle in
    # ``estimators.sphere.Sphere.agree`` (count-equality pinned in
    # tests/test_ops.py).
    b = center.shape[1]
    c_bt = center.T                                        # [B, 3]
    p2 = jnp.sum(points * points, axis=-1)                 # [n]
    c2 = jnp.sum(c_bt * c_bt, axis=-1)                     # [B]

    if vote == "ds":
        pack = _ds_point_pack(points)  # once per sweep, shared by chunks

        def vote_fn(c_blk, c2_blk, r_blk):
            # c2_blk is part of the chunking tuple but recomputed in-pair
            # inside the DS vote (it needs the exact f64 value, not a
            # pre-rounded one) — only the f64 mode consumes it.
            return _ds_vote_counts(pack, c_blk, r_blk, delta)
    else:
        def vote_fn(c_blk, c2_blk, r_blk):
            cp = jnp.einsum("bd,nd->bn", c_blk, points,
                            preferred_element_type=points.dtype)
            d2 = p2[None, :] - 2.0 * cp + c2_blk[:, None]
            rp = r_blk + delta
            rm = r_blk - delta
            hi2 = rp * rp
            lo2 = jnp.where(rm >= 0.0, rm * rm, -jnp.inf)
            return jnp.sum(
                (d2 < hi2[:, None]) & (d2 > lo2[:, None]), axis=-1
            )

    if chunk and chunk < b:
        assert b % chunk == 0
        counts = jax.lax.map(
            lambda args: vote_fn(*args),
            (c_bt.reshape(-1, chunk, 3), c2.reshape(-1, chunk),
             r.reshape(-1, chunk)),
        ).reshape(-1)
    else:
        counts = vote_fn(c_bt, c2, r)

    counts = jnp.where(valid, counts, -1)
    params = jnp.concatenate([c_bt, r[:, None]], axis=1)
    return counts, params


def planar_samples_reference(points, key, groups: int):
    """The hypothesis set of :func:`sphere3d_planar_sweep` as the engine's
    ``[B, k, d]`` sample layout (tests)."""
    n = points.shape[0]
    perm = jax.random.permutation(key, n)
    pts = points[perm]
    table = structured_shift_table(n, 4, groups)
    rows = []
    for g in range(groups):
        slot = [jnp.roll(pts, -int(table[g][j]), axis=0) for j in range(4)]
        rows.append(jnp.stack(slot, axis=1))               # [n, 4, 3]
    return jnp.concatenate(rows, axis=0)
