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
    squared band ``(max(r-delta,0))^2 < d2 < (r+delta)^2`` with the
    dominant term as one ``[B, 3] @ [3, n]`` matmul.

Everything is f64: no Pallas, no precision tricks — this is the generic
engine's throughput driver, not a redesign of its numerics.
"""

import functools

import jax
import jax.numpy as jnp

from lsqrrecipes_tpu.config import SPHERE_EPS
from lsqrrecipes_tpu.ransac.sampling import structured_shift_table


def _slot_planes(points_t, table, groups, j):
    segs = [
        jnp.roll(points_t, -int(table[g][j]), axis=1) for g in range(groups)
    ]
    return segs[0] if groups == 1 else jnp.concatenate(segs, axis=1)


@functools.partial(jax.jit, static_argnames=("groups", "chunk"))
def sphere3d_planar_sweep(points, key, groups: int, delta: float,
                          chunk: int = 0):
    """``groups * n`` structured hypotheses -> ``(counts [B], params [B, 4])``.

    Identical hypothesis sets to
    ``structured_samples(key, points, 4, groups)`` (same permutation, same
    static shift table); counts are the exact f64 ``agree`` votes with
    degenerate fits forced to -1.  ``chunk`` bounds the ``[chunk, n]`` vote
    buffer (0 = whole batch at once).
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

    def vote(c_blk, c2_blk, r_blk):
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
            lambda args: vote(*args),
            (c_bt.reshape(-1, chunk, 3), c2.reshape(-1, chunk),
             r.reshape(-1, chunk)),
        ).reshape(-1)
    else:
        counts = vote(c_bt, c2, r)

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
