"""Sufficient-statistics Levenberg-Marquardt for feature-affine residuals.

The reference's heaviest LM use is the ultrasound-calibration refits
(``SinglePointTargetUSCalibrationParametersEstimator.cxx:272-297,916-973``,
``PlanePhantomUSCalibrationParametersEstimator.cxx:357-447``): per LM
iteration, vnl_levenberg_marquardt re-evaluates residuals and an analytic
Jacobian over ALL n observations — O(n) work per iteration, every iteration.

This module exploits a structural fact of those objectives: after rotating
each residual by the (orthogonal, norm-preserving) tracker rotation R2_i,
every per-observation residual is LINEAR in a fixed per-observation feature
vector ``h_i`` with parameter-dependent coefficients:

    r_i(x) = W(x) h_i          W: [R, F],  h_i: [F]

Therefore the entire Gauss-Newton structure collapses onto ONE sufficient
statistic, the (mask-weighted) feature Gram matrix ``H = sum_i m_i h_i
h_i^T``:

    cost(x)  = 0.5 tr(W H W^T)
    g(x)     = J^T r = einsum(T, H, W)        T = dW/dx: [R, F, P]
    J^T J(x) = einsum(T, H, T)

so every LM iteration costs O(R F^2 P + P^2 F R) — INDEPENDENT of n.  The
observations are touched exactly once (building H: one matmul, MXU-shaped),
and thousands of independent problems vmap over lanes.  This replaces the
reference's per-iteration Jacobian loops with precomputation + tiny dense
algebra — the TPU-first redesign of SURVEY.md §2.7 "LM inner-step
parallelism" (and it is exact: same normal equations in exact arithmetic,
run through the identical damping loop ``linalg.lm.lm_core``).

Feature maps (all cite the reference residual definitions):

  * pointer (P=8): rho_i = R2_i^T r_i = A(x) z_i - y_i with z = (u, v, 1),
    y = R2^T (p - t2), A = [m_x r1 | m_y r2 | t3]  (``...cxx:1059-1149``).
    F=6: h = [z, y].
  * crosswire (P=11): rho_i = A(x) z_i + R2^T t2 - R2^T t1; the t1 term is
    linear in the 9 features vec(R2).  F=15: h = [z, R2^T t2, vec(R2)]
    (``...cxx:415-509``).
  * plane phantom (P=11): scalar r_i = n(x)^T (R2 A z + t2) + t1_z, linear
    in F=31 features h = [R2 (x) z (27), t2 (3), 1] — exactly the
    homogeneous 31-column system of the analytic fit
    (``PlanePhantom...cxx:119-355`` / residual ``:357-447``).
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from lsqrrecipes_tpu.geometry import rotations
from lsqrrecipes_tpu.linalg.lm import LMConfig, LMResult, lm_core


def feature_lm(
    w_fn: Callable,
    h: jnp.ndarray,
    x0: jnp.ndarray,
    config: LMConfig = LMConfig(),
) -> LMResult:
    """Minimize ``0.5 sum_i ||W(x) h_i||^2`` given ``H = sum h_i h_i^T``.

    ``w_fn(x) -> W [R, F]`` must be jit-traceable (its Jacobian is taken
    with ``jax.jacfwd``).  Runs the identical damping loop as
    :func:`lsqrrecipes_tpu.linalg.levenberg_marquardt`.
    """

    def cost_of(x):
        w = w_fn(x)
        return 0.5 * jnp.sum((w @ h) * w)

    def normal_system(x):
        w = w_fn(x)
        t = jax.jacfwd(w_fn)(x)                    # [R, F, P]
        g = jnp.einsum("rfp,rf->p", t, w @ h)
        th = jnp.einsum("rfp,fe->rep", t, h)
        jtj = jnp.einsum("rep,req->pq", th, t)
        return jtj, g

    return lm_core(normal_system, cost_of, x0, config)


# ---------------------------------------------------------------------------
# Objective adapters.  Parameter layouts match the residual functions in
# estimators/us_calibration.py exactly, so minima are directly comparable.


def _weights(n, mask, dtype):
    if mask is None:
        return jnp.ones((n,), dtype)
    return mask.astype(dtype)


def pointer_w(x):
    """x = [t3(3), w_z, w_y, w_x, m_x, m_y] -> W [3, 6]."""
    t3 = x[0:3]
    r3 = rotations.matrix_from_euler_zyx(x[5], x[4], x[3])
    a = jnp.stack([x[6] * r3[:, 0], x[7] * r3[:, 1], t3], axis=1)
    return jnp.concatenate([a, -jnp.eye(3, dtype=x.dtype)], axis=1)


def pointer_stats(data, mask=None):
    """H [6, 6] for the pointer objective; h = [u, v, 1, R2^T(p - t2)]."""
    frames, q, p = data
    y = jnp.einsum("nji,nj->ni", frames.r, p - frames.t)
    ones = jnp.ones_like(q[:, :1])
    h = jnp.concatenate([q, ones, y], axis=1)
    w = _weights(h.shape[0], mask, h.dtype)
    return jnp.einsum("ni,nj,n->ij", h, h, w)


def crosswire_w(x):
    """x = [t1(3), t3(3), w_z, w_y, w_x, m_x, m_y] -> W [3, 15]."""
    t1, t3 = x[0:3], x[3:6]
    r3 = rotations.matrix_from_euler_zyx(x[8], x[7], x[6])
    a = jnp.stack([x[9] * r3[:, 0], x[10] * r3[:, 1], t3], axis=1)
    eye = jnp.eye(3, dtype=x.dtype)
    t1_block = -jnp.kron(t1[None, :], eye)       # [3, 9]: [b, 3a+b] = -t1_a
    return jnp.concatenate([a, eye, t1_block], axis=1)


def crosswire_stats(data, mask=None):
    """H [15, 15]; h = [u, v, 1, R2^T t2, vec(R2) row-major]."""
    frames, q = data
    n = q.shape[0]
    y = jnp.einsum("nji,nj->ni", frames.r, frames.t)
    ones = jnp.ones_like(q[:, :1])
    h = jnp.concatenate([q, ones, y, frames.r.reshape(n, 9)], axis=1)
    w = _weights(n, mask, h.dtype)
    return jnp.einsum("ni,nj,n->ij", h, h, w)


def phantom_w(x):
    """x = [w1_y, w1_x, t1_z, t3(3), w3_z, w3_y, w3_x, m_x, m_y] -> W [1, 31]."""
    cy1, sy1 = jnp.cos(x[0]), jnp.sin(x[0])
    cx1, sx1 = jnp.cos(x[1]), jnp.sin(x[1])
    nrm = jnp.stack([-sy1, cy1 * sx1, cy1 * cx1])
    t3 = x[3:6]
    r3 = rotations.matrix_from_euler_zyx(x[8], x[7], x[6])
    a = jnp.stack([x[9] * r3[:, 0], x[10] * r3[:, 1], t3], axis=1)
    na = jnp.einsum("a,bc->abc", nrm, a).reshape(-1)     # (a*3+b)*3+c
    return jnp.concatenate([na, nrm, x[2:3]])[None, :]


def phantom_stats(data, mask=None):
    """H [31, 31]; h = [R2[a,b] z_c (27, (a*3+b)*3+c), t2 (3), 1]."""
    frames, q = data
    n = q.shape[0]
    ones = jnp.ones_like(q[:, :1])
    z = jnp.concatenate([q, ones], axis=1)               # [n, 3]
    rz = jnp.einsum("nab,nc->nabc", frames.r, z).reshape(n, 27)
    h = jnp.concatenate([rz, frames.t, ones], axis=1)
    w = _weights(n, mask, h.dtype)
    return jnp.einsum("ni,nj,n->ij", h, h, w)


def pointer_features(data):
    """Raw feature matrix ``h [n, 6]`` (constant column at index 2)."""
    frames, q, p = data
    y = jnp.einsum("nji,nj->ni", frames.r, p - frames.t)
    ones = jnp.ones_like(q[:, :1])
    return jnp.concatenate([q, ones, y], axis=1)


def crosswire_features(data):
    """``h [n, 15]`` (constant column at index 2)."""
    frames, q = data
    n = q.shape[0]
    y = jnp.einsum("nji,nj->ni", frames.r, frames.t)
    ones = jnp.ones_like(q[:, :1])
    return jnp.concatenate([q, ones, y, frames.r.reshape(n, 9)], axis=1)


def phantom_features(data):
    """``h [n, 31]`` (constant column at index 30)."""
    frames, q = data
    n = q.shape[0]
    ones = jnp.ones_like(q[:, :1])
    z = jnp.concatenate([q, ones], axis=1)
    rz = jnp.einsum("nab,nc->nabc", frames.r, z).reshape(n, 27)
    return jnp.concatenate([rz, frames.t, ones], axis=1)


_OBJECTIVES = {
    "pointer": (pointer_w, pointer_stats, pointer_features, 2),
    "crosswire": (crosswire_w, crosswire_stats, crosswire_features, 2),
    "plane_phantom": (phantom_w, phantom_stats, phantom_features, 30),
}


def _centered_problem(w_fn, h, wts, const_idx):
    """Exact feature centering against the constant column.

    The raw Gram matrix mixes O(1e2-1e3)-scale features, so the stats cost
    ``0.5 tr(W H W^T)`` cancels ~6-8 digits against the ~noise-scale cost —
    enough that on-chip emulated-f64 jitter keeps vnl-tight tolerances
    (1e-15) from ever tripping.  ``h'_j = h_j - m_j h_const`` with
    ``W' = W S`` (``S = I + m e_const^T``) is an EXACT change of basis
    (``W' h' == W h``) that shrinks the Gram scale to the data's variance.
    """
    m = (wts @ h) / jnp.maximum(jnp.sum(wts), 1.0)
    m = m.at[const_idx].set(0.0)
    hc = h - m[None, :] * h[:, const_idx:const_idx + 1]
    gram = jnp.einsum("ni,nj,n->ij", hc, hc, wts)

    def w_fn_c(x):
        w = w_fn(x)
        return w.at[:, const_idx].add(w @ m)

    return w_fn_c, gram


def centered_from_gram(w_fn, g_raw, const_idx):
    """Centered problem from a RAW Gram matrix ``G = sum w h h^T``.

    The centering mean is recoverable from G itself (``m_j = G[j, c] /
    G[c, c]`` — the constant feature is 1), so a distributed refit needs
    only ONE psum of the raw Gram; the centered Gram is the congruence
    ``(I - m e_c^T) G (I - m e_c^T)^T``.  Semantically identical to
    :func:`_centered_problem` on the raw features, but the congruence
    perturbs H by ~eps*(raw scale) at build time, so
    ``parallel.sharded.sharded_us_feature_lm`` now prefers two psums
    ([F] feature sum, then the feature-centered Gram); this one-psum
    variant remains for communication-critical callers.
    """
    f_n = g_raw.shape[-1]
    m = g_raw[:, const_idx] / jnp.maximum(g_raw[const_idx, const_idx], 1.0)
    m = m.at[const_idx].set(0.0)
    s = jnp.eye(f_n, dtype=g_raw.dtype) - jnp.outer(
        m, jnp.zeros((f_n,), g_raw.dtype).at[const_idx].set(1.0)
    )
    gram = s @ g_raw @ s.T

    def w_fn_c(x):
        w = w_fn(x)
        return w.at[:, const_idx].add(w @ m)

    return w_fn_c, gram


def us_feature_lm(
    kind: str,
    data,
    x0: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    config: LMConfig = LMConfig(),
) -> LMResult:
    """One US-calibration LM refit from (centered) sufficient statistics."""
    w_fn, _, feats_fn, const_idx = _OBJECTIVES[kind]
    h = feats_fn(data)
    wts = _weights(h.shape[0], mask, h.dtype)
    w_fn_c, gram = _centered_problem(w_fn, h, wts, const_idx)
    return feature_lm(w_fn_c, gram, x0, config)


def _quad_batched(w_fn, h, x, w_args=()):
    """Batched (J^T J [B, P, P], g [B, P]) from Grams ``h [B, F, F]``.

    Everything is 2-D-sliced: under vmap the per-lane einsums become f64
    batched dot_generals over tiny [B, R, F, P] operands whose trailing
    dims pad to (8, 128) tiles — measured 23 ms per iteration at B=4096 on
    the chip.  Unrolling the small R x F indices in Python keeps every
    array [B], [B, P] or [B, P, P]: ~1-2 ms for the same arithmetic.

    ``w_args`` are optional extra PER-LANE ``[B, ...]`` operands passed to
    ``w_fn(x, *w_args)`` (e.g. a per-problem centering mean); the Jacobian
    is still taken w.r.t. ``x`` only.
    """
    w = jax.vmap(w_fn)(x, *w_args)                      # [B, R, F]
    t = jax.vmap(jax.jacfwd(w_fn))(x, *w_args)          # [B, R, F, P]
    r_n, f_n = w.shape[1], w.shape[2]
    wcol = [[w[:, r, f] for f in range(f_n)] for r in range(r_n)]
    hcol = [[h[:, f, e] for e in range(f_n)] for f in range(f_n)]
    tcol = [[t[:, r, f, :] for f in range(f_n)] for r in range(r_n)]

    wh = [
        [sum(wcol[r][f] * hcol[f][e] for f in range(f_n)) for e in range(f_n)]
        for r in range(r_n)
    ]
    g = 0.0
    for r in range(r_n):
        for f in range(f_n):
            g = g + tcol[r][f] * wh[r][f][:, None]
    jtj = 0.0
    for r in range(r_n):
        for e in range(f_n):
            u = sum(hcol[f][e][:, None] * tcol[r][f] for f in range(f_n))
            jtj = jtj + u[:, :, None] * tcol[r][e][:, None, :]
    cost = 0.0
    for r in range(r_n):
        for f in range(f_n):
            cost = cost + wh[r][f] * wcol[r][f]
    return jtj, g, 0.5 * cost


def _cost_batched(w_fn, h, x, w_args=()):
    w = jax.vmap(w_fn)(x, *w_args)
    r_n, f_n = w.shape[1], w.shape[2]
    cost = 0.0
    for r in range(r_n):
        for f in range(f_n):
            whrf = sum(w[:, r, fp] * h[:, fp, f] for fp in range(f_n))
            cost = cost + whrf * w[:, r, f]
    return 0.5 * cost


class _BState(NamedTuple):
    x: jnp.ndarray
    cost: jnp.ndarray
    lam: jnp.ndarray
    nu: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    converged: jnp.ndarray


def feature_lm_planar(w_fn, h, x0, config: LMConfig = LMConfig(),
                      w_args=()) -> LMResult:
    """Natively-batched :func:`feature_lm`: ``h [B, F, F]``, ``x0 [B, P]``.

    Same damping schedule, accept rule and convergence tests as
    :func:`lsqrrecipes_tpu.linalg.lm.lm_core` (per-lane state, frozen once
    done); B solves advance in lockstep with the quad in sliced-2-D form.
    ``w_args``: optional per-lane ``[B, ...]`` extras for ``w_fn`` (see
    :func:`_quad_batched`).
    """
    from lsqrrecipes_tpu.linalg import small

    dtype = x0.dtype
    eps_tiny = jnp.finfo(dtype).tiny
    p_n = x0.shape[1]
    eye = jnp.eye(p_n, dtype=dtype)

    def body(s: _BState) -> _BState:
        jtj, g, _ = _quad_batched(w_fn, h, s.x, w_args)
        gnorm = jnp.max(jnp.abs(g), axis=1)
        diag = jnp.maximum(
            jnp.diagonal(jtj, axis1=1, axis2=2), eps_tiny
        )
        a = jtj + (s.lam[:, None] * diag)[:, :, None] * eye[None, :, :]
        step, _ = small.cholesky_solve_unrolled(a, -g, p_n)

        x_new = s.x + step
        cost_new = _cost_batched(w_fn, h, x_new, w_args)

        jtj_step = jnp.sum(jtj * step[:, None, :], axis=2)
        predicted = jnp.maximum(
            -jnp.sum(step * g, axis=1) - 0.5 * jnp.sum(step * jtj_step, axis=1),
            eps_tiny,
        )
        rho = (s.cost - cost_new) / predicted

        accept = jnp.isfinite(cost_new) & (cost_new < s.cost)
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_acc = jnp.maximum(s.lam * shrink, 1e-18)
        lam_rej = jnp.minimum(s.lam * s.nu, config.max_lambda)
        lam = jnp.where(accept, lam_acc, lam_rej)
        nu = jnp.where(accept, jnp.asarray(2.0, dtype), s.nu * 2.0)
        x = jnp.where(accept[:, None], x_new, s.x)
        cost = jnp.where(accept, cost_new, s.cost)

        small_grad = gnorm < config.gtol
        small_step = jnp.linalg.norm(step, axis=1) < config.xtol * (
            jnp.linalg.norm(s.x, axis=1) + config.xtol
        )
        small_decrease = accept & (
            (s.cost - cost_new) <= config.ftol * jnp.maximum(s.cost, eps_tiny)
        )
        lam_blown = lam >= config.max_lambda
        converged = small_grad | small_step | small_decrease | lam_blown
        done = converged | (s.it + 1 >= config.max_iters)

        frz = s.done

        def pick(new, old):
            return jnp.where(
                frz.reshape(frz.shape + (1,) * (new.ndim - 1)), old, new
            )

        return _BState(
            pick(x, s.x), pick(cost, s.cost), pick(lam, s.lam),
            pick(nu, s.nu), s.it + jnp.where(frz, 0, 1).astype(s.it.dtype),
            s.done | done, s.converged | (converged & ~frz),
        )

    def cond(s: _BState):
        return jnp.any(~s.done)

    b = x0.shape[0]
    init = _BState(
        x=x0,
        cost=_cost_batched(w_fn, h, x0, w_args),
        lam=jnp.full((b,), config.init_lambda, dtype),
        nu=jnp.full((b,), 2.0, dtype),
        it=jnp.zeros((b,), jnp.int32),
        done=jnp.zeros((b,), bool),
        converged=jnp.zeros((b,), bool),
    )
    final = jax.lax.while_loop(cond, body, init)
    return LMResult(final.x, final.cost, final.it, final.converged)


def us_feature_lm_batched(
    kind: str,
    data,
    x0: jnp.ndarray,
    masks: Optional[jnp.ndarray] = None,
    config: LMConfig = LMConfig(),
) -> LMResult:
    """B independent refits on SHARED data with per-problem masks/inits.

    ``x0 [B, P]``, ``masks [B, n]`` (None = all inliers for every problem).
    The per-problem (centered) Gram matrices are one einsum over the shared
    feature matrix; the LM runs as the natively-batched planar solver with
    zero per-iteration O(n) work.
    """
    w_fn, _, feats_fn, const_idx = _OBJECTIVES[kind]
    h = feats_fn(data)

    def gram_of(mask_or_none):
        wts = _weights(h.shape[0], mask_or_none, h.dtype)
        return _centered_problem(w_fn, h, wts, const_idx)

    b = x0.shape[0]

    def w_fn_m(x, m):
        w = w_fn(x)
        return w.at[:, const_idx].add(w @ m)

    if masks is None:
        w_fn_c, gram = gram_of(None)
        grams = jnp.broadcast_to(gram, (b,) + gram.shape)
        return feature_lm_planar(w_fn_c, grams, x0, config)

    # Per-problem EXACT centering in two stages.  Any centering mean m is
    # an exact change of basis (W' h' == W h, see _centered_problem), but
    # conditioning is best when m is each problem's OWN mask-weighted mean.
    # Stage 1 centers the features on the global mean m_g (kills the
    # O(raw-scale) cancellation before any Gram is built); stage 2 recovers
    # each problem's residual mean m_b from its stage-1 Gram (m_b =
    # G[:, c] / G[c, c] — the constant feature is 1) and applies the
    # rank-1 congruence (I - m_b e_c^T) G (I - m_b e_c^T)^T, now on
    # mask-offset-scale entries where the one-time eps*scale perturbation
    # is harmless.  The two stages compose exactly: since m_b[c] == 0,
    # (I - m_g e_c^T)(I - m_b e_c^T) = I - (m_g + m_b) e_c^T, so the
    # per-lane coefficient map is w_fn_m(x, m_g + m_b).
    wts_all = _weights(h.shape[0], None, h.dtype)
    m_g = (wts_all @ h) / jnp.maximum(jnp.sum(wts_all), 1.0)
    m_g = m_g.at[const_idx].set(0.0)
    hc = h - m_g[None, :] * h[:, const_idx:const_idx + 1]
    g1 = jnp.einsum("ni,nj,bn->bij", hc, hc, masks.astype(h.dtype))

    gc = g1[:, :, const_idx]                                  # [B, F]
    gcc = g1[:, const_idx, const_idx]                         # [B]
    m_b = gc / jnp.maximum(gcc, 1.0)[:, None]
    m_b = m_b.at[:, const_idx].set(0.0)
    grams = (
        g1
        - m_b[:, :, None] * gc[:, None, :]
        - gc[:, :, None] * m_b[:, None, :]
        + gcc[:, None, None] * m_b[:, :, None] * m_b[:, None, :]
    )
    m_lane = m_g[None, :] + m_b                               # [B, F]
    return feature_lm_planar(w_fn_m, grams, x0, config, w_args=(m_lane,))
