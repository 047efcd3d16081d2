"""Fused batched Levenberg-Marquardt for geometric sphere refinement.

The "speed-of-light LM inner step" of BASELINE.json: residuals, analytic
Jacobian, J^T J / J^T r normal-equation formation, damped 4x4 Cholesky
factorization, solve, and the accept/reject damping update — ALL inside one
Pallas kernel, for thousands of independent sphere problems at once.

Why not vmapped XLA (``linalg/lm.py``)?  A batch of [B, m, 4] Jacobians
turned into [B, 4, 4] normal matrices is B tiny matmuls — the MXU pads both
4-extents to 128 (~1000x wasted systolic volume) and the [B, m, 3] point
array itself tiles to (8, 128) with a 42x HBM inflation.  The planar layout
fixes both: problems live on LANES, the m observation rows on sublanes, so

  * residual/Jacobian work is pure [m, TB] VPU arithmetic,
  * the 14 reduction rows (10 unique J^T J entries + 4 J^T r entries) are
    sublane sums landing on [1, TB] lane rows,
  * the damped Cholesky solve is ~40 scalar ops unrolled on lane rows
    (matching ``linalg/small.cholesky_solve_unrolled`` at p=4),
  * the LM control flow (Nielsen multiplicative damping, accept masks,
    convergence) is branchless lane arithmetic inside a ``fori_loop``.

Semantics mirror :func:`lsqrrecipes_tpu.linalg.levenberg_marquardt` (same
damping schedule, same gain-ratio accept rule, same Marquardt diagonal
scaling) in float32 with a fixed iteration count: every lane runs
``max_iters`` steps; converged lanes simply keep rejecting/holding state
(the vmapped while_loop equally runs until the SLOWEST lane converges, so
the fixed count costs nothing extra in a batch).  Parity target for the
refined fit: ``SphereParametersEstimator.hxx:310-338`` (LM on f = ||p-c|| -
r with analytic Jacobian ``:392-431``).

Sphere-problem structure exploited for the normal equations: J rows are
``[-(p-c)/d, -1]``, so with u = (p-c)/d (unit directions) and f = d - r:

    J^T J = [[ S_uu,  s_u ],     J^T r = [ -S_uf ]
             [ s_u^T,  m   ]]             [ -s_f  ]

where S_uu = sum u u^T (6 unique), s_u = sum u (3), S_uf = sum u f (3),
s_f = sum f (1) — 13 sublane reductions + the constant m.
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_lm_kernel(m: int, max_iters: int, init_lambda: float,
                    max_lambda: float, gtol: float):
    eps_tiny = 1e-30

    def kernel(pts_ref, x0_ref, out_ref):
        # pts_ref: [3*m, TB] planes (x rows, then y rows, then z rows)
        # x0_ref:  [4, TB]  initial [cx, cy, cz, r]
        # out_ref: [8, TB]  -> [cx, cy, cz, r, cost, iterations, converged, 0]
        px = pts_ref[0:m, :]
        py = pts_ref[m : 2 * m, :]
        pz = pts_ref[2 * m : 3 * m, :]

        def cost_of(cx, cy, cz, r):
            dx = px - cx
            dy = py - cy
            dz = pz - cz
            d = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            f = d - r
            return 0.5 * jnp.sum(f * f, axis=0, keepdims=True)

        cx0 = x0_ref[0:1, :]
        cy0 = x0_ref[1:2, :]
        cz0 = x0_ref[2:3, :]
        r0 = x0_ref[3:4, :]

        # Derive initial constants from loaded data: Mosaic gives splat
        # constants a lanes-replicated layout, which would conflict with the
        # computed (non-replicated) carries in the fori_loop body.
        zero = cx0 * 0.0
        state0 = (
            cx0, cy0, cz0, r0,
            cost_of(cx0, cy0, cz0, r0),
            zero + init_lambda,                   # lam
            zero + 2.0,                           # nu
            zero,                                 # converged flag (0/1)
            zero,                                 # iterations actually used
        )

        def body(state):
            i, cx, cy, cz, r, cost, lam, nu, conv, iters = state
            active = 1.0 - conv

            dx = px - cx
            dy = py - cy
            dz = pz - cz
            s = dx * dx + dy * dy + dz * dz
            rd = jax.lax.rsqrt(jnp.maximum(s, 1e-24))   # 1 rsqrt, no divs
            d = s * rd
            ux = dx * rd
            uy = dy * rd
            uz = dz * rd
            f = d - r

            def rsum(v):
                return jnp.sum(v, axis=0, keepdims=True)   # [1, TB]

            # J = [-u, -1]: normal equations from 13 reductions.
            sxx = rsum(ux * ux); sxy = rsum(ux * uy); sxz = rsum(ux * uz)
            syy = rsum(uy * uy); syz = rsum(uy * uz); szz = rsum(uz * uz)
            sx = rsum(ux); sy = rsum(uy); sz = rsum(uz)
            gx = -rsum(ux * f); gy = -rsum(uy * f); gz = -rsum(uz * f)
            gr = -rsum(f)
            mm = jnp.full_like(sx, float(m))

            gnorm = jnp.maximum(
                jnp.maximum(jnp.abs(gx), jnp.abs(gy)),
                jnp.maximum(jnp.abs(gz), jnp.abs(gr)),
            )

            # Damped system A = J^T J + lam * diag(J^T J), b = -J^T r = -g.
            a00 = sxx * (1.0 + lam)
            a11 = syy * (1.0 + lam)
            a22 = szz * (1.0 + lam)
            a33 = mm * (1.0 + lam)
            a01, a02, a12 = sxy, sxz, syz
            a03, a13, a23 = sx, sy, sz
            b0, b1, b2, b3 = -gx, -gy, -gz, -gr

            # Unrolled 4x4 Cholesky A = L L^T (lane arithmetic; mirrors
            # linalg/small.cholesky_solve_unrolled).
            l00 = jnp.sqrt(jnp.maximum(a00, eps_tiny))
            l10 = a01 / l00
            l20 = a02 / l00
            l30 = a03 / l00
            l11 = jnp.sqrt(jnp.maximum(a11 - l10 * l10, eps_tiny))
            l21 = (a12 - l20 * l10) / l11
            l31 = (a13 - l30 * l10) / l11
            l22 = jnp.sqrt(jnp.maximum(a22 - l20 * l20 - l21 * l21, eps_tiny))
            l32 = (a23 - l30 * l20 - l31 * l21) / l22
            l33 = jnp.sqrt(
                jnp.maximum(a33 - l30 * l30 - l31 * l31 - l32 * l32, eps_tiny)
            )
            # Forward substitution L y = b
            y0 = b0 / l00
            y1 = (b1 - l10 * y0) / l11
            y2 = (b2 - l20 * y0 - l21 * y1) / l22
            y3 = (b3 - l30 * y0 - l31 * y1 - l32 * y2) / l33
            # Back substitution L^T s = y
            s3 = y3 / l33
            s2 = (y2 - l32 * s3) / l22
            s1 = (y1 - l21 * s2 - l31 * s3) / l11
            s0 = (y0 - l10 * s1 - l20 * s2 - l30 * s3) / l00

            cx_new = cx + s0
            cy_new = cy + s1
            cz_new = cz + s2
            r_new = r + s3
            cost_new = cost_of(cx_new, cy_new, cz_new, r_new)

            # Gain ratio vs the quadratic model: predicted = -s.g - 0.5 s.(JtJ s)
            jtj_s0 = sxx * s0 + sxy * s1 + sxz * s2 + sx * s3
            jtj_s1 = sxy * s0 + syy * s1 + syz * s2 + sy * s3
            jtj_s2 = sxz * s0 + syz * s1 + szz * s2 + sz * s3
            jtj_s3 = sx * s0 + sy * s1 + sz * s2 + mm * s3
            predicted = -(s0 * gx + s1 * gy + s2 * gz + s3 * gr) - 0.5 * (
                s0 * jtj_s0 + s1 * jtj_s1 + s2 * jtj_s2 + s3 * jtj_s3
            )
            predicted = jnp.maximum(predicted, eps_tiny)
            rho = (cost - cost_new) / predicted

            finite = jnp.isfinite(cost_new)
            accept = jnp.logical_and(finite, cost_new < cost).astype(jnp.float32)
            accept = accept * active   # converged lanes hold state

            shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
            lam_acc = jnp.maximum(lam * shrink, 1e-18)
            lam_rej = jnp.minimum(lam * nu, max_lambda)
            lam = jnp.where(accept > 0, lam_acc, jnp.where(active > 0, lam_rej, lam))
            nu = jnp.where(accept > 0, 2.0, jnp.where(active > 0, nu * 2.0, nu))

            cx = cx + accept * s0
            cy = cy + accept * s1
            cz = cz + accept * s2
            r = r + accept * s3
            cost = jnp.where(accept > 0, cost_new, cost)

            newly = jnp.logical_or(gnorm < gtol, lam >= max_lambda)
            conv = jnp.maximum(conv, newly.astype(jnp.float32) * active)
            iters = iters + active
            return (i + 1, cx, cy, cz, r, cost, lam, nu, conv, iters)

        def cond(state):
            # Early exit once every lane in the block converged (typical
            # batches finish in ~half of max_iters).
            i, conv = state[0], state[8]
            any_active = jnp.sum(1.0 - conv, axis=1, keepdims=True)[0, 0] > 0.0
            return jnp.logical_and(i < max_iters, any_active)

        out = jax.lax.while_loop(cond, body, (jnp.int32(0),) + state0)
        _, cx, cy, cz, r, cost, lam, nu, conv, iters = out
        out_ref[:, :] = jnp.concatenate(
            [cx, cy, cz, r, cost, iters, conv, jnp.zeros_like(cx)], axis=0
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("m", "max_iters", "init_lambda", "max_lambda", "gtol",
                     "block_b", "interpret"),
)
def _lm_call(pts_planar, x0_t, m, max_iters, init_lambda, max_lambda, gtol,
             block_b, interpret=False):
    with jax.enable_x64(False):
        b = pts_planar.shape[1]
        kernel = _make_lm_kernel(m, max_iters, init_lambda, max_lambda, gtol)
        return pl.pallas_call(
            kernel,
            grid=(b // block_b,),
            interpret=interpret,
            in_specs=[
                pl.BlockSpec((3 * m, block_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, block_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, block_b), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, b), jnp.float32),
        )(pts_planar, x0_t)


def pack_lm_problems(points, x0):
    """``points[B, m, 3], x0[B, 4] -> (pts_planar[3m, B], x0_t[4, B])``.

    B must be a multiple of 128 (lane tiling).
    """
    bsz, m, _ = points.shape
    pts = jnp.asarray(points, jnp.float32)
    planar = jnp.concatenate(
        [pts[:, :, 0].T, pts[:, :, 1].T, pts[:, :, 2].T], axis=0
    )
    return planar, jnp.asarray(x0, jnp.float32).T


def sphere_lm_batch(
    points,
    x0,
    max_iters: int = 30,
    init_lambda: float = 1e-3,
    max_lambda: float = 1e12,
    gtol: float = 1e-6,
    block_b: int = 512,
    interpret=None,
):
    """Fused LM refinement of B independent spheres.

    points ``[B, m, 3]``, x0 ``[B, 4]`` -> ``(x[B, 4], cost[B],
    iterations[B], converged[B])``; all lanes run ``max_iters`` fixed steps
    (converged lanes freeze).  f32 throughput path — the f64
    :func:`lsqrrecipes_tpu.linalg.levenberg_marquardt` remains the parity
    path.  ``interpret=None`` auto-selects Pallas interpret mode when the
    default device is the host CPU (same rule as ``ops.fused_sweep``).
    """
    bsz = points.shape[0]
    assert bsz % block_b == 0 and block_b % 128 == 0
    if interpret is None:
        from lsqrrecipes_tpu.ops.fused_sweep import _auto_interpret

        interpret = _auto_interpret()
    planar, x0_t = pack_lm_problems(points, x0)
    out = _lm_call(
        planar, x0_t, points.shape[1], int(max_iters), float(init_lambda),
        float(max_lambda), float(gtol), int(block_b), bool(interpret),
    )
    return out[0:4, :].T, out[4], out[5].astype(jnp.int32), out[6] > 0
