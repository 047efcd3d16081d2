"""Levenberg-Marquardt with analytic Jacobians, as a ``lax.while_loop``.

TPU-native replacement for ``vnl_levenberg_marquardt`` (MINPACK ``lmder``)
used by the geometric sphere fit (``SphereParametersEstimator.hxx:310-338``)
and the ultrasound-calibration estimators
(``SinglePointTargetUSCalibrationParametersEstimator.cxx:272-297``).

Design notes (idiomatic JAX, not a MINPACK port):
  * The damped normal-equation step ``(J^T J + lam * diag(J^T J)) d = -J^T r``
    uses Marquardt diagonal scaling, which makes the iteration invariant to
    per-parameter scaling like MINPACK's internal D matrix.
  * The damping parameter follows Nielsen's multiplicative schedule
    (accept: ``lam *= max(1/3, 1 - (2 rho - 1)^3)``, reject: ``lam *= nu``,
    ``nu`` doubling), which reaches the same minima as lmder's trust-region
    on these smooth calibration problems; the reference's test tolerances
    (>= 1e-3) are far above the difference.
  * Supports per-residual masks so RANSAC consensus refits run with fixed
    shapes: masked rows contribute zero to the cost, gradient and J^T J —
    exactly equivalent to deleting them.
  * The whole solver is a single ``lax.while_loop`` over fixed-shape state,
    so it can be vmapped over thousands of independent problems (one per
    RANSAC hypothesis) and pjit-sharded.

``residual_fn(x, data) -> r[m]`` and ``jac_fn(x, data) -> J[m, p]`` must be
jit-traceable.  Convergence mirrors the vnl knobs: ``ftol`` (relative cost
change), ``xtol`` (relative step), ``gtol`` (gradient inf-norm),
``max_iters`` (the reference sets 1e-15 tolerances with 500-5000 max evals).
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from lsqrrecipes_tpu.linalg import small


class LMConfig(NamedTuple):
    ftol: float = 1e-15
    xtol: float = 1e-15
    gtol: float = 1e-15
    max_iters: int = 200
    init_lambda: float = 1e-3
    max_lambda: float = 1e12


class LMResult(NamedTuple):
    x: jnp.ndarray          # [p] final parameters
    cost: jnp.ndarray       # [] final 0.5*||r||^2
    iterations: jnp.ndarray  # [] accepted + rejected steps taken
    converged: jnp.ndarray  # [] bool — any tolerance met before max_iters


class _State(NamedTuple):
    x: jnp.ndarray
    cost: jnp.ndarray
    lam: jnp.ndarray
    nu: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    converged: jnp.ndarray


def lm_core(
    normal_system: Callable,
    cost_of: Callable,
    x0: jnp.ndarray,
    config: LMConfig = LMConfig(),
) -> LMResult:
    """The shared damped-LM loop.

    ``normal_system(x) -> (jtj [p, p], g [p])`` with ``g = J^T r`` and
    ``cost_of(x) -> 0.5 ||r||^2`` may compute from residuals
    (:func:`levenberg_marquardt`) or from sufficient statistics
    (:mod:`lsqrrecipes_tpu.linalg.stats_lm`) — the damping schedule,
    accept rule and convergence tests are identical either way.
    """
    dtype = x0.dtype
    eps_tiny = jnp.finfo(dtype).tiny

    def body(state: _State) -> _State:
        jtj, g = normal_system(state.x)
        gnorm = jnp.max(jnp.abs(g))

        diag = jnp.diagonal(jtj)
        # Marquardt scaling with a floor so zero-curvature directions
        # (possible in masked-out or degenerate lanes) stay solvable.
        diag = jnp.maximum(diag, eps_tiny)
        a = jtj + state.lam * jnp.diag(diag)
        # Damped J^T J is SPD: unrolled Cholesky (TPU XLA has no f64 LU,
        # and batched tiny solves belong on the VPU anyway).
        step, _ = small.cholesky_solve_unrolled(a, -g, a.shape[-1])

        x_new = state.x + step
        cost_new = cost_of(x_new)

        # Gain ratio: actual reduction vs the reduction predicted by the
        # local quadratic model.
        predicted = -(step @ g) - 0.5 * step @ (jtj @ step)
        predicted = jnp.maximum(predicted, eps_tiny)
        rho = (state.cost - cost_new) / predicted

        accept = jnp.logical_and(jnp.isfinite(cost_new), cost_new < state.cost)

        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_accept = jnp.maximum(state.lam * shrink, 1e-18)
        lam_reject = jnp.minimum(state.lam * state.nu, config.max_lambda)
        lam = jnp.where(accept, lam_accept, lam_reject)
        nu = jnp.where(accept, jnp.asarray(2.0, dtype), state.nu * 2.0)

        x = jnp.where(accept, x_new, state.x)
        cost = jnp.where(accept, cost_new, state.cost)

        # Convergence tests (evaluated on accepted steps; gradient test on
        # the current iterate either way).
        small_grad = gnorm < config.gtol
        small_step = jnp.linalg.norm(step) < config.xtol * (
            jnp.linalg.norm(state.x) + config.xtol
        )
        small_decrease = jnp.logical_and(
            accept, (state.cost - cost_new) <= config.ftol * jnp.maximum(state.cost, eps_tiny)
        )
        # Damping blown past max_lambda means even ~gradient-descent steps
        # cannot reduce the cost: the iterate is (numerically) stationary.
        # MINPACK likewise reports xtol-convergence for tiny rejected steps.
        lam_blown = lam >= config.max_lambda
        converged = small_grad | small_step | small_decrease | lam_blown
        done = converged | (state.it + 1 >= config.max_iters)

        # Freeze finished lanes: under vmap the batched while_loop keeps
        # executing until the SLOWEST lane converges — without the freeze,
        # already-converged lanes would keep refining and diverge (at
        # rounding level) from what the same problem produces solo.
        frz = state.done

        def pick(new, old):
            return jnp.where(frz, old, new)

        return _State(
            pick(x, state.x), pick(cost, state.cost), pick(lam, state.lam),
            pick(nu, state.nu),
            state.it + jnp.where(frz, 0, 1).astype(state.it.dtype),
            state.done | done, state.converged | (converged & ~frz),
        )

    def cond(state: _State):
        return jnp.logical_not(state.done)

    init = _State(
        x=x0,
        cost=cost_of(x0),
        lam=jnp.asarray(config.init_lambda, dtype),
        nu=jnp.asarray(2.0, dtype),
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
    )
    final = jax.lax.while_loop(cond, body, init)
    return LMResult(final.x, final.cost, final.it, final.converged)


def levenberg_marquardt(
    residual_fn: Callable,
    jac_fn: Callable,
    x0: jnp.ndarray,
    data,
    mask: Optional[jnp.ndarray] = None,
    config: LMConfig = LMConfig(),
) -> LMResult:
    """Minimize ``0.5 * || mask * residual_fn(x, data) ||^2``."""

    def masked_residual(x):
        r = residual_fn(x, data)
        if mask is not None:
            r = r * mask.astype(r.dtype)
        return r

    def cost_of(x):
        r = masked_residual(x)
        return 0.5 * jnp.sum(r * r)

    def normal_system(x):
        r = masked_residual(x)
        j = jac_fn(x, data)
        if mask is not None:
            j = j * mask.astype(j.dtype)[:, None]
        jtj = j.T @ j
        jtr = j.T @ r
        return jtj, jtr

    return lm_core(normal_system, cost_of, x0, config)
