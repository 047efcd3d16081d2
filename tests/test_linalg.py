"""Linear-algebra layer: pinv semantics, masking, and the LM engine."""

import jax
import jax.numpy as jnp
import numpy as np

from lsqrrecipes_tpu.linalg import (
    LMConfig,
    levenberg_marquardt,
    masked_pinv_solve,
    nullvector,
    pinv_solve,
)


def test_pinv_solve_full_rank():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (12, 5))
    x_true = jnp.arange(1.0, 6.0)
    b = a @ x_true
    x, rank = pinv_solve(a, b)
    assert int(rank) == 5
    np.testing.assert_allclose(x, x_true, atol=1e-12)


def test_pinv_solve_rank_deficient():
    a = jnp.zeros((4, 3)).at[:, 0].set(1.0)  # rank 1
    x, rank = pinv_solve(a, jnp.ones((4,)))
    assert int(rank) == 1


def test_masked_equals_subset():
    key = jax.random.PRNGKey(1)
    a = jax.random.normal(key, (20, 4))
    b = jax.random.normal(jax.random.PRNGKey(2), (20,))
    mask = jnp.arange(20) % 3 != 0
    x_masked, rank_masked = masked_pinv_solve(a, b, mask)
    x_subset, rank_subset = pinv_solve(a[mask], b[mask])
    np.testing.assert_allclose(x_masked, x_subset, atol=1e-12)
    assert int(rank_masked) == int(rank_subset)


def test_nullvector():
    # Plane through 3 points: [p, -1] has null vector [n, d].
    pts = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 1.0], [0.0, 1.0, 1.0]])
    a = jnp.concatenate([pts, -jnp.ones((3, 1))], axis=1)
    x, rank = nullvector(a)
    assert int(rank) == 3
    np.testing.assert_allclose(a @ x, jnp.zeros(3), atol=1e-12)
    n = x[:3] / jnp.linalg.norm(x[:3])
    np.testing.assert_allclose(jnp.abs(n), jnp.asarray([0.0, 0.0, 1.0]), atol=1e-12)


def _exp_residual(x, data):
    t, y = data
    return x[0] * jnp.exp(x[1] * t) - y


def _exp_jacobian(x, data):
    t, _ = data
    e = jnp.exp(x[1] * t)
    return jnp.stack([e, x[0] * t * e], axis=-1)


def test_lm_converges_exponential_fit():
    t = jnp.linspace(0.0, 2.0, 50)
    y = 2.5 * jnp.exp(-1.3 * t)
    res = levenberg_marquardt(
        _exp_residual, _exp_jacobian, jnp.asarray([1.0, 0.0]), (t, y)
    )
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, [2.5, -1.3], atol=1e-8)


def test_lm_masked_rows_ignored():
    t = jnp.linspace(0.0, 2.0, 50)
    y = 2.5 * jnp.exp(-1.3 * t)
    # Poison half the targets; mask them out -> same fit.
    y_bad = y.at[25:].set(100.0)
    mask = jnp.arange(50) < 25
    res = levenberg_marquardt(
        _exp_residual, _exp_jacobian, jnp.asarray([1.0, 0.0]), (t, y_bad), mask=mask
    )
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, [2.5, -1.3], atol=1e-7)


def test_lm_vmap():
    t = jnp.linspace(0.0, 2.0, 30)
    amps = jnp.asarray([1.0, 2.0, 3.0])
    ys = amps[:, None] * jnp.exp(-0.7 * t)[None, :]

    def solve(y):
        return levenberg_marquardt(
            _exp_residual, _exp_jacobian, jnp.asarray([0.5, -0.1]), (t, y)
        ).x

    xs = jax.vmap(solve)(ys)
    np.testing.assert_allclose(xs[:, 0], amps, atol=1e-7)
    np.testing.assert_allclose(xs[:, 1], -0.7 * jnp.ones(3), atol=1e-7)


def test_lm_respects_max_iters():
    t = jnp.linspace(0.0, 2.0, 30)
    y = 2.5 * jnp.exp(-1.3 * t)
    res = levenberg_marquardt(
        _exp_residual,
        _exp_jacobian,
        jnp.asarray([1.0, 0.0]),
        (t, y),
        config=LMConfig(max_iters=2),
    )
    assert int(res.iterations) <= 2
