"""Fused sphere-LM megakernel vs the generic vmapped LM (interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl

from lsqrrecipes_tpu.estimators.sphere import _sphere_jacobian, _sphere_residual
from lsqrrecipes_tpu.linalg import LMConfig, levenberg_marquardt
from lsqrrecipes_tpu.ops.sphere_lm import sphere_lm_batch


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _problems(key, b, m):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    centers = jax.random.uniform(k1, (b, 3), jnp.float32, -50, 50)
    radii = jax.random.uniform(k4, (b, 1), jnp.float32, 10, 40)
    d = jax.random.normal(k2, (b, m, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pts = centers[:, None, :] + radii[:, :, None] * d
    pts = pts + 0.3 * jax.random.normal(k3, (b, m, 3), jnp.float32)
    x0 = jnp.concatenate([centers + 1.0, radii - 2.0], axis=1)
    return pts, x0, centers, radii[:, 0]


def test_fused_lm_matches_generic(interpret_pallas):
    b, m = 128, 64
    pts, x0, centers, radii = _problems(jax.random.PRNGKey(0), b, m)

    x, cost, iters, conv = sphere_lm_batch(pts, x0, max_iters=30, block_b=128)

    config = LMConfig(max_iters=30, ftol=0.0, xtol=0.0, gtol=1e-6)
    ref = jax.vmap(
        lambda x0_, p: levenberg_marquardt(
            _sphere_residual, _sphere_jacobian, x0_, p, config=config
        )
    )(x0, pts)

    # Same minima (both converge on these well-conditioned problems).
    assert jnp.max(jnp.abs(x - ref.x)) < 1e-2
    # And both recover the ground truth to noise level.
    assert jnp.max(jnp.abs(x[:, :3] - centers)) < 0.5
    assert jnp.max(jnp.abs(x[:, 3] - radii)) < 0.5
    # Cost parity (0.5 * ||f||^2).
    assert jnp.max(jnp.abs(cost - ref.cost) / (1.0 + ref.cost)) < 1e-2
    assert bool(jnp.all(iters <= 30))


def test_fused_lm_converged_lanes_freeze(interpret_pallas):
    # An exact sphere converges almost immediately; iterations stop counting.
    b, m = 128, 32
    pts, x0, centers, radii = _problems(jax.random.PRNGKey(1), b, m)
    exact = centers[:, None, :] + radii[:, None, None] * (
        pts - centers[:, None, :]
    ) / jnp.linalg.norm(pts - centers[:, None, :], axis=-1, keepdims=True)
    x_true = jnp.concatenate([centers, radii[:, None]], axis=1)
    x, cost, iters, conv = sphere_lm_batch(
        exact, x_true, max_iters=25, block_b=128
    )
    assert bool(jnp.all(conv))
    assert int(jnp.max(iters)) < 25
    assert float(jnp.max(cost)) < 1e-6
