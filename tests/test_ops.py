"""Small-solver and Pallas-kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsqrrecipes_tpu.linalg.small import (
    cholesky_solve_unrolled,
    solve2,
    solve3,
    solve_spd,
)


def test_solve2_solve3_match_reference():
    key = jax.random.PRNGKey(0)
    a2 = jax.random.normal(key, (50, 2, 2))
    b2 = jax.random.normal(jax.random.PRNGKey(1), (50, 2))
    x2, det2 = solve2(a2, b2)
    np.testing.assert_allclose(
        jnp.einsum("nij,nj->ni", a2, x2), b2, atol=1e-9
    )
    np.testing.assert_allclose(det2, jnp.linalg.det(a2), atol=1e-12)

    a3 = jax.random.normal(jax.random.PRNGKey(2), (50, 3, 3))
    b3 = jax.random.normal(jax.random.PRNGKey(3), (50, 3))
    x3, det3 = solve3(a3, b3)
    np.testing.assert_allclose(
        jnp.einsum("nij,nj->ni", a3, x3), b3, atol=1e-8
    )
    np.testing.assert_allclose(det3, jnp.linalg.det(a3), atol=1e-10)


@pytest.mark.parametrize("n", [4, 8, 11])
def test_unrolled_cholesky(n):
    key = jax.random.PRNGKey(n)
    m = jax.random.normal(key, (20, n, n))
    spd = jnp.einsum("bij,bkj->bik", m, m) + 0.5 * jnp.eye(n)
    b = jax.random.normal(jax.random.PRNGKey(n + 1), (20, n))
    x, min_pivot = cholesky_solve_unrolled(spd, b, n)
    np.testing.assert_allclose(jnp.einsum("bij,bj->bi", spd, x), b, atol=1e-8)
    assert bool(jnp.all(min_pivot > 0))


def test_cholesky_detects_non_spd():
    a = -jnp.eye(4)[None]
    _, min_pivot = cholesky_solve_unrolled(a, jnp.ones((1, 4)), 4)
    assert float(min_pivot[0]) <= 0


def test_solve_spd_dispatch():
    for n in (1, 2, 3, 6):
        m = jax.random.normal(jax.random.PRNGKey(n), (n, n))
        spd = m @ m.T + 0.5 * jnp.eye(n)
        b = jnp.arange(1.0, n + 1)
        x, sig = solve_spd(spd, b)
        np.testing.assert_allclose(spd @ x, b, atol=1e-8)
        assert float(sig) > 0


def test_pallas_vote_kernels_interpret():
    """Kernel math validated in interpreter mode (no TPU in CI)."""
    from jax.experimental import pallas as pl

    from lsqrrecipes_tpu.ops import vote

    # Monkeypatch pallas_call into interpreter mode for this test.
    orig = pl.pallas_call
    import functools

    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        pts = jax.random.normal(jax.random.PRNGKey(0), (200, 3)).astype(jnp.float32) * 30
        points_t, valid, n = vote.pack_points(pts)
        params = jnp.concatenate(
            [
                jax.random.normal(jax.random.PRNGKey(1), (256, 3)).astype(jnp.float32) * 20,
                jax.random.uniform(
                    jax.random.PRNGKey(2), (256, 1), jnp.float32, 10, 40
                ),
            ],
            axis=1,
        )
        counts = vote.sphere_vote_counts(params, points_t, valid, 2.0, block_b=256)
        dist = jnp.linalg.norm(
            pts[None, :, :] - params[:, None, :3], axis=-1
        )
        ref = jnp.sum(jnp.abs(dist - params[:, 3:4]) < 2.0, axis=1)
        np.testing.assert_array_equal(counts, ref)

        nrm = jax.random.normal(jax.random.PRNGKey(3), (256, 3)).astype(jnp.float32)
        nrm = nrm / jnp.linalg.norm(nrm, axis=1, keepdims=True)
        off = jax.random.normal(jax.random.PRNGKey(4), (256,)).astype(jnp.float32) * 5
        pp = jnp.concatenate([nrm, off[:, None]], axis=1)
        counts2 = vote.plane_vote_counts(pp, points_t, valid, 4.0, block_b=256)
        s = pts @ nrm.T - off[None, :]
        ref2 = jnp.sum((s * s < 4.0).T, axis=1)
        np.testing.assert_array_equal(counts2, ref2)
    finally:
        pl.pallas_call = orig
