"""Linear estimators: line2d, kD line, kD plane, dense linear system.

Simulated-data structure mirrors the reference tests
(``testing/LineParametersEstimatorTest.cxx``,
``testing/PlaneParametersEstimatorTest.cxx``,
``testing/DenseLinearEquationSystemParametersEstimatorTest.cxx``): synthesize
ground truth, sample noisy observations (sigma=1), check the exact fit from a
clean minimal subset and the least-squares fit from the noisy set against the
reference tolerances (direction dot product > cos 5 degrees, point within 0.5
of the true object).  Golden test: augmentedMatrix.txt within 0.5.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsqrrecipes_tpu.estimators import (
    DenseLinearSystemEstimator,
    Line2DEstimator,
    LineEstimator,
    PlaneEstimator,
)
from lsqrrecipes_tpu.io import load_augmented_matrix
from tests.conftest import REFERENCE_DATA

COS5 = np.cos(np.radians(5.0))


def _point_line_distance(point, direction, anchor):
    v = point - anchor
    return np.linalg.norm(v - np.dot(v, direction) * direction)


def make_line_data(key, dim, n=20, sigma=1.0):
    k1, k2, k3 = jax.random.split(key, 3)
    direction = jax.random.normal(k1, (dim,))
    direction = direction / jnp.linalg.norm(direction)
    anchor = jax.random.uniform(k2, (dim,), minval=-50, maxval=50)
    t = jnp.linspace(-50, 50, n)
    pts = anchor + t[:, None] * direction
    noisy = pts + sigma * jax.random.normal(k3, pts.shape)
    return direction, anchor, pts, noisy


def test_line2d_exact_and_lsq():
    direction, anchor, clean, noisy = make_line_data(jax.random.PRNGKey(0), 2)
    normal_true = np.asarray([-direction[1], direction[0]])
    est = Line2DEstimator(delta=0.5)

    params, valid = est.minimal_fit(clean[:2])
    assert bool(valid)
    assert abs(np.dot(params[:2], normal_true)) > COS5

    params, valid = est.lsq_fit(noisy)
    assert bool(valid)
    assert abs(np.dot(params[:2], normal_true)) > COS5
    # Estimated anchor within 0.5 of the true line.
    d = abs(np.dot(np.asarray(params[2:]) - np.asarray(anchor), normal_true))
    assert d < 0.5

    # agree: the clean points satisfy the model, far points don't.
    assert bool(jnp.all(est.agree(params, clean[:5])))
    outlier = anchor + 10.0 * jnp.asarray(normal_true)
    assert not bool(est.agree(params, outlier[None, :])[0])


def test_line2d_degenerate_same_point():
    est = Line2DEstimator(delta=0.5)
    p = jnp.asarray([[1.0, 2.0], [1.0, 2.0]])
    _, valid = est.minimal_fit(p)
    assert not bool(valid)
    # All points identical -> lsq degenerate too.
    _, valid = est.lsq_fit(jnp.tile(jnp.asarray([[3.0, 4.0]]), (10, 1)))
    assert not bool(valid)


def test_line2d_vertical_line_branch():
    """cov11 < 1e-12 branch: x = const (``Line2DParametersEstimator.cxx:80-85``)."""
    est = Line2DEstimator(delta=0.5)
    pts = jnp.stack([jnp.full((10,), 7.0), jnp.linspace(0, 9, 10)], axis=1)
    params, valid = est.lsq_fit(pts)
    assert bool(valid)
    np.testing.assert_allclose(params[:2], [1.0, 0.0], atol=1e-12)


@pytest.mark.parametrize("dim", [2, 3])
def test_line_kd(dim):
    direction, anchor, clean, noisy = make_line_data(jax.random.PRNGKey(dim), dim)
    est = LineEstimator(delta=0.5, dim=dim)

    params, valid = est.minimal_fit(clean[:2])
    assert bool(valid)
    assert abs(np.dot(params[:dim], direction)) > COS5

    params, valid = est.lsq_fit(noisy)
    assert bool(valid)
    assert abs(np.dot(params[:dim], direction)) > COS5
    assert _point_line_distance(
        np.asarray(params[dim:]), np.asarray(direction), np.asarray(anchor)
    ) < 0.5


def make_plane_data(key, dim, n=50, sigma=1.0):
    k1, k2, k3 = jax.random.split(key, 3)
    normal = jax.random.normal(k1, (dim,))
    normal = normal / jnp.linalg.norm(normal)
    anchor = jax.random.uniform(k2, (dim,), minval=-50, maxval=50)
    raw = jax.random.uniform(k3, (n, dim), minval=-50, maxval=50)
    # Project onto the plane, then add noise.
    on_plane = raw - jnp.sum((raw - anchor) * normal, axis=1, keepdims=True) * normal
    noisy = on_plane + sigma * jax.random.normal(k2, raw.shape)
    return normal, anchor, on_plane, noisy


@pytest.mark.parametrize("dim", [3, 4])
def test_plane_kd(dim):
    normal, anchor, clean, noisy = make_plane_data(jax.random.PRNGKey(10 + dim), dim)
    est = PlaneEstimator(delta=0.5, dim=dim)

    params, valid = est.minimal_fit(clean[:dim])
    assert bool(valid)
    assert abs(np.dot(params[:dim], normal)) > COS5

    params, valid = est.lsq_fit(noisy)
    assert bool(valid)
    assert abs(np.dot(params[:dim], normal)) > COS5
    assert abs(np.dot(np.asarray(params[dim:]) - np.asarray(anchor), normal)) < 0.5


def test_plane3d_collinear_degenerate():
    est = PlaneEstimator(delta=0.5, dim=3)
    pts = jnp.asarray([[0.0, 0, 0], [1.0, 1, 1], [2.0, 2, 2]])
    _, valid = est.minimal_fit(pts)
    assert not bool(valid)


def make_dense_system(key, rows=200, cols=5, noise=0.0):
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.uniform(k1, (rows, cols), minval=-1, maxval=1)
    x = jax.random.uniform(k2, (cols,), minval=-10, maxval=10)
    b = a @ x
    if noise:
        b = b * (1.0 + noise * jax.random.uniform(k3, (rows,), minval=-1, maxval=1))
    return jnp.concatenate([a, b[:, None]], axis=1), x


def test_dense_exact():
    data, x_true = make_dense_system(jax.random.PRNGKey(20), rows=5, cols=5)
    est = DenseLinearSystemEstimator(delta=0.5, n=5)
    params, valid = est.minimal_fit(data)
    assert bool(valid)
    np.testing.assert_allclose(params, x_true, atol=1e-10)


def test_dense_lsq_noisy():
    """200x5 with 1% relative noise on b -> x within 0.1 (reference
    simulatedDataTest, maxEquationError = 0.1)."""
    data, x_true = make_dense_system(jax.random.PRNGKey(21), noise=0.01)
    est = DenseLinearSystemEstimator(delta=0.5, n=5)
    params, valid = est.lsq_fit(data)
    assert bool(valid)
    np.testing.assert_allclose(params, x_true, atol=0.1)


def test_dense_singular_invalid():
    a = jnp.ones((5, 5))  # rank 1
    data = jnp.concatenate([a, jnp.ones((5, 1))], axis=1)
    est = DenseLinearSystemEstimator(delta=0.5, n=5)
    _, valid = est.minimal_fit(data)
    assert not bool(valid)


GOLDEN_X = np.array(
    [
        -1.777985584409468e01,
        1.111302171667757e00,
        -1.568653413096010e02,
        1.469013927556186e02,
        -6.296891425314718e01,
        -1.042139650090033e03,
    ]
)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE_DATA, "augmentedMatrix.txt")),
    reason="reference experimental data not mounted",
)
def test_dense_golden_experimental():
    """Golden: 1444x6 experimental pivot matrix, solution within 0.5
    (``DenseLinearEquationSystemParametersEstimatorTest.cxx:155-210``)."""
    data = load_augmented_matrix(
        os.path.join(REFERENCE_DATA, "augmentedMatrix.txt"), 7
    )
    est = DenseLinearSystemEstimator(delta=0.5, n=6)
    params, valid = est.lsq_fit(jnp.asarray(data))
    assert bool(valid)
    np.testing.assert_allclose(params, GOLDEN_X, atol=0.5)
    # Sufficient-statistics (distributed) path agrees with the SVD path.
    params2, valid2 = est.lsq_solve_stats(est.lsq_stats(jnp.asarray(data)))
    assert bool(valid2)
    np.testing.assert_allclose(params2, params, atol=1e-6)
