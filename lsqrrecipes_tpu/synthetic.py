"""Synthetic data generators mirroring the reference's test data models.

The reference synthesizes ground-truth-known data inside each test binary
(``testing/SinglePointTargetUSCalibrationParametersEstimatorTest.cxx:556-667``,
``testing/PlanePhantomUSCalibrationParametersEstimatorTest.cxx:130-160``);
these are the batched JAX equivalents, shared by the test suite, the chip
gate, and the perf scripts.

IMPORTANT: this module must stay free of global ``jax.config`` side effects
(no default-device pinning) — chip scripts import it and must keep running
on the TPU.  Device policy belongs to the caller (tests/conftest.py pins
CPU for the suite).
"""

import jax
import jax.numpy as jnp

from lsqrrecipes_tpu.estimators.us_calibration import _euler_zyx_matrix
from lsqrrecipes_tpu.geometry import Frame

M_X, M_Y = 0.143, 0.139


def _random_rotation(key):
    w = jax.random.uniform(key, (3,), minval=0.0, maxval=jnp.pi)
    return _euler_zyx_matrix(w[2], w[1], w[0]), w


def make_crosswire_data(key, n=50, sigma=1.0):
    """Reference generator (``...Test.cxx:556-667``): random T3 with scales
    baked into the first two columns, random target point t1, per element a
    random pose rotation with translation solved so the pixel maps to t1."""
    keys = jax.random.split(key, 6)
    r3, w3 = _random_rotation(keys[0])
    t3 = jax.random.uniform(keys[1], (3,), minval=-100, maxval=100)
    t1 = jax.random.uniform(keys[2], (3,), minval=-100, maxval=100)

    q = jax.random.uniform(
        keys[3], (n, 2), minval=0.0, maxval=1.0
    ) * jnp.asarray([640.0, 480.0])
    w2 = jax.random.uniform(keys[4], (n, 3), minval=0.0, maxval=jnp.pi)
    r2 = jax.vmap(lambda w: _euler_zyx_matrix(w[2], w[1], w[0]))(w2)
    img = q[:, 0:1] * (M_X * r3[:, 0]) + q[:, 1:2] * (M_Y * r3[:, 1]) + t3
    t2 = t1 - jnp.einsum("nij,nj->ni", r2, img)
    frames = Frame(r2, t2)
    q_noisy = q + sigma * jax.random.normal(keys[5], q.shape)
    true_params = dict(t1=t1, t3=t3, r3=r3, w3=w3)
    return (frames, q_noisy), (frames, q), true_params


def make_pointer_data(key, n=50, sigma=1.0):
    keys = jax.random.split(key, 6)
    r3, w3 = _random_rotation(keys[0])
    t3 = jax.random.uniform(keys[1], (3,), minval=-100, maxval=100)
    q = jax.random.uniform(
        keys[2], (n, 2), minval=0.0, maxval=1.0
    ) * jnp.asarray([640.0, 480.0])
    w2 = jax.random.uniform(keys[3], (n, 3), minval=0.0, maxval=jnp.pi)
    r2 = jax.vmap(lambda w: _euler_zyx_matrix(w[2], w[1], w[0]))(w2)
    t2 = jax.random.uniform(keys[4], (n, 3), minval=-100, maxval=100)
    img = q[:, 0:1] * (M_X * r3[:, 0]) + q[:, 1:2] * (M_Y * r3[:, 1]) + t3
    p = jnp.einsum("nij,nj->ni", r2, img) + t2
    frames = Frame(r2, t2)
    q_noisy = q + sigma * jax.random.normal(keys[5], q.shape)
    return (frames, q_noisy, p), (frames, q, p), dict(t3=t3, r3=r3, w3=w3)


def make_plane_phantom_data(key, n=50, sigma=1.0):
    """Pixels viewing an unknown plane: random plane (w1_y, w1_x, t1_z),
    random T3; per element random pose rotation and free translation
    projected onto the plane constraint."""
    keys = jax.random.split(key, 8)
    r3, w3 = _random_rotation(keys[0])
    t3 = jax.random.uniform(keys[1], (3,), minval=-100, maxval=100)
    w1 = jax.random.uniform(keys[2], (2,), minval=-1.0, maxval=1.0)  # wy, wx
    cy1, sy1 = jnp.cos(w1[0]), jnp.sin(w1[0])
    cx1, sx1 = jnp.cos(w1[1]), jnp.sin(w1[1])
    r1_row3 = jnp.stack([-sy1, cy1 * sx1, cy1 * cx1])
    t1_z = jax.random.uniform(keys[3], (), minval=-100, maxval=100)

    q = jax.random.uniform(
        keys[4], (n, 2), minval=0.0, maxval=1.0
    ) * jnp.asarray([640.0, 480.0])
    w2 = jax.random.uniform(keys[5], (n, 3), minval=0.0, maxval=jnp.pi)
    r2 = jax.vmap(lambda w: _euler_zyx_matrix(w[2], w[1], w[0]))(w2)
    img = q[:, 0:1] * (M_X * r3[:, 0]) + q[:, 1:2] * (M_Y * r3[:, 1]) + t3
    mapped = jnp.einsum("nij,nj->ni", r2, img)
    a = jax.random.uniform(keys[6], (n, 3), minval=-100, maxval=100)
    # Project the free translation onto the plane constraint:
    # r1_row3.(mapped + t2) + t1_z = 0.
    violation = (mapped + a) @ r1_row3 + t1_z
    t2 = a - violation[:, None] * r1_row3
    frames = Frame(r2, t2)
    q_noisy = q + sigma * jax.random.normal(keys[7], q.shape)
    true = dict(w1=w1, t1_z=t1_z, t3=t3, r3=r3, r1_row3=r1_row3)
    return (frames, q_noisy), (frames, q), true
