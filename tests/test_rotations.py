"""Round-trip and convention tests for the rotation conversions.

Mirrors the implicit contract of ``common/Frame.cxx``: all four
representations must round-trip through the matrix form, including the
gimbal-lock and near-pi singular zones.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsqrrecipes_tpu.geometry import Frame, rotations


def random_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: s >= 0 (extraction returns s = 0.5*sqrt(trace+1) >= 0).
    return q * jnp.sign(q[:, :1] + (q[:, :1] == 0))


def test_quaternion_matrix_roundtrip():
    q = random_quats(jax.random.PRNGKey(0), 500)
    r = rotations.matrix_from_quaternion(q)
    q2 = rotations.quaternion_from_matrix(r)
    # Compare as rotations: for s ~ 0 the extraction (like the reference's
    # stabilized branch, ``Frame.cxx:973-988``) may return -q, the same
    # rotation.
    r2 = rotations.matrix_from_quaternion(q2)
    np.testing.assert_allclose(r, r2, atol=1e-12)
    # Away from the singular zone the quaternion itself must match.
    regular = np.abs(np.asarray(q[:, 0])) > 0.2
    np.testing.assert_allclose(q[regular], q2[regular], atol=1e-12)


def test_quaternion_roundtrip_near_pi():
    """Rotation angles near pi exercise the stabilized branch
    (``Frame.cxx:973-988``)."""
    key = jax.random.PRNGKey(1)
    axis = jax.random.normal(key, (200, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    angle = jnp.pi - jnp.linspace(0, 5e-3, 200)
    r = rotations.matrix_from_axis_angle(axis, angle)
    q = rotations.quaternion_from_matrix(r)
    r2 = rotations.matrix_from_quaternion(q)
    np.testing.assert_allclose(r, r2, atol=1e-9)


def test_euler_zyx_roundtrip():
    key = jax.random.PRNGKey(2)
    ax, ay, az = jax.random.uniform(key, (3, 300), minval=-3, maxval=3)
    ay = jnp.clip(ay, -1.4, 1.4)  # stay off gimbal lock
    r = rotations.matrix_from_euler_zyx(ax, ay, az)
    angles, lock = rotations.euler_zyx_from_matrix(r)
    assert not bool(jnp.any(lock))
    r1 = rotations.matrix_from_euler_zyx(
        angles[:, 0], angles[:, 1], angles[:, 2]
    )
    r2 = rotations.matrix_from_euler_zyx(
        angles[:, 3], angles[:, 4], angles[:, 5]
    )
    np.testing.assert_allclose(r, r1, atol=1e-12)
    # The second Euler solution must reproduce the same matrix.
    np.testing.assert_allclose(r, r2, atol=1e-12)


def test_euler_gimbal_lock():
    r = rotations.matrix_from_euler_zyx(
        jnp.asarray(0.3), jnp.asarray(jnp.pi / 2), jnp.asarray(0.5)
    )
    angles, lock = rotations.euler_zyx_from_matrix(r)
    assert bool(lock)
    assert angles[2] == 0.0 and angles[5] == 0.0  # az forced to 0
    r2 = rotations.matrix_from_euler_zyx(angles[0], angles[1], angles[2])
    np.testing.assert_allclose(r, r2, atol=1e-12)


def test_axis_angle_roundtrip():
    key = jax.random.PRNGKey(3)
    axis = jax.random.normal(key, (300, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    angle = jax.random.uniform(key, (300,), minval=0.05, maxval=3.0)
    r = rotations.matrix_from_axis_angle(axis, angle)
    angle2, axis2 = rotations.axis_angle_from_matrix(r)
    np.testing.assert_allclose(angle, angle2, atol=1e-10)
    np.testing.assert_allclose(axis, axis2, atol=1e-8)


def test_axis_angle_near_pi_stabilized():
    axis = jnp.asarray([0.6, -0.64, 0.48])
    axis = axis / jnp.linalg.norm(axis)
    r = rotations.matrix_from_axis_angle(axis, jnp.asarray(jnp.pi - 1e-4))
    angle2, axis2 = rotations.axis_angle_from_matrix(r)
    r2 = rotations.matrix_from_axis_angle(axis2, angle2)
    np.testing.assert_allclose(r, r2, atol=1e-8)


def test_matrix_from_to():
    key = jax.random.PRNGKey(4)
    v = jax.random.normal(key, (100, 2, 3))
    r = rotations.matrix_from_to(v[:, 0], v[:, 1])
    mapped = jnp.einsum("nij,nj->ni", r, v[:, 0] / jnp.linalg.norm(v[:, 0], axis=-1, keepdims=True))
    expected = v[:, 1] / jnp.linalg.norm(v[:, 1], axis=-1, keepdims=True)
    np.testing.assert_allclose(mapped, expected, atol=1e-12)
    # Proper rotation: R R^T = I, det = 1.
    np.testing.assert_allclose(
        jnp.einsum("nij,nkj->nik", r, r), jnp.broadcast_to(jnp.eye(3), r.shape), atol=1e-12
    )


def test_frame_compose_invert_apply():
    key = jax.random.PRNGKey(5)
    q = random_quats(key, 10)
    t = jax.random.normal(jax.random.PRNGKey(6), (10, 3))
    f = Frame.from_quaternion(q, t)
    p = jax.random.normal(jax.random.PRNGKey(7), (10, 3))

    roundtrip = f.inverse().apply(f.apply(p))
    np.testing.assert_allclose(roundtrip, p, atol=1e-12)

    composed = f.compose(f.inverse())
    np.testing.assert_allclose(composed.r, jnp.broadcast_to(jnp.eye(3), (10, 3, 3)), atol=1e-12)
    np.testing.assert_allclose(composed.t, jnp.zeros((10, 3)), atol=1e-12)


def test_frame_slerp_endpoints_and_midpoint():
    f0 = Frame.from_euler_zyx(jnp.asarray(0.1), jnp.asarray(0.2), jnp.asarray(0.3), jnp.asarray([1.0, 2.0, 3.0]))
    f1 = Frame.from_euler_zyx(jnp.asarray(-0.4), jnp.asarray(0.5), jnp.asarray(0.9), jnp.asarray([4.0, -1.0, 0.0]))
    s0 = f0.slerp(f1, 0.0)
    s1 = f0.slerp(f1, 1.0)
    np.testing.assert_allclose(s0.r, f0.r, atol=1e-12)
    np.testing.assert_allclose(s1.r, f1.r, atol=1e-12)
    mid = f0.slerp(f1, 0.5)
    # Midpoint rotation is equidistant (in angle) from both endpoints.
    _, a0 = mid.angle_and_translation_diff(f0)
    _, a1 = mid.angle_and_translation_diff(f1)
    np.testing.assert_allclose(a0, a1, atol=1e-10)


def test_angle_and_translation_diff():
    f0 = Frame.identity()
    axis = jnp.asarray([0.0, 0.0, 1.0])
    f1 = Frame.from_axis_angle(axis, jnp.asarray(0.25), jnp.asarray([1.0, -2.0, 0.5]))
    dt, angle = f1.angle_and_translation_diff(f0)
    np.testing.assert_allclose(angle, 0.25, atol=1e-12)
    np.testing.assert_allclose(dt, jnp.abs(f1.t), atol=1e-12)


@pytest.mark.parametrize("batch", [(), (7,)])
def test_jit_vmap_safety(batch):
    """Conversions must be jit-safe and NaN-free for identity inputs."""
    r = jnp.broadcast_to(jnp.eye(3), (*batch, 3, 3))
    q = jax.jit(rotations.quaternion_from_matrix)(r)
    assert bool(jnp.all(jnp.isfinite(q)))
    angle, axis = jax.jit(rotations.axis_angle_from_matrix)(r)
    assert bool(jnp.all(jnp.isfinite(axis))) and bool(jnp.all(angle == 0))
