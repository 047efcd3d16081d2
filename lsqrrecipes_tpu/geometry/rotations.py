"""Rotation-representation conversions, batched and branchless.

Reproduces the numerical behavior of the reference ``common/Frame.cxx``
rotation code (quaternion/matrix/Euler-ZYX/axis-angle conversions with
gimbal-lock and near-pi stabilizations, ``Frame.cxx:881-988``) as pure
functions over arrays with arbitrary leading batch dimensions.  All
data-dependent branches of the C++ are re-derived as ``jnp.where`` selects so
the same code path serves ``vmap``-batched hypotheses on TPU.

Conventions (identical to the reference):
  * Quaternions are ``[s, qx, qy, qz]`` (scalar first), unit norm.
  * Euler angles are ZYX: ``R = Rz(az) @ Ry(ay) @ Rx(ax)``
    (``Frame.cxx:626-648``).
  * Axis-angle extraction returns ``(angle, axis)`` with ``angle`` in
    ``[0, pi]``.
  * ``SMALL_ANGLE`` = 0.5 degrees guards all the singular zones
    (``Frame.cxx:7-8``).
"""

import jax.numpy as jnp

from lsqrrecipes_tpu.config import HALF_PI, SMALL_ANGLE


def matrix_from_quaternion(q):
    """Unit quaternion ``[..., 4]`` (s first) -> rotation matrix ``[..., 3, 3]``.

    Mirrors ``Frame.cxx`` setRotationQuaternion (the standard s,x,y,z
    quaternion-to-matrix formula).
    """
    s, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - s * z), 2 * (x * z + s * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + s * z), 1 - 2 * (x * x + z * z), 2 * (y * z - s * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - s * y), 2 * (y * z + s * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def normalize_quaternion(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_from_matrix(r):
    """Rotation matrix ``[..., 3, 3]`` -> unit quaternion ``[..., 4]``, s first.

    Branchless re-derivation of ``Frame.cxx:952-988``: the regular path uses
    ``s = 0.5*sqrt(trace+1)`` and off-diagonal differences; when the rotation
    angle is within SMALL_ANGLE of pi (s near 0) the vector part is
    reconstructed from the dominant diagonal entry instead.  All four branch
    results are computed and selected with ``where`` so the function is
    vmap/jit safe and NaN-free for every input.
    """
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    s = 0.5 * jnp.sqrt(jnp.maximum(trace + 1.0, 0.0))
    half_theta = jnp.arccos(jnp.clip(s, -1.0, 1.0))
    singular = jnp.abs(half_theta - HALF_PI) < SMALL_ANGLE

    # Regular branch: vector part from off-diagonal antisymmetric entries.
    denom = jnp.where(singular, 1.0, 4.0 * s)  # guard /0 in the dead lane
    vx = (r[..., 2, 1] - r[..., 1, 2]) / denom
    vy = (r[..., 0, 2] - r[..., 2, 0]) / denom
    vz = (r[..., 1, 0] - r[..., 0, 1]) / denom
    regular = jnp.stack([s, vx, vy, vz], axis=-1)

    # Stabilized branch: for each candidate dominant axis i compute the
    # solution, then pick the one whose diagonal entry is maximal.
    # Deviation from the reference (improvement): ``Frame.cxx:983-987``
    # always returns a positive dominant component, which silently yields
    # the *inverse* rotation when s > 0 but the true component is negative
    # (up to ~2 SMALL_ANGLE rotation error).  We recover the sign from the
    # antisymmetric part: r[k,j] - r[j,k] = 4 s q_i.
    def _axis_solution(i):
        j, k = (i + 1) % 3, (i + 2) % 3
        wsq = r[..., i, i] - r[..., j, j] - r[..., k, k] + 1.0
        w = jnp.sqrt(jnp.maximum(wsq, jnp.finfo(r.dtype).tiny))
        qi = w / 2.0
        qj = (r[..., i, j] + r[..., j, i]) / (2.0 * w)
        qk = (r[..., i, k] + r[..., k, i]) / (2.0 * w)
        sign = jnp.where(r[..., k, j] - r[..., j, k] < 0.0, -1.0, 1.0)
        vec = [None, None, None]
        vec[i], vec[j], vec[k] = sign * qi, sign * qj, sign * qk
        return jnp.stack([s] + vec, axis=-1)

    diag = jnp.stack([r[..., 0, 0], r[..., 1, 1], r[..., 2, 2]], axis=-1)
    # Reference picks i via sequential "if >" comparisons (first max wins);
    # argmax with identical tie-breaking (first occurrence) matches.
    imax = jnp.argmax(diag, axis=-1)
    sols = jnp.stack([_axis_solution(0), _axis_solution(1), _axis_solution(2)], axis=-2)
    stabilized = jnp.take_along_axis(
        sols, imax[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]

    return jnp.where(singular[..., None], stabilized, regular)


def matrix_from_euler_zyx(ax, ay, az):
    """Euler ZYX angles -> rotation ``R = Rz(az) Ry(ay) Rx(ax)``.

    Matches ``Frame.cxx:626-648`` entry by entry.
    """
    cx, cy, cz = jnp.cos(ax), jnp.cos(ay), jnp.cos(az)
    sx, sy, sz = jnp.sin(ax), jnp.sin(ay), jnp.sin(az)
    row0 = jnp.stack([cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx], axis=-1)
    row1 = jnp.stack([sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx], axis=-1)
    row2 = jnp.stack([-sy, cy * sx, cy * cx], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def euler_zyx_from_matrix(r):
    """Rotation ``[..., 3, 3]`` -> ``(angles[..., 6], is_gimbal_lock[...])``.

    ``angles = [ax1, ay1, az1, ax2, ay2, az2]`` — the two Euler-ZYX solutions,
    exactly as ``Frame.cxx:881-914``.  Under gimbal lock (``|ay| within
    SMALL_ANGLE of pi/2``) both solutions collapse to ``az = 0`` and
    ``ax = atan2(r01, r11)``.
    """
    r20 = r[..., 2, 0]
    mag = jnp.sqrt(r[..., 0, 0] ** 2 + r[..., 1, 0] ** 2)
    ay1 = jnp.arctan2(-r20, mag)
    ay2 = jnp.arctan2(-r20, -mag)

    gimbal = jnp.logical_not(
        jnp.logical_and(
            jnp.abs(ay1 - HALF_PI) > SMALL_ANGLE,
            jnp.abs(ay1 + HALF_PI) > SMALL_ANGLE,
        )
    )

    cy1 = jnp.where(gimbal, 1.0, jnp.cos(ay1))
    cy2 = jnp.where(gimbal, 1.0, jnp.cos(ay2))
    ax1 = jnp.arctan2(r[..., 2, 1] / cy1, r[..., 2, 2] / cy1)
    az1 = jnp.arctan2(r[..., 1, 0] / cy1, r[..., 0, 0] / cy1)
    ax2 = jnp.arctan2(r[..., 2, 1] / cy2, r[..., 2, 2] / cy2)
    az2 = jnp.arctan2(r[..., 1, 0] / cy2, r[..., 0, 0] / cy2)

    ax_lock = jnp.arctan2(r[..., 0, 1], r[..., 1, 1])
    zero = jnp.zeros_like(ax_lock)
    ax1 = jnp.where(gimbal, ax_lock, ax1)
    ax2 = jnp.where(gimbal, ax_lock, ax2)
    az1 = jnp.where(gimbal, zero, az1)
    az2 = jnp.where(gimbal, zero, az2)

    angles = jnp.stack([ax1, ay1, az1, ax2, ay2, az2], axis=-1)
    return angles, gimbal


def matrix_from_axis_angle(axis, angle):
    """Rodrigues rotation from a unit ``axis[..., 3]`` and ``angle[...]``."""
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    k = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), k.shape)
    outer = axis[..., :, None] * axis[..., None, :]
    return c * eye + s * k + (1.0 - c) * outer


def matrix_from_axis_angle_vector(w):
    """Axis-angle vector ``[..., 3]`` whose norm is the angle -> matrix."""
    angle = jnp.linalg.norm(w, axis=-1)
    safe = jnp.where(angle > 0, angle, 1.0)
    axis = w / safe[..., None]
    axis = jnp.where(angle[..., None] > 0, axis, jnp.zeros_like(axis).at[..., 0].set(1.0))
    return matrix_from_axis_angle(axis, angle)


def axis_angle_from_matrix(r):
    """Rotation ``[..., 3, 3]`` -> ``(angle[...], axis[..., 3])``.

    Mirrors ``Frame.cxx:916-950``: ``angle = atan2(s, c)`` with the axis from
    the antisymmetric part in the regular zone and from the dominant diagonal
    entry when the angle is within SMALL_ANGLE of 0 or pi.
    """
    c_theta = (r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2] - 1.0) / 2.0
    d0 = r[..., 2, 1] - r[..., 1, 2]
    d1 = r[..., 0, 2] - r[..., 2, 0]
    d2 = r[..., 1, 0] - r[..., 0, 1]
    s_theta = jnp.sqrt((d0 * d0 + d1 * d1 + d2 * d2) / 4.0)
    angle = jnp.arctan2(s_theta, c_theta)

    # The reference uses the dominant-diagonal reconstruction outside the
    # regular zone (SMALL_ANGLE, pi - SMALL_ANGLE) (``Frame.cxx:925-949``).
    # Near *zero* that formula is 0/0-ill-conditioned (NaN for the exact
    # identity), so we deviate: the antisymmetric formula (exact as angle->0)
    # serves the near-zero zone with a safe fallback axis, and the diagonal
    # formula — where 1-cos(angle) ~ 2 makes it well-conditioned — serves
    # only the near-pi zone.
    near_pi = angle >= jnp.pi - SMALL_ANGLE

    d_norm = 2.0 * s_theta
    tiny = jnp.finfo(r.dtype).tiny
    scale = 1.0 / jnp.maximum(d_norm, jnp.sqrt(tiny))
    regular_axis = jnp.stack([scale * d0, scale * d1, scale * d2], axis=-1)
    # Exact (or numerically exact) identity: arbitrary unit axis, angle 0.
    ex = jnp.zeros_like(regular_axis).at[..., 0].set(1.0)
    regular_axis = jnp.where((d_norm > jnp.sqrt(tiny))[..., None], regular_axis, ex)

    # Stabilized axis from the dominant diagonal entry (angle near pi).
    w = 1.0 / (2.0 * jnp.maximum(1.0 - c_theta, jnp.finfo(r.dtype).tiny))

    # Same sign recovery as in quaternion_from_matrix: the reference
    # (``Frame.cxx:940-948``) forces a positive dominant component, flipping
    # the axis (hence inverting the rotation) when sin(angle) > 0 but the
    # true component is negative; r[k,j] - r[j,k] = 2 sin(angle) a_i fixes it.
    def _axis_solution(i):
        j, k = (i + 1) % 3, (i + 2) % 3
        ai_sq = (r[..., i, i] - r[..., j, j] - r[..., k, k] + 1.0) * w
        ai = jnp.sqrt(jnp.maximum(ai_sq, jnp.finfo(r.dtype).tiny))
        aj = (r[..., i, j] + r[..., j, i]) * (w / ai)
        ak = (r[..., i, k] + r[..., k, i]) * (w / ai)
        sign = jnp.where(r[..., k, j] - r[..., j, k] < 0.0, -1.0, 1.0)
        vec = [None, None, None]
        vec[i], vec[j], vec[k] = sign * ai, sign * aj, sign * ak
        return jnp.stack(vec, axis=-1)

    diag = jnp.stack([r[..., 0, 0], r[..., 1, 1], r[..., 2, 2]], axis=-1)
    imax = jnp.argmax(diag, axis=-1)
    sols = jnp.stack([_axis_solution(0), _axis_solution(1), _axis_solution(2)], axis=-2)
    stabilized_axis = jnp.take_along_axis(
        sols, imax[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]

    axis = jnp.where(near_pi[..., None], stabilized_axis, regular_axis)
    return angle, axis


def matrix_from_to(v_from, v_to):
    """Rotation taking unit-normalized ``v_from`` to ``v_to`` (Moller-Hughes).

    Mirrors ``Frame.cxx:802-849`` (``setRotationFromTo``): trig-free build
    from the cross product and ``h = 1/(1+c)``.  Like the reference, the
    anti-parallel case (c == -1) is not stabilized.
    """
    left = v_from / jnp.linalg.norm(v_from, axis=-1, keepdims=True)
    right = v_to / jnp.linalg.norm(v_to, axis=-1, keepdims=True)
    v = jnp.cross(left, right)
    c = jnp.sum(left * right, axis=-1)
    h = 1.0 / (1.0 + c)
    v0, v1, v2 = v[..., 0], v[..., 1], v[..., 2]
    row0 = jnp.stack([c + h * v0 * v0, h * v0 * v1 - v2, h * v0 * v2 + v1], axis=-1)
    row1 = jnp.stack([h * v0 * v1 + v2, c + h * v1 * v1, h * v1 * v2 - v0], axis=-1)
    row2 = jnp.stack([h * v0 * v2 - v1, h * v1 * v2 + v0, c + h * v2 * v2], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quaternion_lerp(q0, q1, t):
    """Linear quaternion interpolation, renormalized (``Frame.cxx:466-492``)."""
    t = jnp.asarray(t)[..., None]
    return normalize_quaternion((1.0 - t) * q0 + t * q1)


def quaternion_slerp(q0, q1, t):
    """Spherical linear interpolation (``Frame.cxx:520-552``).

    Like the reference, assumes the quaternions are not (anti)parallel; the
    theta == 0 lane is guarded to return ``q0`` instead of NaN.
    """
    t = jnp.asarray(t)
    dot = jnp.sum(q0 * q1, axis=-1)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    safe = jnp.abs(sin_theta) > jnp.finfo(q0.dtype).tiny
    sin_safe = jnp.where(safe, sin_theta, 1.0)
    w0 = jnp.sin((1.0 - t) * theta) / sin_safe
    w1 = jnp.sin(t * theta) / sin_safe
    out = w0[..., None] * q0 + w1[..., None] * q1
    return jnp.where(safe[..., None], out, q0)
