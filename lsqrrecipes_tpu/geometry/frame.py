"""Rigid (Euclidean) transforms as batched arrays.

TPU-native replacement for the reference's ``common/Frame.{h,cxx}`` class: a
``Frame`` is a NamedTuple (hence a JAX pytree) of a rotation block
``r[..., 3, 3]`` and translation ``t[..., 3]``, so a *stack of thousands of
tracked-tool poses is one Frame* — every operation broadcasts over leading
axes and is jit/vmap-safe.  The per-object mutating API of the C++
(``setRotationQuaternion``/``apply``/``mul``/``invert``,
``Frame.cxx:208-464``) becomes pure functions/methods returning new values.
"""

from typing import NamedTuple

import jax.numpy as jnp

from lsqrrecipes_tpu.geometry import rotations


class Frame(NamedTuple):
    """Rigid transform ``p -> r @ p + t`` with arbitrary batch dimensions."""

    r: jnp.ndarray  # [..., 3, 3] rotation
    t: jnp.ndarray  # [..., 3] translation

    # ------------------------------------------------------------------ build
    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float64):
        r = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        t = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return Frame(r, t)

    @staticmethod
    def from_quaternion(q, t, normalize=False):
        """From quaternion ``[..., 4]`` (s first) and translation ``[..., 3]``."""
        q = jnp.asarray(q)
        if normalize:
            q = rotations.normalize_quaternion(q)
        return Frame(rotations.matrix_from_quaternion(q), jnp.asarray(t))

    @staticmethod
    def from_euler_zyx(ax, ay, az, t):
        return Frame(rotations.matrix_from_euler_zyx(ax, ay, az), jnp.asarray(t))

    @staticmethod
    def from_axis_angle(axis, angle, t):
        return Frame(rotations.matrix_from_axis_angle(axis, angle), jnp.asarray(t))

    @staticmethod
    def from_axis_angle_vector(w, t):
        return Frame(rotations.matrix_from_axis_angle_vector(w), jnp.asarray(t))

    # ------------------------------------------------------------------ apply
    def apply(self, p):
        """Transform points ``p[..., 3]`` -> ``r @ p + t`` (``Frame.cxx:208``)."""
        return (
            jnp.einsum("...ij,...j->...i", self.r, jnp.asarray(p)) + self.t
        )

    def apply_vector(self, v):
        """Rotate vectors (translation ignored, ``Frame.cxx:281-300``)."""
        return jnp.einsum("...ij,...j->...i", self.r, jnp.asarray(v))

    def apply_inverse(self, p):
        """``r^T @ (p - t)`` (``Frame.cxx:240-260``)."""
        return jnp.einsum("...ji,...j->...i", self.r, jnp.asarray(p) - self.t)

    def apply_inverse_vector(self, v):
        return jnp.einsum("...ji,...j->...i", self.r, jnp.asarray(v))

    # ---------------------------------------------------------------- algebra
    def compose(self, other: "Frame") -> "Frame":
        """``self o other`` — apply ``other`` first (``Frame.cxx:372-422``)."""
        r = jnp.einsum("...ij,...jk->...ik", self.r, other.r)
        t = jnp.einsum("...ij,...j->...i", self.r, other.t) + self.t
        return Frame(r, t)

    def __matmul__(self, other: "Frame") -> "Frame":
        return self.compose(other)

    def inverse(self) -> "Frame":
        """Rigid inverse ``(r^T, -r^T t)`` (``Frame.cxx:424-464``)."""
        rt = jnp.swapaxes(self.r, -1, -2)
        return Frame(rt, -jnp.einsum("...ij,...j->...i", rt, self.t))

    # ------------------------------------------------------------ conversions
    def quaternion(self):
        """Unit quaternion ``[..., 4]``, scalar first (``Frame.cxx:952-988``)."""
        return rotations.quaternion_from_matrix(self.r)

    def euler_zyx(self):
        """Both Euler-ZYX solutions ``[..., 6]`` + gimbal flag."""
        return rotations.euler_zyx_from_matrix(self.r)

    def axis_angle(self):
        """``(angle[...], axis[..., 3])`` (``Frame.cxx:916-950``)."""
        return rotations.axis_angle_from_matrix(self.r)

    # ---------------------------------------------------------- interpolation
    def lerp(self, other: "Frame", t) -> "Frame":
        """Normalized-quaternion + translation lerp (``Frame.cxx:466-492``)."""
        q = rotations.quaternion_lerp(self.quaternion(), other.quaternion(), t)
        tt = jnp.asarray(t)[..., None]
        return Frame.from_quaternion(q, (1.0 - tt) * self.t + tt * other.t)

    def slerp(self, other: "Frame", t) -> "Frame":
        """Quaternion slerp + translation lerp (``Frame.cxx:520-592``)."""
        q = rotations.quaternion_slerp(self.quaternion(), other.quaternion(), t)
        tt = jnp.asarray(t)[..., None]
        return Frame.from_quaternion(q, (1.0 - tt) * self.t + tt * other.t)

    # ----------------------------------------------------------------- deltas
    def angle_and_translation_diff(self, other: "Frame"):
        """``(|dt|[..., 3], angle[...])`` of ``other^-1 o self`` vs identity.

        Mirrors ``Frame.cxx:1016-1059``.
        """
        delta = other.inverse().compose(self)
        angle, _ = delta.axis_angle()
        return jnp.abs(delta.t), jnp.abs(angle)

    def euler_and_translation_diff(self, other: "Frame"):
        """Per-axis |translation| and |Euler-ZYX| differences + validity.

        Mirrors ``Frame.cxx:981-1014`` — invalid (False) when either frame is
        gimbal locked.
        """
        a_self, lock_a = self.euler_zyx()
        a_other, lock_b = other.euler_zyx()
        dt = jnp.abs(self.t - other.t)
        da = jnp.abs(a_self[..., :3] - a_other[..., :3])
        return dt, da, jnp.logical_not(jnp.logical_or(lock_a, lock_b))
