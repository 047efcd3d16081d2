"""Rays in 3D: ``r(t) = p + t n`` with ``t >= 0``.

Replaces the reference ``common/Ray3D.{h,cxx}``.  A ``Ray3D`` is a pytree of
origin ``p[..., 3]`` and direction ``n[..., 3]`` (not necessarily unit, as in
the reference, ``Ray3D.h:10-16``), batched over leading axes.
"""

from typing import NamedTuple

import jax.numpy as jnp

from lsqrrecipes_tpu.config import EPS


class Ray3D(NamedTuple):
    p: jnp.ndarray  # [..., 3] origin
    n: jnp.ndarray  # [..., 3] direction

    def transformed(self, frame):
        """Rigidly transform the ray (origin as point, direction as vector)."""
        return Ray3D(frame.apply(self.p), frame.apply_vector(self.n))

    def distance_to_point(self, q):
        """Distance from point(s) ``q`` to the *line* carrying the ray.

        Mirrors ``Ray3D.cxx:58-76`` (perpendicular foot; the reference's
        point-to-line distance does not clamp t to >= 0 either).
        """
        n = self.n / jnp.linalg.norm(self.n, axis=-1, keepdims=True)
        d = jnp.asarray(q) - self.p
        t = jnp.sum(d * n, axis=-1)
        perp = d - t[..., None] * n
        return jnp.linalg.norm(perp, axis=-1)


def intersect_rays(ray_a: Ray3D, ray_b: Ray3D, parallel_eps: float = EPS):
    """Analytic two-ray 'intersection': midpoint of the common perpendicular.

    Graphics-Gems closed form as in ``Ray3D.cxx:6-56`` and
    ``RayIntersectionParametersEstimator.cxx:9-69``.  Returns
    ``(point[..., 3], valid[...])`` where valid is False for near-parallel
    rays (``||n1 x n2||^2 < parallel_eps``) or when either ray parameter is
    negative (lines intersect behind an origin).
    """
    p21 = ray_b.p - ray_a.p
    cross = jnp.cross(ray_a.n, ray_b.n)
    denom = jnp.sum(cross * cross, axis=-1)
    nonparallel = denom >= parallel_eps
    safe_denom = jnp.where(nonparallel, denom, 1.0)

    t1 = jnp.sum(cross * jnp.cross(p21, ray_b.n), axis=-1) / safe_denom
    t2 = jnp.sum(cross * jnp.cross(p21, ray_a.n), axis=-1) / safe_denom

    valid = jnp.logical_and(nonparallel, jnp.logical_and(t1 >= 0, t2 >= 0))
    midpoint = 0.5 * (
        ray_a.p + t1[..., None] * ray_a.n + ray_b.p + t2[..., None] * ray_b.n
    )
    return midpoint, valid
