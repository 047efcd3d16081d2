"""Ray-intersection estimator: common point of a bundle of 3D rays.

Parity target:
``parametersEstimators/RayIntersectionParametersEstimator.{h,cxx}``.
Data is a :class:`~lsqrrecipes_tpu.geometry.ray.Ray3D` pytree with leading
observation axis; params are ``[x, y, z]``.
"""

import math

import jax.numpy as jnp

from lsqrrecipes_tpu.estimators.base import Estimator, register
from lsqrrecipes_tpu.geometry.ray import Ray3D, intersect_rays
from lsqrrecipes_tpu.linalg import pinv_solve


@register("ray_intersection")
class RayIntersectionEstimator(Estimator):
    k = 2
    nparams = 3

    fused_family = "ray3d"

    def __init__(self, delta: float, min_angular_deviation: float):
        self.delta = float(delta)
        self.delta_squared = float(delta) * float(delta)
        # ||n1 x n2||^2 < sin^2(minAngularDeviation) rejects near-parallel
        # pairs (``RayIntersectionParametersEstimator.cxx:9-16``; assumes
        # unit directions).
        self.cross_eps = math.sin(float(min_angular_deviation)) ** 2
        # Fused-sweep parameter pack (delta, cross_eps).
        self.fused_delta = (self.delta, self.cross_eps)

    def minimal_fit(self, samples: Ray3D):
        """Graphics-Gems two-ray midpoint with parallel / negative-parameter
        rejection (``RayIntersectionParametersEstimator.cxx:23-70``)."""
        ray_a = Ray3D(samples.p[..., 0, :], samples.n[..., 0, :])
        ray_b = Ray3D(samples.p[..., 1, :], samples.n[..., 1, :])
        point, valid = intersect_rays(ray_a, ray_b, parallel_eps=self.cross_eps)
        return point, valid

    def lsq_fit(self, data: Ray3D, mask=None):
        return self.lsq_solve_stats(self.lsq_stats(data, mask))

    def lsq_stats(self, data: Ray3D, mask=None):
        """Partials of the 3x3 normal system
        ``[m I - sum n n^T] x = sum (p - (n.p) n)``
        (``RayIntersectionParametersEstimator.cxx:100-144``)."""
        w = self._mask_or_ones(mask, data.p.shape[0], data.p.dtype)
        nw = data.n * w[:, None]
        nnt = nw.T @ data.n                       # sum w n n^T
        s = jnp.sum(data.n * data.p, axis=-1)     # n . p per ray
        b = jnp.sum((data.p - s[:, None] * data.n) * w[:, None], axis=0)
        return (nnt, b, jnp.sum(w))

    def lsq_solve_stats(self, stats):
        nnt, b, m = stats
        a = m * jnp.eye(3, dtype=b.dtype) - nnt
        x, rank = pinv_solve(a, b)
        return x, jnp.logical_and(rank >= 3, m >= self.k)

    def agree(self, params, data: Ray3D):
        """Perpendicular foot on the ray with ``t >= 0`` and distance^2 <
        delta^2 (``RayIntersectionParametersEstimator.cxx:164-179``)."""
        x = params[..., None, :]
        d = x - data.p
        t = jnp.sum(data.n * d, axis=-1)
        perp = d - t[..., None] * data.n
        dist_sq = jnp.sum(perp * perp, axis=-1)
        return jnp.logical_and(t >= 0, dist_sq < self.delta_squared)
