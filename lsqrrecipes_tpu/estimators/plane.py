"""kD hyperplane estimator, params ``[n(dim), a(dim)]``, n the unit normal.

Parity target: ``parametersEstimators/PlaneParametersEstimator.{h,hxx}``.
"""

import jax.numpy as jnp

from lsqrrecipes_tpu.config import EPS
from lsqrrecipes_tpu.estimators.base import Estimator, register
from lsqrrecipes_tpu.linalg import eigvec_smallest, nullvector


@register("plane")
class PlaneEstimator(Estimator):
    def __init__(self, delta: float, dim: int = 3):
        self.delta = float(delta)
        self.delta_squared = float(delta) * float(delta)
        self.dim = int(dim)
        self.k = self.dim
        self.nparams = 2 * self.dim
        self.fused_family = "plane3d" if self.dim == 3 else None

    def minimal_fit(self, samples):
        """dim points -> normal.

        3D uses the direct cross product with an EPS collinearity gate
        (``PlaneParametersEstimator.hxx:48-69``); other dims take the SVD
        null vector of the ``k x (k+1)`` homogeneous system ``[p, -1]`` with
        a rank check (``PlaneParametersEstimator.hxx:70-104``).
        """
        p0 = samples[..., 0, :]
        if self.dim == 3:
            v1 = samples[..., 1, :] - p0
            v2 = samples[..., 2, :] - p0
            n = jnp.cross(v1, v2)
            norm = jnp.linalg.norm(n, axis=-1)
            valid = norm >= EPS
            n = n / jnp.where(valid, norm, 1.0)[..., None]
        else:
            ones = -jnp.ones(samples.shape[:-1] + (1,), samples.dtype)
            a = jnp.concatenate([samples, ones], axis=-1)  # [k, k+1]
            x, rank = nullvector(a)
            valid = rank >= self.k
            n_raw = x[..., : self.dim]
            norm = jnp.linalg.norm(n_raw, axis=-1)
            n = n_raw / jnp.where(norm > 0, norm, 1.0)[..., None]
        return jnp.concatenate([n, p0], axis=-1), valid

    def lsq_fit(self, data, mask=None):
        return self.lsq_solve_stats(self.lsq_stats(data, mask))

    def lsq_stats(self, data, mask=None):
        w = self._mask_or_ones(mask, data.shape[0], data.dtype)
        xw = data * w[:, None]
        return (jnp.sum(xw, axis=0), xw.T @ data, jnp.sum(w))

    def lsq_solve_stats(self, stats):
        """Eigenvector of the *smallest* eigenvalue of the scatter matrix
        (``PlaneParametersEstimator.hxx:129-172``)."""
        s, outer, n = stats
        enough = n >= self.k
        n_safe = jnp.where(n > 0, n, 1.0)
        mean = s / n_safe
        cov = outer - jnp.outer(s, s) / n_safe
        normal = eigvec_smallest(cov)
        return jnp.concatenate([normal, mean]), enough

    def agree(self, params, data):
        """Signed point-plane distance^2 < delta^2
        (``PlaneParametersEstimator.hxx:195-203``)."""
        d = self.dim
        n = params[..., None, :d]
        a = params[..., None, d:]
        signed = jnp.sum(n * (data - a), axis=-1)
        return signed * signed < self.delta_squared
