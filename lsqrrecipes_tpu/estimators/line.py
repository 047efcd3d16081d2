"""kD line estimator, params ``[n(dim), a(dim)]`` with n the unit *direction*.

Parity target: ``parametersEstimators/LineParametersEstimator.{h,hxx}``.
Note the convention contrast with the 2D estimator (there n is the normal,
``Line2DParametersEstimator.h:18-21``).
"""

import jax.numpy as jnp

from lsqrrecipes_tpu.estimators.base import Estimator, register
from lsqrrecipes_tpu.linalg import eigvec_largest


@register("line")
class LineEstimator(Estimator):
    k = 2

    def __init__(self, delta: float, dim: int = 3):
        self.delta = float(delta)
        self.delta_squared = float(delta) * float(delta)
        self.dim = int(dim)
        self.nparams = 2 * self.dim
        self.fused_family = "line3d" if self.dim == 3 else None

    def minimal_fit(self, samples):
        """Direction = normalized ``p0 - p1`` (``LineParametersEstimator.hxx:23-48``);
        degenerate when the points are closer than delta."""
        p0, p1 = samples[..., 0, :], samples[..., 1, :]
        d = p0 - p1
        dist_sq = jnp.sum((p0 - p1) ** 2, axis=-1)
        valid = dist_sq >= self.delta_squared
        norm = jnp.sqrt(jnp.where(valid, dist_sq, 1.0))
        params = jnp.concatenate([d / norm[..., None], p0], axis=-1)
        return params, valid

    def lsq_fit(self, data, mask=None):
        return self.lsq_solve_stats(self.lsq_stats(data, mask))

    def lsq_stats(self, data, mask=None):
        """Masked first/second moments: ``(sum[dim], outer[dim,dim], count)``."""
        w = self._mask_or_ones(mask, data.shape[0], data.dtype)
        xw = data * w[:, None]
        return (
            jnp.sum(xw, axis=0),
            xw.T @ data,
            jnp.sum(w),
        )

    def lsq_solve_stats(self, stats):
        """Eigenvector of the *largest* eigenvalue of the scatter matrix
        (``LineParametersEstimator.hxx:68-111``)."""
        s, outer, n = stats
        enough = n >= self.k
        n_safe = jnp.where(n > 0, n, 1.0)
        mean = s / n_safe
        cov = outer - jnp.outer(s, s) / n_safe
        direction = eigvec_largest(cov)
        params = jnp.concatenate([direction, mean])
        return params, enough

    def agree(self, params, data):
        """Orthogonal point-to-line distance^2 < delta^2
        (``LineParametersEstimator.hxx:135-150``)."""
        d = self.dim
        n = params[..., None, :d]
        a = params[..., None, d:]
        v = data - a
        v_dot_n = jnp.sum(v * n, axis=-1, keepdims=True)
        perp = v - v_dot_n * n
        return jnp.sum(perp * perp, axis=-1) < self.delta_squared
