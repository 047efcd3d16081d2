"""2D line estimator, params ``[nx, ny, ax, ay]`` with n the unit *normal*.

Parity target: ``parametersEstimators/Line2DParametersEstimator.{h,cxx}``.
The reference keeps this estimator VNL-free on purpose (closed-form smallest
eigenvector via the largest-eigenvalue trick,
``Line2DParametersEstimator.cxx:50-100``); we keep the same closed form —
it is also the fastest TPU formulation (pure elementwise math, no
factorization).
"""

import jax.numpy as jnp

from lsqrrecipes_tpu.estimators.base import Estimator, register


@register("line2d")
class Line2DEstimator(Estimator):
    k = 2
    nparams = 4

    fused_family = "line2d"

    def __init__(self, delta: float):
        self.delta = float(delta)
        self.delta_squared = float(delta) * float(delta)

    def minimal_fit(self, samples):
        """Two points -> normal perpendicular to p1-p0.

        ``Line2DParametersEstimator.cxx:11-32``: degenerate when the points
        are closer than delta (squared-norm test).
        """
        p0, p1 = samples[..., 0, :], samples[..., 1, :]
        nx = p1[..., 1] - p0[..., 1]
        ny = p0[..., 0] - p1[..., 0]
        norm_sq = nx * nx + ny * ny
        valid = norm_sq >= self.delta_squared
        norm = jnp.sqrt(jnp.where(valid, norm_sq, 1.0))
        params = jnp.stack([nx / norm, ny / norm, p0[..., 0], p0[..., 1]], axis=-1)
        return params, valid

    def lsq_fit(self, data, mask=None):
        return self.lsq_solve_stats(self.lsq_stats(data, mask))

    def lsq_stats(self, data, mask=None):
        """Masked sums: ``[sum_x, sum_y, sum_xx, sum_xy, sum_yy, count]``."""
        w = self._mask_or_ones(mask, data.shape[0], data.dtype)
        x, y = data[..., 0] * w, data[..., 1] * w
        return jnp.stack(
            [
                jnp.sum(x),
                jnp.sum(y),
                jnp.sum(x * data[..., 0]),
                jnp.sum(x * data[..., 1]),
                jnp.sum(y * data[..., 1]),
                jnp.sum(w),
            ]
        )

    def lsq_solve_stats(self, stats):
        """Closed-form smallest eigenvector of the 2x2 scatter matrix.

        Mirrors ``Line2DParametersEstimator.cxx:50-100`` including the
        ``cov11 < 1e-12`` vertical-line and all-points-coincide branches.
        """
        sx, sy, sxx, sxy, syy, n = (stats[i] for i in range(6))
        enough = n >= self.k
        n_safe = jnp.where(n > 0, n, 1.0)
        mean_x, mean_y = sx / n_safe, sy / n_safe
        c11 = sxx - n * mean_x * mean_x
        c12 = sxy - n * mean_x * mean_y
        c22 = syy - n * mean_y * mean_y

        # Largest eigenvalue of [[c11, c12], [c12, c22]].
        lam1 = (c11 + c22 + jnp.sqrt((c11 - c22) ** 2 + 4.0 * c12 * c12)) / 2.0
        nx, ny = -c12, lam1 - c22
        norm = jnp.sqrt(nx * nx + ny * ny)
        norm_safe = jnp.where(norm > 0, norm, 1.0)

        vertical = c11 < 1e-12  # line x = const (or degenerate point cloud)
        nx = jnp.where(vertical, 1.0, nx / norm_safe)
        ny = jnp.where(vertical, 0.0, ny / norm_safe)
        degenerate_point = jnp.logical_and(vertical, c22 < 1e-12)

        params = jnp.stack([nx, ny, mean_x, mean_y])
        valid = jnp.logical_and(enough, jnp.logical_not(degenerate_point))
        return params, valid

    def agree(self, params, data):
        """Signed point-line distance squared < delta^2
        (``Line2DParametersEstimator.cxx:119-123``)."""
        p = params[..., None, :]  # broadcast hypotheses against data
        d = (
            p[..., 0] * (data[..., 0] - p[..., 2])
            + p[..., 1] * (data[..., 1] - p[..., 3])
        )
        return d * d < self.delta_squared

    def vote_counts(self, params, data):
        """Matmul-structured batch vote: ``s = N @ X^T - (n.a)``."""
        n = params[..., :2]
        offset = jnp.sum(n * params[..., 2:], axis=-1)
        s = (
            jnp.einsum("bd,nd->bn", n, data, preferred_element_type=data.dtype)
            - offset[:, None]
        )
        return jnp.sum(s * s < self.delta_squared, axis=-1)
