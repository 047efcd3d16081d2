"""Absolute orientation (Horn, unit quaternion), params
``[qs, qx, qy, qz, tx, ty, tz]``.

Parity target:
``parametersEstimators/AbsoluteOrientationParametersEstimator.{h,cxx}``.
Data is a pair of point arrays ``(first[n, 3], second[n, 3])``; the estimated
transform maps the first set onto the second.
"""

import jax.numpy as jnp

from lsqrrecipes_tpu.config import EPS
from lsqrrecipes_tpu.estimators.base import Estimator, register
from lsqrrecipes_tpu.geometry import rotations
from lsqrrecipes_tpu.linalg import eigvec_largest


def _horn_n_matrix(m):
    """Symmetric 4x4 N from the 3x3 cross-covariance M
    (``AbsoluteOrientationParametersEstimator.cxx:171-188``)."""
    trace = jnp.trace(m)
    a12 = m[1, 2] - m[2, 1]
    a20 = m[2, 0] - m[0, 2]
    a01 = m[0, 1] - m[1, 0]
    lower = m + m.T - trace * jnp.eye(3, dtype=m.dtype)
    top = jnp.concatenate(
        [jnp.array([trace], m.dtype), jnp.array([a12, a20, a01], m.dtype)]
    )
    rest = jnp.concatenate(
        [jnp.array([[a12], [a20], [a01]], m.dtype), lower], axis=1
    )
    return jnp.concatenate([top[None, :], rest], axis=0)


@register("absolute_orientation")
class AbsoluteOrientationEstimator(Estimator):
    k = 3
    nparams = 7
    fused_family = "absolute_orientation"

    def __init__(self, delta: float):
        self.delta = float(delta)
        self.delta_squared = float(delta) * float(delta)

    def minimal_fit(self, samples):
        """Orthonormal-frame construction from 3 point pairs
        (``AbsoluteOrientationParametersEstimator.cxx:14-101``):
        build per-set frames (x from p0-mean, Gram-Schmidt y from p1-mean,
        z by cross product), ``R = R2 R1^T``, ``t = mean2 - R mean1``;
        collinear triples (||z|| < EPS) are degenerate.
        """
        first, second = samples

        def build_frame(p):
            mean = jnp.mean(p, axis=-2)
            x = p[..., 0, :] - mean
            x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
            x = x / jnp.where(x_norm > 0, x_norm, 1.0)
            y = p[..., 1, :] - mean
            y = y - jnp.sum(y * x, axis=-1, keepdims=True) * x
            y_norm = jnp.linalg.norm(y, axis=-1, keepdims=True)
            y = y / jnp.where(y_norm > 0, y_norm, 1.0)
            z = jnp.cross(x, y)
            ok = jnp.linalg.norm(z, axis=-1) >= EPS
            return jnp.stack([x, y, z], axis=-1), mean, ok  # columns x,y,z

        r1, mean1, ok1 = build_frame(first)
        r2, mean2, ok2 = build_frame(second)
        r = r2 @ jnp.swapaxes(r1, -1, -2)
        t = mean2 - jnp.einsum("...ij,...j->...i", r, mean1)
        q = rotations.quaternion_from_matrix(r)
        return jnp.concatenate([q, t], axis=-1), jnp.logical_and(ok1, ok2)

    def lsq_fit(self, data, mask=None):
        return self.lsq_solve_stats(self.lsq_stats(data, mask))

    def lsq_stats(self, data, mask=None):
        """Weighted sums for Horn's method: also serves
        ``weightedLeastSquaresEstimate``
        (``AbsoluteOrientationParametersEstimator.cxx:208-297``) when
        ``mask`` carries real-valued weights."""
        first, second = data
        w = self._mask_or_ones(mask, first.shape[0], first.dtype)
        fw = first * w[:, None]
        return (
            jnp.sum(fw, axis=0),
            jnp.sum(second * w[:, None], axis=0),
            fw.T @ second,      # sum w f s^T (cross-covariance accumulator)
            jnp.sum(w),
        )

    def lsq_solve_stats(self, stats):
        """Horn: eigenvector of the largest eigenvalue of N
        (``AbsoluteOrientationParametersEstimator.cxx:120-206``)."""
        sum1, sum2, cross, n = stats
        enough = n >= self.k
        n_safe = jnp.where(n > 0, n, 1.0)
        mean1, mean2 = sum1 / n_safe, sum2 / n_safe
        m = cross - jnp.outer(sum1, sum2) / n_safe
        q = eigvec_largest(_horn_n_matrix(m))
        r = rotations.matrix_from_quaternion(q)
        t = mean2 - r @ mean1
        return jnp.concatenate([q, t]), enough

    def agree(self, params, data):
        """``||T(first) - second||^2 < delta^2``
        (``AbsoluteOrientationParametersEstimator.cxx:316-327``)."""
        first, second = data
        q = rotations.normalize_quaternion(params[..., :4])
        r = rotations.matrix_from_quaternion(q)
        t = params[..., 4:]
        mapped = jnp.einsum("...ij,nj->...ni", r, first) + t[..., None, :]
        err = mapped - second
        return jnp.sum(err * err, axis=-1) < self.delta_squared
