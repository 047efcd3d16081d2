"""Dense linear equation system estimator: rows ``[a_0..a_{n-1} | b]``.

Parity target:
``parametersEstimators/DenseLinearEquationSystemParametersEstimator.{h,hxx}``
with data items being augmented rows (``AugmentedRow``,
``DenseLinearEquationSystemParametersEstimator.h:20-135``) — here simply a
``[rows, n+1]`` array.
"""

import jax.numpy as jnp

from lsqrrecipes_tpu.estimators.base import Estimator, register
from lsqrrecipes_tpu.linalg import masked_pinv_solve, pinv_solve


@register("dense_linear")
class DenseLinearSystemEstimator(Estimator):
    def __init__(self, delta: float, n: int):
        self.delta = float(delta)
        self.n = int(n)
        self.k = self.n
        self.nparams = self.n
        # The 6-unknown case (the reference's example workload) has a fully
        # fused Pallas sweep; other sizes use the generic engine.
        self.fused_family = "dense_linear6" if self.n == 6 else None

    def minimal_fit(self, samples):
        """n rows -> exact solve via SVD pseudo-inverse with rank check
        (``DenseLinearEquationSystemParametersEstimator.hxx:16-49``)."""
        a = samples[..., : self.n]
        b = samples[..., self.n]
        x, rank = pinv_solve(a, b)
        return x, rank >= self.n

    def lsq_fit(self, data, mask=None):
        """Overdetermined solve, same SVD path
        (``DenseLinearEquationSystemParametersEstimator.hxx:64-96``)."""
        a = data[..., : self.n]
        b = data[..., self.n]
        if mask is None:
            x, rank = pinv_solve(a, b)
            enough = jnp.asarray(data.shape[-2] >= self.k)
        else:
            x, rank = masked_pinv_solve(a, b, mask)
            enough = jnp.sum(mask) >= self.k
        return x, jnp.logical_and(rank >= self.n, enough)

    def lsq_stats(self, data, mask=None):
        w = self._mask_or_ones(mask, data.shape[0], data.dtype)
        a = data[..., : self.n] * w[:, None]
        b = data[..., self.n] * w
        return (a.T @ data[..., : self.n], a.T @ data[..., self.n], jnp.sum(w))

    def lsq_solve_stats(self, stats):
        """Normal-equation solve of the psum-reduced ``(A^T A, A^T b)``.

        Distributed-refit path: rank is checked on the eigenvalues of
        ``A^T A`` (i.e. sigma(A)^2), a deviation from the reference's
        absolute-EPS test on sigma(A) documented in
        :mod:`lsqrrecipes_tpu.parallel`.
        """
        ata, atb, n = stats
        x, rank = pinv_solve(ata, atb)
        return x, jnp.logical_and(rank >= self.n, n >= self.k)

    def agree(self, params, data):
        """``|a . x - b| < delta``
        (``DenseLinearEquationSystemParametersEstimator.hxx:111-119``)."""
        p = params[..., None, :]
        residual = jnp.sum(p * data[..., : self.n], axis=-1) - data[..., self.n]
        return jnp.abs(residual) < self.delta


def augmented_rows(a, b):
    """Adapter ``(A[m, n], b[m]) -> rows[m, n+1]``.

    Mirrors ``DenseLinearEquationSystemParametersEstimator::getAugmentedRows``
    (``...hxx:122-136``), which converts a matrix/vector pair into the
    estimator's data elements.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if b.shape[0] != a.shape[0]:
        raise ValueError("A and b row counts differ")
    return jnp.concatenate([a, b[:, None]], axis=1)
