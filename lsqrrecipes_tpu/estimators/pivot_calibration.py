"""Pivot calibration estimator, params ``[t_DRF(3), t_W(3)]``.

Parity target:
``parametersEstimators/PivotCalibrationParametersEstimator.{h,cxx}``
(method of Yaniv, SPIE 2015, ``PivotCalibrationParametersEstimator.h:24-26``):
a tracked tool pivots around a fixed point; each pose contributes
``[R_i  -I] [t_DRF; t_W] = -t_i``.  Data is a batched
:class:`~lsqrrecipes_tpu.geometry.frame.Frame`.
"""

import jax.numpy as jnp

from lsqrrecipes_tpu.estimators.base import Estimator, register
from lsqrrecipes_tpu.geometry.frame import Frame
from lsqrrecipes_tpu.linalg import masked_pinv_solve, pinv_solve


def _stack_system(frames: Frame):
    """Build ``A[3n, 6] = [R_i, -I]`` and ``b[3n] = -t_i``
    (``PivotCalibrationParametersEstimator.cxx:63-96``)."""
    n = frames.t.shape[0]
    eye = jnp.broadcast_to(-jnp.eye(3, dtype=frames.t.dtype), (n, 3, 3))
    a = jnp.concatenate([frames.r, eye], axis=-1).reshape(3 * n, 6)
    b = (-frames.t).reshape(3 * n)
    return a, b


@register("pivot_calibration")
class PivotCalibrationEstimator(Estimator):
    k = 3
    nparams = 6
    fused_family = "pivot"

    def __init__(self, delta: float):
        self.delta = float(delta)

    def minimal_fit(self, samples: Frame):
        """Exactly 3 frames -> 9x6 SVD pseudo-inverse with rank-6 check
        (``PivotCalibrationParametersEstimator.cxx:9-51``)."""
        a, b = _stack_system(samples)
        x, rank = pinv_solve(a, b)
        return x, rank >= 6

    def lsq_fit(self, data: Frame, mask=None):
        a, b = _stack_system(data)
        if mask is None:
            x, rank = pinv_solve(a, b)
            enough = jnp.asarray(data.t.shape[0] >= self.k)
        else:
            row_mask = jnp.repeat(mask, 3)
            x, rank = masked_pinv_solve(a, b, row_mask)
            enough = jnp.sum(mask) >= self.k
        return x, jnp.logical_and(rank >= 6, enough)

    def lsq_stats(self, data: Frame, mask=None):
        """Normal-equation partials.  With ``A = [R_i, -I]``:
        ``A^T A = [[sum w I, -sum w R^T], [-sum w R, sum w I]]`` and
        ``A^T b = [-sum w R^T t, sum w t]`` — everything reduces to
        ``sum w R`` and ``sum w R^T t`` / ``sum w t``."""
        w = self._mask_or_ones(mask, data.t.shape[0], data.t.dtype)
        rw = data.r * w[:, None, None]
        return (
            jnp.sum(rw, axis=0),                                   # sum w R
            jnp.einsum("nij,ni->j", rw, data.t),                   # sum w R^T t
            jnp.sum(data.t * w[:, None], axis=0),                  # sum w t
            jnp.sum(w),
        )

    def lsq_solve_stats(self, stats):
        sum_r, sum_rt_t, sum_t, n = stats
        eye = jnp.eye(3, dtype=sum_r.dtype)
        ata = jnp.block([[n * eye, -sum_r.T], [-sum_r, n * eye]])
        atb = jnp.concatenate([-sum_rt_t, sum_t])
        x, rank = pinv_solve(ata, atb)
        return x, jnp.logical_and(rank >= 6, n >= self.k)

    def agree(self, params, data: Frame):
        """``||R t_DRF + t - t_W|| < delta``
        (``PivotCalibrationParametersEstimator.cxx:108-123``)."""
        mapped = jnp.einsum("nij,...j->...ni", data.r, params[..., :3]) + data.t
        return (
            jnp.linalg.norm(mapped - params[..., None, 3:], axis=-1) < self.delta
        )
