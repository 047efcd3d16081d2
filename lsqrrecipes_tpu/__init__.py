"""lsqrrecipes_tpu — TPU-native least-squares parameter-estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
zivy/LSQRRecipes (reference: /root/reference, C++/VNL): least-squares
estimation of parametric geometric objects (lines, planes, spheres, ray
intersections, rigid transforms, pivot and ultrasound-probe calibrations,
dense linear systems) plus a massively batched RANSAC robust-estimation
engine.

Design stance (NOT a port):
  * Estimators are pure functions over batched arrays registered in a small
    registry; the reference's virtual-dispatch class hierarchy
    (``parametersEstimators/ParametersEstimator.h:26-64``) becomes a
    functional protocol (:mod:`lsqrrecipes_tpu.estimators.base`).
  * The reference's serial hypothesis loop (``RANSAC.hxx:49-117``) becomes a
    fixed batch of thousands of vmapped hypotheses with masked degeneracy
    handling and argmax selection (:mod:`lsqrrecipes_tpu.ransac`).
  * The reference's "empty parameter vector" degeneracy convention
    (``ParametersEstimator.h:37-40``) becomes a per-hypothesis ``valid``
    mask that propagates through reductions.
  * Multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` with
    ``psum`` reductions over hypothesis and observation axes
    (:mod:`lsqrrecipes_tpu.parallel`), replacing nothing in the reference
    (it is single-threaded) but required for pod-scale sweeps.

Precision: reference numerics are double precision throughout
(``common/Epsilon.h:19`` sets EPS = DBL_EPSILON). Importing this package
enables ``jax_enable_x64``; estimators default to float64 and tests enforce
the reference tolerances. The high-throughput RANSAC/LM paths also run in
float32 where tolerances allow (benchmarks).
"""

from lsqrrecipes_tpu import config as _config  # noqa: F401  (enables x64)
from lsqrrecipes_tpu.config import EPS, SPHERE_EPS

__version__ = "0.1.0"

__all__ = ["EPS", "SPHERE_EPS", "__version__"]
