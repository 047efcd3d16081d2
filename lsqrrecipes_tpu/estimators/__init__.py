"""Estimator suite.

Each module provides a batched, masked, functional estimator mirroring one of
the reference's 11 concrete ``ParametersEstimator`` subclasses
(``parametersEstimators/``); see SURVEY.md section 2.2 for the inventory.
"""

from lsqrrecipes_tpu.estimators.base import Estimator, get, names, register
from lsqrrecipes_tpu.estimators.line2d import Line2DEstimator
from lsqrrecipes_tpu.estimators.line import LineEstimator
from lsqrrecipes_tpu.estimators.plane import PlaneEstimator
from lsqrrecipes_tpu.estimators.sphere import (
    ALGEBRAIC,
    GEOMETRIC,
    SphereEstimator,
)
from lsqrrecipes_tpu.estimators.dense_linear import DenseLinearSystemEstimator
from lsqrrecipes_tpu.estimators.ray_intersection import RayIntersectionEstimator
from lsqrrecipes_tpu.estimators.absolute_orientation import (
    AbsoluteOrientationEstimator,
)
from lsqrrecipes_tpu.estimators.pivot_calibration import PivotCalibrationEstimator
from lsqrrecipes_tpu.estimators.us_calibration import (
    CrosswireUSCalibrationEstimator,
    PlanePhantomUSCalibrationEstimator,
    PointerUSCalibrationEstimator,
)

__all__ = [
    "CrosswireUSCalibrationEstimator",
    "PointerUSCalibrationEstimator",
    "PlanePhantomUSCalibrationEstimator",
    "Estimator",
    "register",
    "get",
    "names",
    "Line2DEstimator",
    "LineEstimator",
    "PlaneEstimator",
    "SphereEstimator",
    "ALGEBRAIC",
    "GEOMETRIC",
    "DenseLinearSystemEstimator",
    "RayIntersectionEstimator",
    "AbsoluteOrientationEstimator",
    "PivotCalibrationEstimator",
]
