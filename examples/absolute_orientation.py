"""Absolute orientation with exhaustive RANSAC
(mirrors ``examples/AbsoluteOrientation.cxx``, which uses the
all-subsets variant for its small data set)."""

from common import banner, report

import jax.numpy as jnp

from lsqrrecipes_tpu.estimators import AbsoluteOrientationEstimator
from lsqrrecipes_tpu.geometry import Frame
from lsqrrecipes_tpu.ransac import ransac_exhaustive
from lsqrrecipes_tpu.utils import RandomNumberGenerator


def main():
    rng = RandomNumberGenerator(5)
    q = rng.normal(shape=(4,))
    q = q / jnp.linalg.norm(q)
    frame = Frame.from_quaternion(q, rng.uniform(-100, 100, (3,)))

    first = rng.uniform(-100, 100, (12, 3))
    second = frame.apply(first) + rng.normal(0.5, shape=(12, 3))
    # Two gross outlier correspondences.
    second = second.at[:2].add(100.0)

    banner("Absolute orientation (10 good pairs + 2 outliers, exhaustive RANSAC)")
    report("Known quaternion [s, x, y, z]", frame.quaternion())
    report("Known translation", frame.t)

    est = AbsoluteOrientationEstimator(delta=3.0)
    ls_params, _ = est.lsq_fit((first, second))
    report("Least squares [q, t]", ls_params)

    result = ransac_exhaustive(est, (first, second))
    report("Exhaustive RANSAC [q, t]", result.params)
    print(f"inlier fraction: {float(result.inlier_fraction):.3f}")


if __name__ == "__main__":
    main()
