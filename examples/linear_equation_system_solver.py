"""Robust dense linear system solving on the recorded outlier matrix
(mirrors ``examples/linearEquationSystemSolver.cxx``, which runs RANSAC
twice with different probabilities)."""

import os

from common import REFERENCE_EXAMPLE_DATA, banner, report

import jax
import jax.numpy as jnp

from lsqrrecipes_tpu.estimators import DenseLinearSystemEstimator
from lsqrrecipes_tpu.io import load_augmented_matrix
from lsqrrecipes_tpu.ransac import ransac, ransac_adaptive


def main():
    path = os.path.join(REFERENCE_EXAMPLE_DATA, "augmentedMatrixWithOutliers.txt")
    if not os.path.exists(path):
        print("example data not mounted; nothing to do")
        return
    data = jnp.asarray(load_augmented_matrix(path, 7))
    banner(f"Dense 6-unknown system, {data.shape[0]} equations (~30% outliers)")

    est = DenseLinearSystemEstimator(delta=1.0, n=6)
    ls_params, _ = est.lsq_fit(data)
    report("Least squares x", ls_params)

    result = ransac(est, data, jax.random.PRNGKey(1), num_hypotheses=8192)
    report("RANSAC (fixed budget) x", result.params)
    print(f"inlier fraction: {float(result.inlier_fraction):.3f}\n")

    result2 = ransac_adaptive(
        est, data, jax.random.PRNGKey(2), desired_probability=0.999
    )
    report("RANSAC (adaptive) x", result2.params)
    print(f"inlier fraction: {float(result2.inlier_fraction):.3f}")


if __name__ == "__main__":
    main()
