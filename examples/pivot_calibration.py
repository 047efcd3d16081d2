"""Pivot calibration on the recorded outlier data set
(mirrors ``examples/pivotCalibration.cxx``)."""

import os

from common import REFERENCE_EXAMPLE_DATA, banner, report

import jax

from lsqrrecipes_tpu.estimators import PivotCalibrationEstimator
from lsqrrecipes_tpu.io import load_tracked_frames
from lsqrrecipes_tpu.ransac import ransac


def main():
    path = os.path.join(REFERENCE_EXAMPLE_DATA, "pivotCalibrationDataWithOutliers.txt")
    if not os.path.exists(path):
        print("example data not mounted; nothing to do")
        return
    frames = load_tracked_frames(path)
    banner(f"Pivot calibration on {frames.t.shape[0]} tracked poses (~30% outliers)")

    est = PivotCalibrationEstimator(delta=1.0)
    ls_params, _ = est.lsq_fit(frames)
    report("Least squares [t_DRF, t_W]", ls_params)

    result = ransac(est, frames, jax.random.PRNGKey(1), num_hypotheses=4096)
    report("RANSAC [t_DRF, t_W]", result.params)
    print(f"RANSAC inlier fraction: {float(result.inlier_fraction):.3f}")


if __name__ == "__main__":
    main()
