"""Loaders for the reference's experimental data formats.

File formats (observed, ``/root/reference/testing/Data``):
  * ``pivotCalibrationData.txt`` — one tracked pose per line as
    ``x y z qx qy qz qs`` (scalar-last quaternion; see the reader in
    ``testing/PivotCalibrationParametersEstimatorTest.cxx:23-34``).
  * ``augmentedMatrix.txt`` — whitespace-separated rows ``[a_0..a_{n-1} b]``.
  * ``crossWirePhantomTransformations.txt`` — 3 lines per frame, each line
    ``r0 r1 r2 t`` (a row of ``[R | t]``); paired with
    ``crossWirePhantom2DPoints.txt`` — ``u v`` per line
    (``testing/SinglePointTargetUSCalibrationParametersEstimatorTest.cxx:115-166``).

Parsing uses the native text-parser when built (:mod:`lsqrrecipes_tpu.io`
native extension, ``native/fastload.cpp``) and falls back to numpy.
"""

import numpy as np

from lsqrrecipes_tpu.geometry.frame import Frame


def _parse_floats(path):
    try:
        from lsqrrecipes_tpu.io import _native  # optional: native/build.sh

        raw = _native.parse_floats_raw(str(path))
        return np.frombuffer(raw, dtype=np.float64)
    except ImportError:
        with open(path) as f:
            return np.array(f.read().split(), dtype=np.float64)


def load_augmented_matrix(path, n_cols):
    """-> float64 ``[rows, n_cols]`` (last column is b)."""
    flat = np.asarray(_parse_floats(path), dtype=np.float64)
    return flat.reshape(-1, n_cols)


def load_tracked_frames(path):
    """Pivot-calibration format ``x y z qx qy qz qs`` -> batched Frame."""
    rows = np.asarray(_parse_floats(path), dtype=np.float64).reshape(-1, 7)
    t = rows[:, :3]
    # Reorder to scalar-first [s, qx, qy, qz].
    q = np.concatenate([rows[:, 6:7], rows[:, 3:6]], axis=1)
    return Frame.from_quaternion(q, t)


def load_crosswire_phantom(transforms_path, points_path):
    """-> ``(Frame[n], points2d[n, 2])`` for the crosswire US data."""
    rows = np.asarray(
        _parse_floats(transforms_path), dtype=np.float64
    ).reshape(-1, 3, 4)
    frames = Frame(rows[:, :, :3], rows[:, :, 3])
    pts = np.asarray(_parse_floats(points_path), dtype=np.float64).reshape(-1, 2)
    return frames, pts
