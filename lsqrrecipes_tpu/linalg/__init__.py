"""Batched linear algebra with the reference's degeneracy semantics.

TPU-native replacement for the reference's VNL kernel layer (``vnl_svd``,
``vnl_matrix_inverse``, ``vnl_symmetric_eigensystem``,
``vnl_levenberg_marquardt``).  Everything is batched over leading axes and
returns explicit validity/rank information instead of the reference's
empty-parameter-vector convention.
"""

from lsqrrecipes_tpu.linalg.lstsq import (
    masked_pinv_solve,
    nullvector,
    pinv_solve,
    svd_rank,
)
from lsqrrecipes_tpu.linalg.eig import eigvec_largest, eigvec_smallest
from lsqrrecipes_tpu.linalg.lm import LMConfig, LMResult, levenberg_marquardt

__all__ = [
    "pinv_solve",
    "masked_pinv_solve",
    "nullvector",
    "svd_rank",
    "eigvec_largest",
    "eigvec_smallest",
    "levenberg_marquardt",
    "LMConfig",
    "LMResult",
]
