"""Symmetric eigensystem helpers.

``jnp.linalg.eigh`` returns eigenvalues in ascending order, matching
``vnl_symmetric_eigensystem`` (used by the line/plane/Horn estimators, e.g.
``LineParametersEstimator.hxx:102-108``,
``AbsoluteOrientationParametersEstimator.cxx:192-198``).
"""

import jax.numpy as jnp


def eigvec_smallest(a):
    """Unit eigenvector of the smallest eigenvalue of symmetric ``a[..., n, n]``."""
    _, v = jnp.linalg.eigh(a)
    return v[..., :, 0]


def eigvec_largest(a):
    """Unit eigenvector of the largest eigenvalue of symmetric ``a[..., n, n]``."""
    _, v = jnp.linalg.eigh(a)
    return v[..., :, -1]
