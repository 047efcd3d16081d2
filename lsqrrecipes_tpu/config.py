"""Global numeric configuration.

The reference library is double-precision C++ with a single global epsilon
used for every rank/degeneracy decision (``common/Epsilon.h:19``:
EPS = DBL_EPSILON = 2.220446049250313e-16).  We reproduce that here and
enable x64 in JAX process-wide: parity with the reference's tolerances
(LM tolerances of 1e-15, golden values at 1mm) is unreachable in f32.

Throughput-oriented code paths may still explicitly request float32.
"""

import jax

jax.config.update("jax_enable_x64", True)

# common/Epsilon.h:19 — DBL_EPSILON, used to zero out singular values before
# rank decisions everywhere in the reference.
EPS: float = 2.220446049250313e-16

# parametersEstimators/SphereParametersEstimator.hxx:11 — singularity gate on
# the determinant of the minimal-sample linear system.
SPHERE_EPS: float = 1e-9

# common/Frame.cxx:7-12 — constants used by the rotation-representation code
# and the gimbal-zone guards of every Euler extraction.
SMALL_ANGLE: float = 0.008726535498373935  # 0.5 degrees in radians
HALF_PI: float = 1.5707963267948966192313216916398
