"""Geometric primitives: rotations, rigid transforms (frames), rays.

Replaces the reference's ``common/`` layer (``Point``, ``Vector``, ``Frame``,
``Ray3D``).  Points and vectors are plain ``jnp`` arrays with the trailing
axis as the coordinate axis; all functions are batched over leading axes and
safe under ``vmap``/``jit``.
"""

from lsqrrecipes_tpu.geometry import rotations
from lsqrrecipes_tpu.geometry.frame import Frame
from lsqrrecipes_tpu.geometry.ray import Ray3D

__all__ = ["rotations", "Frame", "Ray3D"]
