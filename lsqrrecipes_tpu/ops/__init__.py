"""Pallas TPU kernels for the hot ops.

The framework's compute hot spots are (a) the RANSAC vote — O(B x n)
distance evaluations per step (the reference's inner loop,
``RANSAC.hxx:94-99``) — and (b) the LM normal-equation assembly.  XLA fuses
much of this; the Pallas kernels here pin down the remaining HBM round trips
(the [B, n] distance/agree intermediates) by fusing matmul + epilogue +
reduction in VMEM.
"""

from lsqrrecipes_tpu.ops.vote import (
    pallas_available,
    plane_vote_counts,
    sphere_vote_counts,
)

__all__ = ["sphere_vote_counts", "plane_vote_counts", "pallas_available"]
