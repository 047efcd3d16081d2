"""Batched RANSAC engine (see :mod:`lsqrrecipes_tpu.ransac.engine`)."""

from lsqrrecipes_tpu.ransac.engine import (
    RansacResult,
    consensus_refit,
    hypothesize_and_vote,
    ransac,
    ransac_adaptive,
    ransac_batched,
    ransac_exhaustive,
    ransac_fused_sweep,
    ransac_structured,
)
from lsqrrecipes_tpu.ransac.sampling import (
    choose,
    num_tries,
    sample_k_subsets,
    sample_k_subsets_chunked,
)

__all__ = [
    "RansacResult",
    "ransac",
    "ransac_adaptive",
    "ransac_batched",
    "ransac_exhaustive",
    "ransac_fused_sweep",
    "ransac_structured",
    "hypothesize_and_vote",
    "consensus_refit",
    "sample_k_subsets",
    "sample_k_subsets_chunked",
    "num_tries",
    "choose",
]
