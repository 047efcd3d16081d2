"""Multi-chip / multi-host scaling layer.

The reference is single-threaded C++ (SURVEY.md section 2.4: no threads,
processes, or IPC anywhere); this layer is the TPU-native capability the
reference never had, built the way BASELINE.json specifies: a
``jax.sharding.Mesh`` with named hypothesis/data axes, ``shard_map``
partitioning of RANSAC hypothesis batches and observation blocks, ``psum``
reductions of per-hypothesis inlier counts and of least-squares sufficient
statistics (the J^T J / J^T r analogue), and argmax collectives for
best-model selection.  Multi-host entry via :func:`initialize_distributed`.
"""

from lsqrrecipes_tpu.parallel.mesh import (
    default_mesh,
    initialize_distributed,
)
from lsqrrecipes_tpu.parallel.fused import sharded_fused_sweep, sharded_us_sweep
from lsqrrecipes_tpu.parallel.sharded import (
    ShardedRansacResult,
    sharded_lsq_fit,
    sharded_ransac,
)

__all__ = [
    "default_mesh",
    "initialize_distributed",
    "sharded_ransac",
    "sharded_fused_sweep",
    "sharded_us_sweep",
    "sharded_lsq_fit",
    "ShardedRansacResult",
]
