"""Multi-chip whole-sweep fused RANSAC: the Pallas fast path over a mesh.

Scales :mod:`lsqrrecipes_tpu.ops.fused_sweep` across the ``hypotheses`` mesh
axis: every shard runs the ENTIRE-sweep kernel on its (replicated) point set
with a rank-folded PRNG key — so shards evaluate disjoint, independently
permuted hypothesis sets — and the winner is selected with collectives:

  * ``all_gather`` of the per-shard best counts + replicated argmax (ties
    resolve to the lowest shard rank; the axon AOT compiler lowers only Sum
    all-reduces, so no pmax — see ``parallel/sharded.py``),
  * masked ``psum`` broadcast of the winning shard's parameter vector.

Per-sweep communication is ONE scalar all-gather and one [P]-vector psum —
the hypothesis work (total_groups * n fits + votes) never leaves the shard,
so scaling efficiency across chips is limited only by the final collective
(microseconds) and stragglers.  This is the scaling design of SURVEY.md
sections 2.4/2.7 applied to the flagship single-chip path.

Observation sharding is intentionally NOT combined with this kernel: the
fused sweep exists precisely because n points fit comfortably in VMEM; for
observation sets beyond per-chip HBM use ``parallel.sharded.sharded_ransac``
(psum vote reduction over the data axis).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lsqrrecipes_tpu.ops import fused_sweep as fs
from lsqrrecipes_tpu.parallel.mesh import default_mesh
from lsqrrecipes_tpu.parallel.sharded import shard_map


def sharded_fused_sweep(
    family: str,
    data,
    key,
    total_groups: int,
    delta: float,
    mesh: Optional[Mesh] = None,
    hypotheses_axis: str = "hypotheses",
    vote_subsample: int = 0,
):
    """Whole-sweep fused RANSAC over a mesh.

    ``data`` is the family's native data (point array, Frame batch, ...).
    ``total_groups`` is the GLOBAL budget; each of the H shards runs
    ``ceil(total_groups / H)`` groups with an independent key.  Returns
    ``(best_count int32[], best_params f32[n_param_rows])`` — replicated.
    """
    mesh = mesh if mesh is not None else default_mesh((hypotheses_axis,))
    h = mesh.shape[hypotheses_axis]
    groups_per_shard = -(-total_groups // h)

    def shard_fn(shard_data):
        rank = jax.lax.axis_index(hypotheses_axis)
        shard_key = jax.random.fold_in(key, rank)
        count, params = fs.fused_sweep(
            family, shard_data, shard_key, groups_per_shard, delta,
            vote_subsample=vote_subsample,
        )
        all_counts = jax.lax.all_gather(count, hypotheses_axis)
        winner = jnp.argmax(all_counts)          # lowest rank wins ties
        best = all_counts[winner]
        contrib = jnp.where(rank == winner, params, jnp.zeros_like(params))
        best_params = jax.lax.psum(contrib, hypotheses_axis)
        return best, best_params

    in_specs = (jax.tree_util.tree_map(lambda _: P(), data),)
    mapped = shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=(P(), P())
    )
    data32 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), data
    )
    return jax.jit(mapped)(data32)
