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
    interpret=None,
):
    """Whole-sweep fused RANSAC over a mesh.

    ``data`` is the family's native data (point array, Frame batch, ...).
    ``total_groups`` is the GLOBAL budget; each of the H shards runs
    ``ceil(total_groups / H)`` groups with an independent key.  Returns
    ``(best_count int32[], best_params f32[n_param_rows])`` — replicated.
    ``interpret`` runs the Pallas kernel in interpret mode (CPU meshes).
    """
    mesh = mesh if mesh is not None else default_mesh((hypotheses_axis,))
    h = mesh.shape[hypotheses_axis]
    groups_per_shard = -(-total_groups // h)

    def shard_fn(shard_data):
        rank = jax.lax.axis_index(hypotheses_axis)
        shard_key = jax.random.fold_in(key, rank)
        count, params = fs.fused_sweep(
            family, shard_data, shard_key, groups_per_shard, delta,
            vote_subsample=vote_subsample, interpret=interpret,
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


def sharded_us_sweep(
    kind: str,
    est,
    data,
    key,
    groups: int,
    mesh: Optional[Mesh] = None,
    hypotheses_axis: str = "hypotheses",
):
    """Hypothesis-axis sharded US-calibration structured sweep.

    The reference RANSACs all three US calibrations in its examples
    (``crosswireUSCalibration.cxx:73``, ``pointerUSCalibration.cxx:84``,
    ``planeUSCalibration.cxx:74``); this scales their batched
    hypothesize+vote step (``ops.us_fast.structured_sweep``) across a mesh:
    the planar ``[k, F, B]`` sampling planes shard on B (whole groups per
    shard), the per-element vote features (tiny, ``[n, K]``) replicate, and
    each shard runs the identical fit+vote program on its slice — zero
    cross-shard communication until the caller reduces the counts.

    Evaluates the IDENTICAL hypothesis set as the single-device
    ``est.structured_sweep(data, key, groups)``; returns
    ``(counts int32[B], params [B, P])`` sharded over the hypothesis axis.
    ``groups`` must be divisible by the axis size.
    """
    from lsqrrecipes_tpu.ops import us_fast

    mesh = mesh if mesh is not None else default_mesh((hypotheses_axis,))
    h = mesh.shape[hypotheses_axis]
    if groups % h:
        raise ValueError(
            f"groups ({groups}) must be divisible by the "
            f"'{hypotheses_axis}' axis size ({h})"
        )
    planes, feats = us_fast.build_sampling_planes(kind, data, key, groups)
    n = feats.shape[0]
    bsz = planes.shape[-1]
    b_shard = bsz // h
    chunk = us_fast._chunk_size(b_shard, n, us_fast._KINDS[kind][1])
    padded = -(-b_shard // chunk) * chunk
    delta_sq = float(est.delta_squared)

    def shard_fn(planes_blk, feats_repl):
        blk = planes_blk
        if padded != b_shard:
            blk = jnp.concatenate(
                [blk, blk[..., : padded - b_shard]], axis=-1
            )
        counts, params = us_fast._fit_and_vote_planes(
            kind, delta_sq, chunk, blk, feats_repl
        )
        return counts[:b_shard], params[:b_shard]

    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(None, None, hypotheses_axis), P()),
        out_specs=(P(hypotheses_axis), P(hypotheses_axis)),
    )
    return jax.jit(mapped)(planes, feats)
