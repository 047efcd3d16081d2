"""shard_map-partitioned RANSAC: hypothesis x observation parallelism.

The scaling design from SURVEY.md sections 2.4/2.7 and BASELINE.json:

  * **Hypothesis axis** — minimal-sample hypotheses are embarrassingly
    parallel (the reference's serial outer loop, ``RANSAC.hxx:49``); the
    batch is sharded across the ``hypotheses`` mesh axis, each shard runs
    the same fused vmapped hypothesize+vote step on its slice.
  * **Observation axis** — the vote loop and every least-squares
    accumulation are reductions over observations (``RANSAC.hxx:94-99``,
    ``LineParametersEstimator.hxx:80-99``); observations are sharded across
    the ``data`` mesh axis and per-hypothesis inlier counts are
    ``psum``-reduced over it.  The consensus refit reduces estimator
    sufficient statistics (the J^T J / J^T r analogue) over the same axis.
  * **Selection** — the winning hypothesis is found with max/min collectives
    over the hypothesis axis (count pmax, lowest-rank tie-break, masked psum
    broadcast of the winner's parameters), matching the serial engine's
    first-best-wins selection.

The whole step — sampling gather, minimal fits, voting, selection, refit —
is ONE ``shard_map``-ped jitted program: no host round-trips, collectives
ride ICI.  For data sets that fit per-chip HBM (the common case) a
replicated copy of the observations serves the k-subset gathers; the
``data``-axis sharding is still what carries the vote/refit reductions, so
the same program scales to observation counts where the [B, n] agree matrix
— the actual memory hog — would not fit on one chip.
"""

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
import inspect


def _make_shard_map():
    try:
        from jax import shard_map as sm  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as sm
    params = inspect.signature(sm).parameters
    if "check_rep" in params:
        return lambda f, **kw: sm(f, check_rep=False, **kw)
    if "check_vma" in params:
        return lambda f, **kw: sm(f, check_vma=False, **kw)
    return sm


shard_map = _make_shard_map()

from lsqrrecipes_tpu.parallel.mesh import default_mesh
from lsqrrecipes_tpu.ransac.sampling import sample_k_subsets


class ShardedRansacResult(NamedTuple):
    params: jnp.ndarray           # refit parameters
    valid: jnp.ndarray            # bool
    best_count: jnp.ndarray       # int
    inlier_fraction: jnp.ndarray
    consensus: jnp.ndarray        # [n] bool


def _gather(data, idx):
    return jax.tree_util.tree_map(lambda a: a[idx], data)


def _select_broadcast(value, selected, axis):
    """Broadcast ``value`` from the shard where ``selected`` is True.

    Masked psum: exactly one shard contributes, all receive the winner.
    """
    contrib = jnp.where(selected, value, jnp.zeros_like(value))
    return jax.lax.psum(contrib, axis)


def build_sharded_ransac_step(
    est,
    mesh: Mesh,
    hypotheses_axis: str = "hypotheses",
    data_axis: Optional[str] = "data",
):
    """Compile-once sharded RANSAC step: ``(data, idx) -> ShardedRansacResult``.

    ``data`` leaves must be padded so the observation axis divides the
    ``data`` mesh axis; ``idx`` is the ``[B, k]`` hypothesis index batch with
    B divisible by the hypothesis axis size.
    """
    has_data_axis = data_axis is not None and data_axis in mesh.axis_names and (
        mesh.shape[data_axis] > 1
    )
    d_axis = data_axis if has_data_axis else None

    data_spec_sharded = P(d_axis) if d_axis else P()

    def step(idx_blk, data_repl, data_blk):
        params, valid = jax.vmap(est.minimal_fit)(_gather(data_repl, idx_blk))
        agree_blk = jax.vmap(lambda p: est.agree(p, data_blk))(params)
        counts = jnp.sum(agree_blk, axis=-1)
        if d_axis:
            counts = jax.lax.psum(counts, d_axis)
        counts = jnp.where(valid, counts, -1)

        # -- selection across the hypothesis axis --------------------------
        # all_gather the per-shard best counts and argmax replicated: ties
        # resolve to the lowest shard (the serial engine's first-best-wins),
        # and only sum all-reduces + all-gathers are needed (TPU AOT
        # lowering supports no min/max all-reduce).
        li = jnp.argmax(counts)
        local_max = counts[li]
        all_counts = jax.lax.all_gather(local_max, hypotheses_axis)
        winner_rank = jnp.argmax(all_counts)
        global_max = all_counts[winner_rank]
        my_rank = jax.lax.axis_index(hypotheses_axis)
        i_am_winner = my_rank == winner_rank

        best_mask_blk = (
            _select_broadcast(
                agree_blk[li].astype(jnp.int32), i_am_winner, hypotheses_axis
            )
            > 0
        )

        # -- consensus refit ----------------------------------------------
        if est.has_stats:
            stats = est.lsq_stats(data_blk, best_mask_blk)
            if d_axis:
                stats = jax.tree_util.tree_map(
                    lambda s: jax.lax.psum(s, d_axis), stats
                )
            final, ok = est.lsq_solve_stats(stats)
        else:
            if d_axis:
                mask_full = jax.lax.all_gather(
                    best_mask_blk, d_axis, tiled=True
                )
            else:
                mask_full = best_mask_blk
            final, ok = est.lsq_fit(data_repl, mask_full)

        ok = jnp.logical_and(ok, global_max > 0)
        return final, ok, global_max, best_mask_blk

    def make(data_tree):
        in_specs = (
            P(hypotheses_axis),                                       # idx
            jax.tree_util.tree_map(lambda _: P(), data_tree),         # replicated
            jax.tree_util.tree_map(lambda _: data_spec_sharded, data_tree),
        )
        out_specs = (P(), P(), P(), data_spec_sharded)
        return shard_map(
            step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        )

    @functools.partial(jax.jit)
    def run(data, idx):
        mapped = make(data)
        final, ok, best_count, consensus = mapped(idx, data, data)
        n = jax.tree_util.tree_leaves(data)[0].shape[0]
        return ShardedRansacResult(
            params=final,
            valid=ok,
            best_count=best_count,
            inlier_fraction=jnp.maximum(best_count, 0) / n,
            consensus=consensus,
        )

    return run


def sharded_ransac(
    est,
    data,
    key,
    num_hypotheses: int = 4096,
    mesh: Optional[Mesh] = None,
    hypotheses_axis: str = "hypotheses",
    data_axis: Optional[str] = "data",
) -> ShardedRansacResult:
    """One-call sharded RANSAC over ``mesh`` (defaults to all devices)."""
    mesh = mesh if mesh is not None else default_mesh()
    n = jax.tree_util.tree_leaves(data)[0].shape[0]
    h = mesh.shape[hypotheses_axis]
    b = -(-num_hypotheses // h) * h  # round up to a multiple of the axis
    idx = sample_k_subsets(key, n, est.k, b)
    step = build_sharded_ransac_step(est, mesh, hypotheses_axis, data_axis)
    return step(data, idx)


def sharded_lsq_fit(
    est,
    data,
    mask=None,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
):
    """Observation-sharded least squares via psum-reduced sufficient stats.

    The distributed analogue of ``leastSquaresEstimate`` for estimators with
    a stats decomposition; observations (and the mask) are sharded over
    ``data_axis`` and the stats pytree is ``psum``-reduced.
    """
    mesh = mesh if mesh is not None else default_mesh(("data",))
    n = jax.tree_util.tree_leaves(data)[0].shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)

    def step(data_blk, mask_blk):
        stats = est.lsq_stats(data_blk, mask_blk)
        stats = jax.tree_util.tree_map(lambda s: jax.lax.psum(s, data_axis), stats)
        return est.lsq_solve_stats(stats)

    in_specs = (
        jax.tree_util.tree_map(lambda _: P(data_axis), data),
        P(data_axis),
    )
    mapped = shard_map(
        step, mesh=mesh, in_specs=in_specs, out_specs=(P(), P())
    )
    return jax.jit(mapped)(data, mask)


def sharded_us_feature_lm(
    kind,
    data,
    x0,
    mask=None,
    config=None,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
):
    """Observation-sharded sufficient-statistics LM refit (US objectives).

    The feature Gram matrix ``H = sum_i w_i h_i h_i^T`` is ADDITIVE over
    observations, so the distributed refit is: ``psum`` the ``[F]``
    weighted feature sum (-> the global centering mean), center the local
    features, ``psum`` the per-shard partial CENTERED ``[F, F]`` Gram ->
    every shard runs the identical O(1)-per-iteration solve
    (:mod:`lsqrrecipes_tpu.linalg.stats_lm`) on the replicated stats.
    Centering on features before the Gram is built matches the local
    ``_centered_problem`` precision (the one-psum raw-Gram congruence,
    ``stats_lm.centered_from_gram``, re-introduces an eps*(raw-scale)
    perturbation at Gram-build time).  This realizes SURVEY §2.7's
    "J^T J / J^T r partials psum-reduced" for the reference's heaviest LM
    use (``SinglePointTarget...cxx:272-297``) with per-refit communication
    independent of BOTH the observation count and the iteration count —
    two psums, 42 to 992 doubles total.  Returns a replicated
    :class:`~lsqrrecipes_tpu.linalg.lm.LMResult`.
    """
    mesh = mesh if mesh is not None else default_mesh(("data",))
    n = jax.tree_util.tree_leaves(data)[0].shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    run = build_sharded_us_feature_lm(
        kind, x0, config=config, mesh=mesh, data_axis=data_axis,
        data_tree=data,
    )
    return run(data, mask)


def build_sharded_us_feature_lm(
    kind,
    x0,
    config=None,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    data_tree=None,
):
    """Compile-once builder behind :func:`sharded_us_feature_lm`.

    Returns the jitted ``(data, mask) -> LMResult`` step (lowerable via
    ``.lower(...)`` — the collective-audit test inspects its HLO).
    ``data_tree`` is REQUIRED: a pytree with the data's structure (the
    actual arrays work) from which the per-leaf sharding specs are built —
    without it the specs would silently replicate the data while the mask
    stays sharded, failing deep inside the solve with a shape error.
    """
    from lsqrrecipes_tpu.linalg import stats_lm
    from lsqrrecipes_tpu.linalg.lm import LMConfig, LMResult

    if data_tree is None:
        raise ValueError(
            "build_sharded_us_feature_lm needs data_tree (a pytree with "
            "the data's structure) to build the input sharding specs"
        )
    if config is None:
        config = LMConfig()
    mesh = mesh if mesh is not None else default_mesh(("data",))
    w_fn, _, feats_fn, const_idx = stats_lm._OBJECTIVES[kind]

    def step(data_blk, mask_blk):
        h = feats_fn(data_blk)
        wts = mask_blk.astype(h.dtype)
        # Global mask-weighted feature mean: the constant feature is 1, so
        # the weight total is the psummed sum's const entry — one [F] psum.
        s = jax.lax.psum(wts @ h, data_axis)
        m = s / jnp.maximum(s[const_idx], 1.0)
        m = m.at[const_idx].set(0.0)
        hc = h - m[None, :] * h[:, const_idx:const_idx + 1]
        gram = jax.lax.psum(
            jnp.einsum("ni,nj,n->ij", hc, hc, wts), data_axis
        )

        def w_fn_c(x):
            w = w_fn(x)
            return w.at[:, const_idx].add(w @ m)

        return stats_lm.feature_lm(w_fn_c, gram, x0, config)

    in_specs = (
        jax.tree_util.tree_map(lambda _: P(data_axis), data_tree),
        P(data_axis),
    )
    mapped = shard_map(
        step, mesh=mesh, in_specs=in_specs,
        out_specs=jax.tree_util.tree_map(lambda _: P(), LMResult(0, 0, 0, 0)),
    )
    return jax.jit(mapped)
