"""Massively batched RANSAC.

TPU-native redesign of ``parametersEstimators/RANSAC.{h,hxx}``.  The
reference evaluates hypotheses one at a time in a data-dependent loop
(``RANSAC.hxx:49-117``: draw subset, exact fit, early-exit vote count,
adaptive iteration budget, final consensus refit).  Here:

  * a fixed batch of hypotheses is drawn up front with counter-based
    ``jax.random`` (reproducible — unlike the reference's
    ``srand(time(NULL))``, ``RANSAC.hxx:44``),
  * minimal fits are vmapped; degenerate samples become ``valid=False``
    lanes (the empty-parameter-vector convention, ``RANSAC.hxx:87-88``)
    whose vote count is forced to -1 so they can never win selection,
  * votes are one ``[B, n]`` fused compare+reduce (the reference's
    early-exit inner loop ``RANSAC.hxx:94-99`` is pure serial-CPU tuning
    and is dropped),
  * the best hypothesis is an argmax; ties resolve to the lowest index
    (the reference keeps the *first* strictly-better hypothesis —
    identical selection given equal ordering),
  * the final refit reuses the estimator's masked least squares
    (``RANSAC.hxx:128-139``).

Three drivers mirror the reference API:
  * :func:`ransac` — fixed hypothesis budget, single fused device step.
  * :func:`ransac_adaptive` — host-side loop that re-evaluates the
    ``log(1-p)/log(1-w^k)`` budget (``RANSAC.hxx:100-111``) between
    device-sized rounds.
  * :func:`ransac_exhaustive` — all C(n, k) subsets, batched
    (``RANSAC.hxx:149-248``).
"""

import functools
import itertools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lsqrrecipes_tpu.ransac.sampling import (
    choose,
    num_tries,
    sample_k_subsets,
    sample_k_with_replacement,
    structured_samples,
)

# Above this many [B, n] cells, exact distinct-subset sampling (which draws
# a [B, n] uniform matrix) is replaced by with-replacement sampling whose
# rare duplicate rows self-mask as degenerate hypotheses.
_EXACT_SAMPLING_CELLS = 1 << 24


def _sample(key, n, k, num_hypotheses, sampler="auto"):
    if sampler == "auto":
        sampler = (
            "with_replacement" if num_hypotheses * n > _EXACT_SAMPLING_CELLS else "exact"
        )
    if sampler == "exact":
        return sample_k_subsets(key, n, k, num_hypotheses)
    return sample_k_with_replacement(key, n, k, num_hypotheses)


class RansacResult(NamedTuple):
    params: jnp.ndarray           # [P] refit parameters (garbage if not valid)
    valid: jnp.ndarray            # [] bool
    inlier_fraction: jnp.ndarray  # [] best consensus size / n
    consensus: jnp.ndarray        # [n] bool mask of the winning consensus set
    best_count: jnp.ndarray       # [] int
    minimal_params: jnp.ndarray   # [P_min] winning minimal-fit parameters


def _gather(data, idx):
    return jax.tree_util.tree_map(lambda a: a[idx], data)


@functools.partial(jax.jit, static_argnums=(0,))
def hypothesize_and_vote(est, data, idx):
    """Evaluate one batch of minimal-sample hypotheses.

    idx: ``int32[B, k]`` -> ``(best_count, best_mask[n], best_params)`` for
    this batch.  Fused: sample gather, vmapped minimal fit, vectorized agree,
    vote reduction, argmax selection all compile into one XLA program.

    Estimators may provide ``vote_counts(params[B, P], data) -> int[B]`` —
    typically a matmul-structured formulation that keeps the inlier test on
    the MXU and reduces in-register; only the *winning* hypothesis's [n]
    agree mask is then materialized, never the [B, n] matrix.
    """
    params, valid = jax.vmap(est.minimal_fit)(_gather(data, idx))
    if hasattr(est, "vote_counts"):
        counts = est.vote_counts(params, data)
        counts = jnp.where(valid, counts, -1)
        best = jnp.argmax(counts)
        best_mask = est.agree(params[best], data)
        return counts[best], best_mask, params[best]
    agree = jax.vmap(lambda p: est.agree(p, data))(params)
    counts = jnp.where(valid, jnp.sum(agree, axis=-1), -1)
    best = jnp.argmax(counts)
    return counts[best], agree[best], params[best]


@functools.partial(jax.jit, static_argnums=(0,))
def consensus_refit(est, data, mask):
    return est.lsq_fit(data, mask)


@functools.partial(jax.jit, static_argnums=(0, 3))
def hypothesize_and_vote_structured(est, data, key, groups):
    """Gather-free variant of :func:`hypothesize_and_vote`.

    Builds ``groups * n`` hypotheses with
    :func:`~lsqrrecipes_tpu.ransac.sampling.structured_samples` (permutation
    + rolls — no [B, k] gather, no per-index threefry), then fits and votes.
    Estimators may provide hooks, in priority order:

      * ``structured_sweep(data, key, groups) -> (counts[B], params[B, P])``
        — owns its own (equivalent) sampling, so the sample pytree is never
        materialized (e.g. the US-calibration planar-lane path);
      * ``fit_and_vote(samples, data) -> (counts[B], params[B, P])`` — fully
        fused fit+vote on materialized samples;
      * otherwise the vmapped minimal fit + ``vote_counts`` path runs.
    """
    if hasattr(est, "structured_sweep"):
        counts, params = est.structured_sweep(data, key, groups)
    else:
        samples = structured_samples(key, data, est.k, groups)
        if hasattr(est, "fit_and_vote"):
            counts, params = est.fit_and_vote(samples, data)
        else:
            params, valid = jax.vmap(est.minimal_fit)(samples)
            if hasattr(est, "vote_counts"):
                counts = est.vote_counts(params, data)
            else:
                counts = jax.vmap(lambda p: jnp.sum(est.agree(p, data)))(params)
            counts = jnp.where(valid, counts, -1)
    best = jnp.argmax(counts)
    best_params = params[best]
    best_mask = est.agree(best_params, data)
    return counts[best], best_mask, best_params


def ransac_structured(
    est, data, key, num_hypotheses: int = 4096
) -> RansacResult:
    """RANSAC with structured (permutation + roll) sampling — the fastest
    single-chip path at large hypothesis budgets."""
    n = _data_size(data)
    if n < est.k:
        return _invalid_result(est, n)
    groups = max(1, -(-num_hypotheses // n))
    best_count, best_mask, best_params = hypothesize_and_vote_structured(
        est, data, key, groups
    )
    return _finalize(est, data, best_count, best_mask, best_params, n)


def ransac_fused_sweep(
    est,
    data,
    key,
    num_hypotheses: int = 4096,
    groups_per_step: int = 1,
    vote_subsample: int = 0,
) -> RansacResult:
    """Fastest single-chip path: the ENTIRE sweep as one Pallas kernel with
    in-kernel best accumulation (:mod:`lsqrrecipes_tpu.ops.fused_sweep`).

    Available when the estimator declares a ``fused_family`` (3D sphere /
    plane / line, 2D line, ray intersection, absolute orientation, pivot
    calibration, 6-unknown dense linear system); falls back to
    :func:`ransac_structured` for non-fused estimators or data layouts.
    Any observation count is accepted: sampling planes replicate the data up
    to the next ``128 * 2^k`` width (a slight sampling-frequency bias toward
    the duplicated prefix — documented deviation), while the vote always runs
    against the original observations with guarded padding, so inlier counts
    stay exact.
    """
    from lsqrrecipes_tpu.ops import fused_sweep as fs

    family = getattr(est, "fused_family", None)
    n = _data_size(data)
    if n < est.k:
        return _invalid_result(est, n)
    if not (family and fs.supports_data(family, data)):
        return ransac_structured(est, data, key, num_hypotheses)
    total_groups = max(1, -(-num_hypotheses // n))
    delta_arg = getattr(est, "fused_delta", None) or est.delta
    count, params = fs.fused_sweep(
        family, data, key, total_groups, delta_arg,
        groups_per_step=groups_per_step, vote_subsample=vote_subsample,
    )
    best_params = jnp.asarray(params, jax.tree_util.tree_leaves(data)[0].dtype)
    best_mask = est.agree(best_params, data)
    # The kernel's count comes from the f32/bf16 band vote and can disagree
    # with est.agree by a few border points on-chip (and, with
    # vote_subsample, counts only the ranking subsample); the kernel count is
    # used for selection only — report the exact consensus size.
    count = jnp.sum(best_mask)
    return _finalize(est, data, count, best_mask, best_params, n)


def _data_size(data):
    return jax.tree_util.tree_leaves(data)[0].shape[0]


def _finalize(est, data, best_count, best_mask, best_params, n):
    ok = int(best_count) > 0
    if ok:
        params, valid = consensus_refit(est, data, best_mask)
    else:
        params = jnp.zeros((getattr(est, "nparams_lsq", est.nparams),))
        valid = jnp.asarray(False)
    return RansacResult(
        params=params,
        valid=jnp.logical_and(valid, ok),
        inlier_fraction=jnp.asarray(max(int(best_count), 0) / n),
        consensus=best_mask,
        best_count=jnp.asarray(int(best_count)),
        minimal_params=best_params,
    )


def ransac(est, data, key, num_hypotheses: int = 4096, sampler: str = "auto") -> RansacResult:
    """Fixed-budget batched RANSAC (the TPU-native default).

    Draws ``num_hypotheses`` minimal subsets at once and performs one fused
    hypothesize+vote+select step, then the consensus refit.  Equivalent to
    running the reference's probabilistic variant with a pre-committed
    iteration budget; choose the budget via
    :func:`lsqrrecipes_tpu.ransac.sampling.num_tries` with a worst-case
    inlier fraction, or just oversample — hypotheses are cheap on TPU.
    """
    n = _data_size(data)
    if n < est.k:
        return _invalid_result(est, n)
    idx = _sample(key, n, est.k, num_hypotheses, sampler)
    best_count, best_mask, best_params = hypothesize_and_vote(est, data, idx)
    return _finalize(est, data, best_count, best_mask, best_params, n)


def ransac_batched(
    est, data, keys, num_hypotheses: int = 4096
) -> RansacResult:
    """Fleet RANSAC: D independent datasets solved in ONE XLA program.

    ``data``: the estimator's pytree with an extra leading dataset axis
    ``[D, n, ...]`` (equal n — pad with replicated observations otherwise);
    ``keys``: ``[D]`` PRNG keys.  Returns a :class:`RansacResult` whose
    fields all carry the leading ``[D]`` axis.  The per-dataset pipeline is
    the structured hypothesize+vote (including the estimators'
    ``structured_sweep`` / ``fit_and_vote`` fast paths — all XLA, so the
    whole fleet vmaps) followed by a masked consensus refit; for the
    ITERATIVE estimators that refit is D Levenberg-Marquardt solves
    advancing in lockstep.  No reference analogue (the C++ library is
    strictly one problem per call); this is the batch-serving entry point
    — e.g. calibrating a fleet of US probes in one device program.

    Note: estimators whose ``vote_counts`` dispatches to a Pallas kernel
    (3D sphere, f32, B % 512 == 0) rely on ``pallas_call``'s vmap batching
    rule on TPU (chip-verified, ``scripts/chip_check.py`` fleet section);
    everything else lowers to plain batched XLA.
    """
    n = _data_size(jax.tree_util.tree_map(lambda a: a[0], data))
    if n < est.k:
        raise ValueError(f"need at least k={est.k} observations per dataset")
    groups = max(1, -(-num_hypotheses // n))

    @functools.partial(jax.jit, static_argnums=())
    def fleet(data, keys):
        def one(data_d, key_d):
            count, mask, params = hypothesize_and_vote_structured(
                est, data_d, key_d, groups
            )
            refit, rvalid = est.lsq_fit(data_d, mask)
            ok = count > 0
            return RansacResult(
                params=refit,
                valid=jnp.logical_and(rvalid, ok),
                inlier_fraction=jnp.maximum(count, 0) / n,
                consensus=mask,
                best_count=count,
                minimal_params=params,
            )

        return jax.vmap(one)(data, keys)

    return fleet(data, keys)


def _round_fast(est, data, key, groups):
    """One adaptive round through the fast paths: the fused Pallas sweep
    when the estimator declares a supported ``fused_family``, otherwise the
    structured (gather-free) hypothesize+vote.  Returns the same
    ``(count, mask[n], params)`` contract as :func:`hypothesize_and_vote`;
    the fused count is recomputed exactly from the winner's agree mask
    (the in-kernel band vote is selection-only, see
    :func:`ransac_fused_sweep`)."""
    from lsqrrecipes_tpu.ops import fused_sweep as fs

    family = getattr(est, "fused_family", None)
    if family and fs.supports_data(family, data):
        delta_arg = getattr(est, "fused_delta", None) or est.delta
        _, params = fs.fused_sweep(family, data, key, groups, delta_arg)
        params = jnp.asarray(
            params, jax.tree_util.tree_leaves(data)[0].dtype
        )
        mask = est.agree(params, data)
        return jnp.sum(mask), mask, params
    return hypothesize_and_vote_structured(est, data, key, groups)


def ransac_adaptive(
    est,
    data,
    key,
    desired_probability: float = 0.999,
    batch_size: int = 1024,
    max_hypotheses: int = 1 << 20,
    path: str = "auto",
) -> RansacResult:
    """Adaptive-budget RANSAC: device-sized rounds, host-side budget update.

    Mirrors the reference's adaptive loop (``RANSAC.hxx:100-111``): after
    each round the iteration budget is recomputed from the best inlier
    fraction seen so far; rounds stop once the number of evaluated
    hypotheses covers the budget (or all C(n, k) subsets).

    ``path``: ``"auto"`` (default) runs each device round through the fast
    paths — the whole-round fused Pallas sweep where the estimator has one,
    else the gather-free structured sweep — so adaptive mode keeps the
    fixed-budget mode's per-round throughput; ``"gather"`` forces the
    faithful ``[B, k]``-gather rounds (the parity path).

    Documented deviation (README "Documented deviations"): under ``"auto"``
    the hypotheses within one round share a single data permutation, so the
    ``num_tries`` budget's independent-draw assumption holds only
    approximately per round; pass ``path="gather"`` for the reference's
    exact adaptive semantics.
    """
    n = _data_size(data)
    if n < est.k:
        return _invalid_result(est, n)
    if not (0.0 < desired_probability < 1.0):
        return _invalid_result(est, n)

    use_fast = path != "gather" and (
        hasattr(est, "structured_sweep")
        or hasattr(est, "fit_and_vote")
        or getattr(est, "fused_family", None)
    )

    all_tries = min(choose(n, est.k), max_hypotheses)
    budget = all_tries
    evaluated = 0
    best_count = -1
    best_mask = jnp.zeros((n,), bool)
    best_params = None

    while evaluated < budget:
        key, sub = jax.random.split(key)
        if use_fast:
            groups = max(1, min(-(-batch_size // n), -(-(budget - evaluated) // n)))
            count, mask, params = _round_fast(est, data, sub, groups)
            evaluated += groups * n
        else:
            b = min(batch_size, budget - evaluated)
            # "auto" switches to O(b*k)-memory with-replacement sampling at
            # large b*n (duplicate rows self-mask as degenerate), same as
            # the fixed-budget driver.
            idx = _sample(sub, n, est.k, b, "auto")
            count, mask, params = hypothesize_and_vote(est, data, idx)
            evaluated += b
        if int(count) > best_count:
            best_count, best_mask, best_params = int(count), mask, params
            if best_count == n:
                break
            budget = min(
                num_tries(desired_probability, best_count / n, est.k, all_tries),
                all_tries,
            )
    if best_params is None:
        return _invalid_result(est, n)
    return _finalize(est, data, best_count, best_mask, best_params, n)


def ransac_exhaustive(est, data, batch_size: int = 8192) -> RansacResult:
    """Evaluate every C(n, k) subset (``RANSAC.hxx:149-248``).

    Subsets are enumerated host-side in lexicographic order (matching the
    reference's recursion, ``RANSAC.hxx:196-213``) and evaluated in
    device-sized batches.  Intended for small n, as in the reference
    (``RANSAC.h:107-108``).
    """
    n = _data_size(data)
    if n < est.k:
        return _invalid_result(est, n)

    best_count = -1
    best_mask = jnp.zeros((n,), bool)
    best_params = None
    combos = itertools.combinations(range(n), est.k)
    while True:
        chunk = list(itertools.islice(combos, batch_size))
        if not chunk:
            break
        idx = jnp.asarray(np.array(chunk, dtype=np.int32))
        count, mask, params = hypothesize_and_vote(est, data, idx)
        if int(count) > best_count:
            best_count, best_mask, best_params = int(count), mask, params
    if best_params is None:
        return _invalid_result(est, n)
    return _finalize(est, data, best_count, best_mask, best_params, n)


def _invalid_result(est, n):
    return RansacResult(
        params=jnp.zeros((getattr(est, "nparams_lsq", est.nparams),)),
        valid=jnp.asarray(False),
        inlier_fraction=jnp.asarray(0.0),
        consensus=jnp.zeros((max(n, 1),), bool),
        best_count=jnp.asarray(-1),
        minimal_params=jnp.zeros((est.nparams,)),
    )
