"""Vectorized minimal-subset sampling.

The reference draws one random k-subset per iteration with a serial
"k-th unchosen element" walk seeded by ``srand(time(NULL))``
(``RANSAC.hxx:44,56-68``) and rejects repeats via a sorted-index set
(``RANSAC.hxx:78-81``).  The TPU engine instead draws *all* hypotheses at
once with counter-based ``jax.random`` (deterministic, reproducible) and
skips the uniqueness set: with thousands of oversampled hypotheses,
collisions are statistically irrelevant (documented deviation, SURVEY.md
section 7 "Sampling").
"""

import jax
import jax.numpy as jnp


def sample_k_subsets(key, n, k, num_subsets):
    """Uniform random k-subsets of ``range(n)`` -> ``int32[num_subsets, k]``.

    Each row holds k distinct indices.  Implementation: per-row iid uniform
    keys, ``top_k`` of the key values — the top-k indices of an iid uniform
    vector are a uniformly distributed k-subset.  O(num_subsets * n) memory;
    for very large n use :func:`sample_k_subsets_chunked`.
    """
    r = jax.random.uniform(key, (num_subsets, n))
    _, idx = jax.lax.top_k(r, k)
    return idx.astype(jnp.int32)


def sample_k_with_replacement(key, n, k, num_subsets):
    """O(num_subsets * k) sampler: independent uniform indices per row.

    Rows may contain duplicate indices (probability ~ k^2/2n per row); a
    duplicate makes the minimal sample degenerate, which the engine already
    masks out via the estimator's ``valid`` flag — so with-replacement
    sampling just wastes a ~1% sliver of the hypothesis budget instead of
    paying the O(num_subsets * n) memory of exact subset sampling.  This is
    the right trade at TPU batch sizes (documented deviation from the
    reference's strict distinct-index sampling, ``RANSAC.hxx:56-68``).
    """
    return jax.random.randint(key, (num_subsets, k), 0, n, dtype=jnp.int32)


def structured_shift_table(n, k, groups):
    """THE canonical static shift table for structured sampling.

    Returns ``int64[groups, k]`` where row g holds slot shifts
    ``[0, s_g1, ..., s_g,k-1]`` — slot 0 is the unshifted permuted array,
    slots 1..k-1 are sorted distinct nonzero circular shifts.  Derived
    deterministically from ``(groups, k)`` only (compile-time static; the
    per-call randomness lives in the permutation).

    Every consumer of the permutation+shift sampling scheme MUST build its
    shifts here so they all evaluate the IDENTICAL hypothesis set:
    :func:`structured_samples` (materialized pytree samples),
    ``ops.us_fast.structured_sweep`` (planar US sweeps), and
    ``ops.sphere_ransac.planar_sphere_samples`` (fused-kernel planes).
    """
    import numpy as _np

    rng = _np.random.default_rng(1234567 + groups * 1000003 + k)
    table = _np.zeros((groups, k), dtype=_np.int64)
    for g in range(groups):
        pool = rng.choice(_np.arange(1, n), size=k - 1, replace=False)
        table[g, 1:] = _np.sort(pool)
    return table


def structured_samples(key, data, k, groups):
    """Gather-free minimal-sample construction: permutation + rolls.

    TPU gathers of [B, k] random rows are scalar-loop slow, and threefry
    index generation at B ~ 1e5 costs more than the entire vote.  Instead:
    permute the n observations once (one tiny gather), then build
    ``groups`` families of n hypotheses each by pairing the permuted array
    with ``k-1`` random circular shifts of itself — pure contiguous copies,
    no gathers, ~100x cheaper at large B:

        hypothesis (g, i) = { perm[i], perm[(i+s_g1)%n], ..., perm[(i+s_g,k-1)%n] }

    Every hypothesis gets k *distinct* observations (shifts are nonzero and
    pairwise distinct mod n).  Hypotheses within a group share the
    permutation, so draws are not iid across the batch — but each
    individual draw is uniform over ordered k-tuples of distinct elements,
    which preserves the RANSAC hit probability w^k per hypothesis
    (documented deviation from the reference's iid subset draws,
    ``RANSAC.hxx:56-68``).

    data: pytree with leading observation axis n.
    Returns a pytree of samples with leading axes ``[groups * n, k]``.
    """
    import jax.tree_util as jtu

    n = jtu.tree_leaves(data)[0].shape[0]
    perm = jax.random.permutation(key, n)
    permuted = jtu.tree_map(lambda a: a[perm], data)

    # Static (compile-time) shift patterns: the per-call randomness lives
    # entirely in the permutation, which already places uniformly random
    # observations at every (position, shift) pair; fixing the shifts does
    # not bias per-hypothesis inlier probability.  Static shifts compile to
    # plain slices (no dynamic-slice/scatter HLO).
    table = structured_shift_table(n, k, groups)

    def build(leaf):
        groups_out = []
        for g in range(groups):
            stacked = [
                jnp.roll(leaf, -int(s), axis=0) for s in table[g]
            ]
            groups_out.append(jnp.stack(stacked, axis=1))      # [n, k, ...]
        out = jnp.concatenate(groups_out, axis=0)              # [G*n, k, ...]
        return out

    return jtu.tree_map(build, permuted)


def sample_k_subsets_chunked(key, n, k, num_subsets, chunk=4096):
    """Memory-bounded variant: draws in chunks of hypotheses."""
    keys = jax.random.split(key, -(-num_subsets // chunk))
    outs = [sample_k_subsets(kk, n, k, min(chunk, num_subsets - i * chunk))
            for i, kk in enumerate(keys)]
    return jnp.concatenate(outs, axis=0)


def num_tries(desired_probability, inlier_fraction, k, all_tries):
    """Adaptive iteration budget ``log(1-p) / log(1 - w^k)``, clamped to the
    number of distinct subsets (``RANSAC.hxx:100-111``)."""
    import math

    w = float(inlier_fraction)
    if w <= 0.0 or w >= 1.0:
        return all_tries
    denom = math.log(1.0 - w ** k)
    if denom == 0.0:
        return all_tries
    tries = int(math.log(1.0 - desired_probability) / denom + 0.5)
    return max(1, min(tries, all_tries))


def choose(n, k):
    """C(n, k) clamped to uint32 max on overflow (``RANSAC.hxx:253-280``)."""
    import math

    try:
        value = math.comb(int(n), int(k))
    except ValueError:
        return 0
    return min(value, 0xFFFFFFFF)
