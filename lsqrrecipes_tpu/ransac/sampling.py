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
