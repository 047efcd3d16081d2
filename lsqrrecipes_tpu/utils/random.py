"""Data-synthesis random number generator.

Replaces ``common/RandomNumberGenerator.h`` (a ``vnl_random`` wrapper used
only by tests/examples).  Built on counter-based ``jax.random`` so every
synthetic data set is reproducible — deliberately unlike the reference's
time-seeded generators (``RandomNumberGenerator.h:16-23``).
"""

import jax


class RandomNumberGenerator:
    def __init__(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)

    def _next(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def uniform(self, low=0.0, high=1.0, shape=()):
        """Uniform in [low, high) (``RandomNumberGenerator.h:31-36``)."""
        return jax.random.uniform(self._next(), shape, minval=low, maxval=high)

    def normal(self, sigma=1.0, mu=0.0, shape=()):
        """Gaussian N(mu, sigma^2) (``RandomNumberGenerator.h:38-44``)."""
        return mu + sigma * jax.random.normal(self._next(), shape)

    def key(self):
        """Raw PRNG key for direct jax.random use."""
        return self._next()
