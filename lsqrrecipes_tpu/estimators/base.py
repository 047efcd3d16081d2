"""The estimator protocol — batched, masked, functional.

TPU-native redesign of the reference's abstract base
``parametersEstimators/ParametersEstimator.h:26-64``.  The C++ contract::

    estimate(data, params)             # exact fit from minForEstimate items
    leastSquaresEstimate(data, params) # overdetermined fit
    agree(params, datum) -> bool       # inlier predicate
    numForEstimate()

becomes a functional one built for ``vmap``/``pjit``:

  * ``minimal_fit(samples) -> (params[P], valid)`` — exact fit from a pytree
    of ``k`` data items (leading axis ``k``).  The reference signals a
    degenerate sample by returning an empty vector
    (``ParametersEstimator.h:37-40``); here ``valid`` is an explicit boolean
    so thousands of hypotheses batch into fixed shapes.  Parameters of
    invalid fits are finite garbage (never NaN) so they cannot poison
    reductions.
  * ``lsq_fit(data, mask=None) -> (params[P], valid)`` — least-squares fit
    over all data, optionally restricted to ``mask`` (the batched analogue
    of the reference passing the consensus subset, ``RANSAC.hxx:128-139``).
  * ``agree(params, data) -> bool[n]`` — vectorized inlier predicate over
    the whole data set (the reference's per-datum virtual call,
    ``RANSAC.hxx:94-99``).  Broadcasts over leading axes of ``params`` so a
    ``[B, P]`` hypothesis batch against ``n`` data items yields ``[B, n]``.
  * ``k`` / ``nparams`` — static problem sizes.

Data is a pytree (array, tuple of arrays, Frame, Ray3D, ...) whose leaves
share the leading observation axis; the RANSAC engine gathers/shards it
generically with ``tree_map``.

Optionally estimators expose sufficient-statistics hooks used by the
multi-chip engine to refit without gathering observations:
``lsq_stats(data, mask) -> stats`` (psum-reducible pytree) and
``lsq_solve_stats(stats) -> (params, valid)``.
"""

from typing import Any, Optional, Tuple

import jax.numpy as jnp


class Estimator:
    """Base class; concrete estimators override the four core methods."""

    k: int          # minimum data items for an exact fit (numForEstimate)
    nparams: int    # length of the parameter vector

    # -- core protocol ------------------------------------------------------
    def minimal_fit(self, samples) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError

    def lsq_fit(self, data, mask: Optional[jnp.ndarray] = None):
        raise NotImplementedError

    def agree(self, params, data) -> jnp.ndarray:
        raise NotImplementedError

    def lsq_fit_batched(self, data, mask: Optional[jnp.ndarray] = None):
        """``lsq_fit`` vmapped over a leading problem axis.

        One XLA program runs B independent least-squares refits — for the
        ITERATIVE estimators that is B Levenberg-Marquardt solves advancing
        in lockstep (``linalg/lm.py`` is a fixed-shape ``while_loop``
        specifically so it vmaps; the reference runs vnl_levenberg_marquardt
        once per problem, ``SinglePointTarget...cxx:272-297``).  ``data``:
        the estimator's pytree with an extra leading axis ``[B, n, ...]``;
        ``mask``: optional ``[B, n]``.  Returns ``(params[B, P], valid[B])``.
        """
        import jax

        if mask is None:
            return jax.vmap(lambda d: self.lsq_fit(d))(data)
        return jax.vmap(self.lsq_fit)(data, mask)

    # -- optional distributed-refit hooks -----------------------------------
    def lsq_stats(self, data, mask: Optional[jnp.ndarray] = None) -> Any:
        raise NotImplementedError(
            f"{type(self).__name__} does not provide sufficient statistics"
        )

    def lsq_solve_stats(self, stats) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError(
            f"{type(self).__name__} does not provide sufficient statistics"
        )

    @property
    def has_stats(self) -> bool:
        return type(self).lsq_stats is not Estimator.lsq_stats

    # -- helpers -------------------------------------------------------------
    @staticmethod
    def _mask_or_ones(mask, n, dtype):
        if mask is None:
            return jnp.ones((n,), dtype=dtype)
        return mask.astype(dtype)


_REGISTRY = {}


def register(name):
    """Class decorator: register an estimator under ``name``."""

    def wrap(cls):
        _REGISTRY[name] = cls
        cls.registry_name = name
        return cls

    return wrap


def get(name) -> type:
    return _REGISTRY[name]


def names():
    return sorted(_REGISTRY)
