"""SVD pseudo-inverse solves with absolute singular-value thresholding.

The reference funnels every linear solve through ``vnl_matrix_inverse`` (an
SVD pseudo-inverse) followed by ``zero_out_absolute(EPS)`` and a rank check
(e.g. ``DenseLinearEquationSystemParametersEstimator.hxx:38-45``,
``PivotCalibrationParametersEstimator.cxx:40-47``).  These helpers reproduce
that contract: singular values ``<= eps`` are zeroed, the reported rank is
the count of surviving singular values, and callers treat ``rank < expected``
as a degenerate configuration (the batched analogue of returning an empty
parameter vector).

All functions broadcast over leading batch axes and are vmap/jit safe.
"""

import jax.numpy as jnp

from lsqrrecipes_tpu.config import EPS


def svd_f64(a, full_matrices=False):
    """``jnp.linalg.svd`` computed in f64 regardless of input dtype.

    Two reasons: (1) the reference's vnl pipeline is all-double, so the
    DBL_EPSILON-scale rank thresholds only make sense on f64 singular
    values; (2) XLA:TPU on this toolchain SIGABRTs compiling **f32** SVD
    (TransposeFolding ``Check failed: buffer != nullptr``) while f64 SVD
    compiles fine — chip-isolated 2026-08-20.  Callers cast results back
    to their working dtype as needed.  Under disabled x64 the upcast is a
    no-op and the caller is on its own (the fused kernels never SVD).
    """
    return jnp.linalg.svd(
        a.astype(jnp.float64), full_matrices=full_matrices
    )


def svd_rank(s, eps=EPS):
    """Rank after ``zero_out_absolute(eps)``: #{sigma_i > eps}.

    vnl's ``zero_out_absolute`` zeroes values with ``|sigma| <= tol``
    (boundary inclusive), so the surviving count uses a strict ``>``.
    """
    return jnp.sum(s > eps, axis=-1)


def pinv_solve(a, b, eps=EPS):
    """Least-squares solve ``x = pinv(a) @ b`` with absolute thresholding.

    a: ``[..., m, n]``, b: ``[..., m]`` -> ``(x[..., n], rank[...])``.

    Matches ``vnl_matrix_inverse`` + ``zero_out_absolute(eps)``: singular
    values ``<= eps`` contribute nothing, and ``rank`` counts the survivors.
    """
    u, s, vt = svd_f64(a, full_matrices=False)
    keep = s > eps
    s_inv = jnp.where(keep, 1.0 / jnp.where(keep, s, 1.0), 0.0)
    utb = jnp.einsum("...ij,...i->...j", u, b.astype(u.dtype))
    x = jnp.einsum("...ji,...j->...i", vt, s_inv * utb)
    return x.astype(a.dtype), jnp.sum(keep, axis=-1)


def masked_pinv_solve(a, b, row_mask, eps=EPS):
    """``pinv_solve`` over the subset of rows selected by ``row_mask``.

    The reference builds a smaller matrix from the consensus subset
    (``RANSAC.hxx:128-139``); with fixed shapes we instead zero the excluded
    rows of ``a`` and ``b``.  For least-squares solves this is exact: zero
    rows contribute nothing to ``A^T A`` / ``A^T b``, and the singular values
    (hence the rank decision) of the zero-padded matrix equal those of the
    subset matrix.

    row_mask: ``[..., m]`` boolean.
    """
    m = row_mask[..., None].astype(a.dtype)
    return pinv_solve(a * m, b * jnp.squeeze(m, -1), eps)


def nullvector(a, eps=EPS):
    """Unit null vector of ``a[..., m, n]`` (last right-singular vector).

    Returns ``(x[..., n], rank[...])``; callers requiring a one-dimensional
    null space check ``rank == n - 1``.  Matches ``vnl_svd::nullvector``
    (``PlaneParametersEstimator.hxx:81-91``).
    """
    _, s, vt = svd_f64(a, full_matrices=True)
    x = vt[..., -1, :].astype(a.dtype)
    # s has min(m, n) entries; rank counts survivors above eps.
    return x, svd_rank(s, eps)
