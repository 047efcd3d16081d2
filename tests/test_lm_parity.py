"""Head-to-head: our LM (Nielsen schedule) vs MINPACK lmder (scipy).

The reference delegates nonlinear refinement to ``vnl_levenberg_marquardt``
(MINPACK ``lmder``, trust-region) with 1e-15 tolerances
(``SphereParametersEstimator.hxx:323-329``,
``SinglePointTarget...cxx:286-295``).  Our solver uses Nielsen's
multiplicative damping schedule (``linalg/lm.py``, documented deviation);
this test replaces the prior "reaches the same minima" assertion with data:
on the geometric-sphere and crosswire-US problems both solvers must land on
the same minimum (relative cost difference ~1e-12) from the same analytic
initialization.  ``scipy.optimize.least_squares(method='lm')`` wraps the
same MINPACK lmder that vnl wraps, so this is a direct stand-in for the
reference's optimizer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

scipy_opt = pytest.importorskip("scipy.optimize")

from lsqrrecipes_tpu.estimators.sphere import _sphere_jacobian, _sphere_residual
from lsqrrecipes_tpu.estimators.us_calibration import (
    CrosswireUSCalibrationEstimator,
    PlanePhantomUSCalibrationEstimator,
    PointerUSCalibrationEstimator,
    _crosswire_jacobian,
    _crosswire_residual,
    _plane_phantom_jacobian,
    _plane_phantom_residual,
    _pointer_jacobian,
    _pointer_residual,
)
from lsqrrecipes_tpu.estimators import ALGEBRAIC, SphereEstimator
from lsqrrecipes_tpu.linalg import LMConfig, levenberg_marquardt
from tests.test_us_calibration import (
    make_crosswire_data,
    make_plane_phantom_data,
    make_pointer_data,
)

_TIGHT = LMConfig(ftol=1e-15, xtol=1e-15, gtol=1e-15, max_iters=500)


def _compare(residual_fn, jac_fn, x0, data, label):
    ours = levenberg_marquardt(residual_fn, jac_fn, x0, data, config=_TIGHT)

    ref = scipy_opt.least_squares(
        lambda x: np.asarray(residual_fn(jnp.asarray(x), data)),
        np.asarray(x0),
        jac=lambda x: np.asarray(jac_fn(jnp.asarray(x), data)),
        method="lm",
        ftol=1e-15,
        xtol=1e-15,
        gtol=1e-15,
        max_nfev=5000,
    )
    our_cost = float(ours.cost)
    ref_cost = float(ref.cost)
    rel = abs(our_cost - ref_cost) / max(ref_cost, 1e-30)
    print(
        f"{label}: ours cost={our_cost:.15e} iters={int(ours.iterations)} | "
        f"lmder cost={ref_cost:.15e} nfev={ref.nfev} | rel diff={rel:.2e}"
    )
    assert bool(ours.converged)
    assert rel < 1e-10, (our_cost, ref_cost)
    return int(ours.iterations), int(ref.nfev)


def test_lm_matches_lmder_sphere_geometric():
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    d = jax.random.normal(k1, (200, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    pts = jnp.asarray([5.0, -2.0, 11.0]) + 25.0 * d
    pts = pts + 0.5 * jax.random.normal(k2, pts.shape)
    alg = SphereEstimator(delta=1.0, dim=3, ls_type=ALGEBRAIC)
    x0, ok = alg.lsq_fit(pts)
    assert bool(ok)
    _compare(_sphere_residual, _sphere_jacobian, x0, pts, "sphere-geometric")


def test_lm_matches_lmder_crosswire():
    (noisy, clean, true) = make_crosswire_data(jax.random.PRNGKey(1), n=50)
    est = CrosswireUSCalibrationEstimator(delta=3.0, ls_type="analytic")
    params, ok = est.lsq_fit(noisy)
    assert bool(ok)
    x0 = params[:11]
    _compare(_crosswire_residual, _crosswire_jacobian, x0, noisy, "crosswire")


def test_lm_matches_lmder_pointer():
    """Calibrated-pointer objective (8 minimal params,
    ``SinglePointTarget...cxx:916-973``) vs MINPACK lmder."""
    (noisy, clean, true) = make_pointer_data(jax.random.PRNGKey(2), n=50)
    est = PointerUSCalibrationEstimator(delta=3.0, ls_type="analytic")
    params, ok = est.lsq_fit(noisy)
    assert bool(ok)
    x0 = params[:8]
    _compare(_pointer_residual, _pointer_jacobian, x0, noisy, "pointer")


def test_lm_matches_lmder_plane_phantom():
    """Plane-phantom objective (11 minimal params,
    ``PlanePhantom...cxx:357-447``) vs MINPACK lmder."""
    (noisy, clean, true) = make_plane_phantom_data(jax.random.PRNGKey(4), n=50)
    est = PlanePhantomUSCalibrationEstimator(delta=1.0, ls_type="analytic")
    params, ok = est.lsq_fit(noisy)
    assert bool(ok)
    x0 = params[:11]
    _compare(
        _plane_phantom_residual, _plane_phantom_jacobian, x0, noisy,
        "plane-phantom",
    )
