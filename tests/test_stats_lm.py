"""Sufficient-statistics LM (linalg/stats_lm.py) vs the full residual LM.

The stats form computes the SAME normal equations from the feature Gram
matrix H (exact in exact arithmetic), run through the identical damping
loop — so from the same x0/config both solvers must converge to the same
minimum, and the cost/gradient/JtJ evaluated at any x must agree to
f64 rounding.  Reference residuals:
``SinglePointTargetUSCalibrationParametersEstimator.cxx:415-509`` (crosswire),
``:1059-1149`` (pointer), ``PlanePhantom...cxx:357-447`` (plane phantom).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsqrrecipes_tpu.estimators.us_calibration import (
    _crosswire_jacobian,
    _crosswire_residual,
    _plane_phantom_jacobian,
    _plane_phantom_residual,
    _pointer_jacobian,
    _pointer_residual,
)
from lsqrrecipes_tpu.linalg import LMConfig, levenberg_marquardt
from lsqrrecipes_tpu.linalg import stats_lm
from lsqrrecipes_tpu.synthetic import (
    make_crosswire_data,
    make_plane_phantom_data,
    make_pointer_data,
)

_CASES = {
    "pointer": (_pointer_residual, _pointer_jacobian),
    "crosswire": (_crosswire_residual, _crosswire_jacobian),
    "plane_phantom": (_plane_phantom_residual, _plane_phantom_jacobian),
}


def _make(kind, seed=3, n=50, sigma=1.0):
    key = jax.random.PRNGKey(seed)
    if kind == "pointer":
        (frames, q, p), _, true = make_pointer_data(key, n=n, sigma=sigma)
        data = (frames, q, p)
    elif kind == "crosswire":
        data, _, true = make_crosswire_data(key, n=n, sigma=sigma)
    else:
        data, _, true = make_plane_phantom_data(key, n=n, sigma=sigma)
    return data, true


def _x0(kind, data):
    """A perturbed-truth-free init: the estimator's analytic fit."""
    from lsqrrecipes_tpu.estimators.us_calibration import (
        ANALYTIC,
        CrosswireUSCalibrationEstimator,
        PlanePhantomUSCalibrationEstimator,
        PointerUSCalibrationEstimator,
    )

    if kind == "pointer":
        est = PointerUSCalibrationEstimator(delta=3.0, ls_type=ANALYTIC)
        params, ok = est.lsq_fit(data)
        assert bool(ok)
        # pack to the residual layout [t3, wz, wy, wx, mx, my]
        return jnp.concatenate(
            [params[0:3], params[3:6], params[6:8]]
        )
    if kind == "crosswire":
        est = CrosswireUSCalibrationEstimator(delta=3.0, ls_type=ANALYTIC)
        params, ok = est.lsq_fit(data)
        assert bool(ok)
        return jnp.concatenate([params[0:3], params[3:6], params[6:9],
                                params[9:11]])
    est = PlanePhantomUSCalibrationEstimator(delta=1.0, ls_type=ANALYTIC)
    params, ok = est.lsq_fit(data)
    assert bool(ok)
    return params[0:11]


@pytest.mark.parametrize("kind", list(_CASES))
def test_quadratics_match_full_jacobian(kind):
    """cost, g, JtJ from H equal the explicit residual/Jacobian forms."""
    data, _ = _make(kind)
    res_fn, jac_fn = _CASES[kind]
    w_fn, stats_fn, _, _ = stats_lm._OBJECTIVES[kind]
    h = stats_fn(data)

    x = _x0(kind, data) * 1.03 + 0.01  # generic non-stationary point
    r = res_fn(x, data)
    j = jac_fn(x, data)
    cost_full = 0.5 * jnp.sum(r * r)
    g_full = j.T @ r
    jtj_full = j.T @ j

    w = w_fn(x)
    t = jax.jacfwd(w_fn)(x)
    cost_s = 0.5 * jnp.sum((w @ h) * w)
    g_s = jnp.einsum("rfp,rf->p", t, w @ h)
    jtj_s = jnp.einsum("rfp,fe,req->pq", t, h, t)

    scale = float(jnp.maximum(jnp.abs(cost_full), 1.0))
    np.testing.assert_allclose(float(cost_s), float(cost_full),
                               rtol=1e-9, atol=1e-9 * scale)
    gs = float(jnp.max(jnp.abs(g_full))) + 1.0
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_full),
                               rtol=1e-8, atol=1e-9 * gs)
    js = float(jnp.max(jnp.abs(jtj_full))) + 1.0
    np.testing.assert_allclose(np.asarray(jtj_s), np.asarray(jtj_full),
                               rtol=1e-8, atol=1e-9 * js)


@pytest.mark.parametrize("kind", list(_CASES))
def test_minima_match_full_lm(kind):
    data, _ = _make(kind)
    res_fn, jac_fn = _CASES[kind]
    x0 = _x0(kind, data)
    config = LMConfig(max_iters=200)

    full = levenberg_marquardt(res_fn, jac_fn, x0, data, config=config)
    stats = stats_lm.us_feature_lm(kind, data, x0, config=config)

    assert bool(full.converged) and bool(stats.converged)
    np.testing.assert_allclose(float(stats.cost), float(full.cost),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(stats.x), np.asarray(full.x),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kind", list(_CASES))
def test_masked_stats_equal_deleted_rows(kind):
    """Mask-weighted H == H of the kept subset (consensus-refit semantics)."""
    data, _ = _make(kind)
    _, stats_fn, _, _ = stats_lm._OBJECTIVES[kind]
    n = jax.tree_util.tree_leaves(data)[0].shape[0]
    mask = jnp.arange(n) % 3 != 0
    kept = jax.tree_util.tree_map(lambda a: a[mask], data)
    np.testing.assert_allclose(
        np.asarray(stats_fn(data, mask)), np.asarray(stats_fn(kept)),
        rtol=1e-12, atol=1e-9,
    )


def test_batched_matches_single():
    data, _ = _make("pointer")
    n = data[1].shape[0]
    x0 = _x0("pointer", data)
    x0s = jnp.stack([x0, x0 * 1.01, x0 * 0.99])
    masks = jnp.stack([
        jnp.ones(n, bool),
        jnp.arange(n) % 2 == 0,
        jnp.arange(n) % 5 != 0,
    ])
    config = LMConfig(max_iters=200)
    batched = stats_lm.us_feature_lm_batched(
        "pointer", data, x0s, masks, config=config
    )
    for i in range(3):
        single = stats_lm.us_feature_lm(
            "pointer", data, x0s[i], masks[i], config=config
        )
        # vmapped einsums reassociate f64 reductions: agreement to ~1e-8
        # absolute on mm-scale parameters is rounding, not semantics.
        np.testing.assert_allclose(np.asarray(batched.x[i]),
                                   np.asarray(single.x), rtol=1e-7,
                                   atol=1e-8)


@pytest.mark.parametrize("kind", list(_CASES))
def test_estimator_stats_batched_matches_lsq_fit(kind):
    """``lsq_fit_stats_batched`` (shared data, B masks) agrees with the
    per-problem full-LM ``lsq_fit`` well inside the reference tolerances
    (translations 1mm / angles 1 degree, ``...Test.cxx:466-470``)."""
    from lsqrrecipes_tpu.estimators.us_calibration import (
        CrosswireUSCalibrationEstimator,
        PlanePhantomUSCalibrationEstimator,
        PointerUSCalibrationEstimator,
    )

    data, _ = _make(kind, n=48)
    n = jax.tree_util.tree_leaves(data)[0].shape[0]
    est = {
        "pointer": PointerUSCalibrationEstimator,
        "crosswire": CrosswireUSCalibrationEstimator,
        "plane_phantom": PlanePhantomUSCalibrationEstimator,
    }[kind](delta=3.0)
    masks = jnp.stack([
        jnp.ones(n, bool),
        jnp.arange(n) % 7 != 0,
        jnp.arange(n) % 3 != 1,
    ])
    pb, vb = est.lsq_fit_stats_batched(data, masks)
    assert bool(jnp.all(vb))
    for i in range(masks.shape[0]):
        p1, v1 = est.lsq_fit(data, masks[i])
        assert bool(v1)
        np.testing.assert_allclose(np.asarray(pb[i]), np.asarray(p1),
                                   rtol=1e-4, atol=1e-4)


def test_centered_from_gram_matches_centered_problem():
    """The one-psum raw-Gram congruence (``centered_from_gram``) is the
    documented communication-minimal alternative to feature centering —
    no production path uses it since the sharded refit switched to the
    two-psum form, so this parity test keeps it honest: same centered
    problem (Gram + coefficient map) as ``_centered_problem`` on the raw
    features, up to the congruence's ~eps*(raw-scale) build perturbation."""
    import numpy as np

    from lsqrrecipes_tpu.linalg import stats_lm
    from lsqrrecipes_tpu.synthetic import make_pointer_data

    (frames, q, p), _, _ = make_pointer_data(jax.random.PRNGKey(3), n=48)
    h = stats_lm.pointer_features((frames, q, p))
    wts = stats_lm._weights(h.shape[0], None, h.dtype)

    w_fn_a, gram_a = stats_lm._centered_problem(
        stats_lm.pointer_w, h, wts, 2
    )
    g_raw = jnp.einsum("ni,nj,n->ij", h, h, wts)
    w_fn_b, gram_b = stats_lm.centered_from_gram(stats_lm.pointer_w, g_raw, 2)

    scale = float(jnp.max(jnp.abs(g_raw)))
    np.testing.assert_allclose(
        np.asarray(gram_a), np.asarray(gram_b), atol=1e-9 * scale
    )
    x = jnp.asarray([1.0, -2.0, 3.0, 0.1, -0.2, 0.3, 0.14, 0.14])
    np.testing.assert_allclose(
        np.asarray(w_fn_a(x)), np.asarray(w_fn_b(x)), rtol=0, atol=1e-12
    )
