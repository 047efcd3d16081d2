"""Ultrasound-calibration estimators: crosswire, pointer, plane phantom.

Mirrors ``testing/SinglePointTargetUSCalibrationParametersEstimatorTest.cxx``
and ``testing/PlanePhantomUSCalibrationParametersEstimatorTest.cxx``:
50 simulated elements, sigma = 1 pixel, m_x=0.143/m_y=0.139, poses and
angles uniform in the reference's bounds.  Acceptance follows the reference:
translations within 1.0 mm (3.0 for plane phantom), rotation within 1 degree
(5 for plane phantom) accepting either Euler solution — here checked
equivalently as the rotation-angle distance between estimated and true R3 —
scales within 1.0.  Golden-style check on the experimental crosswire data
(distance statistics, as the reference prints, ``...Test.cxx:115-166``).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsqrrecipes_tpu.estimators.us_calibration import (
    ANALYTIC,
    ITERATIVE,
    CrosswireUSCalibrationEstimator,
    PlanePhantomUSCalibrationEstimator,
    PointerUSCalibrationEstimator,
    _euler_zyx_matrix,
)
from lsqrrecipes_tpu.geometry import Frame
from lsqrrecipes_tpu.io import load_crosswire_phantom
from tests.conftest import REFERENCE_DATA

M_X, M_Y = 0.143, 0.139
TRANSLATION_EPS = 1.0
ANGULAR_EPS = np.radians(1.0)
SCALE_EPS = 1.0


def _rotation_angle_between(r_a, r_b):
    c = (jnp.trace(r_a.T @ r_b) - 1.0) / 2.0
    return float(jnp.arccos(jnp.clip(c, -1.0, 1.0)))


# Data generators live in the package (lsqrrecipes_tpu/synthetic.py) so chip
# scripts can import them WITHOUT importing tests.conftest (whose global
# CPU-default-device pin silently moved every "chip" run to the host).
from lsqrrecipes_tpu.synthetic import (  # noqa: F401  (re-exported for tests)
    _random_rotation,
    make_crosswire_data,
    make_plane_phantom_data,
    make_pointer_data,
)


def _check_crosswire(params, true, trans_eps=TRANSLATION_EPS, ang_eps=ANGULAR_EPS):
    np.testing.assert_allclose(params[0:3], true["t1"], atol=trans_eps)
    np.testing.assert_allclose(params[3:6], true["t3"], atol=trans_eps)
    r_est = _euler_zyx_matrix(params[6], params[7], params[8])
    assert _rotation_angle_between(r_est, true["r3"]) < ang_eps
    np.testing.assert_allclose(params[9], M_X, atol=SCALE_EPS)
    np.testing.assert_allclose(params[10], M_Y, atol=SCALE_EPS)


def test_crosswire_minimal_clean():
    (noisy, clean, true) = make_crosswire_data(jax.random.PRNGKey(0))
    frames, q = clean
    est = CrosswireUSCalibrationEstimator(delta=3.0)
    samples = (Frame(frames.r[:4], frames.t[:4]), q[:4])
    params, valid = est.minimal_fit(samples)
    assert bool(valid)
    _check_crosswire(params, true, trans_eps=1e-6, ang_eps=1e-8)
    # agree holds on clean data
    assert bool(est.agree(params, clean)[0])


@pytest.mark.parametrize("ls_type", [ANALYTIC, ITERATIVE])
def test_crosswire_lsq_noisy(ls_type):
    (noisy, clean, true) = make_crosswire_data(jax.random.PRNGKey(1))
    est = CrosswireUSCalibrationEstimator(delta=3.0, ls_type=ls_type)
    params, valid = est.lsq_fit(noisy)
    assert bool(valid)
    _check_crosswire(params, true)



def _check_pointer(params, true, trans_eps=TRANSLATION_EPS, ang_eps=ANGULAR_EPS):
    np.testing.assert_allclose(params[0:3], true["t3"], atol=trans_eps)
    r_est = _euler_zyx_matrix(params[3], params[4], params[5])
    assert _rotation_angle_between(r_est, true["r3"]) < ang_eps
    np.testing.assert_allclose(params[6], M_X, atol=SCALE_EPS)
    np.testing.assert_allclose(params[7], M_Y, atol=SCALE_EPS)


def test_pointer_minimal_clean():
    (noisy, clean, true) = make_pointer_data(jax.random.PRNGKey(2))
    frames, q, p = clean
    est = PointerUSCalibrationEstimator(delta=3.0)
    samples = (Frame(frames.r[:3], frames.t[:3]), q[:3], p[:3])
    params, valid = est.minimal_fit(samples)
    assert bool(valid)
    _check_pointer(params, true, trans_eps=1e-6, ang_eps=1e-8)
    assert bool(est.agree(params, clean)[0])


@pytest.mark.parametrize("ls_type", [ANALYTIC, ITERATIVE])
def test_pointer_lsq_noisy(ls_type):
    (noisy, clean, true) = make_pointer_data(jax.random.PRNGKey(3))
    est = PointerUSCalibrationEstimator(delta=3.0, ls_type=ls_type)
    params, valid = est.lsq_fit(noisy)
    assert bool(valid)
    _check_pointer(params, true)



def _check_plane_phantom(params, true, trans_eps, ang_eps):
    # Plane normal (R1 row 3) and offset.  The homogeneous null vector is
    # sign-ambiguous: (r1_row3, t1_z) and (-r1_row3, -t1_z) describe the same
    # plane (the reference test likewise accepts either Euler solution,
    # ``PlanePhantom...Test.cxx``), so compare up to a global sign.
    cy1, sy1 = jnp.cos(params[0]), jnp.sin(params[0])
    cx1, sx1 = jnp.cos(params[1]), jnp.sin(params[1])
    est_row3 = jnp.stack([-sy1, cy1 * sx1, cy1 * cx1])
    sign = jnp.where(jnp.dot(est_row3, true["r1_row3"]) >= 0, 1.0, -1.0)
    angle = float(
        jnp.arccos(jnp.clip(jnp.dot(sign * est_row3, true["r1_row3"]), -1.0, 1.0))
    )
    assert angle < ang_eps
    np.testing.assert_allclose(sign * params[2], true["t1_z"], atol=trans_eps)
    np.testing.assert_allclose(params[3:6], true["t3"], atol=trans_eps)
    r_est = _euler_zyx_matrix(params[6], params[7], params[8])
    assert _rotation_angle_between(r_est, true["r3"]) < ang_eps
    np.testing.assert_allclose(params[9], M_X, atol=SCALE_EPS)
    np.testing.assert_allclose(params[10], M_Y, atol=SCALE_EPS)


def test_plane_phantom_minimal_clean():
    (noisy, clean, true) = make_plane_phantom_data(jax.random.PRNGKey(4), n=31)
    est = PlanePhantomUSCalibrationEstimator(delta=1.0)
    params, valid = est.minimal_fit(clean)
    assert bool(valid)
    _check_plane_phantom(params, true, trans_eps=1e-5, ang_eps=1e-7)
    assert bool(jnp.all(est.agree(params, clean)))


@pytest.mark.parametrize("ls_type", [ANALYTIC, ITERATIVE])
def test_plane_phantom_lsq_noisy(ls_type):
    """Reference tolerances: 3.0 mm / 5 degrees
    (``PlanePhantom...Test.cxx:286-288``)."""
    (noisy, clean, true) = make_plane_phantom_data(jax.random.PRNGKey(5))
    est = PlanePhantomUSCalibrationEstimator(delta=1.0, ls_type=ls_type)
    params, valid = est.lsq_fit(noisy)
    assert bool(valid)
    _check_plane_phantom(params, true, trans_eps=3.0, ang_eps=np.radians(5.0))


CROSSWIRE_T = os.path.join(REFERENCE_DATA, "crossWirePhantomTransformations.txt")
CROSSWIRE_P = os.path.join(REFERENCE_DATA, "crossWirePhantom2DPoints.txt")


@pytest.mark.skipif(not os.path.exists(CROSSWIRE_T), reason="data not mounted")
def test_crosswire_experimental_statistics():
    """Experimental crosswire data: the reference test only prints distance
    statistics (``...Test.cxx:115-166``); we additionally bound the mean
    reprojection distance to catch regressions."""
    frames, pts = load_crosswire_phantom(CROSSWIRE_T, CROSSWIRE_P)
    assert frames.t.shape[0] == 54 and pts.shape[0] == 54
    data = (frames, jnp.asarray(pts))
    for ls_type in (ANALYTIC, ITERATIVE):
        est = CrosswireUSCalibrationEstimator(delta=5.0, ls_type=ls_type)
        params, valid = est.lsq_fit(data)
        assert bool(valid)
        d, dmin, dmax, dmean = est.distance_statistics(params, data)
        assert bool(jnp.all(jnp.isfinite(d)))
        assert float(dmean) < 10.0  # mm; experimental tracker noise scale


# --------------------------------------------------------------------------
# RANSAC end-to-end (the reference's example workloads:
# ``examples/crosswireUSCalibration.cxx:66-84``,
# ``examples/pointerUSCalibration.cxx:77-92``,
# ``examples/planeUSCalibration.cxx:60-90`` — estimate robustly from
# outlier-contaminated data, then check the recovered calibration at the
# reference test tolerances).
# --------------------------------------------------------------------------

from lsqrrecipes_tpu.ransac import ransac


def test_crosswire_ransac_outliers():
    """~30% outliers (corrupted poses); recovery at reference tolerances
    (``SinglePointTarget...Test.cxx:466-470``)."""
    (noisy, clean, true) = make_crosswire_data(jax.random.PRNGKey(10), n=64, sigma=0.5)
    frames, q = noisy
    n = q.shape[0]
    n_out = n * 3 // 10
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    bad_t = frames.t[-n_out:] + jax.random.uniform(
        k1, (n_out, 3), minval=30.0, maxval=80.0
    ) * jnp.sign(jax.random.normal(k2, (n_out, 3)))
    frames = Frame(frames.r, frames.t.at[-n_out:].set(bad_t))

    est = CrosswireUSCalibrationEstimator(delta=3.0)
    res = ransac(est, (frames, q), jax.random.PRNGKey(12), num_hypotheses=2048)
    assert bool(res.valid)
    assert float(res.inlier_fraction) > 0.6
    # The corrupted tail is excluded from the consensus.
    assert int(jnp.sum(res.consensus[-n_out:])) <= n_out // 5
    _check_crosswire(res.params, true)


def test_pointer_ransac_outliers():
    """~30% outliers (corrupted pointer-tip positions)."""
    (noisy, clean, true) = make_pointer_data(jax.random.PRNGKey(13), n=64, sigma=0.5)
    frames, q, p = noisy
    n = q.shape[0]
    n_out = n * 3 // 10
    k1, k2 = jax.random.split(jax.random.PRNGKey(14))
    bad_p = p[-n_out:] + jax.random.uniform(
        k1, (n_out, 3), minval=30.0, maxval=80.0
    ) * jnp.sign(jax.random.normal(k2, (n_out, 3)))
    p = p.at[-n_out:].set(bad_p)

    est = PointerUSCalibrationEstimator(delta=3.0)
    res = ransac(est, (frames, q, p), jax.random.PRNGKey(15), num_hypotheses=2048)
    assert bool(res.valid)
    assert float(res.inlier_fraction) > 0.6
    assert int(jnp.sum(res.consensus[-n_out:])) <= n_out // 5
    _check_pointer(res.params, true)


def test_plane_phantom_ransac_outliers():
    """k = 31 minimal samples inside RANSAC (the SURVEY hard part).

    15% outliers: with k = 31 the clean-sample probability is 0.85^31 ~
    0.65%, so a 16384-hypothesis budget expects ~107 clean samples (the
    reference's adaptive variant would run a comparable budget at
    w = 0.85, p = 0.999).  Tolerances from ``PlanePhantom...Test.cxx:286-288``
    (3.0 mm / 5 degrees).
    """
    (noisy, clean, true) = make_plane_phantom_data(
        jax.random.PRNGKey(16), n=80, sigma=0.5
    )
    frames, q = noisy
    n = q.shape[0]
    n_out = n * 15 // 100
    k1, k2 = jax.random.split(jax.random.PRNGKey(17))
    # Outliers violate the plane constraint: shove poses along the normal.
    shift = jax.random.uniform(k1, (n_out, 1), minval=20.0, maxval=60.0) * jnp.sign(
        jax.random.normal(k2, (n_out, 1))
    )
    bad_t = frames.t[-n_out:] + shift * true["r1_row3"]
    frames = Frame(frames.r, frames.t.at[-n_out:].set(bad_t))

    est = PlanePhantomUSCalibrationEstimator(delta=2.0)
    res = ransac(
        est, (frames, q), jax.random.PRNGKey(18), num_hypotheses=16384
    )
    assert bool(res.valid)
    assert float(res.inlier_fraction) > 0.7
    assert int(jnp.sum(res.consensus[-n_out:])) == 0
    _check_plane_phantom(res.params, true, trans_eps=3.0, ang_eps=np.radians(5.0))


# --------------------------------------------------------------------------
# Batched fast-hypothesize path (ops/us_fast.py): f64 normal-equation
# Cholesky fits + Newton-polar orthonormalization + f32 matmul votes.
# --------------------------------------------------------------------------

from lsqrrecipes_tpu.ransac import ransac_structured
from lsqrrecipes_tpu.ransac.sampling import structured_samples


@pytest.mark.parametrize("kind", ["crosswire", "pointer", "plane_phantom"])
def test_us_fast_path_counts_match_f64(kind):
    """fit_and_vote counts agree with the f64 vmapped minimal_fit + agree
    path on the identical hypothesis set (border flips allowed)."""
    if kind == "crosswire":
        noisy, _, _ = make_crosswire_data(jax.random.PRNGKey(0), n=64)
        est = CrosswireUSCalibrationEstimator(delta=3.0)
    elif kind == "plane_phantom":
        noisy, _, _ = make_plane_phantom_data(jax.random.PRNGKey(0), n=64)
        est = PlanePhantomUSCalibrationEstimator(delta=1.0)
    else:
        noisy, _, _ = make_pointer_data(jax.random.PRNGKey(3), n=64)
        est = PointerUSCalibrationEstimator(delta=3.0)
    samples = structured_samples(jax.random.PRNGKey(1), noisy, est.k, 4)
    counts, params = est.fit_and_vote(samples, noisy)
    p64, v64 = jax.vmap(est.minimal_fit)(samples)
    c64 = jnp.where(
        v64, jax.vmap(lambda p: jnp.sum(est.agree(p, noisy)))(p64), -1
    )
    assert int(jnp.max(jnp.abs(counts - c64))) <= 2
    assert int(jnp.max(counts)) == int(jnp.max(c64))


def test_crosswire_structured_ransac_outliers():
    """End-to-end structured driver (fast path) with 30% corrupted poses."""
    (noisy, clean, true) = make_crosswire_data(jax.random.PRNGKey(20), n=64, sigma=0.5)
    frames, q = noisy
    n_out = 64 * 3 // 10
    k1, k2 = jax.random.split(jax.random.PRNGKey(21))
    bad_t = frames.t[-n_out:] + jax.random.uniform(
        k1, (n_out, 3), minval=30.0, maxval=80.0
    ) * jnp.sign(jax.random.normal(k2, (n_out, 3)))
    frames = Frame(frames.r, frames.t.at[-n_out:].set(bad_t))

    est = CrosswireUSCalibrationEstimator(delta=3.0)
    res = ransac_structured(est, (frames, q), jax.random.PRNGKey(22), num_hypotheses=2048)
    assert bool(res.valid)
    assert float(res.inlier_fraction) > 0.6
    _check_crosswire(res.params, true)


def test_pointer_structured_ransac_outliers():
    (noisy, clean, true) = make_pointer_data(jax.random.PRNGKey(23), n=64, sigma=0.5)
    frames, q, p = noisy
    n_out = 64 * 3 // 10
    k1, k2 = jax.random.split(jax.random.PRNGKey(24))
    bad_p = p[-n_out:] + jax.random.uniform(
        k1, (n_out, 3), minval=30.0, maxval=80.0
    ) * jnp.sign(jax.random.normal(k2, (n_out, 3)))
    p = p.at[-n_out:].set(bad_p)

    est = PointerUSCalibrationEstimator(delta=3.0)
    res = ransac_structured(est, (frames, q, p), jax.random.PRNGKey(25), num_hypotheses=2048)
    assert bool(res.valid)
    assert float(res.inlier_fraction) > 0.6
    _check_pointer(res.params, true)


def test_plane_phantom_structured_ransac_outliers():
    """End-to-end k=31 fast path (``examples/planeUSCalibration.cxx:74``
    workload): 15% of poses pushed off the phantom plane.  Same budget
    arithmetic as the generic-path test above: 0.85^31 ~ 0.65% clean-sample
    probability, so 16384 hypotheses expect ~107 clean samples."""
    (noisy, clean, true) = make_plane_phantom_data(
        jax.random.PRNGKey(26), n=64, sigma=0.5
    )
    frames, q = noisy
    n_out = 64 * 15 // 100
    k1, k2 = jax.random.split(jax.random.PRNGKey(27))
    shift = jax.random.uniform(
        k1, (n_out, 1), minval=20.0, maxval=60.0
    ) * jnp.sign(jax.random.normal(k2, (n_out, 1)))
    bad_t = frames.t[-n_out:] + shift * true["r1_row3"]
    frames = Frame(frames.r, frames.t.at[-n_out:].set(bad_t))

    est = PlanePhantomUSCalibrationEstimator(delta=2.0)
    res = ransac_structured(
        est, (frames, q), jax.random.PRNGKey(28), num_hypotheses=16384
    )
    assert bool(res.valid)
    assert float(res.inlier_fraction) > 0.7
    assert int(jnp.sum(res.consensus[-n_out:])) == 0
    _check_plane_phantom(res.params, true, trans_eps=3.0, ang_eps=np.radians(5.0))


def test_us_batched_lsq_fit_matches_per_problem():
    """``lsq_fit_batched`` (vmapped LM, SURVEY §2.7 'LM inner-step
    parallelism'): B independent ITERATIVE crosswire refits in one XLA
    program must match B sequential ``lsq_fit`` calls."""
    B = 4
    est = CrosswireUSCalibrationEstimator(delta=3.0)
    datasets = [
        make_crosswire_data(jax.random.PRNGKey(40 + i), n=32)[0]
        for i in range(B)
    ]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *datasets
    )
    masks = jnp.stack(
        [jnp.arange(32) % (i + 3) != 0 for i in range(B)]
    )  # distinct per-problem masks
    pb, vb = est.lsq_fit_batched(stacked, masks)
    assert pb.shape == (B, est.nparams_lsq) and bool(jnp.all(vb))
    for i in range(B):
        p1, v1 = est.lsq_fit(datasets[i], masks[i])
        assert bool(v1)
        np.testing.assert_allclose(pb[i], p1, rtol=1e-8, atol=1e-8)


def test_plane_phantom_fast_path_rejects_degenerate_samples():
    """Duplicate-observation samples (the replication-padding degeneracy)
    must be gated invalid (counts == -1) by the rank gate."""
    (noisy, clean, true) = make_plane_phantom_data(jax.random.PRNGKey(29), n=40)
    frames, q = noisy
    est = PlanePhantomUSCalibrationEstimator(delta=1.0)
    # every sample = one observation repeated 31 times
    idx = jnp.tile(jnp.arange(8)[:, None], (1, est.k))
    samples = (Frame(frames.r[idx], frames.t[idx]), q[idx])
    counts, params = est.fit_and_vote(samples, noisy)
    assert bool(jnp.all(counts == -1))


def test_euler_extraction_scalar_matches_lanes():
    """Coupling test: the scalar '+sqrt' Euler-ZYX extraction
    (``us_calibration._extract_euler_plus``) and the lanes-form batched one
    (``ops.us_fast.euler_zyx_plus_lanes``) implement the SAME reference
    semantics (``SinglePointTarget...cxx:230-247``) — assert they agree on a
    batch of random rotations including gimbal-zone cases."""
    from lsqrrecipes_tpu.estimators.us_calibration import _extract_euler_plus
    from lsqrrecipes_tpu.ops.us_fast import euler_zyx_plus_lanes

    key = jax.random.PRNGKey(7)
    angles = jax.random.uniform(
        key, (64, 3), minval=-jnp.pi, maxval=jnp.pi
    )
    # Force gimbal-zone wy values (within SMALL_ANGLE of +/- pi/2) on a
    # quarter of the batch, including dead-center and just-inside-the-edge.
    gz = jnp.asarray(
        [jnp.pi / 2, -jnp.pi / 2, jnp.pi / 2 - 0.005, -jnp.pi / 2 + 0.005]
    )
    angles = angles.at[:16, 1].set(jnp.tile(gz, 4))
    rs = jax.vmap(lambda a: _euler_zyx_matrix(a[0], a[1], a[2]))(angles)

    wz_s, wy_s, wx_s = jax.vmap(_extract_euler_plus)(rs)
    r_lanes = [[rs[:, i, j] for j in range(3)] for i in range(3)]
    wz_l, wy_l, wx_l = euler_zyx_plus_lanes(r_lanes)

    np.testing.assert_allclose(np.asarray(wz_l), np.asarray(wz_s), atol=1e-12)
    np.testing.assert_allclose(np.asarray(wy_l), np.asarray(wy_s), atol=1e-12)
    np.testing.assert_allclose(np.asarray(wx_l), np.asarray(wx_s), atol=1e-12)


def test_ds_ritz_projection_matches_f64():
    """The double-single Ritz projection (``us_fast._ds_project``) matches
    the plain-f64 ``W = A V`` on CPU (real f64) to the budget its docstring
    claims: ~2^-35 ||A|| absolute, resolving the near-null column to well
    under the vote-flip threshold.  Run on a synthetic spectrum shaped like
    the phantom's (sigma_31 ~ 2e-7 sigma_0, sigma_30 ~ 1e-5 sigma_0)."""
    import numpy as np

    from lsqrrecipes_tpu.ops.us_fast import _ds_project

    rng = np.random.default_rng(0)
    bsz = 32
    a = rng.normal(scale=100.0, size=(31, 31, bsz))
    u, s, vt = np.linalg.svd(np.moveaxis(a, -1, 0))
    s[:, -1] *= 2e-7 / s[:, -1].mean() * s[:, 0].mean()
    s[:, -2] *= 1e-5 / s[:, -2].mean() * s[:, 0].mean()
    a = np.moveaxis(u @ (s[:, :, None] * vt), 0, -1)
    a_pl = jnp.asarray(a)
    assert a_pl.dtype == jnp.float64
    a32 = a_pl.astype(jnp.float32)
    v_pl = jnp.asarray(np.moveaxis(vt[:, -4:, :], 0, -1), jnp.float32)

    from lsqrrecipes_tpu.ops.us_fast import _ds_gram

    w_s, w_e = _ds_project(a_pl, a32, v_pl, jnp.float64)
    w_ds = np.stack(
        [
            np.asarray(s.astype(jnp.float64) + e.astype(jnp.float64))
            for s, e in zip(w_s, w_e)
        ]
    )
    w_ref = np.asarray(
        jnp.sum(a_pl[None] * v_pl.astype(jnp.float64)[:, None], axis=2)
    )
    amax = np.abs(a).max()
    assert np.abs(w_ds - w_ref).max() < 1e-10 * amax
    # Null column (last v is the near-null direction) to < 1e-3 relative.
    null_err = np.abs(w_ds[3] - w_ref[3]).max()
    assert null_err < 1e-3 * np.abs(w_ref[3]).max()

    # The pair-f32 Ritz matrix resolves the smallest two eigenvalues (the
    # sigma_31^2 / sigma_30^2 pair the rank gate and null extraction need).
    sg = _ds_gram(w_s, w_e, jnp.float64)
    s_ds = np.stack(
        [np.stack([np.asarray(sg[i][j]) for j in range(4)]) for i in range(4)]
    )
    s_ref = np.einsum("qrb,prb->qpb", w_ref, w_ref)
    for bi in range(0, bsz, 7):
        ev_ds = np.linalg.eigvalsh(s_ds[:, :, bi])
        ev_ref = np.linalg.eigvalsh(s_ref[:, :, bi])
        np.testing.assert_allclose(ev_ds, ev_ref, rtol=1e-3)
