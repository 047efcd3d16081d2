"""Multi-chip sharding on the 8-device virtual CPU mesh.

Third test tier per SURVEY.md section 4: single-chip and sharded execution
must agree (the reference never tests anything distributed; this tier is new
capability).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsqrrecipes_tpu.estimators import (
    DenseLinearSystemEstimator,
    Line2DEstimator,
    PivotCalibrationEstimator,
    SphereEstimator,
)
from lsqrrecipes_tpu.parallel import default_mesh, sharded_lsq_fit, sharded_ransac
from lsqrrecipes_tpu.ransac import ransac
from tests.test_ransac import make_outlier_line

CPUS = jax.devices("cpu")


def test_default_mesh_shapes():
    mesh = default_mesh(devices=CPUS)
    assert mesh.shape["hypotheses"] == 8 and mesh.shape["data"] == 1
    mesh2 = default_mesh(shape=(4, 2), devices=CPUS)
    assert mesh2.shape["hypotheses"] == 4 and mesh2.shape["data"] == 2


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_ransac_line_matches_single_chip(shape):
    normal, anchor, pts = make_outlier_line(jax.random.PRNGKey(1), n_in=72, n_out=24)
    est = Line2DEstimator(delta=1.5)
    mesh = default_mesh(shape=shape, devices=CPUS)

    res_sharded = sharded_ransac(
        est, pts, jax.random.PRNGKey(2), num_hypotheses=2048, mesh=mesh
    )
    res_single = ransac(est, pts, jax.random.PRNGKey(2), num_hypotheses=2048)

    assert bool(res_sharded.valid)
    # Same key, same hypothesis set -> identical selection.
    assert int(res_sharded.best_count) == int(res_single.best_count)
    np.testing.assert_array_equal(res_sharded.consensus, res_single.consensus)
    np.testing.assert_allclose(res_sharded.params, res_single.params, atol=1e-9)


def test_sharded_ransac_sphere():
    key = jax.random.PRNGKey(11)
    k1, k2, k3 = jax.random.split(key, 3)
    center = jnp.asarray([5.0, -2.0, 11.0])
    d = jax.random.normal(k1, (96, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    pts = jnp.concatenate(
        [
            center + 25.0 * d + 0.3 * jax.random.normal(k2, (96, 3)),
            jax.random.uniform(k3, (32, 3), minval=-40, maxval=40),
        ]
    )
    est = SphereEstimator(delta=1.0, dim=3)
    mesh = default_mesh(shape=(4, 2), devices=CPUS)
    res = sharded_ransac(est, pts, jax.random.PRNGKey(12), num_hypotheses=2048, mesh=mesh)
    assert bool(res.valid)
    np.testing.assert_allclose(res.params[:3], center, atol=1.0)
    np.testing.assert_allclose(res.params[3], 25.0, atol=1.0)


def test_sharded_ransac_pivot_frames():
    """Pytree data (Frame) shards over the observation axis too."""
    key = jax.random.PRNGKey(21)
    from lsqrrecipes_tpu.geometry import Frame, rotations

    k1, k2 = jax.random.split(key)
    q = jax.random.normal(k1, (64, 4))
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    r = rotations.matrix_from_quaternion(q)
    t_drf = jnp.asarray([1.0, 2.0, 3.0])
    t_w = jnp.asarray([-5.0, 4.0, 10.0])
    t = t_w - jnp.einsum("nij,j->ni", r, t_drf)
    t = t + 0.01 * jax.random.normal(k2, t.shape)
    frames = Frame(r, t)

    est = PivotCalibrationEstimator(delta=1.0)
    mesh = default_mesh(shape=(2, 4), devices=CPUS)
    res = sharded_ransac(est, frames, jax.random.PRNGKey(22), num_hypotheses=512, mesh=mesh)
    assert bool(res.valid)
    np.testing.assert_allclose(res.params[:3], t_drf, atol=0.1)
    np.testing.assert_allclose(res.params[3:], t_w, atol=0.1)


@pytest.mark.parametrize(
    "kind,shape",
    [
        ("crosswire", (8, 1)),
        ("crosswire", (4, 2)),
        ("pointer", (8, 1)),
        ("plane_phantom", (4, 2)),
    ],
)
def test_sharded_us_sweep_matches_single_device(kind, shape):
    """Hypothesis-axis sharded US-calibration sweeps (the reference's three
    US example workloads, ``crosswireUSCalibration.cxx:73`` /
    ``pointerUSCalibration.cxx:84`` / ``planeUSCalibration.cxx:74``) must
    reproduce the single-device structured sweep exactly — same key, same
    hypothesis set, same counts/params, just sharded on the batch axis."""
    from lsqrrecipes_tpu.estimators import (
        CrosswireUSCalibrationEstimator,
        PlanePhantomUSCalibrationEstimator,
        PointerUSCalibrationEstimator,
    )
    from lsqrrecipes_tpu.parallel import sharded_us_sweep
    from tests.test_us_calibration import (
        make_crosswire_data,
        make_plane_phantom_data,
        make_pointer_data,
    )

    if kind == "crosswire":
        data, _, _ = make_crosswire_data(jax.random.PRNGKey(50), n=64)
        est = CrosswireUSCalibrationEstimator(delta=3.0)
    elif kind == "pointer":
        data, _, _ = make_pointer_data(jax.random.PRNGKey(51), n=64)
        est = PointerUSCalibrationEstimator(delta=3.0)
    else:
        data, _, _ = make_plane_phantom_data(jax.random.PRNGKey(52), n=64)
        est = PlanePhantomUSCalibrationEstimator(delta=1.0)

    mesh = default_mesh(shape=shape, devices=CPUS)
    key = jax.random.PRNGKey(53)
    groups = 8
    counts_s, params_s = sharded_us_sweep(
        kind, est, data, key, groups, mesh=mesh
    )
    counts_1, params_1 = est.structured_sweep(data, key, groups)
    assert int(jnp.max(counts_1)) > 32  # the sweep actually finds structure
    np.testing.assert_array_equal(np.asarray(counts_s), np.asarray(counts_1))
    np.testing.assert_allclose(
        np.asarray(params_s), np.asarray(params_1), rtol=1e-5, atol=1e-5
    )


def test_sharded_lsq_fit_matches_local():
    key = jax.random.PRNGKey(31)
    a = jax.random.uniform(key, (160, 5), minval=-1, maxval=1)
    x_true = jnp.arange(1.0, 6.0)
    data = jnp.concatenate([a, (a @ x_true)[:, None]], axis=1)
    est = DenseLinearSystemEstimator(delta=0.5, n=5)

    mesh = default_mesh(("data",), devices=CPUS)
    params, valid = sharded_lsq_fit(est, data, mesh=mesh)
    assert bool(valid)
    np.testing.assert_allclose(params, x_true, atol=1e-9)


def test_sharded_us_feature_lm_matches_unsharded():
    """Observation-sharded stats-LM refit (ONE [F, F] psum) equals the
    single-device solve on an 8-device data mesh."""
    import numpy as np
    from jax.sharding import Mesh

    from lsqrrecipes_tpu.estimators.us_calibration import (
        ANALYTIC,
        PointerUSCalibrationEstimator,
    )
    from lsqrrecipes_tpu.linalg import LMConfig
    from lsqrrecipes_tpu.linalg import stats_lm
    from lsqrrecipes_tpu.parallel.sharded import sharded_us_feature_lm
    from lsqrrecipes_tpu.synthetic import make_pointer_data

    n = 64
    (frames, q, p), _, _ = make_pointer_data(jax.random.PRNGKey(4), n=n)
    data = (frames, q, p)
    est = PointerUSCalibrationEstimator(delta=3.0, ls_type=ANALYTIC)
    params, ok = est.lsq_fit(data)
    assert bool(ok)
    x0 = params[:8]
    mask = jnp.arange(n) % 5 != 0
    config = LMConfig(max_iters=200)

    devices = np.asarray(jax.devices("cpu")[:8])
    mesh = Mesh(devices, ("data",))
    res_sh = sharded_us_feature_lm(
        "pointer", data, x0, mask, config=config, mesh=mesh
    )
    res_1 = stats_lm.us_feature_lm("pointer", data, x0, mask, config=config)

    assert bool(res_sh.converged) and bool(res_1.converged)
    np.testing.assert_allclose(np.asarray(res_sh.x), np.asarray(res_1.x),
                               rtol=1e-8, atol=1e-9)
