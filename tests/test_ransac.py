"""End-to-end batched RANSAC: robustness to outliers across estimators.

The minimum end-to-end slice from SURVEY.md section 7 (stage 4): data in,
robust model out, matching the reference line test criteria; plus the
example-layer scenarios with ~30% outliers
(``examples/Data/augmentedMatrixWithOutliers.txt``,
``examples/Data/pivotCalibrationDataWithOutliers.txt``).
"""

import os

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
from lsqrrecipes_tpu.io import load_augmented_matrix, load_tracked_frames
from lsqrrecipes_tpu.ransac import (
    choose,
    num_tries,
    ransac,
    ransac_adaptive,
    ransac_exhaustive,
    sample_k_subsets,
)
from lsqrrecipes_tpu.ransac.engine import ransac_structured
from lsqrrecipes_tpu.ransac.sampling import structured_samples

EXAMPLES_DATA = "/root/reference/examples/Data"
COS5 = np.cos(np.radians(5.0))


def make_outlier_line(key, n_in=70, n_out=30, sigma=0.5):
    k1, k2, k3 = jax.random.split(key, 3)
    direction = jnp.asarray([0.8, 0.6])
    normal = jnp.asarray([-0.6, 0.8])
    anchor = jnp.asarray([10.0, -5.0])
    t = jnp.linspace(-50, 50, n_in)
    inliers = anchor + t[:, None] * direction + sigma * jax.random.normal(k1, (n_in, 2))
    outliers = jax.random.uniform(k2, (n_out, 2), minval=-60, maxval=60)
    pts = jnp.concatenate([inliers, outliers])
    perm = jax.random.permutation(k3, pts.shape[0])
    return normal, anchor, pts[perm]


def test_sampling_subsets_distinct():
    idx = sample_k_subsets(jax.random.PRNGKey(0), 50, 4, 1000)
    assert idx.shape == (1000, 4)
    assert bool(jnp.all(idx >= 0)) and bool(jnp.all(idx < 50))
    sorted_idx = jnp.sort(idx, axis=1)
    assert bool(jnp.all(sorted_idx[:, 1:] != sorted_idx[:, :-1]))


def test_num_tries_formula():
    # log(1-0.99)/log(1-0.5^2) ~ 16.008 -> +0.5 rounding -> 16
    assert num_tries(0.99, 0.5, 2, 10**9) == 16
    assert choose(10, 3) == 120
    assert choose(100, 50) == 0xFFFFFFFF  # overflow clamp (RANSAC.hxx:253-280)


def test_ransac_line2d_with_outliers():
    normal, anchor, pts = make_outlier_line(jax.random.PRNGKey(1))
    est = Line2DEstimator(delta=1.5)
    res = ransac(est, pts, jax.random.PRNGKey(2), num_hypotheses=2048)
    assert bool(res.valid)
    assert float(res.inlier_fraction) > 0.6
    assert abs(float(jnp.dot(res.params[:2], normal))) > COS5
    d = abs(float(jnp.dot(res.params[2:] - anchor, normal)))
    assert d < 0.5


def test_ransac_deterministic():
    _, _, pts = make_outlier_line(jax.random.PRNGKey(3))
    est = Line2DEstimator(delta=1.5)
    r1 = ransac(est, pts, jax.random.PRNGKey(7), num_hypotheses=512)
    r2 = ransac(est, pts, jax.random.PRNGKey(7), num_hypotheses=512)
    np.testing.assert_array_equal(r1.params, r2.params)
    np.testing.assert_array_equal(r1.consensus, r2.consensus)


def test_ransac_adaptive_line2d():
    normal, anchor, pts = make_outlier_line(jax.random.PRNGKey(4))
    est = Line2DEstimator(delta=1.5)
    res = ransac_adaptive(est, pts, jax.random.PRNGKey(5), batch_size=256)
    assert bool(res.valid)
    assert abs(float(jnp.dot(res.params[:2], normal))) > COS5


def test_ransac_exhaustive_small():
    normal, anchor, pts = make_outlier_line(jax.random.PRNGKey(6), n_in=15, n_out=5)
    est = Line2DEstimator(delta=1.5)
    res = ransac_exhaustive(est, pts)
    assert bool(res.valid)
    assert abs(float(jnp.dot(res.params[:2], normal))) > COS5
    assert int(res.best_count) >= 15 - 2


def test_structured_samples_distinct_and_uniform():
    data = jnp.arange(40.0)[:, None]  # observation id as coordinate
    samples = structured_samples(jax.random.PRNGKey(0), data, 4, groups=8)
    assert samples.shape == (8 * 40, 4, 1)
    ids = samples[..., 0].astype(int)
    # Each hypothesis uses distinct observations (nonzero distinct shifts).
    sorted_ids = jnp.sort(ids, axis=1)
    frac_dup = float(jnp.mean(jnp.any(sorted_ids[:, 1:] == sorted_ids[:, :-1], axis=1)))
    assert frac_dup < 0.05
    # Every observation appears equally often in slot 0 (the permutation).
    counts = jnp.bincount(ids[:, 0], length=40)
    assert bool(jnp.all(counts == 8))


def test_structured_shift_table_single_source():
    """One shift-table definition: the planar US sweep (ops/us_fast), the
    fused sphere sampling planes (ops/sphere_ransac.group_shifts) and
    ``structured_samples`` must all evaluate the IDENTICAL hypothesis index
    set for the same (key, n, k, groups)."""
    from lsqrrecipes_tpu.ops.sphere_ransac import group_shifts
    from lsqrrecipes_tpu.ransac.sampling import structured_shift_table

    n, k, groups = 64, 31, 4
    key = jax.random.PRNGKey(9)
    table = structured_shift_table(n, k, groups)
    assert table.shape == (groups, k)
    assert (table[:, 0] == 0).all()
    # slots 1..k-1: sorted, distinct, nonzero
    assert (np.diff(table[:, 1:], axis=1) > 0).all() and (table[:, 1] > 0).all()

    # Materialized path (engine): index identity data through the sampler.
    samples = structured_samples(key, jnp.arange(n), k, groups)   # [G*n, k]

    # Planar-sweep construction (us_fast.structured_sweep): permutation +
    # static rolls, hypothesis (g, i) slot a = perm[(i + s_ga) % n].
    perm = np.asarray(jax.random.permutation(key, n))
    planar = np.stack(
        [np.stack([np.roll(perm, -int(s)) for s in row]) for row in table]
    )                                                             # [G, k, n]
    planar = np.moveaxis(planar, 1, 2).reshape(groups * n, k)
    np.testing.assert_array_equal(np.asarray(samples), planar)

    # Fused sphere planes use slots 1..k-1 of the same table.
    np.testing.assert_array_equal(
        np.asarray(group_shifts(groups, k, n)), table[:, 1:]
    )


def test_ransac_structured_line2d():
    normal, anchor, pts = make_outlier_line(jax.random.PRNGKey(12))
    est = Line2DEstimator(delta=1.5)
    res = ransac_structured(est, pts, jax.random.PRNGKey(13), num_hypotheses=2000)
    assert bool(res.valid)
    assert abs(float(jnp.dot(res.params[:2], normal))) > COS5


def test_ransac_structured_sphere_fallback_path():
    key = jax.random.PRNGKey(14)
    k1, k2, k3 = jax.random.split(key, 3)
    center = jnp.asarray([5.0, -2.0, 11.0])
    d = jax.random.normal(k1, (80, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    pts = jnp.concatenate(
        [
            center + 25.0 * d + 0.3 * jax.random.normal(k2, (80, 3)),
            jax.random.uniform(k3, (20, 3), minval=-40, maxval=40),
        ]
    )
    est = SphereEstimator(delta=1.0, dim=3)
    res = ransac_structured(est, pts, jax.random.PRNGKey(15), num_hypotheses=4096)
    assert bool(res.valid)
    np.testing.assert_allclose(res.params[:3], center, atol=1.0)


def test_ransac_too_few_data_invalid():
    est = Line2DEstimator(delta=1.0)
    res = ransac(est, jnp.zeros((1, 2)), jax.random.PRNGKey(0))
    assert not bool(res.valid)


def test_ransac_sphere_with_outliers():
    key = jax.random.PRNGKey(11)
    k1, k2, k3 = jax.random.split(key, 3)
    center = jnp.asarray([5.0, -2.0, 11.0])
    radius = 25.0
    d = jax.random.normal(k1, (80, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    inliers = center + radius * d + 0.3 * jax.random.normal(k2, (80, 3))
    outliers = jax.random.uniform(k3, (20, 3), minval=-40, maxval=40)
    pts = jnp.concatenate([inliers, outliers])

    est = SphereEstimator(delta=1.0, dim=3)
    res = ransac(est, pts, jax.random.PRNGKey(12), num_hypotheses=4096)
    assert bool(res.valid)
    np.testing.assert_allclose(res.params[:3], center, atol=1.0)
    np.testing.assert_allclose(res.params[3], radius, atol=1.0)


GOLDEN_LSQ = np.array([-17.7799, 1.1113, -156.865, 146.901, -62.9689, -1042.14])


@pytest.mark.skipif(
    not os.path.exists(os.path.join(EXAMPLES_DATA, "augmentedMatrixWithOutliers.txt")),
    reason="example data not mounted",
)
def test_ransac_dense_outlier_data():
    """The linearEquationSystemSolver example scenario: experimental matrix
    with ~30%% outliers; robust solve should land near the clean golden
    solution where plain least squares does not
    (``examples/linearEquationSystemSolver.cxx``)."""
    data = jnp.asarray(
        load_augmented_matrix(
            os.path.join(EXAMPLES_DATA, "augmentedMatrixWithOutliers.txt"), 7
        )
    )
    est = DenseLinearSystemEstimator(delta=1.0, n=6)
    res = ransac(est, data, jax.random.PRNGKey(21), num_hypotheses=8192)
    assert bool(res.valid)
    np.testing.assert_allclose(res.params, GOLDEN_LSQ, atol=2.0)

    plain, _ = est.lsq_fit(data)
    assert float(jnp.max(jnp.abs(plain - jnp.asarray(GOLDEN_LSQ)))) > float(
        jnp.max(jnp.abs(res.params - jnp.asarray(GOLDEN_LSQ)))
    )


@pytest.mark.skipif(
    not os.path.exists(
        os.path.join(EXAMPLES_DATA, "pivotCalibrationDataWithOutliers.txt")
    ),
    reason="example data not mounted",
)
def test_ransac_pivot_outlier_data():
    """Pivot calibration with outlier poses (``examples/pivotCalibration.cxx``)."""
    frames = load_tracked_frames(
        os.path.join(EXAMPLES_DATA, "pivotCalibrationDataWithOutliers.txt")
    )
    est = PivotCalibrationEstimator(delta=1.0)
    res = ransac(est, frames, jax.random.PRNGKey(31), num_hypotheses=2048)
    assert bool(res.valid)
    assert float(res.inlier_fraction) > 0.5
    # Robust consensus refit is self-consistent: all consensus poses agree.
    agree = est.agree(res.params, frames)
    assert int(jnp.sum(agree)) >= int(res.best_count) * 0.8


def test_ransac_batched_fleet_matches_per_dataset():
    """Fleet entry point: D independent crosswire calibrations in one XLA
    program must reproduce the per-dataset structured pipeline exactly
    (identical keys -> identical hypothesis sets -> identical winners)."""
    from lsqrrecipes_tpu.estimators.us_calibration import (
        CrosswireUSCalibrationEstimator,
    )
    from lsqrrecipes_tpu.ransac import ransac_batched
    from tests.test_us_calibration import make_crosswire_data

    D, n = 3, 48
    datasets = [
        make_crosswire_data(jax.random.PRNGKey(60 + i), n=n)[0]
        for i in range(D)
    ]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *datasets
    )
    keys = jax.random.split(jax.random.PRNGKey(61), D)
    est = CrosswireUSCalibrationEstimator(delta=3.0)
    fleet = ransac_batched(est, stacked, keys, num_hypotheses=4 * n)

    assert fleet.params.shape == (D, est.nparams_lsq)
    assert bool(jnp.all(fleet.valid))
    for i in range(D):
        single = ransac_structured(
            est, datasets[i], keys[i], num_hypotheses=4 * n
        )
        assert int(fleet.best_count[i]) == int(single.best_count)
        np.testing.assert_array_equal(fleet.consensus[i], single.consensus)
        np.testing.assert_allclose(
            fleet.params[i], single.params, rtol=1e-9, atol=1e-9
        )


def test_ransac_adaptive_fast_paths_agree_with_gather():
    """The adaptive driver's fast rounds (fused sweep for line2d; structured
    sweep for crosswire) find the same structure as the faithful gather
    rounds — and the fast path is the default (``path="auto"``)."""
    normal, anchor, pts = make_outlier_line(jax.random.PRNGKey(14))
    est = Line2DEstimator(delta=1.5)
    fast = ransac_adaptive(est, pts, jax.random.PRNGKey(15), batch_size=512)
    slow = ransac_adaptive(
        est, pts, jax.random.PRNGKey(15), batch_size=512, path="gather"
    )
    for res in (fast, slow):
        assert bool(res.valid)
        assert abs(float(jnp.dot(res.params[:2], normal))) > COS5
    # Both consensus sets capture the inlier structure.
    assert float(fast.inlier_fraction) > 0.6
    assert float(slow.inlier_fraction) > 0.6


def test_ransac_adaptive_structured_sweep_estimator():
    """Adaptive rounds route through ``structured_sweep`` for the
    US-calibration estimators (no fused family, own planar path)."""
    from lsqrrecipes_tpu.estimators import CrosswireUSCalibrationEstimator
    from lsqrrecipes_tpu.geometry import Frame
    from lsqrrecipes_tpu.synthetic import make_crosswire_data

    (frames, q), _, true = make_crosswire_data(jax.random.PRNGKey(16), n=40)
    # 20% corrupted poses
    t = frames.t.at[-8:].add(60.0)
    est = CrosswireUSCalibrationEstimator(delta=3.0)
    res = ransac_adaptive(
        est, (Frame(frames.r, t), q), jax.random.PRNGKey(17), batch_size=160
    )
    assert bool(res.valid)
    assert float(res.inlier_fraction) > 0.6
