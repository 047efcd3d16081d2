"""Generic whole-sweep fused kernels — logic validated in interpret mode.

Each family's kernel best-count must equal the max vote over the exact same
hypothesis set reconstructed in pure jnp (``reference_samples``), and the
winner's parameters must re-achieve that count through the estimator's own
``agree``.  (Numerics are also verified on the real chip by the benchmark
harness; interpret mode does not catch Mosaic layout miscompiles.)
"""

import functools

import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl

from lsqrrecipes_tpu.estimators import (
    ALGEBRAIC,
    Line2DEstimator,
    LineEstimator,
    PlaneEstimator,
    SphereEstimator,
)
from lsqrrecipes_tpu.ops import fused_sweep as fs
from lsqrrecipes_tpu.ransac import ransac_fused_sweep


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _outliered(key, n, d, make_inlier):
    """80% structured inliers + 20% uniform outliers, f32."""
    k1, k2, k3 = jax.random.split(key, 3)
    n_in = n - n // 5
    inl = make_inlier(k1, n_in) + 0.2 * jax.random.normal(k2, (n_in, d), jnp.float32)
    out = jax.random.uniform(k3, (n // 5, d), jnp.float32, -40, 40)
    return jnp.concatenate([inl, out]).astype(jnp.float32)


def _sphere_cloud(key, n):
    def inlier(k, m):
        v = jax.random.normal(k, (m, 3), jnp.float32)
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        return jnp.asarray([5.0, -2.0, 11.0]) + 25.0 * v

    return _outliered(key, n, 3, inlier)


def _plane_cloud(key, n):
    def inlier(k, m):
        uv = jax.random.uniform(k, (m, 2), jnp.float32, -30, 30)
        e1 = jnp.asarray([1.0, 0.0, 0.5]) / jnp.sqrt(1.25)
        e2 = jnp.asarray([0.0, 1.0, -0.2])
        e2 = e2 / jnp.linalg.norm(e2)
        return jnp.asarray([2.0, -1.0, 4.0]) + uv[:, :1] * e1 + uv[:, 1:] * e2

    return _outliered(key, n, 3, inlier)


def _line3d_cloud(key, n):
    def inlier(k, m):
        t = jax.random.uniform(k, (m, 1), jnp.float32, -40, 40)
        u = jnp.asarray([0.6, -0.64, 0.48])
        u = u / jnp.linalg.norm(u)
        return jnp.asarray([1.0, 2.0, -3.0]) + t * u

    return _outliered(key, n, 3, inlier)


def _line2d_cloud(key, n):
    def inlier(k, m):
        t = jax.random.uniform(k, (m, 1), jnp.float32, -40, 40)
        u = jnp.asarray([0.8, 0.6])
        return jnp.asarray([-2.0, 5.0]) + t * u

    return _outliered(key, n, 2, inlier)


CASES = [
    ("sphere3d", _sphere_cloud, lambda: SphereEstimator(delta=1.0, dim=3, ls_type=ALGEBRAIC)),
    ("plane3d", _plane_cloud, lambda: PlaneEstimator(delta=1.0, dim=3)),
    ("line3d", _line3d_cloud, lambda: LineEstimator(delta=1.0, dim=3)),
    ("line2d", _line2d_cloud, lambda: Line2DEstimator(delta=1.0)),
]


@pytest.mark.parametrize("family,cloud,make_est", CASES, ids=[c[0] for c in CASES])
def test_fused_sweep_matches_reference(interpret_pallas, family, cloud, make_est):
    n, total_groups = 256, 6
    pts = cloud(jax.random.PRNGKey(3), n)
    est = make_est()

    bc, bp = fs.fused_sweep(family, pts, jax.random.PRNGKey(7), total_groups, 1.0)

    samples = fs.reference_samples(family, pts, jax.random.PRNGKey(7), total_groups)
    p_ref, v_ref = jax.vmap(est.minimal_fit)(jnp.asarray(samples, jnp.float64))
    counts = jax.vmap(lambda p: jnp.sum(est.agree(p, pts)))(p_ref)
    cref = int(jnp.max(jnp.where(v_ref, counts, 0)))
    # f32 kernel vs f64 reference: individual border points may flip.
    assert abs(int(bc) - cref) <= 1
    achieved = int(jnp.sum(est.agree(jnp.asarray(bp, pts.dtype), pts)))
    assert abs(achieved - int(bc)) <= 1
    assert int(bc) > (4 * n) // 5 - n // 10  # found the structure


def test_fused_sweep_groups_per_step(interpret_pallas):
    # gps > 1 evaluates the same hypothesis set (total_groups % gps == 0).
    n, total_groups = 256, 8
    pts = _sphere_cloud(jax.random.PRNGKey(3), n)
    bc1, bp1 = fs.fused_sweep("sphere3d", pts, jax.random.PRNGKey(7), total_groups, 1.0)
    bc2, bp2 = fs.fused_sweep(
        "sphere3d", pts, jax.random.PRNGKey(7), total_groups, 1.0, groups_per_step=4
    )
    assert int(bc1) == int(bc2)
    assert jnp.allclose(bp1, bp2)


def test_fused_sweep_vote_subsample(interpret_pallas):
    # Preemptive scoring: subsample count <= full count; winner still finds
    # the dominant structure and its full re-vote matches the exact sweep's.
    n, total_groups = 256, 8
    pts = _plane_cloud(jax.random.PRNGKey(4), n)
    est = PlaneEstimator(delta=1.0, dim=3)
    bc_sub, bp_sub = fs.fused_sweep(
        "plane3d", pts, jax.random.PRNGKey(7), total_groups, 1.0, vote_subsample=128
    )
    assert int(bc_sub) <= 128
    full = int(jnp.sum(est.agree(jnp.asarray(bp_sub, pts.dtype), pts)))
    assert full > (4 * n) // 5 - n // 10

    res = ransac_fused_sweep(
        est, pts, jax.random.PRNGKey(1), num_hypotheses=2048, vote_subsample=128
    )
    assert bool(res.valid)
    # Engine re-votes the winner on the full data.
    assert int(res.best_count) == int(jnp.sum(res.consensus))
    assert float(res.inlier_fraction) > 0.6


def _pivot_frames(key, n):
    """Tracked-tool poses pivoting about a fixed point + 20% outliers."""
    from lsqrrecipes_tpu.geometry import Frame, rotations

    k1, k2, k3, k4 = jax.random.split(key, 4)
    n_in = n - n // 5
    t_d = jnp.asarray([10.0, -5.0, 2.0])
    t_w = jnp.asarray([100.0, 50.0, -30.0])

    def rand_rot(k, m):
        q = jax.random.normal(k, (m, 4))
        return rotations.matrix_from_quaternion(
            q / jnp.linalg.norm(q, axis=1, keepdims=True)
        )

    r_in = rand_rot(k1, n_in)
    t_in = t_w - jnp.einsum("nij,j->ni", r_in, t_d)
    t_in = t_in + 0.05 * jax.random.normal(k2, (n_in, 3))
    r_out = rand_rot(k3, n // 5)
    t_out = jax.random.uniform(k4, (n // 5, 3), minval=-200.0, maxval=200.0)
    return Frame(
        jnp.concatenate([r_in, r_out]), jnp.concatenate([t_in, t_out])
    )


def test_fused_sweep_pivot_matches_reference(interpret_pallas):
    from lsqrrecipes_tpu.estimators import PivotCalibrationEstimator

    n, total_groups = 256, 6
    frames = _pivot_frames(jax.random.PRNGKey(21), n)
    est = PivotCalibrationEstimator(delta=1.0)

    bc, bp = fs.fused_sweep("pivot", frames, jax.random.PRNGKey(7), total_groups, 1.0)

    feats = fs.reference_samples("pivot", frames, jax.random.PRNGKey(7), total_groups)
    from lsqrrecipes_tpu.geometry import Frame

    sample_frames = Frame(
        jnp.asarray(feats[:, :, 0:9], jnp.float64).reshape(-1, 3, 3, 3),
        jnp.asarray(feats[:, :, 9:12], jnp.float64),
    )
    p_ref, v_ref = jax.vmap(est.minimal_fit)(sample_frames)
    counts = jax.vmap(lambda p: jnp.sum(est.agree(p, frames)))(p_ref)
    cref = int(jnp.max(jnp.where(v_ref, counts, 0)))
    assert abs(int(bc) - cref) <= 1
    achieved = int(jnp.sum(est.agree(jnp.asarray(bp, jnp.float64), frames)))
    assert abs(achieved - int(bc)) <= 1
    assert int(bc) > (4 * n) // 5 - n // 10


def test_engine_fused_driver_pivot(interpret_pallas):
    from lsqrrecipes_tpu.estimators import PivotCalibrationEstimator

    n = 256
    frames = _pivot_frames(jax.random.PRNGKey(22), n)
    est = PivotCalibrationEstimator(delta=1.0)
    result = ransac_fused_sweep(est, frames, jax.random.PRNGKey(1), num_hypotheses=1024)
    assert bool(result.valid)
    assert float(result.inlier_fraction) > 0.6
    # Refit recovers the planted calibration.
    assert jnp.max(jnp.abs(result.params[:3] - jnp.asarray([10.0, -5.0, 2.0]))) < 0.1
    assert jnp.max(jnp.abs(result.params[3:] - jnp.asarray([100.0, 50.0, -30.0]))) < 0.1


def _absor_pairs(key, n):
    """Corresponding point pairs under a rigid transform + 20% outliers."""
    from lsqrrecipes_tpu.geometry import rotations

    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jnp.asarray([0.9, 0.2, -0.3, 0.1])
    r = rotations.matrix_from_quaternion(q / jnp.linalg.norm(q))
    t = jnp.asarray([12.0, -7.0, 30.0])
    first = jax.random.uniform(k1, (n, 3), minval=-100.0, maxval=100.0)
    second = first @ r.T + t + 0.1 * jax.random.normal(k2, (n, 3))
    n_out = n // 5
    bad = jax.random.uniform(k3, (n_out, 3), minval=-100.0, maxval=100.0)
    second = second.at[-n_out:].set(bad)
    return (first, second), (r, t)


def test_fused_sweep_absolute_orientation(interpret_pallas):
    from lsqrrecipes_tpu.estimators import AbsoluteOrientationEstimator

    n, total_groups = 256, 6
    data, (r_true, t_true) = _absor_pairs(jax.random.PRNGKey(31), n)
    est = AbsoluteOrientationEstimator(delta=1.0)

    bc, bp = fs.fused_sweep(
        "absolute_orientation", data, jax.random.PRNGKey(7), total_groups, 1.0
    )
    assert bp.shape == (7,)  # postprocessed to [q, t]

    feats = fs.reference_samples(
        "absolute_orientation", data, jax.random.PRNGKey(7), total_groups
    )
    samples = (
        jnp.asarray(feats[:, :, 0:3], jnp.float64),
        jnp.asarray(feats[:, :, 3:6], jnp.float64),
    )
    p_ref, v_ref = jax.vmap(est.minimal_fit)(samples)
    counts = jax.vmap(lambda p: jnp.sum(est.agree(p, data)))(p_ref)
    cref = int(jnp.max(jnp.where(v_ref, counts, 0)))
    assert abs(int(bc) - cref) <= 1
    achieved = int(jnp.sum(est.agree(jnp.asarray(bp, jnp.float64), data)))
    assert abs(achieved - int(bc)) <= 1
    assert int(bc) > (4 * n) // 5 - n // 10


def test_engine_fused_driver_absolute_orientation(interpret_pallas):
    from lsqrrecipes_tpu.estimators import AbsoluteOrientationEstimator
    from lsqrrecipes_tpu.geometry import rotations

    n = 256
    data, (r_true, t_true) = _absor_pairs(jax.random.PRNGKey(32), n)
    est = AbsoluteOrientationEstimator(delta=1.0)
    result = ransac_fused_sweep(est, data, jax.random.PRNGKey(1), num_hypotheses=1024)
    assert bool(result.valid)
    assert float(result.inlier_fraction) > 0.6
    r_fit = rotations.matrix_from_quaternion(
        result.params[:4] / jnp.linalg.norm(result.params[:4])
    )
    assert jnp.max(jnp.abs(r_fit - r_true)) < 0.01
    assert jnp.max(jnp.abs(result.params[4:] - t_true)) < 0.2


def _ray_bundle(key, n):
    """Rays through a common point (with jittered origins) + 20% outliers."""
    from lsqrrecipes_tpu.geometry import Ray3D

    k1, k2, k3, k4 = jax.random.split(key, 4)
    target = jnp.asarray([20.0, -10.0, 35.0])
    n_in = n - n // 5
    origins = jax.random.uniform(k1, (n_in, 3), minval=-100.0, maxval=100.0)
    jittered = target + 0.1 * jax.random.normal(k2, (n_in, 3))
    dirs = jittered - origins
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    o_out = jax.random.uniform(k3, (n // 5, 3), minval=-100.0, maxval=100.0)
    d_out = jax.random.normal(k4, (n // 5, 3))
    d_out = d_out / jnp.linalg.norm(d_out, axis=1, keepdims=True)
    return Ray3D(
        jnp.concatenate([origins, o_out]), jnp.concatenate([dirs, d_out])
    )


def test_fused_sweep_ray3d(interpret_pallas):
    from lsqrrecipes_tpu.estimators import RayIntersectionEstimator
    from lsqrrecipes_tpu.geometry import Ray3D

    n, total_groups = 256, 6
    rays = _ray_bundle(jax.random.PRNGKey(41), n)
    est = RayIntersectionEstimator(delta=1.0, min_angular_deviation=0.01)

    bc, bp = fs.fused_sweep(
        "ray3d", rays, jax.random.PRNGKey(7), total_groups, est.fused_delta
    )

    feats = fs.reference_samples("ray3d", rays, jax.random.PRNGKey(7), total_groups)
    samples = Ray3D(
        jnp.asarray(feats[:, :, 0:3], jnp.float64),
        jnp.asarray(feats[:, :, 3:6], jnp.float64),
    )
    p_ref, v_ref = jax.vmap(est.minimal_fit)(samples)
    counts = jax.vmap(lambda p: jnp.sum(est.agree(p, rays)))(p_ref)
    cref = int(jnp.max(jnp.where(v_ref, counts, 0)))
    assert abs(int(bc) - cref) <= 1
    achieved = int(jnp.sum(est.agree(jnp.asarray(bp, jnp.float64), rays)))
    assert abs(achieved - int(bc)) <= 1
    assert int(bc) > (4 * n) // 5 - n // 10


def test_engine_fused_driver_ray3d(interpret_pallas):
    from lsqrrecipes_tpu.estimators import RayIntersectionEstimator

    n = 256
    rays = _ray_bundle(jax.random.PRNGKey(42), n)
    est = RayIntersectionEstimator(delta=1.0, min_angular_deviation=0.01)
    result = ransac_fused_sweep(est, rays, jax.random.PRNGKey(1), num_hypotheses=1024)
    assert bool(result.valid)
    assert float(result.inlier_fraction) > 0.6
    assert jnp.max(jnp.abs(result.params - jnp.asarray([20.0, -10.0, 35.0]))) < 0.2


def _dense_rows(key, n):
    """Augmented rows [a | b] with a planted 6-vector solution + outliers."""
    k1, k2, k3 = jax.random.split(key, 3)
    x_true = jnp.asarray([1.5, -2.0, 0.5, 3.0, -1.0, 2.5])
    a = jax.random.uniform(k1, (n, 6), minval=-10.0, maxval=10.0)
    b = a @ x_true + 0.05 * jax.random.normal(k2, (n,))
    b = b.at[-(n // 5):].add(
        jax.random.uniform(k3, (n // 5,), minval=5.0, maxval=50.0)
    )
    return jnp.concatenate([a, b[:, None]], axis=1), x_true


def test_fused_sweep_dense_linear(interpret_pallas):
    from lsqrrecipes_tpu.estimators import DenseLinearSystemEstimator

    n, total_groups = 256, 6
    rows, x_true = _dense_rows(jax.random.PRNGKey(51), n)
    est = DenseLinearSystemEstimator(delta=1.0, n=6)

    bc, bp = fs.fused_sweep("dense_linear6", rows, jax.random.PRNGKey(7), total_groups, 1.0)

    samples = fs.reference_samples("dense_linear6", rows, jax.random.PRNGKey(7), total_groups)
    p_ref, v_ref = jax.vmap(est.minimal_fit)(jnp.asarray(samples, jnp.float64))
    counts = jax.vmap(lambda p: jnp.sum(est.agree(p, rows)))(p_ref)
    cref = int(jnp.max(jnp.where(v_ref, counts, 0)))
    assert abs(int(bc) - cref) <= 1
    achieved = int(jnp.sum(est.agree(jnp.asarray(bp, jnp.float64), rows)))
    assert abs(achieved - int(bc)) <= 1
    assert int(bc) > (4 * n) // 5 - n // 10


def test_engine_fused_driver_dense_linear(interpret_pallas):
    from lsqrrecipes_tpu.estimators import DenseLinearSystemEstimator

    n = 256
    rows, x_true = _dense_rows(jax.random.PRNGKey(52), n)
    est = DenseLinearSystemEstimator(delta=1.0, n=6)
    result = ransac_fused_sweep(est, rows, jax.random.PRNGKey(1), num_hypotheses=2048)
    assert bool(result.valid)
    assert float(result.inlier_fraction) > 0.6
    assert jnp.max(jnp.abs(result.params - x_true)) < 0.05


def test_dot_f32x3_accuracy():
    # The 3-pass bf16-split product must be ~f32-accurate at tracker
    # magnitudes where a single bf16 pass (4e-3 relative) fails.
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    p = jax.random.uniform(k1, (16, 256), jnp.float32, -250.0, 250.0)
    a = jax.random.uniform(k2, (16, 128), jnp.float32, -2.0, 2.0)
    got = fs._dot_f32x3(p, a)
    exact = jnp.einsum(
        "kp,kh->ph", jnp.asarray(p, jnp.float64), jnp.asarray(a, jnp.float64)
    )
    # The dropped lo*lo term leaves a tiny ABSOLUTE residue (~sum of
    # |p_lo|*|a_lo| ~ 0.03 at these magnitudes) — what matters for the
    # votes is that it is far below delta and far below one bf16 pass.
    err = float(jnp.max(jnp.abs(got - exact)))
    assert err < 0.1
    coarse = jnp.einsum(
        "kp,kh->ph",
        p.astype(jnp.bfloat16).astype(jnp.float32),
        a.astype(jnp.bfloat16).astype(jnp.float32),
    )
    err_coarse = float(jnp.max(jnp.abs(coarse - exact)))
    assert err_coarse > 10 * err


def test_fit_size_and_padding():
    assert fs.fit_size(128, 4) == 128
    assert fs.fit_size(129, 4) == 256
    assert fs.fit_size(481, 3) == 512
    assert fs.fit_size(1024, 6) == 1024
    feats = jnp.arange(10.0).reshape(5, 2)
    padded = fs._pad_features(feats, 8)
    assert padded.shape == (8, 2)
    assert jnp.array_equal(padded[:5], feats)
    assert jnp.array_equal(padded[5:8], feats[:3])


def test_sweep_shift_pool_distinct():
    # All k-slot shift tuples distinct while total_groups <= (4n/128)^k.
    n = 256
    for k_slots in (2, 3, 4):
        m, b, mask = fs.sweep_static(n, k_slots)
        tuples = {
            tuple(fs.shift_units(g, j, b, m, mask) for j in range(k_slots))
            for g in range(m**k_slots)
        }
        assert len(tuples) == m**k_slots


@pytest.mark.parametrize("family,cloud,make_est", CASES, ids=[c[0] for c in CASES])
def test_engine_fused_driver(interpret_pallas, family, cloud, make_est):
    n = 256
    pts = cloud(jax.random.PRNGKey(11), n)
    est = make_est()
    result = ransac_fused_sweep(est, pts, jax.random.PRNGKey(1), num_hypotheses=1024)
    assert bool(result.valid)
    assert float(result.inlier_fraction) > 0.6
    # Refit params agree with the consensus it was computed from.
    refit_inliers = int(jnp.sum(est.agree(result.params, pts)))
    assert refit_inliers >= int(0.9 * float(result.best_count))


def test_sharded_fused_sweep(interpret_pallas):
    # Mesh-sharded sweep == max over per-shard single-device sweeps with
    # rank-folded keys; winner params broadcast to all shards.
    import numpy as np
    from jax.sharding import Mesh

    from lsqrrecipes_tpu.parallel import sharded_fused_sweep

    n, total_groups, h = 256, 8, 4
    pts = _sphere_cloud(jax.random.PRNGKey(5), n)
    key = jax.random.PRNGKey(9)
    devices = jax.devices("cpu")[:h]
    mesh = Mesh(np.asarray(devices), ("hypotheses",))

    count, params = sharded_fused_sweep(
        "sphere3d", pts, key, total_groups, 1.0, mesh=mesh
    )

    per_shard = [
        fs.fused_sweep(
            "sphere3d", jnp.asarray(pts, jnp.float32),
            jax.random.fold_in(key, r), total_groups // h, 1.0,
        )
        for r in range(h)
    ]
    counts = [int(c) for c, _ in per_shard]
    winner = int(jnp.argmax(jnp.asarray(counts)))
    assert int(count) == counts[winner]
    assert jnp.allclose(params, per_shard[winner][1])


def test_sharded_fused_sweep_pivot(interpret_pallas):
    # Non-point data (Frame pytree) through the mesh-sharded fused sweep.
    import numpy as np
    from jax.sharding import Mesh

    from lsqrrecipes_tpu.parallel import sharded_fused_sweep

    n, total_groups, h = 256, 8, 4
    frames = _pivot_frames(jax.random.PRNGKey(23), n)
    key = jax.random.PRNGKey(9)
    mesh = Mesh(np.asarray(jax.devices("cpu")[:h]), ("hypotheses",))
    count, params = sharded_fused_sweep("pivot", frames, key, total_groups, 1.0, mesh=mesh)
    assert int(count) > (4 * n) // 5 - n // 10
    assert jnp.max(jnp.abs(params[:3] - jnp.asarray([10.0, -5.0, 2.0]))) < 0.5


def test_engine_fused_driver_nonpow2(interpret_pallas):
    # Non-128-multiple n runs through the fused path via sampling-plane
    # replication (votes stay exact over the true observations).
    pts = _line2d_cloud(jax.random.PRNGKey(0), 200)
    est = Line2DEstimator(delta=1.0)
    assert fs.supports_data("line2d", pts)
    result = ransac_fused_sweep(est, pts, jax.random.PRNGKey(1), num_hypotheses=512)
    assert bool(result.valid)
    assert float(result.inlier_fraction) > 0.6
    assert int(jnp.sum(result.consensus)) == int(result.best_count)


def test_fused_sweep_nonpow2_parity(interpret_pallas):
    # Kernel counts at n=300 match the jnp reconstruction of the padded
    # hypothesis set, voted on the TRUE observations only.
    n, total_groups = 300, 6
    pts = _sphere_cloud(jax.random.PRNGKey(6), n)
    est = SphereEstimator(delta=1.0, dim=3, ls_type=ALGEBRAIC)
    bc, bp = fs.fused_sweep("sphere3d", pts, jax.random.PRNGKey(7), total_groups, 1.0)
    samples = fs.reference_samples("sphere3d", pts, jax.random.PRNGKey(7), total_groups)
    p_ref, v_ref = jax.vmap(est.minimal_fit)(jnp.asarray(samples, jnp.float64))
    counts = jax.vmap(lambda p: jnp.sum(est.agree(p, pts)))(p_ref)
    cref = int(jnp.max(jnp.where(v_ref, counts, 0)))
    assert abs(int(bc) - cref) <= 1
    achieved = int(jnp.sum(est.agree(jnp.asarray(bp, pts.dtype), pts)))
    assert abs(achieved - int(bc)) <= 1


def test_fused_sweep_pad_columns_never_vote(interpret_pallas):
    # Regression (round-1 advisor, high): on degenerate hypotheses w = 0 also
    # zeroed the w * 1e30 pad-guard term, so every replication-pad column
    # voted as an inlier (e = 0) — a pure-noise n=300 sphere sweep returned
    # count = n_pad - n = 84 with garbage params.  Degenerate lanes must now
    # be zeroed outright, and any winner must re-achieve its count through
    # the estimator's own agree() on the TRUE observations.
    n = 300  # n_pad - n = 84 pad columns
    pts = jax.random.uniform(
        jax.random.PRNGKey(5), (n, 3), jnp.float32, -40.0, 40.0
    )
    for family, make_est in [
        ("sphere3d", lambda: SphereEstimator(delta=1.0, dim=3, ls_type=ALGEBRAIC)),
        ("plane3d", lambda: PlaneEstimator(delta=1.0, dim=3)),
        ("line2d", lambda: Line2DEstimator(delta=1.0)),
    ]:
        d = 2 if family == "line2d" else 3
        data = pts[:, :d]
        est = make_est()
        bc, bp = fs.fused_sweep(family, data, jax.random.PRNGKey(7), 6, 1.0)
        achieved = int(jnp.sum(est.agree(jnp.asarray(bp, data.dtype), data)))
        assert abs(achieved - int(bc)) <= 1, (family, int(bc), achieved)


def test_fused_sweep_dense6_pad_columns_never_vote(interpret_pallas):
    # Same regression for the dense-linear family (rows = [a(6) | b]).
    n = 200  # 56 pad columns
    rows = jax.random.normal(jax.random.PRNGKey(8), (n, 7), jnp.float32) * 10.0
    from lsqrrecipes_tpu.estimators import DenseLinearSystemEstimator

    est = DenseLinearSystemEstimator(delta=0.05, n=6)
    bc, bp = fs.fused_sweep("dense_linear6", rows, jax.random.PRNGKey(7), 6, 0.05)
    achieved = int(jnp.sum(est.agree(jnp.asarray(bp, rows.dtype), rows)))
    assert abs(achieved - int(bc)) <= 1, (int(bc), achieved)


def test_fused_sweep_crosswire_matches_reference(interpret_pallas):
    """US crosswire family: in-kernel QR fit + polar orthonormalization +
    R2-orthogonality band vote vs the f64 estimator path on the identical
    hypothesis set."""
    from tests.test_us_calibration import make_crosswire_data
    from lsqrrecipes_tpu.estimators.us_calibration import (
        CrosswireUSCalibrationEstimator,
    )
    from lsqrrecipes_tpu.geometry import Frame

    n = 256
    noisy, _, true = make_crosswire_data(jax.random.PRNGKey(0), n=n, sigma=0.5)
    frames, q = noisy
    n_out = n * 3 // 10
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    bad_t = frames.t[-n_out:] + jax.random.uniform(
        k1, (n_out, 3), minval=30.0, maxval=80.0
    ) * jnp.sign(jax.random.normal(k2, (n_out, 3)))
    data = (Frame(frames.r, frames.t.at[-n_out:].set(bad_t)), q)
    est = CrosswireUSCalibrationEstimator(delta=3.0)

    assert fs.supports_data("crosswire", data)
    bc, bp = fs.fused_sweep("crosswire", data, jax.random.PRNGKey(7), 6, est.delta)

    feats = fs.reference_samples("crosswire", data, jax.random.PRNGKey(7), 6)
    samples = (
        Frame(
            jnp.asarray(feats[..., 0:9], jnp.float64).reshape(-1, 4, 3, 3),
            jnp.asarray(feats[..., 9:12], jnp.float64),
        ),
        jnp.asarray(feats[..., 12:14], jnp.float64),
    )
    p64, v64 = jax.vmap(est.minimal_fit)(samples)
    counts = jax.vmap(lambda p: jnp.sum(est.agree(p, data)))(p64)
    cref = int(jnp.max(jnp.where(v64, counts, 0)))
    assert abs(int(bc) - cref) <= 1
    achieved = int(jnp.sum(est.agree(jnp.asarray(bp, jnp.float64), data)))
    assert abs(achieved - int(bc)) <= 1
    assert int(bc) > n // 2  # found the 70% consensus


def test_fused_sweep_pointer_matches_reference(interpret_pallas):
    """US calibrated-pointer family: in-kernel 9x9 QR fit + polar
    orthonormalization + w = R2^T(p - t2) vote vs the f64 estimator path on
    the identical hypothesis set."""
    from tests.test_us_calibration import make_pointer_data
    from lsqrrecipes_tpu.estimators.us_calibration import (
        PointerUSCalibrationEstimator,
    )
    from lsqrrecipes_tpu.geometry import Frame

    n = 256
    noisy, _, true = make_pointer_data(jax.random.PRNGKey(0), n=n, sigma=0.5)
    frames, q, p = noisy
    n_out = n * 3 // 10
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    bad_p = p[-n_out:] + jax.random.uniform(
        k1, (n_out, 3), minval=30.0, maxval=80.0
    ) * jnp.sign(jax.random.normal(k2, (n_out, 3)))
    data = (frames, q, p.at[-n_out:].set(bad_p))
    est = PointerUSCalibrationEstimator(delta=3.0)

    assert fs.supports_data("pointer", data)
    bc, bp = fs.fused_sweep("pointer", data, jax.random.PRNGKey(7), 6, est.delta)

    feats = fs.reference_samples("pointer", data, jax.random.PRNGKey(7), 6)
    samples = (
        Frame(
            jnp.asarray(feats[..., 0:9], jnp.float64).reshape(-1, 3, 3, 3),
            jnp.asarray(feats[..., 9:12], jnp.float64),
        ),
        jnp.asarray(feats[..., 12:14], jnp.float64),
        jnp.asarray(feats[..., 14:17], jnp.float64),
    )
    p64, v64 = jax.vmap(est.minimal_fit)(samples)
    counts = jax.vmap(lambda pp: jnp.sum(est.agree(pp, data)))(p64)
    cref = int(jnp.max(jnp.where(v64, counts, 0)))
    assert abs(int(bc) - cref) <= 1
    achieved = int(jnp.sum(est.agree(jnp.asarray(bp, jnp.float64), data)))
    assert abs(achieved - int(bc)) <= 1
    assert int(bc) > n // 2  # found the 70% consensus


def test_engine_fused_driver_pointer(interpret_pallas):
    """ransac_fused_sweep end-to-end on the pointer estimator recovers the
    planted calibration at reference tolerances."""
    from tests.test_us_calibration import (
        _check_pointer,
        make_pointer_data,
    )
    from lsqrrecipes_tpu.estimators.us_calibration import (
        PointerUSCalibrationEstimator,
    )

    n = 256
    noisy, _, true = make_pointer_data(jax.random.PRNGKey(3), n=n, sigma=0.5)
    frames, q, p = noisy
    n_out = n * 3 // 10
    k1, k2 = jax.random.split(jax.random.PRNGKey(12))
    bad_p = p[-n_out:] + jax.random.uniform(
        k1, (n_out, 3), minval=30.0, maxval=80.0
    ) * jnp.sign(jax.random.normal(k2, (n_out, 3)))
    data = (frames, q, p.at[-n_out:].set(bad_p))

    est = PointerUSCalibrationEstimator(delta=3.0)
    res = ransac_fused_sweep(est, data, jax.random.PRNGKey(1), num_hypotheses=1024)
    assert bool(res.valid)
    assert float(res.inlier_fraction) > 0.6
    _check_pointer(res.params, true)


def test_engine_fused_driver_crosswire(interpret_pallas):
    """ransac_fused_sweep end-to-end on the crosswire estimator recovers the
    planted calibration at reference tolerances."""
    import numpy as np

    from tests.test_us_calibration import (
        _check_crosswire,
        make_crosswire_data,
    )
    from lsqrrecipes_tpu.estimators.us_calibration import (
        CrosswireUSCalibrationEstimator,
    )
    from lsqrrecipes_tpu.geometry import Frame

    n = 256
    noisy, _, true = make_crosswire_data(jax.random.PRNGKey(3), n=n, sigma=0.5)
    frames, q = noisy
    n_out = n * 3 // 10
    k1, k2 = jax.random.split(jax.random.PRNGKey(12))
    bad_t = frames.t[-n_out:] + jax.random.uniform(
        k1, (n_out, 3), minval=30.0, maxval=80.0
    ) * jnp.sign(jax.random.normal(k2, (n_out, 3)))
    data = (Frame(frames.r, frames.t.at[-n_out:].set(bad_t)), q)

    est = CrosswireUSCalibrationEstimator(delta=3.0)
    res = ransac_fused_sweep(est, data, jax.random.PRNGKey(1), num_hypotheses=1024)
    assert bool(res.valid)
    assert float(res.inlier_fraction) > 0.6
    _check_crosswire(res.params, true)
