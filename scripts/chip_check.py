"""Real-chip regression gate for the fused RANSAC sweep kernels.

Pallas interpret-mode tests (tests/test_fused_sweep.py) validate kernel
logic but run exact f32 arithmetic and skip Mosaic's (8,128) layout rules,
so they cannot catch on-chip miscompiles or bf16-pass vote-precision drift.
This script is the re-runnable chip-truth gate: for every fused family it

  1. runs the fused sweep ON THE REAL TPU CHIP (the default device),
  2. reconstructs the exact same hypothesis set in pure jnp
     (``ops/fused_sweep.reference_samples``) and votes it through the f64
     estimator path ON CPU,
  3. asserts the kernel's best count matches the f64 best count and that
     the winning parameters re-achieve that count through the estimator's
     own ``agree`` (within a few border-point flips for the families whose
     band vote runs in one bf16 MXU pass).

Golden workloads: the pivot family runs the reference's outliered tracker
recording (``/root/reference/examples/Data/pivotCalibrationDataWithOutliers
.txt``) and dense_linear6 the outliered 1444x6 system
(``augmentedMatrixWithOutliers.txt``) — the same files the reference's
examples robustly solve (``examples/pivotCalibration.cxx``,
``examples/linearEquationSystemSolver.cxx``).  Other families use seeded
synthetic clouds with 20% outliers.

Usage (from /root/repo; chip compiles take ~seconds per family, run under
nohup if the tunnel is busy):

    nohup python scripts/chip_check.py > /tmp/chip_check.log 2>&1 &

Prints one ``PASS``/``FAIL`` line per family and exits nonzero on any FAIL.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lsqrrecipes_tpu.estimators import (
    ALGEBRAIC,
    AbsoluteOrientationEstimator,
    CrosswireUSCalibrationEstimator,
    DenseLinearSystemEstimator,
    Line2DEstimator,
    LineEstimator,
    PivotCalibrationEstimator,
    PlaneEstimator,
    RayIntersectionEstimator,
    SphereEstimator,
)
from lsqrrecipes_tpu.geometry import Frame, rotations
from lsqrrecipes_tpu.geometry.ray import Ray3D
from lsqrrecipes_tpu.io.loaders import load_augmented_matrix, load_tracked_frames
from lsqrrecipes_tpu.ops import fused_sweep as fs

EXAMPLES_DATA = "/root/reference/examples/Data"


def _outliered(key, n, d, make_inlier):
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


def _pivot_frames():
    return load_tracked_frames(
        os.path.join(EXAMPLES_DATA, "pivotCalibrationDataWithOutliers.txt")
    )


def _dense_rows():
    # The 6-slot shift hash covers up to n_fit = 1024 (6 slots * 5 bits);
    # beyond that the engine falls back to the structured path, so the chip
    # gate runs the first 1024 golden rows.
    rows = load_augmented_matrix(
        os.path.join(EXAMPLES_DATA, "augmentedMatrixWithOutliers.txt"), 7
    )
    return jnp.asarray(rows[:1024])


def _absor_pairs(key, n):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jnp.asarray([0.9, 0.2, -0.3, 0.1])
    r = rotations.matrix_from_quaternion(q / jnp.linalg.norm(q))
    t = jnp.asarray([12.0, -7.0, 30.0])
    first = jax.random.uniform(k1, (n, 3), minval=-100.0, maxval=100.0)
    second = first @ r.T + t + 0.1 * jax.random.normal(k2, (n, 3))
    n_out = n // 5
    bad = jax.random.uniform(k3, (n_out, 3), minval=-100.0, maxval=100.0)
    second = second.at[-n_out:].set(bad)
    return (jnp.asarray(first, jnp.float32), jnp.asarray(second, jnp.float32))


def _ray_bundle(key, n):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    target = jnp.asarray([3.0, -4.0, 20.0])
    p = jax.random.uniform(k1, (n, 3), minval=-60.0, maxval=60.0)
    d = target - p + 0.05 * jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    n_out = n // 5
    bad = jax.random.normal(k3, (n_out, 3))
    bad = bad / jnp.linalg.norm(bad, axis=1, keepdims=True)
    d = d.at[-n_out:].set(bad)
    return Ray3D(jnp.asarray(p, jnp.float32), jnp.asarray(d, jnp.float32))


def _crosswire_data(key, n):
    """Crosswire workload: known calibration, 20% corrupted poses."""
    from lsqrrecipes_tpu.estimators.us_calibration import _euler_zyx_matrix

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    m_x, m_y = 0.143, 0.139
    r3 = _euler_zyx_matrix(1.1, 0.4, -0.7)
    t3 = jnp.asarray([20.0, -15.0, 40.0])
    t1 = jnp.asarray([30.0, 76.0, -58.0])
    q = jax.random.uniform(k1, (n, 2)) * jnp.asarray([640.0, 480.0])
    w2 = jax.random.uniform(k2, (n, 3), minval=0.0, maxval=jnp.pi)
    r2 = jax.vmap(lambda w: _euler_zyx_matrix(w[2], w[1], w[0]))(w2)
    img = q[:, 0:1] * (m_x * r3[:, 0]) + q[:, 1:2] * (m_y * r3[:, 1]) + t3
    t2 = t1 - jnp.einsum("nij,nj->ni", r2, img)
    n_out = n // 5
    bad = t2[-n_out:] + (30.0 + 50.0 * jax.random.uniform(k3, (n_out, 3))) * jnp.sign(
        jax.random.normal(k4, (n_out, 3))
    )
    t2 = t2.at[-n_out:].set(bad)
    q = q + 0.5 * jax.random.normal(k5, q.shape)
    return (Frame(r2, t2), q)


def _pointer_data(key, n):
    """Calibrated-pointer workload: known calibration, 20% corrupted tips."""
    from lsqrrecipes_tpu.estimators.us_calibration import _euler_zyx_matrix

    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    m_x, m_y = 0.143, 0.139
    r3 = _euler_zyx_matrix(1.1, 0.4, -0.7)
    t3 = jnp.asarray([20.0, -15.0, 40.0])
    q = jax.random.uniform(k1, (n, 2)) * jnp.asarray([640.0, 480.0])
    w2 = jax.random.uniform(k2, (n, 3), minval=0.0, maxval=jnp.pi)
    r2 = jax.vmap(lambda w: _euler_zyx_matrix(w[2], w[1], w[0]))(w2)
    t2 = jax.random.uniform(k6, (n, 3), minval=-100.0, maxval=100.0)
    img = q[:, 0:1] * (m_x * r3[:, 0]) + q[:, 1:2] * (m_y * r3[:, 1]) + t3
    p = jnp.einsum("nij,nj->ni", r2, img) + t2
    n_out = n // 5
    bad = p[-n_out:] + (30.0 + 50.0 * jax.random.uniform(k3, (n_out, 3))) * jnp.sign(
        jax.random.normal(k4, (n_out, 3))
    )
    p = p.at[-n_out:].set(bad)
    q = q + 0.5 * jax.random.normal(k5, q.shape)
    return (Frame(r2, t2), q, p)


def _pointer_from_features(feats):
    f = jnp.asarray(feats, jnp.float64)
    return (
        Frame(f[..., 0:9].reshape(*feats.shape[:-1], 3, 3), f[..., 9:12]),
        f[..., 12:14],
        f[..., 14:17],
    )


def _crosswire_from_features(feats):
    f = jnp.asarray(feats, jnp.float64)
    return (
        Frame(f[..., 0:9].reshape(*feats.shape[:-1], 3, 3), f[..., 9:12]),
        f[..., 12:14],
    )


def _frames_from_features(feats):
    return Frame(
        jnp.asarray(feats[..., 0:9], jnp.float64).reshape(*feats.shape[:-1], 3, 3),
        jnp.asarray(feats[..., 9:12], jnp.float64),
    )


def _absor_from_features(feats):
    f = jnp.asarray(feats, jnp.float64)
    return (f[..., 0:3], f[..., 3:6])


def _rays_from_features(feats):
    f = jnp.asarray(feats, jnp.float64)
    return Ray3D(f[..., 0:3], f[..., 3:6])


# name: (data builder, estimator builder, sample->estimator-data adapter,
#        allowed best-count slack vs the f64 reference)
FAMILIES = {
    "sphere3d": (
        lambda: _sphere_cloud(jax.random.PRNGKey(3), 1024),
        lambda: SphereEstimator(delta=1.0, dim=3, ls_type=ALGEBRAIC),
        lambda s: jnp.asarray(s, jnp.float64),
        3,
    ),
    "plane3d": (
        lambda: _plane_cloud(jax.random.PRNGKey(4), 1024),
        lambda: PlaneEstimator(delta=1.0, dim=3),
        lambda s: jnp.asarray(s, jnp.float64),
        3,
    ),
    "line3d": (
        lambda: _line3d_cloud(jax.random.PRNGKey(5), 1024),
        lambda: LineEstimator(delta=1.0, dim=3),
        lambda s: jnp.asarray(s, jnp.float64),
        3,
    ),
    "line2d": (
        lambda: _line2d_cloud(jax.random.PRNGKey(6), 1024),
        lambda: Line2DEstimator(delta=1.0),
        lambda s: jnp.asarray(s, jnp.float64),
        3,
    ),
    "pivot": (
        _pivot_frames,
        lambda: PivotCalibrationEstimator(delta=1.0),
        _frames_from_features,
        2,
    ),
    "absolute_orientation": (
        lambda: _absor_pairs(jax.random.PRNGKey(7), 1024),
        lambda: AbsoluteOrientationEstimator(delta=1.0),
        _absor_from_features,
        2,
    ),
    "ray3d": (
        lambda: _ray_bundle(jax.random.PRNGKey(8), 1024),
        lambda: RayIntersectionEstimator(delta=1.0, min_angular_deviation=0.05),
        _rays_from_features,
        2,
    ),
    "dense_linear6": (
        _dense_rows,
        lambda: DenseLinearSystemEstimator(delta=0.05, n=6),
        lambda s: jnp.asarray(s, jnp.float64),
        2,
    ),
    "crosswire": (
        lambda: _crosswire_data(jax.random.PRNGKey(9), 1024),
        lambda: CrosswireUSCalibrationEstimator(delta=3.0),
        _crosswire_from_features,
        3,
    ),
    "pointer": (
        lambda: _pointer_data(jax.random.PRNGKey(10), 1024),
        lambda: _pointer_estimator(),
        _pointer_from_features,
        3,
    ),
}


def _pointer_estimator():
    from lsqrrecipes_tpu.estimators.us_calibration import (
        PointerUSCalibrationEstimator,
    )

    return PointerUSCalibrationEstimator(delta=3.0)


def check_family(name, total_groups):
    build_data, build_est, adapt, slack = FAMILIES[name]
    data = build_data()
    est = build_est()
    n = jax.tree_util.tree_leaves(data)[0].shape[0]
    key = jax.random.PRNGKey(7)
    delta_arg = getattr(est, "fused_delta", None) or est.delta

    # 1. Fused sweep on the real chip (default device).
    bc, bp = fs.fused_sweep(name, data, key, total_groups, delta_arg)
    bc = int(bc)
    bp = jax.device_get(bp)

    # 2. f64 reference vote over the identical hypothesis set, on CPU.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        data_cpu = jax.tree_util.tree_map(
            lambda a: jnp.asarray(jax.device_get(a)), data
        )
        feats = fs.reference_samples(name, data_cpu, key, total_groups)
        samples = adapt(feats)
        params, valid = jax.vmap(est.minimal_fit)(samples)
        counts = jax.vmap(lambda p: jnp.sum(est.agree(p, data_cpu)))(params)
        cref = int(jnp.max(jnp.where(valid, counts, 0)))
        achieved = int(
            jnp.sum(est.agree(jnp.asarray(jnp.asarray(bp), jnp.float64), data_cpu))
        )

    ok = abs(bc - cref) <= slack and abs(achieved - bc) <= slack and bc > 0
    status = "PASS" if ok else "FAIL"
    print(
        f"{status} {name}: chip_count={bc} f64_ref_count={cref} "
        f"winner_achieves={achieved} (n={n}, slack={slack})",
        flush=True,
    )
    return ok


# --------------------------------------------------------------------------
# XLA fast-path US-calibration families (ops/us_fast.py — not Pallas, but
# the same interpret-mode blind spot applies to their on-chip numerics:
# Mosaic isn't involved, yet f64 emulation, DEFAULT-precision dots and the
# batched Cholesky/QR custom calls all behave differently on the chip).
# --------------------------------------------------------------------------

US_FAST = ("us_crosswire", "us_pointer", "us_plane_phantom")


def check_us_fast(name, groups=4):
    from lsqrrecipes_tpu.synthetic import (
        make_crosswire_data,
        make_plane_phantom_data,
        make_pointer_data,
    )
    from lsqrrecipes_tpu.estimators.us_calibration import (
        CrosswireUSCalibrationEstimator,
        PlanePhantomUSCalibrationEstimator,
        PointerUSCalibrationEstimator,
    )
    from lsqrrecipes_tpu.ransac.sampling import structured_samples

    if name == "us_crosswire":
        data = make_crosswire_data(jax.random.PRNGKey(0), n=64)[0]
        est = CrosswireUSCalibrationEstimator(delta=3.0)
    elif name == "us_pointer":
        data = make_pointer_data(jax.random.PRNGKey(3), n=64)[0]
        est = PointerUSCalibrationEstimator(delta=3.0)
    else:
        data = make_plane_phantom_data(jax.random.PRNGKey(0), n=64)[0]
        est = PlanePhantomUSCalibrationEstimator(delta=1.0)

    samples = structured_samples(jax.random.PRNGKey(1), data, est.k, groups)
    counts, params = est.fit_and_vote(samples, data)   # on the chip
    counts = jax.device_get(counts)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        data_cpu = jax.tree_util.tree_map(
            lambda a: jnp.asarray(jax.device_get(a)), data
        )
        samples_cpu = jax.tree_util.tree_map(
            lambda a: jnp.asarray(jax.device_get(a)), samples
        )
        p64, v64 = jax.vmap(est.minimal_fit)(samples_cpu)
        c64 = jax.device_get(
            jnp.where(
                v64,
                jax.vmap(lambda p: jnp.sum(est.agree(p, data_cpu)))(p64),
                -1,
            )
        )
    import numpy as np

    d = np.abs(np.asarray(counts) - np.asarray(c64))
    ok = d.max() <= 2 and counts.max() == c64.max() and counts.max() > 0
    status = "PASS" if ok else "FAIL"
    print(
        f"{status} {name}: max|dcount|={d.max()} mean={d.mean():.4f} "
        f"maxcount chip={counts.max()} f64={c64.max()}",
        flush=True,
    )
    return ok


def check_fleet(groups=4):
    """Fleet path (``ransac_batched``) on the real chip: the Pallas sphere
    vote under ``pallas_call``'s vmap batching rule
    (``ransac/engine.py:259-261``) must match per-dataset single runs
    exactly (same keys -> same hypothesis sets)."""
    import numpy as np

    from lsqrrecipes_tpu.estimators import ALGEBRAIC, SphereEstimator
    from lsqrrecipes_tpu.ransac import ransac_batched
    from lsqrrecipes_tpu.ransac.engine import ransac_structured

    n, d_count = 512, 4
    est = SphereEstimator(delta=1.0, dim=3, ls_type=ALGEBRAIC)
    datasets = []
    for i in range(d_count):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(60 + i), 3)
        dirs = jax.random.normal(k1, (n * 4 // 5, 3), jnp.float32)
        dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
        center = jnp.asarray([5.0 + i, -2.0, 11.0], jnp.float32)
        inl = center + 25.0 * dirs
        inl = inl + 0.3 * jax.random.normal(k2, inl.shape, jnp.float32)
        out = jax.random.uniform(
            k3, (n - inl.shape[0], 3), jnp.float32, -40.0, 40.0
        )
        datasets.append(jnp.concatenate([inl, out]))
    stacked = jnp.stack(datasets)
    keys = jax.random.split(jax.random.PRNGKey(61), d_count)

    fleet = ransac_batched(est, stacked, keys, num_hypotheses=groups * n)
    fleet_counts = np.asarray(jax.device_get(fleet.best_count))
    fleet_params = np.asarray(jax.device_get(fleet.params))

    single_counts, single_params = [], []
    for i in range(d_count):
        res = ransac_structured(
            est, datasets[i], keys[i], num_hypotheses=groups * n
        )
        single_counts.append(int(res.best_count))
        single_params.append(np.asarray(jax.device_get(res.params)))
    single_counts = np.asarray(single_counts)
    single_params = np.stack(single_params)

    dcount = np.abs(fleet_counts - single_counts)
    dparam = np.abs(fleet_params - single_params).max()
    ok = (
        bool(np.all(jax.device_get(fleet.valid)))
        and dcount.max() == 0
        and dparam < 1e-5
        and single_counts.min() > (4 * n) // 5 - n // 10
    )
    status = "PASS" if ok else "FAIL"
    print(
        f"{status} fleet_sphere: max|dcount|={dcount.max()} "
        f"max|dparam|={dparam:.2e} counts={fleet_counts.tolist()}",
        flush=True,
    )
    return ok


def check_lm_sphere(b=512, m=128):
    """Fused LM megakernel (``ops/sphere_lm.py``) on the real chip vs the
    f64 ``linalg/lm.py`` minima on CPU.  Interpret-mode parity
    (tests/test_sphere_lm.py) does not cover Mosaic layouts or the
    fori/while carries' lane layouts — this does."""
    import numpy as np

    from lsqrrecipes_tpu.estimators.sphere import (
        _sphere_jacobian,
        _sphere_residual,
    )
    from lsqrrecipes_tpu.linalg import LMConfig, levenberg_marquardt
    from lsqrrecipes_tpu.ops.sphere_lm import sphere_lm_batch

    key = jax.random.PRNGKey(21)
    k1, k2, k3 = jax.random.split(key, 3)
    centers = jax.random.uniform(k1, (b, 3), jnp.float32, -50, 50)
    d = jax.random.normal(k2, (b, m, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pts = centers[:, None, :] + 25.0 * d
    pts = pts + 0.3 * jax.random.normal(k3, (b, m, 3), jnp.float32)
    x0 = jnp.concatenate(
        [centers + 1.0, jnp.full((b, 1), 23.0, jnp.float32)], axis=1
    )

    # Chip: the fused megakernel.
    x_chip, cost, iters, conv = sphere_lm_batch(
        pts, x0, max_iters=30, gtol=1e-6
    )
    x_chip = np.asarray(jax.device_get(x_chip))
    conv = np.asarray(jax.device_get(conv))

    # CPU: f64 reference LM on the same problems.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pts64 = jnp.asarray(jax.device_get(pts), jnp.float64)
        x064 = jnp.asarray(jax.device_get(x0), jnp.float64)
        config = LMConfig(max_iters=60, ftol=0.0, xtol=0.0, gtol=1e-9)
        res = jax.vmap(
            lambda x, p: levenberg_marquardt(
                _sphere_residual, _sphere_jacobian, x, p, config=config
            )
        )(x064, pts64)
        x_ref = np.asarray(jax.device_get(res.x))

    dmax = np.abs(x_chip - x_ref).max()
    ok = bool(conv.all()) and dmax < 5e-3
    status = "PASS" if ok else "FAIL"
    print(
        f"{status} lm_sphere: max|dx|={dmax:.2e} converged={conv.mean():.3f} "
        f"(B={b}, m={m}, f32 kernel vs f64 reference)",
        flush=True,
    )
    return ok


def check_vote_kernel(b=1024, n=1000):
    """The standalone Pallas sphere vote kernel (``ops/vote.py``) vs the
    estimator's XLA fallback — the two dispatch paths of ONE method
    (``SphereEstimator.vote_counts``) must agree so counts don't depend on
    whether B % 512 == 0.  Both use the squared band; the kernel's matmul
    is one-pass bf16, so a few border flips are tolerated vs the f64
    oracle but the kernel-vs-XLA check is tight."""
    import numpy as np

    from lsqrrecipes_tpu.ops import vote

    pts = (jax.random.normal(jax.random.PRNGKey(0), (n, 3)) * 30).astype(
        jnp.float32
    )
    points_t, valid, _ = vote.pack_points(pts)
    params = jnp.concatenate(
        [
            (jax.random.normal(jax.random.PRNGKey(1), (b, 3)) * 20).astype(
                jnp.float32
            ),
            jax.random.uniform(jax.random.PRNGKey(2), (b, 1), jnp.float32,
                               10, 40),
        ],
        axis=1,
    )
    counts_k = np.asarray(
        jax.device_get(vote.sphere_vote_counts(params, points_t, valid, 2.0))
    )

    @jax.jit
    def xla_counts(params, pts):
        c = params[:, :3]
        r = params[:, 3]
        cp = jnp.einsum("bd,nd->bn", c, pts,
                        preferred_element_type=jnp.float32)
        d2 = (jnp.sum(pts * pts, -1)[None] - 2.0 * cp
              + jnp.sum(c * c, -1)[:, None])
        rp = r + 2.0
        rm = r - 2.0
        hi2 = rp * rp
        lo2 = jnp.where(rm >= 0, rm * rm, -jnp.inf)
        return jnp.sum((d2 < hi2[:, None]) & (d2 > lo2[:, None]), axis=-1)

    counts_x = np.asarray(jax.device_get(xla_counts(params, pts)))
    d_xla = int(np.abs(counts_k - counts_x).max())

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pts64 = jnp.asarray(jax.device_get(pts), jnp.float64)
        par64 = jnp.asarray(jax.device_get(params), jnp.float64)
        dist = jnp.linalg.norm(pts64[None] - par64[:, None, :3], axis=-1)
        ref = np.asarray(jnp.sum(jnp.abs(dist - par64[:, 3:4]) < 2.0, -1))
    d_f64 = int(np.abs(counts_k - ref).max())

    ok = d_xla <= 1 and d_f64 <= 5
    status = "PASS" if ok else "FAIL"
    print(
        f"{status} vote_kernel: kernel-vs-XLA max|d|={d_xla} (<=1), "
        f"vs f64 oracle max|d|={d_f64} (<=5 border flips from the "
        f"one-pass bf16 matmul; B={b}, n={n})",
        flush=True,
    )
    return ok


def check_generic_ds(groups=6, n=1024):
    """The generic engine's certified double-single vote ON THE CHIP.

    The DS vote's Dekker/TwoSum identities assume strict f32 semantics;
    the axon terminal compiles with ``--xla_allow_excess_precision=true``,
    so this gate (a) runs BOTH vote modes on the chip over identical f64
    fits and demands EXACT count equality (isolates the DS arithmetic
    from fit rounding), and (b) cross-checks the chip DS counts against
    the CPU f64 reference with the usual emulated-f64 fit slack."""
    import numpy as np

    from lsqrrecipes_tpu.ops.planar_points import sphere3d_planar_sweep

    pts = _sphere_cloud(jax.random.PRNGKey(12), n)
    pts = jnp.asarray(pts, jnp.float64)
    key = jax.random.PRNGKey(21)

    c_ds, _ = sphere3d_planar_sweep(pts, key, groups, 1.0, vote="ds")
    c_f64, _ = sphere3d_planar_sweep(pts, key, groups, 1.0, vote="f64")
    c_ds = np.asarray(jax.device_get(c_ds))
    c_f64 = np.asarray(jax.device_get(c_f64))
    same = int(np.abs(c_ds - c_f64).max())

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pts_cpu = jnp.asarray(jax.device_get(pts))
        c_ref, _ = sphere3d_planar_sweep(pts_cpu, key, groups, 1.0,
                                         vote="f64")
        c_ref = np.asarray(jax.device_get(c_ref))
    dref = int(np.abs(c_ds - c_ref).max())

    ok = same == 0 and dref <= 3
    status = "PASS" if ok else "FAIL"
    print(
        f"{status} generic_ds: chip ds-vs-f64 max|d|={same} (must be 0), "
        f"chip-vs-cpu max|d|={dref} (B={groups * n}, n={n})",
        flush=True,
    )
    return ok


def check_lm_stats(b=64, n=64):
    """Sufficient-statistics LM (``linalg/stats_lm.py``) on the real chip vs
    the same solver on CPU — f64 einsums and the while_loop all run through
    the chip's emulated-f64 path here."""
    import numpy as np

    from lsqrrecipes_tpu.linalg import LMConfig
    from lsqrrecipes_tpu.linalg import stats_lm
    from lsqrrecipes_tpu.synthetic import make_pointer_data
    from lsqrrecipes_tpu.estimators.us_calibration import (
        PointerUSCalibrationEstimator,
    )

    (frames, q, p), _, true = make_pointer_data(jax.random.PRNGKey(9), n=n)
    data = (frames, q, p)
    est = PointerUSCalibrationEstimator(delta=3.0)
    # Mix strided masks with spatially-OFFSET block masks (consensus sets
    # whose feature mean sits far from the global mean) — the case where
    # the batched stats-LM's per-problem centering has to earn its keep
    # (see stats_lm.us_feature_lm_batched stage-2 congruence).
    strided = [jnp.arange(n) % max(2, i % 7) != 0 for i in range(b // 2)]
    blocks = [
        jnp.roll(jnp.arange(n) < (n // 2 + (i % 8)), (i * n) // (b // 2))
        for i in range(b - b // 2)
    ]
    masks = jnp.stack(strided + blocks) | (jnp.arange(n)[None, :] < est.k)
    config = LMConfig(max_iters=50, ftol=0.0, xtol=0.0, gtol=1e-9)

    params_chip, valid_chip = est.lsq_fit_stats_batched(
        data, masks, config=config
    )
    params_chip = np.asarray(jax.device_get(params_chip))

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        data_cpu = jax.tree_util.tree_map(
            lambda a: jnp.asarray(jax.device_get(a)), data
        )
        params_cpu, valid_cpu = est.lsq_fit_stats_batched(
            data_cpu, jnp.asarray(jax.device_get(masks)), config=config
        )
        params_cpu = np.asarray(jax.device_get(params_cpu))

    # Chip-vs-CPU emulated-f64 agreement at ~1e-6 absolute on mm-scale
    # parameters (reference acceptance is 1.0 mm / 1 degree).
    dmax = np.abs(params_chip - params_cpu).max()
    ok = (
        bool(np.asarray(jax.device_get(valid_chip)).all())
        and bool(np.asarray(jax.device_get(valid_cpu)).all())
        and dmax < 1e-5
    )
    status = "PASS" if ok else "FAIL"
    print(
        f"{status} lm_stats_pointer: max|dparam|={dmax:.2e} "
        f"(B={b}, n={n}, chip f64 vs cpu f64)",
        flush=True,
    )
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--families",
        nargs="*",
        default=sorted(FAMILIES) + list(US_FAST)
        + ["fleet_sphere", "lm_sphere", "lm_stats_pointer", "generic_ds",
           "vote_kernel"],
    )
    ap.add_argument("--groups", type=int, default=6)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    failures = 0
    for name in args.families:
        try:
            if name == "fleet_sphere":
                checker = lambda n: check_fleet()  # noqa: E731
            elif name == "lm_sphere":
                checker = lambda n: check_lm_sphere()  # noqa: E731
            elif name == "lm_stats_pointer":
                checker = lambda n: check_lm_stats()  # noqa: E731
            elif name == "generic_ds":
                checker = lambda n: check_generic_ds()  # noqa: E731
            elif name == "vote_kernel":
                checker = lambda n: check_vote_kernel()  # noqa: E731
            elif name in US_FAST:
                checker = lambda n: check_us_fast(n)  # noqa: E731
            else:
                checker = lambda n: check_family(n, args.groups)  # noqa: E731
            if not checker(name):
                failures += 1
        except Exception as e:  # surface, keep checking the rest
            print(f"FAIL {name}: exception {type(e).__name__}: {e}", flush=True)
            failures += 1
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
