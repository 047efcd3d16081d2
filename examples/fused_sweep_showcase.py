"""TPU flagship showcase: whole-sweep fused RANSAC across estimator families.

Unlike the other examples (which mirror the reference's small-n example
programs, ``examples/readme.txt``), this one shows the TPU-native fast path:
millions of hypotheses per family through ONE Pallas kernel per sweep
(``ransac_fused_sweep``).  On a machine without a TPU the kernels run in
Pallas interpret mode (slow but identical logic).
"""

import functools
import os
import time

# This example IS the TPU path — override common.py's small-example CPU
# default before it configures the device.
os.environ.setdefault("LSQR_EXAMPLES_DEVICE", "tpu")

from common import banner, report

import jax
import jax.numpy as jnp

from lsqrrecipes_tpu.estimators import (
    AbsoluteOrientationEstimator,
    ALGEBRAIC,
    PivotCalibrationEstimator,
    SphereEstimator,
)
from lsqrrecipes_tpu.geometry import Frame, rotations
from lsqrrecipes_tpu.ops.vote import pallas_available
from lsqrrecipes_tpu.ransac import ransac_fused_sweep

N = 1024  # any n works (sampling planes replicate up to 128 * 2^k); a
          # power-of-two width avoids the replication sampling bias entirely


def sphere_cloud(key):
    k1, k2, k3 = jax.random.split(key, 3)
    n_in = N * 4 // 5
    d = jax.random.normal(k1, (n_in, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    inl = jnp.asarray([5.0, -2.0, 11.0]) + 25.0 * d
    inl = inl + 0.3 * jax.random.normal(k2, (n_in, 3))
    out = jax.random.uniform(k3, (N - n_in, 3), minval=-40.0, maxval=40.0)
    return jnp.concatenate([inl, out])


def pivot_frames(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n_in = N * 4 // 5
    t_d = jnp.asarray([10.0, -5.0, 2.0])
    t_w = jnp.asarray([100.0, 50.0, -30.0])

    def rot(k, m):
        q = jax.random.normal(k, (m, 4))
        return rotations.matrix_from_quaternion(
            q / jnp.linalg.norm(q, axis=1, keepdims=True)
        )

    r_in = rot(k1, n_in)
    t_in = t_w - jnp.einsum("nij,j->ni", r_in, t_d)
    t_in = t_in + 0.05 * jax.random.normal(k2, (n_in, 3))
    r_out = rot(k3, N - n_in)
    t_out = jax.random.uniform(k4, (N - n_in, 3), minval=-200.0, maxval=200.0)
    return Frame(jnp.concatenate([r_in, r_out]), jnp.concatenate([t_in, t_out]))


def registration_pairs(key):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jnp.asarray([0.9, 0.2, -0.3, 0.1])
    r = rotations.matrix_from_quaternion(q / jnp.linalg.norm(q))
    t = jnp.asarray([12.0, -7.0, 30.0])
    first = jax.random.uniform(k1, (N, 3), minval=-100.0, maxval=100.0)
    second = first @ r.T + t + 0.1 * jax.random.normal(k2, (N, 3))
    bad = jax.random.uniform(k3, (N // 5, 3), minval=-100.0, maxval=100.0)
    return (first, second.at[-(N // 5):].set(bad))


def main():
    # A TPU may be visible while the DEFAULT device is CPU (the examples'
    # LSQR_EXAMPLES_DEVICE=cpu mode) — Mosaic kernels only lower on TPU, so
    # check where the computation will actually run.
    default = jax.config.jax_default_device
    on_cpu = default is not None and default.platform == "cpu"
    if not pallas_available() or on_cpu:
        # No TPU target: run the same kernels in interpret mode, small budget.
        from jax.experimental import pallas as pl

        pl.pallas_call = functools.partial(pl.pallas_call, interpret=True)
        budget = 4 * N
        print("(no TPU target - Pallas interpret mode, small budget)")
    else:
        budget = 4 << 20

    key = jax.random.PRNGKey(0)
    cases = [
        (
            "3D sphere [c, r]",
            SphereEstimator(delta=1.0, dim=3, ls_type=ALGEBRAIC),
            sphere_cloud(key),
        ),
        (
            "Pivot calibration [t_DRF, t_W]",
            PivotCalibrationEstimator(delta=1.0),
            pivot_frames(key),
        ),
        (
            "Absolute orientation [q, t]",
            AbsoluteOrientationEstimator(delta=1.0),
            registration_pairs(key),
        ),
    ]
    for name, est, data in cases:
        banner(name)
        result = ransac_fused_sweep(est, data, jax.random.PRNGKey(1), budget)
        jax.block_until_ready(result.params)          # compile + first sweep
        t0 = time.perf_counter()
        result = ransac_fused_sweep(est, data, jax.random.PRNGKey(2), budget)
        jax.block_until_ready(result.params)
        elapsed = time.perf_counter() - t0
        report("RANSAC estimate", result.params)
        print(
            f"inlier fraction {float(result.inlier_fraction):.3f}; "
            f"{budget / elapsed / 1e6:.1f}M hypotheses/s "
            "(single sweep incl. host dispatch)"
        )


if __name__ == "__main__":
    main()
