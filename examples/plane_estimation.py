"""Robust 3D plane estimation (mirrors ``examples/planeEstimation.cxx``)."""

from common import banner, report

import jax
import jax.numpy as jnp

from lsqrrecipes_tpu.estimators import PlaneEstimator
from lsqrrecipes_tpu.ransac import ransac
from lsqrrecipes_tpu.utils import RandomNumberGenerator
from lsqrrecipes_tpu.viz import InventorScene


def generate_data(rng, inliers=90, outliers=10):
    normal = rng.normal(shape=(3,))
    normal = normal / jnp.linalg.norm(normal)
    anchor = rng.uniform(-100, 100, (3,))
    raw = rng.uniform(-100, 100, (inliers, 3))
    on_plane = raw - jnp.sum((raw - anchor) * normal, axis=1, keepdims=True) * normal
    pts_in = on_plane + rng.normal(1.0, shape=(inliers, 3))
    pts_out = on_plane[:outliers] + (
        20.0 + rng.uniform(0, 50, (outliers,))
    )[:, None] * normal
    return jnp.concatenate([pts_in, pts_out]), jnp.concatenate([normal, anchor])


def main():
    rng = RandomNumberGenerator(2)
    data, true_params = generate_data(rng)
    est = PlaneEstimator(delta=1.0, dim=3)

    banner("3D plane estimation (90 inliers + 10 outliers)")
    report("Known plane parameters [n, a]", true_params)

    ls_params, _ = est.lsq_fit(data)
    report("Least squares estimate [n, a]", ls_params)

    result = ransac(est, data, jax.random.PRNGKey(1), num_hypotheses=2048)
    report("RANSAC estimate [n, a]", result.params)
    print(f"RANSAC inlier fraction: {float(result.inlier_fraction):.3f}")

    scene = InventorScene()
    scene.add_classified_points(data, est.agree(result.params, data))
    scene.write("RANSACPlaneEstimation.iv")
    print("wrote RANSACPlaneEstimation.iv")


if __name__ == "__main__":
    main()
