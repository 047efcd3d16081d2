"""Robust ray-intersection estimation
(mirrors ``examples/rayIntersectionEstimation.cxx``)."""

import numpy as np
from common import banner, report

import jax
import jax.numpy as jnp

from lsqrrecipes_tpu.estimators import RayIntersectionEstimator
from lsqrrecipes_tpu.geometry import Ray3D
from lsqrrecipes_tpu.ransac import ransac
from lsqrrecipes_tpu.utils import RandomNumberGenerator
from lsqrrecipes_tpu.viz import InventorScene


def main():
    rng = RandomNumberGenerator(4)
    target = rng.uniform(-500, 500, (3,))
    origins = rng.uniform(-1000, 1000, (40, 3)) + rng.normal(20.0, shape=(40, 3))
    directions = target - origins
    directions = directions / jnp.linalg.norm(directions, axis=1, keepdims=True)
    # 8 outlier rays pointing somewhere else entirely.
    bad = rng.normal(shape=(8, 3))
    directions = directions.at[:8].set(bad / jnp.linalg.norm(bad, axis=1, keepdims=True))
    rays = Ray3D(origins, directions)

    banner("Ray intersection (32 inlier rays + 8 outliers)")
    report("Known intersection", target)

    est = RayIntersectionEstimator(delta=60.0, min_angular_deviation=np.radians(1.0))
    ls_params, _ = est.lsq_fit(rays)
    report("Least squares estimate", ls_params)

    result = ransac(est, rays, jax.random.PRNGKey(1), num_hypotheses=2048)
    report("RANSAC estimate", result.params)
    print(f"RANSAC inlier fraction: {float(result.inlier_fraction):.3f}")

    scene = InventorScene()
    for i in range(origins.shape[0]):
        scene.add_polyline(
            [np.asarray(origins[i]), np.asarray(origins[i] + 1500 * directions[i])],
            color=(0.0, 1.0, 0.0) if i >= 8 else (1.0, 0.0, 0.0),
        )
    scene.add_sphere(np.asarray(result.params), 15.0)
    scene.write("RANSACRayIntersection.iv")
    print("wrote RANSACRayIntersection.iv")


if __name__ == "__main__":
    main()
