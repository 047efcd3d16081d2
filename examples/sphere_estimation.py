"""Robust sphere estimation, algebraic + geometric LM
(mirrors ``examples/sphereEstimation.cxx``)."""

from common import banner, report

import jax
import jax.numpy as jnp

from lsqrrecipes_tpu.estimators import ALGEBRAIC, GEOMETRIC, SphereEstimator
from lsqrrecipes_tpu.ransac import ransac
from lsqrrecipes_tpu.utils import RandomNumberGenerator
from lsqrrecipes_tpu.viz import InventorScene


def main():
    rng = RandomNumberGenerator(3)
    center = rng.uniform(-100, 100, (3,))
    radius = float(rng.uniform(20, 60))
    d = rng.normal(shape=(90, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    inliers = center + radius * d + rng.normal(1.0, shape=(90, 3))
    outliers = center + rng.uniform(-2 * radius, 2 * radius, (10, 3))
    data = jnp.concatenate([inliers, outliers])

    banner("Sphere estimation (90 inliers + 10 outliers)")
    report("Known sphere [c, r]", jnp.concatenate([center, jnp.asarray([radius])]))

    for ls_type in (ALGEBRAIC, GEOMETRIC):
        est = SphereEstimator(delta=3.0, dim=3, ls_type=ls_type)
        params, _ = est.lsq_fit(data)
        report(f"Least squares ({ls_type}) [c, r]", params)

    est = SphereEstimator(delta=3.0, dim=3, ls_type=GEOMETRIC)
    result = ransac(est, data, jax.random.PRNGKey(1), num_hypotheses=4096)
    report("RANSAC estimate [c, r]", result.params)
    _, dmin, dmax, dmean = est.distance_statistics(result.params, data)
    print(
        f"distances to model: min {float(dmin):.3f} max {float(dmax):.3f} "
        f"mean {float(dmean):.3f}"
    )

    scene = InventorScene()
    scene.add_classified_points(data, est.agree(result.params, data))
    scene.add_sphere(result.params[:3], float(result.params[3]))
    scene.write("RANSACSphereEstimation.iv")
    print("wrote RANSACSphereEstimation.iv")


if __name__ == "__main__":
    main()
