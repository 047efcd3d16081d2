"""Console entry point (``lsqrrecipes-bench``).

The reference ships its demo programs as installed CMake targets
(``CMakeLists.txt`` install/export story); the packaged analogue here is a
small CLI over the library: ``info`` lists the registered estimator suite
and visible devices, ``bench`` runs a self-contained RANSAC throughput
measurement on the default device and prints one JSON line.  The repo-root
``bench.py`` remains the full benchmark harness (C++ baselines, sound
tunnel timing); this CLI is the installable smoke-level equivalent.
"""

import argparse
import json
import sys
import time


def _info() -> int:
    import jax

    import lsqrrecipes_tpu
    from lsqrrecipes_tpu.estimators import base

    print(f"lsqrrecipes_tpu {lsqrrecipes_tpu.__version__}")
    print(f"jax {jax.__version__}, devices: {jax.devices()}")
    print("registered estimators:")
    for name in base.names():
        cls = base.get(name)
        k = getattr(cls, "k", "-")        # instance-dependent for some
        npar = getattr(cls, "nparams", "-")
        print(f"  {name:24s} k={k!s:<4s} nparams={npar}")
    return 0


def _bench(hypotheses: int, n: int) -> int:
    import jax
    import jax.numpy as jnp

    from lsqrrecipes_tpu.estimators.sphere import SphereEstimator
    from lsqrrecipes_tpu.ransac import ransac_fused_sweep, ransac_structured

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    center = jnp.asarray([10.0, -4.0, 2.5])
    radius = 25.0
    d = jax.random.normal(k1, (n, 3))
    pts = center + radius * d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pts = pts + 0.05 * jax.random.normal(k2, (n, 3))
    n_out = n // 5
    pts = pts.at[-n_out:].add(
        jax.random.uniform(k3, (n_out, 3), minval=15.0, maxval=40.0)
    )
    est = SphereEstimator(delta=0.5, dim=3)
    # The Pallas whole-sweep kernel only lowers on TPU; everywhere else the
    # structured driver is the fast portable path.
    dev = jax.config.jax_default_device or jax.devices()[0]
    on_tpu = dev.platform not in ("cpu", "gpu")
    driver = ransac_fused_sweep if on_tpu else ransac_structured

    def run():
        return driver(
            est, pts.astype(jnp.float32), jax.random.PRNGKey(7),
            num_hypotheses=hypotheses,
        )

    res = run()  # compile + warm
    if not bool(res.valid):
        print("bench run produced no valid consensus", file=sys.stderr)
        return 1
    t0 = time.perf_counter()
    res = run()
    err = float(jnp.linalg.norm(res.params[:3] - center))
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "cli_ransac_hypotheses_per_s",
                "value": round(hypotheses / dt, 1),
                "unit": "hyp/s",
                "center_error": round(err, 4),
                "inlier_fraction": round(float(res.inlier_fraction), 4),
            }
        )
    )
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="lsqrrecipes-bench", description=__doc__)
    sub = p.add_subparsers(dest="cmd")
    sub.add_parser("info", help="versions, devices, estimator registry")
    b = sub.add_parser("bench", help="small RANSAC throughput measurement")
    b.add_argument("--hypotheses", type=int, default=16384)
    b.add_argument("--n", type=int, default=512)
    args = p.parse_args(argv)
    if args.cmd == "bench":
        return _bench(args.hypotheses, args.n)
    return _info()


if __name__ == "__main__":
    raise SystemExit(main())
