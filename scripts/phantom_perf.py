"""Measure the plane-phantom k=31 fast path vs the vmapped f64 SVD baseline
on the real chip, plus a fleet (ransac_batched) smoke.

Sound tunnel timing per CLAUDE.md: one jitted ``lax.scan`` over distinct
(perturbed) problems, outputs fetched and checked, min-of-3 sweeps.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")

from lsqrrecipes_tpu.synthetic import make_plane_phantom_data  # noqa: E402
from lsqrrecipes_tpu.estimators.us_calibration import (  # noqa: E402
    PlanePhantomUSCalibrationEstimator,
)
from lsqrrecipes_tpu.ransac import ransac_batched  # noqa: E402

print("devices:", jax.devices(), flush=True)

n = 64
groups = 32          # B = 2048 hypotheses per sweep
reps = 4
est = PlanePhantomUSCalibrationEstimator(delta=1.0)
data, _, _ = make_plane_phantom_data(jax.random.PRNGKey(0), n=n)


@jax.jit
def sweeps_fast(seed0):
    def body(carry, i):
        k = jax.random.fold_in(jax.random.PRNGKey(5), seed0 + i)
        counts, _ = est.structured_sweep(data, k, groups)
        return carry, jnp.max(counts)

    _, tops = jax.lax.scan(body, 0, jnp.arange(reps))
    return tops


def time_sweeps(fn, tag, hyp_per_rep):
    np.array(fn(0))  # compile + warm
    best = None
    for trial in range(3):
        t0 = time.perf_counter()
        tops = np.array(fn(1000 * (trial + 1)))
        dt = (time.perf_counter() - t0) / reps
        assert (tops > n // 2).all(), f"{tag}: sweep missed the structure"
        best = dt if best is None else min(best, dt)
    print(
        f"{tag}: {hyp_per_rep / best:,.0f} hyp/s ({best * 1e3:.2f} ms "
        f"per {hyp_per_rep}-hypothesis sweep)",
        flush=True,
    )
    return hyp_per_rep / best


hps_fast = time_sweeps(
    sweeps_fast, "fast path (f32 planar QR + f64 Rayleigh-Ritz)", groups * n
)

# Baseline: the engine's generic path — vmapped f64 SVD minimal fits +
# vote_counts — on a smaller B (it is orders of magnitude slower).
from lsqrrecipes_tpu.ransac.sampling import structured_samples  # noqa: E402

groups_svd = 2


@jax.jit
def sweeps_svd(seed0):
    def body(carry, i):
        k = jax.random.fold_in(jax.random.PRNGKey(5), seed0 + i)
        samples = structured_samples(k, data, est.k, groups_svd)
        params, valid = jax.vmap(est.minimal_fit)(samples)
        counts = jnp.where(valid, est.vote_counts(params, data), -1)
        return carry, jnp.max(counts)

    _, tops = jax.lax.scan(body, 0, jnp.arange(reps))
    return tops


hps_svd = time_sweeps(sweeps_svd, "f64 vmapped SVD baseline", groups_svd * n)
print(f"speedup: {hps_fast / hps_svd:.1f}x", flush=True)

# Fleet smoke: 4 phantom datasets in one program on the chip.
D = 4
datasets = [make_plane_phantom_data(jax.random.PRNGKey(70 + i), n=n)[0] for i in range(D)]
stacked = jax.tree_util.tree_map(lambda *l: jnp.stack(l), *datasets)
keys = jax.random.split(jax.random.PRNGKey(71), D)
fleet = ransac_batched(est, stacked, keys, num_hypotheses=4 * n)
print(
    "fleet smoke: valid =", np.array(fleet.valid),
    "inlier_frac =", np.round(np.array(fleet.inlier_fraction), 3),
    flush=True,
)
assert bool(jnp.all(fleet.valid))
print("PASS", flush=True)
