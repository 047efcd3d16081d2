"""On-chip verification of the plane-phantom k=31 fast path.

Runs on the REAL TPU: (1) fit_and_vote counts vs the f64 vmapped
minimal_fit + agree reference vote on the same hypothesis set, (2) the
end-to-end structured RANSAC recovering a planted calibration from
15%-outlier data.  Prints PASS/FAIL lines.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")
from lsqrrecipes_tpu.synthetic import make_plane_phantom_data  # noqa: E402
from tests.test_us_calibration import _check_plane_phantom  # noqa: E402
from lsqrrecipes_tpu.estimators.us_calibration import (  # noqa: E402
    PlanePhantomUSCalibrationEstimator,
)
from lsqrrecipes_tpu.geometry import Frame  # noqa: E402
from lsqrrecipes_tpu.ransac import ransac_structured  # noqa: E402
from lsqrrecipes_tpu.ransac.sampling import structured_samples  # noqa: E402

print("devices:", jax.devices(), flush=True)

ok = True

# --- 1. counts parity on-chip -------------------------------------------
noisy, clean, true = make_plane_phantom_data(jax.random.PRNGKey(0), n=64)
est = PlanePhantomUSCalibrationEstimator(delta=1.0)
samples = structured_samples(jax.random.PRNGKey(1), noisy, est.k, 4)
counts, params = est.fit_and_vote(samples, noisy)
counts = np.asarray(counts)
print("fit_and_vote done", flush=True)
p64, v64 = jax.vmap(est.minimal_fit)(samples)
c64 = np.asarray(
    jnp.where(v64, jax.vmap(lambda p: jnp.sum(est.agree(p, noisy)))(p64), -1)
)
d = np.abs(counts - c64)
line = f"counts parity: max|d|={d.max()} mean={d.mean():.4f} maxcount {counts.max()} vs {c64.max()}"
if d.max() <= 2 and counts.max() == c64.max():
    print("PASS", line, flush=True)
else:
    ok = False
    print("FAIL", line, flush=True)

# --- 2. end-to-end structured RANSAC ------------------------------------
noisy, clean, true = make_plane_phantom_data(jax.random.PRNGKey(26), n=64, sigma=0.5)
frames, q = noisy
n_out = 64 * 15 // 100
k1, k2 = jax.random.split(jax.random.PRNGKey(27))
shift = jax.random.uniform(k1, (n_out, 1), minval=20.0, maxval=60.0) * jnp.sign(
    jax.random.normal(k2, (n_out, 1))
)
bad_t = frames.t[-n_out:] + shift * true["r1_row3"]
frames = Frame(frames.r, frames.t.at[-n_out:].set(bad_t))
est = PlanePhantomUSCalibrationEstimator(delta=2.0)
res = ransac_structured(
    est, (frames, q), jax.random.PRNGKey(28), num_hypotheses=16384
)
try:
    assert bool(res.valid)
    assert float(res.inlier_fraction) > 0.7
    assert int(jnp.sum(res.consensus[-n_out:])) == 0
    _check_plane_phantom(res.params, true, trans_eps=3.0, ang_eps=np.radians(5.0))
    print(
        f"PASS ransac_structured: inlier_frac={float(res.inlier_fraction):.3f}",
        flush=True,
    )
except AssertionError as e:
    ok = False
    print("FAIL ransac_structured:", e, flush=True)

print("OVERALL", "PASS" if ok else "FAIL", flush=True)
sys.exit(0 if ok else 1)
