"""Degenerate-input hardening.

The reference library's failure handling is purely numerical: SVD rank
gates against EPS and the empty-parameter-vector convention
(``ParametersEstimator.h:37-40``, ``PlanePhantom...cxx:205-218``).  These
tests probe the cases those gates exist for:

  * translation-only (constant-rotation) pose sets, which collapse the
    US-calibration systems' rank far below the unknown count;
  * the adaptive driver's memory behavior at large n (the "auto" sampler
    must switch away from the O(B*n) exact subset draw);
  * cross-call decorrelation of ``structured_samples`` — the shift table is
    a fixed function of (groups, k), so the per-call randomness rides
    entirely on the permutation; two calls must still produce essentially
    disjoint hypothesis sets.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lsqrrecipes_tpu.estimators import Line2DEstimator
from lsqrrecipes_tpu.estimators.us_calibration import (
    CrosswireUSCalibrationEstimator,
    PlanePhantomUSCalibrationEstimator,
    _euler_zyx_matrix,
)
from lsqrrecipes_tpu.geometry import Frame
from lsqrrecipes_tpu.ransac import ransac_adaptive
from lsqrrecipes_tpu.ransac.engine import _EXACT_SAMPLING_CELLS, _sample
from lsqrrecipes_tpu.ransac.sampling import structured_samples


def _translation_only_poses(key, n):
    """Every pose shares one rotation — the tracked probe never rotated.
    This is the rank-collapse case the reference's SVD gates reject
    (``PlanePhantom...cxx:205-218``: with constant R2 the u/v/plain R2
    column blocks each collapse to rank 1)."""
    k1, k2 = jax.random.split(key)
    r = _euler_zyx_matrix(0.3, -0.8, 1.2)
    r2 = jnp.broadcast_to(r, (n, 3, 3))
    t2 = jax.random.uniform(k1, (n, 3), minval=-100, maxval=100)
    q = jax.random.uniform(k2, (n, 2)) * jnp.asarray([640.0, 480.0])
    return Frame(r2, t2), q


def test_plane_phantom_rank_gate_translation_only():
    frames, q = _translation_only_poses(jax.random.PRNGKey(0), 31)
    est = PlanePhantomUSCalibrationEstimator(delta=1.0)
    params, valid = est.minimal_fit((frames, q))
    assert not bool(valid)
    assert bool(jnp.all(jnp.isfinite(params)))  # masked lanes stay NaN-free


def test_plane_phantom_rank_gate_two_rotations():
    # Two distinct rotations are still far short of exciting 31 unknowns.
    frames, q = _translation_only_poses(jax.random.PRNGKey(1), 31)
    r_b = _euler_zyx_matrix(1.0, 0.2, -0.5)
    r2 = frames.r.at[16:].set(jnp.broadcast_to(r_b, (15, 3, 3)))
    est = PlanePhantomUSCalibrationEstimator(delta=1.0)
    params, valid = est.minimal_fit((Frame(r2, frames.t), q))
    assert not bool(valid)


def test_plane_phantom_fast_path_rank_gate_translation_only():
    """The batched fast path (ops/us_fast.py) must gate the same
    rank-collapse cases its f64 twin does."""
    frames, q = _translation_only_poses(jax.random.PRNGKey(3), 40)
    est = PlanePhantomUSCalibrationEstimator(delta=1.0)
    idx = jnp.stack(
        [(jnp.arange(31) + 3 * i) % 40 for i in range(8)]
    )
    samples = (Frame(frames.r[idx], frames.t[idx]), q[idx])
    counts, params = est.fit_and_vote(samples, (frames, q))
    assert bool(jnp.all(counts == -1))
    assert bool(jnp.all(jnp.isfinite(params)))


def test_crosswire_rank_gate_translation_only():
    frames, q = _translation_only_poses(jax.random.PRNGKey(2), 4)
    est = CrosswireUSCalibrationEstimator(delta=3.0)
    params, valid = est.minimal_fit((frames, q))
    assert not bool(valid)
    assert bool(jnp.all(jnp.isfinite(params)))


def test_adaptive_auto_sampler_large_n():
    """ransac_adaptive at n where exact subset sampling would draw a
    [batch, n] uniform matrix (~25M cells/batch); the auto sampler must
    switch to with-replacement and still recover the structure."""
    n = 60_000
    batch = 512
    assert batch * n > _EXACT_SAMPLING_CELLS  # the switch actually engages
    idx = _sample(jax.random.PRNGKey(0), n, 2, batch, "auto")
    assert idx.shape == (batch, 2)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    t = jax.random.uniform(k1, (n, 1), minval=-40, maxval=40)
    u = jnp.asarray([0.8, 0.6])
    pts = jnp.asarray([-2.0, 5.0]) + t * u
    pts = pts + 0.1 * jax.random.normal(k2, pts.shape)
    n_out = n // 5
    pts = pts.at[-n_out:].set(
        jax.random.uniform(k3, (n_out, 2), minval=-40, maxval=40)
    )
    est = Line2DEstimator(delta=0.5)
    res = ransac_adaptive(
        est, pts, jax.random.PRNGKey(4), batch_size=batch, max_hypotheses=2048
    )
    assert bool(res.valid)
    assert float(res.inlier_fraction) > 0.7


def test_structured_samples_cross_call_decorrelation():
    """The shift table is static per (groups, k); verify the permutation
    alone decorrelates calls: the overlap between two calls' hypothesis
    sets must sit near the random-chance level, not near reuse."""
    n, groups, k = 128, 2, 2
    idx = jnp.arange(n)[:, None].astype(jnp.float64)

    def hyp_set(key):
        s = structured_samples(key, idx, k, groups)  # [G*n, k, 1]
        pairs = np.asarray(s[..., 0], dtype=np.int64)
        return {tuple(sorted(row)) for row in pairs}

    a = hyp_set(jax.random.PRNGKey(0))
    b = hyp_set(jax.random.PRNGKey(1))
    bsz = groups * n
    # Chance level: |a| * |b| / C(n, 2) ~ 256^2/8128 ~ 8 expected collisions.
    overlap = len(a & b)
    assert overlap < bsz // 4, overlap
    # And within a call all hypotheses are distinct observations.
    assert all(x != y for (x, y) in a)
