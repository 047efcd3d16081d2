"""Checkpoint/resume of long RANSAC sweeps."""

import jax
import numpy as np

from lsqrrecipes_tpu.estimators import Line2DEstimator
from lsqrrecipes_tpu.ransac.checkpoint import (
    load_state,
    resumable_sweep,
    save_state,
)
from lsqrrecipes_tpu.ransac.engine import consensus_refit
from tests.test_ransac import make_outlier_line


def test_sweep_resume_equivalence(tmp_path):
    _, _, pts = make_outlier_line(jax.random.PRNGKey(0))
    est = Line2DEstimator(delta=1.5)
    key = jax.random.PRNGKey(7)

    # One uninterrupted sweep.
    full = resumable_sweep(est, pts, key, total_hypotheses=2048, batch_size=512)

    # Interrupted after 2 rounds, then resumed from the checkpoint file.
    ckpt = str(tmp_path / "sweep.npz")
    partial = resumable_sweep(
        est, pts, key, total_hypotheses=1024, batch_size=512,
        checkpoint_path=ckpt,
    )
    assert load_state(ckpt).evaluated == 1024
    resumed = resumable_sweep(
        est, pts, key, total_hypotheses=2048, batch_size=512,
        checkpoint_path=ckpt,
    )

    assert resumed.evaluated == full.evaluated == 2048
    assert resumed.best_count == full.best_count
    np.testing.assert_array_equal(resumed.best_mask, full.best_mask)
    np.testing.assert_allclose(resumed.best_params, full.best_params)

    params, ok = consensus_refit(est, pts, resumed.best_mask)
    assert bool(ok)


def test_state_roundtrip(tmp_path):
    _, _, pts = make_outlier_line(jax.random.PRNGKey(1))
    est = Line2DEstimator(delta=1.5)
    state = resumable_sweep(
        est, pts, jax.random.PRNGKey(3), total_hypotheses=512
    )
    path = str(tmp_path / "s.npz")
    save_state(path, state)
    loaded = load_state(path)
    assert loaded.best_count == state.best_count
    np.testing.assert_array_equal(loaded.best_mask, state.best_mask)
