"""Small-solver and Pallas-kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsqrrecipes_tpu.linalg.small import (
    cholesky_solve_unrolled,
    solve2,
    solve3,
    solve_spd,
)


def test_solve2_solve3_match_reference():
    key = jax.random.PRNGKey(0)
    a2 = jax.random.normal(key, (50, 2, 2))
    b2 = jax.random.normal(jax.random.PRNGKey(1), (50, 2))
    x2, det2 = solve2(a2, b2)
    np.testing.assert_allclose(
        jnp.einsum("nij,nj->ni", a2, x2), b2, atol=1e-9
    )
    np.testing.assert_allclose(det2, jnp.linalg.det(a2), atol=1e-12)

    a3 = jax.random.normal(jax.random.PRNGKey(2), (50, 3, 3))
    b3 = jax.random.normal(jax.random.PRNGKey(3), (50, 3))
    x3, det3 = solve3(a3, b3)
    np.testing.assert_allclose(
        jnp.einsum("nij,nj->ni", a3, x3), b3, atol=1e-8
    )
    np.testing.assert_allclose(det3, jnp.linalg.det(a3), atol=1e-10)


@pytest.mark.parametrize("n", [4, 8, 11])
def test_unrolled_cholesky(n):
    key = jax.random.PRNGKey(n)
    m = jax.random.normal(key, (20, n, n))
    spd = jnp.einsum("bij,bkj->bik", m, m) + 0.5 * jnp.eye(n)
    b = jax.random.normal(jax.random.PRNGKey(n + 1), (20, n))
    x, min_pivot = cholesky_solve_unrolled(spd, b, n)
    np.testing.assert_allclose(jnp.einsum("bij,bj->bi", spd, x), b, atol=1e-8)
    assert bool(jnp.all(min_pivot > 0))


def test_cholesky_detects_non_spd():
    a = -jnp.eye(4)[None]
    _, min_pivot = cholesky_solve_unrolled(a, jnp.ones((1, 4)), 4)
    assert float(min_pivot[0]) <= 0


def test_solve_spd_dispatch():
    for n in (1, 2, 3, 6):
        m = jax.random.normal(jax.random.PRNGKey(n), (n, n))
        spd = m @ m.T + 0.5 * jnp.eye(n)
        b = jnp.arange(1.0, n + 1)
        x, sig = solve_spd(spd, b)
        np.testing.assert_allclose(spd @ x, b, atol=1e-8)
        assert float(sig) > 0


def test_pallas_vote_kernels_interpret():
    """Kernel math validated in interpreter mode (no TPU in CI)."""
    from jax.experimental import pallas as pl

    from lsqrrecipes_tpu.ops import vote

    # Monkeypatch pallas_call into interpreter mode for this test.
    orig = pl.pallas_call
    import functools

    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        pts = jax.random.normal(jax.random.PRNGKey(0), (200, 3)).astype(jnp.float32) * 30
        points_t, valid, n = vote.pack_points(pts)
        params = jnp.concatenate(
            [
                jax.random.normal(jax.random.PRNGKey(1), (256, 3)).astype(jnp.float32) * 20,
                jax.random.uniform(
                    jax.random.PRNGKey(2), (256, 1), jnp.float32, 10, 40
                ),
            ],
            axis=1,
        )
        counts = vote.sphere_vote_counts(params, points_t, valid, 2.0, block_b=256)
        dist = jnp.linalg.norm(
            pts[None, :, :] - params[:, None, :3], axis=-1
        )
        ref = jnp.sum(jnp.abs(dist - params[:, 3:4]) < 2.0, axis=1)
        np.testing.assert_array_equal(counts, ref)

        nrm = jax.random.normal(jax.random.PRNGKey(3), (256, 3)).astype(jnp.float32)
        nrm = nrm / jnp.linalg.norm(nrm, axis=1, keepdims=True)
        off = jax.random.normal(jax.random.PRNGKey(4), (256,)).astype(jnp.float32) * 5
        pp = jnp.concatenate([nrm, off[:, None]], axis=1)
        counts2 = vote.plane_vote_counts(pp, points_t, valid, 4.0, block_b=256)
        s = pts @ nrm.T - off[None, :]
        ref2 = jnp.sum((s * s < 4.0).T, axis=1)
        np.testing.assert_array_equal(counts2, ref2)
    finally:
        pl.pallas_call = orig


def test_sphere_planar_sweep_matches_engine_f64():
    """The planar f64 structured sweep evaluates the IDENTICAL hypothesis
    set as structured_samples and reproduces the engine's exact f64 counts
    and Cramer fits (the generic engine's throughput driver)."""
    import numpy as np

    from lsqrrecipes_tpu.estimators import ALGEBRAIC, SphereEstimator
    from lsqrrecipes_tpu.ops.planar_points import (
        planar_samples_reference,
        sphere3d_planar_sweep,
    )
    from lsqrrecipes_tpu.ransac.sampling import structured_samples

    key = jax.random.PRNGKey(31)
    k1, k2, k3 = jax.random.split(key, 3)
    d = jax.random.normal(k1, (80, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    pts = jnp.asarray([5.0, -2.0, 11.0]) + 25.0 * d
    pts = pts + 0.3 * jax.random.normal(k2, pts.shape)
    pts = jnp.concatenate(
        [pts, jax.random.uniform(k3, (20, 3), minval=-40.0, maxval=40.0)]
    )
    assert pts.dtype == jnp.float64

    est = SphereEstimator(delta=1.0, dim=3, ls_type=ALGEBRAIC)
    groups = 3
    skey = jax.random.PRNGKey(5)

    counts, params = sphere3d_planar_sweep(pts, skey, groups, est.delta)

    # Same hypothesis set as the engine's structured sampler.
    samples_engine = structured_samples(skey, pts, 4, groups)
    samples_planar = planar_samples_reference(pts, skey, groups)
    np.testing.assert_allclose(np.asarray(samples_planar),
                               np.asarray(samples_engine), rtol=0, atol=0)

    # Same fits and votes as the estimator's own f64 path.
    p_ref, v_ref = jax.vmap(est.minimal_fit)(samples_engine)
    c_ref = jax.vmap(lambda p: jnp.sum(est.agree(p, pts)))(p_ref)
    c_ref = jnp.where(v_ref, c_ref, -1)
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(c_ref))
    keep = np.asarray(v_ref)
    np.testing.assert_allclose(np.asarray(params)[keep],
                               np.asarray(p_ref)[keep], rtol=1e-9, atol=1e-9)

    # Chunked vote path agrees too.
    counts_c, _ = sphere3d_planar_sweep(
        pts, skey, groups, est.delta, chunk=100
    )
    np.testing.assert_array_equal(np.asarray(counts_c), np.asarray(counts))

    # The f64 vote mode is bit-identical to the estimator path too.
    counts_f64, _ = sphere3d_planar_sweep(
        pts, skey, groups, est.delta, vote="f64"
    )
    np.testing.assert_array_equal(np.asarray(counts_f64), np.asarray(c_ref))


def test_ds_vote_equals_f64_vote():
    """The certified double-single vote counts exactly as the all-f64
    squared-band vote: on a bench-scale noisy workload (no point sits
    within 2^-45 * scale of a band edge) and on exactly-representable
    integer data where even band-edge TIES must be decided identically
    (the pair arithmetic is exact there — no rounding anywhere)."""
    import numpy as np

    from lsqrrecipes_tpu.ops.planar_points import (
        _ds_point_pack,
        _ds_vote_counts,
        sphere3d_planar_sweep,
    )

    # Bench-style workload at a few hundred hypotheses.
    key = jax.random.PRNGKey(11)
    k1, k2, k3 = jax.random.split(key, 3)
    d = jax.random.normal(k1, (200, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    pts = jnp.asarray([5.0, -2.0, 11.0]) + 25.0 * d
    pts = pts + 0.3 * jax.random.normal(k2, pts.shape)
    pts = jnp.concatenate(
        [pts, jax.random.uniform(k3, (56, 3), minval=-40.0, maxval=40.0)]
    )
    skey = jax.random.PRNGKey(3)
    c_ds, p_ds = sphere3d_planar_sweep(pts, skey, 2, 1.0, vote="ds")
    c_f64, p_f64 = sphere3d_planar_sweep(pts, skey, 2, 1.0, vote="f64")
    np.testing.assert_array_equal(np.asarray(c_ds), np.asarray(c_f64))
    np.testing.assert_array_equal(np.asarray(p_ds), np.asarray(p_f64))

    # Integer workload with points EXACTLY on band edges: center (3,4,0),
    # r = 5, delta = 2 -> band edges at dist 3 and 7 (d2 at 9 and 49).
    centers = jnp.asarray([[3.0, 4.0, 0.0, 5.0], [0.0, 0.0, 0.0, 2.0]])
    ipts = jnp.asarray(
        [
            [3.0, 4.0, 3.0],   # dist 3: ON lower edge, must NOT vote
            [3.0, 4.0, 7.0],   # dist 7: ON upper edge, must NOT vote
            [3.0, 4.0, 4.0],   # dist 4: inside
            [3.0, 4.0, 6.9],   # inside (noninteger but representable)
            [10.0, 4.0, 0.0],  # dist 7 along x: ON upper edge
            [0.0, 0.0, 0.0],   # dist 5 from sphere 1 (votes); center of
                               # sphere 2 (r == delta): no vote there
            [0.0, 0.0, 1.0],   # dist sqrt(26) from 1 (votes); dist 1
                               # from sphere 2 (votes)
        ]
    )
    cnt_ds = _ds_vote_counts(
        _ds_point_pack(ipts), centers[:, :3], centers[:, 3], 2.0
    )
    # f64 oracle via the estimator's vote_counts (squared band in f64).
    from lsqrrecipes_tpu.estimators import ALGEBRAIC, SphereEstimator

    est = SphereEstimator(delta=2.0, dim=3, ls_type=ALGEBRAIC)
    cnt_f64 = est.vote_counts(centers, ipts)
    np.testing.assert_array_equal(np.asarray(cnt_ds), np.asarray(cnt_f64))
    np.testing.assert_array_equal(np.asarray(cnt_ds), [4, 1])


def test_sqrt_free_band_vote_equals_literal_agree():
    """The squared-band vote ((max(r-d,0))^2 < d2 < (r+d)^2) counts exactly
    the literal |sqrt(d2) - r| < delta oracle, including the edge cases the
    algebra must respect: r < delta (lower band edge vanishes), r == delta
    (a point AT the center has |0 - r| == delta and must NOT vote), and
    points sitting numerically on the band."""
    import numpy as np

    from lsqrrecipes_tpu.estimators import ALGEBRAIC, SphereEstimator

    est = SphereEstimator(delta=1.0, dim=3, ls_type=ALGEBRAIC)

    # Hand-built hypotheses: generic, tiny-radius (r < delta), r == delta.
    params = jnp.asarray(
        [
            [5.0, -2.0, 11.0, 25.0],
            [0.0, 0.0, 0.0, 0.25],     # r < delta: no lower edge
            [0.0, 0.0, 0.0, 1.0],      # r == delta: needs dist > 0 strictly
        ]
    )
    key = jax.random.PRNGKey(7)
    pts = jax.random.uniform(key, (257, 3), minval=-40.0, maxval=40.0)
    # Adversarial rows: the exact center (dist == 0), and points at radial
    # distances r, r±delta, r±delta/2 from each hypothesis center.
    extra = [jnp.zeros((1, 3))]
    for c0, c1, c2, r in np.asarray(params):
        for rad in (r, r - 1.0, r + 1.0, r - 0.5, r + 0.5):
            if rad <= 0:
                continue
            extra.append(jnp.asarray([[c0 + rad, c1, c2]]))
    pts = jnp.concatenate([pts] + extra)
    assert pts.dtype == jnp.float64

    counts_sq = est.vote_counts(params, pts)
    counts_lit = jnp.sum(jax.vmap(lambda p: est.agree(p, pts))(params), -1)
    np.testing.assert_array_equal(np.asarray(counts_sq),
                                  np.asarray(counts_lit))

    # A point exactly at the center of the r == delta hypothesis must not
    # vote for it (strict lower edge) but must vote for r < delta.
    at_center = jnp.zeros((1, 3))
    one = est.vote_counts(params, at_center)
    np.testing.assert_array_equal(np.asarray(one), [0, 1, 0])
