#!/usr/bin/env python
"""Headline benchmark: batched RANSAC hypotheses/second on one TPU chip.

Workload: 3D sphere estimation (minimal circumsphere fits + inlier voting)
on n=1024 points with 20% outliers — the same workload as the compiled-C++
serial baseline (``native/ransac_baseline.cpp``, the stand-in for the
reference's RANSAC engine, which needs VNL to compile).  ``vs_baseline`` is
TPU hypotheses/s divided by single-core C++ hypotheses/s; BASELINE.json's
target is >100x at one host.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Usage: python bench.py [--metric ransac|lm|pivot|dense|us|generic]
       [--path fused_sweep|scan] [--points N] [--hypotheses B] [--steps K]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def build_and_run_cpp_baseline(n_points, hypotheses=200_000, name="ransac_baseline"):
    """Compile (cached) and run a serial C++ baseline; returns hyp/s.

    BEST of 3 runs: the host is shared, and a co-tenant burst during the
    single timed pass once under-reported the phantom baseline by 2x —
    inflating the TPU ratio.  Taking the baseline's best keeps every
    vs_baseline conservative.  If the 3 runs disperse by more than 1.3x
    (max/min) the denominator is suspect — retry the batch once and warn
    on stderr so a poisoned ratio can't be committed silently.
    """
    src = os.path.join(REPO, "native", name + ".cpp")
    binary = os.path.join(REPO, "native", name)
    # us_baseline: the tree-vectorizer at -march=native miscompiles (SIGSEGV)
    # on this toolchain; scalar -march=native code is also measurably faster
    # for it, so the flag favors the baseline.
    extra = ["-fno-tree-vectorize"] if name == "us_baseline" else []
    if not os.path.exists(binary) or os.path.getmtime(binary) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", *extra, "-o", binary, src],
            check=True,
        )
    def run_batch():
        rates = []
        for _ in range(3):
            out = subprocess.run(
                [binary, str(n_points), str(hypotheses)],
                check=True,
                capture_output=True,
                text=True,
            )
            rates.append(float(json.loads(out.stdout)["hyp_per_s"]))
        return rates

    rates = run_batch()
    if max(rates) / min(rates) > 1.3:
        print(
            f"WARNING: {name} baseline runs disperse {max(rates)/min(rates):.2f}x"
            f" ({rates}); retrying once (co-tenant contention?)",
            file=sys.stderr,
        )
        rates += run_batch()
        if max(rates) / min(rates) > 1.3:
            print(
                f"WARNING: {name} baseline still noisy after retry ({rates});"
                " using the best run — treat vs_baseline with care",
                file=sys.stderr,
            )
    return max(rates)


def bench_pivot(args):
    """Pivot-calibration RANSAC throughput: fused sweep vs serial C++.

    The C++ baseline (native/pivot_baseline.cpp) uses the same closed-form
    Schur minimal fit and the reference's early-exit vote loop — i.e. it is
    deliberately favored vs the reference's 9x6 SVD, so the reported ratio
    is conservative.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lsqrrecipes_tpu.geometry import Frame, rotations
    from lsqrrecipes_tpu.ops import fused_sweep as fs

    cpp_hps = build_and_run_cpp_baseline(
        args.points, args.baseline_hypotheses // 2, name="pivot_baseline"
    )

    n = args.points
    key = jax.random.PRNGKey(42)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n_in = n * 4 // 5
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
    r_out = rot(k3, n - n_in)
    t_out = jax.random.uniform(k4, (n - n_in, 3), minval=-200.0, maxval=200.0)
    frames = Frame(jnp.concatenate([r_in, r_out]), jnp.concatenate([t_in, t_out]))

    total_groups = max(1, (args.hypotheses // n) * args.steps // 2)
    reps = 8

    @jax.jit
    def sweeps(seed0):
        def body(carry, i):
            count, _ = fs.fused_sweep(
                "pivot", frames,
                jax.random.fold_in(jax.random.PRNGKey(0), seed0 + i),
                total_groups, 1.0,
            )
            return carry, count
        _, counts = jax.lax.scan(body, 0, jnp.arange(reps))
        return counts

    np.array(sweeps(0))
    elapsed = None
    for trial in range(3):
        t0 = time.perf_counter()
        counts = np.array(sweeps(100 + reps * trial))
        t = (time.perf_counter() - t0) / reps
        assert (counts > 0).all(), "pivot timing sweeps found no inliers"
        elapsed = t if elapsed is None else min(elapsed, t)

    tpu_hps = total_groups * n / elapsed
    print(
        json.dumps(
            {
                "metric": "pivot_ransac_hypotheses_per_s",
                "value": round(tpu_hps, 1),
                "unit": "hypotheses/s",
                "vs_baseline": round(tpu_hps / cpp_hps, 2),
            }
        )
    )


def bench_dense(args):
    """Dense-linear-system (6 unknowns) RANSAC throughput vs serial C++.

    The C++ baseline (native/dense_baseline.cpp) solves each 6x6 minimal
    system via normal-equation Cholesky with early-exit votes — favored vs
    the reference's SVD pseudo-inverse, so the ratio is conservative.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lsqrrecipes_tpu.ops import fused_sweep as fs

    cpp_hps = build_and_run_cpp_baseline(
        args.points, args.baseline_hypotheses // 2, name="dense_baseline"
    )

    n = args.points
    key = jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(key, 3)
    x_true = jnp.asarray([1.5, -2.0, 0.5, 3.0, -1.0, 2.5])
    a = jax.random.uniform(k1, (n, 6), minval=-10.0, maxval=10.0)
    b = a @ x_true + 0.05 * jax.random.normal(k2, (n,))
    b = b.at[-(n // 5):].add(
        jax.random.uniform(k3, (n // 5,), minval=5.0, maxval=50.0)
    )
    rows = jnp.concatenate([a, b[:, None]], axis=1)

    total_groups = max(1, (args.hypotheses // n) * args.steps // 2)
    reps = 24  # amortize the ~25 ms tunnel RTT (~34 ms device per sweep)

    @jax.jit
    def sweeps(seed0):
        def body(carry, i):
            count, _ = fs.fused_sweep(
                "dense_linear6", rows,
                jax.random.fold_in(jax.random.PRNGKey(0), seed0 + i),
                total_groups, 1.0,
            )
            return carry, count
        _, counts = jax.lax.scan(body, 0, jnp.arange(reps))
        return counts

    np.array(sweeps(0))
    elapsed = None
    for trial in range(3):
        t0 = time.perf_counter()
        counts = np.array(sweeps(100 + reps * trial))
        t = (time.perf_counter() - t0) / reps
        assert (counts > 0).all(), "dense timing sweeps found no inliers"
        elapsed = t if elapsed is None else min(elapsed, t)

    tpu_hps = total_groups * n / elapsed
    print(
        json.dumps(
            {
                "metric": "dense_ransac_hypotheses_per_s",
                "value": round(tpu_hps, 1),
                "unit": "hypotheses/s",
                "vs_baseline": round(tpu_hps / cpp_hps, 2),
            }
        )
    )


def bench_us(args):
    """Crosswire-US-calibration RANSAC throughput vs serial C++.

    TPU path (``--path fused_sweep``, default): the whole sweep as ONE
    Pallas kernel (ops/fused_sweep.py "crosswire" family) — in-kernel
    lanes-form f32 Householder QR minimal fits, Newton-polar
    orthonormalization, R2-orthogonality band vote via 3-pass bf16-split
    products, SMEM best accumulation.  ``--path scan``: the XLA
    planar-lane structured sweep (ops/us_fast.py).  The C++ baseline
    (native/us_baseline.cpp) runs the equivalent pipeline serially with the
    reference's early-exit vote loop — favored vs the reference's 12x12 SVD
    per hypothesis, so the ratio is conservative.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lsqrrecipes_tpu.estimators import CrosswireUSCalibrationEstimator
    from lsqrrecipes_tpu.estimators.us_calibration import _euler_zyx_matrix
    from lsqrrecipes_tpu.geometry import Frame

    cpp_hps = build_and_run_cpp_baseline(
        args.points, args.baseline_hypotheses // 4, name="us_baseline"
    )

    # Same data model as the C++ baseline: known calibration, 20% corrupted
    # poses, 0.5 px image noise.
    n = args.points
    key = jax.random.PRNGKey(42)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    m_x, m_y = 0.143, 0.139
    r3 = _euler_zyx_matrix(1.1, 0.4, -0.7)
    t3 = jnp.asarray([20.0, -15.0, 40.0])
    t1 = jnp.asarray([30.0, 76.0, -58.0])
    q = jax.random.uniform(k1, (n, 2)) * jnp.asarray([640.0, 480.0])
    w2 = jax.random.uniform(k2, (n, 3), minval=0.0, maxval=jnp.pi)
    r2 = jax.vmap(lambda w: _euler_zyx_matrix(w[2], w[1], w[0]))(w2)
    img = q[:, 0:1] * (m_x * r3[:, 0]) + q[:, 1:2] * (m_y * r3[:, 1]) + t3
    t2 = t1 - jnp.einsum("nij,nj->ni", r2, img)
    n_out = n // 5
    bad = t2[-n_out:] + (30.0 + 50.0 * jax.random.uniform(k3, (n_out, 3))) * jnp.sign(
        jax.random.normal(k4, (n_out, 3))
    )
    t2 = t2.at[-n_out:].set(bad)
    # Image noise on inliers only, matching native/us_baseline.cpp:173-178.
    q = q.at[: n - n_out].add(0.5 * jax.random.normal(k5, (n - n_out, 2)))
    data = (Frame(r2, t2), q)

    est = CrosswireUSCalibrationEstimator(delta=3.0)
    reps = 12  # amortize the ~25 ms tunnel RTT (distinct keys per sweep)
    if args.path == "fused_sweep":
        from lsqrrecipes_tpu.ops import fused_sweep as fs

        total_groups = max(1, (args.hypotheses // n) * args.steps // 4)
        hyp_per_sweep = total_groups * n

        @jax.jit
        def sweeps(seed0):
            def body(carry, i):
                count, _ = fs.fused_sweep(
                    "crosswire", data,
                    jax.random.fold_in(jax.random.PRNGKey(0), seed0 + i),
                    total_groups, est.delta,
                )
                return carry, count

            _, counts = jax.lax.scan(body, 0, jnp.arange(reps))
            return counts
    else:
        groups_per_step = max(1, min(16, args.hypotheses // n // 4))
        steps = max(1, args.hypotheses // (groups_per_step * n))
        hyp_per_sweep = steps * groups_per_step * n

        @jax.jit
        def sweeps(seed0):
            def body(carry, i):
                k = jax.random.fold_in(jax.random.PRNGKey(17), seed0 + i)
                counts, _ = est.structured_sweep(data, k, groups_per_step)
                return carry, jnp.max(counts)

            _, counts = jax.lax.scan(
                body, 0, jnp.arange(reps * steps)
            )
            return counts

    np.array(sweeps(0))
    elapsed = None
    for trial in range(3):
        t0 = time.perf_counter()
        counts = np.array(sweeps(1000 * (trial + 1)))
        t = (time.perf_counter() - t0) / reps
        assert (counts > (4 * n) // 5 - n // 10).all(), "US sweeps missed the structure"
        elapsed = t if elapsed is None else min(elapsed, t)

    tpu_hps = hyp_per_sweep / elapsed
    print(
        json.dumps(
            {
                "metric": "us_calibration_ransac_hypotheses_per_s",
                "value": round(tpu_hps, 1),
                "unit": "hypotheses/s",
                "vs_baseline": round(tpu_hps / cpp_hps, 2),
            }
        )
    )


def bench_pointer(args):
    """Calibrated-pointer US-calibration RANSAC throughput vs serial C++.

    TPU path (default): the whole sweep as ONE Pallas kernel
    (ops/fused_sweep.py "pointer" family) — in-kernel lanes-form 9x9 f32
    Householder QR minimal fits, Newton-polar orthonormalization,
    R2-orthogonality band vote via 3-pass bf16-split products.  ``--path
    scan``: the XLA planar-lane structured sweep (ops/us_fast.py).  The C++
    baseline (native/pointer_baseline.cpp) runs the equivalent pipeline
    serially with the reference's early-exit vote loop — favored vs the
    reference's 9x9 SVD pseudo-inverse per hypothesis
    (``SinglePointTarget...cxx:763-914``), so the ratio is conservative.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lsqrrecipes_tpu.estimators import PointerUSCalibrationEstimator
    from lsqrrecipes_tpu.estimators.us_calibration import _euler_zyx_matrix
    from lsqrrecipes_tpu.geometry import Frame

    cpp_hps = build_and_run_cpp_baseline(
        args.points, args.baseline_hypotheses // 4, name="pointer_baseline"
    )

    # Same data model as the C++ baseline: known calibration, random probe
    # poses, 20% corrupted tip positions, 0.5 px image noise.
    n = args.points
    key = jax.random.PRNGKey(43)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    m_x, m_y = 0.143, 0.139
    r3 = _euler_zyx_matrix(1.1, 0.4, -0.7)
    t3 = jnp.asarray([20.0, -15.0, 40.0])
    q = jax.random.uniform(k1, (n, 2)) * jnp.asarray([640.0, 480.0])
    w2 = jax.random.uniform(k2, (n, 3), minval=0.0, maxval=jnp.pi)
    r2 = jax.vmap(lambda w: _euler_zyx_matrix(w[2], w[1], w[0]))(w2)
    t2 = 200.0 * (jax.random.uniform(k6, (n, 3)) - 0.5)
    img = q[:, 0:1] * (m_x * r3[:, 0]) + q[:, 1:2] * (m_y * r3[:, 1]) + t3
    p = t2 + jnp.einsum("nij,nj->ni", r2, img)
    n_out = n // 5
    bad = p[-n_out:] + (30.0 + 50.0 * jax.random.uniform(k3, (n_out, 3))) * jnp.sign(
        jax.random.normal(k4, (n_out, 3))
    )
    p = p.at[-n_out:].set(bad)
    # Image noise on inliers only, matching native/pointer_baseline.cpp:177-182.
    q = q.at[: n - n_out].add(0.5 * jax.random.normal(k5, (n - n_out, 2)))
    data = (Frame(r2, t2), q, p)

    est = PointerUSCalibrationEstimator(delta=3.0)
    reps = 12  # amortize the ~25 ms tunnel RTT (distinct keys per sweep)
    if args.path == "fused_sweep":
        from lsqrrecipes_tpu.ops import fused_sweep as fs

        total_groups = max(1, (args.hypotheses // n) * args.steps // 4)
        hyp_per_sweep = total_groups * n

        @jax.jit
        def sweeps(seed0):
            def body(carry, i):
                count, _ = fs.fused_sweep(
                    "pointer", data,
                    jax.random.fold_in(jax.random.PRNGKey(0), seed0 + i),
                    total_groups, est.delta,
                )
                return carry, count

            _, counts = jax.lax.scan(body, 0, jnp.arange(reps))
            return counts
    else:
        groups_per_step = max(1, min(16, args.hypotheses // n // 4))
        steps = max(1, args.hypotheses // (groups_per_step * n))
        hyp_per_sweep = steps * groups_per_step * n

        @jax.jit
        def sweeps(seed0):
            def body(carry, i):
                k = jax.random.fold_in(jax.random.PRNGKey(17), seed0 + i)
                counts, _ = est.structured_sweep(data, k, groups_per_step)
                return carry, jnp.max(counts)

            _, counts = jax.lax.scan(
                body, 0, jnp.arange(reps * steps)
            )
            return counts

    np.array(sweeps(0))
    elapsed = None
    for trial in range(3):
        t0 = time.perf_counter()
        counts = np.array(sweeps(1000 * (trial + 1)))
        t = (time.perf_counter() - t0) / reps
        assert (counts > (4 * n) // 5 - n // 10).all(), (
            "pointer sweeps missed the structure"
        )
        elapsed = t if elapsed is None else min(elapsed, t)

    tpu_hps = hyp_per_sweep / elapsed
    print(
        json.dumps(
            {
                "metric": "pointer_us_calibration_ransac_hypotheses_per_s",
                "value": round(tpu_hps, 1),
                "unit": "hypotheses/s",
                "vs_baseline": round(tpu_hps / cpp_hps, 2),
            }
        )
    )


def bench_phantom(args):
    """Plane-phantom US-calibration (k=31) RANSAC throughput vs serial C++.

    TPU path: the planar structured sweep (``ops/us_fast.py``) — f32 planar
    Householder QR of the homogeneous 31x31 minimal systems + f64
    Rayleigh-Ritz null-vector refinement + HIGHEST-precision plane-distance
    vote.  The C++ baseline (``native/phantom_baseline.cpp``) solves each
    minimal system with a normal-matrix partial-pivot LU + inverse iteration
    and votes precomputed feature rows with the reference's early exit —
    deliberately favored vs the reference's per-hypothesis 31x31 SVD
    (``PlanePhantomUSCalibrationParametersEstimator.cxx:119-355``), so the
    reported ratio is conservative.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lsqrrecipes_tpu.estimators import PlanePhantomUSCalibrationEstimator
    from lsqrrecipes_tpu.geometry import Frame
    from lsqrrecipes_tpu.synthetic import make_plane_phantom_data

    n = 64  # matches the k=31 example workload scale (50-80 elements)
    cpp_hps = build_and_run_cpp_baseline(
        n, args.baseline_hypotheses // 8, name="phantom_baseline"
    )

    # Same data model as the C++ baseline: plane-constrained poses, 0.5 px
    # image noise, 10% of poses shoved off the phantom plane (k = 31 puts
    # the clean-sample probability at 0.9^31 ~ 3.8%; 20% outliers would
    # starve any realistic hypothesis budget, C++ and TPU alike).
    (frames, q), _, true = make_plane_phantom_data(
        jax.random.PRNGKey(42), n=n, sigma=0.5
    )
    n_out = n // 10
    k1, k2 = jax.random.split(jax.random.PRNGKey(43))
    shift = (20.0 + 40.0 * jax.random.uniform(k1, (n_out, 1))) * jnp.sign(
        jax.random.normal(k2, (n_out, 1))
    )
    frames = Frame(
        frames.r, frames.t.at[-n_out:].add(shift * true["r1_row3"])
    )
    data = (frames, q)

    est = PlanePhantomUSCalibrationEstimator(delta=1.0)
    # B = 64k per sweep (was 32k): the round-5 stage work cut device time
    # to ~6 ms/sweep at 32k, putting the ~25 ms tunnel round-trip back at
    # ~25% of a reps=12 wall measurement; bigger sweeps + 16 reps push the
    # dispatch under ~10%.  Every sweep still sees a distinct key.
    groups = max(1, min(args.hypotheses // n, 1024))
    hyp_per_sweep = groups * n
    reps = 16

    @jax.jit
    def sweeps(seed0):
        def body(carry, i):
            k = jax.random.fold_in(jax.random.PRNGKey(5), seed0 + i)
            counts, _ = est.structured_sweep(data, k, groups)
            return carry, jnp.max(counts)

        _, tops = jax.lax.scan(body, 0, jnp.arange(reps))
        return tops

    np.array(sweeps(0))
    elapsed = None
    for trial in range(3):
        t0 = time.perf_counter()
        tops = np.array(sweeps(1000 * (trial + 1)))
        t = (time.perf_counter() - t0) / reps
        assert (tops > n // 2).all(), "phantom sweeps missed the structure"
        elapsed = t if elapsed is None else min(elapsed, t)

    tpu_hps = hyp_per_sweep / elapsed
    print(
        json.dumps(
            {
                "metric": "phantom_ransac_hypotheses_per_s",
                "value": round(tpu_hps, 1),
                "unit": "hypotheses/s",
                "vs_baseline": round(tpu_hps / cpp_hps, 2),
            }
        )
    )


def bench_generic(args):
    """The f64 parity engine on the sphere workload — faithful reference
    semantics (f64 Cramer fits, SPHERE_EPS gates, exact agree votes), not
    the f32 redesigns.

    ``--path fused_sweep`` (default): the planar structured driver
    (``ops/planar_points.sphere3d_planar_sweep``) — same f64 fits/gates,
    lanes layout instead of the (8,128)-padded ``[B, k, d]`` samples and
    rolls instead of gathers.  Its default band vote is the CERTIFIED
    double-single evaluation (``--vote ds``): exact over the f64 inputs
    except within ~2^-45 * scale of the band edge — a strictly smaller
    boundary contract than the one the f64 engine already has vs the
    reference's differently-associated C++ expression (chip gate:
    ``scripts/chip_check.py --families generic_ds`` demands exact
    ds-vs-f64 count equality on chip).  ``--vote f64`` forces the all-f64
    vote, bit-equal to the engine path (``tests/test_ops.py``).
    ``--path scan``: the original gather-based ``hypothesize_and_vote``
    rounds.

    Same C++ denominator as the headline metric (serial circumsphere RANSAC
    with early-exit votes)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lsqrrecipes_tpu.estimators import ALGEBRAIC, SphereEstimator
    from lsqrrecipes_tpu.ops.planar_points import sphere3d_planar_sweep
    from lsqrrecipes_tpu.ransac.engine import hypothesize_and_vote
    from lsqrrecipes_tpu.ransac.sampling import sample_k_with_replacement

    cpp_hps = build_and_run_cpp_baseline(args.points, args.baseline_hypotheses)

    n = args.points
    key = jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(key, 3)
    n_in = n * 4 // 5
    d = jax.random.normal(k1, (n_in, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    pts = jnp.concatenate(
        [
            jnp.asarray([5.0, -2.0, 11.0]) + 25.0 * d
            + 0.3 * jax.random.normal(k2, (n_in, 3)),
            jax.random.uniform(k3, (n - n_in, 3), minval=-40.0, maxval=40.0),
        ]
    )
    assert pts.dtype == jnp.float64

    est = SphereEstimator(delta=1.0, dim=3, ls_type=ALGEBRAIC)
    batch = min(8192, args.hypotheses)
    steps = max(1, args.hypotheses // batch // 4)
    reps = 4

    if args.path == "fused_sweep":
        groups = batch // n

        @jax.jit
        def sweeps(seed0):
            def body(carry, i):
                k = jax.random.fold_in(jax.random.PRNGKey(23), seed0 + i)
                counts, _params = sphere3d_planar_sweep(
                    pts, k, groups, est.delta, vote=args.vote
                )
                return carry, jnp.max(counts)

            _, counts = jax.lax.scan(body, 0, jnp.arange(reps * steps))
            return counts

        batch = groups * n
    else:

        @jax.jit
        def sweeps(seed0):
            def body(carry, i):
                k = jax.random.fold_in(jax.random.PRNGKey(23), seed0 + i)
                idx = sample_k_with_replacement(k, n, est.k, batch)
                count, _mask, _params = hypothesize_and_vote(est, pts, idx)
                return carry, count

            _, counts = jax.lax.scan(body, 0, jnp.arange(reps * steps))
            return counts

    np.array(sweeps(0))
    elapsed = None
    for trial in range(3):
        t0 = time.perf_counter()
        counts = np.array(sweeps(1000 * (trial + 1)))
        t = (time.perf_counter() - t0) / reps
        assert (counts > (4 * n) // 5 - n // 10).all(), "generic sweeps missed the sphere"
        elapsed = t if elapsed is None else min(elapsed, t)

    tpu_hps = steps * batch / elapsed
    print(
        json.dumps(
            {
                "metric": "generic_f64_ransac_hypotheses_per_s",
                "value": round(tpu_hps, 1),
                "unit": "hypotheses/s",
                "vs_baseline": round(tpu_hps / cpp_hps, 2),
            }
        )
    )


def bench_lm(args):
    """Secondary metric: vmapped geometric-sphere LM iterations/second.

    B independent LM problems (one per RANSAC consensus refit in a real
    sweep) run as one vmapped ``lax.while_loop``; iterations/s counts
    B x (iterations to convergence of the slowest lane) — the amount of
    iteration work the lockstep batch actually executes.  The C++ baseline
    (``native/lm_baseline.cpp``) runs the same damped-normal-equation LM
    (Nielsen schedule, gtol stop) serially on the same workload and counts
    its actual iterations, so the ratio compares work throughput.
    """
    import jax
    import jax.numpy as jnp

    from lsqrrecipes_tpu.estimators.sphere import (
        _sphere_jacobian,
        _sphere_residual,
    )
    from lsqrrecipes_tpu.linalg import LMConfig, levenberg_marquardt

    b, n = args.hypotheses // 32, 256

    src = os.path.join(REPO, "native", "lm_baseline.cpp")
    binary = os.path.join(REPO, "native", "lm_baseline")
    if not os.path.exists(binary) or os.path.getmtime(binary) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-o", binary, src], check=True
        )
    out = subprocess.run(
        [binary, str(b), str(n)], check=True, capture_output=True, text=True
    )
    cpp_ips = float(json.loads(out.stdout)["iters_per_s"])

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    centers = jax.random.uniform(k1, (b, 3), jnp.float32, -50, 50)
    d = jax.random.normal(k2, (b, n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pts = centers[:, None, :] + 25.0 * d + 0.3 * jax.random.normal(k3, (b, n, 3), jnp.float32)
    x0 = jnp.concatenate(
        [centers + 1.0, jnp.full((b, 1), 23.0, jnp.float32)], axis=1
    )

    # Timing through the axon tunnel is only sound as ONE jitted dispatch
    # whose outputs are actually fetched: pipelined multi-dispatch timings
    # under a single block_until_ready under-report by 10-100x (the relay
    # resolves futures before execution drains), and repeat executions of an
    # identical call are memoized.  So: lax.scan over `reps` perturbed
    # problems inside one jit, fetch the per-rep results, divide.
    reps = 8

    if args.path == "fused_sweep":
        # Fused Pallas LM megakernel (ops/sphere_lm.py): planar layout,
        # in-kernel J^T J / J^T r reductions + unrolled damped Cholesky.
        # Measured ~4x the vmapped-XLA path at (B=4096, m=256).
        from lsqrrecipes_tpu.ops.sphere_lm import sphere_lm_batch

        def solve(x0_, pts_):
            x, cost, iters, conv = sphere_lm_batch(
                pts_, x0_, max_iters=30, gtol=1e-6
            )
            return x, iters
    else:
        config = LMConfig(max_iters=30, ftol=0.0, xtol=0.0, gtol=1e-6)

        def solve(x0_, pts_):
            res = jax.vmap(
                lambda x, p: levenberg_marquardt(
                    _sphere_residual, _sphere_jacobian, x, p, config=config
                )
            )(x0_, pts_)
            return res.x, res.iterations

    @jax.jit
    def sweep(x0, pts, shifts):
        def body(carry, s):
            x, iters = solve(x0, pts + jnp.stack([s, 0.0 * s, 0.0 * s]))
            return carry, (jnp.mean(x[:, 0]), jnp.max(iters))
        _, (mx, its) = jax.lax.scan(body, 0, shifts)
        return mx, its

    import numpy as np

    shifts = jnp.arange(1, reps + 1, dtype=pts.dtype) * 0.01
    np.array(sweep(x0, pts, shifts)[0])          # compile + sync
    best, iters = None, 0
    for trial in range(3):                       # min-of-3: device is shared
        scale = 2.0 + trial
        t0 = time.perf_counter()
        mx, its = sweep(x0, pts, scale * shifts)     # fresh problems
        mx, its = np.array(mx), np.array(its)        # fetch = real sync
        elapsed = (time.perf_counter() - t0) / reps
        # Each rep's recovered mean center-x must track its own data shift —
        # proof the timed work actually ran.
        drift = np.diff(mx)
        assert np.all(np.abs(drift - 0.01 * scale) < 1e-3), "bogus outputs"
        if best is None or elapsed < best:
            best, iters = elapsed, int(its.max())
    rate = b * iters / best
    print(
        json.dumps(
            {
                "metric": "lm_iterations_per_s",
                "value": round(rate, 1),
                "unit": "LM iterations/s (batched problems x inner steps)",
                "vs_baseline": round(rate / cpp_ips, 2),
            }
        )
    )


def bench_lm_pointer(args):
    """Pointer-US-calibration LM refits/second: sufficient-statistics LM.

    B independent 8-parameter pointer calibrations (n observations each)
    solved by :mod:`lsqrrecipes_tpu.linalg.stats_lm`: the observations are
    touched ONCE (per-problem feature Gram matrices, one einsum), then every
    LM iteration is O(1) dense algebra per problem, vmapped over lanes.  The
    C++ baseline (``native/lm_pointer_baseline.cpp``) mirrors the
    reference's per-iteration O(n) Jacobian accumulation
    (``SinglePointTarget...cxx:916-973``) with favored micro-optimizations
    (pre-rotated residuals, analytic J, 8x8 Cholesky).  Both sides use the
    same damping schedule and gtol, so iterations/s compares like work.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lsqrrecipes_tpu.estimators.us_calibration import _euler_zyx_matrix
    from lsqrrecipes_tpu.geometry import Frame
    from lsqrrecipes_tpu.linalg import LMConfig
    from lsqrrecipes_tpu.linalg import stats_lm

    b, n = args.hypotheses // 32, 256

    src = os.path.join(REPO, "native", "lm_pointer_baseline.cpp")
    binary = os.path.join(REPO, "native", "lm_pointer_baseline")
    if not os.path.exists(binary) or os.path.getmtime(binary) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-o", binary, src], check=True
        )
    out = subprocess.run(
        [binary, str(b), str(n)], check=True, capture_output=True, text=True
    )
    cpp_ips = float(json.loads(out.stdout)["iters_per_s"])

    # Same data model as the C++ baseline: shared ground truth, per-problem
    # random poses, 0.5 px image noise, start at truth + (1mm, 0.02 rad,
    # 0.005) perturbation.
    m_x, m_y = 0.143, 0.139
    w3 = jnp.asarray([1.1, 0.4, -0.7])
    t3 = jnp.asarray([20.0, -15.0, 40.0])
    r3 = _euler_zyx_matrix(w3[0], w3[1], w3[2])
    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jax.random.uniform(k1, (b, n, 2)) * jnp.asarray([640.0, 480.0])
    w2 = jax.random.uniform(k2, (b, n, 3), minval=0.0, maxval=jnp.pi)
    r2 = jax.vmap(jax.vmap(lambda w: _euler_zyx_matrix(w[2], w[1], w[0])))(w2)
    t2 = 200.0 * (jax.random.uniform(k3, (b, n, 3)) - 0.5)
    img = q[..., 0:1] * (m_x * r3[:, 0]) + q[..., 1:2] * (m_y * r3[:, 1]) + t3
    p = jnp.einsum("bnij,bnj->bni", r2, img) + t2
    q = q + 0.5 * jax.random.normal(k4, q.shape)
    x0 = jnp.concatenate([t3 + 1.0, w3 + 0.02, jnp.asarray([m_x, m_y]) + 0.005])
    x0s = jnp.broadcast_to(x0, (b, 8))

    config = LMConfig(max_iters=50, ftol=0.0, xtol=0.0, gtol=1e-6)
    r2col0 = r2[..., :, 0]                       # R2 e1 per observation

    reps = 8

    @jax.jit
    def sweep(shifts):
        def body(carry, s):
            # Shifting p by s * R2 e1 shifts the optimal t3_x by exactly s —
            # per-rep outputs must track it (proof the timed work ran).
            data = (Frame(r2, t2), q, p + s * r2col0)
            h = jax.vmap(stats_lm.pointer_stats)(data)
            res = stats_lm.feature_lm_planar(
                stats_lm.pointer_w, h, x0s, config
            )
            return carry, (jnp.mean(res.x[:, 0]), jnp.max(res.iterations))
        _, (t3x, its) = jax.lax.scan(body, 0, shifts)
        return t3x, its

    shifts = jnp.arange(1, reps + 1, dtype=jnp.float64) * 0.25
    np.array(sweep(shifts)[0])                   # compile + sync
    best, iters = None, 0
    for trial in range(3):
        scale = 2.0 + trial
        t0 = time.perf_counter()
        t3x, its = sweep(scale * shifts)
        t3x, its = np.array(t3x), np.array(its)
        elapsed = (time.perf_counter() - t0) / reps
        drift = np.diff(t3x)
        assert np.all(np.abs(drift - 0.25 * scale) < 1e-3), "bogus outputs"
        if best is None or elapsed < best:
            best, iters = elapsed, int(its.max())
    rate = b * iters / best
    print(
        json.dumps(
            {
                "metric": "lm_pointer_iterations_per_s",
                "value": round(rate, 1),
                "unit": "LM iterations/s (batched problems x inner steps)",
                "vs_baseline": round(rate / cpp_ips, 2),
            }
        )
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--metric",
        default="ransac",
        choices=[
            "ransac", "lm", "lm_pointer", "pivot", "dense", "us", "pointer",
            "phantom", "generic",
        ],
    )
    parser.add_argument(
        "--path",
        default="fused_sweep",
        choices=["fused_sweep", "scan"],
        help="fused_sweep = whole sweep as ONE Pallas kernel (default); "
        "scan = per-step megakernel under lax.scan (the previous headline path)",
    )
    parser.add_argument("--dtype", default="f32", choices=["f32", "f64"])
    parser.add_argument("--vote", default="ds", choices=["ds", "f64"],
                        help="generic-engine band vote: certified "
                             "double-single (default) or all-f64")
    parser.add_argument("--points", type=int, default=1024)
    parser.add_argument("--hypotheses", type=int, default=131072)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--baseline-hypotheses", type=int, default=200_000)
    args = parser.parse_args()

    if args.metric == "lm":
        bench_lm(args)
        return
    if args.metric == "lm_pointer":
        bench_lm_pointer(args)
        return
    if args.metric == "pivot":
        bench_pivot(args)
        return
    if args.metric == "dense":
        bench_dense(args)
        return
    if args.metric == "us":
        bench_us(args)
        return
    if args.metric == "pointer":
        bench_pointer(args)
        return
    if args.metric == "phantom":
        bench_phantom(args)
        return
    if args.metric == "generic":
        bench_generic(args)
        return

    cpp_hps = build_and_run_cpp_baseline(args.points, args.baseline_hypotheses)

    import jax
    import jax.numpy as jnp

    from lsqrrecipes_tpu.estimators import ALGEBRAIC, SphereEstimator
    from lsqrrecipes_tpu.ops.sphere_ransac import fast_sphere_ransac_sweep
    from lsqrrecipes_tpu.ops.vote import pack_points

    dtype = jnp.float32 if args.dtype == "f32" else jnp.float64

    # Same data model as the C++ baseline: 80% inliers on a sphere + 20%
    # uniform outliers.
    key = jax.random.PRNGKey(42)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n_in = args.points * 4 // 5
    d = jax.random.normal(k1, (n_in, 3), dtype)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    center = jnp.asarray([5.0, -2.0, 11.0], dtype)
    inliers = center + 25.0 * d + 0.3 * jax.random.normal(k2, (n_in, 3), dtype)
    outliers = jax.random.uniform(
        k3, (args.points - n_in, 3), dtype, minval=-40.0, maxval=40.0
    )
    points = jnp.concatenate([inliers, outliers])

    est = SphereEstimator(delta=1.0, dim=3, ls_type=ALGEBRAIC)

    groups = max(1, args.hypotheses // args.points)
    hypotheses_per_step = groups * args.points

    if args.path == "fused_sweep":
        # The whole sweep is ONE Pallas kernel (ops/fused_sweep.py): grid =
        # total groups, in-kernel 128-aligned slice sampling over 4
        # permutations per slot, Cramer circumsphere fit, single-matmul
        # affine band vote, and the running best accumulated in VMEM/SMEM
        # scratch across sequential grid steps — zero per-step HBM traffic.
        from lsqrrecipes_tpu.ops.fused_sweep import fused_sweep

        total_groups = groups * args.steps

        @jax.jit
        def run(seed0):
            return fused_sweep(
                "sphere3d", points, jax.random.PRNGKey(seed0),
                total_groups, est.delta,
            )
    else:
        # Previous headline path: a lax.scan of per-step megakernels with the
        # running best carried host-side of the scan.
        points_t, valid, _ = pack_points(points)

        @jax.jit
        def run(seed0):
            return fast_sphere_ransac_sweep(
                points, points_t, valid, jax.random.PRNGKey(seed0),
                groups, args.steps, est.delta,
            )

    # Sound tunnel timing (see bench_lm): ONE jitted dispatch scanning over
    # `reps` distinct-seed sweeps, outputs fetched.  24 sweeps/scan: the
    # ~25 ms tunnel round-trip is ~12% of a reps=8 wall measurement at
    # ~22 ms device time per sweep; every sweep still sees a distinct seed.
    import numpy as np

    reps = 24

    @jax.jit
    def timed_sweeps(seed0):
        def body(carry, i):
            count, _params = run(seed0 + i)
            return carry, count
        _, counts = jax.lax.scan(body, 0, jnp.arange(reps))
        return counts

    np.array(timed_sweeps(0))                    # compile + sync
    elapsed = None
    for trial in range(3):                       # min-of-3: device is shared
        t0 = time.perf_counter()
        counts = np.array(timed_sweeps(100 + reps * trial))  # fresh seeds
        t = (time.perf_counter() - t0) / reps
        assert (counts > 0).all(), "timing sweeps found no inliers"
        elapsed = t if elapsed is None else min(elapsed, t)

    tpu_hps = hypotheses_per_step * args.steps / elapsed
    print(
        json.dumps(
            {
                "metric": "ransac_hypotheses_per_s",
                "value": round(tpu_hps, 1),
                "unit": "hypotheses/s",
                "vs_baseline": round(tpu_hps / cpp_hps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
