"""Worker for the two-process distributed test (see test_multiprocess.py).

Run as: ``python multiprocess_worker.py <process_id> <port>`` with
``XLA_FLAGS=--xla_force_host_platform_device_count=4`` so the two processes
form one 8-device global CPU mesh.  Each process:

  1. joins the cluster via ``initialize_distributed`` (explicit args — a
     failure must RAISE, which is itself part of what the test checks),
  2. builds identical data and hypothesis indices from fixed seeds,
  3. runs the single-process engine locally as the reference,
  4. runs ``build_sharded_ransac_step`` over the (4 hypotheses x 2 data)
     GLOBAL mesh — psum/all_gather cross process boundaries via Gloo —
  5. asserts exact agreement and prints ``WORKER_OK``.
"""

import sys

import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]

    # jax.distributed.initialize must run before anything touches the XLA
    # backend — importing lsqrrecipes_tpu initializes it, so the cluster
    # join happens here, directly (initialize_distributed wraps the same
    # call for in-application use, where import order is the caller's job).
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    # Keep every local computation off the (possibly busy) TPU tunnel.
    jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from lsqrrecipes_tpu.estimators import Line2DEstimator
    from lsqrrecipes_tpu.parallel.sharded import build_sharded_ransac_step
    from lsqrrecipes_tpu.ransac.engine import hypothesize_and_vote
    from lsqrrecipes_tpu.ransac.sampling import sample_k_subsets

    # Deterministic shared inputs.
    n = 512
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    t = jax.random.uniform(k1, (n, 1), minval=-40, maxval=40)
    u = jnp.asarray([0.8, 0.6])
    pts = jnp.asarray([-2.0, 5.0]) + t * u + 0.1 * jax.random.normal(k2, (n, 2))
    n_out = n // 5
    pts = pts.at[-n_out:].set(
        jax.random.uniform(k3, (n_out, 2), minval=-40, maxval=40)
    )
    est = Line2DEstimator(delta=0.5)
    idx = sample_k_subsets(jax.random.PRNGKey(7), n, est.k, 512)

    # Single-process reference on this process's local CPU.
    ref_count, _ref_mask, _ = hypothesize_and_vote(est, pts, idx)
    ref_params, ref_ok = est.lsq_fit(pts, _ref_mask)

    # Global 2-process mesh: 4 hypothesis shards x 2 data shards.
    devs = np.array(jax.devices("cpu")).reshape(4, 2)
    mesh = Mesh(devs, ("hypotheses", "data"))

    def make_global(x, spec):
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, spec), lambda i: np.asarray(x[i])
        )

    idx_g = make_global(idx, P("hypotheses"))
    data_g = make_global(pts, P())
    step = build_sharded_ransac_step(est, mesh)
    res = step(data_g, idx_g)

    count = int(res.best_count)
    params = np.asarray(res.params)
    assert count == int(ref_count), (count, int(ref_count))
    assert bool(res.valid) == bool(ref_ok)
    np.testing.assert_allclose(params, np.asarray(ref_params), atol=1e-12)

    # ---- Phase 2: checkpoint/resume across the two-process cluster --------
    # (``ransac/checkpoint.py:84-90`` multi-host claim: every process runs
    # the same deterministic sweep, only process 0 writes, all read on
    # resume).  Simulate a kill one round in: run ONE 256-hypothesis round
    # with the checkpoint enabled, barrier so process 1 sees process 0's
    # file, then resume to the full 1024 budget and compare against an
    # uninterrupted no-checkpoint run.
    if len(sys.argv) > 3:
        import os

        from lsqrrecipes_tpu.ransac.checkpoint import (
            distributed_barrier,
            distributed_process_index,
            load_state,
            resumable_sweep,
        )

        # Under the axon plugin jax.process_index() lies (always 0) and
        # multihost_utils.sync_global_devices is a default-backend no-op —
        # both must come from the distributed runtime (this is exactly the
        # bug the round-3 flake exposed in checkpoint.py).
        assert distributed_process_index() == pid

        ckpt = sys.argv[3]
        key = jax.random.PRNGKey(11)
        full = resumable_sweep(
            est, pts, key, total_hypotheses=1024, batch_size=256
        )
        resumable_sweep(
            est, pts, key, total_hypotheses=256, batch_size=256,
            checkpoint_path=ckpt,
        )  # "killed" after round 1
        if pid != 0:
            # This process is the non-writer: its own tmp (tmp names carry
            # the writer's pid) must never have been created.  Process 0's
            # in-flight tmp may legitimately coexist, so only our own pid
            # is checked.
            assert not os.path.exists(
                f"{ckpt}.tmp.{os.getpid()}.npz"
            ), "non-writer wrote"
        distributed_barrier("ckpt-round1-written")
        assert os.path.exists(ckpt), "process 0 checkpoint missing"
        _st = load_state(ckpt)
        assert _st.evaluated == 256, (
            f"pid={pid} evaluated={_st.evaluated} best={_st.best_count}"
        )
        # Both processes must finish READING the round-1 state before
        # process 0's resume below starts overwriting it (evaluated grows
        # to 512/768/1024) — without this barrier the read races the
        # writer and the assert above flakes.
        distributed_barrier("ckpt-round1-verified")
        resumed = resumable_sweep(
            est, pts, key, total_hypotheses=1024, batch_size=256,
            checkpoint_path=ckpt,
        )
        assert resumed.evaluated == full.evaluated == 1024
        assert resumed.best_count == full.best_count
        np.testing.assert_array_equal(
            np.asarray(resumed.key), np.asarray(full.key)
        )
        np.testing.assert_array_equal(
            np.asarray(resumed.best_mask), np.asarray(full.best_mask)
        )
        np.testing.assert_allclose(
            np.asarray(resumed.best_params), np.asarray(full.best_params),
            rtol=0, atol=0,
        )
        distributed_barrier("ckpt-done")

    print(f"WORKER_OK pid={pid} count={count}", flush=True)


if __name__ == "__main__":
    main()
