"""Checkpoint/resume for long RANSAC sweeps.

The reference has no checkpointing (runs are seconds-long; SURVEY.md
section 5); pod-scale hypothesis sweeps justify lightweight state capture:
the PRNG key, the best-so-far model, its vote count and consensus mask, and
the number of hypotheses already evaluated.  State round-trips through a
plain ``.npz`` so resumption works across processes and hosts.
"""

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class SweepState(NamedTuple):
    key: jnp.ndarray            # PRNG key for the next round
    evaluated: int              # hypotheses evaluated so far
    best_count: int
    best_mask: jnp.ndarray      # [n] bool
    best_params: jnp.ndarray    # winning minimal-fit parameters


def distributed_process_index() -> int:
    """The process's rank in the ACTIVE distributed cluster.

    ``jax.process_index()`` consults the default backend; under a
    single-process device plugin (e.g. the axon TPU tunnel) it reports 0 on
    EVERY process even while a ``jax.distributed`` CPU/Gloo cluster is
    active — which silently broke the single-writer convention (both
    processes wrote the checkpoint, races ensued).  The distributed
    runtime's own process id is authoritative when a cluster was joined.
    """
    try:
        from jax._src import distributed

        state = distributed.global_state
        if state.client is not None and state.process_id is not None:
            return int(state.process_id)
    except (ImportError, AttributeError):
        pass
    return jax.process_index()


def distributed_barrier(name: str, timeout_ms: int = 120_000) -> None:
    """A REAL cross-process barrier via the coordination service.

    ``multihost_utils.sync_global_devices`` runs a collective on the
    default backend's devices — a no-op under single-process plugins (see
    :func:`distributed_process_index`).  No cluster -> no-op.
    """
    try:
        from jax._src import distributed

        client = distributed.global_state.client
    except (ImportError, AttributeError):
        client = None
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def new_state(key, n, nparams):
    return SweepState(
        key=key,
        evaluated=0,
        best_count=-1,
        best_mask=jnp.zeros((n,), bool),
        best_params=jnp.zeros((nparams,)),
    )


def save_state(path, state: SweepState):
    # Unique-per-process tmp name: two writers racing on the same path must
    # never consume each other's tmp (write-then-rename stays atomic even if
    # the single-writer convention is violated upstream).
    tmp = f"{path}.tmp.{os.getpid()}.npz"
    with open(tmp, "wb") as f:
        np.savez(
            f,
            key=np.asarray(state.key),
            evaluated=state.evaluated,
            best_count=state.best_count,
            best_mask=np.asarray(state.best_mask),
            best_params=np.asarray(state.best_params),
        )
    os.replace(tmp, path)


def load_state(path) -> Optional[SweepState]:
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return SweepState(
            key=jnp.asarray(z["key"]),
            evaluated=int(z["evaluated"]),
            best_count=int(z["best_count"]),
            best_mask=jnp.asarray(z["best_mask"]),
            best_params=jnp.asarray(z["best_params"]),
        )


def resumable_sweep(
    est,
    data,
    key,
    total_hypotheses: int,
    batch_size: int = 65536,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1,
):
    """Run a fixed-total hypothesis sweep in rounds, checkpointing between.

    Returns the final :class:`SweepState`; feed it to
    :func:`lsqrrecipes_tpu.ransac.engine.consensus_refit` via its mask for
    the final model.  If ``checkpoint_path`` exists, the sweep resumes from
    it (the saved PRNG key guarantees the same hypothesis stream).
    """
    from lsqrrecipes_tpu.ransac.engine import _data_size, _sample, hypothesize_and_vote

    # Multi-host runs: every process executes the same deterministic sweep
    # (same key stream), but only process 0 writes the checkpoint; all
    # processes read it on resume (shared-filesystem convention, matching
    # orbax's single-writer default).  Rank comes from the distributed
    # runtime, NOT jax.process_index() — see distributed_process_index.
    writer = distributed_process_index() == 0

    n = _data_size(data)
    state = load_state(checkpoint_path) if checkpoint_path else None
    if state is None:
        state = new_state(key, n, est.nparams)

    rounds = 0
    while state.evaluated < total_hypotheses:
        key, sub = jax.random.split(state.key)
        b = min(batch_size, total_hypotheses - state.evaluated)
        idx = _sample(sub, n, est.k, b)
        count, mask, params = hypothesize_and_vote(est, data, idx)
        if int(count) > state.best_count:
            state = state._replace(
                best_count=int(count), best_mask=mask, best_params=params
            )
        state = state._replace(key=key, evaluated=state.evaluated + b)
        rounds += 1
        if writer and checkpoint_path and rounds % checkpoint_every == 0:
            save_state(checkpoint_path, state)
    if writer and checkpoint_path:
        save_state(checkpoint_path, state)
    return state
