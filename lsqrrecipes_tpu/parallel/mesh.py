"""Mesh construction and multi-host initialization helpers."""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize JAX's multi-host runtime (no-op for single-process runs).

    On a TPU pod slice the arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters.
    """
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process environment
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def default_mesh(
    axis_names: Sequence[str] = ("hypotheses", "data"),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over all devices with named RANSAC axes.

    With the default shape all devices go to the ``hypotheses`` axis (the
    embarrassingly parallel direction; observation sharding is only needed
    when the data set exceeds per-chip HBM).  Pass ``shape=(h, d)`` to split
    between hypothesis and observation parallelism — inlier counts and refit
    sufficient statistics are then ``psum``-reduced over the ``data`` axis,
    riding ICI within a slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))
