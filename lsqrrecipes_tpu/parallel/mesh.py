"""Mesh construction and multi-host initialization helpers."""

import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize JAX's multi-host runtime.

    On a TPU pod slice the arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters.  With explicit arguments any
    failure RAISES (a misconfigured multi-host job must not silently degrade
    to single-process); with no arguments a failed auto-detection warns and
    continues single-process (the common laptop/single-chip case).
    """
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception as e:
            warnings.warn(
                "jax.distributed auto-initialization unavailable; continuing "
                f"single-process ({type(e).__name__}: {e})",
                RuntimeWarning,
                stacklevel=2,
            )
    else:
        # Explicit cluster spec: propagate errors to the caller.
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
