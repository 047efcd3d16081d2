"""Fused RANSAC vote kernels.

Counts inliers for a batch of hypotheses against all observations without
ever materializing the [B, n] distance/agree matrix in HBM:

  * the c.p term rides the MXU (``[TB, d] @ [d, n]`` per tile),
  * the epilogue (norm completion, |dist - r| < delta, reduce over n) runs
    on the VPU over VMEM-resident tiles,
  * HBM traffic is just params in + counts out (points stay resident).

Memory layout: ``points_t`` is the transposed, lane-padded point matrix
``[d, n_pad]`` with a validity row mask; build it once per data set with
:func:`pack_points`.  Counts are returned as ``int32[1, B]`` (lane-major)
so every ref in the kernel is 2D and 128-lane aligned.
"""

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def pallas_available():
    if not _HAS_PALLAS:
        return False
    try:
        # Respect an explicit CPU/GPU default device (the test/dev story on
        # machines where the TPU plugin is always registered): Mosaic only
        # lowers for the device the computation actually runs on.
        dev = jax.config.jax_default_device
        if dev is not None:
            return dev.platform in ("tpu", "axon")
        return any(d.platform in ("tpu", "axon") for d in jax.devices())
    except Exception:  # pragma: no cover
        return False


def _round_up(x, m):
    return -(-x // m) * m


def _no_x64(fn):
    """Trace the wrapped pallas_call with x64 disabled.

    The package enables x64 globally for parity numerics; inside these f32
    kernels that only leaks i64 into Mosaic's index arithmetic and breaks
    lowering.  All kernel inputs/outputs are explicitly f32/i32.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.enable_x64(False):
            return fn(*args, **kwargs)

    return wrapper


def pack_points(points):
    """``[n, d] -> (points_t[d, n_pad] f32, valid[1, n_pad] f32, n)``."""
    n, d = points.shape
    n_pad = _round_up(n, 128)
    pts = jnp.asarray(points, jnp.float32)
    points_t = jnp.zeros((d, n_pad), jnp.float32).at[:, :n].set(pts.T)
    valid = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(1.0)
    return points_t, valid, n


def _sphere_vote_kernel(params_ref, points_ref, valid_ref, delta_ref, counts_ref):
    c = params_ref[:, 0:3]                      # [TB, 3]
    r = params_ref[:, 3]                        # [TB]
    pts = points_ref[:]                         # [3, n_pad]
    cp = jnp.dot(c, pts, preferred_element_type=jnp.float32)   # MXU [TB, n_pad]
    pp = jnp.sum(pts * pts, axis=0)[None, :]
    cc = jnp.sum(c * c, axis=1)[:, None]
    d2 = pp - 2.0 * cp + cc
    # Sqrt-free squared band, same predicate as the estimator's XLA
    # vote_counts (which dispatches here for f32/B%512==0 — the two paths
    # of ONE method must use the same arithmetic so counts don't depend
    # on batch size at band edges): (max(r-delta,0))^2 < d2 < (r+delta)^2.
    delta = delta_ref[0, 0]
    rp = r + delta
    rm = r - delta
    hi2 = (rp * rp)[:, None]
    lo2 = jnp.where(rm >= 0.0, rm * rm, -jnp.inf)[:, None]
    agree = ((d2 < hi2) & (d2 > lo2)).astype(jnp.float32)
    counts_ref[0, :] = jnp.sum(agree * valid_ref[:], axis=1).astype(jnp.int32)


@_no_x64
@functools.partial(jax.jit, static_argnames=("block_b",))
def sphere_vote_counts(params, points_t, valid, delta, block_b: int = 512):
    """Inlier counts for sphere hypotheses.

    params: ``[B, 4]`` (center, radius) float32, B a multiple of block_b;
    points_t/valid from :func:`pack_points`.  Returns ``int32[B]``.
    """
    b = params.shape[0]
    grid = (b // block_b,)
    counts = pl.pallas_call(
        _sphere_vote_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(points_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(valid.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.int32),
    )(
        jnp.asarray(params, jnp.float32),
        points_t,
        valid,
        jnp.asarray([[delta]], jnp.float32),
    )
    return counts[0]


def _plane_vote_kernel(params_ref, points_ref, valid_ref, delta_sq_ref, counts_ref):
    d = points_ref.shape[0]
    n_vec = params_ref[:, :d]                   # [TB, d]
    offset = params_ref[:, d]                   # [TB]
    pts = points_ref[:]                         # [d, n_pad]
    s = jnp.dot(n_vec, pts, preferred_element_type=jnp.float32)
    s = s - offset[:, None]
    agree = (s * s < delta_sq_ref[0, 0]).astype(jnp.float32)
    counts_ref[0, :] = jnp.sum(agree * valid_ref[:], axis=1).astype(jnp.int32)


@_no_x64
@functools.partial(jax.jit, static_argnames=("block_b",))
def plane_vote_counts(params, points_t, valid, delta_sq, block_b: int = 512):
    """Inlier counts for plane/line2d-style signed-distance hypotheses.

    params: ``[B, d+1]`` rows ``[normal(d), offset]`` with offset = n . a;
    agree iff ``(n . p - offset)^2 < delta_sq``.  Returns ``int32[B]``.
    """
    b = params.shape[0]
    grid = (b // block_b,)
    counts = pl.pallas_call(
        _plane_vote_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_b, params.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(points_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(valid.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.int32),
    )(
        jnp.asarray(params, jnp.float32),
        points_t,
        valid,
        jnp.asarray([[delta_sq]], jnp.float32),
    )
    return counts[0]
