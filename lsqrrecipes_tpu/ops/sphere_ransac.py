"""Fused sphere hypothesize+vote Pallas kernel.

One kernel per hypothesis tile does the *entire* RANSAC inner step for 3D
spheres:

  1. Cramer circumsphere fit from the 4 gathered sample points
     (``SphereParametersEstimator.hxx:115-163`` closed form) — straight-line
     VPU arithmetic over the [TB] tile,
  2. degeneracy masking (|det| < SPHERE_EPS -> count forced to -1),
  3. the vote: ``dist^2 = |p|^2 - 2 c.p + |c|^2`` with the c.p term on the
     MXU against the VMEM-resident point matrix, epilogue + reduction on
     the VPU.

HBM traffic per tile: the [TB, 4, 3] samples in, [TB] counts + [TB, 4]
params out — the [B, n] agree matrix never exists.
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SPHERE_EPS = 1e-9


def _no_x64(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.enable_x64(False):
            return fn(*args, **kwargs)

    return wrapper


def _fit_and_vote_kernel(sx_ref, sy_ref, sz_ref, points_ref, valid_ref,
                         delta_ref, counts_ref, params_ref):
    # Sample coordinates, one row per hypothesis: [TB, 4] per axis.
    sx, sy, sz = sx_ref[:], sy_ref[:], sz_ref[:]

    def col(a, j):
        return a[:, j]

    # Cramer circumsphere (same arithmetic as linalg.small.solve3 applied to
    # the equal-radius system).
    a00 = col(sx, 0) - col(sx, 1); a01 = col(sy, 0) - col(sy, 1); a02 = col(sz, 0) - col(sz, 1)
    a10 = col(sx, 0) - col(sx, 2); a11 = col(sy, 0) - col(sy, 2); a12 = col(sz, 0) - col(sz, 2)
    a20 = col(sx, 0) - col(sx, 3); a21 = col(sy, 0) - col(sy, 3); a22 = col(sz, 0) - col(sz, 3)

    c00 = a11 * a22 - a12 * a21
    c10 = a12 * a20 - a10 * a22
    c20 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c10 + a02 * c20
    degenerate = jnp.abs(det) < SPHERE_EPS
    det = jnp.where(degenerate, 1.0, 2.0 * det)

    c01 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c21 = a01 * a20 - a00 * a21
    c02 = a01 * a12 - a02 * a11
    c12 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10

    b0 = a00 * (col(sx, 0) + col(sx, 1)) + a01 * (col(sy, 0) + col(sy, 1)) + a02 * (col(sz, 0) + col(sz, 1))
    b1 = a10 * (col(sx, 0) + col(sx, 2)) + a11 * (col(sy, 0) + col(sy, 2)) + a12 * (col(sz, 0) + col(sz, 2))
    b2 = a20 * (col(sx, 0) + col(sx, 3)) + a21 * (col(sy, 0) + col(sy, 3)) + a22 * (col(sz, 0) + col(sz, 3))

    cx = (c00 * b0 + c01 * b1 + c02 * b2) / det
    cy = (c10 * b0 + c11 * b1 + c12 * b2) / det
    cz = (c20 * b0 + c21 * b1 + c22 * b2) / det
    r = jnp.sqrt(
        (col(sx, 0) - cx) ** 2 + (col(sy, 0) - cy) ** 2 + (col(sz, 0) - cz) ** 2
    )

    c = jnp.stack([cx, cy, cz], axis=1)                        # [TB, 3]
    params_ref[:] = jnp.concatenate([c, r[:, None]], axis=1)

    # Vote: MXU for c.p, VPU epilogue, reduce over points.
    pts = points_ref[:]                                        # [3, n_pad]
    cp = jnp.dot(c, pts, preferred_element_type=jnp.float32)
    pp = jnp.sum(pts * pts, axis=0)[None, :]
    cc = cx * cx + cy * cy + cz * cz
    dist = jnp.sqrt(jnp.maximum(pp - 2.0 * cp + cc[:, None], 0.0))
    agree = (jnp.abs(dist - r[:, None]) < delta_ref[0, 0]).astype(jnp.float32)
    counts = jnp.sum(agree * valid_ref[:], axis=1).astype(jnp.int32)
    counts_ref[0, :] = jnp.where(degenerate, -1, counts)


@_no_x64
@functools.partial(jax.jit, static_argnames=("block_b",))
def sphere_fit_and_vote(samples, points_t, valid, delta, block_b: int = 1024):
    """samples ``[B, 4, 3]`` f32 -> ``(counts int32[B], params f32[B, 4])``.

    B must divide by block_b; points_t/valid from ``ops.vote.pack_points``.
    Degenerate (near-coplanar) samples report count = -1, mirroring the
    engine's invalid-hypothesis convention.
    """
    b = samples.shape[0]
    grid = (b // block_b,)
    # Split coordinates into three [B, 4] lane-friendly planes.
    sx = samples[:, :, 0]
    sy = samples[:, :, 1]
    sz = samples[:, :, 2]
    coord_spec = pl.BlockSpec((block_b, 4), lambda i: (i, 0), memory_space=pltpu.VMEM)
    counts, params = pl.pallas_call(
        _fit_and_vote_kernel,
        grid=grid,
        in_specs=[
            coord_spec,
            coord_spec,
            coord_spec,
            pl.BlockSpec(points_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(valid.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, b), jnp.int32),
            jax.ShapeDtypeStruct((b, 4), jnp.float32),
        ),
    )(
        jnp.asarray(sx, jnp.float32),
        jnp.asarray(sy, jnp.float32),
        jnp.asarray(sz, jnp.float32),
        points_t,
        valid,
        jnp.asarray([[delta]], jnp.float32),
    )
    return counts[0], params
