"""Fused sphere hypothesize+vote Pallas kernel, planar layout.

Layout is everything on TPU: a ``[B, 4, 3]`` samples array tiles its
trailing dims up to (8, 128) — an 85x HBM inflation that dominated the
first version of this kernel.  This version keeps **hypotheses on lanes**
end to end:

  * samples arrive as ONE ``[12, B]`` plane (rows = 4 sample slots x 3
    coordinates), built gather-free by
    :func:`planar_sphere_samples` (permutation + static doubled-array
    slices);
  * the Cramer circumsphere fit (``SphereParametersEstimator.hxx:115-163``)
    runs on ``[1, TB]`` lane vectors — ~40 VPU ops;
  * one ``[8, TB] -> [TB, 8]`` transpose moves the per-hypothesis scalars
    (center, radius, degeneracy) to sublanes;
  * the vote is a ``[TB, 3] @ [3, n_pad]`` MXU matmul with the
    ``|p|^2 - 2 c.p + |c|^2`` epilogue and lane reduction in VMEM;
  * outputs are ``counts[1, B]`` and ``params_t[8, B]`` (planar again —
    callers extract the winner's column, never the full [B, 4] array).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SPHERE_EPS = 1e-9


def _no_x64(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.enable_x64(False):
            return fn(*args, **kwargs)

    return wrapper


def group_shifts(groups: int, k: int, n: int):
    """Static per-group distinct nonzero shifts (slots 1..k-1 of the
    canonical ``sampling.structured_shift_table``; slot 0 is unshifted)."""
    from lsqrrecipes_tpu.ransac.sampling import structured_shift_table

    return structured_shift_table(n, k, groups)[:, 1:]


@functools.partial(jax.jit, static_argnames=("groups",))
def planar_sphere_samples(key, points, groups: int):
    """Gather-free planar sample plane for the fused kernel.

    points ``[n, 3]`` -> ``sxyz[12, groups * n]`` float32, rows ordered
    ``[x0, x1, x2, x3, y0, ..., z3]`` where slot j of hypothesis (g, i) is
    ``perm[(i + s_gj) % n]`` (slot 0 shift is 0).
    """
    n = points.shape[0]
    shifts = group_shifts(groups, 4, n)
    perm = jax.random.permutation(key, n)
    p = jnp.asarray(points, jnp.float32)[perm]          # one tiny gather
    coords = [p[:, 0], p[:, 1], p[:, 2]]
    doubled = [jnp.concatenate([c, c]) for c in coords]

    rows = []
    for c, c2 in zip(coords, doubled):
        # Slot 0: the permuted array tiled across groups.
        rows.append(jnp.broadcast_to(c[None, :], (groups, n)).reshape(-1))
        for j in range(3):
            segs = [
                jax.lax.dynamic_slice_in_dim(c2, int(shifts[g, j]), n)
                for g in range(groups)
            ]
            rows.append(jnp.concatenate(segs))
    # rows currently ordered [x0..x3, y0..y3, z0..z3]
    return jnp.stack(rows, axis=0)


def _fused_kernel(sxyz_ref, points_ref, valid_ref, delta_ref,
                  counts_ref, params_ref):
    def row(i):
        return sxyz_ref[i : i + 1, :]                   # [1, TB] static slice

    sx = [row(i) for i in range(4)]
    sy = [row(4 + i) for i in range(4)]
    sz = [row(8 + i) for i in range(4)]

    a00 = sx[0] - sx[1]; a01 = sy[0] - sy[1]; a02 = sz[0] - sz[1]
    a10 = sx[0] - sx[2]; a11 = sy[0] - sy[2]; a12 = sz[0] - sz[2]
    a20 = sx[0] - sx[3]; a21 = sy[0] - sy[3]; a22 = sz[0] - sz[3]

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

    b0 = a00 * (sx[0] + sx[1]) + a01 * (sy[0] + sy[1]) + a02 * (sz[0] + sz[1])
    b1 = a10 * (sx[0] + sx[2]) + a11 * (sy[0] + sy[2]) + a12 * (sz[0] + sz[2])
    b2 = a20 * (sx[0] + sx[3]) + a21 * (sy[0] + sy[3]) + a22 * (sz[0] + sz[3])

    cx = (c00 * b0 + c01 * b1 + c02 * b2) / det
    cy = (c10 * b0 + c11 * b1 + c12 * b2) / det
    cz = (c20 * b0 + c21 * b1 + c22 * b2) / det
    r = jnp.sqrt((sx[0] - cx) ** 2 + (sy[0] - cy) ** 2 + (sz[0] - cz) ** 2)

    zeros = jnp.zeros_like(cx)
    deg_row = jnp.where(degenerate, 1.0, 0.0)
    scalars = jnp.concatenate(
        [cx, cy, cz, r, deg_row, zeros, zeros, zeros], axis=0
    )                                                   # [8, TB]
    params_ref[:, :] = scalars

    # Vote without any transpose: per-hypothesis scalars stay lane-oriented.
    # agree  <=>  (r - delta)_+^2 < dist^2 < (r + delta)^2, with
    # dist^2[i, m] = pp[m] - 2 c.p + cc[i]; the per-hypothesis constants
    # fold into a 4th matmul row against ones, so both bounds are pure
    # [4, TB] x [4, n_pad] sublane-contracted MXU products plus the pp row.
    delta = delta_ref[0, 0]
    cc = cx * cx + cy * cy + cz * cz                    # [1, TB]
    hi = (r + delta) ** 2
    lo_root = jnp.maximum(r - delta, 0.0)
    lo = lo_root * lo_root

    pts = points_ref[:]                                 # [3, n_pad]
    pp = jnp.sum(pts * pts, axis=0, keepdims=True)      # [1, n_pad]
    ones_row = jnp.ones_like(pp)
    p4 = jnp.concatenate([pts, ones_row], axis=0)       # [4, n_pad]

    # Degenerate hypotheses are folded into the upper bound (a huge positive
    # shift makes e_hi + pp > 0 for every point -> count 0), so the count
    # write stays a pure lane reduction with no cross-orientation select.
    big = jnp.float32(1e30)
    a_hi = jnp.concatenate(
        [-2.0 * cx, -2.0 * cy, -2.0 * cz, cc - hi + big * deg_row], axis=0
    )
    a_lo = jnp.concatenate([-2.0 * cx, -2.0 * cy, -2.0 * cz, cc - lo], axis=0)

    dims = (((0,), (0,)), ((), ()))                     # contract sublanes
    e_hi = jax.lax.dot_general(a_hi, p4, dims, preferred_element_type=jnp.float32)
    e_lo = jax.lax.dot_general(a_lo, p4, dims, preferred_element_type=jnp.float32)
    agree = jnp.logical_and(e_hi + pp < 0.0, e_lo + pp >= 0.0).astype(jnp.float32)

    counts_ref[0, :] = jnp.sum(agree * valid_ref[:], axis=1).astype(jnp.int32)


@_no_x64
@functools.partial(jax.jit, static_argnames=("block_b",))
def sphere_fit_and_vote_planar(sxyz, points_t, valid, delta, block_b: int = 1024):
    """``sxyz[12, B]`` -> ``(counts int32[B], params_t f32[8, B])``.

    params_t rows 0-3 = [cx, cy, cz, r]; extract the winner with
    ``params_t[:4, best]``.  Degenerate (near-coplanar) samples report
    count 0, so they can never win selection (the engine's valid-mask
    convention; only an all-degenerate batch would surface one, and the
    final ``best_count > 0`` gate rejects that).
    """
    b = sxyz.shape[1]
    grid = (b // block_b,)
    counts, params_t = pl.pallas_call(
        _fused_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((12, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(points_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(valid.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, b), jnp.int32),
            jax.ShapeDtypeStruct((8, b), jnp.float32),
        ),
    )(
        jnp.asarray(sxyz, jnp.float32),
        points_t,
        valid,
        jnp.asarray([[delta]], jnp.float32),
    )
    return counts[0], params_t


def mega_group_shifts(groups: int, n: int, seed: int = 987654321):
    """Static per-group slot-shift quadruples, all multiples of 128.

    Mosaic dynamic lane-slices must be provably 128-aligned, so the
    hypothesis variety comes from FOUR independent permutations (one per
    sample slot) x distinct (s0, s1, s2, s3) shift quadruples drawn from
    the 128-multiples in [0, n).  Slot j of hypothesis (g, i) is
    ``perm_j[(i + s_gj) % n]``; cross-permutation slots are independent
    uniform draws (rare coincident points land on the degeneracy mask).
    Distinct quadruples guarantee distinct hypothesis sets across groups —
    and across scan steps when callers request ``groups = steps * G`` and
    slice per step (the permutations then amortize over a whole sweep).
    """
    options = np.arange(0, n, 128)
    rng = np.random.default_rng(seed + n)
    combos = set()
    shifts = np.zeros((groups, 4), dtype=np.int64)
    g = 0
    while g < groups:
        c = tuple(rng.choice(options, size=4))
        if c in combos:
            if len(combos) >= len(options) ** 4:
                combos.clear()  # exhausted: allow repeats
            continue
        combos.add(c)
        shifts[g] = c
        g += 1
    return shifts


def _make_megakernel(delta: float, n: int, n_pad: int, groups: int):
    """Kernel v3: sampling happens *inside* the kernel.

    Per grid step g (one group of n hypotheses): the 4 sample coordinate
    rows are 128-aligned dynamic lane-slices of the doubled per-slot
    permuted coordinate planes (``coords2[3j + c, s_gj : s_gj + n]``), so
    no [12, B] sample plane ever touches HBM — per-step traffic is counts
    + params out only.  Shifts arrive via scalar prefetch.
    """

    def kernel(shifts_ref, coords2_ref, points_ref, valid_ref,
               counts_ref, params_ref):
        g = pl.program_id(0)

        def slot(c, j):
            row = 3 * j + c
            off = pl.multiple_of(shifts_ref[g, j], 128)
            return coords2_ref[row : row + 1, pl.ds(off, n)]

        sx = [slot(0, j) for j in range(4)]
        sy = [slot(1, j) for j in range(4)]
        sz = [slot(2, j) for j in range(4)]

        a00 = sx[0] - sx[1]; a01 = sy[0] - sy[1]; a02 = sz[0] - sz[1]
        a10 = sx[0] - sx[2]; a11 = sy[0] - sy[2]; a12 = sz[0] - sz[2]
        a20 = sx[0] - sx[3]; a21 = sy[0] - sy[3]; a22 = sz[0] - sz[3]

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

        b0 = a00 * (sx[0] + sx[1]) + a01 * (sy[0] + sy[1]) + a02 * (sz[0] + sz[1])
        b1 = a10 * (sx[0] + sx[2]) + a11 * (sy[0] + sy[2]) + a12 * (sz[0] + sz[2])
        b2 = a20 * (sx[0] + sx[3]) + a21 * (sy[0] + sy[3]) + a22 * (sz[0] + sz[3])

        cx = (c00 * b0 + c01 * b1 + c02 * b2) / det
        cy = (c10 * b0 + c11 * b1 + c12 * b2) / det
        cz = (c20 * b0 + c21 * b1 + c22 * b2) / det
        r = jnp.sqrt((sx[0] - cx) ** 2 + (sy[0] - cy) ** 2 + (sz[0] - cz) ** 2)

        zeros = jnp.zeros_like(cx)
        deg_row = jnp.where(degenerate, 1.0, 0.0)
        params_ref[:, :] = jnp.concatenate(
            [cx, cy, cz, r, deg_row, zeros, zeros, zeros], axis=0
        )

        # Single-matmul vote.  With hi = (r+d)^2, lo = max(r-d, 0)^2 the
        # agree test  lo <= dist^2 < hi  is the affine band test |e| < 1 for
        #   e[i, m] = w_i * dist^2[i, m] + o_i,
        #   w = 2/(hi - lo),  o = -(hi + lo)/(hi - lo).
        # dist^2 = pp[m] - 2 c.p + cc expands e into ONE K=5 product:
        #   A5 = [w(-2cx), w(-2cy), w(-2cz), w*cc + o, w]
        #   P5 = [x, y, z, 1, pp]
        # Degenerate lanes take (w, o) = (0, 2) -> e = 2 -> count 0.
        cc = cx * cx + cy * cy + cz * cz
        hi = (r + delta) ** 2
        lo_root = jnp.maximum(r - delta, 0.0)
        lo = lo_root * lo_root
        width = jnp.maximum(hi - lo, jnp.float32(1e-30))
        w = jnp.where(degenerate, 0.0, 2.0 / width)
        o = jnp.where(degenerate, 2.0, -(hi + lo) / width)

        pts = points_ref[:]
        pp = jnp.sum(pts * pts, axis=0, keepdims=True)
        ones_row = jnp.ones_like(pp)
        p5 = jnp.concatenate([pts, ones_row, pp], axis=0)
        a5 = jnp.concatenate(
            [w * (-2.0 * cx), w * (-2.0 * cy), w * (-2.0 * cz), w * cc + o, w],
            axis=0,
        )
        dims = (((0,), (0,)), ((), ()))
        e = jax.lax.dot_general(a5, p5, dims, preferred_element_type=jnp.float32)
        agree = (jnp.abs(e) < 1.0).astype(jnp.float32)
        counts_ref[0, :] = jnp.sum(agree * valid_ref[:], axis=1).astype(jnp.int32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("groups", "delta", "n", "n_pad")
)
def _megakernel_call(shifts, coords2, points_t, valid, groups, delta, n, n_pad):
    with jax.enable_x64(False):
        kernel = _make_megakernel(delta, n, n_pad, groups)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(groups,),
            in_specs=[
                pl.BlockSpec((12, 2 * n), lambda g, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, n_pad), lambda g, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad), lambda g, s: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, n), lambda g, s: (0, g), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, n), lambda g, s: (0, g), memory_space=pltpu.VMEM),
            ),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((1, groups * n), jnp.int32),
                jax.ShapeDtypeStruct((8, groups * n), jnp.float32),
            ),
        )(shifts, coords2, points_t, valid)


def _slot_planes(points, key, n):
    """Four independent permutations -> doubled coord planes ``[12, 2n]``."""
    keys = jax.random.split(key, 4)
    rows = []
    pts32 = jnp.asarray(points, jnp.float32)
    for j in range(4):
        perm = jax.random.permutation(keys[j], n)
        p = pts32[perm].T                               # [3, n]
        rows.append(jnp.concatenate([p, p], axis=1))    # [3, 2n]
    return jnp.concatenate(rows, axis=0)                # [12, 2n]


def fast_sphere_ransac_step(points, points_t, valid, key, groups, delta):
    """One fused step: 4 permutations -> in-kernel sampling+fit+vote -> winner.

    Requires ``points.shape[0] %% 128 == 0`` (Mosaic lane alignment); the
    generic engine path covers other sizes.  Returns
    ``(best_count, best_params[4])``; meant to be called inside a jitted
    scan (see bench.py) or wrapped by the engine.
    """
    n = points.shape[0]
    assert n % 128 == 0, "fast path requires n divisible by 128"
    shifts = jnp.asarray(mega_group_shifts(groups, n), jnp.int32)
    coords2 = _slot_planes(points, key, n)
    counts, params_t = _megakernel_call(
        shifts, coords2, points_t, valid, groups, float(delta), n,
        points_t.shape[1],
    )
    counts = counts[0]
    best = jnp.argmax(counts)
    return counts[best], params_t[:4, best]


def fast_sphere_ransac_sweep(points, points_t, valid, key, groups, steps, delta):
    """Whole hypothesis sweep with amortized permutations.

    The 4 slot permutations are built ONCE; each scan step consumes a
    distinct slice of a ``steps * groups`` static shift-quadruple table, so
    the per-step device work is just the fused kernel + argmax.  Total
    hypotheses = ``steps * groups * n`` (all distinct subsets while the
    quadruple pool ``(n/128)^4`` lasts).  Returns
    ``(best_count, best_params[4])``.
    """
    n = points.shape[0]
    assert n % 128 == 0, "fast path requires n divisible by 128"
    all_shifts = jnp.asarray(
        mega_group_shifts(steps * groups, n), jnp.int32
    ).reshape(steps, groups, 4)
    coords2 = _slot_planes(points, key, n)

    def body(carry, shifts):
        counts, params_t = _megakernel_call(
            shifts, coords2, points_t, valid, groups, float(delta), n,
            points_t.shape[1],
        )
        counts = counts[0]
        best = jnp.argmax(counts)
        better = counts[best] > carry[0]
        return (
            jnp.where(better, counts[best], carry[0]),
            jnp.where(better, params_t[:4, best], carry[1]),
        ), None

    init = (jnp.asarray(-1, jnp.int32), jnp.zeros((4,), jnp.float32))
    (count, params), _ = jax.lax.scan(body, init, all_shifts)
    return count, params


def reference_mega_samples(points, key, groups):
    """Pure-jnp reconstruction of the megakernel's hypothesis set (tests)."""
    n = points.shape[0]
    shifts = mega_group_shifts(groups, n)
    planes = _slot_planes(points, key, n)               # [12, 2n]
    slots = []
    for j in range(4):
        per_group = []
        for g in range(groups):
            s = int(shifts[g, j])
            per_group.append(planes[3 * j : 3 * j + 3, s : s + n])  # [3, n]
        slots.append(jnp.concatenate(per_group, axis=1))            # [3, B]
    # -> samples [B, 4, 3]
    stacked = jnp.stack(slots, axis=0)                  # [4, 3, B]
    return jnp.transpose(stacked, (2, 0, 1))
