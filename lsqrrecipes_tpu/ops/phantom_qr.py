"""Fused Pallas kernel for the plane-phantom f32 stage: QR + subspace.

The k=31 minimal fit's f32 stage (Householder R factor of the homogeneous
31x31 system + 4-vector block inverse iteration, see
``ops/us_fast._plane_phantom_fit_slots``) runs in XLA as lax.scans of
planar row arithmetic: 31-step scans whose every step is a separate fusion
with dynamic row slice + update — chip traces put the QR scan, the six
triangular-solve scans and their carry packing at ~60% of the whole k=31
sweep.  This kernel executes the identical arithmetic with the matrix
resident in VMEM and every step unrolled to STATIC-slice row operations:

  * layout: each of the 31 columns is a 32-row sublane band of one
    ``[992, TB]`` block (row 31 of each band is zero padding, kept exactly
    zero by the masked updates), batch on lanes;
  * Householder steps mirror ``linalg.small.qr_r_planar`` formula for
    formula (same alpha/denom guards), columns updated in place;
  * the diagonal clamp and the deterministic 4-vector / 2-iteration block
    inverse iteration with Gram-Schmidt mirror the XLA stage, with the
    triangular solves reformulated column-wise so each elimination step is
    ONE [32, TB] multiply-reduce against the masked R column (no dynamic
    slicing, no scan carries);
  * output: the 4 orthonormal subspace vectors as 32-row bands of a
    ``[128, TB]`` block.  The f64 Rayleigh-Ritz stays outside (Mosaic has
    no f64; the subspace only needs to CONTAIN the null direction).

Known Mosaic traps avoided by construction: no transposes, no
fori/while-loop splat carries (everything unrolled), all slices static and
at 32-row (multiple-of-8) offsets, lane width a multiple of 128.

Reference semantics: ``PlanePhantomUSCalibrationParametersEstimator.cxx:
119-355`` (the 31-column homogeneous system whose null vector this stage
isolates).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Q = 4          # subspace vectors
_ITERS = 2      # inverse-iteration steps (matches ops/us_fast)


def _make_kernel():
    # Array constants are rejected by pallas_call ("captures constants");
    # every mask / start vector is generated in-kernel from a row iota —
    # scalar literals only.

    def kernel(a_ref, out_ref):
        cols = [a_ref[32 * c : 32 * (c + 1), :] for c in range(31)]

        ri = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
        live = (ri < 31).astype(jnp.float32)             # pad row off
        ge = [((ri >= j).astype(jnp.float32)) * live for j in range(31)]
        gt = [((ri > j).astype(jnp.float32)) * live for j in range(31)]
        lt = [(ri < j).astype(jnp.float32) for j in range(31)]
        onehot = [(ri == j).astype(jnp.float32) for j in range(31)]
        rf = ri.astype(jnp.float32)
        starts = []
        for q_i in range(_Q):
            s = (jnp.cos(rf * ((q_i + 1) * 0.7)) + 0.1) * live
            s = s * jax.lax.rsqrt(jnp.maximum(jnp.sum(s * s), 1e-30))
            starts.append(s)                             # [32, 1]

        def rsum(x):
            return jnp.sum(x, axis=0, keepdims=True)     # [1, TB]

        # ---- Householder QR (mirrors linalg.small.qr_r_planar) ----------
        d_raw = []
        for j in range(31):
            colj_ge = cols[j] * ge[j]
            sigma = rsum(colj_ge * colj_ge)
            norm = jnp.sqrt(sigma)
            akk = cols[j][j : j + 1, :]
            alpha = jnp.where(akk >= 0, -norm, norm)
            vk = akk - alpha
            denom = alpha * vk
            good = jnp.abs(denom) > 0
            inv_denom = jnp.where(good, 1.0 / jnp.where(good, denom, 1.0), 0.0)
            v = cols[j] * gt[j] + onehot[j] * vk         # [32, TB]
            for c in range(j, 31):
                w = inv_denom * rsum(v * cols[c])
                cols[c] = cols[c] + v * w
            d_raw.append(alpha)                          # R[j, j] after step

        # ---- diagonal clamp (floor = max(eps * max|d|, 1e-6)) ----------
        amax = jnp.abs(d_raw[0])
        for j in range(1, 31):
            amax = jnp.maximum(amax, jnp.abs(d_raw[j]))
        floor = jnp.maximum(jnp.float32(1.1920929e-07) * amax, 1e-6)
        d = []
        for j in range(31):
            mag = jnp.maximum(jnp.abs(d_raw[j]), floor)
            d.append(jnp.where(d_raw[j] < 0, -mag, mag))

        # Masked R columns: rows < c of cols[c] hold R[0..c-1, c]; junk
        # below the diagonal (spent Householder vectors) masked off.
        rcol = [cols[c] * lt[c] for c in range(31)]

        def solve(vin):
            """z = R^{-1} R^{-T} vin, [32, TB] -> [32, TB]."""
            # Forward: R^T y = vin (R^T rows are our column buffers).
            y = jnp.zeros_like(vin)
            for c in range(31):
                s = rsum(rcol[c] * y)
                yc = (vin[c : c + 1, :] - s) / d[c]
                y = y + onehot[c] * yc
            # Backward: R z = y; contributions of z_c land on rows < c.
            z = jnp.zeros_like(vin)
            acc = jnp.zeros_like(vin)
            for c in range(30, -1, -1):
                zc = (y[c : c + 1, :] - acc[c : c + 1, :]) / d[c]
                z = z + onehot[c] * zc
                acc = acc + rcol[c] * zc
            return z

        def normalize(v):
            n2 = rsum(v * v)
            return v * jax.lax.rsqrt(jnp.maximum(n2, 1e-30))

        zero = cols[0] * 0.0
        vs = [zero + starts[q] for q in range(_Q)]
        for _ in range(_ITERS):
            vs = [normalize(solve(v)) for v in vs]
            ortho = []
            for q in range(_Q):
                c = vs[q]
                for p in ortho:
                    c = c - rsum(p * c) * p
                ortho.append(normalize(c))
            vs = ortho

        for q in range(_Q):
            out_ref[32 * q : 32 * (q + 1), :] = vs[q]

    return kernel


@functools.partial(jax.jit, static_argnames=("tb", "interpret"))
def _qr_invit_call(a_bands, tb, interpret):
    with jax.enable_x64(False):
        b = a_bands.shape[-1]
        return pl.pallas_call(
            _make_kernel(),
            grid=(b // tb,),
            in_specs=[
                pl.BlockSpec((992, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((128, tb), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, b), jnp.float32),
            interpret=interpret,
        )(a_bands)


def phantom_subspace(a32, tb: int = 512, interpret=None):
    """``a32 [31, 31, B] f32 -> v [4, 31, B]`` inverse-iteration subspace.

    Drop-in replacement for the XLA qr_r_planar + solve_rt_r_planar stage
    of the k=31 fit (identical arithmetic, VMEM-resident).  B is padded to
    a ``tb`` multiple internally.  ``interpret=None`` auto-selects
    interpret mode on CPU (tests), like ``ops.fused_sweep``.
    """
    if interpret is None:
        from lsqrrecipes_tpu.ops.fused_sweep import _auto_interpret

        interpret = _auto_interpret()
    b = a32.shape[-1]
    padded = -(-b // tb) * tb
    a = jnp.pad(a32, ((0, 1), (0, 0), (0, padded - b)))   # row pad + lane pad
    bands = jnp.transpose(a, (1, 0, 2)).reshape(992, padded)
    out = _qr_invit_call(bands, int(tb), bool(interpret))
    v = out.reshape(4, 32, padded)[:, :31, :b]
    return v
