"""Stage-level timing of the plane-phantom fast path on the real chip.

Device-plane traces don't cross the axon tunnel, so the breakdown is done
the only sound way available: time jitted lax.scan sweeps of progressively
larger PREFIXES of the fit pipeline (planes build -> f32 QR -> inverse
iteration -> f64 Rayleigh-Ritz -> reconstruction -> vote) and difference
the times.  Each prefix returns a value derived from its last stage so XLA
cannot dead-code-eliminate earlier work.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")

from lsqrrecipes_tpu.estimators.us_calibration import (  # noqa: E402
    PlanePhantomUSCalibrationEstimator,
)
from lsqrrecipes_tpu.linalg.small import qr_r_planar, solve_rt_r_planar  # noqa: E402
from lsqrrecipes_tpu.ops import us_fast  # noqa: E402
from lsqrrecipes_tpu.synthetic import make_plane_phantom_data  # noqa: E402

print("devices:", jax.devices(), flush=True)

n = 64
import os
groups = int(os.environ.get('PB_GROUPS', '32'))  # B = groups * 64
reps = 8
est = PlanePhantomUSCalibrationEstimator(delta=1.0)
data, _, _ = make_plane_phantom_data(jax.random.PRNGKey(0), n=n)
f32 = jnp.float32


def build_a(key):
    planes, feats = us_fast.build_sampling_planes("plane_phantom", data, key, groups)
    slot_pl = planes
    r_feat = slot_pl[:, 0:9]
    t_feat = slot_pl[:, 9:12]
    u_feat = slot_pl[:, 12:13]
    v_feat = slot_pl[:, 13:14]
    one = jnp.ones_like(u_feat)
    a_pl = jnp.concatenate(
        [u_feat * r_feat, v_feat * r_feat, r_feat, t_feat, one], axis=1
    )
    return a_pl, feats


def stage_planes(key):
    a_pl, _ = build_a(key)
    return jnp.sum(a_pl[:, :, ::173])


def stage_qr(key):
    a_pl, _ = build_a(key)
    r_pl = qr_r_planar(a_pl.astype(f32))
    return jnp.sum(r_pl[:, :, ::173])


def _qr_invit(a_pl):
    bsz = a_pl.shape[-1]
    a32 = a_pl.astype(f32)
    r_pl = qr_r_planar(a32)
    diag = jnp.diagonal(r_pl, axis1=0, axis2=1).T
    floor = jnp.maximum(
        jnp.finfo(f32).eps * jnp.max(jnp.abs(diag), axis=0, keepdims=True), 1e-6
    )
    mag = jnp.maximum(jnp.abs(diag), floor)
    d_clamped = jnp.where(diag < 0, -mag, mag)
    q = 4
    starts = []
    for j in range(q):
        c = np.cos(np.arange(31) * (j + 1) * 0.7) + 0.1
        starts.append(c / np.linalg.norm(c))
    v_pl = jnp.broadcast_to(
        jnp.asarray(np.stack(starts), np.float32)[:, :, None], (q, 31, bsz)
    )

    def _norm_pl(v):
        n2 = jnp.sum(v * v, axis=1, keepdims=True)
        return v * jax.lax.rsqrt(jnp.maximum(n2, 1e-30))

    for _ in range(3):
        v_pl = _norm_pl(solve_rt_r_planar(r_pl, d_clamped, v_pl))
        cols = []
        for j in range(q):
            c = v_pl[j]
            for p in cols:
                c = c - jnp.sum(p * c, axis=0, keepdims=True) * p
            n2 = jnp.sum(c * c, axis=0, keepdims=True)
            cols.append(c * jax.lax.rsqrt(jnp.maximum(n2, 1e-30)))
        v_pl = jnp.stack(cols)
    return v_pl


def stage_invit(key):
    a_pl, _ = build_a(key)
    return jnp.sum(_qr_invit(a_pl)[:, :, ::173])


def stage_full_fit(key):
    planes, _ = us_fast.build_sampling_planes("plane_phantom", data, key, groups)
    params, valid = us_fast._plane_phantom_fit_slots(planes, 31)
    return jnp.sum(params[::173]) + jnp.sum(valid)


def stage_full_sweep(key):
    counts, _ = est.structured_sweep(data, key, groups)
    return jnp.sum(counts)


def timed(fn, tag):
    @jax.jit
    def sweeps(seed0):
        def body(carry, i):
            k = jax.random.fold_in(jax.random.PRNGKey(5), seed0 + i)
            return carry, fn(k)

        _, outs = jax.lax.scan(body, 0, jnp.arange(reps))
        return outs

    np.array(sweeps(0))
    best = None
    for trial in range(3):
        t0 = time.perf_counter()
        outs = np.array(sweeps(1000 * (trial + 1)))
        dt = (time.perf_counter() - t0) / reps
        assert np.all(np.isfinite(outs.astype(np.float64)))
        best = dt if best is None else min(best, dt)
    print(f"{tag:32s} {best * 1e3:8.2f} ms/sweep (B={groups * n})", flush=True)
    return best


t_planes = timed(stage_planes, "planes build + A assembly")
t_qr = timed(stage_qr, "  + f32 planar QR")
t_invit = timed(stage_invit, "  + 3x block inverse iteration")
t_fit = timed(stage_full_fit, "  + f64 Ritz + reconstruction")
t_all = timed(stage_full_sweep, "  + HIGHEST vote (full sweep)")
print(
    f"\ndeltas: QR {1e3 * (t_qr - t_planes):.2f} ms, "
    f"invit {1e3 * (t_invit - t_qr):.2f} ms, "
    f"ritz+recon {1e3 * (t_fit - t_invit):.2f} ms, "
    f"vote {1e3 * (t_all - t_fit):.2f} ms",
    flush=True,
)
