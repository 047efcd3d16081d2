"""Where the faithful-f64 generic engine spends its time on the chip.

Prefix timing of the planar f64 sphere sweep (ops/planar_points.py):
sampling-plane build -> Cramer fits -> exact agree vote.  Each prefix
returns values derived from its last stage so XLA cannot dead-code earlier
work; sound tunnel timing (one jitted lax.scan per measurement).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lsqrrecipes_tpu.config import SPHERE_EPS
from lsqrrecipes_tpu.ops import planar_points as pp
from lsqrrecipes_tpu.ransac.sampling import structured_shift_table

print("devices:", jax.devices(), flush=True)

n, groups, reps = 1024, 8, 8
key = jax.random.PRNGKey(42)
k1, k2, k3 = jax.random.split(key, 3)
n_in = n * 4 // 5
d = jax.random.normal(k1, (n_in, 3))
d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
pts = jnp.concatenate([
    jnp.asarray([5.0, -2.0, 11.0]) + 25.0 * d
    + 0.3 * jax.random.normal(k2, (n_in, 3)),
    jax.random.uniform(k3, (n - n_in, 3), minval=-40.0, maxval=40.0),
])
assert pts.dtype == jnp.float64


def slots_of(k):
    perm = jax.random.permutation(k, n)
    pts_t = pts[perm].T
    table = structured_shift_table(n, 4, groups)
    return [pp._slot_planes(pts_t, table, groups, j) for j in range(4)]


def fit_of(k):
    q0, q1, q2, q3 = slots_of(k)
    rest = (q1, q2, q3)
    m = [q0 - q for q in rest]
    rhs = [jnp.sum(mi * (q0 + qi), axis=0) for mi, qi in zip(m, rest)]

    def cof(r1, r2, c1, c2):
        return m[r1][c1] * m[r2][c2] - m[r1][c2] * m[r2][c1]

    adj = [[cof((j + 1) % 3, (j + 2) % 3, (i + 1) % 3, (i + 2) % 3)
            for j in range(3)] for i in range(3)]
    det = m[0][0] * adj[0][0] + m[0][1] * adj[1][0] + m[0][2] * adj[2][0]
    valid = jnp.abs(det) >= SPHERE_EPS
    inv2det = 0.5 / jnp.where(valid, det, 1.0)
    center = jnp.stack(
        [(adj[i][0] * rhs[0] + adj[i][1] * rhs[1] + adj[i][2] * rhs[2])
         * inv2det for i in range(3)]
    )
    r = jnp.sqrt(jnp.sum((q0 - center) ** 2, axis=0))
    return center, r, valid


def stage_planes(k):
    s = slots_of(k)
    return sum(jnp.sum(x[:, ::173]) for x in s)


def stage_fit(k):
    center, r, valid = fit_of(k)
    return jnp.sum(center[:, ::173]) + jnp.sum(r[::173]) + jnp.sum(valid)


def stage_vote_einsum(k):
    center, r, valid = fit_of(k)
    cp = jnp.einsum("bd,nd->bn", center.T, pts,
                    preferred_element_type=pts.dtype)
    return jnp.sum(cp[::311, ::173]) + jnp.sum(r[::173]) + jnp.sum(valid)


def stage_vote_d2(k):
    center, r, valid = fit_of(k)
    c_bt = center.T
    cp = jnp.einsum("bd,nd->bn", c_bt, pts,
                    preferred_element_type=pts.dtype)
    d2 = (jnp.sum(pts * pts, axis=-1)[None, :] - 2.0 * cp
          + jnp.sum(c_bt * c_bt, axis=-1)[:, None])
    return jnp.sum(d2[::311, ::173]) + jnp.sum(r[::173]) + jnp.sum(valid)


def stage_full(k):
    # vote="f64" so the delta vs the d2 prefix isolates the f64 band
    # compares — the default DS vote replaces the einsum/d2 pipeline
    # entirely and would make this delta meaningless (or negative).
    counts, params = pp.sphere3d_planar_sweep(pts, k, groups, 1.0,
                                              vote="f64")
    return jnp.max(counts) + jnp.sum(params[::517])


def stage_full_ds(k):
    counts, params = pp.sphere3d_planar_sweep(pts, k, groups, 1.0,
                                              vote="ds")
    return jnp.max(counts) + jnp.sum(params[::517])


def timed(fn, tag):
    @jax.jit
    def sweeps(seed0):
        def body(c, i):
            return c, fn(jax.random.fold_in(jax.random.PRNGKey(7), seed0 + i))
        _, outs = jax.lax.scan(body, 0, jnp.arange(reps))
        return outs

    np.array(sweeps(0))
    best = None
    for t in range(3):
        t0 = time.perf_counter()
        outs = np.array(sweeps(1000 * (t + 1)))
        dt = (time.perf_counter() - t0) / reps
        assert np.all(np.isfinite(outs.astype(np.float64)))
        best = dt if best is None else min(best, dt)
    print(f"{tag:28s} {best * 1e3:8.2f} ms/sweep (B={groups * n})", flush=True)
    return best


t_p = timed(stage_planes, "planes build")
t_f = timed(stage_fit, "  + f64 Cramer fits")
t_e = timed(stage_vote_einsum, "  + f64 [B,3]@[3,n] einsum")
t_d = timed(stage_vote_d2, "  + d2 assembly")
t_a = timed(stage_full, "  + squared-band compares")
t_ds = timed(stage_full_ds, "FULL sweep, certified-DS vote")
print(
    f"\ndeltas: fits {1e3 * (t_f - t_p):.2f} ms, "
    f"einsum {1e3 * (t_e - t_f):.2f} ms, "
    f"d2 {1e3 * (t_d - t_e):.2f} ms, "
    f"band {1e3 * (t_a - t_d):.2f} ms  "
    f"({groups * n} x {n} f64 vote cells; prefix deltas can shift "
    f"fusion — cross-check vs the full-sweep rate).\n"
    f"DS-vote full sweep: {1e3 * t_ds:.2f} ms "
    f"({groups * n / t_ds / 1e6:.2f}M hyp/s)",
    flush=True,
)
