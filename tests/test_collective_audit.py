"""HLO-level audit of the multi-chip communication story.

Real multi-chip hardware is unavailable here, but the *compiled* collective
traffic is fully inspectable: these tests lower the sharded steps for
2/4/8-device CPU meshes and pin the collective ops + byte volumes in the
optimized HLO against the design notes (``parallel/sharded.py``):

  * ``sharded_us_feature_lm``: exactly TWO sum all-reduces per refit — the
    [F] weighted feature sum (centering mean) and the centered [F, F] Gram
    — independent of the observation count, the device count, and the LM
    iteration count (SURVEY §2.7 "J^T J / J^T r partials psum-reduced").
  * ``build_sharded_ransac_step`` (stats-refit estimator): every collective
    except the one replicated-data all-gather is independent of n; winner
    selection is all-gather + replicated argmax.
  * Sum-only: no all-reduce anywhere lowers to a min/max reduction — the
    axon AOT compiler supports only Sum all-reduces, so a pmax sneaking in
    would compile on CPU and fail on the TPU pod.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVE = re.compile(
    r"=\s*(\([^)]*\)|\w+\[[\d,]*\](?:\{[^}]*\})?)\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\("
)
_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
    "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}


def _shape_bytes(s):
    m = _SHAPE.match(s)
    total = 1
    for d in m.group(2).split(","):
        if d:
            total *= int(d)
    return _DTYPE_BYTES[m.group(1)] * total


def _collectives(hlo_text):
    """[(kind, payload_bytes, shape_str)] for every collective in the HLO."""
    out = []
    for shp, kind in _COLLECTIVE.findall(hlo_text):
        if shp.startswith("("):
            b = sum(
                _shape_bytes(x) for x in re.findall(r"\w+\[[\d,]*\]", shp)
            )
        else:
            b = _shape_bytes(shp)
        out.append((kind, b, shp.split("{")[0]))
    return out


def _mesh(nd, shape=None, names=("data",)):
    cpus = jax.devices("cpu")
    if shape is None:
        return Mesh(np.array(cpus[:nd]), names)
    return Mesh(np.array(cpus[: shape[0] * shape[1]]).reshape(shape), names)


def _pointer_problem(n):
    from lsqrrecipes_tpu.synthetic import make_pointer_data

    (frames, q, p), _, _ = make_pointer_data(jax.random.PRNGKey(0), n=n)
    return (frames, q, p)


@pytest.mark.parametrize("nd", [2, 4, 8])
@pytest.mark.parametrize(
    "kind,f_n", [("pointer", 6), ("crosswire", 15), ("plane_phantom", 31)]
)
def test_stats_lm_refit_is_two_small_psums(nd, kind, f_n):
    from lsqrrecipes_tpu.parallel.sharded import build_sharded_us_feature_lm

    mesh = _mesh(nd)
    p_n = {"pointer": 8, "crosswire": 11, "plane_phantom": 11}[kind]
    x0 = jnp.zeros((p_n,))

    per_n = {}
    for n in (64, 128):
        frames, q, p = _pointer_problem(n)
        if kind == "pointer":
            data = (frames, q, p)
        else:
            data = (frames, q)
        run = build_sharded_us_feature_lm(kind, x0, mesh=mesh, data_tree=data)
        txt = run.lower(data, jnp.ones((n,), bool)).compile().as_text()
        per_n[n] = sorted(_collectives(txt))

    # Exactly two all-reduces: [F] mean + [F, F] centered Gram, f64.
    expected = sorted(
        [
            ("all-reduce", 8 * f_n, f"f64[{f_n}]"),
            ("all-reduce", 8 * f_n * f_n, f"f64[{f_n},{f_n}]"),
        ]
    )
    assert per_n[64] == expected, per_n[64]
    # Identical collective set at 2x the observations: volume is O(F^2),
    # not O(n), and the while_loop iterations add NO collectives.
    assert per_n[128] == per_n[64]


def test_ransac_step_collectives_n_independent_except_data_gather():
    from lsqrrecipes_tpu.estimators import PlaneEstimator
    from lsqrrecipes_tpu.parallel.sharded import build_sharded_ransac_step
    from lsqrrecipes_tpu.ransac.sampling import sample_k_subsets

    est = PlaneEstimator(delta=0.5, dim=3)
    mesh = _mesh(None, shape=(4, 2), names=("hypotheses", "data"))

    # n values chosen so the n-derived block sizes (n, n/2 with 2 data
    # shards) never collide with the B-derived sizes (B=128, B/h=32), and
    # the comparison normalizes actual DIMENSION values — a substring
    # filter over shape strings silently matched the dtype digits
    # (f64/s32) and compared empty lists.
    b_total = 128
    per_n = {}
    for n in (96, 192):
        pts = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
        idx = sample_k_subsets(jax.random.PRNGKey(2), n, est.k, b_total)
        step = build_sharded_ransac_step(est, mesh)
        txt = step.lower(pts, idx).compile().as_text()
        per_n[n] = _collectives(txt)

    for n in per_n:
        kinds = {k for k, _, _ in per_n[n]}
        assert kinds <= {"all-reduce", "all-gather"}, kinds
        # Winner selection is all-gather + replicated argmax (no pmax).
        assert any(k == "all-gather" for k, _, _ in per_n[n])

    def normalized(cols, n):
        # Replace every dimension equal to n or the per-shard n-block
        # (n / 2 data shards) with a symbol; after that, the collective
        # sets at both n must be IDENTICAL — i.e. nothing but the known
        # data gather and the n-block-sized mask broadcast scales with n.
        out = []
        for kind, b, shp in cols:
            m = re.match(r"\(?(\w+)\[([\d,]*)\]", shp)
            dims = [
                "N" if d and int(d) == n else
                "NB" if d and int(d) == n // 2 else d
                for d in m.group(2).split(",")
            ]
            norm_b = b if ("N" not in dims and "NB" not in dims) else None
            out.append((kind, m.group(1), ",".join(dims), norm_b))
        return sorted(out, key=str)

    r1 = normalized(per_n[96], 96)
    r2 = normalized(per_n[192], 192)
    assert r1 == r2, (r1, r2)
    # Exactly the expected n-dependent collectives: the replicated-data
    # all-gather f64[N, 3] and the winner-mask broadcast s32[NB]; the
    # vote-count psum (s64[B/h]), selection gather and the stats-refit
    # psum must all be n-independent.
    n_dep = [c for c in r1 if "N" in c[2].split(",") or "NB" in c[2].split(",")]
    assert sorted(k for k, _, _, _ in n_dep) == ["all-gather", "all-reduce"], n_dep
    # The stats-refit psum (plane: mean [3] + scatter [3,3] + count) is
    # present and n-independent: a small fixed-size f64 all-reduce.
    # (XLA combines the mean/scatter/count psum into one tuple all-reduce.)
    small_f64_psums = [
        c for c in r1 if c[0] == "all-reduce" and c[1] == "f64"
        and c[3] is not None and c[3] <= 8 * 16
    ]
    assert small_f64_psums, r1


def test_no_min_max_all_reduce_anywhere():
    """Sum-only constraint: every all-reduce's reduction computation is an
    add — a pmax/pmin would pass on CPU but not lower under the axon AOT
    compiler."""
    from lsqrrecipes_tpu.estimators import PlaneEstimator
    from lsqrrecipes_tpu.parallel.sharded import (
        build_sharded_ransac_step,
        build_sharded_us_feature_lm,
    )
    from lsqrrecipes_tpu.ransac.sampling import sample_k_subsets

    texts = []
    est = PlaneEstimator(delta=0.5, dim=3)
    mesh = _mesh(None, shape=(4, 2), names=("hypotheses", "data"))
    pts = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    idx = sample_k_subsets(jax.random.PRNGKey(2), 64, est.k, 128)
    texts.append(
        build_sharded_ransac_step(est, mesh).lower(pts, idx).compile().as_text()
    )
    data = _pointer_problem(64)
    run = build_sharded_us_feature_lm(
        "pointer", jnp.zeros((8,)), mesh=_mesh(8), data_tree=data
    )
    texts.append(run.lower(data, jnp.ones((64,), bool)).compile().as_text())

    for txt in texts:
        regions = re.findall(r"to_apply=%?([\w.]+)", txt)
        for line in txt.splitlines():
            m = re.search(r"=\s*[^=]*all-reduce(?:-start)?\(.*to_apply=%?([\w.]+)", line)
            if not m:
                continue
            name = m.group(1)
            block = re.search(
                rf"%?{re.escape(name)} \([^)]*\)[^{{]*{{(.*?)\n}}",
                txt,
                re.S,
            )
            assert block is not None, name
            body = block.group(1)
            assert "add(" in body, body
            assert "maximum(" not in body and "minimum(" not in body, body
