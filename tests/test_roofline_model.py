"""Pin the roofline flop-model constants to the kernels they model.

VERDICT r4: the utilization table's (K_p, dots, passes) constants were
hand-transcribed and nothing validated them.  This test derives them
mechanically from the code:

  * K_p (vote feature rows) = the leading dim of each family's packed
    P-row builder output;
  * dots * passes = the number of ``dot_general`` ops in the jaxpr of the
    family's ``fit_vote`` closure (the only matmuls a fused band-vote
    kernel performs are its vote products).
"""

import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/repo/scripts")

from roofline import FAMILIES  # noqa: E402


def _count_dot_generals(jaxpr):
    n = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            n += 1
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                n += _count_dot_generals(sub.jaxpr)
    return n


def _dummy_inputs(family, kf):
    b, n_pad = 128, 128
    slot_rows = jnp.ones((32, 8, 1, b), jnp.float32)

    def slot_row(c, j):
        return slot_rows[c, j]

    p = jnp.ones((kf, n_pad), jnp.float32)
    return slot_row, p


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_model_constants_match_kernel(family):
    from lsqrrecipes_tpu.ops import fused_sweep as fs

    _, kf, dots, passes, _ = FAMILIES[family]

    # K_p: leading dim of the packed vote feature rows.
    builders = {
        "sphere3d": lambda: fs.pack_feature_rows(
            jnp.ones((256, 3)), True
        ),
        "plane3d": lambda: fs.pack_feature_rows(jnp.ones((256, 3)), False),
        "line3d": lambda: fs.pack_feature_rows(jnp.ones((256, 3)), True),
        "line2d": lambda: fs.pack_feature_rows(jnp.ones((256, 2)), False),
        "pivot": lambda: fs._pivot_p(
            __import__(
                "lsqrrecipes_tpu.geometry", fromlist=["Frame"]
            ).Frame(jnp.ones((256, 3, 3)), jnp.ones((256, 3)))
        ),
        "absolute_orientation": lambda: fs._absor_p(
            (jnp.ones((256, 3)), jnp.ones((256, 3)))
        ),
        "ray3d": lambda: fs._ray_p(
            __import__(
                "lsqrrecipes_tpu.geometry.ray", fromlist=["Ray3D"]
            ).Ray3D(jnp.ones((256, 3)), jnp.ones((256, 3)))
        ),
        "dense_linear6": lambda: fs._dense6_p(jnp.ones((256, 7))),
        "crosswire": lambda: fs._crosswire_fused_p(
            (
                __import__(
                    "lsqrrecipes_tpu.geometry", fromlist=["Frame"]
                ).Frame(jnp.ones((256, 3, 3)), jnp.ones((256, 3))),
                jnp.ones((256, 2)),
            )
        ),
        "pointer": lambda: fs._pointer_fused_p(
            (
                __import__(
                    "lsqrrecipes_tpu.geometry", fromlist=["Frame"]
                ).Frame(jnp.ones((256, 3, 3)), jnp.ones((256, 3))),
                jnp.ones((256, 2)),
                jnp.ones((256, 3)),
            )
        ),
    }
    p_rows = builders[family]()
    assert p_rows.shape[0] == kf, (
        f"{family}: model K_p={kf} but P-row builder emits {p_rows.shape[0]}"
    )

    # dots * passes: dot_generals in the fit_vote jaxpr.
    factories = {
        "sphere3d": lambda: fs.sphere3d_fit_vote(1.0),
        "plane3d": lambda: fs.plane3d_fit_vote(1.0),
        "line3d": lambda: fs.line3d_fit_vote(1.0),
        "line2d": lambda: fs.line2d_fit_vote(1.0),
        "pivot": lambda: fs.pivot_fit_vote(1.0),
        "absolute_orientation": lambda: fs.absolute_orientation_fit_vote(1.0),
        "ray3d": lambda: fs.ray3d_fit_vote((1.0, 1e-6)),
        "dense_linear6": lambda: fs.dense_linear6_fit_vote(0.05),
        "crosswire": lambda: fs.crosswire_fit_vote(3.0),
        "pointer": lambda: fs.pointer_fit_vote(3.0),
    }
    fit_vote = factories[family]()
    slot_row, p = _dummy_inputs(family, kf)
    jaxpr = jax.make_jaxpr(lambda pp: fit_vote(slot_row, pp)[0])(p)
    n_dots = _count_dot_generals(jaxpr.jaxpr)
    assert n_dots == dots * passes, (
        f"{family}: model dots*passes={dots * passes} but the fit_vote "
        f"jaxpr contains {n_dots} dot_general ops"
    )
