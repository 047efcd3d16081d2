"""Profile the plane-phantom structured sweep on the real chip: trace one
jitted sweep, parse the xplane proto directly (no TensorBoard), and print
per-op time sorted descending — the tool that decides where the k=31 fit's
time actually goes.
"""
import os
import sys

os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"

import glob

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")

from lsqrrecipes_tpu.synthetic import make_plane_phantom_data  # noqa: E402
from lsqrrecipes_tpu.estimators.us_calibration import (  # noqa: E402
    PlanePhantomUSCalibrationEstimator,
)

TRACE_DIR = "/tmp/phantom_trace"


def xplane_summary(trace_dir, top=40):
    """Sum device-plane event durations per op name (CLAUDE.md recipe)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())
    rows = []
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        totals = {}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] = totals.get(name, 0) + ev.duration_ps
        if totals:
            rows.append((plane.name, totals))
    for plane_name, totals in rows:
        print(f"== plane: {plane_name}")
        grand = sum(totals.values())
        for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {ps / 1e9:10.3f} ms  {100.0 * ps / grand:5.1f}%  {name}")
        print(f"  total: {grand / 1e9:.3f} ms")


def main():
    print("devices:", jax.devices(), flush=True)
    n = 64
    groups = int(os.environ.get("PP_GROUPS", "32"))
    est = PlanePhantomUSCalibrationEstimator(delta=1.0)
    data, _, _ = make_plane_phantom_data(jax.random.PRNGKey(0), n=n)

    @jax.jit
    def sweep(key):
        counts, params = est.structured_sweep(data, key, groups)
        return jnp.max(counts), params[0]

    np.array(sweep(jax.random.PRNGKey(0))[0])  # compile + warm
    with jax.profiler.trace(TRACE_DIR):
        for i in range(3):
            np.array(sweep(jax.random.PRNGKey(i + 1))[0])
    xplane_summary(TRACE_DIR)


if __name__ == "__main__":
    main()
