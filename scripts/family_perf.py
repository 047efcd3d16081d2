"""Measure + TRACE every fused family on the real chip; write the artifact
``docs/FAMILY_PERF.json`` that the README family table and the PERF.md
utilization table cite.

Two numbers per family, both from the chip:

  1. ``hyp_per_s``: wall-rate of one jitted ``lax.scan`` of 12 sweeps
     with distinct keys (bench.py methodology — repeats are never
     identical, so nothing memoizes), min over 3 trials; 12 reps keep the
     ~25 ms tunnel round-trip under ~15% of the measurement.
  2. ``kernel_ms_per_sweep``: from an ``jax.profiler`` xplane trace of 3
     single-sweep executions — the summed duration of the Pallas kernel
     custom-call events divided by 3.  ``kernel_hyp_per_s`` is the pure
     in-kernel rate; together with the analytic flop model
     (scripts/roofline.py) it gives a TRACE-measured FLOP/s column to
     check the model against (VERDICT r4 item 1).

The full per-op breakdown of every trace is stored under ``ops`` so the
kernel-event attribution is auditable.

Usage:  nohup python scripts/family_perf.py > /tmp/family_perf.log 2>&1 &
        python scripts/family_perf.py --families sphere3d pivot
"""

import argparse
import datetime
import glob
import json
import os
import shutil
import sys
import time

os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "FAMILY_PERF.json")

import chip_check  # noqa: E402  (data builders / estimators per family)
from lsqrrecipes_tpu.ops import fused_sweep as fs  # noqa: E402

# Sweep sizes: groups * n hypotheses per sweep, sized so one sweep runs
# ~10-30 ms on chip (big enough to amortize, small enough to trace).
GROUPS = {
    "sphere3d": 8192,
    "plane3d": 4096,
    "line2d": 4096,
    "line3d": 4096,
    "pivot": 2048,
    "absolute_orientation": 1024,
    "ray3d": 1024,
    "dense_linear6": 2048,
    "crosswire": 1024,
    "pointer": 1024,
}


def _op_totals(trace_dir):
    """{op_name: total_ps} summed over TPU device planes (CLAUDE.md recipe)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())
    totals = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] = totals.get(name, 0) + ev.duration_ps
    return totals


def _is_kernel_event(name):
    """True iff the event's OP KIND is a custom call (the Pallas kernel).

    Substring matching over the full HLO signature leaks: a fusion whose
    OPERAND list references `%custom-call.N` is not a kernel.  Reuse the
    kind-after-output-shape parse from phantom_stages."""
    from phantom_stages import _parse_sig

    _, kind = _parse_sig(name)
    return bool(kind) and kind.startswith("custom-call")


def measure_family(name):
    build_data, build_est, _, _ = chip_check.FAMILIES[name]
    data = build_data()
    est = build_est()
    n = jax.tree_util.tree_leaves(data)[0].shape[0]
    groups = GROUPS[name]
    delta_arg = getattr(est, "fused_delta", None) or est.delta
    hyp_per_sweep = groups * n

    @jax.jit
    def sweeps(seed0):
        def body(carry, i):
            count, _ = fs.fused_sweep(
                name, data, jax.random.fold_in(jax.random.PRNGKey(0), seed0 + i),
                groups, delta_arg,
            )
            return carry, count

        _, counts = jax.lax.scan(body, 0, jnp.arange(12))
        return counts

    np.array(sweeps(0))  # compile + warm
    elapsed = None
    for trial in range(3):
        t0 = time.perf_counter()
        counts = np.array(sweeps(1000 * (trial + 1)))
        t = (time.perf_counter() - t0) / 12
        assert (counts > 0).all(), f"{name}: zero best count"
        elapsed = t if elapsed is None else min(elapsed, t)

    # Trace 3 single-sweep executions (distinct keys).
    @jax.jit
    def one(seed):
        count, _ = fs.fused_sweep(
            name, data, jax.random.fold_in(jax.random.PRNGKey(1), seed),
            groups, delta_arg,
        )
        return count

    np.array(one(0))
    trace_dir = f"/tmp/family_trace/{name}"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for i in range(3):
            np.array(one(i + 1))
    totals = _op_totals(trace_dir)
    kernel_ps = sum(ps for nm, ps in totals.items() if _is_kernel_event(nm))
    # The xplane carries one module-level span per execution (named after
    # the jitted fn) on its own line, PLUS the per-op events inside it —
    # summing everything would double-count.  Device time = module spans
    # when present, else the op sum.
    module_ps = sum(ps for nm, ps in totals.items() if nm.startswith("jit_"))
    device_ps = module_ps or sum(
        ps for nm, ps in totals.items() if not nm.startswith("jit_")
    )

    row = {
        "n": int(n),
        "groups": groups,
        "hyp_per_sweep": hyp_per_sweep,
        "hyp_per_s": round(hyp_per_sweep / elapsed, 1),
        "sweep_ms_wall": round(1e3 * elapsed, 3),
        "device_ms_per_sweep": round(device_ps / 1e9 / 3, 3),
        "kernel_ms_per_sweep": round(kernel_ps / 1e9 / 3, 3),
        "kernel_frac_of_device": round(kernel_ps / max(device_ps, 1), 4),
        "kernel_hyp_per_s": round(hyp_per_sweep / (kernel_ps / 1e12 / 3), 1)
        if kernel_ps else None,
        "ops": {
            nm: round(ps / 1e9 / 3, 4)
            for nm, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:8]
        },
    }
    print(f"{name}: {json.dumps(row)}", flush=True)
    return row


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--families", nargs="+", default=list(GROUPS), choices=list(GROUPS)
    )
    args = parser.parse_args()
    print("devices:", jax.devices(), flush=True)

    results = {}
    if os.path.exists(OUT) and set(args.families) != set(GROUPS):
        with open(OUT) as f:
            results = json.load(f).get("families", {})

    for name in args.families:
        try:
            results[name] = measure_family(name)
        except Exception as e:  # keep going; a dead row must be visible
            print(f"FAIL {name}: {e!r}", flush=True)
            results[name] = {"error": repr(e)}

    payload = {
        "date": datetime.date.today().isoformat(),
        "device": "TPU v5 lite (1 chip, axon tunnel)",
        "method": "jitted 12-sweep scan (wall, min of 3) + xplane trace of 3 "
                  "single sweeps (kernel custom-call time)",
        "families": {k: results[k] for k in GROUPS if k in results},
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")
    print(f"wrote {OUT}", flush=True)
    failed = [k for k, v in results.items() if "error" in v]
    if failed:
        print(f"FAILED: {failed}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
