"""Stage table for the plane-phantom sweep from an xplane trace.

Attributes every LEAF device event (containers — the jit_ module span and
the `while` loop spans — nest the leaves and would double-count) to a
pipeline stage by matching its HLO signature:

  * qr_kernel         — the fused Pallas QR+subspace custom-call
  * ritz_projection   — W = A V fusions ([4, 31, B] outputs; the f64 pair
                        or the double-single f32 streams)
  * ritz_small        — S = W^T W, shifts, 4x4 solves ([4, 4]-shaped)
  * planes_build      — slot-feature plane construction ([*, 14, *])
  * vote_best         — band-vote products + best accumulation ([*, 41]
                        params / u32 count shapes)
  * data_movement     — copies/reshapes/pads/bitcasts/async slices
  * other             — everything else (top entries printed for audit)

Usage:
  PP_GROUPS=512 nohup python scripts/profile_phantom.py > /tmp/pp.log 2>&1 &
  python scripts/phantom_stages.py [trace_dir] [--json docs/PHANTOM_STAGES.json]
"""
import argparse
import datetime
import glob
import json
import os
import re
import sys

os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def op_totals(trace_dir):
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


# The op kind is the first `kind(` token following the closing
# bracket/brace/paren of the output shape: `%x = SHAPE kind(operands...)`.
# Shapes nest parens (tile specs like T(8,128)), so a naive [^)]* match
# truncates — anchor on `)|}|] <kind>(` instead.
_KIND = re.compile(r"[\)\}\]]\s+([a-z][\w-]*)\(")


def _parse_sig(name):
    eq = name.find(" = ")
    if eq < 0:
        return None, None
    rest = name[eq + 3:]
    m = _KIND.search(rest)
    if not m:
        return None, None
    return rest[: m.start() + 1], m.group(1)


def classify(name):
    """Stage for one leaf event, from its op KIND and OUTPUT shape only —
    the full HLO signature includes operand names (e.g. `%custom-call.26`
    as an input), which must not leak into the match."""
    if name.startswith("jit_"):
        return None  # module span — leaves carry the time
    out_shape, kind = _parse_sig(name)
    if kind is None:
        return "other"
    if kind == "while":
        return None  # container span
    if re.search(r"-start|-done|^async", kind):
        # Async spans (copy-start/slice-start/...) measure the IN-FLIGHT
        # window, which overlaps compute — counting them as leaf time
        # double-books (a run with 36 tiny async copies showed 16 ms of
        # "movement" against a 9 ms wall).  Tracked separately, excluded
        # from the stage total.
        return "async_overlapped"
    if kind.startswith("custom-call"):
        return "qr_kernel"
    if kind == "sort":
        return "sampling_perm"
    if re.match(
        r"copy|reshape|bitcast|pad|slice|transpose|all-reduce", kind
    ) or re.search(r"copy|bitcast|dynamic-slice|update-slice", kind):
        return "data_movement"
    if re.search(r"f32\[4,31,|f32\[124,|\[31,4\d{2,}", out_shape) and (
        "fusion" in kind
    ):
        # W = A V outputs ([4, 31, B] / flattened [124, B]) and their
        # [31, B]-shaped reductions.
        return "ritz_projection"
    # 4x4 Ritz-solve shapes: anchor the 4,4 pair at a bracket or another
    # comma-pair (a bare "4,4" also matches "...14,4364..." — planes).
    if re.search(r"\[4,4[,\]]|,4,4\]|,4,4,", out_shape):
        return "ritz_small"
    if re.search(r",14,|,14\]", out_shape):
        return "planes_build"
    if re.search(r",41\]|u32\[", out_shape):
        return "vote_best"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", nargs="?", default="/tmp/phantom_trace")
    ap.add_argument("--json", default=None)
    ap.add_argument("--label", default="")
    ap.add_argument(
        "--execs", type=int, default=3,
        help="traced executions (profile_phantom runs 3)",
    )
    args = ap.parse_args()

    totals = op_totals(args.trace_dir)
    n_exec = args.execs
    stages = {}
    other = []
    for name, ps in totals.items():
        cat = classify(name)
        if cat is None:
            continue
        stages[cat] = stages.get(cat, 0) + ps
        if cat == "other":
            other.append((ps, name))

    async_ps = stages.pop("async_overlapped", 0)
    grand = sum(stages.values())
    print(f"executions: {n_exec}; per-execution stage table:")
    rows = {}
    for cat, ps in sorted(stages.items(), key=lambda kv: -kv[1]):
        ms = ps / 1e9 / n_exec
        rows[cat] = round(ms, 3)
        print(f"  {ms:8.3f} ms  {100.0 * ps / grand:5.1f}%  {cat}")
    print(f"  {grand / 1e9 / n_exec:8.3f} ms  total (leaf sum)")
    rows["async_overlapped_not_in_total"] = round(async_ps / 1e9 / n_exec, 3)
    print(f"  ({async_ps / 1e9 / n_exec:7.3f} ms  async in-flight windows, "
          f"overlap compute — excluded)")
    for ps, name in sorted(other, reverse=True)[:8]:
        print(f"    other: {ps / 1e9 / n_exec:7.3f} ms  {name[:120]}")

    if args.json:
        payload = {
            "date": datetime.date.today().isoformat(),
            "label": args.label,
            "trace_dir": args.trace_dir,
            "executions": n_exec,
            "stage_ms_per_sweep": rows,
            "total_ms_per_sweep": round(grand / 1e9 / n_exec, 3),
        }
        out = os.path.join(REPO, args.json)
        existing = []
        if os.path.exists(out):
            with open(out) as f:
                loaded = json.load(f)
                existing = loaded if isinstance(loaded, list) else [loaded]
        existing.append(payload)
        with open(out, "w") as f:
            json.dump(existing, f, indent=2)
            f.write("\n")
        print(f"appended to {out}")


if __name__ == "__main__":
    main()
