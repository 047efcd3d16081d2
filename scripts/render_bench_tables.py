#!/usr/bin/env python
"""Render the committed bench matrix (docs/BENCH_ALL.json) as the markdown
table embedded in README.md / docs/PERF.md — run after scripts/bench_all.py
and paste (or diff) the output so every number in the docs traces back to
the committed artifact.
"""
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LABELS = {
    "ransac": ("3D sphere RANSAC (fused whole-sweep kernel)", "hyp/s"),
    "generic": ("3D sphere RANSAC, faithful-f64 generic engine", "hyp/s"),
    "lm": ("batched Levenberg-Marquardt (fused megakernel)", "iter/s"),
    "lm_pointer": ("pointer-calibration LM (sufficient-statistics form)",
                   "iter/s"),
    "pivot": ("pivot-calibration RANSAC (fused family)", "hyp/s"),
    "dense": ("dense 6-unknown linear RANSAC (fused family)", "hyp/s"),
    "us": ("crosswire US-calibration RANSAC (fused family)", "hyp/s"),
    "pointer": ("pointer US-calibration RANSAC (fused family)", "hyp/s"),
    "phantom": ("plane-phantom US-calibration RANSAC (k=31, fused Pallas "
                "QR subspace)", "hyp/s"),
}


def fmt(v):
    if v >= 1e6:
        return f"{v / 1e6:.1f}M"
    if v >= 1e3:
        return f"{v / 1e3:.1f}k"
    return f"{v:.1f}"


def main():
    with open(os.path.join(REPO, "docs", "BENCH_ALL.json")) as f:
        payload = json.load(f)
    print(f"Measured {payload['date']} on {payload['device']};")
    print(f"baseline: {payload['baseline']}.\n")
    print("| metric | workload | rate | vs C++ -O3 single core |")
    print("|---|---|---|---|")
    # Iterate the full known-metric list, not just keys present in the
    # artifact, so a metric that never ran shows up as MISSING instead of
    # silently vanishing from the table (advisor round 3).
    for key in LABELS:
        res = payload["results"].get(key)
        if res is None:
            print(f"| `--metric {key}` | (MISSING from artifact) | — | — |")
            continue
        if "error" in res:
            print(f"| `--metric {key}` | (FAILED rc={res['error']}) | — | — |")
            continue
        label, unit = LABELS.get(key, (res["metric"], res["unit"]))
        vs = res.get("vs_baseline")
        vs_s = f"**{vs}x**" if vs is not None else "—"
        print(f"| `--metric {key}` | {label} | {fmt(res['value'])} {unit} | {vs_s} |")


if __name__ == "__main__":
    main()
