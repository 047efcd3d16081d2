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
    "generic": ("3D sphere RANSAC, faithful-f64 generic engine "
                "(certified double-single vote)", "hyp/s"),
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


FAMILY_FIT = {
    "sphere3d": ("3D sphere", "Cramer circumsphere"),
    "plane3d": ("3D plane", "cross product + rsqrt"),
    "line2d": ("2D line", "perpendicular"),
    "line3d": ("3D line", "two-point direction (2-product vote)"),
    "ray3d": ("ray intersection", "Graphics-Gems midpoint, t>=0 gates"),
    "absolute_orientation": (
        "absolute orientation", "orthonormal-frame R2 R1^T"
    ),
    "pivot": ("pivot calibration", "3x3 Schur reduction of the 9x6 system"),
    "dense_linear6": (
        "dense linear system (6 unknowns)",
        "unrolled 6x6 normal-equation Cholesky",
    ),
    "crosswire": (
        "crosswire US calibration",
        "lanes-form 9x9 f32 Householder QR + Newton-polar",
    ),
    "pointer": (
        "pointer US calibration",
        "lanes-form 9x9 f32 Householder QR + Newton-polar",
    ),
}


def render_family_table():
    with open(os.path.join(REPO, "docs", "FAMILY_PERF.json")) as f:
        payload = json.load(f)
    fams = payload["families"]
    print(f"\nFused families, measured {payload['date']} "
          f"(docs/FAMILY_PERF.json; wall = jitted 12-sweep scan incl. the\n"
          f"amortized ~25 ms tunnel round-trip, in-kernel = Pallas "
          f"custom-call time from the xplane trace):\n")
    print("| family | minimal fit in-kernel | n | wall hyp/s | in-kernel "
          "hyp/s | kernel % of device |")
    print("|---|---|---|---|---|---|")
    for key, (label, fit) in FAMILY_FIT.items():
        row = fams.get(key)
        if row is None or "error" in row:
            print(f"| {label} | {fit} | — | (MISSING) | — | — |")
            continue
        print(
            f"| {label} | {fit} | {row['n']} | {fmt(row['hyp_per_s'])} |"
            f" {fmt(row['kernel_hyp_per_s'])} |"
            f" {100 * row['kernel_frac_of_device']:.0f}% |"
        )


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
    render_family_table()


if __name__ == "__main__":
    main()
