"""Empirical roofline / utilization for the fused families (real chip).

Converts measured family rates into absolute hardware-utilization
statements, with BOTH an analytic flop model and a TRACE-measured column
per family (VERDICT r4 item 1): the model predicts padded FLOP/s from the
kernel's band-vote structure; the trace column computes the same padded
FLOP/s from the kernel custom-call duration recorded in
``docs/FAMILY_PERF.json`` (scripts/family_perf.py).  If the two columns
disagree beyond ~15%, the model constants are wrong — the table prints the
ratio so any drift is visible, not asserted away.

Flop model of a fused band-vote kernel (ops/fused_sweep.py):

  * vote (MXU): each of ``dots`` band tests per (point, hypothesis) is a
    ``[K_p, n] x [K_p, B]`` contraction executed ``passes`` times (1 for
    DEFAULT-precision families, 3 for the bf16-split ``_dot_f32x3``).
    USEFUL flops/hyp = 2 * K_p * dots * passes * n; the systolic array
    always runs a 128-deep contraction, so EXECUTED (padded) flops/hyp =
    2 * 128 * dots * passes * n_pad.
  * fit (VPU): closed-form lane arithmetic per hypothesis — small next to
    the vote everywhere (see the kernel fraction in FAMILY_PERF.json).

MXU peak microbench: the round-4 version chained ONE dependent matmul
stream and was latency-bound at ~86 TFLOP/s regardless of k (each product
drains before the next issues) — which is why it measured below the
flagship kernel's sustained rate and got discarded.  Four INDEPENDENT
interleaved chains keep the pipeline full: 244.8 TFLOP/s measured at
k=4096, above the 197 T public v5e number; the best sustained rate is
the utilization denominator (no spec sheet).

Usage:  nohup python scripts/roofline.py > /tmp/roofline.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# family -> (label, K_p vote feature rows per dot, dots per point, bf16
# passes per dot, fit flops/hyp [VPU]).  K_p/dots/passes read off the
# fit_vote closures + P-row builders in ops/fused_sweep.py (asserted
# against the builders in tests/test_roofline_model.py):
#   sphere3d/plane3d: [5, n] rows, 1 DEFAULT dot; line2d: [4, n];
#   line3d: [5, n] x 2 dots x 3 passes; pivot: [17, n] x 3 x 3;
#   absolute_orientation: [8, n] x 3 x 3; ray3d: [10, n] x 3 x 3;
#   dense_linear6: [9, n] x 1 x 3; crosswire: [16, n] x 3 x 3;
#   pointer: [7, n] x 3 x 3.
FAMILIES = {
    "sphere3d": ("3D sphere", 5, 1, 1, 90),
    "plane3d": ("3D plane", 5, 1, 1, 60),
    "line2d": ("2D line", 4, 1, 1, 30),
    "line3d": ("3D line", 5, 2, 3, 40),
    "pivot": ("pivot calibration", 17, 3, 3, 260),
    "absolute_orientation": ("absolute orientation", 8, 3, 3, 180),
    "ray3d": ("ray intersection", 10, 3, 3, 120),
    "dense_linear6": ("dense linear (6 unknowns)", 9, 1, 3, 700),
    "crosswire": ("crosswire US calibration", 16, 3, 3, 2200),
    "pointer": ("pointer US calibration", 7, 3, 3, 1500),
}

# LM entries: (description, flops per reported iteration) — VPU-bound.
LM = {
    "lm": ("sphere LM megakernel (m=256)", 256 * 46 + 140),
    "lm_pointer": ("pointer stats-LM (f64)", 3 * 36 * 8 * 2 + 8 * 8 * 6 * 3 * 2
                   + 8 * 8 * 8 // 3 + 400),
}

V5E_BF16_PEAK = 197e12


def measure_mxu_peak(k, flop_target=4e12, streams=4):
    """Sustained bf16 matmul rate.

    A single dependent chain (c <- c @ b) under-reports: each product must
    drain before the next issues, so the measurement is latency-bound
    (round 4 discarded its own microbench over this).  ``streams``
    independent chains interleave so the MXU pipeline stays full; b is a
    perturbed identity so nothing folds away and values stay bounded."""
    reps = max(16, int(flop_target / (2.0 * streams * k ** 3)))
    key = jax.random.PRNGKey(0)
    a = [
        jax.random.normal(jax.random.fold_in(key, i), (k, k),
                          jnp.float32).astype(jnp.bfloat16)
        for i in range(streams)
    ]
    b = (jnp.eye(k, dtype=jnp.float32)
         + 1e-4 * jax.random.normal(key, (k, k), jnp.float32)).astype(
             jnp.bfloat16)

    @jax.jit
    def run(scale):
        def body(cs, _):
            return tuple(c @ b for c in cs), cs[0][0, 0]
        _, outs = jax.lax.scan(
            body, tuple(c * scale for c in a), None, length=reps
        )
        return outs

    np.array(run(jnp.bfloat16(1.0)).astype(np.float32))
    best = None
    for t in range(3):
        t0 = time.perf_counter()
        outs = np.array(run(jnp.bfloat16(1.0 + 0.125 * t)).astype(np.float32))
        dt = (time.perf_counter() - t0) / reps
        assert np.all(np.isfinite(outs))
        best = dt if best is None else min(best, dt)
    return 2.0 * streams * k ** 3 / best


def measure_vpu_peak(rows=64, cols=1024, chain=4096, streams=16, reps=4):
    """Sustained f32 FMA rate on (8,128)-tiled elementwise chains.

    Traps found empirically (chip sweep, round 5): a 16 MB operand streams
    HBM on every chained FMA (measures bandwidth, ~0.16 T); a single
    small-operand chain is DEPENDENT (each FMA waits for the last,
    ~0.07-0.47 T depending on length); short scans are per-step-overhead
    bound (~0.1 ms/step).  16 independent 256 KB VMEM-resident chains of
    4096 FMAs plateau at ~1.2 TFLOP/s — the empirical sustained VPU rate
    for dependent elementwise work (more streams regress: 32 -> 0.96 T)."""
    xs = [
        jnp.full((rows, cols), jnp.float32(1.0 + 0.01 * i))
        for i in range(streams)
    ]

    @jax.jit
    def run(scale):
        def body(ys, s):
            ys = tuple(
                y * jnp.float32(1.0000001) + jnp.float32(1e-7) * s
                for y in ys
            )
            for _ in range(chain - 1):
                ys = tuple(
                    y * jnp.float32(1.0000001) + jnp.float32(1e-7)
                    for y in ys
                )
            return ys, ys[0][0, 0]
        _, outs = jax.lax.scan(
            body, tuple(x * scale for x in xs),
            jnp.arange(reps, dtype=jnp.float32),
        )
        return outs

    np.array(run(jnp.float32(1.0)))
    best = None
    for t in range(3):
        t0 = time.perf_counter()
        outs = np.array(run(jnp.float32(1.0 + 0.125 * t)))
        dt = (time.perf_counter() - t0) / reps
        assert np.all(np.isfinite(outs))
        best = dt if best is None else min(best, dt)
    return 2.0 * chain * streams * rows * cols / best


def padded_flops_per_hyp(kf, dots, passes, n):
    n_pad = -(-n // 128) * 128
    return 2.0 * 128 * dots * passes * n_pad, n_pad


def main():
    print("devices:", jax.devices(), flush=True)
    peaks = {}
    for k in (1024, 2048, 4096):
        peaks[k] = measure_mxu_peak(k)
        print(f"  chained bf16 matmul k={k}: {peaks[k] / 1e12:7.1f} TFLOP/s",
              flush=True)
    mxu_peak = max(peaks.values())
    vpu_chain = measure_vpu_peak()
    print(f"  empirical MXU peak (best k): {mxu_peak / 1e12:.1f} TFLOP/s "
          f"(datasheet bf16: {V5E_BF16_PEAK / 1e12:.0f} T)")
    print(f"  f32 FMA chain (VPU): {vpu_chain / 1e12:.2f} TFLOP/s\n",
          flush=True)

    with open(os.path.join(REPO, "docs", "FAMILY_PERF.json")) as f:
        fam_perf = json.load(f)["families"]

    print("| family | wall rate | kernel% | model padded | trace padded |"
          " trace/model | trace %peak | useful |")
    print("|---|---|---|---|---|---|---|---|")
    for key, (label, kf, dots, passes, _fit_flops) in FAMILIES.items():
        row = fam_perf.get(key)
        if not row or "error" in row:
            print(f"| {label} | MISSING | | | | | | |")
            continue
        pf, _n_pad = padded_flops_per_hyp(kf, dots, passes, row["n"])
        uf = 2.0 * kf * dots * passes * row["n"]
        model = row["hyp_per_s"] * pf
        trace = (row["kernel_hyp_per_s"] or 0) * pf
        ratio = trace / model if model else float("nan")
        pct = 100.0 * trace / mxu_peak
        print(
            f"| {label} | {row['hyp_per_s'] / 1e6:.1f}M hyp/s |"
            f" {100 * row['kernel_frac_of_device']:.0f}% |"
            f" {model / 1e12:.1f} T | {trace / 1e12:.1f} T |"
            f" {ratio:.2f} | {pct:.0f}% | {uf / pf * 100:.0f}% |",
            flush=True,
        )

    bench_path = os.path.join(REPO, "docs", "BENCH_ALL.json")
    with open(bench_path) as f:
        bench = json.load(f)["results"]
    for key, (label, it_flops) in LM.items():
        res = bench.get(key)
        if not res or "error" in res:
            print(f"| {label} | MISSING | | | | | | |")
            continue
        rate = res["value"]
        fl = rate * it_flops
        print(
            f"| {label} | {rate / 1e6:.1f}M iter/s | — | — | — | — |"
            f" — | {fl / 1e9:.1f}G VPU |",
            flush=True,
        )

    print(
        "\nColumns: 'model padded' = wall hyp/s x 2*128*dots*passes*n_pad\n"
        "(what the 128-deep systolic contraction executes if the kernel is\n"
        "all vote); 'trace padded' = the same flops over the kernel\n"
        "custom-call time from the xplane trace (pure in-kernel rate);\n"
        "trace/model > 1 means non-kernel overhead in the wall rate,\n"
        "trace/model far from 1 with kernel% ~100 means the flop model is\n"
        "wrong.  'trace %peak' compares in-kernel padded FLOP/s to the\n"
        "empirical MXU peak above; 'useful' = K_p/128 x n/n_pad is the\n"
        "intrinsic fraction of executed flops doing estimator work\n"
        "(feature count vs contraction depth — a design property, not\n"
        "kernel inefficiency).",
        flush=True,
    )


if __name__ == "__main__":
    main()
