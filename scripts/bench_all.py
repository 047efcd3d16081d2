#!/usr/bin/env python
"""Run the FULL bench matrix in one serialized chip session and write
``docs/BENCH_ALL.json`` — the committed artifact README/PERF numbers cite.

One metric at a time (the compile server serializes; parallel chip jobs
queue behind each other anyway), each via a fresh ``bench.py`` subprocess so
a failure in one metric cannot poison the rest.  A non-zero rc or missing
JSON line is retried ONCE — a transient SIGTERM/queue kill must not get
committed as a failure (the round-3 artifact shipped a dead ``pivot`` entry
that way).  Usage:

    nohup python scripts/bench_all.py > /tmp/bench_all.log 2>&1 &
    # subset + merge into the existing artifact:
    nohup python scripts/bench_all.py --metrics lm phantom generic &
"""
import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "BENCH_ALL.json")

METRICS = ["ransac", "generic", "lm", "lm_pointer", "pivot", "dense", "us",
           "pointer", "phantom"]


def run_metric(metric):
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--metric", metric]
    print(f"== {metric}: {' '.join(cmd)}", flush=True)
    for attempt in range(2):
        proc = subprocess.run(cmd, capture_output=True, text=True)
        lines = [
            ln for ln in proc.stdout.splitlines() if ln.startswith('{"metric"')
        ]
        if proc.returncode == 0 and lines:
            print(f"   {lines[-1]}", flush=True)
            return json.loads(lines[-1])
        print(
            f"FAIL {metric} (attempt {attempt + 1}/2): rc={proc.returncode}\n"
            f"{proc.stdout}\n{proc.stderr}",
            flush=True,
        )
    return {"error": proc.returncode}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--metrics", nargs="+", default=METRICS, choices=METRICS,
        help="subset to (re)run; results merge into the existing artifact",
    )
    args = parser.parse_args()

    results = {}
    if os.path.exists(OUT) and set(args.metrics) != set(METRICS):
        with open(OUT) as f:
            results = json.load(f).get("results", {})

    for metric in args.metrics:
        results[metric] = run_metric(metric)

    payload = {
        "date": datetime.date.today().isoformat(),
        "device": "TPU v5 lite (1 chip, axon tunnel)",
        "baseline": "serial single-core C++ (-O3 -march=native), native/*.cpp",
        "results": {m: results[m] for m in METRICS if m in results},
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")
    print(f"wrote {OUT}", flush=True)
    failed = [m for m, r in results.items() if "error" in r]
    if failed:
        print(f"FAILED metrics: {failed}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
