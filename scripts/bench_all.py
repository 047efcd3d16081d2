#!/usr/bin/env python
"""Run the FULL bench matrix in one serialized chip session and write
``docs/BENCH_ALL.json`` — the committed artifact README/PERF numbers cite.

One metric at a time (the compile server serializes; parallel chip jobs
queue behind each other anyway), each via a fresh ``bench.py`` subprocess so
a failure in one metric cannot poison the rest.  Usage:

    nohup python scripts/bench_all.py > /tmp/bench_all.log 2>&1 &
"""
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "BENCH_ALL.json")

METRICS = ["ransac", "generic", "lm", "pivot", "dense", "us", "pointer",
           "phantom"]


def main():
    results = {}
    for metric in METRICS:
        cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--metric", metric]
        print(f"== {metric}: {' '.join(cmd)}", flush=True)
        proc = subprocess.run(cmd, capture_output=True, text=True)
        lines = [
            ln for ln in proc.stdout.splitlines() if ln.startswith('{"metric"')
        ]
        if proc.returncode != 0 or not lines:
            print(f"FAIL {metric}: rc={proc.returncode}\n{proc.stdout}\n{proc.stderr}",
                  flush=True)
            results[metric] = {"error": proc.returncode}
            continue
        results[metric] = json.loads(lines[-1])
        print(f"   {lines[-1]}", flush=True)

    payload = {
        "date": datetime.date.today().isoformat(),
        "device": "TPU v5 lite (1 chip, axon tunnel)",
        "baseline": "serial single-core C++ (-O3 -march=native), native/*.cpp",
        "results": results,
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")
    print(f"wrote {OUT}", flush=True)
    failed = [m for m, r in results.items() if "error" in r]
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
