"""Smoke-run representative example programs (CPU, small data).

The examples mirror the reference's `examples/` layer (its de-facto CLI);
each prints LSQ-vs-RANSAC-vs-truth comparisons and exits nonzero on
failure, so a clean exit is the assertion.
"""

import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


@pytest.mark.parametrize(
    "name",
    ["line_estimation.py", "linear_equation_system_solver.py", "pivot_calibration.py"],
)
def test_example_runs(name, tmp_path):
    env = dict(os.environ, LSQR_EXAMPLES_DEVICE="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, name)],
        cwd=tmp_path,  # scene files land in the temp dir
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "RANSAC" in proc.stdout
