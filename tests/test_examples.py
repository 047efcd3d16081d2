"""Smoke-run EVERY example program (CPU, small data).

The examples mirror the reference's `examples/` layer (its de-facto CLI);
each prints LSQ-vs-RANSAC-vs-truth comparisons and exits nonzero on
failure, so a clean exit is the core assertion.  Examples that emit output
artifacts are additionally checked: OpenInventor ``.iv`` scenes must carry
the format header and balanced braces (what the reference's coin3D viewer
needs to parse them), and the US-calibration examples must write the
reference's ``<precomputed_transform>`` XML result file
(``planeUSCalibration.cxx:193-219``).
"""

import os
import subprocess
import sys
import xml.etree.ElementTree as ET

import pytest

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)

# name -> (expected .iv scenes, expected XML results); empty = exit code only.
EXAMPLE_ARTIFACTS = {
    "line_estimation.py": ([], []),
    "plane_estimation.py": ([], []),
    "sphere_estimation.py": ([], []),
    "ray_intersection_estimation.py": ([], []),
    "absolute_orientation.py": ([], []),
    "pivot_calibration.py": ([], []),
    "linear_equation_system_solver.py": ([], []),
    "crosswire_us_calibration.py": ([], ["crosswireUSCalibration.xml"]),
    "pointer_us_calibration.py": ([], ["pointerUSCalibration.xml"]),
    "plane_us_calibration.py": ([], ["planeUSCalibration.xml"]),
    "fused_sweep_showcase.py": ([], []),
}


def _discover_scenes(name):
    """Scan the example's source for the .iv scene names it writes."""
    with open(os.path.join(EXAMPLES, name)) as f:
        src = f.read()
    return [
        tok
        for tok in set(
            part.strip("\"'")
            for part in src.replace("(", " ").replace(")", " ").split()
            if part.strip("\"'").endswith(".iv")
        )
    ]


def _check_iv(path):
    with open(path) as f:
        text = f.read()
    assert text.startswith("#Inventor"), f"{path}: missing Inventor header"
    assert text.count("{") == text.count("}") > 0, f"{path}: unbalanced braces"


def _check_xml(path):
    root = ET.parse(path).getroot()
    assert root.tag == "precomputed_transform"
    transform = root.find("transformation")
    assert transform is not None
    float(transform.attrib["estimation_error"])
    rows = [r for r in transform.text.strip().splitlines() if r.strip()]
    assert len(rows) == 3
    for r in rows:
        vals = [float(v) for v in r.split()]
        assert len(vals) == 4


@pytest.mark.parametrize("name", sorted(EXAMPLE_ARTIFACTS), ids=lambda n: n[:-3])
def test_example_runs(name, tmp_path):
    env = dict(os.environ, LSQR_EXAMPLES_DEVICE="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, name)],
        cwd=tmp_path,  # artifact files land in the temp dir
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "RANSAC" in proc.stdout or "ransac" in proc.stdout

    for scene in _discover_scenes(name):
        path = tmp_path / scene
        assert path.exists(), f"{name} did not write {scene}\n{proc.stdout}"
        _check_iv(path)
    for xml_name in EXAMPLE_ARTIFACTS[name][1]:
        path = tmp_path / xml_name
        assert path.exists(), f"{name} did not write {xml_name}\n{proc.stdout}"
        _check_xml(path)
