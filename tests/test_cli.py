"""Console entry point (``lsqrrecipes_tpu.cli``) smoke tests."""

import json

from lsqrrecipes_tpu.cli import main


def test_cli_info(capsys):
    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "registered estimators" in out
    assert "us_plane_phantom" in out


def test_cli_bench_small(capsys):
    assert main(["bench", "--hypotheses", "1024", "--n", "128"]) == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["metric"] == "cli_ransac_hypotheses_per_s"
    assert payload["value"] > 0
    assert payload["center_error"] < 1.0
