"""Two-process distributed correctness (jax.distributed + Gloo CPU
collectives).

The reference is single-process; BASELINE.json makes multi-host scaling a
first-class target, so cross-PROCESS correctness (not just a single-process
8-device mesh) needs a real test: two spawned processes form one global
(4 hypotheses x 2 data) CPU mesh, run ``build_sharded_ransac_step`` whose
psum/all_gather cross the process boundary, and each asserts exact
agreement with its local single-process engine run
(tests/multiprocess_worker.py).
"""

import os
import socket
import subprocess
import sys

TESTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TESTS)


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_ransac(tmp_path):
    port = _free_port()
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=os.pathsep.join(
            [REPO] + os.environ.get("PYTHONPATH", "").split(os.pathsep)
        ).rstrip(os.pathsep),
    )
    ckpt = str(tmp_path / "sweep_state.npz")  # shared-filesystem checkpoint
    workers = [
        subprocess.Popen(
            [sys.executable, os.path.join(TESTS, "multiprocess_worker.py"),
             str(pid), str(port), ckpt],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for w in workers:
            out, _ = w.communicate(timeout=300)
            outs.append(out)
    finally:
        for w in workers:
            if w.poll() is None:
                w.kill()
    for pid, (w, out) in enumerate(zip(workers, outs)):
        assert w.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "WORKER_OK" in out, f"worker {pid} missing OK marker:\n{out}"
