"""2-process jax.distributed integration test (SURVEY §2.3 comm-backend row).

Spawns two subprocesses, each a simulated host with 2 virtual CPU devices and
its own env farm, joined through a localhost coordinator with gloo-backed
cross-process collectives.  Exercises: init_distributed() wiring, global mesh
construction, process-local rollout feeding a cross-process-sharded replay
ring, collective learner updates, primary-gated eval + broadcast, collective
orbax checkpointing, and resume.  Marked slow (two cold JAX processes).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_and_resume(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    sums = [line.split()[1] for out in outs for line in out.splitlines()
            if line.startswith("CHECKSUM ")]
    assert len(sums) == 2, outs
    assert sums[0] == sums[1], f"post-resume params diverged: {sums}"

    # Only the primary writes metrics files; checkpoints are collective.
    assert os.path.exists(tmp_path / "logs" / "metrics.csv")
    assert os.path.exists(tmp_path / "models" / "LATEST")
