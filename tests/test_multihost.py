"""REAL multi-process distributed training (the reference's ddp_spawn analogue).

Two OS processes, each owning 2 virtual CPU devices, join a gloo-backed
jax.distributed cluster and run the same jitted DP train step over a 4-device
global mesh — the gradient all-reduce crosses the process boundary exactly
like DCN crosses TPU hosts. Reference counterpart: tests/test_train.py:52-61
(2-process ddp_spawn CPU simulation). The in-process no-op path of
maybe_initialize_distributed is covered in test_trainer.py; this test covers
the actually-distributed path.
"""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "helpers", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train_step():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, out[-3000:]
    # SPMD consistency: every process must end with identical replicated params
    sums = [line.split("checksum=")[1].strip()
            for out in outs for line in out.splitlines() if "MULTIHOST_OK" in line]
    assert len(sums) == 2 and sums[0] == sums[1], sums
