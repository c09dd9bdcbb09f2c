"""Multi-host path smoke test: 2 coordinated processes, 4 global devices.

Exercises what `python main.py --distributed` sets up (efgh_tpu/main.py:26-32
-> jax.distributed.initialize) plus the trainer's mesh/sharding helpers
across process boundaries — the SURVEY §2.6 multi-node row.  The reference
has no multi-node story at all (single-process DataParallel, reference
main.py:127); this pins the TPU-native replacement.
"""

import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_coordinator():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "distributed_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=repo, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        # sum(arange(8)) = 28 — the all-reduce saw every process's shard
        assert "RESULT 28.0" in out, f"proc {i} output:\n{out}"
