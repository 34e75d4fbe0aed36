"""Multi-host execution path: 2-process jax.distributed over CPU devices.

The reference is single-process/single-GPU (SURVEY §2.3); the framework's
beyond-reference claim is `parallel/distributed.py` — this test actually
executes it: two OS processes, each with 2 virtual CPU devices, form a
4-device global mesh, assemble host-local batches into one globally sharded
array, and run a sharded AE train step whose gradient all-reduce crosses the
process boundary.
"""

import os
import socket
import subprocess
import sys


_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    # every process reports success and the SAME global losses (the batch is
    # globally sharded and the program is SPMD — any divergence means the
    # collective didn't span both processes)
    lines = [
        line for out in outs for line in out.splitlines()
        if line.startswith("DISTRIBUTED_OK")
    ]
    assert len(lines) == 2, outs
    losses = {line.split("loss=")[1] for line in lines}
    assert len(losses) == 1, lines
