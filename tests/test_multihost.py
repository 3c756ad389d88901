"""Multi-host (cross-process) mesh path: a REAL 2-process CPU cluster
(VERDICT r4 item 4 / SURVEY §2.3 "jax.distributed + pjit meshes over
ICI/DCN").

Spawns two fresh Python processes that join a jax.distributed cluster
(coordinator on a free localhost port), each contributing 2 virtual CPU
devices, and run 2 sharded train steps over the GLOBAL 4-device mesh with
`dp` spanning the processes. SPMD means both processes execute the same
program and must print identical replicated losses.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # spawns 2 jax processes: ~1 min on this host

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_cluster_sharded_step():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, "--coordinator", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(pid),
             "--local_devices", "2", "--steps", "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST process={pid} devices=4 processes=2 OK" in out, out

    # SPMD: identical replicated loss trajectories on both processes
    losses = []
    for out in outs:
        vals = [float(m) for m in re.findall(r"step=\d+ loss=([-\d.]+)", out)]
        assert len(vals) == 2 and all(np.isfinite(vals)), out
        losses.append(vals)
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)
    # and the loss actually moved (a real optimizer step ran)
    assert losses[0][0] != losses[0][1], losses
