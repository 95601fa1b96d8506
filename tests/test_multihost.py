"""Multi-process (multi-host analog) distributed test.

Spawns 2 OS processes x 4 virtual CPU devices each; they connect through
jax.distributed (coordinator on localhost — the DCN analog), build the global
2-D (data x lm) mesh, and run landmark-sharded BA per sequence with the
sequence axis spanning processes. SURVEY §4's prescription: validate
multi-host collectives with local processes before real pod runs.
"""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_ba():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS",)}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_multihost"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER,
             "--num-processes", "2", "--process-id", str(i), "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=ROOT,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} rc={p.returncode}\n{out}"
        assert "MULTIHOST OK" in out, f"proc {i} output:\n{out}"
    # both processes agreed on the psum-gathered costs
    assert "gathered=" in outs[0] and "gathered=" in outs[1]
