"""Two-process multi-host smoke test over the CPU backend.

Launches two OS processes that each own 4 virtual CPU devices, wire up
jax.distributed.initialize through a localhost coordinator, build the
8-agent global mesh, and run parallel RBCD rounds with the separator
all_gather crossing the process boundary (the DCN path of a real pod).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_parallel_rbcd(data_dir, tmp_path):
    g2o = os.path.join(data_dir, "smallGrid3D.g2o")
    if not os.path.exists(g2o):
        pytest.skip("smallGrid3D.g2o unavailable")
    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    procs = []
    logs = []
    for pid in range(2):
        env = dict(env_base)
        log = open(tmp_path / f"proc{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "dcora_tpu.drivers.parallel_pgo",
             "8", g2o, "--cpu", "--rounds", "10", "--tol", "0.5",
             "--verbose",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            env=env, stdout=log, stderr=subprocess.STDOUT,
            cwd=os.path.join(os.path.dirname(__file__), os.pardir),
        ))
    rcs = [p.wait(timeout=600) for p in procs]
    for log in logs:
        log.close()
    outputs = [(tmp_path / f"proc{pid}.log").read_text()
               for pid in range(2)]
    for pid, (rc, out) in enumerate(zip(rcs, outputs)):
        assert rc == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert "parallel-RBCD" in out, out[-3000:]
    # the reduced block gradnorm must agree across processes (same SPMD
    # program, same collective)
    import re

    def final_gradnorm(out):
        m = re.findall(r"gradnorm = ([0-9.eE+-]+)", out)
        return float(m[-1]) if m else None

    g0, g1 = final_gradnorm(outputs[0]), final_gradnorm(outputs[1])
    assert g0 is not None and g1 is not None
    assert abs(g0 - g1) <= 1e-9 * max(1.0, abs(g0))
