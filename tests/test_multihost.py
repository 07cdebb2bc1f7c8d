"""Simulated multi-host test (SURVEY.md §4(d)): two OS processes, each
with 2 virtual CPU devices, joined by ``jax.distributed`` over loopback —
proving ``parallel.initialize_distributed`` and the cross-process sharded
SpMM are not dead code.  Skips cleanly where the sandbox forbids the
coordinator socket."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    try:
        s.bind(("localhost", 0))
        return s.getsockname()[1]
    finally:
        s.close()


def test_two_process_distributed_spmm():
    try:
        port = _free_port()
    except OSError:
        pytest.skip("no loopback sockets in this sandbox")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(_WORKER))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(_WORKER) + "/..")
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed coordinator did not come up in time")
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"coordinator unavailable in sandbox: {out[-200:]}")
        assert p.returncode == 0, f"pid {pid} failed:\n{out[-2000:]}"
        assert f"MULTIHOST_OK pid={pid} procs=2 devices=4" in out, out[-2000:]
