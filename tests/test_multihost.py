"""Multi-host path exercised for real (VERDICT round-1 task 8): two
separate JAX processes bootstrap through dist/multihost.initialize
(jax.distributed + Gloo), form one 8-device global mesh (4 virtual CPU
devices per process), and run the sharded four-step NTT whose
all_to_all crosses the process boundary.  Each process checks the
gathered result against the host oracle (tests/multihost_worker.py)."""

import os
import socket
import subprocess
import sys

import pytest

def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(mode: str, timeout: int = 840):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = root
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK proc={pid}" in out, out[-3000:]


def test_two_process_sharded_ntt():
    _run_workers("ntt")


def test_two_process_full_prove():
    """Multi-controller end-to-end proof: 2 processes x 4 devices, the
    device engine's NTTs/commits sharded over the global mesh, proof
    bytes identical to the host oracle on BOTH processes.

    In the default suite since round 5 (VERDICT r4 task 7): the
    committer's static CSR shapes (one walk program for all 11
    commits), chunk=8, and the shared .cache/jax-test persistent
    compile cache cut the old 30-60 min cold cost — in-suite the
    earlier dist tests have already warmed most sharded programs."""
    _run_workers("prove", timeout=1800)
