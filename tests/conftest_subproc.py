"""Helper for running heavy-compile integration tests in a FRESH
python process (importable by test modules; not a conftest plugin).

Why: the XLA CPU compiler/cache pipeline on this box segfaults
non-deterministically when a single long-lived pytest process
accumulates many large compiles (observed in compile, cache-read, and
cache-write frames across full-suite runs; every crashing program
compiles fine standalone).  Isolating the few giant-compile tests
bounds per-process compile volume; the persistent cache is shared so
warm reruns stay fast."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BOOTSTRAP = """
import sys
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_compilation_cache_dir",
                  {root!r} + "/.cache/jax-test")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import importlib
m = importlib.import_module({module!r})
m.worker_main()
print("SUBPROC_TEST_OK")
"""


def run_isolated(module: str, n_devices: int = 8, timeout: int = 3300):
    """Import `module` in a fresh CPU-backend process (with an
    n_devices virtual mesh) and run its worker_main(); assert success."""
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}")
    res = subprocess.run(
        [sys.executable, "-c",
         BOOTSTRAP.format(root=ROOT, module=module)],
        env=env, capture_output=True, text=True, timeout=timeout)
    assert res.returncode == 0, (
        res.stdout[-3000:] + "\n---\n" + res.stderr[-3000:])
    assert "SUBPROC_TEST_OK" in res.stdout
