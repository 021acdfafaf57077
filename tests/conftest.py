"""Test config: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without a pod (SURVEY.md §4.3
item 4).  bench.py (repo root) is the TPU path.

Note: this environment's sitecustomize registers a tunneled TPU backend
and force-sets jax_platforms at interpreter start, so an env-var
override is not enough — we must update the config after import and
before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: XLA CPU compiles of the limb-kernel
# graphs are expensive on small hosts; cache them across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".cache",
                          "jax-test")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the CPU backend; got " + str(jax.devices()[:1]))
assert len(jax.devices()) == 8, (
    "expected 8 virtual CPU devices, got " + str(len(jax.devices())))
