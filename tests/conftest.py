"""Test config: run the whole suite on the JAX CPU backend with 8 virtual
devices so multi-chip sharding paths are exercised without a pod
(SURVEY.md §4.3 item 4).  bench.py (repo root) runs on the real TPU."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
