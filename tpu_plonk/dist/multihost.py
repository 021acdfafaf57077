"""Multi-host bootstrap (SURVEY.md §2.10 "Multi-host launcher").

One process per host; host 0 owns the transcript and proof assembly
(all other hosts compute shards and exchange via ICI/DCN collectives).
On a pod slice this wraps `jax.distributed.initialize`; on a single
host it is a no-op so the same binary runs everywhere.

Exercised for real by tests/test_multihost.py: two local processes
bootstrap through `initialize` (Gloo backend), form one global 8-device
mesh, and run the sharded NTT whose all_to_all crosses the process
boundary.  Pod-slice scale remains hardware-gated, but the code path —
distributed init, global mesh, cross-process collectives — runs in CI.
"""

import jax
import numpy as np


def initialize(coordinator_address: str = None, num_processes: int = None,
               process_id: int = None) -> None:
    """Initialize the distributed runtime; no-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_coordinator() -> bool:
    return jax.process_index() == 0


def global_mesh(axis: str = "shard"):
    """Mesh over every device across all processes."""
    devs = jax.devices()
    return jax.make_mesh((len(devs),), (axis,), devices=devs,
                         axis_types=(jax.sharding.AxisType.Auto,))


def allgather(x) -> np.ndarray:
    """Globally-sharded array -> full host numpy on EVERY process.
    Single-process: a plain device pull.  This is the boundary that
    lets the multi-controller prover keep its elementwise rounds
    replicated-local while NTTs/commits run globally sharded."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def global_put(arr, sharding):
    """Host numpy (identical on every process) -> array sharded over a
    (possibly multi-process) mesh.  Under one controller this is
    jax.device_put; under many, each process materializes only its
    addressable shards."""
    arr = np.asarray(arr)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])
