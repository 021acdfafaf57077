"""Device-mesh helpers (SURVEY.md §2.10: 1 chip -> 1 host -> N hosts
from the same code via mesh axes)."""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def make_mesh(n_devices: int = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    # Auto axis types: JAX 0.9's default Explicit axes make in-shard_map
    # collective-free library code (associative_scan etc.) trip over
    # sharding-override checks.
    return jax.make_mesh((len(devs),), (axis,), devices=devs,
                         axis_types=(jax.sharding.AxisType.Auto,))


def shard_rows(mesh: Mesh, axis: str = "shard") -> NamedSharding:
    """Shard the leading dimension across the mesh axis."""
    return NamedSharding(mesh, P(axis))
