"""Multi-chip MSM: points+digits sharded per device; each device runs
bucket accumulation + weighted window sums over its shard (pure local
compute inside shard_map — no collectives, which keeps the SPMD
partitioner out of the EC scan graphs); the per-device (W,) window sums
are then combined with a log-depth EC tree + window fold in a plain
single-device jit (O(D*W) points — negligible traffic).
SURVEY.md §2.10 "Data-parallel MSM".
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..curves import device_g1 as dg1
from ..pcs import msm_device


@functools.partial(jax.jit, static_argnames=("c",))
def _combine_and_fold(gathered, c: int):
    """gathered: tuple of (D, W, 24) window sums -> folded MSM result."""
    acc = gathered
    d = acc[0].shape[0]
    while d > 1:
        half = d // 2
        lo = tuple(x[:half] for x in acc)
        hi = tuple(x[half: 2 * half] for x in acc)
        merged = dg1.add(lo, hi)
        if d % 2:
            merged = tuple(
                jnp.concatenate([m, x[2 * half:]]) for m, x in
                zip(merged, acc))
            d = half + 1
        else:
            d = half
        acc = merged
    window_sums = tuple(x[0] for x in acc)
    return msm_device._fold_windows(window_sums, c)


def msm_sharded(mesh, points_dev, digits, c: int = 8, axis: str = "shard"):
    """Full sharded MSM; returns a projective limb point (tuple of
    (24,) arrays).  digits: (W, N) int32, N sharded over the mesh."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(None, axis)),
        out_specs=tuple([P(axis, None, None)] * 3),
        check_vma=False,
    )
    def local_sums(px, py, pz, dg):
        sums = msm_device.window_sums_scan((px, py, pz), dg, c)
        # leading singleton axis becomes the device axis globally
        return tuple(x[None] for x in sums)

    gathered = local_sums(points_dev[0], points_dev[1], points_dev[2],
                          jnp.asarray(digits))
    return _combine_and_fold(gathered, c)
