"""TPU Pippenger MSM (single chip) — the framework's headline kernel
(BASELINE.md metric: MSM points/sec/chip).

Strategy (no data-dependent control flow, no scatters, N-independent
compile):
  1. digits: host-precomputed (n_windows, N) int32 window digits
  2. per-lane private bucket accumulation over ALL windows per step
     (masked one-hot sweeps — TPU scatters serialize per index)
  3. lane fold, then weighted bucket sums  sum_b b*B_b  via the
     running-sum scan, batched over windows
  4. windows folded high->low with c doublings per step (fori_loop)

The multi-chip version runs 1-3 per device shard and EC-combines the
per-device window sums (dist/msm_sharded.py).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import device as dev
from ..curves import device_g1 as dg1


def window_digits(scalars, c: int, n_windows: int) -> np.ndarray:
    """(n_windows, N) int32 digit matrix from host int scalars."""
    out = np.zeros((n_windows, len(scalars)), dtype=np.int32)
    mask = (1 << c) - 1
    for i, s in enumerate(scalars):
        s = int(s)
        for w in range(n_windows):
            out[w, i] = (s >> (w * c)) & mask
    return out


MSM_LANES = 128


def _bucket_accumulate(points, digits, c: int, lanes: int = None):
    """All windows at once -> (W, 2^c, 24)-limb bucket sums.

    Per-lane private buckets (the GPU-classic layout, TPU-vectorized):
    N points are split over `lanes` vector lanes; each serial step, a
    lane adds its current point into its private bucket for EVERY
    window simultaneously ((lane, window) index pairs are unique, so
    gather-add-scatter is race-free).  The lane axis is then folded
    with a scan.  The trace contains exactly two point-add instances —
    compile time is independent of N and W; sequential depth is
    N/lanes + lanes; work is N*W + lanes*W*2^c adds."""
    n_windows, n = digits.shape
    lanes = min(lanes if lanes is not None else MSM_LANES, n)
    assert n % lanes == 0, "point count must be divisible by lane count"
    steps = n // lanes
    pts = tuple(coord.reshape(steps, lanes, -1) for coord in points)
    dgs = jnp.swapaxes(digits.reshape(n_windows, steps, lanes), 0, 1)
    buckets = dg1.identity((lanes, n_windows, 1 << c))

    bucket_iota = jnp.arange(1 << c)[None, None, :]

    def accumulate(bk, step):
        spts, sdg = step  # (lanes, 24) coords, (W, lanes) digits
        # TPU scatters serialize per index; a masked full-sweep select
        # is bandwidth-bound instead, which wins for small 2^c.
        # mask: (lanes, W, 2^c) one-hot over the bucket axis
        mask = bucket_iota == jnp.swapaxes(sdg, 0, 1)[:, :, None]
        cur = tuple(
            jnp.where(mask[..., None], b, 0).sum(axis=2,
                                                 dtype=jnp.uint32)
            for b in bk)  # (lanes, W, 24); exactly one nonzero term
        bcast = tuple(jnp.broadcast_to(p[:, None], cur[0].shape)
                      for p in spts)
        new = dg1.add(cur, bcast)
        bk = tuple(jnp.where(mask[..., None], nw[:, :, None, :], b)
                   for b, nw in zip(bk, new))
        return bk, None

    buckets, _ = jax.lax.scan(accumulate, buckets, (pts, dgs))

    def fold_lane(acc, lane_buckets):
        return dg1.add(acc, lane_buckets), None

    acc0 = dg1.identity((n_windows, 1 << c))
    folded, _ = jax.lax.scan(fold_lane, acc0, buckets)
    return folded


def _weighted_bucket_sum(buckets, c: int):
    """sum_b b * B_b via the running-sum trick, batched over all
    windows: buckets (W, 2^c, 24) -> (W, 24)."""
    n_windows = buckets[0].shape[0]

    def body(carry, b_rev):
        running, total = carry
        idx = (1 << c) - 1 - b_rev
        bucket = tuple(coord[:, idx] for coord in buckets)
        running = dg1.add(running, bucket)
        total = dg1.add(total, running)
        return (running, total), None

    init = (dg1.identity((n_windows,)), dg1.identity((n_windows,)))
    (_, total), _ = jax.lax.scan(
        body, init, jnp.arange((1 << c) - 1))
    return total


def window_sums_scan(points, digits, c: int, lanes: int = None):
    """(W, N) digits -> (W,) weighted per-window bucket sums; shared by
    the single-chip and sharded paths."""
    buckets = _bucket_accumulate(points, digits, c, lanes)
    return _weighted_bucket_sum(buckets, c)


@functools.partial(jax.jit, static_argnames=("c",))
def _fold_windows(window_sums, c: int):
    """window_sums: tuple of (W, 24) coords, window 0 = least
    significant.  acc = ((S_{W-1} * 2^c) + S_{W-2}) * 2^c + ..."""
    n_windows = window_sums[0].shape[0]

    def body(acc, w_rev):
        idx = n_windows - 1 - w_rev
        s = tuple(coord[idx] for coord in window_sums)
        acc = jax.lax.fori_loop(0, c, lambda _, a: dg1.add(a, a), acc)
        return dg1.add(acc, s), None

    # first (most significant) window without pre-doubling
    top = tuple(coord[n_windows - 1] for coord in window_sums)
    if n_windows == 1:
        return top
    acc, _ = jax.lax.scan(body, top, jnp.arange(1, n_windows))
    return acc


@functools.partial(jax.jit, static_argnames=("c", "lanes"))
def msm_device(points_dev, digits, c: int, lanes: int = None):
    """Full MSM on device.  points_dev: (N,24)x3 Montgomery projective;
    digits: (n_windows, N) int32.  Returns projective limb point.
    `lanes` is part of the jit key (it shapes the bucket arrays)."""
    sums = window_sums_scan(points_dev, jnp.asarray(digits), c, lanes)
    return _fold_windows(sums, c)


def msm(points, scalars, c: int = 8, n_windows: int = None):
    """Host-facing MSM: affine points + int scalars -> affine point.
    n_windows defaults to full 255-bit coverage; pass fewer when the
    scalars are known-small (digits beyond the range are zero)."""
    if n_windows is None:
        n_windows = (255 + c - 1) // c
    pts = dg1.points_to_device(points)
    digits = window_digits(scalars, c, n_windows)
    out = msm_device(pts, digits, c)
    return dg1.points_from_device(tuple(x[None] for x in out))[0]
