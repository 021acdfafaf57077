"""TPU Pippenger MSM (single chip) — the framework's headline kernel
(BASELINE.md metric: MSM points/sec/chip).

Strategy per c-bit window (no data-dependent control flow anywhere):
  1. digits: host-precomputed (n_windows, N) int32 window digits
  2. argsort digits, gather points into digit order (XLA sort/gather)
  3. segmented inclusive scan with the complete-add combiner
     ((P1,d1) op (P2,d2) = (d1==d2 ? P1+P2 : P2, d2)) — associative,
     so jax.lax.associative_scan parallelizes it in log N depth
  4. segment tails scattered into 2^c bucket slots
  5. weighted bucket sum  sum_b b*B_b  via the running-sum scan
  6. windows folded high->low with c doublings per step

The multi-chip version shards step 1-4 per device and psums the bucket
accumulators (dist/msm_sharded.py).
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


def _bucket_accumulate(points, digits, c: int, lanes: int = MSM_LANES):
    """One window -> (2^c, 24)-limb bucket sums (index 0 unused).

    Per-lane private buckets (the GPU-classic layout, TPU-vectorized):
    N points are split over `lanes` vector lanes; each lane serially
    accumulates its N/lanes points into its own (2^c) bucket array
    (gather-add-scatter with per-lane-unique indices), then the lane
    dimension is folded with a scan.  The trace contains exactly two
    point-add instances regardless of N — compile time is
    N-independent, work is N + lanes*2^c adds."""
    n = digits.shape[0]
    lanes = min(lanes, n)
    assert n % lanes == 0, "point count must be divisible by lane count"
    steps = n // lanes
    lane_idx = jnp.arange(lanes)

    pts = tuple(coord.reshape(steps, lanes, -1) for coord in points)
    dgs = digits.reshape(steps, lanes)
    buckets = dg1.identity((lanes, 1 << c))

    def accumulate(bk, step):
        spts, sdg = step
        cur = tuple(b[lane_idx, sdg] for b in bk)
        new = dg1.add(cur, spts)
        bk = tuple(b.at[lane_idx, sdg].set(nw) for b, nw in zip(bk, new))
        return bk, None

    buckets, _ = jax.lax.scan(accumulate, buckets, (pts, dgs))

    def fold_lane(acc, lane_buckets):
        return dg1.add(acc, lane_buckets), None

    acc0 = dg1.identity(((1 << c),))
    folded, _ = jax.lax.scan(
        fold_lane, acc0, tuple(b for b in buckets))
    return folded


def _weighted_bucket_sum(buckets, c: int):
    """sum_b b * B_b via running-sum: iterate b = 2^c-1 .. 1."""
    def body(carry, b_rev):
        running, total = carry
        idx = (1 << c) - 1 - b_rev
        bucket = tuple(coord[idx] for coord in buckets)
        running = dg1.add(running, bucket)
        total = dg1.add(total, running)
        return (running, total), None

    init = (dg1.identity(()), dg1.identity(()))
    (running, total), _ = jax.lax.scan(
        body, init, jnp.arange((1 << c) - 1))
    return total


@functools.partial(jax.jit, static_argnames=("c",))
def _msm_window(points, digits, c: int):
    buckets = _bucket_accumulate(points, digits, c)
    return _weighted_bucket_sum(buckets, c)


def window_sums_scan(points, digits, c: int):
    """All per-window weighted bucket sums via one lax.scan over the
    window axis (digits: (W, N)) — a single window graph in the trace,
    shared by the single-chip and sharded paths."""
    def body(_, dg):
        buckets = _bucket_accumulate(points, dg, c)
        return None, _weighted_bucket_sum(buckets, c)

    _, sums = jax.lax.scan(body, None, digits)
    return sums


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


@functools.partial(jax.jit, static_argnames=("c",))
def msm_device(points_dev, digits, c: int):
    """Full MSM on device.  points_dev: (N,24)x3 Montgomery projective;
    digits: (n_windows, N) int32.  Returns projective limb point."""
    sums = window_sums_scan(points_dev, jnp.asarray(digits), c)
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
