"""Multi-chip MSM (SURVEY.md §2.10 "Data-parallel MSM"): points +
digit lists sharded per device; each device runs the chunked-CSR
gather-accumulate pipeline (pcs/msm_csr.py) over its point shard —
pure local compute inside shard_map, no collectives, which keeps the
SPMD partitioner out of the EC loop graphs — and the per-device
(W, 3, 24) window sums are EC-combined and Horner-folded on the host
(O(D*W) points, negligible).

EC addition is exact and associative, so the sharded result is
bit-identical to the single-chip kernel and to the host oracle — the
property the 1-dev vs 8-dev proof-byte tests pin down.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..params import R_MOD
from ..fields import limbs
from ..fields import device as dev
from ..curves import g1
from ..pcs import msm_csr
from . import multihost


def _shard_csr(sdigits, c: int, n_shards: int, chunk: int = None):
    """Split (W, N) signed digits column-wise into `n_shards` equal
    shards (N must divide evenly; pad scalars first) and build one CSR
    per shard, padded to common (R, chunk) / (W, B, M2) shapes."""
    W, n = sdigits.shape
    assert n % n_shards == 0
    ns = n // n_shards
    if chunk is None:
        chunk = msm_csr.default_chunk(ns, c)
    csrs = [msm_csr.build_csr(sdigits[:, d * ns:(d + 1) * ns], c,
                              chunk=chunk)
            for d in range(n_shards)]
    R = max(l1.shape[0] for l1, _ in csrs)
    M2 = max(l2.shape[2] for _, l2 in csrs)
    l1s, l2s = [], []
    for l1, l2 in csrs:
        l1s.append(np.pad(l1, ((0, R - l1.shape[0]), (0, 0))))
        l2s.append(np.pad(l2, ((0, 0), (0, 0), (0, M2 - l2.shape[2]))))
    return np.stack(l1s), np.stack(l2s)


def shard_points(mesh, points, axis: str = "shard"):
    """Affine host points -> (D, Ns+1, 3, 24) packed device shards
    (row 0 of each shard = identity, the CSR padding target), sharded
    over the mesh axis.  Returns (packed, padded_total)."""
    d = mesh.shape[axis]
    n = len(points)
    ns = -(-n // d)
    total = ns * d
    pts = list(points) + [None] * (total - n)
    shards = [np.asarray(msm_csr.pack_points(pts[i * ns:(i + 1) * ns]))
              for i in range(d)]
    arr = np.stack(shards)
    sharding = NamedSharding(mesh, P(axis))
    return multihost.global_put(arr, sharding), total


@functools.lru_cache(maxsize=None)
def _sharded_runner(mesh, c: int, axis: str):
    """shard_map program: local chunked-CSR window sums per device."""

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def run(pts, l1, l2):
        # local blocks carry a leading singleton device axis
        s = msm_csr.window_sums_impl(pts[0], l1[0], l2[0], c)
        return s[None]

    return run


def shard_csr_from_limbs(canon, c: int, n_shards: int, n_windows: int,
                         chunk: int = None):
    """(N, 16) canonical limbs (N divisible by n_shards) -> stacked
    per-shard CSR tensors with common shapes (native C builder when
    available)."""
    n = canon.shape[0]
    assert n % n_shards == 0
    ns = n // n_shards
    if chunk is None:
        chunk = msm_csr.default_chunk(ns, c)
    csrs = [msm_csr.csr_from_limbs(canon[d * ns:(d + 1) * ns], c,
                                   n_windows, chunk)
            for d in range(n_shards)]
    R = max(l1.shape[0] for l1, _ in csrs)
    M2 = max(l2.shape[2] for _, l2 in csrs)
    l1s, l2s = [], []
    for l1, l2 in csrs:
        l1s.append(np.pad(l1, ((0, R - l1.shape[0]), (0, 0))))
        l2s.append(np.pad(l2, ((0, 0), (0, 0), (0, M2 - l2.shape[2]))))
    return np.stack(l1s), np.stack(l2s)


def window_sums_from_csr(mesh, points_packed, l1, l2, c: int,
                         axis: str = "shard"):
    """Stacked per-shard CSR -> per-window affine sums (host list)."""
    d = mesh.shape[axis]
    sharding = NamedSharding(mesh, P(axis))
    l1d = multihost.global_put(l1, sharding)
    l2d = multihost.global_put(l2, sharding)
    sums = _sharded_runner(mesh, c, axis)(points_packed, l1d, l2d)
    w = sums.shape[1]
    flat = msm_csr.sums_to_host(
        multihost.allgather(sums).reshape(d * w, 3, 24))
    out = []
    for wi in range(w):
        acc = None
        for di in range(d):
            acc = g1.add(acc, flat[di * w + wi])
        out.append(acc)
    return out


def window_sums_sharded(mesh, points_packed, sdigits, c: int,
                        axis: str = "shard"):
    """(D, Ns+1, 3, 24) packed shards + (W, N_padded) signed digits ->
    per-device window sums pulled to host, EC-combined: list of W
    affine points."""
    l1, l2 = _shard_csr(sdigits, c, mesh.shape[axis])
    return window_sums_from_csr(mesh, points_packed, l1, l2, c, axis)


def msm_sharded(mesh, points, scalars, c: int = 12, n_windows: int = None,
                axis: str = "shard"):
    """Host-facing sharded MSM: affine points + int scalars -> affine
    point, computed across the mesh."""
    packed, total = shard_points(mesh, points, axis)
    sc = [int(s) % R_MOD for s in scalars]
    sc += [0] * (total - len(sc))
    canon = np.asarray(limbs.ints_to_limbs(sc, 16))
    sd = msm_csr.recode_signed(
        msm_csr.limbs_to_digits(canon, c, n_windows), c)
    sums = window_sums_sharded(mesh, packed, sd, c, axis)
    return msm_csr.fold_windows_host(sums, c)


def _pad_or_trim(arr: np.ndarray, axis: int, size: int) -> np.ndarray:
    """Pad axis with zeros up to `size`, or trim it down — asserting
    the trimmed tail is all zero padding (it is whenever `size` is a
    true worst-case bound and the builder merely quantized past it)."""
    cur = arr.shape[axis]
    if cur == size:
        return arr
    if cur < size:
        pads = [(0, 0)] * arr.ndim
        pads[axis] = (0, size - cur)
        return np.pad(arr, pads)
    idx = [slice(None)] * arr.ndim
    idx[axis] = slice(size, None)
    assert not arr[tuple(idx)].any(), "static CSR bound violated"
    idx[axis] = slice(None, size)
    return arr[tuple(idx)]


class ShardedCommitter:
    """KZG commitments over the device mesh: SRS G1 powers resident,
    sharded once; `commit` takes Montgomery coefficient limb arrays
    (the device engine's native form) and returns the affine G1
    commitment.  Drop-in for DeviceCommitter when a mesh is in play
    (proof_system/engine_device.py `prove_device(mesh=...)`).

    `static_shapes` pins the per-shard CSR tensors to a worst-case
    (R, M2) computed once from (points/shard, c, chunk), so EVERY
    commit runs the SAME shard_map walk program.  Without it the
    data-dependent row count quantizes per commit (build_csr pads R to
    256-multiples), and a commit crossing a boundary cold-compiles a
    second ~70 s walk mid-prove — exactly what burned the r5 cold
    dryrun (bench_results/r5_dryrun_cold3.log, the 67 s jit(run) at
    16:03:53).  Default on for small tables (the dryrun regime), off at
    scale where the worst-case bound would pad ~2x the typical rows."""

    def __init__(self, mesh, srs, max_len: int, c: int = 12,
                 axis: str = "shard", chunk: int = None,
                 static_shapes: bool = None):
        if max_len > len(srs.powers_g1):
            raise ValueError("SRS too small for committed length")
        self.mesh = mesh
        self.c = c
        self.axis = axis
        self.points, self.total = shard_points(
            mesh, srs.powers_g1[:max_len], axis)
        self.max_len = max_len
        self.n_windows = msm_csr.signed_window_count(c)
        d = mesh.shape[axis]
        ns = self.total // d
        self.chunk = chunk if chunk is not None \
            else msm_csr.default_chunk(ns, c)
        if static_shapes is None:
            static_shapes = self.n_windows * ns <= 4096
        self.static_R = self.static_M2 = None
        if static_shapes:
            # per window: distributing ns entries over B buckets gives
            # sum_b ceil(cnt_b/chunk) <= floor(ns/chunk) + min(ns, B)
            B = 1 << (c - 1)
            self.static_R = self.n_windows * (
                ns // self.chunk + min(ns, B))
            self.static_M2 = max(1, -(-ns // self.chunk))

    def commit(self, coeffs_mont):
        n = coeffs_mont.shape[0]
        if n > self.max_len:
            raise ValueError("polynomial exceeds committed SRS")
        canon = np.asarray(dev.from_mont(coeffs_mont, dev.FR))
        canon = np.pad(canon, ((0, self.total - n), (0, 0)))
        l1, l2 = shard_csr_from_limbs(canon, self.c,
                                      self.mesh.shape[self.axis],
                                      self.n_windows, chunk=self.chunk)
        if self.static_R is not None:
            # build_csr quantizes (R, M2) up to 256/16 multiples; the
            # extra rows/cols are zero padding, so slicing back down to
            # the static worst-case bound is exact (row ids in l2 only
            # reference real rows <= the bound)
            l1 = _pad_or_trim(l1, 1, self.static_R)
            l2 = _pad_or_trim(l2, 3, self.static_M2)
        sums = window_sums_from_csr(self.mesh, self.points, l1, l2,
                                    self.c, self.axis)
        return msm_csr.fold_windows_host(sums, self.c)
