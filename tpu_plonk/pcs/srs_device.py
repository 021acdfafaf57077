"""Device batch SRS generation (VERDICT r1 "weak #6": the host setup's
serial Jacobian ladder is the wall at 2^20+; this replaces the phantom
docstring claim with a real TPU generator).

[tau^i]G for i < n via batched double-and-add: the i-th lane holds the
scalar tau^i (host pow chain, cheap); 255 steps of
  acc_i += bit_{i,k} ? base : identity ;  base = [2]base
run as ONE (n,)-batched complete add per step (the per-step base is a
broadcast constant — every lane shares [2^k]G).  The ladder emits
PROJECTIVE Montgomery limbs; the table is then batch-normalized to
AFFINE (one Montgomery-trick inversion, amortized over the cache
lifetime) because the fused CSR MSM (msm_csr.window_sums_fused, the
TPU default) requires z == 1 on every non-identity row.  Old
projective .npy caches are migrated in place on load.

Deterministic, INSECURE (test/bench) tau — same derivation as
pcs/srs.setup, so device- and host-generated SRS agree pointwise and
proof bytes stay engine-independent.  Disk-cached as one .npy.
"""

import functools
import hashlib
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..params import R_MOD
from ..curves import g1
from ..curves import device_g1 as dg1
from ..fields import device as dev
from . import msm_csr
from . import commit_device

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".cache")


def _tau(seed: bytes) -> int:
    return int.from_bytes(hashlib.sha512(seed).digest(), "little") % R_MOD


@jax.jit
def _batch_ladder(bits, base_x, base_y):
    """bits: (255, n) uint8; base doubles each step from G.
    Returns (n, 3, 24) projective Montgomery [s_i]G."""
    n = bits.shape[1]
    acc = dg1.identity((n,))
    base = (jnp.broadcast_to(base_x, (1, 24)),
            jnp.broadcast_to(base_y, (1, 24)),
            jnp.broadcast_to(jnp.asarray(
                dg1.identity(())[1]), (1, 24)))  # z = one (affine G)

    def body(k, carry):
        acc, base = carry
        bit = jax.lax.dynamic_index_in_dim(bits, k, axis=0,
                                           keepdims=False)
        added = dg1.add(acc, tuple(jnp.broadcast_to(b, (n, 24))
                                   for b in base))
        acc = dg1.select(bit > 0, added, acc)
        base = dg1.add(base, base)
        return acc, base

    acc, _ = jax.lax.fori_loop(0, bits.shape[0], body, (acc, base))
    return jnp.stack(acc, axis=1)


@jax.jit
def _normalize_packed(packed):
    """Batch-normalize a packed (N, 3, 24) projective Montgomery table
    to affine: z = R on every non-identity row; identity rows (z == 0)
    pass through unchanged.  One Montgomery-trick batch inversion
    (blocked scans — safe at 2^20+, CLAUDE rule 10) + 2 batched muls.

    Required because msm_csr.window_sums_fused (the TPU-default commit
    path) reconstructs z in-kernel and assumes affine rows; feeding it
    projective ladder output computed garbage-free but REJECTED tables
    (ADVICE r2 high finding)."""
    x, y, z = packed[:, 0], packed[:, 1], packed[:, 2]
    zinv = dev.batch_inv_mont(z, dev.FP)          # zeros -> zero
    ident = dev.is_zero(z)
    one = jnp.asarray(dg1.identity(())[1])
    xn = jnp.where(ident[:, None], x, dev.mont_mul(x, zinv, dev.FP))
    yn = jnp.where(ident[:, None], y, dev.mont_mul(y, zinv, dev.FP))
    zn = jnp.where(ident[:, None], z, jnp.broadcast_to(one, z.shape))
    return jnp.stack([xn, yn, zn], axis=1)


def _is_affine_packed(packed_np) -> bool:
    """Host-side check: every non-identity row has z == R."""
    one = np.asarray(dg1.identity(())[1])
    z = packed_np[:, 2, :]
    ident = ~z.any(axis=1)
    return bool(np.all(ident | (z == one[None]).all(axis=1)))


def device_srs_points(max_len: int,
                      seed: bytes = b"tpu-plonk insecure srs",
                      block: int = 1 << 15) -> jnp.ndarray:
    # block 2^15: a 2^18 block crashed the tunneled TPU worker
    # ("kernel fault") mid-ladder; smaller blocks generate 2^18 in
    # ~750 s and are disk-cached anyway.
    """(max_len + 1, 3, 24) packed points (row 0 identity, rows 1..n =
    [tau^(i-1)]G) ready for the CSR MSM; disk-cached."""
    os.makedirs(_CACHE_DIR, exist_ok=True)
    path = os.path.join(_CACHE_DIR, f"srs_dev_{max_len}.npy")
    if os.path.exists(path):
        import time as _time
        t0 = _time.time()
        cached = np.load(path)
        t1 = _time.time()
        if not _is_affine_packed(cached):
            # pre-r3 caches are projective: migrate once, in blocks
            # (a single 2^20 batch_inv graph is fine, but blocks keep
            # peak HBM bounded and reuse one compiled shape)
            blocks = [np.asarray(_normalize_packed(
                jnp.asarray(cached[lo:lo + block])))
                for lo in range(0, cached.shape[0], block)]
            cached = np.concatenate(blocks, axis=0)
            np.save(path, cached)
        # limbs are 16-bit values: cross the tunnel as u16 (half the
        # bytes — the wire is the cost, 0.3-9 MB/s push measured in
        # r4) and upcast on device
        out = jnp.asarray(cached.astype(np.uint16)).astype(jnp.uint32)
        out.block_until_ready()
        # the r4 2^18 run charged 322 s here on a 75 MB push — log the
        # split so a slow-tunnel episode is distinguishable from a
        # code regression (bench_results/r4_prove18_mxu.log)
        print(f"srs cache: load {t1 - t0:.1f}s, device push "
              f"{_time.time() - t1:.1f}s ({cached.nbytes >> 21} MB "
              f"as u16)", flush=True)
        return out
    tau = _tau(seed)
    if os.environ.get("TPU_PLONK_SRS_LADDER", "") not in ("", "0") \
            or jax.default_backend() in ("cpu",):
        # legacy bit-ladder (also the CPU-test path: the walk generator
        # routes through the fused Pallas kernel, whose interpret-mode
        # grid unrolls — CLAUDE.md rule 20)
        packed = _gen_ladder(tau, max_len, block)
        np.save(path, packed)
        return jnp.asarray(packed)
    out = _gen_walk(tau, max_len)
    if max_len <= (1 << 20):
        # disk-cache small/mid tables; above that the ~0.3-1.2 GB pull
        # through the tunnel costs more than regenerating (~tens of
        # seconds on device) and the .npy would dwarf the repo cache
        np.save(path, np.asarray(out))
    return out


def _gen_ladder(tau: int, max_len: int, block: int) -> np.ndarray:
    scalars = np.empty(max_len, dtype=object)
    acc = 1
    for i in range(max_len):
        scalars[i] = acc
        acc = acc * tau % R_MOD
    from ..fields import limbs as limbsmod
    canon = np.asarray(limbsmod.ints_to_limbs(list(scalars), 16))
    # (255, n) bit matrix from 16-bit limbs
    gx = jnp.asarray(dg1.points_to_device([g1.GEN])[0][0])
    gy = jnp.asarray(dg1.points_to_device([g1.GEN])[1][0])
    out_blocks = []
    for lo in range(0, max_len, block):
        hi = min(lo + block, max_len)
        sub = canon[lo:hi]
        bits = np.zeros((255, hi - lo), dtype=np.uint8)
        for b in range(255):
            bits[b] = (sub[:, b // 16] >> (b % 16)) & 1
        out_blocks.append(np.asarray(_normalize_packed(
            _batch_ladder(jnp.asarray(bits), gx, gy))))
    pts = np.concatenate(out_blocks, axis=0)
    ident = np.asarray(jnp.stack(dg1.identity((1,)), axis=1))
    return np.concatenate([ident, pts], axis=0)


# ---------------------------------------------------------------------------
# Walk generator: SRS as a Pippenger-transpose CSR walk.
#
# The bit-ladder above costs 255 batched complete adds per point block
# (~94 s per 2^15 block on v5e => ~3.3 h at 2^22 — the round-5 2^22
# prove died of exactly this).  But tau^i * G = sum_w d_{i,w} 2^{cw} G
# for the signed digits d of tau^i, and [d * 2^{cw}]G over all
# (w, |d| <= 2^{c-1}) is a SMALL host-computable table (81,921 affine
# points at c=13).  So: derive every tau^i on DEVICE (one blocked
# prefix-product scan — zero wire traffic), extract signed digits on
# device, and hand the (N, W) per-point index lists to the SAME fused
# CSR-accumulate kernel the MSM uses (curves/pallas_g1.accumulate_csr,
# one VMEM-resident point-add instance).  W=20 useful adds per point
# instead of 255 masked ladder steps, at the walk kernel's measured
# ~12.6M adds/s => 2^22 generates in tens of seconds.  The only wire
# cost is the ~8 MB u16 table push.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n", "c", "n_windows"))
def _srs_idx_dev(tau_mont_row, one_row, n: int, c: int, n_windows: int):
    """tau (Montgomery (16,) row) -> (n, W) signed table indices for
    the walk, all in ONE jitted program: prefix-product scan for
    tau^0..tau^(n-1), Montgomery strip, digit extraction.  The eager
    form compiled ~200 small remote programs at 2^22 (the blocked
    prefix scan alone is ~100 slice/mul/pad dispatches) and spent
    15+ min in compile round-trips (rule 16)."""
    # pad the scan length to a 2^16 multiple: blocked_scan falls back
    # to a FULL associative_scan on non-multiple lengths, whose 22
    # unrolled combine levels OOM-kill the remote compiler at 2^20+
    # (rule 10); the surplus rows are just higher tau powers, sliced
    total = n - 1
    blk = 1 << 16
    padt = -(-total // blk) * blk if total > blk else total
    taus = jnp.broadcast_to(tau_mont_row[None, :], (padt, 16))
    pref = dev.prefix_mul_mont(taus, dev.FR, axis=0)[:total]  # tau^1..
    scal = jnp.concatenate([one_row[None, :], pref], axis=0)
    return _digits_to_idx(dev.from_mont(scal, dev.FR), c, n_windows)


@functools.partial(jax.jit, static_argnames=("c", "n_windows"))
def _digits_to_idx(canon, c: int, n_windows: int):
    """(N, 16) canonical u32 limbs -> (N, W) signed 1-based table
    indices: sign(d) * (w * 2^(c-1) + |d|), 0 for zero digits.  Device
    mirror of msm_csr.limbs_to_digits + recode_signed (bit-exact for
    scalars < r; no overflow window when c does not divide 255).
    ONE jitted program: the ~40-op eager form cost a fresh remote
    compile + 0.4 s dispatch PER OP at 2^22 (rule 16)."""
    n = canon.shape[0]
    ext = jnp.concatenate([canon, jnp.zeros((n, 1), jnp.uint32)], axis=1)
    mask = jnp.uint32((1 << c) - 1)
    digs = []
    for w in range(n_windows):
        bit = w * c
        li, sh = bit // 16, bit % 16
        lo = ext[:, li] >> jnp.uint32(sh)
        if sh:
            lo = lo | (ext[:, li + 1] << jnp.uint32(16 - sh))
        digs.append((lo & mask).astype(jnp.int32))
    half = 1 << (c - 1)
    full = 1 << c
    carry = jnp.zeros((n,), jnp.int32)
    out = []
    for w in range(n_windows):
        d = digs[w] + carry
        carry = (d > half).astype(jnp.int32)
        d = d - carry * full
        idx = jnp.abs(d) + w * half
        out.append(jnp.where(d == 0, 0, jnp.where(d < 0, -idx, idx)))
    return jnp.stack(out, axis=1)


def _walk_table_host(c: int, n_windows: int) -> np.ndarray:
    """(2L, W*2^(c-1) + 1) u16 transposed x||y table of
    [d * 2^{cw}]G (d = 1..2^(c-1)), Montgomery limbs; column 0 is the
    accumulate_csr identity pad (x=0, y=R mod p)."""
    from ..fields import limbs as limbsmod
    from ..params import P_MOD, FP_MONT_R
    half = 1 << (c - 1)
    xs, ys = [0], [FP_MONT_R % P_MOD]
    for w in range(n_windows):
        base = g1.mul(g1.GEN, pow(2, c * w, R_MOD))
        acc = None
        for _ in range(half):
            acc = g1.add(acc, base)
            xs.append(acc[0] * FP_MONT_R % P_MOD)
            ys.append(acc[1] * FP_MONT_R % P_MOD)
    lx = np.asarray(limbsmod.ints_to_limbs(xs, 24))     # (P, 24)
    ly = np.asarray(limbsmod.ints_to_limbs(ys, 24))
    return np.concatenate([lx.T, ly.T], axis=0).astype(np.uint16)


def _gen_walk(tau: int, max_len: int, c: int = 13,
              block: int = 1 << 19) -> jnp.ndarray:
    from ..fields import limbs as limbsmod
    from ..curves import pallas_g1 as plg
    from ..params import P_MOD, FR_MONT_R, FP_MONT_R
    import time as _time
    t0 = _time.time()
    W = msm_csr.signed_window_count(c)
    tbl = jnp.asarray(_walk_table_host(c, W)).astype(jnp.uint32)
    t1 = _time.time()
    # tau^0 .. tau^(max_len-1), derived on device (Montgomery form)
    tau_mont = np.asarray(limbsmod.int_to_limbs(
        tau * FR_MONT_R % R_MOD, 16))
    one = np.asarray(limbsmod.int_to_limbs(FR_MONT_R % R_MOD, 16))
    idx = _srs_idx_dev(jnp.asarray(tau_mont), jnp.asarray(one),
                       max_len, c, W)
    rx, ry, rz = plg.accumulate_csr(tbl, idx, affine=True)
    packed = jnp.stack([rx.T, ry.T, rz.T], axis=1)      # (N, 3, 24)
    # blocked normalization: one whole-array batch inversion at 2^22
    # risks a program-level RESOURCE_EXHAUSTED (CLAUDE.md rule 17c)
    pts = jnp.concatenate(
        [_normalize_packed(packed[lo:lo + block])
         for lo in range(0, max_len, block)], axis=0)
    ident = jnp.stack(dg1.identity((1,)), axis=1)
    out = jnp.concatenate([ident, pts], axis=0)
    out.block_until_ready()
    t2 = _time.time()
    # spot-check against the host oracle before anything consumes it
    # (a wrong SRS would poison every later prove via the disk cache)
    rng = np.random.default_rng(0)
    rinv = pow(FP_MONT_R, -1, P_MOD)
    for i in map(int, rng.integers(0, max_len, size=4)):
        want = g1.mul(g1.GEN, pow(tau, i, R_MOD))
        row = np.asarray(out[i + 1])
        x = limbsmod.limbs_to_int(row[0])
        y = limbsmod.limbs_to_int(row[1])
        assert (x * rinv % P_MOD, y * rinv % P_MOD) == want, \
            f"walk SRS row {i} diverges from host [tau^i]G"
    print(f"srs walk-gen: table {t1 - t0:.1f}s, device walk+norm "
          f"{t2 - t1:.1f}s, n={max_len}", flush=True)
    return out


def srs_g2(seed: bytes = b"tpu-plonk insecure srs"):
    """([1]G2, [tau]G2) for the verifier's opening key."""
    from ..curves import g2
    tau = _tau(seed)
    return g2.GEN, g2.mul(g2.GEN, tau)


def to_affine(packed, start: int, count: int):
    """Rows [start, start+count) of a packed array as host affine
    points (debug / host-verifier use)."""
    sub = packed[start:start + count]
    return dg1.points_from_device(
        (sub[:, 0], sub[:, 1], sub[:, 2]))


class PackedCommitter(commit_device.DeviceCommitter):
    """DeviceCommitter over an already-packed (N+1, 3, 24) point array
    (e.g. straight from device_srs_points) — no host SRS detour.
    Inherits both commit paths (device-CSR default, host-CSR via
    TPU_PLONK_MSM_DEVCSR=0)."""

    def __init__(self, packed, c: int = None, bits: int = 255):
        if c is None:
            from . import csr_device
            c = csr_device.default_c(packed.shape[0] - 1, bits)
        self._bind(packed, packed.shape[0] - 1, c, bits)
