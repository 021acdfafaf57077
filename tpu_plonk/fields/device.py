"""Batched modular arithmetic on the device (JAX/XLA, TPU-first).

All functions operate on uint32 arrays whose last axis holds base-2^16
limbs (little-endian); every other axis is batch.  Products of two
16-bit limbs are exact in a single u32 multiply — the TPU-native big-int
strategy (SURVEY.md §7 step 1 / "hard parts" item 1).  No data-dependent
control flow anywhere.

A `FieldCtx` bundles the per-field constants; `FR` (16 limbs) drives the
NTT / polynomial layer and `FP` (24 limbs) drives the G1 MSM kernels.

Montgomery multiplication = Comba column sums via fused shift-and-MAC
on the VPU (see _comba_matmul for why not an MXU matmul), followed by
REDC; carry/borrow propagation is log-depth Kogge-Stone.  ~3*L^2 limb
MACs per field multiply, intermediates never touch HBM.
"""

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..params import (
    LIMB_BITS, LIMB_MASK,
    R_MOD, FR_LIMBS, FR_MONT_R2, FR_NEG_INV,
    P_MOD, FP_LIMBS, FP_MONT_R2, FP_NEG_INV,
)
from .limbs import int_to_limbs

U32 = jnp.uint32


@dataclasses.dataclass(frozen=True)
class FieldCtx:
    """Static per-field constants (hashable -> usable as a jit-static arg)."""
    name: str
    modulus: int
    n_limbs: int
    mont_r2: int
    neg_inv: int  # -modulus^{-1} mod 2^(16*n_limbs)

    @functools.cached_property
    def mod_limbs(self) -> np.ndarray:
        return int_to_limbs(self.modulus, self.n_limbs)

    @functools.cached_property
    def r2_limbs(self) -> np.ndarray:
        return int_to_limbs(self.mont_r2, self.n_limbs)

    @functools.cached_property
    def one_mont_limbs(self) -> np.ndarray:
        # R mod q = Montgomery form of 1
        return int_to_limbs((1 << (LIMB_BITS * self.n_limbs)) % self.modulus,
                            self.n_limbs)

    @functools.cached_property
    def ninv_limbs(self) -> np.ndarray:
        return int_to_limbs(self.neg_inv, self.n_limbs)

    def __hash__(self):
        return hash((self.name, self.n_limbs))


FR = FieldCtx("fr", R_MOD, FR_LIMBS, FR_MONT_R2, FR_NEG_INV)
FP = FieldCtx("fp", P_MOD, FP_LIMBS, FP_MONT_R2, FP_NEG_INV)


# ---------------------------------------------------------------------------
# opt-in overflow/canonicity guards (SURVEY.md §5.2 sanitizer analog)
#
# Limb overflow is THE correctness hazard of this representation; the
# bit-exact oracle tests catch algebra bugs, but a guard that validates
# the in-flight invariants (every limb < 2^16, every value < modulus)
# catches violations at the op that produced them.  Off by default —
# debug.callback round-trips to host, so this is a debugging tool, not
# a production path.  Enable with TPU_PLONK_DEBUG_GUARDS=1 (read at
# trace time) or dev.DEBUG_GUARDS = True before first use of a shape.
# ---------------------------------------------------------------------------

import os as _os

DEBUG_GUARDS = _os.environ.get("TPU_PLONK_DEBUG_GUARDS", "0") not in ("", "0")


def _guard(x, ctx: FieldCtx, where: str):
    if not DEBUG_GUARDS:
        return

    def _check(arr, _where=where, _ctx=ctx):
        arr = np.asarray(arr)
        if (arr > LIMB_MASK).any():
            raise FloatingPointError(
                f"limb overflow entering {_where} ({_ctx.name})")
        # canonical (< modulus) check, vectorized most-significant-first
        m = _ctx.mod_limbs
        less = np.zeros(arr.shape[:-1], dtype=bool)
        eq = np.ones(arr.shape[:-1], dtype=bool)
        for i in range(_ctx.n_limbs - 1, -1, -1):
            less |= eq & (arr[..., i] < m[i])
            eq &= arr[..., i] == m[i]
        if not less.all():
            raise FloatingPointError(
                f"non-canonical value entering {_where} ({_ctx.name})")

    jax.debug.callback(_check, x)


# ---------------------------------------------------------------------------
# add / sub / neg (canonical, non-Montgomery-sensitive)
#
# Public entry points are jitted with the field context static: calling
# them eagerly from host code gets one fused XLA program per (shape,
# field) instead of thousands of per-op dispatches.  Inside an enclosing
# jit they inline as usual.
# ---------------------------------------------------------------------------

def _sub_array(a, b):
    """a - b limbwise with log-depth borrow lookahead; both inputs
    normalized (<2^16 limbs).  Returns (limbs, borrow_out in {0,1})."""
    L = a.shape[-1]
    g = (a < b).astype(U32)          # borrow generated
    p = (a == b).astype(U32)         # borrow propagates
    gs, ps = g, p
    d = 1
    while d < L:
        g_sh = jnp.concatenate(
            [jnp.zeros_like(gs[..., :d]), gs[..., :-d]], axis=-1)
        p_sh = jnp.concatenate(
            [jnp.zeros_like(ps[..., :d]), ps[..., :-d]], axis=-1)
        gs = gs | (ps & g_sh)
        ps = ps & p_sh
        d *= 2
    bin_ = jnp.concatenate(
        [jnp.zeros_like(gs[..., :1]), gs[..., :-1]], axis=-1)
    out = (a - b - bin_) & LIMB_MASK
    return out, gs[..., -1]


@functools.partial(jax.jit, static_argnames=("ctx",))
def add_mod(a, b, ctx: FieldCtx):
    _guard(a, ctx, "add_mod.a")
    _guard(b, ctx, "add_mod.b")
    mod = jnp.asarray(ctx.mod_limbs, U32)
    s = _carry_array(a + b)  # a+b < 2q < 2^(16L), carry-out 0
    d, borrow = _sub_array(s, jnp.broadcast_to(mod, s.shape))
    return jnp.where((borrow == 0)[..., None], d, s)


@functools.partial(jax.jit, static_argnames=("ctx",))
def sub_mod(a, b, ctx: FieldCtx):
    _guard(a, ctx, "sub_mod.a")
    _guard(b, ctx, "sub_mod.b")
    mod = jnp.asarray(ctx.mod_limbs, U32)
    d, borrow = _sub_array(a, b)
    dm = _carry_array(d + jnp.broadcast_to(mod, d.shape))
    return jnp.where((borrow == 1)[..., None], dm, d)


def neg_mod(a, ctx: FieldCtx):
    zero = jnp.zeros_like(a)
    return sub_mod(zero, a, ctx)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


# ---------------------------------------------------------------------------
# Montgomery multiplication (Comba + separated REDC)
# ---------------------------------------------------------------------------

def _comba_matmul(a, b, n_out=None):
    """Column sums of the schoolbook product of (..., L) limb arrays.
    Returns (..., n_out) u32 columns, each < 2^23 (pre-carry).

    Round-2 formulation: shift-and-MAC via a lax.scan over the limbs of
    `a`.  The round-1 version materialized the (..., L, L) u32 outer
    product plus two f32 copies and pushed them through an antidiagonal
    matmul — ~56 KB of HBM traffic per Fp multiply, which made the MSM
    bucket-accumulate step HBM-bound ~15x off peak.  A fully unrolled
    .at[].add chain fixes the traffic but bloats the trace (47 s to
    compile ONE point-add on the CI box); the scan keeps exactly one
    multiply-accumulate body in the trace and XLA updates the carried
    accumulator in place.

    Exactness: u32 products a_i*b_j would overflow 32 bits, so b is
    split into 8-bit halves: each term a_i*b8 < 2^24, summed over <= L
    (<= 24) terms < 2^28.6 — exact in u32.  The two accumulators are
    then re-split so every final column is < 2^23, within
    _carry_array's < 2^26 input contract:
      T_k = lo_k + 2^8 hi_k = (u_k + 2^8 p_k) + 2^16 (v_k + q_k)
    with u = lo & 0xffff, v = lo >> 16, p = hi & 0xff, q = hi >> 8; the
    (v + q) part carries into column k+1."""
    L = a.shape[-1]
    if n_out is None:
        n_out = 2 * L
    b_lo = (b & jnp.uint32(0xFF))[..., :min(L, n_out)]
    b_hi = (b >> jnp.uint32(8))[..., :min(L, n_out)]
    width = b_lo.shape[-1]
    # accumulators padded so the dynamic window [i, i+width) always fits
    pad = a.shape[:-1] + (n_out + width,)
    moved = jnp.moveaxis(a, -1, 0)            # (L, ...) scan over limbs

    def body(carry, ai):
        acc_lo, acc_hi, i = carry
        ai = ai[..., None]
        seg_lo = jax.lax.dynamic_slice_in_dim(acc_lo, i, width, axis=-1)
        seg_hi = jax.lax.dynamic_slice_in_dim(acc_hi, i, width, axis=-1)
        acc_lo = jax.lax.dynamic_update_slice_in_dim(
            acc_lo, seg_lo + ai * b_lo, i, axis=-1)
        acc_hi = jax.lax.dynamic_update_slice_in_dim(
            acc_hi, seg_hi + ai * b_hi, i, axis=-1)
        return (acc_lo, acc_hi, i + 1), None

    init = (jnp.zeros(pad, U32), jnp.zeros(pad, U32), jnp.int32(0))
    (acc_lo, acc_hi, _), _ = jax.lax.scan(body, init,
                                          moved[:min(L, n_out)])
    acc_lo = acc_lo[..., :n_out]
    acc_hi = acc_hi[..., :n_out]
    u = acc_lo & jnp.uint32(0xFFFF)
    v = acc_lo >> jnp.uint32(16)
    p = acc_hi & jnp.uint32(0xFF)
    q = acc_hi >> jnp.uint32(8)
    vq = v + q
    carry_in = jnp.concatenate(
        [jnp.zeros_like(vq[..., :1]), vq[..., :-1]], axis=-1)
    return u + (p << jnp.uint32(8)) + carry_in


@functools.lru_cache(maxsize=None)
def _toeplitz8(const_value: int, n_limbs: int, n_out: int) -> np.ndarray:
    """(2L, 2*n_out) f32 banded matrix of the constant's 8-bit digits:
    row i, column k holds digit (k - i) so that x8 @ M gives the 8-bit
    radix product columns of x * const (truncated mod 2^(16*n_out))."""
    digits = [(const_value >> (8 * t)) & 0xFF for t in range(2 * n_limbs)]
    m = np.zeros((2 * n_limbs, 2 * n_out), dtype=np.float32)
    for i in range(2 * n_limbs):
        for k in range(i, min(2 * n_out, i + 2 * n_limbs)):
            m[i, k] = digits[k - i]
    return m


def _const_mul_cols(x, const_value: int, n_limbs: int, n_out: int):
    """x (..., L) 16-bit limbs times a compile-time constant, as
    (..., n_out) u32 16-bit-radix columns < 2^23 (pre-carry).

    Runs as ONE single-pass bf16 MXU matmul over 8-bit digit splits —
    exact because both operand digit sets are < 2^8 (bf16-exact), the
    products < 2^16, and the f32 accumulation of <= 2L <= 48 terms
    stays < 2^21.6 < 2^24.  Used for the two REDC multiplies (by
    -q^{-1} mod R and by q), which always have constant operands."""
    x8 = jnp.stack([x & jnp.uint32(0xFF), x >> jnp.uint32(8)],
                   axis=-1).reshape(x.shape[:-1] + (2 * n_limbs,))
    mat = jnp.asarray(_toeplitz8(const_value, n_limbs, n_out))
    p = jnp.matmul(x8.astype(jnp.float32), mat,
                   preferred_element_type=jnp.float32).astype(U32)
    # recombine 8-bit columns p_{2j} + 2^8 p_{2j+1} into 16-bit columns
    # with the high part of odd columns carried one column up
    even = p[..., 0::2]
    odd = p[..., 1::2]
    alpha = odd & jnp.uint32(0xFF)
    beta = odd >> jnp.uint32(8)
    carry_in = jnp.concatenate(
        [jnp.zeros_like(beta[..., :1]), beta[..., :-1]], axis=-1)
    return even + (alpha << jnp.uint32(8)) + carry_in


def _carry_array(cols):
    """Normalize column sums (< 2^26) to 16-bit limbs along the last
    axis, dropping the final carry.  Exact log-depth carry propagation
    (Kogge-Stone carry-lookahead) instead of an O(L) ripple — ~7x fewer
    HLO ops and log latency, which is what keeps full-prover/MSM traces
    compilable.

    Derivation: split cols into a (low 16) + c (high); the value is
    A + (C << 16).  b = c shifted up one limb has b_i < 2^10, so
    s_i = a_i + b_i generates at most one carry; generate/propagate
    bits then combine with the standard Kogge-Stone recurrence."""
    L = cols.shape[-1]
    a = cols & LIMB_MASK
    c = cols >> LIMB_BITS
    b = jnp.concatenate(
        [jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)
    s = a + b
    g = (s >> LIMB_BITS).astype(jnp.uint32)          # carry generated
    p = ((s & LIMB_MASK) == LIMB_MASK).astype(jnp.uint32)  # propagates

    d = 1
    while d < L:
        g_sh = jnp.concatenate(
            [jnp.zeros_like(g[..., :d]), g[..., :-d]], axis=-1)
        p_sh = jnp.concatenate(
            [jnp.zeros_like(p[..., :d]), p[..., :-d]], axis=-1)
        g = g | (p & g_sh)
        p = p & p_sh
        d *= 2
    cin = jnp.concatenate(
        [jnp.zeros_like(g[..., :1]), g[..., :-1]], axis=-1)
    return (s + cin) & LIMB_MASK


#: route large Fr elementwise multiplies through the fused Pallas
#: kernel (fields/pallas_fr.py) — the scan comba below is ~16 dependent
#: HBM passes per multiply at prover scale.  DEFAULT ON for TPU: the
#: four-step NTT's twiddle boundary measured 768 ms -> 46 ms and the
#: full 2^22 NTT 1137 -> 429 ms (bench_results/ntt_twiddle_pallas.log,
#: v5e, r3).  Tri-state like poly.ntt_mxu.NTT_PALLAS: None = auto (env
#: TPU_PLONK_FR_PALLAS overrides, else on for non-CPU backends); tests
#: monkeypatch it.  Read at trace time; bit-exact either way
#: (tests/test_pallas_fr.py).
FR_PALLAS = None
_FR_PALLAS_MIN = 1 << 15


def _fr_pallas_default() -> bool:
    if FR_PALLAS is not None:
        return FR_PALLAS
    env = _os.environ.get("TPU_PLONK_FR_PALLAS")
    if env is not None:
        return env not in ("", "0")
    return jax.default_backend() not in ("cpu",)


@functools.partial(jax.jit, static_argnames=("ctx",))
def mont_mul(a, b, ctx: FieldCtx):
    """Montgomery product: a*b*R^{-1} mod q, inputs/outputs canonical
    limbs (<2^16 each), values in [0, q).  One variable*variable scan
    comba + two constant-operand Toeplitz matmuls (REDC); large Fr
    arrays optionally route through the fused Pallas kernel
    (FR_PALLAS above)."""
    L = ctx.n_limbs
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a.astype(U32), shape)
    b = jnp.broadcast_to(b.astype(U32), shape)
    if (ctx.name == "fr"
            and int(np.prod(shape[:-1])) >= _FR_PALLAS_MIN
            and jax.default_backend() not in ("cpu",)
            and _fr_pallas_default()):
        from . import pallas_fr
        return pallas_fr.mont_mul(a, b)
    _guard(a, ctx, "mont_mul.a")
    _guard(b, ctx, "mont_mul.b")
    mod_arr = jnp.asarray(ctx.mod_limbs, U32)

    # T = a * b  (2L limbs; a,b < q so T < q^2 fits exactly, carry-out 0)
    t = _carry_array(_comba_matmul(a, b))

    # m = (T mod R) * (-q^{-1} mod R) mod R  (low L limbs only)
    m = _carry_array(_const_mul_cols(t[..., :L], ctx.neg_inv, L, L))

    # u = (T + m*q) / R : the low L limbs cancel; T + m*q < 2Rq < 2^(32L)
    # so the carry out of the top column is provably zero.
    mq = _const_mul_cols(m, ctx.modulus, L, 2 * L)
    u = _carry_array(t + mq)[..., L:]
    # u < 2q: final conditional subtraction
    d, borrow = _sub_array(u, jnp.broadcast_to(mod_arr, u.shape))
    return jnp.where((borrow == 0)[..., None], d, u)


def mont_sqr(a, ctx: FieldCtx):
    return mont_mul(a, a, ctx)


def to_mont(a, ctx: FieldCtx):
    r2 = jnp.broadcast_to(jnp.asarray(ctx.r2_limbs, U32), a.shape)
    return mont_mul(a, r2, ctx)


def from_mont(a, ctx: FieldCtx):
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return mont_mul(a, one, ctx)


# ---------------------------------------------------------------------------
# exponentiation & inversion (Fermat) — batched, fixed trip count
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("exponent", "ctx"))
def mont_pow(a_mont, exponent: int, ctx: FieldCtx):
    """a^e with a in Montgomery form, e a static Python int (LSB-first
    square-and-multiply, fixed unrolled-by-scan schedule)."""
    bits = [(exponent >> i) & 1 for i in range(exponent.bit_length())]
    bits_arr = jnp.asarray(np.array(bits, dtype=np.uint32))
    one = jnp.broadcast_to(jnp.asarray(ctx.one_mont_limbs, U32), a_mont.shape)

    def body(carry, bit):
        acc, base = carry
        mult = mont_mul(acc, base, ctx)
        acc2 = jnp.where(bit > 0, mult, acc)
        base2 = mont_sqr(base, ctx)
        return (acc2, base2), None

    (acc, _), _ = jax.lax.scan(body, (one, a_mont), bits_arr)
    return acc


def mont_inv(a_mont, ctx: FieldCtx):
    """Batched inversion via Fermat: a^(q-2). Zero maps to zero."""
    return mont_pow(a_mont, ctx.modulus - 2, ctx)


def blocked_scan(a, combine, one_elem, axis=0, reverse=False,
                 block_log: int = 16):
    """Inclusive prefix `combine`-scan along `axis`, compile-bounded.

    jax.lax.associative_scan unrolls log2(n) combine levels into the
    trace; with Montgomery-multiply combines at n=2^20 that OOM-killed
    the remote TPU compiler (SIGKILL in the compile helper).  Above
    2^block_log the scan runs blockwise under lax.scan: associative
    scan inside each 2^block_log block (one block body in the trace),
    sequential carry across the n/2^block_log blocks."""
    n = a.shape[axis]
    if n <= (1 << block_log) or n % (1 << block_log):
        return jax.lax.associative_scan(combine, a, axis=axis,
                                        reverse=reverse)
    moved = jnp.moveaxis(a, axis, 0)
    if reverse:
        moved = jnp.flip(moved, 0)
    nb = n >> block_log
    blocks = moved.reshape(nb, 1 << block_log, *moved.shape[1:])
    carry0 = jnp.broadcast_to(jnp.asarray(one_elem, moved.dtype),
                              moved.shape[1:])

    def body(carry, blk):
        p = jax.lax.associative_scan(combine, blk, axis=0)
        out = combine(jnp.broadcast_to(carry, p.shape), p)
        return out[-1], out

    _, out = jax.lax.scan(body, carry0, blocks)
    out = out.reshape(moved.shape)
    if reverse:
        out = jnp.flip(out, 0)
    return jnp.moveaxis(out, 0, axis)


@functools.lru_cache(maxsize=None)
def _mul_combine(ctx: FieldCtx):
    # a STABLE callable per ctx: a fresh lambda per call makes eager
    # lax.scan/associative_scan retrace+recompile EVERY invocation
    # (measured: eager prefix_mul_mont at 2^18 cost 72-83 s/call on the
    # tunneled TPU, bench_results/r4_probe.log); with a cached closure
    # the traced program is reused
    return lambda x, y: mont_mul(x, y, ctx)


def prefix_mul_mont(a, ctx: FieldCtx, axis=0, reverse=False):
    """Inclusive prefix products (Montgomery), compile-bounded."""
    return blocked_scan(a, _mul_combine(ctx),
                        ctx.one_mont_limbs, axis=axis, reverse=reverse)


@functools.partial(jax.jit, static_argnames=("ctx", "axis"))
def batch_inv_mont(a_mont, ctx: FieldCtx, axis=0):
    """Montgomery-trick batch inversion along `axis` (zeros -> zero):
    prefix products (associative scan), one Fermat inversion of the
    total, then a backward sweep — O(3n) mults + one pow."""
    zero_mask = is_zero(a_mont)
    one = jnp.asarray(ctx.one_mont_limbs, U32)
    a_fixed = jnp.where(zero_mask[..., None], one, a_mont)

    prefix = prefix_mul_mont(a_fixed, ctx, axis=axis)
    total = jax.lax.index_in_dim(prefix, prefix.shape[axis] - 1,
                                 axis=axis, keepdims=True)
    total_inv = mont_inv(total, ctx)

    # inv_i = total_inv * prod_{j>i} a_j = suffix products * total_inv
    # suffix_i = prod_{j>i} a_j = reverse-scan; compute from prefix:
    #   inv(prefix_i) = total_inv * suffix_i  =>  a_i^{-1} = inv(prefix_i) * prefix_{i-1}
    suffix = prefix_mul_mont(a_fixed, ctx, axis=axis, reverse=True)
    # a_i^{-1} = prefix_{i-1} * suffix_{i+1} * total_inv
    shift_fwd = jnp.roll(prefix, 1, axis=axis)
    shift_fwd = _set_index(shift_fwd, 0, one, axis)
    shift_bwd = jnp.roll(suffix, -1, axis=axis)
    shift_bwd = _set_index(shift_bwd, a_mont.shape[axis] - 1, one, axis)
    out = mont_mul(mont_mul(shift_fwd, shift_bwd, ctx),
                   jnp.broadcast_to(total_inv, a_mont.shape), ctx)
    return jnp.where(zero_mask[..., None], jnp.zeros_like(out), out)


def _set_index(arr, idx, value_limbs, axis):
    sl = [slice(None)] * arr.ndim
    sl[axis] = idx
    return arr.at[tuple(sl)].set(value_limbs)
