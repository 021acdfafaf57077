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
    mod = jnp.asarray(ctx.mod_limbs, U32)
    s = _carry_array(a + b)  # a+b < 2q < 2^(16L), carry-out 0
    d, borrow = _sub_array(s, jnp.broadcast_to(mod, s.shape))
    return jnp.where((borrow == 0)[..., None], d, s)


@functools.partial(jax.jit, static_argnames=("ctx",))
def sub_mod(a, b, ctx: FieldCtx):
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
    Returns (..., n_out) u32 columns, each < 2^22 (pre-carry).

    Round-2 formulation: shift-and-MAC on the VPU.  The round-1 version
    materialized the (..., L, L) u32 outer product plus two f32 copies
    and pushed them through an antidiagonal 0/1 matmul — ~56 KB of HBM
    traffic per Fp multiply, which profiling showed made the MSM
    bucket-accumulate step HBM-bound ~15x off peak.  Here column sums
    accumulate as L fused elementwise multiply-adds of statically
    shifted slices (XLA fuses the whole chain; nothing quadratic is
    materialized), so traffic is ~3 limb vectors per multiply.

    Exactness: u32 products a_i*b_j would overflow 32 bits, so b is
    split into 8-bit halves: each term a_i*b8 < 2^24, summed over <= L
    (<= 24) terms < 2^28.6 — exact in u32.  The two accumulators are
    then re-split so every final column is < 2^22, within
    _carry_array's < 2^26 input contract:
      T_k = lo_k + 2^8 hi_k = (u_k + 2^8 p_k) + 2^16 (v_k + q_k)
    with u = lo & 0xffff, v = lo >> 16, p = hi & 0xff, q = hi >> 8; the
    (v + q) part carries into column k+1."""
    L = a.shape[-1]
    if n_out is None:
        n_out = 2 * L
    b_lo = b & jnp.uint32(0xFF)
    b_hi = b >> jnp.uint32(8)
    acc_lo = jnp.zeros(a.shape[:-1] + (n_out,), U32)
    acc_hi = jnp.zeros_like(acc_lo)
    for i in range(min(L, n_out)):
        ai = a[..., i:i + 1]
        width = min(L, n_out - i)
        acc_lo = acc_lo.at[..., i:i + width].add(ai * b_lo[..., :width])
        acc_hi = acc_hi.at[..., i:i + width].add(ai * b_hi[..., :width])
    u = acc_lo & jnp.uint32(0xFFFF)
    v = acc_lo >> jnp.uint32(16)
    p = acc_hi & jnp.uint32(0xFF)
    q = acc_hi >> jnp.uint32(8)
    vq = v + q
    carry_in = jnp.concatenate(
        [jnp.zeros_like(vq[..., :1]), vq[..., :-1]], axis=-1)
    return u + (p << jnp.uint32(8)) + carry_in


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


@functools.partial(jax.jit, static_argnames=("ctx",))
def mont_mul(a, b, ctx: FieldCtx):
    """Montgomery product: a*b*R^{-1} mod q, inputs/outputs canonical
    limbs (<2^16 each), values in [0, q)."""
    L = ctx.n_limbs
    a = a.astype(U32)
    b = b.astype(U32)
    mod_arr = jnp.asarray(ctx.mod_limbs, U32)
    ninv = jnp.broadcast_to(jnp.asarray(ctx.ninv_limbs, U32), a.shape)

    # T = a * b  (2L limbs; a,b < q so T < q^2 fits exactly, carry-out 0)
    t = _carry_array(_comba_matmul(a, b))

    # m = (T mod R) * (-q^{-1} mod R) mod R  (low L limbs only)
    m = _carry_array(_comba_matmul(t[..., :L], ninv, n_out=L))

    # u = (T + m*q) / R : the low L limbs cancel; T + m*q < 2Rq < 2^(32L)
    # so the carry out of the top column is provably zero.
    mq = _comba_matmul(m, jnp.broadcast_to(mod_arr, m.shape))
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


@functools.partial(jax.jit, static_argnames=("ctx", "axis"))
def batch_inv_mont(a_mont, ctx: FieldCtx, axis=0):
    """Montgomery-trick batch inversion along `axis` (zeros -> zero):
    prefix products (associative scan), one Fermat inversion of the
    total, then a backward sweep — O(3n) mults + one pow."""
    zero_mask = is_zero(a_mont)
    one = jnp.asarray(ctx.one_mont_limbs, U32)
    a_fixed = jnp.where(zero_mask[..., None], one, a_mont)

    prefix = jax.lax.associative_scan(
        lambda x, y: mont_mul(x, y, ctx), a_fixed, axis=axis)
    total = jax.lax.index_in_dim(prefix, prefix.shape[axis] - 1,
                                 axis=axis, keepdims=True)
    total_inv = mont_inv(total, ctx)

    # inv_i = total_inv * prod_{j>i} a_j = suffix products * total_inv
    # suffix_i = prod_{j>i} a_j = reverse-scan; compute from prefix:
    #   inv(prefix_i) = total_inv * suffix_i  =>  a_i^{-1} = inv(prefix_i) * prefix_{i-1}
    suffix = jax.lax.associative_scan(
        lambda x, y: mont_mul(x, y, ctx), a_fixed, axis=axis, reverse=True)
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
