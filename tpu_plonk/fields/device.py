"""Batched modular arithmetic on the device (JAX/XLA, TPU-first).

All functions operate on uint32 arrays whose last axis holds base-2^16
limbs (little-endian); every other axis is batch.  Products of two
16-bit limbs are exact in a single u32 multiply — the TPU-native big-int
strategy (SURVEY.md §7 step 1 / "hard parts" item 1).  No data-dependent
control flow: carries ripple in fixed-length unrolled chains, reductions
are compare+select.

A `FieldCtx` bundles the per-field constants; `FR` (16 limbs) drives the
NTT / polynomial layer and `FP` (24 limbs) drives the G1 MSM kernels.

Montgomery multiplication = Comba product scanning with separated lo/hi
column accumulators followed by REDC; ~3*L^2 u32 multiplies per field
multiply, entirely VPU-friendly elementwise ops that XLA fuses.
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
# carry / borrow chains
# ---------------------------------------------------------------------------

def _carry_chain(cols):
    """Ripple carries through a list of per-column u32 accumulators
    (each < 2^31); returns (limbs list each < 2^16, final carry)."""
    out = []
    carry = jnp.zeros_like(cols[0])
    for c in cols:
        s = c + carry
        out.append(s & LIMB_MASK)
        carry = s >> LIMB_BITS
    return out, carry


def _sub_limbs(a_cols, b_cols):
    """a - b limbwise with borrow; returns (limbs, borrow in {0,1})."""
    out = []
    borrow = jnp.zeros_like(a_cols[0])
    for x, y in zip(a_cols, b_cols):
        d = x - y - borrow  # u32 wraparound
        out.append(d & LIMB_MASK)
        borrow = (d >> 31)  # 1 iff wrapped (values < 2^17 so bit31 flags it)
    return out, borrow


def _select(cond, a_cols, b_cols):
    """cond ? a : b, columnwise (cond is a {0,1} u32 array)."""
    c = cond.astype(jnp.bool_)
    return [jnp.where(c, x, y) for x, y in zip(a_cols, b_cols)]


def _split(a):
    """(..., L) array -> list of L (...,) columns."""
    return [a[..., i] for i in range(a.shape[-1])]


def _join(cols):
    return jnp.stack(cols, axis=-1)


# ---------------------------------------------------------------------------
# add / sub / neg (canonical, non-Montgomery-sensitive)
#
# Public entry points are jitted with the field context static: calling
# them eagerly from host code gets one fused XLA program per (shape,
# field) instead of thousands of per-op dispatches.  Inside an enclosing
# jit they inline as usual.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("ctx",))
def add_mod(a, b, ctx: FieldCtx):
    mod = _split(jnp.asarray(ctx.mod_limbs, U32))
    s, _ = _carry_chain([x + y for x, y in zip(_split(a), _split(b))])
    d, borrow = _sub_limbs(s, mod)
    # if s >= mod (no borrow) use s - mod else s
    return _join(_select(1 - borrow, d, s))


@functools.partial(jax.jit, static_argnames=("ctx",))
def sub_mod(a, b, ctx: FieldCtx):
    mod = _split(jnp.asarray(ctx.mod_limbs, U32))
    d, borrow = _sub_limbs(_split(a), _split(b))
    dm, _ = _carry_chain([x + y for x, y in zip(d, mod)])
    return _join(_select(borrow, dm, d))


def neg_mod(a, ctx: FieldCtx):
    zero = jnp.zeros_like(a)
    return sub_mod(zero, a, ctx)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


# ---------------------------------------------------------------------------
# Montgomery multiplication (Comba + separated REDC)
# ---------------------------------------------------------------------------

def _comba_columns(a_cols, b_cols, n_out=None):
    """Column sums of the schoolbook product. Each 16x16 product is
    computed in u32 and split into lo/hi 16-bit halves so column
    accumulators stay < 2^21.  Returns `n_out` columns (default 2L, the
    full product); pass n_out=L for a mod-2^(16L) low product."""
    L = len(a_cols)
    if n_out is None:
        n_out = 2 * L
    cols = [None] * n_out
    for k in range(min(n_out, 2 * L - 1)):
        acc_lo = None
        acc_hi = None
        for i in range(max(0, k - L + 1), min(k + 1, L)):
            p = a_cols[i] * b_cols[k - i]
            lo = p & LIMB_MASK
            hi = p >> LIMB_BITS
            acc_lo = lo if acc_lo is None else acc_lo + lo
            acc_hi = hi if acc_hi is None else acc_hi + hi
        cols[k] = acc_lo if cols[k] is None else cols[k] + acc_lo
        if acc_hi is not None and k + 1 < n_out:
            nxt = cols[k + 1]
            cols[k + 1] = acc_hi if nxt is None else nxt + acc_hi
    z = jnp.zeros_like(a_cols[0])
    return [z if c is None else c for c in cols]


@functools.partial(jax.jit, static_argnames=("ctx",))
def mont_mul(a, b, ctx: FieldCtx):
    """Montgomery product: a*b*R^{-1} mod q, inputs/outputs canonical
    limbs (<2^16 each), values in [0, q)."""
    L = ctx.n_limbs
    a_cols = _split(a.astype(U32))
    b_cols = _split(b.astype(U32))
    mod = _split(jnp.asarray(ctx.mod_limbs, U32))
    ninv = _split(jnp.asarray(ctx.ninv_limbs, U32))

    # T = a * b  (2L limbs; a,b < q so T < q^2 fits exactly, carry-out 0)
    t_cols = _comba_columns(a_cols, b_cols)
    t, _ = _carry_chain(t_cols)

    # m = (T mod R) * (-q^{-1} mod R) mod R  (low L limbs only)
    m_cols = _comba_columns(t[:L], ninv, n_out=L)
    m, _ = _carry_chain(m_cols)

    # u = (T + m*q) / R : the low L limbs cancel; T + m*q < 2Rq < 2^(32L)
    # so the carry out of the top column is provably zero.
    mq_cols = _comba_columns(m, mod)
    full = [t[i] + mq_cols[i] for i in range(2 * L)]
    u_all, _ = _carry_chain(full)
    u = u_all[L:]
    # u < 2q: final conditional subtraction
    d, borrow = _sub_limbs(u, mod)
    return _join(_select(1 - borrow, d, u))


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
