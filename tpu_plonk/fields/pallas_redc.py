"""In-kernel multiply variants shared by the Pallas Fp/Fr kernels
(curves/pallas_g1.py, fields/pallas_fr.py) — two hardware experiments
for the Montgomery-multiply hot loop, both bit-exact vs the split-byte
VPU Comba (asserted in tests/test_pallas_fr.py / test_pallas_g1.py):

1. `const_mul_mxu` — the two REDC multiplies (by -q^{-1} mod R and by
   q) always have CONSTANT operands, so they are banded-Toeplitz
   matmuls over 8-bit digit splits: exactly the trick the XLA path
   already uses (fields/device.py `_const_mul_cols`), moved INSIDE the
   Pallas kernel as an MXU `dot` per multiply.  2 of the 3 limb
   convolutions per Montgomery mul leave the VPU for the otherwise-idle
   MXU.  Exact: both digit sets < 2^8 (bf16-exact operands), products
   < 2^16, f32 accumulation of <= 2L <= 48 terms < 2^21.6 < 2^24.

2. `comba_mul16` — the variable*variable Comba with full 16x16->32
   products (one u32 multiply per limb pair, lo/hi-split accumulators)
   instead of the byte-split scheme's two multiplies per pair.  Which
   wins depends on how Mosaic lowers u32 multiplies of 16-bit values —
   a hardware question, hence the env flag.

Flags (read at import by the kernel modules):
  TPU_PLONK_PL_MXU=1    REDC multiplies as in-kernel MXU matmuls
  TPU_PLONK_PL_MUL16=1  16x16 Comba accumulation
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

# contraction dim padded to the MXU-native 128 so Mosaic never sees a
# sub-128 lane dimension on the lhs (the round-2 layout lesson)
KPAD = 128


@functools.lru_cache(maxsize=None)
def toeplitz_split(const_value: int, n_limbs: int, n_out: int):
    """(2*n_out, KPAD) f32 banded matrix M with PERMUTED output rows
    [even 8-bit columns 0..n_out-1 ; odd columns 0..n_out-1], acting on
    the CONCATENATED digit vector x8 = [lo_0..lo_{L-1}, hi_0..hi_{L-1}]
    (sublane-friendly: two static concats, no interleave).  M @ x8
    gives the 8-bit radix columns of x * const mod 2^(16*n_out)."""
    digits = [(const_value >> (8 * t)) & 0xFF for t in range(2 * n_limbs)]
    m = np.zeros((2 * n_out, KPAD), dtype=np.float32)
    for j in range(2 * n_limbs):
        w8 = 2 * j if j < n_limbs else 2 * (j - n_limbs) + 1
        for k in range(w8, min(2 * n_out, w8 + 2 * n_limbs)):
            row = k // 2 if k % 2 == 0 else n_out + k // 2
            m[row, j] = digits[k - w8]
    return m


def const_mul_mxu(x, mat, n_out: int):
    """In-kernel: x (L, B) u32 16-bit limbs times the constant encoded
    in `mat` (toeplitz_split output, threaded in as a kernel input) ->
    (n_out, B) u32 16-bit-radix columns < 2^23 (pre-carry; same
    contract and identical column values as the VPU Comba)."""
    L, B = x.shape
    # Mosaic has no u32->bf16 cast (r4 chip run: "Unsupported cast:
    # uint32 -> bfloat16"); route u32 -> s32 -> f32 -> bf16 (exact:
    # values < 2^8)
    lo = ((x & jnp.uint32(0xFF)).astype(jnp.int32)
          .astype(jnp.float32).astype(jnp.bfloat16))
    hi = ((x >> jnp.uint32(8)).astype(jnp.int32)
          .astype(jnp.float32).astype(jnp.bfloat16))
    zpad = jnp.zeros((KPAD - 2 * L, B), jnp.bfloat16)
    x8 = jnp.concatenate([lo, hi, zpad], axis=0)          # (KPAD, B)
    p = jax.lax.dot_general(
        mat.astype(jnp.bfloat16), x8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (2*n_out, B)
    # f32 -> s32 -> u32: Mosaic's float casts target signed ints only
    p = p.astype(jnp.int32).astype(jnp.uint32)
    even, odd = p[:n_out], p[n_out:]
    alpha = odd & jnp.uint32(0xFF)
    beta = odd >> jnp.uint32(8)
    cin = jnp.concatenate([jnp.zeros_like(beta[:1]), beta[:-1]], axis=0)
    return even + (alpha << jnp.uint32(8)) + cin


def comba_mul16(a, b, n_out: int, L: int):
    """In-kernel variable*variable Comba, 16x16->32 products: one u32
    multiply per (i, j) limb pair; the product's lo/hi 16-bit halves
    accumulate separately (<= L terms each < 2^16 -> sums < 2^20.6,
    exact in u32).  Returns (n_out, B) u32 columns < 2^22 (column k =
    lo_k + hi_{k-1}; within the < 2^26 carry contract)."""
    acc_lo = jnp.zeros((n_out,) + a.shape[1:], jnp.uint32)
    acc_hi = jnp.zeros_like(acc_lo)
    bw = b.shape[0]
    for i in range(min(L, n_out)):
        w = min(bw, n_out - i)
        p = a[i:i + 1] * b[:w]                            # full 32-bit
        pad = ((i, n_out - i - w),) + ((0, 0),) * (a.ndim - 1)
        acc_lo = acc_lo + jnp.pad(p & jnp.uint32(0xFFFF), pad)
        acc_hi = acc_hi + jnp.pad(p >> jnp.uint32(16), pad)
    hi_shift = jnp.concatenate(
        [jnp.zeros_like(acc_hi[:1]), acc_hi[:-1]], axis=0)
    return acc_lo + hi_shift
