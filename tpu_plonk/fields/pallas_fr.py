"""Fused elementwise Fr Montgomery multiply (Pallas, TPU).

Why: dev.mont_mul expresses the variable*variable Comba as a
lax.scan over 16 limbs (fields/device.py docstring) — each scan step
round-trips its accumulator window through HBM, so one elementwise
multiply over a prover-scale (n, 16) array is ~16 dependent passes.
Here the ENTIRE multiply — split-byte Comba, Kogge-Stone carries, and
the two constant-operand REDC convolutions — runs inside one Pallas
kernel per tile with every intermediate in VMEM; HBM sees the two
input arrays and the output once.

Layout (the round-2 Mosaic lesson, curves/pallas_g1.py): limbs ride
the SUBLANE axis — coords are (16, B), 16 = 2x8 sublane rows — and
elements ride the lanes; every limb shift is a static sublane concat.
`mont_mul_t` exposes the raw transposed layout; `mont_mul` wraps the
transposes for (..., 16) callers and is a bit-exact drop-in for
dev.mont_mul(a, b, dev.FR) (asserted in tests/test_pallas_fr.py,
interpret mode on CPU / real kernel on TPU).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import R_MOD
from . import limbs as limbsmod
from . import device as dev
from . import pallas_redc as redc

L = 16          # Fr limbs
import os as _os
TILE = int(_os.environ.get("TPU_PLONK_FR_TILE", "512"))
#: in-kernel multiply experiments (fields/pallas_redc.py docstring);
#: read at import/trace time, bit-exact either way.  Unlike the G1
#: walk kernel (pallas_g1._mxu, default ON for real devices), Fr keeps
#: the VPU default: the elementwise Fr mul is HBM-bound, and the r4
#: chip probe measured MXU-REDC as a slight loss here (transposed
#: kernel 21.3 -> 22.8 ms at 2^18, 29.1 -> 30.4 ms at 2^22;
#: bench_results/r4_frmul_mxu.log).
MXU = _os.environ.get("TPU_PLONK_PL_MXU", "0") not in ("", "0")
MUL16 = _os.environ.get("TPU_PLONK_PL_MUL16", "0") not in ("", "0")

_MOD = limbsmod.int_to_limbs(R_MOD, L)
_NEG_INV = limbsmod.int_to_limbs(dev.FR.neg_inv, L)

_consts = {}


def _carry(cols):
    """Kogge-Stone carry normalization along axis 0 (columns < 2^26 ->
    16-bit limbs); same algebra as dev._carry_array."""
    n = cols.shape[0]
    a = cols & jnp.uint32(0xFFFF)
    c = cols >> jnp.uint32(16)
    b = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
    s = a + b
    g = s >> jnp.uint32(16)
    p = ((s & jnp.uint32(0xFFFF)) == jnp.uint32(0xFFFF)).astype(jnp.uint32)
    d = 1
    while d < n:
        g_sh = jnp.concatenate([jnp.zeros_like(g[:d]), g[:-d]], axis=0)
        p_sh = jnp.concatenate([jnp.zeros_like(p[:d]), p[:-d]], axis=0)
        g = g | (p & g_sh)
        p = p & p_sh
        d *= 2
    cin = jnp.concatenate([jnp.zeros_like(g[:1]), g[:-1]], axis=0)
    return (s + cin) & jnp.uint32(0xFFFF)


def _sub(a, b):
    """a - b with log-depth borrow lookahead; returns (limbs, borrow)."""
    n = a.shape[0]
    g = (a < b).astype(jnp.uint32)
    p = (a == b).astype(jnp.uint32)
    d = 1
    while d < n:
        g_sh = jnp.concatenate([jnp.zeros_like(g[:d]), g[:-d]], axis=0)
        p_sh = jnp.concatenate([jnp.zeros_like(p[:d]), p[:-d]], axis=0)
        g = g | (p & g_sh)
        p = p & p_sh
        d *= 2
    bin_ = jnp.concatenate([jnp.zeros_like(g[:1]), g[:-1]], axis=0)
    out = (a - b - bin_) & jnp.uint32(0xFFFF)
    return out, g[n - 1:n]


def _comba(a, b, n_out):
    """Split-byte shift-MAC column sums (< 2^23), limbs on axis 0,
    fully unrolled in VMEM (the whole point of the kernel)."""
    b_lo = b & jnp.uint32(0xFF)
    b_hi = b >> jnp.uint32(8)
    acc_lo = jnp.zeros((n_out,) + a.shape[1:], jnp.uint32)
    acc_hi = jnp.zeros_like(acc_lo)
    for i in range(min(L, n_out)):
        w = min(b.shape[0], n_out - i)
        pl_ = a[i:i + 1] * b_lo[:w]
        ph = a[i:i + 1] * b_hi[:w]
        pad = ((i, n_out - i - w),) + ((0, 0),) * (a.ndim - 1)
        acc_lo = acc_lo + jnp.pad(pl_, pad)
        acc_hi = acc_hi + jnp.pad(ph, pad)
    u = acc_lo & jnp.uint32(0xFFFF)
    v = acc_lo >> jnp.uint32(16)
    p = acc_hi & jnp.uint32(0xFF)
    q = acc_hi >> jnp.uint32(8)
    vq = v + q
    cin = jnp.concatenate([jnp.zeros_like(vq[:1]), vq[:-1]], axis=0)
    return u + (p << jnp.uint32(8)) + cin


def _comba_var(a, b, n_out):
    if MUL16:
        return redc.comba_mul16(a, b, n_out, L)
    return _comba(a, b, n_out)


def _mont_mul_cols(a, b):
    """Montgomery product on (L, B) u32 columns (in-kernel)."""
    mod = _consts["mod"]
    t = _carry(_comba_var(a, b, 2 * L))
    if MXU:
        m = _carry(redc.const_mul_mxu(t[:L], _consts["ninv_mat"], L))
        mq = redc.const_mul_mxu(m, _consts["mod_mat"], 2 * L)
    else:
        m = _carry(_comba_var(t[:L], _consts["ninv"], L))
        mq = _comba_var(m, mod, 2 * L)
    u = _carry(t + mq)[L:]
    d, borrow = _sub(u, mod)
    return jnp.where(borrow == 0, d, u)


def _kernel(mod_ref, ninv_ref, *refs):
    _consts["mod"] = mod_ref[:]
    _consts["ninv"] = ninv_ref[:]
    if MXU:
        ninv_mat_ref, mod_mat_ref, a_ref, b_ref, o_ref = refs
        _consts["ninv_mat"] = ninv_mat_ref[:]
        _consts["mod_mat"] = mod_mat_ref[:]
    else:
        a_ref, b_ref, o_ref = refs
    o_ref[:] = _mont_mul_cols(a_ref[:], b_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mul_tiles(a, b, interpret=False):
    n = a.shape[1]
    grid = (n // TILE,)
    spec = pl.BlockSpec((L, TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    mod_in = jnp.broadcast_to(
        jnp.asarray(_MOD, jnp.uint32)[:, None], (L, TILE))
    ninv_in = jnp.broadcast_to(
        jnp.asarray(_NEG_INV, jnp.uint32)[:, None], (L, TILE))
    extra_in, extra_specs = [], []
    if MXU:
        for mat in (redc.toeplitz_split(dev.FR.neg_inv, L, L),
                    redc.toeplitz_split(R_MOD, L, 2 * L)):
            extra_in.append(jnp.asarray(mat))
            extra_specs.append(pl.BlockSpec(
                mat.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[cspec, cspec] + extra_specs + [spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        interpret=interpret,
    )(mod_in, ninv_in, *extra_in, a, b)


def mont_mul_t(a, b, interpret=False):
    """Transposed-layout entry: a, b (16, B) u32 canonical Montgomery
    limbs -> (16, B) product.  B padded to the tile size internally."""
    n = a.shape[1]
    pad = (-n) % TILE
    if pad:
        z = jnp.zeros((L, pad), jnp.uint32)
        a = jnp.concatenate([a, z], axis=1)
        b = jnp.concatenate([b, z], axis=1)
    out = _mul_tiles(a, b, interpret=interpret)
    return out[:, :n] if pad else out


def mont_mul(a, b, interpret=False):
    """Drop-in for dev.mont_mul(a, b, dev.FR) on (..., 16) u32 arrays
    (broadcasting supported like the jnp path)."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    batch = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    at = jnp.broadcast_to(a, shape).reshape(batch, L).T
    bt = jnp.broadcast_to(b, shape).reshape(batch, L).T
    return mont_mul_t(at, bt, interpret=interpret).T.reshape(shape)
