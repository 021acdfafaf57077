"""Fused G1 complete-addition Pallas kernel (TPU).

Why: the MSM bucket accumulate is a long chain of batched point adds;
with each Montgomery multiply as a separate XLA op the intermediates
round-trip through HBM (~measured HBM-bound ~15x off peak at 2^18:
8k pts/s for work whose VPU bound is ~100x higher).  Here the ENTIRE
RCB complete add — 12 Montgomery multiplies as two 6-stacked layers,
plus all mod add/sub and carry chains — runs inside one Pallas kernel
per tile, so every intermediate lives in VMEM and HBM sees only the
9 input/output limb arrays plus a sign row per point.

Layout (the round-2 lesson): Mosaic wants the LANE (last) dimension to
be a multiple of 128 and the sublane dim a multiple of 8.  The jnp
path's (batch, 24) arrays put the 24 limbs on lanes — every slice/pad
needed a relayout and the Mosaic compile ran >9 min without finishing.
This kernel therefore runs TRANSPOSED: coords are (24, B) — limbs on
sublanes (24 = 3x8 rows), points on lanes — and every limb shift is a
static sublane concat, which Mosaic lowers natively.  `add()` wraps the
transposes; `add_t()` exposes the raw layout for callers that keep
state transposed (the MSM accumulate loop).

Math mirrors fields/device.py exactly (same split-byte Comba, same
Kogge-Stone carries, same separated REDC) and curves/device_g1.py's
RCB15 Algorithm 7 (a=0, b3=12); bit-exactness vs that jnp path is
asserted in tests (interpret mode on CPU, real kernel on TPU).
Reference analog: dusk-bls12_381's G1 projective add under Pippenger
(SURVEY.md §2.4/§2.6); this kernel is the inner loop of the MSM.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import P_MOD, FP_MONT_R
from ..fields import limbs as limbsmod
from ..fields import device as dev
from ..fields import pallas_redc as redc

L = 24          # Fp limbs
# Points (lanes) per kernel instance.  The Pallas grid is SEQUENTIAL
# on a TPU core, so at R ~ 47k rows a 256-lane tile means ~183 grid
# steps of per-step overhead per accumulate iteration; wider tiles
# amortize it (VMEM working set ~1-2 MB per 1k lanes).  Env-tunable
# for the bench sweep (scripts/msm_sweep.py --tiles).
import os as _os
TILE = int(_os.environ.get("TPU_PLONK_G1_TILE", "256"))
#: in-kernel multiply experiments (fields/pallas_redc.py docstring);
#: read at trace time, bit-exact either way
_MXU_ENV = _os.environ.get("TPU_PLONK_PL_MXU")
MUL16 = _os.environ.get("TPU_PLONK_PL_MUL16", "0") not in ("", "0")


@functools.lru_cache(maxsize=None)
def _mxu() -> bool:
    """Tri-state default (CLAUDE.md r3 pattern): explicit env wins;
    otherwise the MXU-REDC multiply is ON for real devices — the r4
    chip sweep measured the fused walk at 2^20 at 3.08 s vs 3.73 s
    split-byte VPU (340k vs 281k pts/s), bit-exact — and OFF on CPU
    (interpret tests keep the reference arithmetic)."""
    if _MXU_ENV is not None:
        return _MXU_ENV not in ("", "0")
    return jax.default_backend() not in ("cpu",)

_MOD = limbsmod.int_to_limbs(P_MOD, L)
_NEG_INV = limbsmod.int_to_limbs(dev.FP.neg_inv, L)

# kernel-visible constants: Pallas kernels cannot capture traced array
# constants, so the modulus / -q^{-1} columns are threaded through as
# (L, TILE) inputs and stashed in a module-level holder while tracing.
_consts = {}


def _carry(cols):
    """Kogge-Stone carry normalization along axis 0 (columns < 2^26 ->
    16-bit limbs); identical algebra to dev._carry_array."""
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
    """a - b (per-lane big ints, limbs on axis 0) with borrow row;
    mirrors dev._sub_array."""
    n = a.shape[0]
    g = (a < b).astype(jnp.uint32)
    p = (a == b).astype(jnp.uint32)
    g = jnp.broadcast_to(g, (n,) + g.shape[1:])
    p = jnp.broadcast_to(p, (n,) + p.shape[1:])
    d = 1
    while d < n:
        g_sh = jnp.concatenate([jnp.zeros_like(g[:d]), g[:-d]], axis=0)
        p_sh = jnp.concatenate([jnp.zeros_like(p[:d]), p[:-d]], axis=0)
        g = g | (p & g_sh)
        p = p & p_sh
        d *= 2
    bin_ = jnp.concatenate([jnp.zeros_like(g[:1]), g[:-1]], axis=0)
    out = (a - b - bin_) & jnp.uint32(0xFFFF)
    borrow = g[n - 1:n]                      # (1, B) — stays 2-D
    return out, borrow


def _mod_row(a):
    m = _consts["mod"]
    w = a.shape[-1] // m.shape[-1]
    if w == 1:
        return m
    return jnp.concatenate([m] * w, axis=-1)


def _ninv_row(a):
    m = _consts["ninv"]
    w = a.shape[-1] // m.shape[-1]
    if w == 1:
        return m
    return jnp.concatenate([m] * w, axis=-1)


def _add_mod(a, b):
    s = _carry(a + b)
    d, borrow = _sub(s, _mod_row(s))
    return jnp.where(borrow == 0, d, s)


def _sub_mod(a, b):
    d, borrow = _sub(a, b)
    dm = _carry(d + _mod_row(d))
    return jnp.where(borrow == 1, dm, d)


def _comba(a, b, n_out):
    """Split-byte shift-MAC column sums (< 2^23), limbs on axis 0; the
    unrolled adds stay in VMEM inside the kernel — the whole point."""
    b_lo = b & jnp.uint32(0xFF)
    b_hi = b >> jnp.uint32(8)
    acc_lo = jnp.zeros((n_out,) + a.shape[1:], jnp.uint32)
    acc_hi = jnp.zeros_like(acc_lo)
    for i in range(min(L, n_out)):
        w = min(L, n_out - i)
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


def _mont_mul(a, b):
    """Montgomery product on (L, B) u32 columns (in-kernel)."""
    t = _carry(_comba_var(a, b, 2 * L))
    if _mxu():
        m = _carry(redc.const_mul_mxu(t[:L], _consts["ninv_mat"], L))
        mq = redc.const_mul_mxu(m, _consts["mod_mat"], 2 * L)
    else:
        m = _carry(_comba_var(t[:L], _ninv_row(a), L))
        mq = _comba_var(m, _mod_row(a), 2 * L)
    u = _carry(t + mq)[L:]
    d, borrow = _sub(u, _mod_row(u))
    return jnp.where(borrow == 0, d, u)


def _scale12(t):
    t2 = _add_mod(t, t)
    t4 = _add_mod(t2, t2)
    return _add_mod(_add_mod(t4, t4), t4)


def _rcb_add(x1, y1, z1, x2, y2, z2):
    """RCB15 Algorithm 7 (a=0, b3=12) — the 12 products as two 6-wide
    lane-stacked multiplies, same structure as curves/device_g1.add."""
    ad_ = _add_mod
    sb_ = _sub_mod
    lhs = jnp.concatenate(
        [x1, y1, z1, ad_(x1, y1), ad_(y1, z1), ad_(x1, z1)], axis=1)
    rhs = jnp.concatenate(
        [x2, y2, z2, ad_(x2, y2), ad_(y2, z2), ad_(x2, z2)], axis=1)
    p1 = _mont_mul(lhs, rhs)
    n = x1.shape[1]
    t0, t1, t2 = p1[:, :n], p1[:, n:2 * n], p1[:, 2 * n:3 * n]
    s1, s2, s3 = p1[:, 3 * n:4 * n], p1[:, 4 * n:5 * n], p1[:, 5 * n:]
    t3 = sb_(s1, ad_(t0, t1))
    t4 = sb_(s2, ad_(t1, t2))
    y3 = sb_(s3, ad_(t0, t2))
    t0x3 = ad_(ad_(t0, t0), t0)
    t2b = _scale12(t2)
    z3 = ad_(t1, t2b)
    t1b = sb_(t1, t2b)
    y3b = _scale12(y3)
    lhs2 = jnp.concatenate([t3, t4, y3b, t1b, z3, t0x3], axis=1)
    rhs2 = jnp.concatenate([t1b, y3b, t0x3, z3, t4, t3], axis=1)
    p2 = _mont_mul(lhs2, rhs2)
    rx = sb_(p2[:, :n], p2[:, n:2 * n])
    ry = ad_(p2[:, 3 * n:4 * n], p2[:, 2 * n:3 * n])
    rz = ad_(p2[:, 4 * n:5 * n], p2[:, 5 * n:])
    return rx, ry, rz


def _kernel(mod_ref, ninv_ref, *refs):
    _consts["mod"] = mod_ref[:]
    _consts["ninv"] = ninv_ref[:]
    if _mxu():
        (ninv_mat_ref, mod_mat_ref, px, py, pz, qx, qy, qz, sgn,
         ox, oy, oz) = refs
        _consts["ninv_mat"] = ninv_mat_ref[:]
        _consts["mod_mat"] = mod_mat_ref[:]
    else:
        px, py, pz, qx, qy, qz, sgn, ox, oy, oz = refs
    qy_v = qy[:]
    # conditional negate (bucket-entry sign): -y = 0 - y mod p, the
    # same algebra as dev.neg_mod (y = 0 stays 0)
    neg_y = _sub_mod(jnp.zeros_like(qy_v), qy_v)
    qy_v = jnp.where(sgn[:1] != 0, neg_y, qy_v)
    rx, ry, rz = _rcb_add(px[:], py[:], pz[:], qx[:], qy_v, qz[:])
    ox[:] = rx
    oy[:] = ry
    oz[:] = rz


@functools.partial(jax.jit, static_argnames=("interpret",))
def _add_tiles(p, q, sgn, interpret=False):
    """p, q: tuples of (L, B) u32; sgn: (8, B) u32; B % TILE == 0."""
    n = p[0].shape[1]
    grid = (n // TILE,)
    spec = pl.BlockSpec((L, TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((8, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out_shape = tuple(jax.ShapeDtypeStruct((L, n), jnp.uint32)
                      for _ in range(3))
    mod_in = jnp.broadcast_to(
        jnp.asarray(_MOD, jnp.uint32)[:, None], (L, TILE))
    ninv_in = jnp.broadcast_to(
        jnp.asarray(_NEG_INV, jnp.uint32)[:, None], (L, TILE))
    extra_in, extra_specs = [], []
    if _mxu():
        for mat in (redc.toeplitz_split(dev.FP.neg_inv, L, L),
                    redc.toeplitz_split(P_MOD, L, 2 * L)):
            extra_in.append(jnp.asarray(mat))
            extra_specs.append(pl.BlockSpec(
                mat.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=([cspec, cspec] + extra_specs
                  + [spec] * 3 + [spec] * 3 + [sspec]),
        out_specs=(spec, spec, spec),
        out_shape=out_shape,
        interpret=interpret,
    )(mod_in, ninv_in, *extra_in, *p, *q, sgn)


def add_t(p, q, sign=None, interpret=False):
    """Batched complete add in transposed layout: p, q tuples of
    (L, B) u32 Montgomery projective coords; optional sign (B,) bool/int
    row negating q's y per lane.  B is padded to the tile size
    internally; returns (L, B) tuples."""
    n = p[0].shape[1]
    pad = (-n) % TILE
    def padded(x):
        if pad:
            return jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
        return x
    pt = tuple(padded(c) for c in p)
    qt = tuple(padded(c) for c in q)
    if sign is None:
        sg = jnp.zeros((8, n + pad), jnp.uint32)
    else:
        sg = jnp.broadcast_to(
            padded(sign.astype(jnp.uint32)[None, :]), (8, n + pad))
    rx, ry, rz = _add_tiles(pt, qt, sg, interpret=interpret)
    if pad:
        rx, ry, rz = rx[:, :n], ry[:, :n], rz[:, :n]
    return rx, ry, rz


# ---------------------------------------------------------------------------
# Fused CSR accumulate: the ENTIRE per-row list walk in one kernel.
#
# The per-step accumulate path (_accumulate_pl in pcs/msm_csr.py) pays,
# per list step, one XLA gather + one transpose + one kernel launch, and
# the (L, R) accumulator makes a full HBM round trip between steps —
# ~2 KB of HBM traffic per list slot for 12 Montgomery multiplies of
# work.  Here the whole list walk runs as ONE pallas_call: the points
# are pre-gathered once into a (chunk, coords, R) tensor, the grid is
# (row_tiles, chunk_blocks) with the chunk dimension minormost, and the
# accumulator lives in the revisited output block — it stays in VMEM
# across all chunk steps of a row tile and is written back to HBM once.
# An in-kernel fori_loop walks CB list entries per grid step, so the
# trace holds exactly one point-add instance.  Bit-identical to the
# per-step path (same _rcb_add algebra; asserted in tests).
#
# Affine mode: the gathered table holds only (x, y) rows of AFFINE
# points (z = R implied, row 0 = (0, R) so that pad entries synthesize
# the identity (0 : R : 0)); z is reconstructed in-kernel from the
# entry validity, cutting the gather traffic by a third.  Used for
# pass 1, whose table (the SRS) is affine by construction.
# ---------------------------------------------------------------------------

#: list entries consumed per grid step (sublane depth of the gathered
#: block); larger CB amortizes per-grid-step overhead, VMEM block is
#: coords*CB*TILE*4 bytes (double-buffered).
CB = int(_os.environ.get("TPU_PLONK_MSM_CB", "16"))

_ONE = limbsmod.int_to_limbs(FP_MONT_R % P_MOD, L)


def _acc_kernel_factory(n_coords: int, affine: bool):
    def kernel(mod_ref, ninv_ref, one_ref, *refs):
        _consts["mod"] = mod_ref[:]
        _consts["ninv"] = ninv_ref[:]
        if _mxu():
            ninv_mat_ref, mod_mat_ref, gref, iref, ox, oy, oz = refs
            _consts["ninv_mat"] = ninv_mat_ref[:]
            _consts["mod_mat"] = mod_mat_ref[:]
        else:
            gref, iref, ox, oy, oz = refs
        m = pl.program_id(1)

        @pl.when(m == 0)
        def _():
            ox[:] = jnp.zeros_like(ox)
            oy[:] = one_ref[:]
            oz[:] = jnp.zeros_like(oz)

        one_v = one_ref[:]

        def body(j, acc):
            ax, ay, az = acc
            g = gref[:, pl.ds(j, 1), :].reshape(n_coords * L, -1)
            e = iref[pl.ds(j, 1), :]               # (1, TILE) int32
            gx = g[:L]
            gy = g[L:2 * L]
            ngy = _sub_mod(jnp.zeros_like(gy), gy)
            gy = jnp.where(e < 0, ngy, gy)
            if affine:
                gz = jnp.where(e != 0, one_v, jnp.zeros_like(one_v))
            else:
                gz = g[2 * L:]
            return _rcb_add(ax, ay, az, gx, gy, gz)

        ax, ay, az = jax.lax.fori_loop(
            0, iref.shape[0], body, (ox[:], oy[:], oz[:]))
        ox[:] = ax
        oy[:] = ay
        oz[:] = az

    return kernel


@functools.partial(jax.jit, static_argnames=("affine", "interpret"))
def _accumulate_csr_jit(table_t, idx, affine: bool, interpret=False):
    R, chunk = idx.shape
    chunkp = -(-chunk // CB) * CB
    if chunkp != chunk:
        idx = jnp.concatenate(
            [idx, jnp.zeros((R, chunkp - chunk), idx.dtype)], axis=1)
    n_coords = table_t.shape[0] // L
    rows = jnp.abs(idx).T                           # (chunkp, R)
    g = jnp.take(table_t, rows, axis=1)             # (nC*L, chunkp, R)
    idx_t = idx.T
    grid = (R // TILE, chunkp // CB)
    cspec = pl.BlockSpec((L, TILE), lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((n_coords * L, CB, TILE), lambda i, m: (0, m, i),
                         memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((CB, TILE), lambda i, m: (m, i),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((L, TILE), lambda i, m: (0, i),
                         memory_space=pltpu.VMEM)
    out_shape = tuple(jax.ShapeDtypeStruct((L, R), jnp.uint32)
                      for _ in range(3))
    mod_in = jnp.broadcast_to(
        jnp.asarray(_MOD, jnp.uint32)[:, None], (L, TILE))
    ninv_in = jnp.broadcast_to(
        jnp.asarray(_NEG_INV, jnp.uint32)[:, None], (L, TILE))
    one_in = jnp.broadcast_to(
        jnp.asarray(_ONE, jnp.uint32)[:, None], (L, TILE))
    extra_in, extra_specs = [], []
    if _mxu():
        for mat in (redc.toeplitz_split(dev.FP.neg_inv, L, L),
                    redc.toeplitz_split(P_MOD, L, 2 * L)):
            extra_in.append(jnp.asarray(mat))
            extra_specs.append(pl.BlockSpec(
                mat.shape, lambda i, m: (0, 0), memory_space=pltpu.VMEM))
    return pl.pallas_call(
        _acc_kernel_factory(n_coords, affine),
        grid=grid,
        in_specs=[cspec, cspec, cspec] + extra_specs + [gspec, ispec],
        out_specs=(ospec, ospec, ospec),
        out_shape=out_shape,
        interpret=interpret,
    )(mod_in, ninv_in, one_in, *extra_in, g, idx_t)


def accumulate_csr(table_t, idx, affine: bool, interpret=False,
                   seg_mb=None):
    """Chunked-CSR list accumulate, fused: table_t is the TRANSPOSED
    point table — (2L, P) x‖y limb rows of affine points when `affine`
    (row 0 must be (0, one_mont): the pad/identity target), or (3L, P)
    projective rows otherwise.  idx (R, M) holds signed 1-based table
    indices (0 = pad).  Returns per-row sums as three (L, R) arrays.

    The gathered tensor costs n_coords*L*4 bytes per list slot in HBM;
    rows are processed in segments bounded by TPU_PLONK_MSM_SEG_MB
    (default 2048) so 2^20+ MSMs never materialize a >2 GB gather."""
    R0, chunk = idx.shape
    idx = jnp.asarray(idx)
    R = -(-R0 // TILE) * TILE
    if R != R0:
        idx = jnp.concatenate(
            [idx, jnp.zeros((R - R0, chunk), idx.dtype)], axis=0)
    if seg_mb is None:
        seg_mb = int(_os.environ.get("TPU_PLONK_MSM_SEG_MB", "2048"))
    n_coords = table_t.shape[0] // L
    chunkp = -(-chunk // CB) * CB
    bytes_per_row = chunkp * (n_coords * L + 1) * 4
    seg_rows = max(TILE,
                   (seg_mb * (1 << 20) // bytes_per_row) // TILE * TILE)
    if R <= seg_rows:
        ox, oy, oz = _accumulate_csr_jit(table_t, idx, affine, interpret)
        return ox[:, :R0], oy[:, :R0], oz[:, :R0]
    n_seg = -(-R // seg_rows)
    seg = -(-R // n_seg // TILE) * TILE
    if n_seg * seg != R:
        idx = jnp.concatenate(
            [idx, jnp.zeros((n_seg * seg - R, chunk), idx.dtype)], axis=0)
    outs = [_accumulate_csr_jit(table_t, idx[s * seg:(s + 1) * seg],
                                affine, interpret)
            for s in range(n_seg)]
    ox = jnp.concatenate([o[0] for o in outs], axis=1)
    oy = jnp.concatenate([o[1] for o in outs], axis=1)
    oz = jnp.concatenate([o[2] for o in outs], axis=1)
    return ox[:, :R0], oy[:, :R0], oz[:, :R0]


def add(p, q, interpret=False):
    """Batched complete add via the fused kernel, standard layout:
    p, q tuples of (..., 24) u32 Montgomery projective coords
    (broadcast-compatible); bit-exact drop-in for device_g1.add."""
    shape = jnp.broadcast_shapes(p[0].shape, q[0].shape)
    batch = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    pt = tuple(jnp.broadcast_to(c, shape).reshape(batch, L).T for c in p)
    qt = tuple(jnp.broadcast_to(c, shape).reshape(batch, L).T for c in q)
    rx, ry, rz = add_t(pt, qt, interpret=interpret)
    return tuple(x.T.reshape(shape) for x in (rx, ry, rz))
