"""Fused digit-pipeline Pallas kernel for the MXU NTT (opt-in).

Each DFT level of the MXU NTT (ntt_mxu.dft_level) is one big int8
matmul followed by a chain of elementwise digit work: renormalize the
int32 convolution columns to 7-bit digits, two small Toeplitz
convolutions (REDC': m = T_lo * (-q^-1), then m*q), and two more
renormalizations.  As separate XLA ops that chain makes ~15 full
passes over (radix*DC, ncols) int32 arrays in HBM (~1.3 GB each at
2^22) — the measured dominator of the large-size NTT (ROADMAP #2; the
MXU matmuls themselves are ~4 ms/level).

This kernel runs the ENTIRE post-matmul pipeline per (DFT-row-block,
column-tile) in VMEM: HBM sees one read of the matmul output and one
int8 write of the next level's input digits.  The small REDC
convolutions run as unrolled shift-MACs on the VPU (39/37 terms with
compile-time-constant digit scalars) — at these sizes they are not
worth an MXU trip.

Layout: digits ride the SUBLANE axis (static shifts = sublane concats,
which Mosaic lowers natively — the same lesson as curves/pallas_g1),
columns the lane axis.  Digit strides are padded to 8-aligned DXP=40 /
DCP=80 (the padded matrix columns/rows are zeros — exact; see
ntt_mxu._dft_matrix dx/dc).

Bit-exactness vs the jnp pipeline is asserted in tests
(tests/test_ntt_mxu.py, interpret mode on CPU).  Enable on the real
chip with TPU_PLONK_NTT_PALLAS=1.

Reference analog: dusk-plonk `fft/` serial radix-2 FFT (SURVEY.md
§2.6); this is the TPU-native scale path's inner loop.
"""

import functools
import os as _os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import R_MOD
from .ntt_mxu import D7, DX, DR, _int_digits, _i8mm

DXP = 40           # padded digits-per-operand stride (DX=38 -> 8-aligned)
DCP = 80           # padded product-column stride (DC=77 -> 8-aligned)

#: column-tile width (lanes) per kernel instance
TILE = int(_os.environ.get("TPU_PLONK_NTT_TILE", "512"))

_QP_DIGITS = tuple(int(v) for v in _int_digits(
    (-pow(R_MOD, -1, 1 << (DR * D7))) % (1 << (DR * D7)), DR))
_Q_DIGITS = tuple(int(v) for v in _int_digits(R_MOD, 37))


def _shift1(a):
    """Rows shifted one digit position up (row i gets a[i-1], 0 at 0)."""
    return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)


def _shiftk(a, k):
    if k == 0:
        return a
    return jnp.concatenate([jnp.zeros_like(a[:k]), a[:-k]], axis=0)


def _renorm0(x, n_out: int):
    """ntt_mxu.renorm with the digit axis on axis 0 (sublanes):
    nonnegative int32 convolution columns -> n_out 7-bit digit rows.
    Same algebra (4 shrink passes + Kogge-Stone carry resolve)."""
    d = x.shape[0]
    x = x.astype(jnp.int32)
    if d < n_out:
        x = jnp.concatenate(
            [x, jnp.zeros((n_out - d,) + x.shape[1:], jnp.int32)], axis=0)
    elif d > n_out:
        x = x[:n_out]
    for _ in range(4):
        x = (x & 0x7F) + _shift1(x >> D7)
    g = x >> D7
    # propagate flag as int32 from the start: shifting/concatenating an
    # i1 vector makes Mosaic emit an invalid i1->i32 vreg bitcast (the
    # same rule pallas_fr._carry/_sub already follow)
    p = ((x & 0x7F) == 0x7F).astype(jnp.int32)
    sh = 1
    while sh < n_out:
        g = g | (p & _shiftk(g, sh))
        p = p & _shiftk(p, sh)
        sh <<= 1
    return (x + _shift1(g)) & 0x7F


def _conv_const(t, digits, n_out: int):
    """Toeplitz shift-MAC: out[c] = sum_b t[b] * digits[c-b], rows on
    axis 0, compile-time-constant 7-bit digit scalars.  Values stay
    < 2^19 (<= DR terms of 127*127) — exact in int32."""
    d_in = t.shape[0]
    acc = jnp.zeros((n_out,) + t.shape[1:], jnp.int32)
    for s, dig in enumerate(digits):
        if dig == 0 or s >= n_out:
            continue
        w = min(d_in, n_out - s)
        # Mosaic rejects zero-sized vector types — emit only the
        # nonempty segments (s == 0 or an exact-fit tail are both
        # legal shift values here).
        parts = []
        if s:
            parts.append(jnp.zeros((s,) + t.shape[1:], jnp.int32))
        parts.append(t[:w].astype(jnp.int32))
        if n_out - s - w:
            parts.append(
                jnp.zeros((n_out - s - w,) + t.shape[1:], jnp.int32))
        seg = parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                               axis=0)
        acc = acc + seg * np.int32(dig)
    return acc


def _pipeline_kernel(v_ref, o_ref):
    """One (DCP, TILE) block of matmul output -> (DXP, TILE) int8
    digits of the REDC'-reduced value (rows DX.. are zero)."""
    v = v_ref[:]
    # t: DR+37+4 = 80 digit rows (exactly DCP)
    t = _renorm0(v, DCP)
    m_cols = _conv_const(t[:DR], _QP_DIGITS, DR)
    m = _renorm0(m_cols, DR)
    mq = _conv_const(m, _Q_DIGITS, DR + 37)
    n_cols = DCP
    mq_pad = jnp.concatenate(
        [mq, jnp.zeros((n_cols - (DR + 37),) + mq.shape[1:], jnp.int32)],
        axis=0)
    u = _renorm0(t + mq_pad, n_cols + 8)
    out = u[DR:DR + DX]
    out = jnp.concatenate(
        [out, jnp.zeros((DXP - DX,) + out.shape[1:], jnp.int32)], axis=0)
    o_ref[:] = out.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("radix", "interpret"))
def _digit_pipeline(v, radix: int, interpret=False):
    """(radix*DCP, ncols) int32 matmul columns -> (radix*DXP, ncols)
    int8 digits (the next level's rhs), whole pipeline fused."""
    ncols = v.shape[1]
    ncp = -(-ncols // TILE) * TILE
    if ncp != ncols:
        v = jnp.concatenate(
            [v, jnp.zeros((v.shape[0], ncp - ncols), v.dtype)], axis=1)
    grid = (radix, ncp // TILE)
    out = pl.pallas_call(
        _pipeline_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((DCP, TILE), lambda k, j: (k, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((DXP, TILE), lambda k, j: (k, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((radix * DXP, ncp), jnp.int8),
        interpret=interpret,
    )(v)
    return out[:, :ncols]


def dft_level_pl(x_digits, w2p, radix: int, interpret=None):
    """ntt_mxu.dft_level with padded strides and the fused pipeline:
    x_digits (radix, ncols, DXP) int8 -> same shape, lazily-reduced
    outputs.  w2p must be built with dx=DXP, dc=DCP."""
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    ncols = x_digits.shape[1]
    rhs = jnp.transpose(x_digits, (0, 2, 1)).reshape(radix * DXP, ncols)
    out = dft_level_pl_t(rhs, w2p, radix, interpret=interpret)
    return jnp.transpose(out.reshape(radix, DXP, ncols), (0, 2, 1))


def dft_level_pl_t(rhs_t, w2p, radix: int, interpret=None):
    """Transposed-layout level: rhs_t (radix*DXP, ncols) int8 (digit d
    of DFT-row k at row k*DXP+d) -> same shape.  The whole digit flow
    stays in this layout — no per-level transposes."""
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    v = _i8mm(w2p, rhs_t)                    # (radix*DCP, ncols) int32
    return _digit_pipeline(v, radix, interpret=interpret)


# ---------------------------------------------------------------------------
# Fused twiddle boundary: digits -> limbs -> Montgomery multiply by the
# per-(k, n1) twiddle -> digits, one kernel.  As XLA ops this boundary
# is digits_to_limbs + dev.mont_mul (whose variable*variable Comba is a
# 16-step lax.scan with HBM round-trips) + limbs_to_digits — the most
# HBM-expensive non-DFT stage of the MXU NTT.  Reuses the in-kernel Fr
# Montgomery multiply from fields/pallas_fr.py (same split-byte Comba /
# Kogge-Stone algebra as dev.mont_mul — bit-exact).
# ---------------------------------------------------------------------------

from ..fields import pallas_fr as _pfr


def _tw_kernel_factory(c: int, tile: int):
    def kernel(mod_ref, ninv_ref, *refs):
        _pfr._consts["mod"] = mod_ref[:]
        _pfr._consts["ninv"] = ninv_ref[:]
        if _pfr.MXU:
            ninv_mat_ref, mod_mat_ref, tw_ref, d_ref, o_ref = refs
            _pfr._consts["ninv_mat"] = ninv_mat_ref[:]
            _pfr._consts["mod_mat"] = mod_mat_ref[:]
        else:
            tw_ref, d_ref, o_ref = refs
        du = d_ref[:].astype(jnp.uint32)         # (DXP, T), values 0..127
        # digits -> 16 limb rows (mirror of ntt_mxu.digits_to_limbs:
        # each 16-bit column collects <= 3 shifted 7-bit digits < 2^24,
        # then one Kogge-Stone carry pass).  Grouped per target limb as
        # explicit sums + one concatenate: `.at[j].add` lowers to
        # scatter-add, which Mosaic cannot lower (the mapping i -> limb
        # j = 7i >> 4 is static and exclusive, so this is the same sum).
        limb_rows = []
        for j in range(16):
            terms = [du[i:i + 1] << (D7 * i & 15)
                     for i in range(DXP)
                     if D7 * i < 256 and (D7 * i) >> 4 == j]
            # every limb j has >=1 contributor for D7=7/DXP=40; a
            # future stride change must not fail with a bare IndexError
            assert terms, (
                f"no digit contributes to limb {j}: D7={D7} DXP={DXP} "
                "stride change broke the digit->limb mapping")
            row = terms[0]
            for t_ in terms[1:]:
                row = row + t_
            limb_rows.append(row)
        x = _pfr._carry(jnp.concatenate(limb_rows, axis=0))
        tw_tile = tw_ref[:]
        if tile > c:
            tw_tile = jnp.concatenate([tw_tile] * (tile // c), axis=1)
        t = _pfr._mont_mul_cols(x, tw_tile)
        # limbs -> digits (mirror of ntt_mxu.limbs_to_digits)
        rows = []
        for d in range(DXP):
            lo = D7 * d
            j, s = lo >> 4, lo & 15
            if lo >= 256:
                rows.append(jnp.zeros_like(t[:1]))
                continue
            w = t[j:j + 1] >> s
            if s > 9 and j + 1 < 16:
                w = w | (t[j + 1:j + 2] << (16 - s))
            rows.append(w & 0x7F)
        o_ref[:] = jnp.concatenate(rows, axis=0).astype(jnp.int8)

    return kernel


@functools.partial(jax.jit, static_argnames=("c", "interpret"))
def twiddle_pl(d, twr, c: int, interpret=None):
    """d (radix*DXP, ncols) int8 digits of lazily-reduced values
    (< 2^256); twr (radix*16, c) u32 Montgomery twiddle limbs, entry
    [k*16+limb, n1] for element columns ordered (b, n1) — i.e. the
    twiddle of column `col` in row-block k is twr[k, col % c].
    Returns the digit array of value * twiddle * 2^-256 mod q — the
    exact algebra of the jnp boundary (digits_to_limbs -> dev.mont_mul
    -> limbs_to_digits), fused."""
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    radix = d.shape[0] // DXP
    ncols = d.shape[1]
    ncp = -(-ncols // TILE) * TILE
    if ncp != ncols:
        d = jnp.concatenate(
            [d, jnp.zeros((d.shape[0], ncp - ncols), d.dtype)], axis=1)
    grid = (radix, ncp // TILE)
    if c <= TILE:
        assert TILE % c == 0
        twspec = pl.BlockSpec((16, c), lambda k, j: (k, 0),
                              memory_space=pltpu.VMEM)
    else:
        assert c % TILE == 0
        twspec = pl.BlockSpec((16, TILE), lambda k, j: (k, j % (c // TILE)),
                              memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((16, TILE), lambda k, j: (0, 0),
                         memory_space=pltpu.VMEM)
    mod_in = jnp.broadcast_to(
        jnp.asarray(_pfr._MOD, jnp.uint32)[:, None], (16, TILE))
    ninv_in = jnp.broadcast_to(
        jnp.asarray(_pfr._NEG_INV, jnp.uint32)[:, None], (16, TILE))
    extra_in, extra_specs = [], []
    if _pfr.MXU:
        from ..fields import pallas_redc as _redc
        from ..fields import device as _dev
        for mat in (_redc.toeplitz_split(_dev.FR.neg_inv, 16, 16),
                    _redc.toeplitz_split(R_MOD, 16, 32)):
            extra_in.append(jnp.asarray(mat))
            extra_specs.append(pl.BlockSpec(
                mat.shape, lambda k, j: (0, 0), memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        _tw_kernel_factory(c, TILE),
        grid=grid,
        in_specs=([cspec, cspec] + extra_specs
                  + [twspec,
                     pl.BlockSpec((DXP, TILE), lambda k, j: (k, j),
                                  memory_space=pltpu.VMEM)]),
        out_specs=pl.BlockSpec((DXP, TILE), lambda k, j: (k, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((radix * DXP, ncp), jnp.int8),
        interpret=interpret,
    )(mod_in, ninv_in, *extra_in, twr, d)
    return out[:, :ncols]
