"""MXU-native NTT: the radix-R DFT step as int8 matrix multiplication
(experimental flagship kernel; ROADMAP.md #1/#6).

Idea: a size-R NTT block is  y_k = sum_j W[k,j] * x_j  — a *shared*
contraction over j, unlike the butterfly formulation whose field
multiplies are elementwise.  Decompose field elements into 7-bit digits
(int8-exact), and the whole block becomes ONE int8 matmul with exact
int32 accumulation:

    V[k*Dc + c, col] = sum_{j, b} W2[k*Dc + c, j*Dx + b] * Xd[j*Dx + b, col]
    W2[k*Dc + c, j*Dx + b] = digit_{c-b}(W[k,j])      (Toeplitz in c-b)

so V's columns are the base-2^7 convolution columns of sum_j W*x.
Montgomery reduction of the (R * q^2)-sized sums also becomes int8
matmuls: m = T_lo (*) q' and m*q are convolutions with *constant*
kernels = matmuls against precomputed Toeplitz matrices.  The only
elementwise work left is digit renormalization (carry passes).

Values stay lazily reduced (< 2^256 < 4.6q) between levels; the W
constants absorb both the Montgomery factor 2^DR7*7 and lazy bounds.
Exactness invariants (int8 in, int32 accumulate):
    products <= 127^2; contraction depth <= R*Dx = 512*38 -> sums
    <= 3.2e8 < 2^31.

Four-step composition (n = R*C) reuses the existing Montgomery
elementwise multiply only at the single twiddle boundary.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..params import R_MOD, FR_MONT_R
from ..fields import limbs as limbs_mod
from ..fields import device as dev
from .domain import Domain

D7 = 7                 # digit width (int8-exact products)
DX = 38                # digits per operand (covers 2^266 > lazy bound 2^256)
DR = 39                # digits of the Montgomery radix R' = 2^(39*7) = 2^273
DC = DX + 37 - 1 + 2   # product columns kept (operand conv + headroom)
RPRIME_BITS = DR * D7  # 273


def _int_digits(v: int, count: int) -> np.ndarray:
    return np.array([(v >> (D7 * i)) & 0x7F for i in range(count)],
                    dtype=np.int8)


# ---------------------------------------------------------------------------
# host-side constant construction (cached per radix)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _redc_mats():
    """Toeplitz kernels for the matmul-REDC:
    M_QP (DR, DR): m = T_lo (*) (-q^-1 mod 2^273), low DR columns
    M_Q  (DR, DR+37): m (*) q, full columns."""
    qp = (-pow(R_MOD, -1, 1 << RPRIME_BITS)) % (1 << RPRIME_BITS)
    qp_d = _int_digits(qp, DR)
    q_d = _int_digits(R_MOD, 37)
    m_qp = np.zeros((DR, DR), dtype=np.int8)
    for b in range(DR):
        for c in range(b, DR):
            if c - b < DR:
                m_qp[b, c] = qp_d[c - b]
    n_out = DR + 37
    m_q = np.zeros((DR, n_out), dtype=np.int8)
    for b in range(DR):
        for c in range(b, min(b + 37, n_out)):
            m_q[b, c] = q_d[c - b]
    return m_qp, m_q


@functools.lru_cache(maxsize=None)
def _dft_matrix(radix: int, log_n: int, level: int,
                inverse: bool = False, col_scale: int = 1,
                row_scale: int = 1, dx: int = DX, dc: int = DC):
    """W2 for one four-step level, int8 (radix*dc, radix*dx).

    W[k,j] = w_R^(+-kj) * 2^273  (Montgomery-compensated; the 2^273
    cancels this level's REDC' division).  The inverse transform's
    1/n factor is folded into the outer (level 1) matrix.

    col_scale/row_scale fold a geometric input/output scaling into the
    constants — W[k,j] *= col_scale^j * row_scale^k — which is how
    coset/phase-coset transforms avoid a separate full-array Montgomery
    multiply (the scale a^j of x[j], j = n1 + C*n2, separates into
    (a^C)^n2 on this matrix's columns plus a^n1 on the twiddle table).

    dx/dc widen the per-element digit strides (extra positions are zero
    rows/columns — exact) so the fused-kernel path can use 8-aligned
    blocks (ntt_mxu_pl.py)."""
    n = 1 << log_n
    dom = Domain(radix)
    omega = dom.omega_inv if inverse else dom.omega
    comp = (1 << RPRIME_BITS) % R_MOD
    if inverse and level == 1:
        comp = comp * pow(n, -1, R_MOD) % R_MOD
    # W[k, j] canonical, pre-multiplied by the REDC' compensation
    w2 = np.zeros((radix * dc, radix * dx), dtype=np.int8)
    wd = np.zeros((radix, radix, 37), dtype=np.int8)
    pw = [pow(omega, k, R_MOD) for k in range(radix)]
    cpw = [pow(col_scale, j, R_MOD) for j in range(radix)]
    rpw = [pow(row_scale, k, R_MOD) for k in range(radix)]
    for k in range(radix):
        for j in range(radix):
            val = pw[(k * j) % radix] * comp % R_MOD
            val = val * cpw[j] % R_MOD * rpw[k] % R_MOD
            wd[k, j] = _int_digits(val, 37)
    for b in range(DX):
        # W2[k*dc + (b..b+37), j*dx + b] = wd[k, j, :]
        for k in range(radix):
            w2[k * dc + b: k * dc + b + 37,
               np.arange(radix) * dx + b] = wd[k].T
    return jnp.asarray(w2)


@functools.lru_cache(maxsize=None)
def _twiddle_table(log_n: int, radix: int, inverse: bool,
                   row_scale: int = 1, col_scale: int = 1):
    """(C, R) Montgomery-premultiplied twiddles w_N^(n1*k1) * 2^256,
    so mont_mul(plain_x, table) = plain product (16-limb arrays).
    row_scale/col_scale fold geometric input/output scalings:
    entry[n1, k1] *= row_scale^n1 * col_scale^k1 (see _dft_matrix)."""
    n = 1 << log_n
    c = n // radix
    dom = Domain(n)
    w = dom.omega_inv if inverse else dom.omega
    rows = []
    for n1 in range(c):
        base = pow(w, n1, R_MOD) * col_scale % R_MOD
        acc = pow(row_scale, n1, R_MOD)
        vals = []
        for _ in range(radix):
            vals.append(acc * FR_MONT_R % R_MOD)
            acc = acc * base % R_MOD
        rows.append(limbs_mod.ints_to_limbs(vals, 16))
    return jnp.asarray(np.stack(rows))  # (C, R, 16)


# ---------------------------------------------------------------------------
# device digit plumbing
# ---------------------------------------------------------------------------


def limbs_to_digits(x):
    """(batch, 16) u16 limbs -> (batch, DX) int8 7-bit digits."""
    outs = []
    zero = jnp.zeros_like(x[:, 0])
    for d in range(DX):
        lo_bit = D7 * d
        j, s = lo_bit >> 4, lo_bit & 15
        w = x[:, j] >> s
        if s > 9 and j + 1 < 16:
            w = w | (x[:, j + 1] << (16 - s))
        if lo_bit >= 256:
            w = zero
        outs.append((w & 0x7F).astype(jnp.int8))
    return jnp.stack(outs, axis=-1)


def digits_to_limbs(d):
    """(batch, D) int8 digits (values < 2^256) -> (batch, 16) u16."""
    nd = d.shape[-1]
    du = d.astype(jnp.uint32)
    cols = [jnp.zeros_like(du[:, 0]) for _ in range(17)]
    for i in range(nd):
        lo_bit = D7 * i
        j, s = lo_bit >> 4, lo_bit & 15
        if j < 16:
            cols[j] = cols[j] + (du[:, i] << s)
    stacked = jnp.stack(cols[:16], axis=-1)
    return dev._carry_array(stacked)


def renorm(cols, n_out: int):
    """int32 convolution columns (NONNEGATIVE, < 2^31) -> n_out 7-bit
    digits (int8), log-depth.

    The naive formulation is an n_out-step sequential carry ripple —
    ~80 dependent VPU ops per call, three calls per DFT level; it
    dominated the 2^22 NTT (ROADMAP #2).  Instead:
      1. four shift-add passes  x_i <- (x_i & 127) + (x_{i-1} >> 7)
         shrink every column 31 -> 24 -> 17 -> 10 -> <8 bits
         (bound: 127 + B/128 each pass), after which carries are 0/1;
      2. a Kogge-Stone generate/propagate prefix (ceil(log2 n_out)
         doubling steps) resolves the remaining 1-bit carry chain
         exactly: g_i = x_i >> 7, p_i = (x_i & 127 == 127).
    ~15 parallel steps total, and O(log) trace size.  High bits beyond
    position n_out-1 are dropped, as in the ripple formulation (callers
    size n_out so values fit)."""
    nc = cols.shape[-1]
    x = cols.astype(jnp.int32)
    if nc < n_out:
        x = jnp.pad(x, ((0, 0), (0, n_out - nc)))
    else:
        x = x[:, :n_out]

    def shift1(a):
        """a shifted one digit position up (a_{i-1} at i; 0 at i=0)."""
        return jnp.pad(a, ((0, 0), (1, 0)))[:, :n_out]

    for _ in range(4):
        x = (x & 0x7F) + shift1(x >> D7)
    # now 0 <= x_i <= 136: carries are single bits
    g = x >> D7
    p = (x & 0x7F) == 0x7F
    sh = 1
    while sh < n_out:
        g = g | (p & shift_digits(g, sh, n_out))
        p = p & shift_digits(p, sh, n_out)
        sh <<= 1
    carry_in = shift1(g)
    return ((x + carry_in) & 0x7F).astype(jnp.int8)


def shift_digits(a, k: int, n_out: int):
    """a shifted k digit positions up along the last axis (zeros/False
    shifted in at the bottom)."""
    pad_val = False if a.dtype == jnp.bool_ else 0
    return jnp.pad(a, ((0, 0), (k, 0)),
                   constant_values=pad_val)[:, :n_out]


def _i8mm(a, b):
    """Exact int8 x int8 -> int32 matmul."""
    return jax.lax.dot_general(
        a.astype(jnp.int8), b.astype(jnp.int8),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def redc_digits(t_digits):
    """Matmul-REDC': T (batch, >=DR+37 digits, value < 2^528) ->
    (batch, DX) digits of T * 2^-273 mod q, lazily reduced (< 2^256)."""
    m_qp, m_q = _redc_mats()
    t_lo = t_digits[:, :DR]
    m_cols = _i8mm(t_lo, jnp.asarray(m_qp))
    m = renorm(m_cols, DR)
    mq_cols = _i8mm(m, jnp.asarray(m_q))
    n_cols = max(t_digits.shape[-1], mq_cols.shape[-1])
    t_pad = jnp.pad(t_digits.astype(jnp.int32),
                    ((0, 0), (0, n_cols - t_digits.shape[-1])))
    mq_pad = jnp.pad(mq_cols, ((0, 0), (0, n_cols - mq_cols.shape[-1])))
    u = renorm(t_pad + mq_pad, n_cols + 4)
    return u[:, DR:DR + DX]


def dft_level(x_digits, w2, radix: int):
    """One DFT level over all columns.
    x_digits: (radix, ncols, DX) -> (radix, ncols, DX) lazily-reduced
    digit outputs (value = 2^-273-compensated sum, i.e. exact since W2
    carries the 2^273)."""
    ncols = x_digits.shape[1]
    rhs = jnp.transpose(x_digits, (0, 2, 1)).reshape(radix * DX, ncols)
    v = _i8mm(w2, rhs)                       # (radix*DC, ncols)
    v = v.reshape(radix, DC, ncols)
    v = jnp.transpose(v, (0, 2, 1)).reshape(radix * ncols, DC)
    t = renorm(v, DR + 37 + 4)
    out = redc_digits(t)
    return out.reshape(radix, ncols, DX)


# ---------------------------------------------------------------------------
# four-step MXU NTT (n = radix * C, C = n / radix)
# ---------------------------------------------------------------------------


#: fuse each DFT level's digit pipeline (renorm -> REDC' -> renorm)
#: into one Pallas kernel (ntt_mxu_pl.py) — as XLA ops the chain makes
#: ~15 HBM passes over the matmul columns per level.  DEFAULT ON for
#: TPU since it measured 1131 ms vs 3598 ms @ 2^22, oracle_ok
#: (bench_results/ntt_probe.json, VERDICT r2 #3); CPU keeps the jnp
#: path (interpret-mode Pallas is test-only).  Tri-state: None = auto
#: (env var TPU_PLONK_NTT_PALLAS overrides, else backend-based); tests
#: monkeypatch it to True to exercise the kernel in interpret mode.
import os as _os
NTT_PALLAS = None


def _ntt_pallas_default() -> bool:
    if NTT_PALLAS is not None:
        return NTT_PALLAS
    env = _os.environ.get("TPU_PLONK_NTT_PALLAS")
    if env is not None:
        return env not in ("", "0")
    return jax.default_backend() not in ("cpu",)


@functools.lru_cache(maxsize=None)
def _jitted_mxu(log_n: int, radix: int, inverse: bool = False,
                batch: int = 1, use_pl: bool = False):
    """With batch B > 1, transforms B independent size-n vectors in one
    program — the batch widens the matmul column dimension (ncols =
    B*C / B*R), which the MXU eats for free.  This is what makes the
    3-level composition in poly/ntt.ntt_4step work at 2^20+: sub-size
    2^10-2^11 keeps each W2 at a few MB instead of the quadratic 3-12
    GB a single 2-level decomposition would need.

    use_pl routes each level through the fused digit-pipeline kernel
    (padded digit stride DXP; the extra positions hold zeros)."""
    n = 1 << log_n
    c = n // radix
    B = batch

    if use_pl:
        from . import ntt_mxu_pl as mpl
        DXP = mpl.DXP

        # Fully transposed digit flow: digits ride the sublane axis of
        # (rows*DXP, cols) int8 arrays end to end; each level and the
        # twiddle boundary is one fused kernel.  Index math mirrors the
        # jnp path below exactly (bit-identity asserted in tests).
        @jax.jit
        def run_pl(x, w2_inner, w2_outer, tw):
            a = limbs_to_digits(x.reshape(B * n, 16))
            a = jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (DXP - DX,), a.dtype)],
                axis=-1)
            a = a.reshape(B, radix, c, DXP)
            a = jnp.transpose(a, (1, 3, 0, 2))       # (radix, DXP, B, c)
            rhs = a.reshape(radix * DXP, B * c)      # cols (b, n1)
            d1 = mpl.dft_level_pl_t(rhs, w2_inner, radix)
            twr = jnp.transpose(tw, (1, 2, 0)).reshape(radix * 16, c)
            d2 = mpl.twiddle_pl(d1, twr, c)
            # four-step regroup: element (k, b, n1) -> row n1*DXP+d,
            # col b*radix+k
            t3 = d2.reshape(radix, DXP, B, c)
            rhs2 = jnp.transpose(t3, (3, 1, 2, 0)).reshape(
                c * DXP, B * radix)
            d3 = mpl.dft_level_pl_t(rhs2, w2_outer, c)
            xo = jnp.transpose(d3.reshape(c, DXP, B, radix),
                               (2, 0, 3, 1))         # (B, c, radix, DXP)
            out = digits_to_limbs(xo.reshape(B * n, DXP))
            out = dev.sub_mod(out, jnp.zeros_like(out), dev.FR)
            return _canonical(out).reshape(B, n, 16)

        return run_pl

    # constants passed as runtime arguments, NOT closed-over trace
    # constants: a trace-embedded 50-750MB W2 blows past the remote
    # compiler's request-size limit (and bloats the executable).
    @jax.jit
    def run(x, w2_inner, w2_outer, tw):
        # x: (B, n, 16) u16 Montgomery limbs, A_b[n2][n1] = x_b[n1+C*n2]
        a = limbs_to_digits(x.reshape(B * n, 16))
        a = a.reshape(B, radix, c, DX)
        a = jnp.transpose(a, (1, 0, 2, 3)).reshape(radix, B * c, DX)
        b = dft_level(a, w2_inner, radix)                # DFT_R over rows
        # twiddle boundary: digits -> limbs, mont-mul, -> digits
        b_limbs = digits_to_limbs(b.reshape(radix * B * c, DX))
        b_limbs = b_limbs.reshape(radix, B, c, 16)
        tw_t = jnp.transpose(tw, (1, 0, 2))              # (R, C, 16)
        b_limbs = dev.mont_mul(b_limbs, tw_t[:, None], dev.FR)
        bt = limbs_to_digits(b_limbs.reshape(radix * B * c, 16))
        bt = bt.reshape(radix, B, c, DX)
        bt = jnp.transpose(bt, (2, 1, 0, 3)).reshape(c, B * radix, DX)
        xo = dft_level(bt, w2_outer, c)                  # DFT_C
        xo = xo.reshape(c, B, radix, DX)
        xo = jnp.transpose(xo, (1, 0, 2, 3))             # (B, C, R, DX)
        out = digits_to_limbs(xo.reshape(B * n, DX))
        # canonicalize: lazily-reduced (< 2^256) -> [0, q)
        out = dev.sub_mod(out, jnp.zeros_like(out), dev.FR)
        return _canonical(out).reshape(B, n, 16)

    return run


def _canonical(x):
    """Reduce values < 2^256 (< 4.6q) into [0, q): 3 conditional
    subtractions."""
    for _ in range(3):
        d, borrow = dev._sub_array(
            x, jnp.broadcast_to(jnp.asarray(dev.FR.mod_limbs,
                                            jnp.uint32), x.shape))
        x = jnp.where((borrow == 0)[..., None], d, x)
    return x


def ntt_mxu(x, log_n: int, radix: int = None, inverse: bool = False,
            in_scale: int = 1, out_scale: int = 1):
    """(i)NTT via MXU DFT levels; x (n,16) Montgomery limbs in natural
    order -> transform in natural order (iNTT includes the 1/n)."""
    return ntt_mxu_batched(x[None], log_n, radix, inverse,
                           in_scale, out_scale)[0]


def ntt_mxu_batched(x, log_n: int, radix: int = None,
                    inverse: bool = False, in_scale: int = 1,
                    out_scale: int = 1, use_pl: bool = None):
    """Batched (i)NTT: x (B, n, 16) -> (B, n, 16), each row transformed
    independently (natural order both ways; iNTT includes the 1/n).

    in_scale a: transforms x[j] * a^j (coset/phase-coset evaluation)
    out_scale s: scales output k by s^k (coset-inverse recovery)
    — both folded into the precomputed constants at ZERO runtime cost:
    with j = n1 + C*n2 and k = k1 + R*k2, a^j = a^n1 * (a^C)^n2 and
    s^k = s^k1 * (s^R)^k2 land on the twiddle table's rows/columns and
    the inner/outer DFT matrices' columns/rows respectively."""
    n = 1 << log_n
    if radix is None:
        radix = 1 << (log_n - log_n // 2)
    c = n // radix
    in_scale %= R_MOD
    out_scale %= R_MOD
    if use_pl is None:
        use_pl = _ntt_pallas_default()
    if use_pl:
        from .ntt_mxu_pl import DXP, DCP
        dxw, dcw = DXP, DCP
    else:
        dxw, dcw = DX, DC
    run = _jitted_mxu(log_n, radix, inverse, batch=x.shape[0],
                      use_pl=use_pl)
    return run(x,
               _dft_matrix(radix, log_n, 0, inverse,
                           col_scale=pow(in_scale, c, R_MOD),
                           dx=dxw, dc=dcw),
               _dft_matrix(c, log_n, 1, inverse,
                           row_scale=pow(out_scale, radix, R_MOD),
                           dx=dxw, dc=dcw),
               _twiddle_table(log_n, radix, inverse,
                              row_scale=in_scale, col_scale=out_scale))
