"""BLS12-381 optimal ate pairing (host CPU — verifier only).

The verifier does 2 pairings per proof (SURVEY.md §3.3), so clarity wins
over micro-optimization: the Miller loop runs in *affine Fp12
coordinates* after untwisting G2, and the hard part of the final
exponentiation is a plain exponentiation by (p^4 - p^2 + 1)/r.

Untwist (M-twist, xi = u+1, w^2 = v, w^6 = xi):
    psi(x', y') = (x' * w^-2, y' * w^-3)
which lands on Y^2 = X^3 + 4 over Fp12.
"""

from ..params import P_MOD, R_MOD, BLS_X
from ..fields import fp
from ..fields.fp import (
    F12_ONE, f12_mul, f12_sqr, f12_inv, f12_conj, f12_frobenius, f12_pow,
    f12_cyclo_pow,
    f2_add, f2_sub, f2_mul, f2_sqr,
    f6_mul, f6_add, f6_sub, f6_mul_by_nonresidue,
)

# --- Fp12 helpers for sparse embeddings -------------------------------------


def _f12_from_f2(c, pos):
    """Embed an Fp2 element at basis position w^pos (0 <= pos < 6),
    where Fp12 = Fp2[w]/(w^6 - xi) viewed through the (Fp6, Fp6) repr:
    1, w, w^2=v, w^3=v*w, w^4=v^2, w^5=v^2*w."""
    c0 = [fp.F2_ZERO, fp.F2_ZERO, fp.F2_ZERO]
    c1 = [fp.F2_ZERO, fp.F2_ZERO, fp.F2_ZERO]
    if pos % 2 == 0:
        c0[pos // 2] = c
    else:
        c1[pos // 2] = c
    return (tuple(c0), tuple(c1))


_W_NEG2 = f12_inv(_f12_from_f2(fp.F2_ONE, 2))  # w^-2
_W_NEG3 = f12_inv(_f12_from_f2(fp.F2_ONE, 3))  # w^-3


def _untwist(q):
    """G2 affine (Fp2 coords) -> affine point on Y^2 = X^3 + 4 over Fp12."""
    x, y = q
    return (
        f12_mul(_f12_from_f2(x, 0), _W_NEG2),
        f12_mul(_f12_from_f2(y, 0), _W_NEG3),
    )


def _f12_from_fp(a):
    return _f12_from_f2((a % P_MOD, 0), 0)


def _f12_add(a, b):
    return (fp.f6_add(a[0], b[0]), fp.f6_add(a[1], b[1]))


def _f12_sub(a, b):
    return (fp.f6_sub(a[0], b[0]), fp.f6_sub(a[1], b[1]))


def _f12_scale_int(a, k):
    k %= P_MOD
    return tuple(tuple(tuple(x * k % P_MOD for x in c2) for c2 in c6) for c6 in a)


# --- Miller loop ------------------------------------------------------------


def _line(t, q, p_aff):
    """Evaluate the line through Fp12 points t,q (t==q -> tangent) at the
    G1 point p = (xp, yp); returns (line_value, t+q)."""
    (x1, y1), (x2, y2) = t, q
    xp, yp = p_aff
    if x1 == x2 and y1 == y2:
        # tangent: lam = 3 x1^2 / 2 y1
        num = _f12_scale_int(f12_mul(x1, x1), 3)
        den = _f12_scale_int(y1, 2)
    else:
        if x1 == x2:
            # vertical line x - x1
            line = _f12_sub(_f12_from_fp(xp), x1)
            return line, None
        num = _f12_sub(y2, y1)
        den = _f12_sub(x2, x1)
    lam = f12_mul(num, f12_inv(den))
    x3 = _f12_sub(_f12_sub(f12_mul(lam, lam), x1), x2)
    y3 = _f12_sub(f12_mul(lam, _f12_sub(x1, x3)), y1)
    # l(P) = yp - y1 - lam (xp - x1)
    line = _f12_sub(
        _f12_sub(_f12_from_fp(yp), y1),
        f12_mul(lam, _f12_sub(_f12_from_fp(xp), x1)),
    )
    return line, (x3, y3)


def miller_loop_f12(p, q):
    """Reference Miller loop in untwisted Fp12 affine coordinates (the
    readable oracle; `miller_loop` below is the fast Fp2 path, asserted
    equal post-final-exp in tests)."""
    if p is None or q is None:
        return F12_ONE
    qq = _untwist(q)
    t = qq
    f = F12_ONE
    for bit in bin(BLS_X)[3:]:
        line, t = _line(t, t, p)
        f = f12_mul(f12_sqr(f), line)
        if bit == "1":
            line, t = _line(t, qq, p)
            f = f12_mul(f, line)
    # x < 0 for BLS12-381: conjugate
    return f12_conj(f)


# --- fast Miller loop: affine on the twist, Fp2 arithmetic ------------------
#
# T stays on E'(Fp2); the untwisted line through psi(T), psi(Q) at
# P=(xp,yp), scaled by w^3, is the SPARSE element
#     (lam*x1 - y1)  +  (-lam*xp) w^2  +  yp w^3        (lam in Fp2)
# with coefficients at basis positions {1, w^2=v, w^3=v*w} only.  The
# per-line w^3 factors accumulate to w^(3x) across the loop; x is EVEN
# for BLS12-381, so that is xi^(3x/2) in Fp2* and the easy part of the
# final exponentiation kills it — pairing values are unchanged (asserted
# vs miller_loop_f12 in tests).


def _f12_mul_sparse023(f, c0, c2, c3):
    """f * (c0 + c2 w^2 + c3 w^3) with ci in Fp2 (10 Fp2 muls vs 18).
    In the (Fp6, Fp6) repr the multiplier is ((c0, c2, 0), (0, c3, 0))."""
    a0, a1 = f
    m0 = (c0, c2, fp.F2_ZERO)
    t0 = f6_mul(a0, m0)
    t1 = _f6_mul_sparse1(a1, c3)
    c0o = f6_add(t0, f6_mul_by_nonresidue(t1))
    c1o = f6_sub(f6_sub(
        f6_mul(f6_add(a0, a1), (m0[0], f2_add(m0[1], c3), m0[2])),
        t0), t1)
    return (c0o, c1o)


def _f6_mul_sparse1(a, b1):
    """a * (0, b1, 0) in Fp6: (xi*a2*b1, a0*b1, a1*b1)."""
    return (fp.f2_mul_by_nonresidue(f2_mul(a[2], b1)),
            f2_mul(a[0], b1), f2_mul(a[1], b1))


def _line2(t, q, p_aff):
    """Line through twist points t, q (t==q -> tangent) evaluated at the
    G1 point p, as sparse Fp2 coefficients (c0, c2, c3); returns
    ((c0, c2, c3), t+q) — all Fp2 arithmetic, one Fp2 inversion."""
    (x1, y1), (x2, y2) = t, q
    xp, yp = p_aff
    if x1 == x2 and y1 == y2:
        num = fp.f2_scale(f2_sqr(x1), 3)
        den = fp.f2_scale(y1, 2)
    else:
        if x1 == x2:
            # vertical x' - x1 (scaled by w^2): components {0, 2}
            return ((fp.f2_neg(x1), ((xp % P_MOD), 0), fp.F2_ZERO),
                    None)
        num = f2_sub(y2, y1)
        den = f2_sub(x2, x1)
    lam = f2_mul(num, fp.f2_inv(den))
    x3 = f2_sub(f2_sub(f2_sqr(lam), x1), x2)
    y3 = f2_sub(f2_mul(lam, f2_sub(x1, x3)), y1)
    c0 = f2_sub(f2_mul(lam, x1), y1)
    c2 = fp.f2_scale(lam, (-xp) % P_MOD)
    c3 = (yp % P_MOD, 0)
    return (c0, c2, c3), (x3, y3)


def miller_loop(p, q):
    """Miller loop f_{x,Q}(P), fast Fp2-on-the-twist path."""
    if p is None or q is None:
        return F12_ONE
    t = q
    f = F12_ONE
    for bit in bin(BLS_X)[3:]:
        (c0, c2, c3), t = _line2(t, t, p)
        f = _f12_mul_sparse023(f12_sqr(f), c0, c2, c3)
        if bit == "1":
            (c0, c2, c3), t = _line2(t, q, p)
            f = _f12_mul_sparse023(f, c0, c2, c3)
    return f12_conj(f)


# --- precomputed lines for FIXED G2 points -----------------------------------
#
# The verifier's two pairings always use the same G2 points ([tau]G2
# and the G2 generator, fixed per SRS), so the Miller-loop point chain
# T and every line slope lam are P-independent: precompute
# (lam, lam*x_T - y_T) per step once, and each verify's loop step
# reduces to one f12 square + one sparse mul + a 2-Fp-mul scale —
# no Fp2 inversions or point updates (ROADMAP verifier item).


class G2Prepared:
    """Per-step line coefficients (lam, c0) for a fixed G2 point."""

    __slots__ = ("coeffs",)

    def __init__(self, q):
        coeffs = []
        t = q
        for bit in bin(BLS_X)[3:]:
            c, t = _line_coeffs(t, t)
            coeffs.append(c)
            if bit == "1":
                c, t = _line_coeffs(t, q)
                coeffs.append(c)
        self.coeffs = coeffs


def _line_coeffs(t, q):
    """P-independent part of _line2: ((lam, lam*x1 - y1), t+q).
    Degenerate vertical lines (x1 == x2, t != q) cannot occur in the
    ate chain of a prime-order G2 point; raise if they somehow do so
    callers never silently mis-pair."""
    (x1, y1), (x2, y2) = t, q
    if x1 == x2 and y1 == y2:
        num = fp.f2_scale(f2_sqr(x1), 3)
        den = fp.f2_scale(y1, 2)
    else:
        if x1 == x2:
            raise ValueError("degenerate line in ate chain")
        num = f2_sub(y2, y1)
        den = f2_sub(x2, x1)
    lam = f2_mul(num, fp.f2_inv(den))
    x3 = f2_sub(f2_sub(f2_sqr(lam), x1), x2)
    y3 = f2_sub(f2_mul(lam, f2_sub(x1, x3)), y1)
    return (lam, f2_sub(f2_mul(lam, x1), y1)), (x3, y3)


_PREPARED = {}


def prepare_g2(q):
    """Cached G2Prepared for a (hashable) affine G2 point."""
    prep = _PREPARED.get(q)
    if prep is None:
        prep = _PREPARED[q] = G2Prepared(q)
    return prep


def miller_loop_prepared(p, prep: G2Prepared):
    """Miller loop against precomputed line coefficients."""
    if p is None:
        return F12_ONE
    xp_neg = (-p[0]) % P_MOD
    c3 = (p[1] % P_MOD, 0)
    f = F12_ONE
    i = 0
    cs = prep.coeffs
    for bit in bin(BLS_X)[3:]:
        lam, c0 = cs[i]
        i += 1
        f = _f12_mul_sparse023(f12_sqr(f), c0,
                               fp.f2_scale(lam, xp_neg), c3)
        if bit == "1":
            lam, c0 = cs[i]
            i += 1
            f = _f12_mul_sparse023(f, c0, fp.f2_scale(lam, xp_neg), c3)
    return f12_conj(f)


# Hard-part decomposition (Hayashida–Hayasaka–Teruya shape): with
# x = -BLS_X the BLS parameter and c = (x-1)^2 / 3 (exact: x = 1 mod 3),
#   (p^4 - p^2 + 1)/r  =  c * (x + p) * (x^2 + p^2 - 1) + 1.
# Asserted over the integers here (microseconds at import) so the chain
# below cannot silently drift from the textbook exponent.
_X_SIGNED = -BLS_X
_HARD_C = (_X_SIGNED - 1) ** 2 // 3
assert (_X_SIGNED - 1) ** 2 % 3 == 0
assert (_HARD_C * (_X_SIGNED + P_MOD) * (_X_SIGNED ** 2 + P_MOD ** 2 - 1)
        + 1) == (P_MOD ** 4 - P_MOD ** 2 + 1) // R_MOD


def _exp_by_x(f):
    """f^x for cyclotomic f (x negative: exponentiate by |x|, then the
    free conjugation-inverse)."""
    return f12_conj(f12_cyclo_pow(f, BLS_X))


def final_exponentiation(f):
    """f^((p^12-1)/r) via easy part + the cyclotomic chain above —
    ~320 Granger–Scott squarings + ~60 multiplies, replacing the plain
    4600-bit square-and-multiply (measured 123 ms -> ~6 ms; VERDICT
    round-1 task 10)."""
    # easy part: f^((p^6-1)(p^2+1)) — lands in the cyclotomic subgroup
    f = f12_mul(f12_conj(f), f12_inv(f))
    m = f12_mul(f12_frobenius(f12_frobenius(f)), f)
    # hard part: m^(c(x+p)(x^2+p^2-1)) * m
    m1 = f12_cyclo_pow(m, _HARD_C)
    m2 = f12_mul(_exp_by_x(m1), f12_frobenius(m1))          # m^(c(x+p))
    m3 = f12_mul(
        f12_mul(_exp_by_x(_exp_by_x(m2)),
                f12_frobenius(f12_frobenius(m2))),
        f12_conj(m2))                      # * (x^2 + p^2 - 1)
    return f12_mul(m3, m)


def pairing(p, q):
    """Full pairing e(P, Q) for P in G1, Q in G2 (affine, host types)."""
    return final_exponentiation(miller_loop(p, q))


def pairing_check(pairs) -> bool:
    """Return True iff prod e(P_i, Q_i) == 1 (single final
    exponentiation).  Routed through the native BLS12-381 backend when
    available (this Python path is the oracle — equality asserted in
    tests/test_native_bls.py).  On the Python path G2 points are
    prepared-and-cached: verifiers call this with the same two SRS
    points every proof."""
    from ..native import pairing_product_native
    r = pairing_product_native(pairs)
    if r is not None:
        return r[0]
    f = F12_ONE
    for p, q in pairs:
        if p is None or q is None:
            continue
        f = f12_mul(f, miller_loop_prepared(p, prepare_g2(q)))
    return final_exponentiation(f) == F12_ONE
