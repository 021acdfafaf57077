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


def miller_loop(p, q):
    """Miller loop f_{x,Q}(P) for G1 affine p, G2 affine q (ints / Fp2)."""
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


def final_exponentiation(f):
    # easy part: f^((p^6-1)(p^2+1))
    f = f12_mul(f12_conj(f), f12_inv(f))
    f = f12_mul(f12_frobenius(f12_frobenius(f)), f)
    # hard part: f^((p^4 - p^2 + 1) / r)
    e = (P_MOD ** 4 - P_MOD ** 2 + 1) // R_MOD
    return f12_pow(f, e)


def pairing(p, q):
    """Full pairing e(P, Q) for P in G1, Q in G2 (affine, host types)."""
    return final_exponentiation(miller_loop(p, q))


def pairing_check(pairs) -> bool:
    """Return True iff prod e(P_i, Q_i) == 1 (single final exponentiation)."""
    f = F12_ONE
    for p, q in pairs:
        f = f12_mul(f, miller_loop(p, q))
    return final_exponentiation(f) == F12_ONE
