"""Host-side G1 (BLS12-381, y^2 = x^3 + 4 over Fp).

Affine points are `(x, y)` int tuples; the point at infinity is `None`.
Serialization follows the zkcrypto/dusk 48-byte compressed convention
(big-endian x, flag bits in the top byte) so that SRS / verifier keys /
proofs can round-trip against dusk-bytes layouts (SURVEY.md §2.9).

The bulk MSM lives in pcs/msm.py (host Pippenger) and pcs/msm_device.py
(TPU limb kernels); this module is the scalar/one-off path.
"""

from ..params import P_MOD, G1_GEN_X, G1_GEN_Y, R_MOD
from ..fields import fp

GEN = (G1_GEN_X, G1_GEN_Y)
INF = None


def is_on_curve(p):
    if p is None:
        return True
    x, y = p
    return (y * y - x * x * x - 4) % P_MOD == 0


def neg(p):
    if p is None:
        return None
    return (p[0], (-p[1]) % P_MOD)


def add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if (y1 + y2) % P_MOD == 0:
            return None
        # doubling
        lam = 3 * x1 * x1 * pow(2 * y1, -1, P_MOD) % P_MOD
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, P_MOD) % P_MOD
    x3 = (lam * lam - x1 - x2) % P_MOD
    y3 = (lam * (x1 - x3) - y1) % P_MOD
    return (x3, y3)


def double(p):
    return add(p, p)


def mul(p, k: int):
    k %= R_MOD
    r = None
    while k:
        if k & 1:
            r = add(r, p)
        p = add(p, p)
        k >>= 1
    return r


def to_bytes(p) -> bytes:
    """48-byte compressed encoding: BE x, top bits = [compressed, infinity,
    y-is-lexicographically-largest]."""
    if p is None:
        b = bytearray(48)
        b[0] = 0b1100_0000
        return bytes(b)
    x, y = p
    b = bytearray(x.to_bytes(48, "big"))
    b[0] |= 0b1000_0000
    if fp.sgn0(y):
        b[0] |= 0b0010_0000
    return bytes(b)


def from_bytes(b: bytes):
    assert len(b) == 48
    flags = b[0]
    if not flags & 0b1000_0000:
        raise ValueError("only compressed G1 encodings supported")
    if flags & 0b0100_0000:
        return None
    x = int.from_bytes(bytes([flags & 0b0001_1111]) + b[1:], "big")
    y = fp.sqrt((x * x * x + 4) % P_MOD)
    if y is None:
        raise ValueError("x not on curve")
    if fp.sgn0(y) != ((flags >> 5) & 1):
        y = (-y) % P_MOD
    p = (x, y)
    if not is_on_curve(p):
        raise ValueError("invalid G1 point")
    return p
