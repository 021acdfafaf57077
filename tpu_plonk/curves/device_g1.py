"""Batched G1 arithmetic on device (JAX, uint32 Fp limbs).

Points are projective (X:Y:Z) triples of (..., 24)-limb Montgomery-form
arrays; identity is (0:1:0).  Addition/doubling use the
Renes-Costello-Batina *complete* formulas for a=0 curves (Alg. 7) —
no branches, no special cases, so they vectorize perfectly on the VPU
and stay correct for identity/equal/negated inputs (the TPU-native
answer to the reference stack's Pippenger inner loops; SURVEY.md §2.10).

12 Montgomery multiplies + 2 small-constant scalings per add.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..params import P_MOD, FP_MONT_R
from ..fields import limbs
from ..fields import device as dev

FP = dev.FP


def _scale12(t):
    """12*t via doublings (b3 = 3*b = 12 for y^2 = x^3 + 4)."""
    t2 = dev.add_mod(t, t, FP)
    t4 = dev.add_mod(t2, t2, FP)
    t8 = dev.add_mod(t4, t4, FP)
    return dev.add_mod(t8, t4, FP)


def add(p, q):
    """Complete projective addition (RCB15 Algorithm 7, a=0, b3=12),
    restructured into two 6-wide *batched* Montgomery multiplies: the
    formula's 12 products form two independent layers, so stacking them
    cuts the dot-op count 6x (XLA compile time scales with dot count)
    and feeds the MXU larger contractions."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    ad = lambda a, b: dev.add_mod(a, b, FP)   # noqa: E731
    sb = lambda a, b: dev.sub_mod(a, b, FP)   # noqa: E731

    # layer 1: t0=x1x2 t1=y1y2 t2=z1z2 s1=(x1+y1)(x2+y2)
    #          s2=(y1+z1)(y2+z2) s3=(x1+z1)(x2+z2)
    lhs = jnp.stack([x1, y1, z1, ad(x1, y1), ad(y1, z1), ad(x1, z1)])
    rhs = jnp.stack([x2, y2, z2, ad(x2, y2), ad(y2, z2), ad(x2, z2)])
    p1 = dev.mont_mul(lhs, rhs, FP)
    t0, t1, t2 = p1[0], p1[1], p1[2]
    t3 = sb(p1[3], ad(t0, t1))
    t4 = sb(p1[4], ad(t1, t2))
    y3 = sb(p1[5], ad(t0, t2))
    t0x3 = ad(ad(t0, t0), t0)          # 3*t0
    t2b = _scale12(t2)
    z3 = ad(t1, t2b)
    t1b = sb(t1, t2b)
    y3b = _scale12(y3)
    # layer 2: t3*t1b, t4*y3b, y3b*t0x3, t1b*z3, z3*t4, t0x3*t3
    lhs2 = jnp.stack([t3, t4, y3b, t1b, z3, t0x3])
    rhs2 = jnp.stack([t1b, y3b, t0x3, z3, t4, t3])
    p2 = dev.mont_mul(lhs2, rhs2, FP)
    x3 = sb(p2[0], p2[1])
    y3 = ad(p2[3], p2[2])
    z3 = ad(p2[4], p2[5])
    return (x3, y3, z3)


def double(p):
    return add(p, p)


def identity(shape_prefix=()):
    """(0 : R : 0) — Montgomery-form identity, broadcastable."""
    one = jnp.asarray(limbs.int_to_limbs(FP_MONT_R % P_MOD, 24))
    zero = jnp.zeros((24,), jnp.uint32)
    x = jnp.broadcast_to(zero, shape_prefix + (24,))
    y = jnp.broadcast_to(one, shape_prefix + (24,))
    return (x, y, x)


def select(mask, p, q):
    """mask ? p : q, elementwise over the batch (mask: bool (...,))."""
    m = mask[..., None]
    return tuple(jnp.where(m, a, b) for a, b in zip(p, q))


# --- host <-> device conversion --------------------------------------------


def points_to_device(points):
    """Affine host points (list of (x, y) or None) -> projective
    Montgomery limb arrays (N, 24) x3."""
    xs, ys, zs = [], [], []
    for p in points:
        if p is None:
            xs.append(0)
            ys.append(FP_MONT_R % P_MOD)
            zs.append(0)
        else:
            xs.append(p[0] * FP_MONT_R % P_MOD)
            ys.append(p[1] * FP_MONT_R % P_MOD)
            zs.append(FP_MONT_R % P_MOD)
    to = lambda v: jnp.asarray(limbs.ints_to_limbs(v, 24))  # noqa: E731
    return (to(xs), to(ys), to(zs))


def points_from_device(p):
    """Projective Montgomery limb arrays -> affine host points."""
    xs = limbs.limbs_to_ints(np.asarray(dev.from_mont(p[0], FP)))
    ys = limbs.limbs_to_ints(np.asarray(dev.from_mont(p[1], FP)))
    zs = limbs.limbs_to_ints(np.asarray(dev.from_mont(p[2], FP)))
    rinv = pow(FP_MONT_R, -1, P_MOD)
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, P_MOD)
            out.append((x * zi % P_MOD, y * zi % P_MOD))
    del rinv
    return out
