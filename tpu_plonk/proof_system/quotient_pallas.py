"""Fused Pallas quotient-phase kernel (TPU).

quotient_phase_dev evaluates the full widget + permutation constraint
algebra pointwise over a size-n coset: ~80 Montgomery multiplies as
separate XLA ops, each a multi-pass scan over HBM at prover scale.
This kernel runs the ENTIRE phase body — arith/range/logic/fixed/vgadd
widgets, the permutation term, L1 term, and the Z_H^-1 scale — inside
one Pallas kernel per tile: HBM sees the 27 input vectors once and the
t-evaluations once; every intermediate lives in VMEM.

Layout: transposed (16, n), limbs on sublanes (the Mosaic lesson from
curves/pallas_g1.py).  Field algebra helpers are shared with
fields/pallas_fr.py (same split-byte Comba / Kogge-Stone carries as
fields/device.py, so results are bit-exact vs the jnp path — asserted
in tests/test_quotient_pallas.py, interpret mode on CPU).

The next-row wire/z shifts (roll within the phase) happen OUTSIDE the
kernel, as do the phase NTTs; engine_device routes here on real TPUs
when TPU_PLONK_QUOT_PALLAS=1.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import R_MOD, FR_MONT_R, K1, K2, K3, JUBJUB_D
from ..fields import limbs as limbsmod
from ..fields import device as dev
from ..fields import pallas_fr as pf
from .constraints import _C83_6, _C27_2, _C2_3

L = 16
TILE = pf.TILE

#: const-table column indices (Montgomery form except mod/ninv)
_COLS = ("mod", "ninv", "one", "beta", "gamma", "alpha",
         "kr", "kl", "kf", "kv", "zh_inv",
         "jubjub_d", "c83_6", "c27_2", "c2_3", "k1", "k2", "k3")
_NC = 32  # table padded to a lane-friendly width

_SEL_ORDER = ("q_m", "q_l", "q_r", "q_o", "q_4", "q_c", "q_arith",
              "q_range", "q_logic", "q_fixed", "q_vgadd")


def _mont_limbs(v: int) -> np.ndarray:
    return limbsmod.int_to_limbs(v % R_MOD * FR_MONT_R % R_MOD, L)


@functools.lru_cache(maxsize=None)
def _static_cols() -> np.ndarray:
    """(16, _NC) columns for the circuit-independent constants."""
    t = np.zeros((L, _NC), np.uint32)
    t[:, 0] = limbsmod.int_to_limbs(R_MOD, L)
    t[:, 1] = limbsmod.int_to_limbs(dev.FR.neg_inv, L)
    t[:, 2] = _mont_limbs(1)
    for name, v in (("jubjub_d", JUBJUB_D), ("c83_6", _C83_6),
                    ("c27_2", _C27_2), ("c2_3", _C2_3),
                    ("k1", K1), ("k2", K2), ("k3", K3)):
        t[:, _COLS.index(name)] = _mont_limbs(v)
    return t


# --- kernel ----------------------------------------------------------------


def _kernel(ct, a, b, c, d, an, bn, dn, z, zn, pi,
            q_m, q_l, q_r, q_o, q_4, q_c, q_arith,
            q_range, q_logic, q_fixed, q_vgadd,
            s1, s2, s3, s4, xpts, l1v, out):
    shape = a[:].shape
    pf._consts["mod"] = jnp.broadcast_to(ct[:, 0:1], shape)
    pf._consts["ninv"] = jnp.broadcast_to(ct[:, 1:2], shape)
    mod = pf._consts["mod"]

    def cc(name):
        return jnp.broadcast_to(ct[:, _COLS.index(name):
                                   _COLS.index(name) + 1], shape)

    def mm(x, y):
        return pf._mont_mul_cols(x, y)

    def adm(x, y):
        s = pf._carry(x + y)
        dd, borrow = pf._sub(s, mod)
        return jnp.where(borrow == 0, dd, s)

    def sbm(x, y):
        dd, borrow = pf._sub(x, y)
        dm = pf._carry(dd + mod)
        return jnp.where(borrow == 1, dm, dd)

    one = cc("one")

    def x2(v):
        return adm(v, v)

    def x3(v):
        return adm(x2(v), v)

    def x4(v):
        return x2(x2(v))

    def delta(v):
        two = x2(one)
        three = adm(two, one)
        return mm(mm(v, sbm(v, one)),
                  mm(sbm(v, two), sbm(v, three)))

    av, bv, cv, dv = a[:], b[:], c[:], d[:]
    anv, bnv, dnv = an[:], bn[:], dn[:]
    zv, znv = z[:], zn[:]

    # --- arith ---
    arith = mm(q_m[:], mm(av, bv))
    arith = adm(arith, mm(q_l[:], av))
    arith = adm(arith, mm(q_r[:], bv))
    arith = adm(arith, mm(q_4[:], dv))
    arith = adm(arith, mm(q_o[:], cv))
    arith = adm(arith, q_c[:])
    gate = adm(mm(q_arith[:], arith), pi[:])

    # --- range (kappa = kr) ---
    kr = cc("kr")
    kr2 = mm(kr, kr)
    kr3 = mm(kr2, kr)
    rng = delta(sbm(cv, x4(dv)))
    rng = adm(rng, mm(kr, delta(sbm(bv, x4(cv)))))
    rng = adm(rng, mm(kr2, delta(sbm(av, x4(bv)))))
    rng = adm(rng, mm(kr3, delta(sbm(dnv, x4(av)))))
    gate = adm(gate, mm(mm(kr, q_range[:]), rng))

    # --- logic (kappa = kl; 2-bit quads, product wire on current c) ---
    kl = cc("kl")
    qa = sbm(anv, x4(av))
    qb = sbm(bnv, x4(bv))
    qd = sbm(dnv, x4(dv))
    wp = cv
    lg1 = delta(qa)
    lg2 = delta(qb)
    lg3 = delta(qd)
    lg4 = sbm(wp, mm(qa, qb))
    s = adm(qa, qb)
    sq = adm(mm(qa, qa), mm(qb, qb))
    w2 = mm(wp, wp)
    qcv = q_c[:]
    andv = sbm(adm(adm(mm(cc("c83_6"), wp), x3(mm(wp, sq))),
                   adm(mm(cc("c27_2"), w2), mm(cc("c2_3"), mm(w2, wp)))),
               adm(mm(mm(cc("c27_2"), wp), s), x3(mm(w2, s))))
    lg5 = sbm(qd, adm(mm(qcv, s),
                      mm(sbm(one, x3(qcv)), andv)))
    logic = lg1
    kp = kl
    for term in (lg2, lg3, lg4, lg5):
        logic = adm(logic, mm(kp, term))
        kp = mm(kp, kl)
    gate = adm(gate, mm(mm(kl, q_logic[:]), logic))

    # --- fixed-base (kappa = kf) ---
    kf = cc("kf")
    k = sbm(dnv, x2(dv))
    x_t = mm(k, q_l[:])
    y_t = adm(mm(mm(k, k), sbm(q_r[:], one)), one)
    f1 = mm(mm(k, sbm(k, one)), adm(k, one))
    f2 = sbm(cv, mm(k, qcv))
    dabc = mm(mm(cc("jubjub_d"), av), mm(bv, cv))
    f3 = sbm(adm(anv, mm(anv, dabc)), adm(mm(av, y_t), mm(bv, x_t)))
    f4 = sbm(sbm(bnv, mm(bnv, dabc)), adm(mm(bv, y_t), mm(av, x_t)))
    kf2 = mm(kf, kf)
    fixed = adm(f1, mm(kf, f2))
    fixed = adm(fixed, mm(kf2, f3))
    fixed = adm(fixed, mm(mm(kf2, kf), f4))
    gate = adm(gate, mm(mm(kf, q_fixed[:]), fixed))

    # --- variable-base group add (kappa = kv) ---
    kv = cc("kv")
    v1 = sbm(dnv, mm(av, bv))
    dp = mm(mm(cc("jubjub_d"), dnv), mm(cv, dv))
    v2 = sbm(adm(anv, mm(anv, dp)), adm(mm(av, dv), mm(bv, cv)))
    v3 = sbm(sbm(bnv, mm(bnv, dp)), adm(mm(bv, dv), mm(av, cv)))
    vg = adm(v1, adm(mm(kv, v2), mm(mm(kv, kv), v3)))
    gate = adm(gate, mm(mm(kv, q_vgadd[:]), vg))

    # --- permutation + L1 terms ---
    beta = cc("beta")
    gamma = cc("gamma")
    xv = xpts[:]
    num = adm(adm(av, mm(beta, xv)), gamma)
    num = mm(num, adm(adm(bv, mm(beta, mm(cc("k1"), xv))), gamma))
    num = mm(num, adm(adm(cv, mm(beta, mm(cc("k2"), xv))), gamma))
    num = mm(num, adm(adm(dv, mm(beta, mm(cc("k3"), xv))), gamma))
    den = adm(adm(av, mm(beta, s1[:])), gamma)
    den = mm(den, adm(adm(bv, mm(beta, s2[:])), gamma))
    den = mm(den, adm(adm(cv, mm(beta, s3[:])), gamma))
    den = mm(den, adm(adm(dv, mm(beta, s4[:])), gamma))
    perm = sbm(mm(num, zv), mm(den, znv))
    l1_term = mm(l1v[:], sbm(zv, one))

    alpha = cc("alpha")
    total = adm(gate, adm(mm(alpha, perm),
                          mm(mm(alpha, alpha), l1_term)))
    out[:] = mm(total, cc("zh_inv"))


def _run_tiles_impl(ct, tens, interpret=False):
    n = tens[0].shape[1]
    grid = (n // TILE,)
    spec = pl.BlockSpec((L, TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, _NC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[cspec] + [spec] * len(tens),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        interpret=interpret,
    )(ct, *tens)


_run_tiles_jit = jax.jit(_run_tiles_impl, static_argnames=("interpret",))


def _run_tiles(ct, tens, interpret=False):
    """Interpret mode runs EAGERLY: jitting the interpreted kernel
    hands XLA-CPU a ~10k-op program (15 min compile on the CI box)."""
    if interpret:
        return _run_tiles_impl(ct, tens, interpret=True)
    return _run_tiles_jit(ct, tens)


def quotient_phase_pallas(wire_ph, z_ph, pi_ph, sel_ph, sigma_ph, xpts,
                          alpha, ch, zh_inv_c, l1_vec, interpret=False):
    """Drop-in for engine_device.quotient_phase_dev (same argument
    meaning; alpha/ch/zh_inv_c are (16,) Montgomery scalars)."""
    # cached statics arrive u16 (engine_device._narrow_u16); widen
    sel_ph = {k: v.astype(jnp.uint32) for k, v in sel_ph.items()}
    sigma_ph = [s.astype(jnp.uint32) for s in sigma_ph]
    n = wire_ph["a"].shape[0]
    ct = jnp.asarray(_static_cols())
    for name, v in (("beta", ch["beta"]), ("gamma", ch["gamma"]),
                    ("alpha", alpha), ("kr", ch["range"]),
                    ("kl", ch["logic"]), ("kf", ch["fixed"]),
                    ("kv", ch["vgadd"]), ("zh_inv", zh_inv_c)):
        ct = ct.at[:, _COLS.index(name)].set(v)

    def t(x):
        return x.T

    rolled = {w: jnp.roll(wire_ph[w], -1, axis=0) for w in "abd"}
    tens = [t(wire_ph["a"]), t(wire_ph["b"]), t(wire_ph["c"]),
            t(wire_ph["d"]), t(rolled["a"]), t(rolled["b"]),
            t(rolled["d"]), t(z_ph), t(jnp.roll(z_ph, -1, axis=0)),
            t(pi_ph)]
    tens += [t(sel_ph[k]) for k in _SEL_ORDER]
    tens += [t(s) for s in sigma_ph]
    tens += [t(xpts), t(l1_vec)]
    pad = (-n) % TILE
    if pad:
        tens = [jnp.concatenate(
            [x, jnp.zeros((L, pad), jnp.uint32)], axis=1) for x in tens]
    out = _run_tiles(ct, tuple(tens), interpret=interpret)
    if pad:
        out = out[:, :n]
    return out.T
