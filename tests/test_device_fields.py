"""Device limb arithmetic vs host Python-int oracle (bit-exact vectors,
SURVEY.md §4.3 item 1)."""

import random

import numpy as np
import jax.numpy as jnp

from tpu_plonk.params import R_MOD, P_MOD, FR_MONT_R, FP_MONT_R
from tpu_plonk.fields import limbs
from tpu_plonk.fields import device as dev

rng = random.Random(0xDEC0DE)


def _rand_fr(n):
    return [rng.randrange(R_MOD) for _ in range(n)]


def _rand_fp(n):
    return [rng.randrange(P_MOD) for _ in range(n)]


def test_limb_roundtrip():
    xs = _rand_fr(32) + [0, 1, R_MOD - 1]
    arr = limbs.fr_to_limbs(xs)
    assert arr.shape == (35, 16)
    assert limbs.limbs_to_ints(arr) == xs
    assert limbs.limbs_to_int(limbs.int_to_limbs(12345678901234567890, 16)) \
        == 12345678901234567890


def test_add_sub_neg_fr():
    n = 64
    a, b = _rand_fr(n), _rand_fr(n)
    a[0], b[0] = 0, 0
    a[1], b[1] = R_MOD - 1, R_MOD - 1
    la, lb = jnp.asarray(limbs.fr_to_limbs(a)), jnp.asarray(limbs.fr_to_limbs(b))
    got = limbs.limbs_to_ints(np.asarray(dev.add_mod(la, lb, dev.FR)))
    assert got == [(x + y) % R_MOD for x, y in zip(a, b)]
    got = limbs.limbs_to_ints(np.asarray(dev.sub_mod(la, lb, dev.FR)))
    assert got == [(x - y) % R_MOD for x, y in zip(a, b)]
    got = limbs.limbs_to_ints(np.asarray(dev.neg_mod(la, dev.FR)))
    assert got == [(-x) % R_MOD for x in a]


def _check_mont_mul(ctx, mod, mont_r, to_limbs):
    n = 64
    a = [rng.randrange(mod) for _ in range(n)]
    b = [rng.randrange(mod) for _ in range(n)]
    a[0], b[0] = 0, mod - 1
    a[1], b[1] = mod - 1, mod - 1
    la, lb = jnp.asarray(to_limbs(a)), jnp.asarray(to_limbs(b))
    got = limbs.limbs_to_ints(np.asarray(dev.mont_mul(la, lb, ctx)))
    rinv = pow(mont_r, -1, mod)
    assert got == [x * y * rinv % mod for x, y in zip(a, b)]


def test_mont_mul_fr():
    _check_mont_mul(dev.FR, R_MOD, FR_MONT_R, limbs.fr_to_limbs)


def test_mont_mul_fp():
    _check_mont_mul(dev.FP, P_MOD, FP_MONT_R, limbs.fp_to_limbs)


def test_mont_roundtrip_and_real_product():
    n = 32
    a, b = _rand_fr(n), _rand_fr(n)
    la, lb = jnp.asarray(limbs.fr_to_limbs(a)), jnp.asarray(limbs.fr_to_limbs(b))
    am, bm = dev.to_mont(la, dev.FR), dev.to_mont(lb, dev.FR)
    prod = dev.from_mont(dev.mont_mul(am, bm, dev.FR), dev.FR)
    assert limbs.limbs_to_ints(np.asarray(prod)) == \
        [x * y % R_MOD for x, y in zip(a, b)]
    back = dev.from_mont(am, dev.FR)
    assert limbs.limbs_to_ints(np.asarray(back)) == a


def test_mont_pow_and_inv():
    n = 8
    a = _rand_fr(n)
    la = jnp.asarray(limbs.fr_to_limbs(a))
    am = dev.to_mont(la, dev.FR)
    cubes = dev.from_mont(dev.mont_pow(am, 3, dev.FR), dev.FR)
    assert limbs.limbs_to_ints(np.asarray(cubes)) == \
        [pow(x, 3, R_MOD) for x in a]
    invs = dev.from_mont(dev.mont_inv(am, dev.FR), dev.FR)
    assert limbs.limbs_to_ints(np.asarray(invs)) == \
        [pow(x, -1, R_MOD) if x else 0 for x in a]


def test_batch_inv_mont():
    n = 33
    a = _rand_fr(n)
    a[5] = 0  # zero passes through as zero
    la = jnp.asarray(limbs.fr_to_limbs(a))
    am = dev.to_mont(la, dev.FR)
    out = dev.from_mont(dev.batch_inv_mont(am, dev.FR, axis=0), dev.FR)
    assert limbs.limbs_to_ints(np.asarray(out)) == \
        [pow(x, -1, R_MOD) if x else 0 for x in a]


def test_debug_guards_catch_bad_limbs():
    """Opt-in overflow/canonicity guards (SURVEY §5.2): valid inputs
    pass, limb-overflow and non-canonical inputs raise.  The guard is
    baked at TRACE time, so drop every cached jit trace first — a
    "unique shape" is not enough once the suite grows (a (3,16) add
    traced guard-free by an earlier test silently disarmed this one)."""
    import pytest
    import jax
    import jax.numpy as jnp
    from tpu_plonk.fields import device as dev

    old = dev.DEBUG_GUARDS
    dev.DEBUG_GUARDS = True
    jax.clear_caches()
    try:
        shape = (3, 16)
        good = jnp.zeros(shape, jnp.uint32).at[:, 0].set(7)
        out = dev.add_mod(good, good, dev.FR)
        assert out[0, 0] == 14
        bad_limb = good.at[0, 3].set(1 << 17)
        with pytest.raises(Exception):
            jnp.asarray(dev.add_mod(bad_limb, good, dev.FR)).copy()
        noncanon = jnp.asarray(
            [[0xFFFF] * 16] * 3, jnp.uint32)  # value >= r
        with pytest.raises(Exception):
            jnp.asarray(dev.sub_mod(noncanon, good, dev.FR)).copy()
    finally:
        dev.DEBUG_GUARDS = old
        jax.clear_caches()   # drop the guarded traces too
