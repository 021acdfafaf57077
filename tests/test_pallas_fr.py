"""Fused Pallas Fr Montgomery multiply vs the jnp oracle — bit-exact,
including edge values (0, 1, r-1) and broadcasting (interpret mode on
CPU; the real kernel runs on TPU)."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from tpu_plonk.params import R_MOD, FR_MONT_R
from tpu_plonk.fields import limbs
from tpu_plonk.fields import device as dev
from tpu_plonk.fields import pallas_fr

rng = random.Random(0xF47)

INTERP = jax.default_backend() == "cpu"


def _arr(vals):
    return jnp.asarray(limbs.ints_to_limbs(
        [v % R_MOD for v in vals], 16))


def test_mont_mul_matches_jnp():
    n = 1000   # non-multiple of the tile: exercises padding
    a = [rng.randrange(R_MOD) for _ in range(n)]
    b = [rng.randrange(R_MOD) for _ in range(n)]
    a[0] = 0
    b[1] = 0
    a[2] = R_MOD - 1
    b[2] = R_MOD - 1
    a[3] = 1
    aa, bb = _arr(a), _arr(b)
    want = dev.mont_mul(aa, bb, dev.FR)
    got = pallas_fr.mont_mul(aa, bb, interpret=INTERP)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_mont_mul_broadcast_and_real_product():
    n = 64
    a = [rng.randrange(R_MOD) for _ in range(n)]
    s = rng.randrange(R_MOD)
    aa = _arr(a)
    ss = _arr([s])[0]
    got = pallas_fr.mont_mul(aa, ss, interpret=INTERP)
    want = dev.mont_mul(aa, jnp.broadcast_to(ss, aa.shape), dev.FR)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    # real-value check: mont(x) * mont(y) = mont(x*y)
    rinv = pow(FR_MONT_R, -1, R_MOD)
    vals = [v * rinv % R_MOD for v in limbs.limbs_to_ints(
        np.asarray(got))]
    a_real = [v * rinv % R_MOD for v in a]
    s_real = s * rinv % R_MOD
    assert vals == [x * s_real % R_MOD for x in a_real]
