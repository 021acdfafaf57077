"""Fused Pallas quotient-phase kernel vs the jnp phase body — bit-exact
on random inputs (interpret mode on CPU; real kernel on TPU)."""

import os
import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_plonk.params import R_MOD, FR_MONT_R
from tpu_plonk.fields import limbs
from tpu_plonk.proof_system import engine_device as ed
from tpu_plonk.proof_system import quotient_pallas as qp
from tpu_plonk.cs.composer import SELECTOR_NAMES

rng = random.Random(0x0707)

INTERP = jax.default_backend() == "cpu"


def _vec(n):
    return jnp.asarray(limbs.ints_to_limbs(
        [rng.randrange(R_MOD) * FR_MONT_R % R_MOD for _ in range(n)],
        16))


def _scalar():
    return jnp.asarray(limbs.int_to_limbs(
        rng.randrange(R_MOD) * FR_MONT_R % R_MOD, 16))


@pytest.mark.skipif(
    jax.default_backend() == "cpu"
    and not os.environ.get("TPU_PLONK_BIG_TESTS"),
    reason="~19 min in interpret mode on the CI box (eager walk of the "
           "~10k-op fused kernel); verified green 2026-08-18, and the "
           "kernel is opt-in (TPU_PLONK_QUOT_PALLAS).  Runs fast on a "
           "real TPU backend; set TPU_PLONK_BIG_TESTS=1 to force on CPU")
def test_quotient_phase_pallas_matches_jnp():
    n = 192   # not a tile multiple: exercises padding
    wire_ph = {w: _vec(n) for w in "abcd"}
    z_ph = _vec(n)
    pi_ph = _vec(n)
    sel_ph = {k: _vec(n) for k in SELECTOR_NAMES}
    sigma_ph = [_vec(n) for _ in range(4)]
    xpts = _vec(n)
    l1_vec = _vec(n)
    alpha = _scalar()
    ch = {k: _scalar() for k in
          ("beta", "gamma", "range", "logic", "fixed", "vgadd")}
    zh_inv = _scalar()

    want = ed.quotient_phase_dev(wire_ph, z_ph, pi_ph, sel_ph,
                                 sigma_ph, xpts, alpha, ch, zh_inv,
                                 l1_vec)
    got = qp.quotient_phase_pallas(wire_ph, z_ph, pi_ph, sel_ph,
                                   sigma_ph, xpts, alpha, ch, zh_inv,
                                   l1_vec, interpret=INTERP)
    assert np.array_equal(np.asarray(got), np.asarray(want))
