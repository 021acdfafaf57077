"""Native BLS12-381 backend vs the pure-Python oracles.

The C library (tpu_plonk/native/bls12_381.c) re-implements the host
verifier's algebra — Fp tower, Jacobian G1, wNAF Straus MSM, optimal-ate
pairing — and must agree with fields/fp.py + pcs/msm.py +
curves/pairing.py EXACTLY on every path (identity results, signed
digits, equal/negated points, the full final exponentiation)."""

import random

import pytest

from tpu_plonk import native
from tpu_plonk.params import R_MOD
from tpu_plonk.curves import g1, g2, pairing
from tpu_plonk.pcs import msm as hostmsm

rng = random.Random(0xB15)

pytestmark = pytest.mark.skipif(
    native.bls_lib() is None, reason="no C compiler for the native lib")


def _rand_g1(n):
    return [g1.mul(g1.GEN, rng.randrange(1, R_MOD)) for _ in range(n)]


def test_msm_matches_python_oracle():
    pts = _rand_g1(8)
    for trial in range(6):
        pairs = [(p, rng.randrange(R_MOD)) for p in pts]
        if trial == 1:
            pairs[0] = (None, 5)            # identity point
            pairs[1] = (pairs[1][0], 0)     # zero scalar
        if trial == 2:
            # cancellation to the identity: P + (r-1)P
            pairs = [(pts[0], 1), (pts[0], R_MOD - 1)]
        if trial == 3:
            pairs = []                      # empty
        want = hostmsm.jac_to_affine(hostmsm.msm_jac(pairs))
        got = native.msm_small_native(pairs)
        assert not isinstance(got, str)
        assert got == want


def test_msm_block_boundary():
    """>64 points exercises the C block loop."""
    pts = _rand_g1(70)
    pairs = [(p, rng.randrange(R_MOD)) for p in pts]
    want = hostmsm.jac_to_affine(hostmsm.msm_jac(pairs))
    assert native.msm_small_native(pairs) == want


def test_pairing_product_matches_python():
    p = g1.mul(g1.GEN, rng.randrange(1, R_MOD))
    q = g2.mul(g2.GEN, rng.randrange(1, R_MOD))
    ok, f12 = native.pairing_product_native([(p, q)])
    want = pairing.pairing(p, q)
    assert f12 == want
    assert not ok  # a single pairing of random points is != 1


def test_pairing_check_bilinear():
    a = rng.randrange(1, R_MOD)
    b = rng.randrange(1, R_MOD)
    p = g1.mul(g1.GEN, a)
    q = g2.mul(g2.GEN, b)
    # e([a]G1, [b]G2) * e(-[ab]G1, G2) == 1
    pab = g1.mul(g1.GEN, a * b % R_MOD)
    ok, _ = native.pairing_product_native([(p, q), (g1.neg(pab), g2.GEN)])
    assert ok
    # and a broken pair fails
    bad = g1.mul(g1.GEN, a * b % R_MOD + 1)
    ok2, _ = native.pairing_product_native([(p, q), (g1.neg(bad), g2.GEN)])
    assert not ok2


def test_keccakf_matches_python():
    import ctypes
    from tpu_plonk.transcript import keccak
    lib = native.bls_lib()
    for _ in range(4):
        state = bytearray(rng.randbytes(200))
        want = bytearray(state)
        # python rounds (bypass the native routing)
        lanes = [[int.from_bytes(want[8 * (x + 5 * y): 8 * (x + 5 * y) + 8],
                                 "little") for y in range(5)]
                 for x in range(5)]
        lanes = keccak.f1600_lanes(lanes)
        for x in range(5):
            for y in range(5):
                want[8 * (x + 5 * y): 8 * (x + 5 * y) + 8] = \
                    lanes[x][y].to_bytes(8, "little")
        got = bytearray(state)
        lib.b381_keccakf((ctypes.c_uint64 * 25).from_buffer(got))
        assert got == want


def test_pairing_skips_identity_pairs():
    p = g1.mul(g1.GEN, 7)
    q = g2.mul(g2.GEN, 9)
    ok, f12 = native.pairing_product_native(
        [(None, q), (p, None), (p, q)])
    want = pairing.pairing(p, q)
    assert f12 == want
