"""Unit tests for host field arithmetic (SURVEY.md §4.3 item 1)."""

import random

from tpu_plonk import params
from tpu_plonk.fields import fr, fp

rng = random.Random(0xF1E1D)


def test_fr_params():
    # 2-adic root of unity matches the well-known BLS12-381 Fr constant
    assert params.ROOT_OF_UNITY == int(
        "0x16a2a19edfe81f20d09b681922c813b4b63683508c2280b93829971f439f0d2b", 16
    )
    assert pow(params.ROOT_OF_UNITY, 1 << 32, params.R_MOD) == 1
    assert pow(params.ROOT_OF_UNITY, 1 << 31, params.R_MOD) != 1


def test_fr_basic_ops():
    for _ in range(200):
        a = rng.randrange(params.R_MOD)
        b = rng.randrange(params.R_MOD)
        assert fr.add(a, b) == (a + b) % params.R_MOD
        assert fr.sub(a, b) == (a - b) % params.R_MOD
        assert fr.mul(a, fr.inv(a) if a else 1) in (1, 0) or a == 0
    a = rng.randrange(1, params.R_MOD)
    assert fr.mul(a, fr.inv(a)) == 1
    assert fr.inv_or_zero(0) == 0


def test_fr_batch_inv():
    xs = [rng.randrange(params.R_MOD) for _ in range(50)]
    xs[7] = 0
    ys = fr.batch_inv(xs)
    for x, y in zip(xs, ys):
        assert y == (0 if x == 0 else pow(x, -1, params.R_MOD))


def test_fr_bytes_roundtrip():
    for _ in range(50):
        a = rng.randrange(params.R_MOD)
        assert fr.from_bytes(fr.to_bytes(a)) == a
    assert len(fr.to_bytes(1)) == 32
    assert fr.to_bytes(1)[0] == 1  # little-endian


def test_fr_sqrt():
    for _ in range(20):
        a = rng.randrange(params.R_MOD)
        s = fr.sqrt(a * a % params.R_MOD)
        assert s is not None and s * s % params.R_MOD == a * a % params.R_MOD


def test_fr_bits_helpers():
    # reference gadgets.rs:240-256 semantics
    assert fr.bits_count(0) == 1
    assert fr.bits_count(1) == 1
    assert fr.bits_count(2) == 2
    assert fr.bits_count(255) == 8
    assert fr.bits_count(256) == 9
    # closest power of two to 100 is 128 -> 8 bits
    assert fr.num_bits_closest_power_of_two(100) == 8
    bits = fr.scalar_to_bits(5)
    assert bits[:4] == [1, 0, 1, 0] and len(bits) == 256


def test_fp_sqrt_and_tower():
    assert params.P_MOD % 4 == 3
    a = rng.randrange(params.P_MOD)
    s = fp.sqrt(a * a % params.P_MOD)
    assert s is not None and s * s % params.P_MOD == a * a % params.P_MOD

    # Fp2 field axioms on random elements
    x = (rng.randrange(params.P_MOD), rng.randrange(params.P_MOD))
    y = (rng.randrange(params.P_MOD), rng.randrange(params.P_MOD))
    assert fp.f2_mul(x, fp.f2_inv(x)) == fp.F2_ONE
    assert fp.f2_mul(x, y) == fp.f2_mul(y, x)
    assert fp.f2_sqr(x) == fp.f2_mul(x, x)

    # Fp12 inverse + frobenius order 12
    f = ((x, y, fp.f2_sqr(x)), (y, x, fp.f2_mul(x, y)))
    assert fp.f12_mul(f, fp.f12_inv(f)) == fp.F12_ONE
    g = f
    for _ in range(12):
        g = fp.f12_frobenius(g)
    assert g == f
    # frobenius is the p-power map
    assert fp.f12_frobenius(f) == fp.f12_pow(f, params.P_MOD)
