"""G1/G2/JubJub group law, serialization, and pairing bilinearity."""

import random

from tpu_plonk import params
from tpu_plonk.curves import g1, g2, jubjub, pairing

rng = random.Random(0xC0FFEE)


def test_g1_group_law():
    assert g1.is_on_curve(g1.GEN)
    p = g1.mul(g1.GEN, 12345)
    q = g1.mul(g1.GEN, 67890)
    assert g1.is_on_curve(p) and g1.is_on_curve(q)
    assert g1.add(p, q) == g1.mul(g1.GEN, 12345 + 67890)
    assert g1.add(p, g1.neg(p)) is None
    assert g1.mul(g1.GEN, params.R_MOD) is None  # subgroup order


def test_g1_serialization():
    for k in [0, 1, 5, rng.randrange(params.R_MOD)]:
        p = g1.mul(g1.GEN, k)
        assert g1.from_bytes(g1.to_bytes(p)) == p
    assert len(g1.to_bytes(g1.GEN)) == 48
    # known generator encoding starts with 0x97 (compressed flag + x MSBs)
    assert g1.to_bytes(g1.GEN)[0] == 0x97


def test_g2_group_law_and_serialization():
    assert g2.is_on_curve(g2.GEN)
    p = g2.mul(g2.GEN, 31337)
    q = g2.mul(g2.GEN, 271828)
    assert g2.add(p, q) == g2.mul(g2.GEN, 31337 + 271828)
    assert g2.mul(g2.GEN, params.R_MOD) is None
    for k in [1, 7, rng.randrange(params.R_MOD)]:
        p = g2.mul(g2.GEN, k)
        assert g2.from_bytes(g2.to_bytes(p)) == p


def test_jubjub_curve_and_generators():
    assert jubjub.is_on_curve(jubjub.GENERATOR)
    assert jubjub.is_on_curve(jubjub.GENERATOR_NUMS)
    assert jubjub.in_subgroup(jubjub.GENERATOR)
    assert jubjub.in_subgroup(jubjub.GENERATOR_NUMS)
    p = jubjub.mul(jubjub.GENERATOR, 999)
    q = jubjub.mul(jubjub.GENERATOR, 111)
    assert jubjub.add(p, q) == jubjub.mul(jubjub.GENERATOR, 1110)
    assert jubjub.add(p, jubjub.neg(p)) == jubjub.IDENTITY
    assert jubjub.from_bytes(jubjub.to_bytes(p)) == p


def test_pairing_bilinearity():
    a, b = 3, 5
    pa = g1.mul(g1.GEN, a)
    qb = g2.mul(g2.GEN, b)
    e1 = pairing.pairing(pa, qb)
    e2 = pairing.pairing(g1.GEN, g2.mul(g2.GEN, a * b))
    assert e1 == e2
    # e(P,Q)^r == 1  (target group has order r)
    from tpu_plonk.fields.fp import f12_pow, F12_ONE
    assert f12_pow(e1, params.R_MOD) == F12_ONE
    assert e1 != F12_ONE


def test_pairing_check():
    # e(aG1, G2) * e(-G1, aG2) == 1
    a = 42
    assert pairing.pairing_check([
        (g1.mul(g1.GEN, a), g2.GEN),
        (g1.neg(g1.GEN), g2.mul(g2.GEN, a)),
    ])
    assert not pairing.pairing_check([
        (g1.mul(g1.GEN, a), g2.GEN),
        (g1.neg(g1.GEN), g2.mul(g2.GEN, a + 1)),
    ])


def test_fast_pairing_paths_match_reference():
    """Round-2 verifier speedups must not change pairing values:
    Fp2-on-the-twist Miller == untwisted-Fp12 oracle (post final exp),
    Granger-Scott cyclotomic square/pow == generic Fp12 ops, and the
    hard-part chain == plain pow by (p^4-p^2+1)/r."""
    from tpu_plonk.fields import fp
    from tpu_plonk.params import P_MOD, R_MOD

    p = g1.mul(g1.GEN, 9)
    q = g2.mul(g2.GEN, 31)
    f_slow = pairing.miller_loop_f12(p, q)
    f_fast = pairing.miller_loop(p, q)
    assert (pairing.final_exponentiation(f_slow)
            == pairing.final_exponentiation(f_fast))

    # cyclotomic element: easy part of the miller output
    m = fp.f12_mul(fp.f12_conj(f_slow), fp.f12_inv(f_slow))
    m = fp.f12_mul(fp.f12_frobenius(fp.f12_frobenius(m)), m)
    assert fp.f12_cyclo_sqr(m) == fp.f12_sqr(m)
    assert fp.f12_cyclo_pow(m, 987654321) == fp.f12_pow(m, 987654321)

    # chain == textbook exponent
    e = (P_MOD ** 4 - P_MOD ** 2 + 1) // R_MOD
    assert pairing.final_exponentiation(f_slow) == fp.f12_pow(m, e)


def test_straus_msm_small_matches_naive():
    from tpu_plonk.pcs import msm as hostmsm
    import random
    rng = random.Random(99)
    pts = [g1.mul(g1.GEN, rng.randrange(1, 1 << 64)) for _ in range(9)]
    pts.append(None)
    sc = [rng.randrange(0, params.R_MOD) for _ in range(10)]
    naive = None
    for p, s in zip(pts, sc):
        if p is not None:
            naive = g1.add(naive, g1.mul(p, s))
    assert hostmsm.msm_small(list(zip(pts, sc))) == naive
    assert hostmsm.msm_small([(None, 5), (g1.GEN, 0)]) is None
