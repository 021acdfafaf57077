"""Composer gate builders + widget semantics (host satisfiability)."""

import random

from tpu_plonk.params import R_MOD
from tpu_plonk.cs import Composer, PointVar
from tpu_plonk.curves import jubjub

rng = random.Random(0xC0DE)


def test_arith_gates_satisfied():
    cs = Composer()
    a = cs.add_input(3)
    b = cs.add_input(5)
    c = cs.add((1, a), (2, b), 7)         # c = 3 + 10 + 7 = 20
    assert cs.value(c) == 20
    d = cs.mul(2, a, b, 1)                # d = 2*15 + 1 = 31
    assert cs.value(d) == 31
    e = cs.big_add((1, a), (1, b), (1, d), 0)
    assert cs.value(e) == 39
    cs.boolean_gate(cs.one_var)
    cs.boolean_gate(cs.zero_var)
    cs.constrain_to_constant(cs.add_input(42), 42)
    cs.assert_equal(a, a)
    # public input: a - 0 + pi = 0 with pi = -3
    cs.constrain_to_constant(a, 0, (-3) % R_MOD)
    assert cs.check_satisfied()


def test_arith_gate_violation_detected():
    cs = Composer()
    a = cs.add_input(3)
    cs.constrain_to_constant(a, 4)  # 3 != 4
    assert not cs.check_satisfied()


def test_boolean_violation_detected():
    cs = Composer()
    v = cs.add_input(2)
    cs.boolean_gate(v)
    assert not cs.check_satisfied()


def test_range_gate():
    cs = Composer()
    v = cs.add_input(200)
    cs.range_gate(v, 8)
    assert cs.check_satisfied()

    cs2 = Composer()
    v2 = cs2.add_input(300)  # exceeds 8 bits
    try:
        cs2.range_gate(v2, 8)
        assert False, "should have raised"
    except AssertionError:
        pass
    # a lying witness: patch accumulators manually is messy; instead
    # prove 2^16 range works for a 16-bit value
    cs3 = Composer()
    v3 = cs3.add_input(65535)
    cs3.range_gate(v3, 16)
    assert cs3.check_satisfied()


def test_logic_gates():
    x, y = 0b1101_0110, 0b1011_0011
    cs = Composer()
    a = cs.add_input(x)
    b = cs.add_input(y)
    out_xor = cs.xor_gate(a, b, 8)
    out_and = cs.and_gate(a, b, 8)
    assert cs.value(out_xor) == x ^ y
    assert cs.value(out_and) == x & y
    assert cs.check_satisfied()


def test_fixed_base_scalar_mul():
    cs = Composer()
    k = 0x1234567890ABCDEF
    kv = cs.add_input(k)
    p = cs.fixed_base_scalar_mul(kv, jubjub.GENERATOR)
    expected = jubjub.mul(jubjub.GENERATOR, k)
    assert p.point == expected
    assert (cs.value(p.x), cs.value(p.y)) == expected
    assert cs.check_satisfied()


def test_fixed_base_tampered_digit_detected():
    cs = Composer()
    kv = cs.add_input(5)
    p = cs.fixed_base_scalar_mul(kv, jubjub.GENERATOR)
    # tamper: change one accumulator witness mid-ladder
    cs.witness[p.x] = (cs.witness[p.x] + 1) % R_MOD
    assert not cs.check_satisfied()


def test_point_addition_gate():
    cs = Composer()
    p1 = jubjub.mul(jubjub.GENERATOR, 17)
    p2 = jubjub.mul(jubjub.GENERATOR, 25)
    from tpu_plonk.cs import PointVar
    v1 = PointVar(cs.add_input(p1[0]), cs.add_input(p1[1]), p1)
    v2 = PointVar(cs.add_input(p2[0]), cs.add_input(p2[1]), p2)
    v3 = cs.point_addition_gate(v1, v2)
    assert v3.point == jubjub.mul(jubjub.GENERATOR, 42)
    assert cs.check_satisfied()
    cs.witness[v3.y] = (cs.witness[v3.y] + 1) % R_MOD
    assert not cs.check_satisfied()


def test_variable_base_scalar_mul():
    cs = Composer()
    base = jubjub.mul(jubjub.GENERATOR, 7)
    from tpu_plonk.cs import PointVar
    pv = PointVar(cs.add_input(base[0]), cs.add_input(base[1]), base)
    k = 1000003
    kv = cs.add_input(k)
    out = cs.variable_base_scalar_mul(kv, pv)
    assert out.point == jubjub.mul(base, k)
    assert cs.check_satisfied()


def test_assert_equal_public_point():
    cs = Composer()
    k = 99
    kv = cs.add_input(k)
    p = cs.fixed_base_scalar_mul(kv, jubjub.GENERATOR)
    pub = jubjub.mul(jubjub.GENERATOR, k)
    cs.assert_equal_public_point(p, pub)
    assert cs.check_satisfied()


def test_canonical_bit_decompose():
    from tpu_plonk.params import R_MOD
    cs = Composer()
    val = R_MOD - 12345          # close to the modulus: exercises the
    v = cs.add_input(val)        # equal-prefix comparison chain
    bits = cs.canonical_bit_decompose(v)
    assert cs.check_satisfied()
    assert sum(cs.value(b) << i for i, b in enumerate(bits)) == val

    # soundness: the non-canonical lift val + r needs 256 bits, but any
    # in-width tamper (flip the top bit pattern to a >= r value) must
    # violate either the accumulator or the comparison chain
    cs2 = Composer()
    v2 = cs2.add_input(5)
    bvars = cs2.canonical_bit_decompose(v2)
    lift = 5 + R_MOD
    assert lift.bit_length() == 255  # the lift fits 255 bits: the
    for i, b in enumerate(bvars):    # accumulator alone would accept
        cs2.witness[b] = (lift >> i) & 1   # it; the chain must reject
    assert not cs2.check_satisfied()


def test_variable_base_scalar_mul_bits():
    from tpu_plonk.curves import jubjub
    cs = Composer()
    k = 0xDEADBEEF12345
    kv = cs.add_input(k)
    bits = cs.canonical_bit_decompose(kv)
    p = jubjub.mul(jubjub.GENERATOR, 7)
    pv = PointVar(cs.add_input(p[0]), cs.add_input(p[1]), p)
    out = cs.variable_base_scalar_mul_bits(bits, pv)
    assert cs.check_satisfied()
    assert out.point == jubjub.mul(p, k)
