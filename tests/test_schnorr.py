"""Schnorr over JubJub: native sign/verify + in-circuit gadget."""

from tpu_plonk.params import R_MOD
from tpu_plonk.cs import Composer, PointVar
from tpu_plonk.gadgets import schnorr


def test_sign_verify():
    sk, pk = schnorr.keygen(0x5EC12E7)
    sig = schnorr.sign(sk, message=42)
    assert schnorr.verify(pk, 42, sig)
    assert not schnorr.verify(pk, 43, sig)
    R, s = sig
    assert not schnorr.verify(pk, 42, (R, (s + 1)))
    _, pk2 = schnorr.keygen(0xBAD)
    assert not schnorr.verify(pk2, 42, sig)


def test_verify_gadget():
    sk, pk = schnorr.keygen(7777)
    sig = schnorr.sign(sk, message=1234)
    cs = Composer()
    pkv = PointVar(cs.add_input(pk[0]), cs.add_input(pk[1]), pk)
    schnorr.verify_gadget(cs, pkv, sig, 1234)
    assert cs.check_satisfied()


def test_verify_gadget_rejects_bad_sig():
    sk, pk = schnorr.keygen(7777)
    R, s = schnorr.sign(sk, message=1234)
    cs = Composer()
    pkv = PointVar(cs.add_input(pk[0]), cs.add_input(pk[1]), pk)
    try:
        schnorr.verify_gadget(cs, pkv, (R, (s + 1)), 1234)
        satisfied = cs.check_satisfied()
    except AssertionError:
        satisfied = False
    assert not satisfied


def test_double_sign_verify():
    sk, pk, pk2 = schnorr.keygen_double(0xD0B1E)
    sig = schnorr.sign_double(sk, message=99)
    assert schnorr.verify_double(pk, pk2, 99, sig)
    assert not schnorr.verify_double(pk, pk2, 98, sig)
    R, Rp, s = sig
    assert not schnorr.verify_double(pk, pk2, 99, (R, Rp, s + 1))
    # a mismatched second key (different dlog) must fail even with a
    # valid first equation
    _, _, pk2_bad = schnorr.keygen_double(0xBAD)
    assert not schnorr.verify_double(pk, pk2_bad, 99, sig)


def test_double_verify_gadget():
    sk, pk, pk2 = schnorr.keygen_double(31337)
    sig = schnorr.sign_double(sk, message=777)
    cs = Composer()
    pkv = PointVar(cs.add_input(pk[0]), cs.add_input(pk[1]), pk)
    pk2v = PointVar(cs.add_input(pk2[0]), cs.add_input(pk2[1]), pk2)
    schnorr.verify_double_gadget(cs, pkv, pk2v, sig, 777)
    assert cs.check_satisfied()


def test_double_verify_gadget_rejects_bad_sig():
    sk, pk, pk2 = schnorr.keygen_double(31337)
    R, Rp, s = schnorr.sign_double(sk, message=777)
    cs = Composer()
    pkv = PointVar(cs.add_input(pk[0]), cs.add_input(pk[1]), pk)
    pk2v = PointVar(cs.add_input(pk2[0]), cs.add_input(pk2[1]), pk2)
    try:
        schnorr.verify_double_gadget(cs, pkv, pk2v, (R, Rp, s + 1), 777)
        satisfied = cs.check_satisfied()
    except AssertionError:
        satisfied = False
    assert not satisfied
