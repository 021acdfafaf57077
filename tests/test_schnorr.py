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
