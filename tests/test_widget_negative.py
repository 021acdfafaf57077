"""Negative per-widget quotient tests (VERDICT round-1 task 7): for
each custom-gate widget, a witness tampered at exactly one widget wire
must (a) fail the host satisfiability check and (b) yield a proof the
verifier rejects — i.e. the widget term really reaches the quotient and
the quotient really gates verification, per widget, not just for
arithmetic gates (which test_fuzz already covers)."""

from tpu_plonk.params import R_MOD
from tpu_plonk.cs import Composer, PointVar
from tpu_plonk.curves import jubjub
from tpu_plonk.pcs import srs as srs_mod
from tpu_plonk.proof_system.preprocess import preprocess
from tpu_plonk.proof_system.prover import prove
from tpu_plonk.proof_system.verifier import verify


def _prove_verify(cs):
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, vk = preprocess(cs, srs)
    try:
        proof = prove(cs, pk, srs)
    except AssertionError:
        # the prover's quotient-degree check already caught the broken
        # widget (t does not divide Z_H) — rejection at source
        return False
    return verify(proof, vk, cs.pi, srs)


def _tamper_newest_witness(cs, start_idx):
    """Corrupt the most recently allocated witness variable at or after
    start_idx (additive offset keeps it in-field)."""
    idx = len(cs.witness) - 1
    assert idx >= start_idx
    cs.witness[idx] = (cs.witness[idx] + 1) % R_MOD


def test_range_widget_negative():
    cs = Composer()
    v = cs.add_input(0xAB)
    base = len(cs.witness)
    cs.range_gate(v, 8)
    # corrupt one quad accumulator
    cs.witness[base + 1] = (cs.witness[base + 1] + 1) % R_MOD
    assert not cs.check_satisfied()
    assert not _prove_verify(cs)


def test_logic_widget_negative():
    cs = Composer()
    a = cs.add_input(0b1100)
    b = cs.add_input(0b1010)
    base = len(cs.witness)
    cs.xor_gate(a, b, 4)
    # corrupt a quad-product wire (the c-column witness of the widget)
    cs.witness[base + 6] = (cs.witness[base + 6] + 3) % R_MOD
    assert not cs.check_satisfied()
    assert not _prove_verify(cs)


def test_fixed_base_widget_negative():
    cs = Composer()
    s = cs.add_input(0x1234567)
    cs.fixed_base_scalar_mul(s, jubjub.GENERATOR)
    _tamper_newest_witness(cs, 0)  # an xy_alpha wire of the ladder
    assert not cs.check_satisfied()
    assert not _prove_verify(cs)


def test_vgadd_widget_negative():
    cs = Composer()
    p1 = jubjub.mul(jubjub.GENERATOR, 5)
    p2 = jubjub.mul(jubjub.GENERATOR, 9)
    v1 = PointVar(cs.add_input(p1[0]), cs.add_input(p1[1]), p1)
    v2 = PointVar(cs.add_input(p2[0]), cs.add_input(p2[1]), p2)
    out = cs.point_addition_gate(v1, v2)
    cs.witness[out.x] = (cs.witness[out.x] + 1) % R_MOD
    assert not cs.check_satisfied()
    assert not _prove_verify(cs)


def test_untampered_widgets_positive():
    """Control: the same four widget circuits verify when untampered."""
    cs = Composer()
    v = cs.add_input(0xAB)
    cs.range_gate(v, 8)
    a = cs.add_input(0b1100)
    b = cs.add_input(0b1010)
    cs.xor_gate(a, b, 4)
    p1 = jubjub.mul(jubjub.GENERATOR, 5)
    p2 = jubjub.mul(jubjub.GENERATOR, 9)
    v1 = PointVar(cs.add_input(p1[0]), cs.add_input(p1[1]), p1)
    v2 = PointVar(cs.add_input(p2[0]), cs.add_input(p2[1]), p2)
    cs.point_addition_gate(v1, v2)
    assert cs.check_satisfied()
    assert _prove_verify(cs)
