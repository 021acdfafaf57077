"""The `Circuit` authoring API (dusk-plonk 0.8.2 `Circuit` trait
analog; tpu_plonk/circuits/circuit.py): compile -> gen_proof ->
verify_proof with compile-time PI positions, plus the `gadget_tester`
idiom of SURVEY.md §4.2."""

from tpu_plonk.params import R_MOD
from tpu_plonk.circuits import (
    Circuit, VerifierData, verify_proof, gadget_tester,
)
from tpu_plonk.pcs import srs as srs_mod


class FactorCircuit(Circuit):
    """Knowledge of factors: prove p*q == n for public n (gate-form
    PI = -n, dusk's `Some(-public_hash)` convention)."""

    def __init__(self, p, q):
        self.p, self.q = p, q

    def gadget(self, composer):
        a = composer.add_input(self.p)
        b = composer.add_input(self.q)
        c = composer.mul(1, a, b, 0)
        composer.constrain_to_constant(
            c, 0, (-(self.p * self.q)) % R_MOD)


def test_circuit_compile_prove_verify():
    circ = FactorCircuit(31, 41)
    srs = srs_mod.cached_setup(circ.padded_gates() + 8)
    pk, vd = circ.compile(srs)
    assert isinstance(vd, VerifierData)
    assert len(vd.pi_pos) == 1
    proof = circ.gen_proof(srs, pk, b"factors")
    pi = circ.public_inputs()
    assert pi == [(-(31 * 41)) % R_MOD]
    assert verify_proof(proof, vd, pi, srs, b"factors")
    # wrong public input -> reject
    assert not verify_proof(proof, vd, [(-1272) % R_MOD], srs,
                            b"factors")
    # wrong arity -> reject
    assert not verify_proof(proof, vd, [], srs, b"factors")
    # wrong label -> reject
    assert not verify_proof(proof, vd, pi, srs, b"other-label")


def test_circuit_reprove_new_witness():
    """dusk trait semantics: the instance IS the witness — mutate the
    fields, prove again against the SAME keys (same gate structure)."""
    circ = FactorCircuit(31, 41)
    srs = srs_mod.cached_setup(circ.padded_gates() + 8)
    pk, vd = circ.compile(srs)
    circ.p, circ.q = 7, 2003
    proof = circ.gen_proof(srs, pk)
    assert verify_proof(proof, vd, circ.public_inputs(), srs)


def test_gadget_tester_positive_negative():
    def good(cs):
        x = cs.add_input(9)
        y = cs.add_input(3)
        s = cs.add((1, x), (1, y), 0)
        cs.constrain_to_constant(s, 12)

    def bad(cs):
        # unsatisfied witness: 9 + 4 != 12 constant gate
        x = cs.add_input(9)
        y = cs.add_input(4)
        s = cs.add((1, x), (1, y), 0)
        cs.constrain_to_constant(s, 12)

    assert gadget_tester(good)
    assert not gadget_tester(bad)
