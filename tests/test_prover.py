"""End-to-end prove+verify (the gadget_tester idiom of SURVEY.md §4.2:
full pipeline per circuit, positive and negative)."""

import random

import pytest

from tpu_plonk.params import R_MOD
from tpu_plonk.cs import Composer
from tpu_plonk.pcs import srs as srs_mod
from tpu_plonk.proof_system.preprocess import preprocess
from tpu_plonk.proof_system.prover import prove
from tpu_plonk.proof_system.verifier import verify
from tpu_plonk.proof_system.proof import Proof, PROOF_SIZE

rng = random.Random(0xE2E)


def _srs_for(composer):
    return srs_mod.cached_setup(composer.padded_size() + 8)


def _roundtrip(composer, label=b"plonk"):
    srs = _srs_for(composer)
    pk, vk = preprocess(composer, srs)
    proof = prove(composer, pk, srs, label)
    assert verify(proof, vk, composer.pi, srs, label)
    return proof, vk, srs


def test_arith_only_circuit():
    cs = Composer()
    a = cs.add_input(3)
    b = cs.add_input(5)
    c = cs.mul(1, a, b, 0)             # c = 15
    d = cs.add((1, c), (2, a), 1)      # d = 22
    cs.constrain_to_constant(d, 22)
    assert cs.check_satisfied()
    proof, vk, srs = _roundtrip(cs)
    assert len(proof.to_bytes()) == PROOF_SIZE

    # serialization roundtrip verifies too
    p2 = Proof.from_bytes(proof.to_bytes())
    assert verify(p2, vk, cs.pi, srs)


def test_public_inputs():
    cs = Composer()
    x = cs.add_input(777)
    # pin x to a public value via PI
    cs.constrain_to_constant(x, 0, (-777) % R_MOD)
    proof, vk, srs = _roundtrip(cs)
    # verifying against a different public input fails
    bad_pi = dict(cs.pi)
    (k, v), = [(k, v) for k, v in bad_pi.items()]
    bad_pi[k] = (v + 1) % R_MOD
    assert not verify(proof, vk, bad_pi, srs)


def test_tampered_proof_rejected():
    cs = Composer()
    a = cs.add_input(9)
    cs.mul(1, a, a, (-81) % R_MOD)
    proof, vk, srs = _roundtrip(cs)
    proof.evals["a"] = (proof.evals["a"] + 1) % R_MOD
    assert not verify(proof, vk, cs.pi, srs)


def test_wrong_label_rejected():
    cs = Composer()
    a = cs.add_input(2)
    cs.boolean_gate(cs.one_var)
    srs = _srs_for(cs)
    pk, vk = preprocess(cs, srs)
    proof = prove(cs, pk, srs, b"label A")
    assert verify(proof, vk, cs.pi, srs, b"label A")
    assert not verify(proof, vk, cs.pi, srs, b"label B")


def test_range_and_logic_circuit():
    cs = Composer()
    v = cs.add_input(40000)
    cs.range_gate(v, 16)
    x = cs.add_input(0b1100)
    y = cs.add_input(0b1010)
    out = cs.xor_gate(x, y, 4)
    cs.constrain_to_constant(out, 0b0110)
    assert cs.check_satisfied()
    _roundtrip(cs)


def test_determinism():
    def build():
        cs = Composer()
        a = cs.add_input(11)
        b = cs.add_input(13)
        cs.mul(1, a, b, (-143) % R_MOD)
        return cs

    srs = _srs_for(build())
    pk, vk = preprocess(build(), srs)
    p1 = prove(build(), pk, srs)
    p2 = prove(build(), pk, srs)
    assert p1.to_bytes() == p2.to_bytes()


def test_verifier_key_serialization():
    cs = Composer()
    a = cs.add_input(4)
    cs.mul(1, a, a, (-16) % R_MOD)
    srs = _srs_for(cs)
    from tpu_plonk.proof_system.preprocess import VerifierKey
    pk, vk = preprocess(cs, srs)
    vk2 = VerifierKey.from_bytes(vk.to_bytes())
    assert vk2.n == vk.n
    assert vk2.selector_commits == vk.selector_commits
    assert vk2.sigma_commits == vk.sigma_commits
    proof = prove(cs, pk, srs)
    assert verify(proof, vk2, cs.pi, srs)


def test_prover_verifier_wrappers():
    """dusk-style Prover/Verifier pairing: both sides build the circuit
    independently; only the proof and public inputs cross."""
    from tpu_plonk.proof_system.prover import Prover
    from tpu_plonk.proof_system.verifier import Verifier

    def build(composer, value):
        a = composer.add_input(value)
        composer.mul(1, a, a, 0)
        composer.constrain_to_constant(a, 0, (-value) % R_MOD)

    p = Prover(label=b"wrapper test")
    build(p.composer, 21)
    srs = _srs_for(p.composer)
    proof = p.prove(srs)

    v = Verifier(label=b"wrapper test")
    build(v.composer, 21)  # verifier rebuilds structure w/ same PI
    assert v.verify(proof, p.composer.pi, srs)


def test_batch_verify():
    """verify_batch: one 2-pairing check for several proofs (mixed
    circuits/vks and a blinded proof), with tamper/PI-swap rejection."""
    from tpu_plonk.proof_system.verifier import verify_batch

    def circ_a():
        cs = Composer()
        a = cs.add_input(3)
        b = cs.add_input(5)
        c = cs.mul(1, a, b, 0)
        cs.constrain_to_constant(c, 15)
        return cs

    def circ_b():
        cs = Composer()
        x = cs.add_input(777)
        cs.constrain_to_constant(x, 0, pi=(-777) % R_MOD)
        cs.range_gate(cs.add_input(9), 8)
        return cs

    items = []
    for build, seed in ((circ_a, None), (circ_b, None),
                        (circ_a, b"zk")):
        cs = build()
        assert cs.check_satisfied()
        srs = _srs_for(cs)
        pk, vk = preprocess(cs, srs)
        proof = prove(cs, pk, srs, blinding_seed=seed)
        items.append((proof, vk, cs.pi))
    srs = srs_mod.cached_setup(max(vk.n for _, vk, _ in items) + 8)
    assert verify_batch(items, srs, salt=b"fixed-test-salt")
    assert verify_batch([], srs)

    # tampered proof bytes -> whole batch rejects
    bad = Proof.from_bytes(items[0][0].to_bytes())
    bad.evals["a"] = (bad.evals["a"] + 1) % R_MOD
    assert not verify_batch(
        [(bad, items[0][1], items[0][2])] + items[1:], srs,
        salt=b"fixed-test-salt")

    # swapped public inputs -> rejects
    swapped = [(items[1][0], items[1][1], {0: 1}), items[0], items[2]]
    assert not verify_batch(swapped, srs, salt=b"fixed-test-salt")
