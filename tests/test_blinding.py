"""ZK blinding variant (ROADMAP #9, ADVICE round-1 #5): wires gain
(b1 X + b2) Z_H, z gains a quadratic Z_H multiple, the quotient grows
to deg 4n+6 and splits into five chunks (t_5, 1088-byte proofs).
Unblinded proofs remain byte-identical to the golden fixture (asserted
elsewhere); here we check the variant end-to-end."""

from tpu_plonk.params import R_MOD
from tpu_plonk.cs import Composer
from tpu_plonk.pcs import srs as srs_mod
from tpu_plonk.proof_system.preprocess import preprocess
from tpu_plonk.proof_system.prover import prove
from tpu_plonk.proof_system.verifier import verify
from tpu_plonk.proof_system.proof import (
    Proof, PROOF_SIZE, BLINDED_PROOF_SIZE)


def _setup():
    cs = Composer()
    a = cs.add_input(37)
    b = cs.add_input(21)
    c = cs.mul(1, a, b, 5)
    cs.constrain_to_constant(c, 0, (-782) % R_MOD)
    x = cs.add_input(0b1011)
    y = cs.add_input(0b0110)
    cs.xor_gate(x, y, 4)
    cs.range_gate(cs.add_input(13), 8)
    assert cs.check_satisfied()
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, vk = preprocess(cs, srs)
    return cs, srs, pk, vk


def test_blinded_proof_verifies_and_is_deterministic():
    cs, srs, pk, vk = _setup()
    plain = prove(cs, pk, srs)
    assert len(plain.to_bytes()) == PROOF_SIZE
    assert verify(plain, vk, cs.pi, srs)

    b1 = prove(cs, pk, srs, blinding_seed=b"seed-1")
    assert b1.blinded
    assert len(b1.to_bytes()) == BLINDED_PROOF_SIZE
    assert verify(b1, vk, cs.pi, srs)

    # same seed -> identical bytes (checkpoint/byte-identity survives)
    b1_again = prove(cs, pk, srs, blinding_seed=b"seed-1")
    assert b1_again.to_bytes() == b1.to_bytes()

    # fresh seed -> different commitments (hiding engaged), still valid
    b2 = prove(cs, pk, srs, blinding_seed=b"seed-2")
    assert b2.to_bytes() != b1.to_bytes()
    assert b2.commitments["w_l"] != b1.commitments["w_l"]
    assert b2.commitments["z"] != b1.commitments["z"]
    assert verify(b2, vk, cs.pi, srs)

    # blinding hides the witness-determined commitments
    assert b1.commitments["w_l"] != plain.commitments["w_l"]


def test_blinded_proof_serialization_roundtrip_and_tamper():
    cs, srs, pk, vk = _setup()
    b1 = prove(cs, pk, srs, blinding_seed=b"rt")
    data = b1.to_bytes()
    back = Proof.from_bytes(data)
    assert back.to_bytes() == data
    assert verify(back, vk, cs.pi, srs)

    # flip one byte of t_5 (12th commitment slot): must be rejected
    bad = bytearray(data)
    bad[9 * 48 + 1] ^= 1
    try:
        tampered = Proof.from_bytes(bytes(bad))
    except ValueError:
        return  # not even a valid point encoding — fine
    assert not verify(tampered, vk, cs.pi, srs)
