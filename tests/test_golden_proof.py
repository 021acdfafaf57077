"""Golden-proof regression: pins the full protocol (transcript labels,
widget algebra, serialization) against accidental drift.  If this test
fails after an intentional protocol change, regenerate the fixture:

    python -m tests.test_golden_proof
"""

import os

from tpu_plonk.params import R_MOD
from tpu_plonk.cs import Composer
from tpu_plonk.gadgets import AllocatedScalar, range_check
from tpu_plonk.pcs import srs as srs_mod
from tpu_plonk.proof_system.preprocess import preprocess
from tpu_plonk.proof_system.prover import prove
from tpu_plonk.proof_system.verifier import verify

FIXTURE = os.path.join(os.path.dirname(__file__), "vectors",
                       "golden_proof.hex")


def _circuit():
    cs = Composer()
    a = cs.add_input(1234)
    b = cs.add_input(5678)
    c = cs.mul(1, a, b, 7)
    cs.constrain_to_constant(c, 0, (-(1234 * 5678 + 7)) % R_MOD)
    w = AllocatedScalar.allocate(cs, 4242)
    range_check(cs, 1000, 10000, w)
    x = cs.add_input(0b1010)
    y = cs.add_input(0b0111)
    cs.xor_gate(x, y, 4)
    return cs


def _make_proof():
    cs = _circuit()
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, vk = preprocess(cs, srs)
    return prove(cs, pk, srs), vk, cs, srs


def test_golden_proof_bytes():
    proof, vk, cs, srs = _make_proof()
    assert verify(proof, vk, cs.pi, srs)
    with open(FIXTURE) as f:
        golden = f.read().strip()
    assert proof.to_bytes().hex() == golden, (
        "proof bytes drifted from the golden fixture — if the protocol "
        "change was intentional, regenerate with "
        "`python -m tests.test_golden_proof`")


if __name__ == "__main__":
    proof, _, _, _ = _make_proof()
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "w") as f:
        f.write(proof.to_bytes().hex() + "\n")
    print("wrote", FIXTURE)
