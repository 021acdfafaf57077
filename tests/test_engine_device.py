"""Device engine vs host engine: byte-identical proofs (SURVEY.md §4.3
item 4 — engine/sharding choices must be numerically invisible)."""

from tpu_plonk.params import R_MOD
from tpu_plonk.cs import Composer, PointVar
from tpu_plonk.curves import jubjub
from tpu_plonk.gadgets import AllocatedScalar, range_check
from tpu_plonk.pcs import srs as srs_mod
from tpu_plonk.proof_system.preprocess import preprocess
from tpu_plonk.proof_system.prover import prove
from tpu_plonk.proof_system.verifier import verify
from tpu_plonk.proof_system.engine_device import prove_device


def _mixed_circuit():
    """Exercises every widget: arith, PI, range, logic, fixed-base ECC,
    variable-base ECC addition, plus copy constraints."""
    cs = Composer()
    a = cs.add_input(37)
    b = cs.add_input(21)
    c = cs.mul(1, a, b, 5)
    cs.constrain_to_constant(c, 0, (-782) % R_MOD)  # public input
    w = AllocatedScalar.allocate(cs, 999)
    range_check(cs, 100, 2000, w)
    x = cs.add_input(0b1011)
    y = cs.add_input(0b0110)
    cs.xor_gate(x, y, 4)
    k = cs.add_input(0xABCDEF)
    p = cs.fixed_base_scalar_mul(k, jubjub.GENERATOR)
    q_pt = jubjub.mul(jubjub.GENERATOR, 3)
    qv = PointVar(cs.add_input(q_pt[0]), cs.add_input(q_pt[1]), q_pt)
    cs.point_addition_gate(p, qv)
    assert cs.check_satisfied()
    return cs


def test_device_engine_matches_host_proof_bytes():
    """Fresh-process isolation; see tests/conftest_subproc.py."""
    from tests.conftest_subproc import run_isolated
    run_isolated("tests.test_engine_device")


def worker_main():
    cs = _mixed_circuit()
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, vk = preprocess(cs, srs)

    host_proof = prove(cs, pk, srs)
    dev_proof = prove_device(cs, pk, srs)

    assert dev_proof.to_bytes() == host_proof.to_bytes()
    assert verify(dev_proof, vk, cs.pi, srs)
