"""Full MockCircuit (reference src/zk/circuits.rs) through the complete
pipeline: compose -> preprocess -> prove -> verify (+ negative)."""

from tpu_plonk.params import R_MOD
from tpu_plonk.circuits.mock_circuit import build_mock_circuit
from tpu_plonk.pcs import srs as srs_mod
from tpu_plonk.proof_system.preprocess import preprocess
from tpu_plonk.proof_system.prover import prove
from tpu_plonk.proof_system.verifier import verify


def test_mock_circuit_end_to_end():
    note_value = 10_000
    private_key = 0xDEADBEEF
    hash_inputs = [11, 22, 33, 44]
    tx_value, gas_fee = 7_000, 500

    composer, public = build_mock_circuit(
        note_value, private_key, hash_inputs, tx_value, gas_fee)
    assert composer.check_satisfied()

    srs = srs_mod.cached_setup(composer.padded_size() + 8)
    pk, vk = preprocess(composer, srs)
    proof = prove(composer, pk, srs)
    assert verify(proof, vk, composer.pi, srs)

    # public hash is bound: flipping it must fail
    bad_pi = dict(composer.pi)
    target = (-public["public_hash"]) % R_MOD
    for k, v in bad_pi.items():
        if v == target:
            bad_pi[k] = (v + 1) % R_MOD
    assert bad_pi != composer.pi
    assert not verify(proof, vk, bad_pi, srs)


def test_mock_circuit_insufficient_balance():
    # note_value < tx_value + gas_fee -> min_bound indicator is 0 and
    # the enforced constraint breaks satisfiability
    composer, _ = build_mock_circuit(
        note_value=100, private_key=5, hash_inputs=[1],
        tx_value=7_000, gas_fee=500)
    assert not composer.check_satisfied()
