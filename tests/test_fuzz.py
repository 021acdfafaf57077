"""Composer fuzz: random mixed-gate circuits through the full pipeline
(deterministic seeds; ROADMAP hardening #9)."""

import random

import pytest

from tpu_plonk.params import R_MOD
from tpu_plonk.cs import Composer, PointVar
from tpu_plonk.curves import jubjub
from tpu_plonk.gadgets import AllocatedScalar, maybe_equal, range_check
from tpu_plonk.pcs import srs as srs_mod
from tpu_plonk.proof_system.preprocess import preprocess
from tpu_plonk.proof_system.prover import prove
from tpu_plonk.proof_system.verifier import verify


def _random_circuit(rng: random.Random) -> Composer:
    cs = Composer()
    pool = [cs.add_input(rng.randrange(R_MOD)) for _ in range(4)]

    def pick():
        return pool[rng.randrange(len(pool))]

    for _ in range(rng.randrange(6, 14)):
        op = rng.randrange(8)
        if op == 0:
            pool.append(cs.add((rng.randrange(R_MOD), pick()),
                               (rng.randrange(R_MOD), pick()),
                               rng.randrange(R_MOD)))
        elif op == 1:
            pool.append(cs.mul(rng.randrange(R_MOD), pick(), pick(),
                               rng.randrange(R_MOD)))
        elif op == 2:
            pool.append(cs.big_add((rng.randrange(R_MOD), pick()),
                                   (rng.randrange(R_MOD), pick()),
                                   (rng.randrange(R_MOD), pick()),
                                   rng.randrange(R_MOD)))
        elif op == 3:
            bit = cs.add_input(rng.randrange(2))
            cs.boolean_gate(bit)
            pool.append(bit)
        elif op == 4:
            v = rng.randrange(R_MOD)
            x = cs.add_input(v)
            # public-input pin
            cs.constrain_to_constant(x, 0, (-v) % R_MOD)
            pool.append(x)
        elif op == 5:
            v = rng.randrange(1 << 16)
            x = cs.add_input(v)
            cs.range_gate(x, 16)
            pool.append(x)
        elif op == 6:
            a, b = rng.randrange(1 << 8), rng.randrange(1 << 8)
            va, vb = cs.add_input(a), cs.add_input(b)
            out = (cs.xor_gate if rng.randrange(2) else cs.and_gate)(
                va, vb, 8)
            pool.append(out)
        else:
            w = AllocatedScalar(pick(), cs.value(pick()))
            w = AllocatedScalar.allocate(cs, rng.randrange(1 << 20))
            lo = rng.randrange(1 << 10)
            hi = lo + 1 + rng.randrange(1 << 20)
            pool.append(range_check(cs, lo, hi, w))
    # one ECC op per circuit (gate-count heavy)
    if rng.randrange(2):
        k = cs.add_input(rng.randrange(1 << 64))
        p = cs.fixed_base_scalar_mul(k, jubjub.GENERATOR)
        q = jubjub.mul(jubjub.GENERATOR, rng.randrange(1, 1 << 32))
        qv = PointVar(cs.add_input(q[0]), cs.add_input(q[1]), q)
        cs.point_addition_gate(p, qv)
    else:
        a = AllocatedScalar.allocate(cs, rng.randrange(4))
        b = AllocatedScalar.allocate(cs, rng.randrange(4))
        maybe_equal(cs, a, b)
    return cs


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_fuzz_random_circuits(seed):
    rng = random.Random(seed)
    cs = _random_circuit(rng)
    assert cs.check_satisfied(), f"seed {seed}: unsatisfied circuit"
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, vk = preprocess(cs, srs)
    proof = prove(cs, pk, srs)
    assert verify(proof, vk, cs.pi, srs), f"seed {seed}: proof rejected"
    # tamper one witness-related eval -> must reject
    proof.evals["b"] = (proof.evals["b"] + 1) % R_MOD
    assert not verify(proof, vk, cs.pi, srs)


@pytest.mark.parametrize("seed", [44, 55])
def test_fuzz_blinded(seed):
    """Random circuits through the ZK variant: blinded proofs verify,
    tampering (including the extra t_5 commitment) rejects."""
    rng = random.Random(seed)
    cs = _random_circuit(rng)
    assert cs.check_satisfied()
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, vk = preprocess(cs, srs)
    proof = prove(cs, pk, srs, blinding_seed=bytes([seed]))
    assert proof.blinded
    assert verify(proof, vk, cs.pi, srs), f"seed {seed}: rejected"
    # swap t_5 for t_4 -> must reject
    proof.commitments["t_5"], proof.commitments["t_4"] = \
        proof.commitments["t_4"], proof.commitments["t_5"]
    assert not verify(proof, vk, cs.pi, srs)
