"""BASELINE.md measurement-config-scale tests (opt-in: they take
minutes).  Enable with TPU_PLONK_BIG_TESTS=1.

  config 2: 2^14 gates + permutation + public inputs, single chip
  config 3 (reduced): Poseidon-heavy circuit through the full prover
"""

import os

import pytest

from tpu_plonk.params import R_MOD
from tpu_plonk.cs import Composer
from tpu_plonk.gadgets import poseidon
from tpu_plonk.pcs import srs as srs_mod
from tpu_plonk.proof_system.preprocess import preprocess
from tpu_plonk.proof_system.prover import prove
from tpu_plonk.proof_system.engine_device import prove_device
from tpu_plonk.proof_system.verifier import verify

big = pytest.mark.skipif(
    not os.environ.get("TPU_PLONK_BIG_TESTS"),
    reason="set TPU_PLONK_BIG_TESTS=1 to run the multi-minute configs")


@big
def test_config2_2pow14_gates():
    cs = Composer()
    prev = cs.add_input(3)
    while cs.n_gates < (1 << 14) - 4:
        prev = cs.mul(1, prev, prev, 1)
    cs.constrain_to_constant(prev, 0, (-cs.value(prev)) % R_MOD)
    assert cs.padded_size() == 1 << 14
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, vk = preprocess(cs, srs)
    proof = prove(cs, pk, srs)
    assert verify(proof, vk, cs.pi, srs)


@big
def test_config3_poseidon_device_engine():
    cs = Composer()
    out = poseidon.sponge_gadget(cs, [cs.add_input(i) for i in range(8)])
    cs.constrain_to_constant(
        out, 0, (-cs.value(out)) % R_MOD)
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, vk = preprocess(cs, srs)
    host_proof = prove(cs, pk, srs)
    dev_proof = prove_device(cs, pk, srs)
    assert dev_proof.to_bytes() == host_proof.to_bytes()
    assert verify(dev_proof, vk, cs.pi, srs)
