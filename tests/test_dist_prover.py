"""Multi-device PROVER byte-identity (SURVEY.md §4.3 item 4, VERDICT
round-1 task 2): the same circuit proven on 1 device and on the
8-virtual-device mesh must produce byte-identical proofs — sharding has
to be numerically invisible end-to-end, not just kernel-by-kernel."""

import random

import jax

from tpu_plonk.params import R_MOD
from tpu_plonk.cs import Composer
from tpu_plonk.dist import mesh as meshmod
from tpu_plonk.dist.msm_sharded import ShardedCommitter
from tpu_plonk.pcs import srs as srs_mod
from tpu_plonk.proof_system.preprocess import preprocess
from tpu_plonk.proof_system.prover import prove
from tpu_plonk.proof_system.verifier import verify
from tpu_plonk.proof_system.engine_device import prove_device

rng = random.Random(0xD15B)


def _circuit():
    """Small mixed circuit padded to 64 gates (the smallest size whose
    n and 4n domains both split into four-step factors divisible by 8
    devices)."""
    cs = Composer()
    a = cs.add_input(37)
    b = cs.add_input(21)
    c = cs.mul(1, a, b, 5)
    cs.constrain_to_constant(c, 0, (-782) % R_MOD)  # public input
    x = cs.add_input(0b1011)
    y = cs.add_input(0b0110)
    cs.xor_gate(x, y, 4)
    prev = c
    while cs.n_gates < 40:
        prev = cs.mul(1, prev, prev, 3)
    assert cs.check_satisfied()
    return cs


def test_prover_1dev_vs_8dev_proof_bytes():
    """Runs in a fresh process: the sharded-prover compile is the
    suite's largest and the XLA CPU pipeline segfaults under
    accumulated compile state (tests/conftest_subproc.py)."""
    from tests.conftest_subproc import run_isolated
    run_isolated("tests.test_dist_prover")


def worker_main():
    assert len(jax.devices()) == 8
    cs = _circuit()
    assert cs.padded_size() == 64
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, vk = preprocess(cs, srs)

    host_proof = prove(cs, pk, srs)

    # 1 device (no mesh)
    p1 = prove_device(cs, pk, srs)
    assert p1.to_bytes() == host_proof.to_bytes()

    # 8-device mesh: sharded four-step NTTs + sharded CSR MSM commits
    # (c=4 keeps the CI box's compile+compute budget small)
    mesh = meshmod.make_mesh()
    committer = ShardedCommitter(mesh, srs, pk.n, c=4)
    p8 = prove_device(cs, pk, srs, commit_fn=committer.commit, mesh=mesh)
    assert p8.to_bytes() == host_proof.to_bytes()
    assert verify(p8, vk, cs.pi, srs)
