"""Device-engine ZK variant vs the host blinded oracle: byte-identical
proofs.  Exercises the 8-phase quotient (8x8 inverse Vandermonde, five
chunks), the rank-1 phase corrections (x^n = u_i constant per coset),
the host-tracked high coefficients in commits/evals, and the split
Ruffini in the aggregate openings."""

from tpu_plonk.params import R_MOD
from tpu_plonk.cs import Composer
from tpu_plonk.pcs import srs as srs_mod
from tpu_plonk.proof_system.preprocess import preprocess
from tpu_plonk.proof_system.prover import prove
from tpu_plonk.proof_system.verifier import verify
from tpu_plonk.proof_system.engine_device import prove_device


def _build_cs():
    cs = Composer()
    a = cs.add_input(37)
    b = cs.add_input(21)
    c = cs.mul(1, a, b, 5)
    cs.constrain_to_constant(c, 0, (-782) % R_MOD)
    x = cs.add_input(0b1011)
    y = cs.add_input(0b0110)
    cs.xor_gate(x, y, 4)
    cs.range_gate(cs.add_input(13), 8)
    prev = c
    while cs.n_gates < 28:
        prev = cs.mul(1, prev, prev, 3)
    assert cs.check_satisfied()
    return cs


def test_device_blinded_matches_host():
    cs = _build_cs()
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, vk = preprocess(cs, srs)

    want = prove(cs, pk, srs, blinding_seed=b"dev-zk")
    got = prove_device(cs, pk, srs, blinding_seed=b"dev-zk")
    assert got.to_bytes() == want.to_bytes()
    assert verify(got, vk, cs.pi, srs)

    # and the unblinded device path is unchanged
    plain_host = prove(cs, pk, srs)
    plain_dev = prove_device(cs, pk, srs)
    assert plain_dev.to_bytes() == plain_host.to_bytes()
    assert plain_dev.to_bytes() != got.to_bytes()

    # cached-static reuse: a second blinded prove on the SAME DevicePK
    # hits the phase8_static selector/sigma cache and must stay
    # byte-identical; the 4-phase cache coexists on the same dpk
    from tpu_plonk.proof_system.engine_device import DevicePK
    dpk = DevicePK(pk)
    first = prove_device(cs, pk, srs, dpk=dpk, blinding_seed=b"dev-zk")
    assert dpk.phase8_static is not None
    second = prove_device(cs, pk, srs, dpk=dpk, blinding_seed=b"dev-zk")
    assert first.to_bytes() == want.to_bytes()
    assert second.to_bytes() == want.to_bytes()
    assert (prove_device(cs, pk, srs, dpk=dpk).to_bytes()
            == plain_host.to_bytes())


def test_device_blinded_without_host_srs():
    """The SCALE configuration: prove_device(dpk=..., srs=None) with a
    DeviceCommitter commit_fn — exactly what crashed on-chip in round 4
    (engine_device dereferenced srs.powers_g1 unconditionally;
    bench_results/r4_prove18_blind.log, VERDICT r4 task 2).  The high
    points [tau^(n+k)]G1 must come off the committer's packed table,
    get cached on the DevicePK, and yield byte-identical proofs."""
    import pytest
    from tpu_plonk.pcs.commit_device import DeviceCommitter
    from tpu_plonk.proof_system.engine_device import DevicePK

    cs = _build_cs()
    n = cs.padded_size()
    srs = srs_mod.cached_setup(n + 8)
    pk, vk = preprocess(cs, srs)
    want = prove(cs, pk, srs, blinding_seed=b"dev-zk")

    com = DeviceCommitter(srs, n + 8, c=4)
    # the packed-table extraction matches the host SRS rows
    assert com.high_g1(n) == tuple(srs.powers_g1[n:n + 3])

    dpk = DevicePK(pk)
    got = prove_device(cs, pk, None, dpk=dpk, commit_fn=com.commit,
                       commit_many_fn=com.commit_many,
                       blinding_seed=b"dev-zk")
    assert got.to_bytes() == want.to_bytes()
    assert dpk.high_g1 == tuple(srs.powers_g1[n:n + 3])
    assert verify(got, vk, cs.pi, srs)
    # steady-state call (scale script proves twice on one dpk)
    again = prove_device(cs, pk, None, dpk=dpk, commit_fn=com.commit,
                         commit_many_fn=com.commit_many,
                         blinding_seed=b"dev-zk")
    assert again.to_bytes() == want.to_bytes()

    # a commit_fn with no committer behind it cannot supply the high
    # points: fail fast with a clear message, not an AttributeError
    with pytest.raises(ValueError, match="tau"):
        prove_device(cs, pk, None, dpk=DevicePK(pk),
                     commit_fn=lambda c: None, blinding_seed=b"x")
    # ...unless the caller preloads them on the DevicePK
    dpk2 = DevicePK(pk)
    dpk2.high_g1 = tuple(srs.powers_g1[n:n + 3])
    pre = prove_device(cs, pk, None, dpk=dpk2, commit_fn=com.commit,
                       commit_many_fn=com.commit_many,
                       blinding_seed=b"dev-zk")
    assert pre.to_bytes() == want.to_bytes()
