"""Gadget-layer tests (reference src/zk/gadgets.rs semantics,
SURVEY.md §4.3 item 2) and Poseidon."""

import random

from tpu_plonk.params import R_MOD
from tpu_plonk.cs import Composer
from tpu_plonk.curves import jubjub
from tpu_plonk.gadgets import (
    AllocatedScalar, commitment_gadget, maybe_equal, range_check,
    min_bound, max_bound,
)
from tpu_plonk.gadgets import poseidon

rng = random.Random(0x9AD9E7)


def test_maybe_equal():
    cs = Composer()
    a = AllocatedScalar.allocate(cs, 42)
    b = AllocatedScalar.allocate(cs, 42)
    c = AllocatedScalar.allocate(cs, 43)
    assert cs.value(maybe_equal(cs, a, b)) == 1
    assert cs.value(maybe_equal(cs, a, c)) == 0
    assert cs.check_satisfied()


def test_range_check_indicator():
    cs = Composer()
    w = AllocatedScalar.allocate(cs, 50)
    assert cs.value(range_check(cs, 10, 100, w)) == 1
    w2 = AllocatedScalar.allocate(cs, 5)
    assert cs.value(range_check(cs, 10, 100, w2)) == 0
    w3 = AllocatedScalar.allocate(cs, 150)
    assert cs.value(range_check(cs, 10, 100, w3)) == 0
    assert cs.check_satisfied()


def test_min_max_bound():
    cs = Composer()
    w = AllocatedScalar.allocate(cs, 2**20)
    assert cs.value(min_bound(cs, 1000, w, 30)) == 1
    assert cs.value(min_bound(cs, 2**21, w, 30)) == 0
    ind, nbits = max_bound(cs, 2**25, w)
    assert cs.value(ind) == 1 and nbits >= 25
    ind2, _ = max_bound(cs, 2**10, w)
    assert cs.value(ind2) == 0
    assert cs.check_satisfied()


def test_commitment_gadget():
    cs = Composer()
    value, blinder = 1234, 987654321
    v = cs.add_input(value)
    b = cs.add_input(blinder)
    p = commitment_gadget(cs, v, b)
    expected = jubjub.add(jubjub.mul(jubjub.GENERATOR, value),
                          jubjub.mul(jubjub.GENERATOR_NUMS, blinder))
    assert p.point == expected
    assert cs.check_satisfied()


def test_poseidon_permutation_properties():
    out1 = poseidon.permute([1, 2, 3, 4, 5])
    out2 = poseidon.permute([1, 2, 3, 4, 5])
    assert out1 == out2                      # deterministic
    assert out1 != [1, 2, 3, 4, 5]
    out3 = poseidon.permute([1, 2, 3, 4, 6])
    assert out1 != out3                      # avalanche
    assert all(0 <= x < R_MOD for x in out1)


def test_poseidon_sponge():
    h1 = poseidon.sponge_hash([1, 2, 3])
    assert h1 == poseidon.sponge_hash([1, 2, 3])
    assert h1 != poseidon.sponge_hash([1, 2, 4])
    assert h1 != poseidon.sponge_hash([1, 2, 3, 0])  # length matters
    # > rate inputs
    h2 = poseidon.sponge_hash(list(range(9)))
    assert 0 <= h2 < R_MOD


def test_poseidon_gadget_matches_native():
    cs = Composer()
    msgs = [7, 8, 9]
    mvars = [cs.add_input(m) for m in msgs]
    out = poseidon.sponge_gadget(cs, mvars)
    assert cs.value(out) == poseidon.sponge_hash(msgs)
    assert cs.check_satisfied()


def test_poseidon_gadget_tamper_detected():
    cs = Composer()
    mvars = [cs.add_input(m) for m in (7, 8, 9)]
    out = poseidon.sponge_gadget(cs, mvars)
    cs.witness[out] = (cs.witness[out] + 1) % R_MOD
    assert not cs.check_satisfied()


def test_poseidon_device_matches_host():
    from tpu_plonk.gadgets import poseidon_device
    msgs = [[1, 2, 3], [7, 8, 9], [0, 0, 0], [rng.randrange(R_MOD)] * 3]
    got = poseidon_device.sponge_hash_device(msgs)
    want = [poseidon.sponge_hash(m) for m in msgs]
    assert got == want
    # longer-than-rate messages too
    msgs2 = [list(range(9)), [5] * 9]
    assert poseidon_device.sponge_hash_device(msgs2) == \
        [poseidon.sponge_hash(m) for m in msgs2]
