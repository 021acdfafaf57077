"""Transcript conformance: Keccak-f[1600] and the merlin byte protocol."""

import hashlib

from tpu_plonk.transcript.keccak import f1600
from tpu_plonk.transcript import Transcript


def test_keccak_f1600_via_sha3():
    """Cross-check our permutation against hashlib's SHA3-256: absorbing a
    single short block and permuting must reproduce the digest."""
    msg = b"tpu-plonk keccak check"
    rate = 136  # SHA3-256 rate
    block = bytearray(rate)
    block[: len(msg)] = msg
    block[len(msg)] ^= 0x06  # SHA3 domain padding
    block[rate - 1] ^= 0x80
    state = bytearray(200)
    for i in range(rate):
        state[i] ^= block[i]
    f1600(state)
    assert bytes(state[:32]) == hashlib.sha3_256(msg).digest()


def test_merlin_conformance_vector():
    """The equivalence vector from merlin's own test suite
    (tests in merlin/src/transcript.rs)."""
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    cb = t.challenge_bytes(b"challenge", 32)
    assert cb.hex() == \
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"


def test_transcript_determinism_and_divergence():
    def run(label, msg):
        t = Transcript(label)
        t.append_message(b"m", msg)
        return t.challenge_scalar(b"c")

    a = run(b"proto", b"hello")
    assert a == run(b"proto", b"hello")
    assert a != run(b"proto", b"hellp")
    assert a != run(b"protp", b"hello")

    # challenge_scalar output is a reduced Fr element
    from tpu_plonk.params import R_MOD
    assert 0 <= a < R_MOD
