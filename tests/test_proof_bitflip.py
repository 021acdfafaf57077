"""Adversarial serialization-boundary tests (VERDICT r2 #10): every
bit-flip of a valid proof's bytes must be REJECTED — either at decode
(invalid point encoding / non-canonical scalar) or by the verifier.

Sweeps a deterministic sample of byte positions covering every field
of the 1040-byte layout (docs/PROTOCOL.md §proof): first/middle/last
byte of each of the 11 commitments and 16 evaluations, plus the
compression-flag bytes.  Extends tests/test_widget_negative.py and the
fuzz suite to the wire format itself.
"""

import pytest

from tpu_plonk.proof_system.proof import (
    Proof, COMMITMENT_NAMES, EVAL_NAMES, PROOF_SIZE)
from tests.test_golden_proof import _make_proof


@pytest.fixture(scope="module")
def setup():
    proof, vk, cs, srs = _make_proof()
    data = proof.to_bytes()
    assert len(data) == PROOF_SIZE
    from tpu_plonk.proof_system.verifier import verify
    assert verify(proof, vk, cs.pi, srs)
    return data, vk, cs, srs


def _positions():
    """First / middle / last byte of every field + flag byte of every
    commitment (bit 7 of byte 0 in compressed encoding)."""
    pos = []
    off = 0
    for _name in COMMITMENT_NAMES:
        pos += [(off, 0x80), (off, 0x01), (off + 24, 0x10),
                (off + 47, 0x01)]
        off += 48
    for _name in EVAL_NAMES:
        pos += [(off, 0x01), (off + 16, 0x10), (off + 31, 0x80)]
        off += 32
    assert off == PROOF_SIZE
    return pos


@pytest.mark.parametrize("byte_off,mask", _positions())
def test_bitflip_rejected(setup, byte_off, mask):
    data, vk, cs, srs = setup
    mutated = bytearray(data)
    mutated[byte_off] ^= mask
    from tpu_plonk.proof_system.verifier import verify
    try:
        bad = Proof.from_bytes(bytes(mutated))
    except (ValueError, AssertionError):
        return  # rejected at decode: good
    assert not verify(bad, vk, cs.pi, srs), (
        f"bit-flip at byte {byte_off} mask {mask:#x} was ACCEPTED")


def test_truncation_rejected(setup):
    data, *_ = setup
    for cut in (0, 1, 47, PROOF_SIZE - 1):
        with pytest.raises(ValueError):
            Proof.from_bytes(data[:cut])
    with pytest.raises(ValueError):
        Proof.from_bytes(data + b"\0")
