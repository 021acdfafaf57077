"""Serialization robustness: malformed encodings must be rejected, not
mis-parsed (proofs/keys/points/scalars are untrusted inputs)."""

import pytest

from tpu_plonk.params import R_MOD, P_MOD
from tpu_plonk.fields import fr
from tpu_plonk.curves import g1, g2, jubjub
from tpu_plonk.proof_system.proof import Proof, PROOF_SIZE


def test_non_canonical_scalar_rejected():
    with pytest.raises(ValueError):
        fr.from_bytes(R_MOD.to_bytes(32, "little"))
    with pytest.raises(ValueError):
        fr.from_bytes((2**256 - 1).to_bytes(32, "little"))
    assert fr.from_bytes((R_MOD - 1).to_bytes(32, "little")) == R_MOD - 1


def test_bad_g1_encodings_rejected():
    # uncompressed flag unset
    with pytest.raises(ValueError):
        g1.from_bytes(bytes(48))
    # x not on curve: find a residue-free x quickly
    x = 5
    while True:
        from tpu_plonk.fields import fp
        if fp.sqrt((x * x * x + 4) % P_MOD) is None:
            break
        x += 1
    bad = bytearray(x.to_bytes(48, "big"))
    bad[0] |= 0b1000_0000
    with pytest.raises(ValueError):
        g1.from_bytes(bytes(bad))
    # infinity round-trips
    assert g1.from_bytes(g1.to_bytes(None)) is None
    assert g2.from_bytes(g2.to_bytes(None)) is None


def test_bad_jubjub_encoding_rejected():
    # y >= r is non-canonical
    with pytest.raises(ValueError):
        jubjub.from_bytes(R_MOD.to_bytes(32, "little"))
    # a y with no valid x
    y = 2
    while True:
        try:
            jubjub.from_bytes(int(y).to_bytes(32, "little"))
            y += 1
        except ValueError:
            break
    assert y < 100  # such a y exists early


def test_bad_proof_length_rejected():
    with pytest.raises(AssertionError):
        Proof.from_bytes(b"\x00" * (PROOF_SIZE - 1))
    with pytest.raises(ValueError):
        # right length, garbage commitments
        Proof.from_bytes(b"\xff" * PROOF_SIZE)
