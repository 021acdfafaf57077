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


def test_g1_subgroup_and_canonicity_rejected():
    from tpu_plonk.fields import fp
    # on-curve point outside the r-torsion subgroup (x=4 works): must be
    # rejected by default, accepted with check_subgroup=False
    x = 4
    y = fp.sqrt((x * x * x + 4) % P_MOD)
    assert y is not None
    enc = bytearray(x.to_bytes(48, "big"))
    enc[0] |= 0b1000_0000
    if fp.sgn0(y):
        enc[0] |= 0b0010_0000
    with pytest.raises(ValueError):
        g1.from_bytes(bytes(enc))
    p = g1.from_bytes(bytes(enc), check_subgroup=False)
    assert g1.is_on_curve(p) and not g1.is_torsion_free(p)
    # non-canonical x (= p, the unreduced encoding of x=0) must be
    # rejected even though x=0 is on-curve (y^2 = 4)
    enc = bytearray(P_MOD.to_bytes(48, "big"))
    enc[0] |= 0b1000_0000
    with pytest.raises(ValueError):
        g1.from_bytes(bytes(enc))
    # infinity with nonzero payload bits must be rejected
    enc = bytearray(48)
    enc[0] = 0b1100_0000
    enc[47] = 1
    with pytest.raises(ValueError):
        g1.from_bytes(bytes(enc))
    enc = bytearray(48)
    enc[0] = 0b1110_0000  # sort bit set under infinity
    with pytest.raises(ValueError):
        g1.from_bytes(bytes(enc))
    # generator round-trips through the full checks
    assert g1.from_bytes(g1.to_bytes(g1.GEN)) == g1.GEN
    assert g2.from_bytes(g2.to_bytes(g2.GEN)) == g2.GEN


def test_endomorphism_constants_derivation():
    """Re-derive BETA_ENDO / PSI_X / PSI_Y from first principles."""
    from tpu_plonk.fields import fp
    # beta: root of x^2+x+1 with phi(G) == -[T^2]G
    s = fp.sqrt((-3) % P_MOD)
    inv2 = pow(2, -1, P_MOD)
    roots = {(-1 + s) * inv2 % P_MOD, (-1 - s) * inv2 % P_MOD}
    assert g1.BETA_ENDO in roots
    assert pow(g1.BETA_ENDO, 3, P_MOD) == 1 and g1.BETA_ENDO != 1
    assert g1.is_torsion_free(g1.GEN)
    assert g1.is_torsion_free(g1.mul(g1.GEN, 123456789))
    # psi constants: (u+1)^-((p-1)/3), (u+1)^-((p-1)/2)
    def f2_pow(a, e):
        r = fp.F2_ONE
        while e:
            if e & 1:
                r = fp.f2_mul(r, a)
            a = fp.f2_sqr(a)
            e >>= 1
        return r
    assert g2.PSI_X == fp.f2_inv(f2_pow((1, 1), (P_MOD - 1) // 3))
    assert g2.PSI_Y == fp.f2_inv(f2_pow((1, 1), (P_MOD - 1) // 2))
    assert g2.is_torsion_free(g2.GEN)
    assert g2.is_torsion_free(g2.mul(g2.GEN, 987654321))


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
    with pytest.raises(ValueError):
        Proof.from_bytes(b"\x00" * (PROOF_SIZE - 1))
    with pytest.raises(ValueError):
        # right length, garbage commitments
        Proof.from_bytes(b"\xff" * PROOF_SIZE)


def test_bad_verifier_key_rejected():
    """VerifierKey.from_bytes must bound and validate the UNTRUSTED n
    field (it sizes SRS/domain work downstream) and the total length."""
    import pytest
    from tpu_plonk.proof_system.preprocess import VerifierKey
    from tpu_plonk.cs.composer import SELECTOR_NAMES
    from tpu_plonk.curves import g1

    body = b"".join([g1.to_bytes(None)] * (len(SELECTOR_NAMES) + 4))
    good_n = (32).to_bytes(8, "little")
    VerifierKey.from_bytes(good_n + body)          # parses
    for bad_n in (0, 3, 1 << 60):
        with pytest.raises(ValueError):
            VerifierKey.from_bytes(bad_n.to_bytes(8, "little") + body)
    with pytest.raises(ValueError):
        VerifierKey.from_bytes(good_n + body[:-1])
    with pytest.raises(ValueError):
        VerifierKey.from_bytes(good_n + body + b"\x00")


def test_jubjub_low_order_rejected():
    """in_subgroup must NOT reduce the scalar (a reduced [order]P check
    is trivially true); low-order points reject, and the Schnorr
    verifiers refuse keys/nonces outside the prime-order subgroup."""
    from tpu_plonk.params import R_MOD
    from tpu_plonk.curves import jubjub
    from tpu_plonk.gadgets import schnorr

    two_torsion = (0, R_MOD - 1)
    assert jubjub.is_on_curve(two_torsion)
    assert not jubjub.in_subgroup(two_torsion)
    assert jubjub.in_subgroup(jubjub.GENERATOR)
    assert jubjub.in_subgroup(jubjub.GENERATOR_NUMS)

    sk, pk, pk2 = schnorr.keygen_double(0xFEED)
    sig = schnorr.sign_double(sk, message=5)
    assert schnorr.verify_double(pk, pk2, 5, sig)
    # low-order offset on the second key: the dlog-equality binding
    # must fail closed, not pass 1/2 the time
    pk2_off = jubjub.add(pk2, two_torsion)
    assert not schnorr.verify_double(pk, pk2_off, 5, sig)
    s1, p1 = schnorr.keygen(0xFEED)
    sig1 = schnorr.sign(s1, message=6)
    assert not schnorr.verify(jubjub.add(p1, two_torsion), 6, sig1)
