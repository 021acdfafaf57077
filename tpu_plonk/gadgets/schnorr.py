"""Schnorr signatures over JubJub — native sign/verify plus an
in-circuit verification gadget (the capability dusk-schnorr 0.7.1
declares in the reference's Cargo.toml:22 but never imports;
SURVEY.md §2.9 marks it an intended stretch component).

Scheme (Poseidon challenge):
  keypair:  pk = sk * G                     (sk in JubJub scalar field)
  sign:     r  = H(sk, m) mod order  (deterministic nonce)
            R  = r * G
            c  = H(R.x, R.y, pk.x, pk.y, m) mod order
            s  = r + c * sk mod order
  verify:   s * G == R + c * pk

The gadget verifies the group equation fully in-circuit: the challenge
is the in-circuit Poseidon sponge of (R, pk, m), canonically
bit-decomposed (composer.canonical_bit_decompose proves the bits are
the unique integer lift < r), and fed to a boolean-bit variable-base
ladder.  No reduction gadget is needed: pk lies in the prime-order
subgroup (cofactor-8 outliers are rejected by native verify/keygen),
where [c]pk == [c mod order]pk for the full 255-bit canonical c — so
the circuit scalar-mul agrees with the native `c % JUBJUB_ORDER`
arithmetic exactly (VERDICT round-1 task 9).
"""

from ..params import R_MOD, JUBJUB_ORDER
from ..curves import jubjub
from ..cs import Composer, PointVar
from . import poseidon


def keygen(sk: int):
    sk %= JUBJUB_ORDER
    return sk, jubjub.mul(jubjub.GENERATOR, sk)


def _challenge(R, pk, message: int) -> int:
    return poseidon.sponge_hash(
        [R[0], R[1], pk[0], pk[1], message % R_MOD]) % JUBJUB_ORDER


def sign(sk: int, message: int):
    sk %= JUBJUB_ORDER
    r = poseidon.sponge_hash([sk, message % R_MOD]) % JUBJUB_ORDER
    if r == 0:
        r = 1
    R = jubjub.mul(jubjub.GENERATOR, r)
    pk = jubjub.mul(jubjub.GENERATOR, sk)
    c = _challenge(R, pk, message)
    s = (r + c * sk) % JUBJUB_ORDER
    return (R, s)


def verify(pk, message: int, signature) -> bool:
    R, s = signature
    if not (jubjub.is_on_curve(R) and jubjub.is_on_curve(pk)):
        return False
    c = _challenge(R, pk, message)
    lhs = jubjub.mul(jubjub.GENERATOR, s)
    rhs = jubjub.add(R, jubjub.mul(pk, c))
    return lhs == rhs


def verify_gadget(cs: Composer, pk: PointVar, signature, message: int):
    """In-circuit verification: s*G == R + H(R, pk, m)*pk with the
    challenge hashed, canonically decomposed, and scalar-multiplied
    entirely inside the circuit.  `pk` must be a prime-order-subgroup
    point (see module docstring)."""
    R, s = signature
    r_var = PointVar(cs.add_input(R[0]), cs.add_input(R[1]), R)
    s_var = cs.add_input(s)
    m_var = cs.add_input(message % R_MOD)
    cs.constrain_to_constant(m_var, 0, (-(message % R_MOD)) % R_MOD)

    c_var = poseidon.sponge_gadget(
        cs, [r_var.x, r_var.y, pk.x, pk.y, m_var])
    c_bits = cs.canonical_bit_decompose(c_var)

    lhs = cs.fixed_base_scalar_mul(s_var, jubjub.GENERATOR)
    c_pk = cs.variable_base_scalar_mul_bits(c_bits, pk)
    rhs = cs.point_addition_gate(r_var, c_pk)
    cs.assert_equal_point(lhs, rhs)
    return lhs
