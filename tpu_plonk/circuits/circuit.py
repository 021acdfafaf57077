"""`Circuit` authoring API — the dusk-plonk 0.8.2 `Circuit` trait
analog (the user-facing L7 surface the reference's `MockCircuit` is
written against; `/root/reference/src/zk/circuits.rs:26-73` holds
`Variable`s + witness state exactly so a trait like this can rebuild
the composer on demand).

dusk's trait is `gadget(&mut composer)` + `compile(pp) ->
(ProverKey, VerifierData)` + `gen_proof(pp, pk, label)` + the free
`verify_proof(pp, vk, proof, pi_values, pi_positions, label)`; this
module mirrors that shape over the native stack:

  * `Circuit.gadget(composer)` — subclass hook appending gates; witness
    values live on the instance (like the reference's `MockCircuit`
    fields, `circuits.rs:27-31`).
  * `Circuit.compile(srs)` — fresh composer -> preprocess -> returns
    `(ProverKey, VerifierData)`; `VerifierData` carries the
    `VerifierKey` plus the public-input gate positions recorded at
    compile time (dusk's `VerifierData { key, pi_pos }`).
  * `Circuit.gen_proof(srs, pk, label)` — rebuild + 5-round prove.
  * `verify_proof(...)` — zips caller-supplied PI values (gate form,
    i.e. exactly what was passed to the gate builders — dusk's
    convention, cf. `Some(-public_hash)` at `circuits.rs:71`) with the
    compiled positions and runs the host verifier.

`gadget_tester` is dusk-plonk's own test idiom (SURVEY.md §4.2): run
the FULL pipeline (compose -> preprocess -> prove -> verify) over a
gadget closure, asserting the proof verifies — the de-facto
integration-test core of the stack.
"""

import dataclasses

from ..params import R_MOD
from ..cs import Composer
from ..pcs import srs as srs_mod
from ..proof_system.preprocess import preprocess
from ..proof_system.prover import prove
from ..proof_system.verifier import verify
from ..transcript import labels as L


@dataclasses.dataclass
class VerifierData:
    """VerifierKey + public-input positions (dusk `VerifierData`)."""
    key: object                 # preprocess() VerifierKey
    pi_pos: list                # sorted gate indices carrying PI


class Circuit:
    """Subclass and implement `gadget(composer)`.

    The default `compile`/`gen_proof` build a fresh composer per call
    (dusk's trait semantics: the struct IS the witness; proving twice
    with different field values just works)."""

    def gadget(self, composer: Composer) -> None:
        raise NotImplementedError

    def build(self) -> Composer:
        cs = Composer()
        self.gadget(cs)
        return cs

    def padded_gates(self) -> int:
        """Power-of-two domain size of the compiled circuit (dusk
        `Circuit::padded_gates`)."""
        return self.build().padded_size()

    def compile(self, srs, light: bool = False):
        """-> (ProverKey, VerifierData).  `light=True` skips the host
        4n ext tables (device-engine path; preprocess docstring)."""
        cs = self.build()
        pk, vk = preprocess(cs, srs, light=light)
        return pk, VerifierData(vk, sorted(cs.pi))

    def gen_proof(self, srs, pk, label: bytes = L.PROTOCOL,
                  blinding_seed: bytes = None):
        cs = self.build()
        return prove(cs, pk, srs, label, blinding_seed=blinding_seed)

    def public_inputs(self) -> list:
        """PI values in gate order (the `pi_values` argument of
        `verify_proof`), extracted from a fresh build."""
        cs = self.build()
        return [cs.pi[i] for i in sorted(cs.pi)]


def verify_proof(proof, verifier_data: VerifierData, pi_values, srs,
                 label: bytes = L.PROTOCOL) -> bool:
    """Free verification function (dusk `circuit::verify_proof`):
    `pi_values` are the gate-form public-input scalars in position
    order; positions come from compile-time `VerifierData`."""
    if len(pi_values) != len(verifier_data.pi_pos):
        return False
    pi = {pos: int(v) % R_MOD for pos, v in
          zip(verifier_data.pi_pos, pi_values)}
    return verify(proof, verifier_data.key, pi, srs, label)


def gadget_tester(gadget_fn, label: bytes = b"gadget-tester",
                  srs=None) -> bool:
    """dusk-plonk's per-gadget integration idiom (SURVEY.md §4.2):
    compose the gadget, preprocess, prove, verify; returns whether the
    proof verifies (callers assert True for sound witnesses, False for
    unsatisfied ones).  An unsatisfied witness is reported as False
    without proving — the prover itself asserts quotient divisibility
    (dusk's prover likewise errors on unsatisfied circuits)."""
    cs = Composer()
    gadget_fn(cs)
    if not cs.check_satisfied():
        return False
    if srs is None:
        srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, vk = preprocess(cs, srs)
    proof = prove(cs, pk, srs, label)
    return verify(proof, vk, cs.pi, srs, label)
