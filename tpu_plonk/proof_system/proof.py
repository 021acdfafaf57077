"""Proof object + canonical serialization.

Layout (docs/PROTOCOL.md §proof): 11 compressed G1 commitments (48 B
each) followed by 16 scalars (32 B LE each) = 1040 bytes.  Commitment
order: w_l w_r w_o w_4 z t1 t2 t3 t4 w_z w_zw.  Evaluation order:
a b c d | a' b' d' | sigma1 sigma2 sigma3 | q_arith q_c q_l q_r |
z(zw) | r(z).
(the dusk 0.8 shape: c is opened only at zeta — no widget reads the
output wire on the next row; SURVEY.md §2.8 round 4.)
"""

import dataclasses

from ..curves import g1
from ..fields import fr

COMMITMENT_NAMES = ("w_l", "w_r", "w_o", "w_4", "z",
                    "t_1", "t_2", "t_3", "t_4", "w_z", "w_zw")
EVAL_NAMES = ("a", "b", "c", "d",
              "a_next", "b_next", "d_next",
              "sigma1", "sigma2", "sigma3",
              "q_arith", "q_c", "q_l", "q_r",
              "z_shifted", "r")

PROOF_SIZE = 11 * 48 + 16 * 32  # 1040 bytes


@dataclasses.dataclass
class Proof:
    commitments: dict  # name -> affine G1 point (or None)
    evals: dict        # name -> int

    def to_bytes(self) -> bytes:
        out = [g1.to_bytes(self.commitments[n]) for n in COMMITMENT_NAMES]
        out += [fr.to_bytes(self.evals[n]) for n in EVAL_NAMES]
        data = b"".join(out)
        assert len(data) == PROOF_SIZE
        return data

    @staticmethod
    def from_bytes(data: bytes) -> "Proof":
        # untrusted input: never use assert (stripped under -O)
        if len(data) != PROOF_SIZE:
            raise ValueError("bad proof length")
        comms, off = {}, 0
        for n in COMMITMENT_NAMES:
            comms[n] = g1.from_bytes(data[off:off + 48])
            off += 48
        evals = {}
        for n in EVAL_NAMES:
            evals[n] = fr.from_bytes(data[off:off + 32])
            off += 32
        return Proof(comms, evals)
