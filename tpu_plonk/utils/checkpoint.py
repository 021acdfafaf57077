"""Checkpoint / resume (SURVEY.md §5.4): persist the SRS, ProverKey,
and per-round prover state so a failed run resumes at the last round
boundary (rounds are the natural checkpoints — §5.3).

Everything in the host prover state is plain python (ints, lists,
dicts, bytearray strobe state), so pickle round-trips exactly; the
transcript is the only stateful object and serializes via its strobe
bytes + positions.

SECURITY: checkpoint files are TRUSTED local artifacts — pickle.load
executes code, so checkpoint paths must point at files this process (or
an equally trusted one) wrote.  Untrusted inputs (proofs, keys, SRS)
have their own validating codecs and never go through this module.
"""

import os
import pickle


def save(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def transcript_state(t) -> dict:
    s = t.strobe
    return {"state": bytes(s.state), "pos": s.pos,
            "pos_begin": s.pos_begin, "cur_flags": s.cur_flags}


def restore_transcript(state: dict):
    from ..transcript import Transcript
    t = Transcript.__new__(Transcript)
    from ..transcript.strobe import Strobe128
    s = Strobe128.__new__(Strobe128)
    s.state = bytearray(state["state"])
    s.pos = state["pos"]
    s.pos_begin = state["pos_begin"]
    s.cur_flags = state["cur_flags"]
    t.strobe = s
    return t


class RoundCheckpoint:
    """Round-boundary memo for the prover (SURVEY.md §5.3/5.4: rounds
    are the natural checkpoints; a failed run resumes from the last
    completed round).  Usage: pass `ckpt=RoundCheckpoint(path)` to
    prove(); each round's outputs are persisted after computing, and a
    restart loads them instead of recomputing.  The transcript is NOT
    stored — it replays deterministically from the cached commitments."""

    def __init__(self, path: str):
        self.path = path
        self.data = load(path) if os.path.exists(path) else {}

    def memo(self, key: str, fn):
        if key in self.data:
            return self.data[key]
        value = fn()
        self.data[key] = value
        save(self.path, self.data)
        return value

    def completed(self):
        return sorted(self.data)
