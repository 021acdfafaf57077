"""Dusk-plonk 0.8.2 parity hooks (docs/PROTOCOL.md parity ledger).

Each test pins ONE divergence row of the ledger against a fixture
exported from the Rust reference stack (dusk-plonk 0.8.2 + its pinned
crates, /root/reference/Cargo.toml:19-24).  The crates are not
available offline, so every test SKIPS until its fixture file appears
in tests/vectors/dusk/ — the export recipes live in
tests/vectors/dusk/EXPORT.md.  The moment the fixtures exist, parity
becomes a mechanical exercise: run this file, fix the single module
each failing hook names.
"""

import json
import os

import pytest

DUSK_DIR = os.path.join(os.path.dirname(__file__), "vectors", "dusk")


def _fixture(name: str):
    path = os.path.join(DUSK_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"dusk fixture {name} not exported yet "
                    "(tests/vectors/dusk/EXPORT.md)")
    if name.endswith(".json"):
        with open(path) as f:
            return json.load(f)
    mode = "rb" if name.endswith(".bin") else "r"
    with open(path, mode) as f:
        return f.read()


def _fixed_circuit():
    """THE parity circuit: same shape as tests/test_golden_proof.py —
    the Rust export harness must replicate it gate-for-gate
    (EXPORT.md §circuit)."""
    from tests.test_golden_proof import _circuit
    return _circuit()


# ledger #3 — scalar codec (fields/fr.py) ------------------------------------

def test_scalar_codec_parity():
    vec = _fixture("scalar_vectors.json")
    from tpu_plonk.fields import fr
    for row in vec:
        value = int(row["value"], 0)
        want = bytes.fromhex(row["bytes_le"])
        assert fr.to_bytes(value) == want, "fields/fr.to_bytes diverges"
        assert fr.from_bytes(want) == value


# ledger #4 — point codecs (curves/g1.py, curves/g2.py) ----------------------

def test_point_codec_parity():
    vec = _fixture("point_vectors.json")
    from tpu_plonk.curves import g1, g2
    for row in vec.get("g1", []):
        scalar = int(row["scalar"], 0)
        want = bytes.fromhex(row["compressed"])
        p = g1.mul(g1.GEN, scalar) if scalar else None
        assert g1.to_bytes(p) == want, "curves/g1.to_bytes diverges"
        assert g1.from_bytes(want) == p
    for row in vec.get("g2", []):
        scalar = int(row["scalar"], 0)
        want = bytes.fromhex(row["compressed"])
        p = g2.mul(g2.GEN, scalar) if scalar else None
        assert g2.to_bytes(p) == want, "curves/g2.to_bytes diverges"


# ledger #5/#6 — Poseidon constants + sponge (gadgets/poseidon.py) -----------

def test_poseidon_parity():
    vec = _fixture("poseidon_vectors.json")
    from tpu_plonk.gadgets import poseidon
    consts = vec.get("round_constants")
    if consts is not None:
        ours = [int(v) for row in poseidon.round_constants()
                for v in (row if hasattr(row, "__iter__") else [row])]
        assert ours == [int(x, 0) for x in consts], \
            "gadgets/poseidon.py round constants diverge from dusk-hades"
    for row in vec.get("sponge", []):
        msg = [int(x, 0) for x in row["inputs"]]
        want = int(row["hash"], 0)
        assert poseidon.sponge_hash(msg) == want, \
            "gadgets/poseidon.sponge_hash diverges (constants or padding)"


# ledger #7/#8/#9 — composer gate tables (cs/composer.py) --------------------

def test_composer_table_parity():
    vec = _fixture("composer_tables.json")
    cs = _fixed_circuit()
    for name, want in vec["selectors"].items():
        got = [hex(v) for v in cs.q[name]]
        assert got == want, f"cs/composer.py selector {name} diverges"
    for col, want in vec["wires"].items():
        got = list(cs.wires[col])
        assert got == want, f"cs/composer.py wire column {col}"


# ledger #10 — sigma polynomials (cs/permutation.py) -------------------------

def test_sigma_parity():
    vec = _fixture("composer_tables.json")
    if "sigmas" not in vec:
        pytest.skip("fixture has no sigma entries")
    from tpu_plonk.cs.permutation import build_sigma_evals
    cs = _fixed_circuit()
    sigmas = build_sigma_evals(cs, cs.padded_size())
    got = [[hex(v) for v in s] for s in sigmas]
    assert got == vec["sigmas"], "cs/permutation.py sigma mapping diverges"


# ledger #1 — transcript challenges (transcript/, prover append order) -------

def test_challenge_parity():
    vec = _fixture("challenges.json")
    from tpu_plonk.pcs import srs as srs_mod
    from tpu_plonk.proof_system.preprocess import preprocess
    from tpu_plonk.proof_system.prover import prove
    cs = _fixed_circuit()
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, _ = preprocess(cs, srs)
    trace = {}
    prove(cs, pk, srs, challenge_trace=trace)
    # (u is a verifier-side squeeze; it is pinned transitively by the
    # proof-byte hook since the verifier must accept the dusk proof)
    for name in ("beta", "gamma", "alpha", "zeta", "v"):
        if name in vec:
            assert hex(trace[name]) == vec[name], (
                f"challenge {name} diverges — transcript labels or "
                "append order (transcript/strobe.py, prover.py)")


# ledger #2/#11 — full proof bytes (proof_system/proof.py + everything) ------

def test_proof_byte_parity():
    want_hex = _fixture("proof_2e10.hex").strip()
    from tpu_plonk.pcs import srs as srs_mod
    from tpu_plonk.proof_system.preprocess import preprocess
    from tpu_plonk.proof_system.prover import prove
    cs = _fixed_circuit()
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, _ = preprocess(cs, srs)
    got = prove(cs, pk, srs).to_bytes().hex()
    if got != want_hex:
        fields = {}
        if os.path.exists(os.path.join(DUSK_DIR, "proof_fields.json")):
            fields = _fixture("proof_fields.json")
        # name the first diverging field for a targeted fix
        for name, (lo, hi) in sorted(fields.items(),
                                     key=lambda kv: kv[1][0]):
            if got[2 * lo:2 * hi] != want_hex[2 * lo:2 * hi]:
                raise AssertionError(
                    f"proof bytes diverge first at field {name!r} "
                    f"(bytes {lo}:{hi}) — see the parity ledger")
        raise AssertionError("proof bytes diverge from dusk fixture")


# ledger #12 — SRS import (pcs/srs.py) ---------------------------------------

def test_srs_import_parity():
    raw = _fixture("srs_small.bin")
    from tpu_plonk.pcs import srs as srs_mod
    s = srs_mod.SRS.from_bytes(raw)
    # the fixture ships with a sidecar of expected first powers
    meta = _fixture("srs_small.json")
    from tpu_plonk.curves import g1
    for i, hexpt in enumerate(meta["g1_powers"]):
        assert g1.to_bytes(s.powers_g1[i]) == bytes.fromhex(hexpt), \
            "pcs/srs.py SRS byte layout diverges"
