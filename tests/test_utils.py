"""utils: metrics, checkpoint/resume primitives, config, CLI demo."""

import json
import os
import subprocess
import sys

from tpu_plonk.utils.metrics import Metrics, NullMetrics
from tpu_plonk.utils import checkpoint
from tpu_plonk.utils.config import parse_args
from tpu_plonk.transcript import Transcript


def test_metrics():
    m = Metrics()
    with m.timed("phase"):
        pass
    m.count("gates", 5)
    m.count("gates", 2)
    d = m.to_dict()
    assert "phase_s" in d and d["gates"] == 7
    json.loads(m.to_json())
    n = NullMetrics()
    with n.timed("x"):
        pass
    assert n.to_dict() == {}


def test_checkpoint_transcript_roundtrip(tmp_path):
    t = Transcript(b"ckpt test")
    t.append_scalar(b"a", 123)
    mid_state = checkpoint.transcript_state(t)
    c1 = t.challenge_scalar(b"c")

    path = str(tmp_path / "state.pkl")
    checkpoint.save(path, {"transcript": mid_state, "round": 2})
    loaded = checkpoint.load(path)
    t2 = checkpoint.restore_transcript(loaded["transcript"])
    assert t2.challenge_scalar(b"c") == c1
    assert loaded["round"] == 2


def test_config():
    cfg = parse_args(["--log-gates", "12", "--engine", "device"])
    assert cfg.log_gates == 12 and cfg.engine == "device"
    assert parse_args([]).msm_window_bits == 8


def test_cli_demo_subprocess():
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "tpu_plonk.cli", "demo"],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-500:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["verified"] is True
    assert payload["proof_bytes"] == 1040


def test_cli_prove_verify_artifacts(tmp_path):
    """prove writes .proof/.vk/.pi; verify consumes them through the
    validating codecs; a flipped proof byte is cleanly rejected."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    pfx = str(tmp_path / "art")
    out = subprocess.run(
        [sys.executable, "-m", "tpu_plonk.cli", "prove", "--out", pfx],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-500:]
    out = subprocess.run(
        [sys.executable, "-m", "tpu_plonk.cli", "verify", "--out", pfx],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-500:]
    assert json.loads(out.stdout.strip().splitlines()[-1])["verified"]
    blob = bytearray(open(pfx + ".proof", "rb").read())
    blob[100] ^= 1
    open(pfx + ".proof", "wb").write(bytes(blob))
    out = subprocess.run(
        [sys.executable, "-m", "tpu_plonk.cli", "verify", "--out", pfx],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 1
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["verified"] is False


def test_prover_round_checkpoint_resume(tmp_path):
    """Crash-resume at a round boundary: delete later rounds from the
    checkpoint, re-prove, and confirm earlier rounds were loaded (no
    recomputation) while proof bytes stay identical."""
    from tpu_plonk.params import R_MOD
    from tpu_plonk.cs import Composer
    from tpu_plonk.pcs import srs as srs_mod, kzg
    from tpu_plonk.proof_system.preprocess import preprocess
    from tpu_plonk.proof_system.prover import prove
    from tpu_plonk.proof_system.verifier import verify
    from tpu_plonk.utils.checkpoint import RoundCheckpoint

    cs = Composer()
    a = cs.add_input(6)
    cs.mul(1, a, a, (-36) % R_MOD)
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, vk = preprocess(cs, srs)

    path = str(tmp_path / "prover.ckpt")
    ck = RoundCheckpoint(path)
    full = prove(cs, pk, srs, ckpt=ck)
    assert ck.completed() == ["r1", "r2", "r3", "r5"]

    # simulate a crash after round 2
    ck2 = RoundCheckpoint(path)
    del ck2.data["r3"]
    del ck2.data["r5"]
    checkpoint.save(path, ck2.data)

    # resume: rounds 1-2 must load, not recompute (commit call count)
    calls = {"n": 0}
    orig_commit = kzg.commit

    def counting(*args, **kw):
        calls["n"] += 1
        return orig_commit(*args, **kw)

    kzg.commit = counting
    try:
        resumed = prove(cs, pk, srs, ckpt=RoundCheckpoint(path))
    finally:
        kzg.commit = orig_commit
    # r3 re-commits 4 chunks (+2 aggregate openings go via open_aggregate
    # -> kzg.commit): r1's 4 wire commits and r2's z commit must NOT run
    assert calls["n"] == 6, calls["n"]
    assert resumed.to_bytes() == full.to_bytes()
    assert verify(resumed, vk, cs.pi, srs)
