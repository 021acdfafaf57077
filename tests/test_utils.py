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
    assert payload["proof_bytes"] == 1072
