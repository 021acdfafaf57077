"""Device KZG commits vs host commit; device engine with device commits
stays byte-identical."""

import random

from tpu_plonk.params import R_MOD
from tpu_plonk.pcs import srs as srs_mod, kzg
from tpu_plonk.pcs.commit_device import DeviceCommitter
from tpu_plonk.proof_system import engine_device as ed

rng = random.Random(0xC0117)


def test_device_commit_matches_host():
    srs = srs_mod.cached_setup(40)
    com = DeviceCommitter(srs, 32, c=4)
    coeffs = [rng.randrange(R_MOD) for _ in range(32)]
    coeffs[3] = 0
    want = kzg.commit(coeffs, srs)
    got = com.commit(ed.to_dev(coeffs))
    assert got == want
    # zero polynomial -> identity commitment
    assert com.commit(ed.to_dev([0] * 32)) is None


def test_commit_many_matches_individual():
    """The pipelined batch commit (round-pipeline overlap, SURVEY
    §2.10) must equal per-polynomial commits, including shorter-than-
    max and zero polynomials; prove_device auto-detects commit_many on
    bound committers, so this is the path every device prove takes."""
    srs = srs_mod.cached_setup(40)
    com = DeviceCommitter(srs, 32, c=4)
    polys = [[rng.randrange(R_MOD) for _ in range(32)],
             [rng.randrange(R_MOD) for _ in range(7)],
             [0] * 32]
    want = [kzg.commit(p, srs) for p in polys]
    got = com.commit_many([ed.to_dev(p) for p in polys])
    assert got == want
