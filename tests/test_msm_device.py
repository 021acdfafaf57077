"""Device G1 ops and TPU Pippenger vs host oracle."""

import random

import numpy as np
import jax.numpy as jnp

from tpu_plonk.params import R_MOD
from tpu_plonk.curves import g1, device_g1 as dg1
from tpu_plonk.pcs import msm as hostmsm
from tpu_plonk.pcs import msm_device

rng = random.Random(0xD57)


def _points(n):
    return [g1.mul(g1.GEN, rng.randrange(1, 2**64)) for _ in range(n)]


def test_device_add_matches_host():
    pts = _points(8)
    qts = _points(8)
    pd = dg1.points_to_device(pts)
    qd = dg1.points_to_device(qts)
    got = dg1.points_from_device(dg1.add(pd, qd))
    want = [g1.add(p, q) for p, q in zip(pts, qts)]
    assert got == want


def test_device_add_edge_cases():
    p = _points(1)[0]
    cases = [
        (p, p, g1.double(p)),               # doubling via unified add
        (p, None, p),                        # identity
        (None, p, p),
        (p, g1.neg(p), None),                # inverse -> infinity
        (None, None, None),
    ]
    pd = dg1.points_to_device([a for a, _, _ in cases])
    qd = dg1.points_to_device([b for _, b, _ in cases])
    got = dg1.points_from_device(dg1.add(pd, qd))
    assert got == [c for _, _, c in cases]


def test_device_roundtrip():
    pts = _points(5) + [None]
    assert dg1.points_from_device(dg1.points_to_device(pts)) == pts


def test_msm_device_matches_host():
    n = 64
    pts = _points(n)
    # 40-bit scalars with 5 windows: full pipeline, affordable compile
    scalars = [rng.randrange(2**40) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    want = hostmsm.msm(pts, scalars)
    got = msm_device.msm(pts, scalars, c=8, n_windows=5)
    assert got == want


def test_msm_device_duplicate_digits():
    # all-equal scalars stress the segmented scan (single segment)
    n = 16
    pts = _points(n)
    scalars = [12345] * n
    want = hostmsm.msm(pts, scalars)
    got = msm_device.msm(pts, scalars, c=8, n_windows=5)
    assert got == want
