"""Device G1 ops and the chunked-CSR TPU Pippenger vs host oracle."""

import random

import numpy as np
import jax.numpy as jnp

from tpu_plonk.params import R_MOD
from tpu_plonk.curves import g1, device_g1 as dg1
from tpu_plonk.fields import limbs
from tpu_plonk.pcs import msm as hostmsm
from tpu_plonk.pcs import msm_csr

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


def test_signed_digit_recode_roundtrip():
    scalars = [rng.randrange(R_MOD) for _ in range(50)] + [0, 1, R_MOD - 1]
    canon = np.asarray(limbs.ints_to_limbs(scalars, 16))
    for c in (8, 12, 13):
        sd = msm_csr.recode_signed(msm_csr.limbs_to_digits(canon, c), c)
        half = 1 << (c - 1)
        assert sd.max() <= half and sd.min() >= -half + 1
        assert sd.shape[0] <= msm_csr.signed_window_count(c)
        for i in (0, 25, len(scalars) - 1):
            v = sum(int(sd[w, i]) * (1 << (c * w))
                    for w in range(sd.shape[0]))
            assert v == scalars[i]


def test_chunked_csr_structure():
    """Every nonzero digit appears exactly once in the right bucket with
    the right sign; level-1 rows referenced at most once."""
    scalars = [rng.randrange(2**40) for _ in range(64)]
    canon = np.asarray(limbs.ints_to_limbs(scalars, 16))
    sd = msm_csr.recode_signed(msm_csr.limbs_to_digits(canon, 8, 5), 8)
    l1, l2 = msm_csr.build_csr(sd, 8, chunk=2)  # tiny chunk -> multi-row
    seen = {}
    for w in range(l2.shape[0]):
        for b in range(l2.shape[1]):
            for rid in l2[w, b]:
                if rid == 0:
                    continue
                for e in l1[rid - 1]:
                    if e == 0:
                        continue
                    i = abs(int(e)) - 1
                    assert sd[w, i] == (-(b + 1) if e < 0 else b + 1)
                    seen[(w, i)] = seen.get((w, i), 0) + 1
    assert sum(seen.values()) == int((sd != 0).sum())
    assert all(v == 1 for v in seen.values())
    refs = l2[l2 > 0]
    assert len(refs) == len(set(refs.tolist()))


def test_msm_device_matches_host():
    n = 64
    pts = _points(n)
    # 40-bit scalars with 5 windows: full pipeline, affordable compile
    scalars = [rng.randrange(2**40) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    want = hostmsm.msm(pts, scalars)
    got = msm_csr.msm(pts, scalars, c=8, n_windows=5)
    assert got == want


def test_msm_device_duplicate_digits():
    # all-equal scalars: every point lands in the same bucket per
    # window (maximal skew -> the chunk/level-2 path does the work)
    n = 16
    pts = _points(n)
    scalars = [12345] * n
    want = hostmsm.msm(pts, scalars)
    got = msm_csr.msm(pts, scalars, c=8, n_windows=5)
    assert got == want
