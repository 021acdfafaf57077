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


def _msm_oracle_case(n, scalars):
    pts = _points(n)
    want = hostmsm.msm(pts, scalars)
    got = msm_csr.msm(pts, scalars, c=8, n_windows=5)
    assert got == want


_SUBPROC_SNIPPET = """
import sys; sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_compilation_cache_dir",
                  {root!r} + "/.cache/jax-test")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import tests.test_msm_device as t
t._msm_oracle_case(64, [t.rng.randrange(2**40) for _ in range(62)]
                   + [0, 1])
t._msm_oracle_case(16, [12345] * 16)
print("MSM_SUBPROC_OK")
"""


def test_fused_accumulate_matches_per_step():
    """accumulate_csr (whole-list-walk fused kernel, interpret mode)
    vs the per-step jnp accumulate — including duplicate entries in one
    row (unified-add doubling), signs, and pad slots."""
    from tpu_plonk.curves import pallas_g1

    pts = _points(10)
    packed = msm_csr.pack_points(pts)               # (11, 3, 24)
    idx = np.zeros((256, 4), np.int32)
    idx[0] = [1, -2, 3, 0]
    idx[1] = [5, 5, -5, 10]                          # dup -> doubling
    idx[2] = [-7, 7, 0, 0]                           # cancels to identity
    idx[3] = [4, 0, 0, 6]
    want = msm_csr._accumulate_impl(packed, jnp.asarray(idx))
    tbl = jnp.concatenate(
        [packed[:, 0, :].T, packed[:, 1, :].T], axis=0)
    ox, oy, oz = pallas_g1.accumulate_csr(tbl, idx, affine=True,
                                          interpret=True)
    got = jnp.transpose(jnp.stack([ox, oy, oz]), (2, 0, 1))
    # the fused path pads the list walk to CB entries; the extra
    # P + identity complete-adds rescale the projective representative
    # (X:Y:Z) -> (XY:Y^2:ZY), so compare as normalized affine points
    assert (msm_csr.sums_to_host(got[:8])
            == msm_csr.sums_to_host(want[:8]))


def test_fused_window_sums_match_jnp():
    """Full fused pipeline (both CSR passes + weighted scan) vs the
    per-step jnp pipeline on a small MSM."""
    n, c = 40, 5
    pts = _points(n)
    scalars = [rng.randrange(2**30) for _ in range(n - 2)] + [0, 7]
    packed = msm_csr.pack_points(pts)
    l1, l2 = msm_csr.scalars_to_csr(scalars, c, n_windows=7)
    ref = msm_csr.window_sums(packed, l1, l2, c,
                              use_pallas=False, use_fused=False)
    got = msm_csr.window_sums_fused(packed, jnp.asarray(l1), l2, c,
                                    interpret=True)
    # affine comparison (see test above for why representatives differ)
    want_pt = msm_csr.fold_windows_host(msm_csr.sums_to_host(ref), c)
    got_pt = msm_csr.fold_windows_host(msm_csr.sums_to_host(got), c)
    assert got_pt == want_pt
    assert got_pt == hostmsm.msm(pts, scalars)


def test_msm_device_matches_host_subprocess():
    """Full CSR MSM pipeline vs the host Pippenger oracle — includes
    the duplicate-digit (maximal bucket skew) case.

    Runs in a FRESH python process: the XLA CPU compiler on this box
    segfaults compiling the window_sums program late in a long-lived
    pytest process (3/3 full-suite runs crashed at exactly this
    compile; the same compile succeeds standalone and after short
    sequences).  Process isolation sidesteps the compiler-state bug
    without weakening coverage; the compile cache is shared so the
    cost is one python startup."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = root
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, "-c", _SUBPROC_SNIPPET.format(root=root)],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    assert "MSM_SUBPROC_OK" in res.stdout
