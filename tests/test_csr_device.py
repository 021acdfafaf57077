"""On-device CSR MSM (pcs/csr_device.py) vs host oracles.

The device build need not reproduce the host CSR's row layout — only
the bucket decomposition.  Correctness contract: identical affine MSM
results (commitment bytes), checked against the pure-host wNAF oracle
and the host-CSR device pipeline.

The kernel-touching checks run in a FRESH subprocess
(tests/csr_device_worker.py): interpret-mode Pallas unrolls every grid
step into the XLA graph, and those large compiles accumulate into the
known long-lived-process XLA CPU SIGABRT (conftest_subproc
docstring)."""

import random

import numpy as np
import jax.numpy as jnp

from tpu_plonk.params import R_MOD
from tpu_plonk.curves import g1
from tpu_plonk.fields import limbs
from tpu_plonk.pcs import msm as hostmsm
from tpu_plonk.pcs import msm_csr, csr_device

rng = random.Random(0xC54D)


def _canon(scalars):
    return np.asarray(limbs.ints_to_limbs(
        [s % R_MOD for s in scalars], 16), dtype=np.uint32)


def test_digits_signed_matches_host_recode():
    scalars = [rng.randrange(R_MOD) for _ in range(40)] + [
        0, 1, R_MOD - 1, (1 << 255) - 1 if (1 << 255) - 1 < R_MOD else 7]
    canon = _canon(scalars)
    for c in (8, 12, 13, 15):
        W = msm_csr.signed_window_count(c)
        got = np.asarray(csr_device.digits_signed(jnp.asarray(canon), c, W))
        want = msm_csr.pad_windows(
            msm_csr.recode_signed(msm_csr.limbs_to_digits(canon, c), c), W)
        assert (got == want).all()


def test_csr_device_bucket_decomposition():
    """Every (window, bucket) multiset of signed entries must match the
    host builder's — layouts differ, bucket contents cannot.  c=12
    exercises the trimmed top-window table (top_b < B)."""
    for c in (8, 12):
        n, chunk, m2u, m2t = 64, 16, 16, 48
        scalars = [rng.randrange(R_MOD) for _ in range(n)]
        canon = _canon(scalars)
        l1, l2u, l2t, mu, mt = csr_device.csr_device(
            jnp.asarray(canon), c, chunk, m2u, m2t)
        l1 = np.asarray(l1)
        assert int(mu) <= m2u and int(mt) <= m2t
        W = msm_csr.signed_window_count(c)
        sd = msm_csr.pad_windows(
            msm_csr.recode_signed(msm_csr.limbs_to_digits(canon, c), c),
            W)
        B = 1 << (c - 1)
        bt = csr_device.top_b(c, B)
        assert l2t.shape[0] == bt
        l2u, l2t = np.asarray(l2u), np.asarray(l2t)
        for w in range(W):
            for b in range(B):
                want = sorted(
                    int(e) for e in
                    np.where(sd[w] < 0, -(np.arange(n) + 1),
                             np.arange(n) + 1)[np.abs(sd[w]) == b + 1])
                if w == W - 1 and b >= bt:
                    assert want == [], (c, w, b)
                    continue
                lvl2 = l2t if w == W - 1 else l2u[w]
                rows = lvl2[b][lvl2[b] != 0] - 1
                got = sorted(int(e) for r in rows for e in l1[r]
                             if e != 0)
                assert got == want, (c, w, b)


def test_csr_device_kernels_subprocess():
    """Oracle MSM + skew retry + committer path parity, isolated (see
    module docstring).  Scalars are bits-narrowed so each walk grid is
    a handful of unrolled kernel bodies, not hundreds."""
    from tests.conftest_subproc import run_isolated
    run_isolated("tests.csr_device_worker", n_devices=1)
