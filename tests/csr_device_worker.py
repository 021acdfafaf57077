"""Kernel-touching device-CSR MSM checks, run in a FRESH process by
tests/test_csr_device.py::test_csr_device_kernels_subprocess via
conftest_subproc.run_isolated.

Why isolated: each interpret-mode walk unrolls its grid into the XLA
graph, and accumulating those large compiles in the long-lived pytest
process SIGABRTs the XLA CPU compiler (the same failure mode as
test_msm_device — see conftest_subproc docstring; reproduced on the
round-4 full-suite run inside window_sums_device)."""

import random

import numpy as np
import jax.numpy as jnp


def worker_main():
    from tpu_plonk.params import R_MOD
    from tpu_plonk.curves import g1
    from tpu_plonk.fields import limbs
    from tpu_plonk.fields import device as dev
    from tpu_plonk.pcs import msm as hostmsm
    from tpu_plonk.pcs import msm_csr, csr_device
    from tpu_plonk.pcs import srs as srs_mod
    from tpu_plonk.pcs.commit_device import DeviceCommitter
    import os

    rng = random.Random(0xC54D)

    def canon_of(scalars):
        return np.asarray(limbs.ints_to_limbs(
            [s % R_MOD for s in scalars], 16), dtype=np.uint32)

    # --- full pipeline vs the host wNAF oracle (bits=40 keeps the
    # unrolled walk grids small; see test_csr_device docstring) ---
    n, bits = 33, 40
    pts = [g1.mul(g1.GEN, rng.randrange(1, R_MOD)) for _ in range(n)]
    scalars = ([rng.randrange(1 << bits) for _ in range(n - 2)]
               + [0, (1 << bits) - 1])
    packed = msm_csr.pack_points(pts)
    canon = jnp.asarray(canon_of(scalars))
    got = csr_device.msm_device(packed, canon, 8, bits=bits,
                                interpret=True)
    want = hostmsm.msm(pts, scalars)
    assert got == want, "devcsr oracle mismatch"

    # --- skew retry: all-equal digits overflow the uniform m2 and
    # must be detected + retried, never silently truncated ---
    n = 40
    pts = [g1.mul(g1.GEN, k + 2) for k in range(n)]
    scalars = [5] * n                      # every window-0 digit = 5
    packed = msm_csr.pack_points(pts)
    canon = jnp.asarray(canon_of(scalars))
    got = csr_device.msm_device(packed, canon, 8, chunk=16, bits=16,
                                interpret=True)
    assert got == hostmsm.msm(pts, scalars), "skew retry mismatch"

    # --- committer device path == committer host path; commit_many
    # batches DISTINCT polys (cross-poly level-2 offset coverage) with
    # an uneven tail group (3 polys at batch 2 -> k=2 and k=1
    # programs of csr_device._commit_sums_many) ---
    srs = srs_mod.cached_setup(64)
    com = DeviceCommitter(srs, 64, c=8, bits=24)
    monts = [dev.to_mont(jnp.asarray(canon_of(
        [rng.randrange(1 << 24) for _ in range(40)])), dev.FR)
        for _ in range(3)]
    mont = monts[0]
    os.environ["TPU_PLONK_MSM_DEVCSR"] = "1"
    os.environ["TPU_PLONK_COMMIT_BATCH"] = "2"
    got = com.commit(mont)
    got_many = com.commit_many(monts)
    os.environ["TPU_PLONK_MSM_DEVCSR"] = "0"
    del os.environ["TPU_PLONK_COMMIT_BATCH"]
    want = [com.commit(m) for m in monts]
    assert got == want[0], "committer device path != host path"
    assert got_many == want, "commit_many device != host"
