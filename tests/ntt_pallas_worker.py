"""Fused-Pallas NTT digit-pipeline checks, run in a FRESH process by
tests/test_ntt_mxu.py::test_fused_pipeline_subprocess via
conftest_subproc.run_isolated.

Why isolated: these are among the largest interpret-mode compiles in
the suite, and they sit late in the alphabetical test order — the
full-suite run of r4 aborted the long-lived pytest process inside the
XLA CPU compiler exactly here (conftest_subproc docstring; same
failure mode as test_msm_device / test_csr_device)."""

import random

import numpy as np
import jax.numpy as jnp


def worker_main():
    from tpu_plonk.params import R_MOD, FR_MONT_R
    from tpu_plonk.fields import limbs
    from tpu_plonk.poly import ntt_mxu
    from tpu_plonk.poly import ntt as nttmod
    from tpu_plonk.poly.domain import Domain

    rng = random.Random(0x37C)

    # --- fused digit pipeline (interpret mode) vs the jnp path ---
    log_n, radix = 8, 16
    n = 1 << log_n
    coeffs = [rng.randrange(R_MOD) for _ in range(n)]
    x = jnp.asarray(limbs.fr_to_limbs(
        [c * FR_MONT_R % R_MOD for c in coeffs]))[None]
    for inverse in (False, True):
        for scale in (1, 7):
            kw = ({"out_scale": scale} if inverse
                  else {"in_scale": scale})
            ref = ntt_mxu.ntt_mxu_batched(x, log_n, radix,
                                          inverse=inverse,
                                          use_pl=False, **kw)
            got = ntt_mxu.ntt_mxu_batched(x, log_n, radix,
                                          inverse=inverse,
                                          use_pl=True, **kw)
            assert np.array_equal(np.asarray(got), np.asarray(ref)), \
                (inverse, scale)

    # --- ntt_4step with the fused pipeline (the 2^20+ prover route)
    # vs the jnp path — forward and inverse with folded coset scales,
    # bit-identical, roundtrip closes ---
    xs = x[0]
    g = Domain(n).coset_gen
    ref_f = nttmod.ntt_4step(xs, log_n, in_scale=g)
    ref_i = nttmod.ntt_4step(ref_f, log_n, inverse=True,
                             out_scale=pow(g, -1, R_MOD))
    old = ntt_mxu.NTT_PALLAS
    ntt_mxu.NTT_PALLAS = True
    try:
        got_f = nttmod.ntt_4step(xs, log_n, in_scale=g)
        got_i = nttmod.ntt_4step(got_f, log_n, inverse=True,
                                 out_scale=pow(g, -1, R_MOD))
    finally:
        ntt_mxu.NTT_PALLAS = old
    assert np.array_equal(np.asarray(got_f), np.asarray(ref_f))
    assert np.array_equal(np.asarray(got_i), np.asarray(ref_i))
    assert np.array_equal(np.asarray(got_i), np.asarray(xs))
