"""MXU-matmul NTT (int8 DFT levels + matmul-REDC) vs the host oracle."""

import random

import numpy as np
import jax.numpy as jnp

from tpu_plonk.params import R_MOD, FR_MONT_R
from tpu_plonk.fields import limbs
from tpu_plonk.poly import ntt_mxu
from tpu_plonk.poly.domain import Domain

rng = random.Random(0x37C)


def test_digit_roundtrip():
    vals = [rng.randrange(R_MOD) for _ in range(16)] + [0, 1, R_MOD - 1]
    x = jnp.asarray(limbs.fr_to_limbs(vals))
    back = ntt_mxu.digits_to_limbs(ntt_mxu.limbs_to_digits(x))
    assert limbs.limbs_to_ints(np.asarray(back)) == vals


def test_renorm_log_depth():
    """The log-depth carry renormalization vs a python-int oracle,
    including adversarial carry chains (all-max columns, all-127
    propagate rows, single huge column rippling across the width)."""
    nprng = np.random.default_rng(0x41)
    for bound, nc, n_out in [(2**31 - 1, 80, 84), (2**31 - 1, 80, 80),
                             (640000, 39, 39), (2**20, 76, 80),
                             (127, 10, 14), (2**31 - 1, 5, 12)]:
        cols = nprng.integers(0, bound + 1, size=(16, nc),
                              dtype=np.int64).astype(np.int32)
        cols[0] = bound
        cols[1] = min(127, bound)
        cols[2, :] = 0
        cols[2, 0] = bound
        got = np.asarray(ntt_mxu.renorm(jnp.asarray(cols), n_out))
        for r in range(16):
            v = sum(int(c) << (7 * i) for i, c in enumerate(cols[r]))
            want = [(v >> (7 * i)) & 0x7F for i in range(n_out)]
            assert [int(x) & 0x7F for x in got[r]] == want


def test_redc_digits():
    # REDC'(T) == T * 2^-273 mod q for random T < 2^500
    ts = [rng.randrange(1 << 500) for _ in range(8)]
    cols = np.zeros((8, 80), dtype=np.int32)
    for i, t in enumerate(ts):
        for d in range(80):
            cols[i, d] = (t >> (7 * d)) & 0x7F
    out = ntt_mxu.redc_digits(jnp.asarray(cols, jnp.int8))
    rp_inv = pow(1 << 273, -1, R_MOD)
    for i, t in enumerate(ts):
        got = sum(int(v) << (7 * d)
                  for d, v in enumerate(np.asarray(out)[i]))
        assert got % R_MOD == t * rp_inv % R_MOD
        assert got < 2 * R_MOD  # lazy bound


def test_mxu_ntt_matches_oracle():
    log_n, radix = 8, 16
    n = 1 << log_n
    coeffs = [rng.randrange(R_MOD) for _ in range(n)]
    x = jnp.asarray(limbs.fr_to_limbs(
        [c * FR_MONT_R % R_MOD for c in coeffs]))
    y = ntt_mxu.ntt_mxu(x, log_n, radix)
    rinv = pow(FR_MONT_R, -1, R_MOD)
    got = [v * rinv % R_MOD for v in limbs.limbs_to_ints(np.asarray(y))]
    assert got == Domain(n).ntt(coeffs)


def test_mxu_intt_roundtrip():
    log_n, radix = 8, 16
    n = 1 << log_n
    coeffs = [rng.randrange(R_MOD) for _ in range(n)]
    x = jnp.asarray(limbs.fr_to_limbs(
        [c * FR_MONT_R % R_MOD for c in coeffs]))
    y = ntt_mxu.ntt_mxu(x, log_n, radix)
    back = ntt_mxu.ntt_mxu(y, log_n, radix, inverse=True)
    rinv = pow(FR_MONT_R, -1, R_MOD)
    got = [v * rinv % R_MOD for v in limbs.limbs_to_ints(np.asarray(back))]
    assert got == coeffs
    # and the inverse alone matches the oracle
    evals = Domain(n).ntt(coeffs)
    xe = jnp.asarray(limbs.fr_to_limbs(
        [e * FR_MONT_R % R_MOD for e in evals]))
    ci = ntt_mxu.ntt_mxu(xe, log_n, radix, inverse=True)
    got2 = [v * rinv % R_MOD for v in limbs.limbs_to_ints(np.asarray(ci))]
    assert got2 == coeffs


def _to_dev(vals):
    return jnp.asarray(limbs.fr_to_limbs(
        [v * FR_MONT_R % R_MOD for v in vals]))


def _from_dev(y):
    rinv = pow(FR_MONT_R, -1, R_MOD)
    return [v * rinv % R_MOD for v in limbs.limbs_to_ints(np.asarray(y))]


def test_mxu_scale_folding():
    """in_scale/out_scale folded into the DFT/twiddle constants must be
    bit-identical to explicit pre/post Montgomery multiplies (the
    mechanism behind zero-cost coset and quotient-phase transforms)."""
    log_n, radix = 8, 16
    n = 1 << log_n
    coeffs = [rng.randrange(R_MOD) for _ in range(n)]
    a = 0x1234567FEDCBA % R_MOD          # arbitrary coset scale
    # forward with in_scale == NTT of scaled coefficients
    got = _from_dev(ntt_mxu.ntt_mxu(_to_dev(coeffs), log_n, radix,
                                    in_scale=a))
    want = Domain(n).ntt([c * pow(a, j, R_MOD) % R_MOD
                          for j, c in enumerate(coeffs)])
    assert got == want
    # inverse with out_scale == coefficients scaled post-transform
    ainv = pow(a, -1, R_MOD)
    back = _from_dev(ntt_mxu.ntt_mxu(_to_dev(want), log_n, radix,
                                     inverse=True, out_scale=ainv))
    assert back == coeffs
    # out_scale on the forward direction too
    got2 = _from_dev(ntt_mxu.ntt_mxu(_to_dev(coeffs), log_n, radix,
                                     out_scale=a))
    plain = Domain(n).ntt(coeffs)
    assert got2 == [e * pow(a, k, R_MOD) % R_MOD
                    for k, e in enumerate(plain)]


def test_fourstep_scale_folding():
    """ntt_4step_many with folded scales vs the oracle (3-MXU-level
    composition; exercises the twiddle-table row/col folding and the
    sub-transform in/out scale threading)."""
    from tpu_plonk.poly import ntt as nttmod
    log_n = 8
    n = 1 << log_n
    coeffs = [rng.randrange(R_MOD) for _ in range(n)]
    g = Domain(n).coset_gen
    got = _from_dev(nttmod.ntt_4step_many(
        _to_dev(coeffs)[None], log_n, in_scale=g)[0])
    want = Domain(n).ntt([c * pow(g, j, R_MOD) % R_MOD
                          for j, c in enumerate(coeffs)])
    assert got == want
    ginv = pow(g, -1, R_MOD)
    back = _from_dev(nttmod.ntt_4step_many(
        _to_dev(want)[None], log_n, inverse=True, out_scale=ginv)[0])
    assert back == coeffs


def test_ntt_many_scale_small_route():
    """ntt_many(scale=) on the small (butterfly) route: explicit
    multiply fallback must match the oracle both directions."""
    from tpu_plonk.poly import ntt as nttmod
    log_n = 6
    n = 1 << log_n
    coeffs = [rng.randrange(R_MOD) for _ in range(n)]
    s = 7
    got = _from_dev(nttmod.ntt_many(_to_dev(coeffs)[None], log_n,
                                    scale=s)[0])
    want = Domain(n).ntt([c * pow(s, j, R_MOD) % R_MOD
                          for j, c in enumerate(coeffs)])
    assert got == want
    sinv = pow(s, -1, R_MOD)
    back = _from_dev(nttmod.ntt_many(_to_dev(want)[None], log_n,
                                     inverse=True, scale=sinv)[0])
    assert back == coeffs


def test_fused_pipeline_subprocess():
    """Fused Pallas digit pipeline vs the jnp path (batched MXU route
    + the full ntt_4step prover route), isolated in a fresh process —
    the r4 full-suite run aborted the long-lived pytest process in the
    XLA CPU compiler right here (tests/ntt_pallas_worker.py)."""
    from tests.conftest_subproc import run_isolated
    run_isolated("tests.ntt_pallas_worker", n_devices=1)


def test_renorm0_carry_chains():
    """ntt_mxu_pl._renorm0 (the fused kernel's axis-0 renorm — whose
    Kogge-Stone propagate flag is now int32 from creation, the Mosaic
    i1 rule) vs a python-int oracle on adversarial carry chains:
    all-max columns, all-127 propagate rows, one huge column rippling
    across the full width."""
    from tpu_plonk.poly import ntt_mxu_pl
    nprng = np.random.default_rng(0x52)
    for bound, nc, n_out in [(2**31 - 1, 80, 84), (2**31 - 1, 80, 80),
                             (640000, 39, 39), (127, 10, 14)]:
        cols = nprng.integers(0, bound + 1, size=(nc, 8),
                              dtype=np.int64).astype(np.int32)
        cols[:, 0] = bound                    # all-max column
        cols[:, 1] = min(127, bound)          # all-propagate column
        cols[:, 2] = 0
        cols[0, 2] = bound                    # single ripple source
        got = np.asarray(ntt_mxu_pl._renorm0(jnp.asarray(cols), n_out))
        for r in range(8):
            v = sum(int(c) << (7 * i) for i, c in enumerate(cols[:, r]))
            want = [(v >> (7 * i)) & 0x7F for i in range(n_out)]
            assert [int(x) & 0x7F for x in got[:, r]] == want, (bound, r)
