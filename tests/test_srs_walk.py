"""Walk-based device SRS generation (pcs/srs_device._gen_walk).

The generator expresses [tau^i]G as a Pippenger-transpose CSR walk:
signed digits of tau^i (derived on device from a prefix-product scan)
index a small host table [d * 2^{cw}]G, and the fused CSR-accumulate
kernel sums W table points per SRS point.  On CPU the Pallas kernel is
substituted with the jnp accumulate (interpret-mode pallas unrolls the
grid — CLAUDE.md rule 20); the substitution is exactly the kernel's
documented contract, and the kernels themselves are bit-equal-tested
in test_pallas_g1.py / on chip.

Reference analog: dusk-plonk's PublicParameters::setup generating
powers of tau (SURVEY.md §2.6); the walk formulation is TPU-native.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_plonk.params import R_MOD
from tpu_plonk.pcs import srs_device, msm_csr
from tpu_plonk.fields import limbs
from tpu_plonk.curves import g1


def _jnp_accumulate_csr(tbl, idx, affine=True, interpret=False):
    """CPU stand-in for pallas_g1.accumulate_csr (affine mode): build
    the (P, 3, 24) projective table (row 0 identity, z=one elsewhere)
    and run the jnp per-step accumulate."""
    assert affine
    L = 24
    x = jnp.asarray(tbl)[:L].T                        # (P, L)
    y = jnp.asarray(tbl)[L:].T
    one = y[0]                                        # col 0 y = R mod p
    p_rows = x.shape[0]
    z = jnp.broadcast_to(one[None, :], (p_rows, L)).at[0].set(0)
    points = jnp.stack([x, y, z], axis=1)             # (P, 3, 24)
    sums = msm_csr._accumulate_impl(points, jnp.asarray(idx))
    return sums[:, 0].T, sums[:, 1].T, sums[:, 2].T


def test_digits_to_idx_matches_numpy_recode():
    c = 13
    W = msm_csr.signed_window_count(c)
    half = 1 << (c - 1)
    rng = np.random.default_rng(7)
    vals = [int.from_bytes(rng.bytes(32), "little") % R_MOD
            for _ in range(33)] + [0, 1, R_MOD - 1]
    canon = np.asarray(limbs.ints_to_limbs(vals, 16))
    got = np.asarray(srs_device._digits_to_idx(
        jnp.asarray(canon), c, W))                    # (N, W)
    sd = msm_csr.pad_windows(
        msm_csr.recode_signed(msm_csr.limbs_to_digits(canon, c), c), W)
    want = np.where(sd == 0, 0,
                    np.sign(sd) * (np.abs(sd)
                                   + np.arange(W)[:, None] * half)).T
    assert np.array_equal(got, want)


def test_walk_table_host_spot():
    c, W = 6, 4
    tbl = srs_device._walk_table_host(c, W)
    assert tbl.shape == (48, W * (1 << (c - 1)) + 1)
    from tpu_plonk.params import P_MOD, FP_MONT_R
    rinv = pow(FP_MONT_R, -1, P_MOD)
    half = 1 << (c - 1)
    for w, d in ((0, 1), (1, 3), (3, half)):
        col = w * half + d
        x = limbs.limbs_to_int(tbl[:24, col].astype(np.uint32))
        y = limbs.limbs_to_int(tbl[24:, col].astype(np.uint32))
        want = g1.mul(g1.GEN, d * pow(2, c * w, R_MOD) % R_MOD)
        assert (x * rinv % P_MOD, y * rinv % P_MOD) == want
    # column 0 is the identity pad: x = 0, y = R mod p
    assert not tbl[:24, 0].any()
    assert limbs.limbs_to_int(tbl[24:, 0].astype(np.uint32)) \
        == FP_MONT_R % P_MOD


def test_gen_walk_matches_host_srs(monkeypatch):
    from tpu_plonk.curves import pallas_g1
    monkeypatch.setattr(pallas_g1, "accumulate_csr", _jnp_accumulate_csr)
    tau = srs_device._tau(b"tpu-plonk insecure srs")
    n = 64
    packed = np.asarray(srs_device._gen_walk(tau, n))
    assert packed.shape == (n + 1, 3, 24)
    # row 0 identity; rows 1.. affine [tau^(i-1)]G (checked for ALL
    # rows here — _gen_walk itself spot-checks 4)
    from tpu_plonk.params import P_MOD, FP_MONT_R
    rinv = pow(FP_MONT_R, -1, P_MOD)
    assert not packed[0, 2].any()
    acc = 1
    for i in range(n):
        x = limbs.limbs_to_int(packed[i + 1, 0]) * rinv % P_MOD
        y = limbs.limbs_to_int(packed[i + 1, 1]) * rinv % P_MOD
        assert (x, y) == g1.mul(g1.GEN, acc), f"row {i}"
        acc = acc * tau % R_MOD


def test_gen_walk_bad_row_caught(monkeypatch):
    """The in-generator spot-check must fire on a corrupted walk."""
    from tpu_plonk.curves import pallas_g1

    def corrupt(tbl, idx, affine=True, interpret=False):
        rx, ry, rz = _jnp_accumulate_csr(tbl, idx, affine, interpret)
        return rx + 1, ry, rz      # every row wrong -> any sample fires

    monkeypatch.setattr(pallas_g1, "accumulate_csr", corrupt)
    tau = srs_device._tau(b"tpu-plonk insecure srs")
    with pytest.raises(AssertionError, match="diverges"):
        srs_device._gen_walk(tau, 16)
