"""SRS, host Pippenger MSM, KZG commit/open/batch-check."""

import random

from tpu_plonk.params import R_MOD
from tpu_plonk.curves import g1
from tpu_plonk.pcs import msm as hostmsm
from tpu_plonk.pcs import srs as srs_mod
from tpu_plonk.pcs import kzg
from tpu_plonk.poly import poly

rng = random.Random(0x5125)


def test_jacobian_ops():
    p = g1.mul(g1.GEN, 123)
    q = g1.mul(g1.GEN, 456)
    jp, jq = hostmsm.jac_from_affine(p), hostmsm.jac_from_affine(q)
    assert hostmsm.jac_to_affine(hostmsm.jac_add(jp, jq)) == \
        g1.mul(g1.GEN, 579)
    assert hostmsm.jac_to_affine(hostmsm.jac_double(jp)) == \
        g1.mul(g1.GEN, 246)
    assert hostmsm.jac_to_affine(
        hostmsm.jac_add(jp, hostmsm.jac_from_affine(g1.neg(p)))) is None
    assert hostmsm.jac_to_affine(hostmsm.jac_add(jp, hostmsm.J_INF)) == p


def test_msm_matches_naive():
    n = 50
    points = [g1.mul(g1.GEN, rng.randrange(1, 2**40)) for _ in range(n)]
    scalars = [rng.randrange(R_MOD) for _ in range(n)]
    scalars[3] = 0
    expected = None
    for p, s in zip(points, scalars):
        expected = g1.add(expected, g1.mul(p, s))
    assert hostmsm.msm(points, scalars) == expected


def test_srs_roundtrip_and_structure():
    srs = srs_mod.setup(10, seed=b"test seed")
    assert len(srs.powers_g1) == 11
    # powers are consistent: [tau^{i+1}]G = tau * [tau^i]G
    import hashlib
    tau = int.from_bytes(hashlib.sha512(b"test seed").digest(),
                         "little") % R_MOD
    assert srs.powers_g1[1] == g1.mul(g1.GEN, tau)
    assert srs.powers_g1[5] == g1.mul(g1.GEN, pow(tau, 5, R_MOD))
    srs2 = srs_mod.SRS.from_bytes(srs.to_bytes())
    assert srs2.powers_g1 == srs.powers_g1
    assert srs2.g2_tau == srs.g2_tau


def test_kzg_single_open_and_check():
    srs = srs_mod.cached_setup(16)
    p = [rng.randrange(R_MOD) for _ in range(12)]
    c = kzg.commit(p, srs)
    z = rng.randrange(R_MOD)
    w, v = kzg.open_single(p, z, srs)
    assert v == poly.evaluate(p, z)
    assert kzg.batch_check([z], [w], [c], [v], u=1, srs=srs)
    # wrong value fails
    assert not kzg.batch_check([z], [w], [c], [(v + 1) % R_MOD], u=1, srs=srs)


def test_kzg_aggregate_two_points():
    srs = srs_mod.cached_setup(16)
    polys = [[rng.randrange(R_MOD) for _ in range(10)] for _ in range(3)]
    comms = [kzg.commit(p, srs) for p in polys]
    z1, z2 = rng.randrange(R_MOD), rng.randrange(R_MOD)
    v_ch = rng.randrange(2, R_MOD)
    u = rng.randrange(2, R_MOD)

    w1 = kzg.open_aggregate(polys, z1, v_ch, srs)
    w2 = kzg.open_aggregate(polys[:2], z2, v_ch, srs)

    agg_c1 = kzg.aggregate_commitments(comms, v_ch)
    agg_v1 = kzg.aggregate_values([poly.evaluate(p, z1) for p in polys], v_ch)
    agg_c2 = kzg.aggregate_commitments(comms[:2], v_ch)
    agg_v2 = kzg.aggregate_values(
        [poly.evaluate(p, z2) for p in polys[:2]], v_ch)

    assert kzg.batch_check([z1, z2], [w1, w2], [agg_c1, agg_c2],
                           [agg_v1, agg_v2], u, srs)
    assert not kzg.batch_check([z1, z2], [w2, w1], [agg_c1, agg_c2],
                               [agg_v1, agg_v2], u, srs)
