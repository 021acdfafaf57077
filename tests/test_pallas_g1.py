"""Fused Pallas G1 add kernel: bit-exactness vs the jnp device path.

On CPU CI the kernel runs in interpret mode; the real-TPU kernel is
exercised (and asserted bit-exact vs the jnp path) by the bench/driver
runs.  Reference analog: dusk-bls12_381 G1 projective add under
Pippenger (SURVEY.md §2.4/§2.6)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_plonk.curves import g1, device_g1 as dg1, pallas_g1
from tpu_plonk.fields import device as dev


@pytest.fixture(scope="module")
def pts():
    p = dg1.points_to_device([g1.mul(g1.GEN, k + 3) for k in range(8)])
    q = dg1.points_to_device([g1.mul(g1.GEN, 2 * k + 5) for k in range(8)])
    return p, q


def test_add_matches_jnp(pts):
    p, q = pts
    ref = dg1.add(p, q)
    out = pallas_g1.add(p, q, interpret=True)
    for r, o in zip(ref, out):
        assert np.array_equal(np.asarray(r), np.asarray(o))


def test_add_identity_and_double(pts):
    p, _ = pts
    ident = dg1.identity((8,))
    ref_i = dg1.add(p, ident)
    out_i = pallas_g1.add(p, ident, interpret=True)
    ref_d = dg1.add(p, p)
    out_d = pallas_g1.add(p, p, interpret=True)
    for r, o in zip(ref_i + ref_d, out_i + out_d):
        assert np.array_equal(np.asarray(r), np.asarray(o))


def test_signed_add_matches_neg_mod(pts):
    p, q = pts
    sign = jnp.asarray(np.array([0, 1] * 4, dtype=np.uint32))
    ny = dev.neg_mod(q[1], dev.FP)
    qy = jnp.where(sign[:, None] != 0, ny, q[1])
    ref = dg1.add(p, (q[0], qy, q[2]))
    pt = tuple(c.T for c in p)
    qt = tuple(c.T for c in q)
    out = pallas_g1.add_t(pt, qt, sign=sign, interpret=True)
    for r, o in zip(ref, out):
        assert np.array_equal(np.asarray(r), np.asarray(o).T)


def test_nonmultiple_tile_padding(pts):
    p, q = pts
    # 8 points < TILE exercises the pad/unpad path already; also check
    # an odd slice keeps exactness
    p3 = tuple(c[:3] for c in p)
    q3 = tuple(c[:3] for c in q)
    ref = dg1.add(p3, q3)
    out = pallas_g1.add(p3, q3, interpret=True)
    for r, o in zip(ref, out):
        assert np.array_equal(np.asarray(r), np.asarray(o))
