"""In-kernel multiply variants (fields/pallas_redc.py): the MXU-REDC
and 16x16-Comba experiments must be bit-exact drop-ins for the default
split-byte kernels.  Flags are read at module import, so each combo
runs in a fresh subprocess (interpret mode on CPU)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BODY = """
import sys
sys.path.insert(0, {root!r})
import numpy as np, random
import jax.numpy as jnp
from tpu_plonk.params import R_MOD
from tpu_plonk.fields import limbs, device as dev, pallas_fr
from tpu_plonk.curves import g1, device_g1 as dg1, pallas_g1

rng = random.Random(0xA11)
a = [rng.randrange(R_MOD) for _ in range(257)] + [0, 1, R_MOD - 1]
b = [rng.randrange(R_MOD) for _ in range(257)] + [R_MOD - 1, 0, 1]
al = jnp.asarray(np.array(limbs.ints_to_limbs(a, 16), np.uint32))
bl = jnp.asarray(np.array(limbs.ints_to_limbs(b, 16), np.uint32))
got = pallas_fr.mont_mul(al, bl, interpret=True)
want = dev.mont_mul(al, bl, dev.FR)
assert np.array_equal(np.asarray(got), np.asarray(want)), "FR mismatch"

pts = [g1.mul(g1.GEN, rng.randrange(1, 2**60)) for _ in range(31)]
pts.append(None)                       # identity lane
qts = [g1.mul(g1.GEN, rng.randrange(1, 2**60)) for _ in range(32)]
qts[5] = pts[5]                        # doubling lane
qts[6] = g1.neg(pts[6])                # cancellation lane
px = dg1.points_to_device(pts); qx = dg1.points_to_device(qts)
want = dg1.add(px, qx)
gx, gy, gz = pallas_g1.add_t(tuple(c.T for c in px),
                             tuple(c.T for c in qx), interpret=True)
for w, g_ in zip(want, (gx.T, gy.T, gz.T)):
    assert np.array_equal(np.asarray(w), np.asarray(g_)), "G1 mismatch"
print("VARIANT_OK")
"""


@pytest.mark.parametrize("flags", [
    {"TPU_PLONK_PL_MXU": "1"},
    {"TPU_PLONK_PL_MUL16": "1"},
    {"TPU_PLONK_PL_MXU": "1", "TPU_PLONK_PL_MUL16": "1"},
])
def test_variant_bit_exact(flags):
    env = dict(os.environ)
    env.update(flags)
    env["PYTHONPATH"] = ROOT
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, "-c", BODY.format(root=ROOT)],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, (
        res.stdout[-2000:] + "\n---\n" + res.stderr[-2000:])
    assert "VARIANT_OK" in res.stdout
