"""KZG commitments on the TPU: SRS G1 powers resident on device,
polynomial coefficients arrive as Montgomery limb arrays straight from
the device prover engine — no host round-trip until the 48-byte
commitment leaves for the transcript (SURVEY.md §3.2 "commit" hot
spots)."""

import numpy as np
import jax
import jax.numpy as jnp

from ..params import LIMB_BITS
from ..fields import device as dev
from ..curves import device_g1 as dg1
from . import msm_device


def extract_digits(canonical_limbs, c: int):
    """(n, 16) canonical u16 limbs -> (W, n) int32 window digits,
    entirely on device.  c must divide 16."""
    assert LIMB_BITS % c == 0
    per_limb = LIMB_BITS // c
    n_limbs = canonical_limbs.shape[-1]
    digs = []
    for w in range(n_limbs * per_limb):
        limb = canonical_limbs[:, w // per_limb]
        digs.append(((limb >> (c * (w % per_limb))) &
                     ((1 << c) - 1)).astype(jnp.int32))
    return jnp.stack(digs)


class DeviceCommitter:
    """Bind a trimmed SRS to the device once; `commit` maps Montgomery
    coefficient arrays to affine G1 commitments."""

    def __init__(self, srs, max_len: int, c: int = 4):
        assert max_len <= len(srs.powers_g1)
        self.c = c
        self.points = dg1.points_to_device(srs.powers_g1[:max_len])
        self.max_len = max_len

    def commit(self, coeffs_mont):
        n = coeffs_mont.shape[0]
        assert n <= self.max_len, "polynomial exceeds committed SRS"
        if n < self.max_len:
            # zero-pad to the committed length: zero scalars are
            # MSM-neutral, and a single shape means every commit in a
            # proof reuses one compiled MSM
            coeffs_mont = jnp.concatenate(
                [coeffs_mont,
                 jnp.zeros((self.max_len - n, 16), jnp.uint32)])
        canon = dev.from_mont(coeffs_mont, dev.FR)
        digits = extract_digits(canon, self.c)
        out = msm_device.msm_device(self.points, digits, self.c)
        return dg1.points_from_device(tuple(x[None] for x in out))[0]
