"""Device NTT vs host-int oracle; domain bookkeeping."""

import random

from tpu_plonk.params import R_MOD
from tpu_plonk.poly.domain import Domain
from tpu_plonk.poly import ntt, poly

rng = random.Random(0x17E57)


def test_domain_basics():
    d = Domain(8)
    assert pow(d.omega, 8, R_MOD) == 1
    assert pow(d.omega, 4, R_MOD) != 1
    assert d.vanishing_eval(d.omega) == 0
    x = rng.randrange(R_MOD)
    ls = d.lagrange_evals(x, 3)
    # sum of all lagrange at x == 1
    total = sum(d.lagrange_evals(x)) % R_MOD
    assert total == 1
    # L_i(w^j) = delta_ij
    assert d.lagrange_evals(d.elements()[2])[2] == 1
    assert d.lagrange_evals(d.elements()[2])[1] == 0
    assert ls is not None


def test_host_ntt_roundtrip_and_evaluation():
    d = Domain(16)
    coeffs = [rng.randrange(R_MOD) for _ in range(16)]
    evals = d.ntt(coeffs)
    # NTT output i == p(w^i)
    for i, w in enumerate(d.elements()[:4]):
        assert evals[i] == poly.evaluate(coeffs, w)
    assert d.intt(evals) == coeffs
    # coset: evals over g*H
    cevals = d.coset_ntt(coeffs)
    g = d.coset_gen
    assert cevals[1] == poly.evaluate(coeffs, g * d.omega % R_MOD)
    assert d.coset_intt(cevals) == coeffs


def test_device_ntt_matches_host():
    for log_n in (3, 6, 10):
        n = 1 << log_n
        d = Domain(n)
        coeffs = [rng.randrange(R_MOD) for _ in range(n)]
        assert ntt.ntt_ints(coeffs, log_n) == d.ntt(coeffs)
        evals = d.ntt(coeffs)
        assert ntt.ntt_ints(evals, log_n, inverse=True) == coeffs


def test_device_coset_ntt_matches_host():
    log_n = 6
    n = 1 << log_n
    d = Domain(n)
    coeffs = [rng.randrange(R_MOD) for _ in range(n)]
    assert ntt.ntt_ints(coeffs, log_n, coset=True) == d.coset_ntt(coeffs)
    cevals = d.coset_ntt(coeffs)
    assert ntt.ntt_ints(cevals, log_n, inverse=True, coset=True) == coeffs


def test_poly_helpers():
    p = [1, 2, 3]
    q = [5, 6]
    assert poly.mul(p, q) == [5, 16, 27, 18]
    z = rng.randrange(R_MOD)
    pz = poly.evaluate(p, z)
    quot = poly.ruffini(poly.sub(p, [pz]), z)
    # (p(X) - p(z)) / (X - z) has degree deg(p) - 1
    assert len(quot) == 2
    # check: quot * (X - z) + p(z) == p
    recon = poly.add(poly.mul(quot, [(-z) % R_MOD, 1]), [pz])
    assert poly.trim(recon) == poly.trim(p)


def test_fr_dusk_op_surface():
    from tpu_plonk.fields import fr
    assert fr.reduce(R_MOD + 5) == 5
    assert fr.divn(12, 2) == 3
    assert fr.pow_of_2(10) == 1024
    assert fr.pow_of_2(256) == pow(2, 256, R_MOD)


def test_poly_mul_fft_matches_schoolbook():
    p = [rng.randrange(R_MOD) for _ in range(100)]
    q = [rng.randrange(R_MOD) for _ in range(77)]
    assert poly.trim(poly.mul_fft(p, q)) == poly.trim(poly.mul(p, q))
    assert poly.mul_fft([], q) == []
    small = poly.mul_fft([1, 2], [3, 4])
    assert small == [3, 10, 8]


def test_fourstep_matches_oracle():
    """Single-chip four-step decomposition (the 2^20+ scale route) is
    exact at small sizes vs the host Domain oracle, both directions."""
    import numpy as np
    import jax.numpy as jnp
    from tpu_plonk.params import FR_MONT_R
    from tpu_plonk.fields import limbs
    from tpu_plonk.poly import ntt as nttmod

    rinv = pow(FR_MONT_R, -1, R_MOD)
    for log_n in (6, 9):
        n = 1 << log_n
        coeffs = [(i * 31 + 7) % R_MOD for i in range(n)]
        x = jnp.asarray(limbs.fr_to_limbs(
            [c * FR_MONT_R % R_MOD for c in coeffs]))
        y = nttmod.ntt_4step(x, log_n)
        got = [v * rinv % R_MOD for v in limbs.limbs_to_ints(np.asarray(y))]
        assert got == Domain(n).ntt(coeffs)
        xb = nttmod.ntt_4step(y, log_n, inverse=True)
        back = [v * rinv % R_MOD
                for v in limbs.limbs_to_ints(np.asarray(xb))]
        assert back == coeffs


def test_fourstep_batched_matches_single():
    """ntt_4step_many (the quotient phases' 6-poly batch at 2^20+)
    equals per-poly transforms bit-for-bit, both directions."""
    import numpy as np
    import jax.numpy as jnp
    from tpu_plonk.params import FR_MONT_R
    from tpu_plonk.fields import limbs
    from tpu_plonk.poly import ntt as nttmod

    log_n = 8
    n = 1 << log_n
    polys = [[(i * k + 13 * k + i) % R_MOD for i in range(n)]
             for k in range(1, 4)]
    xs = jnp.stack([jnp.asarray(limbs.fr_to_limbs(
        [c * FR_MONT_R % R_MOD for c in p])) for p in polys])
    for inverse in (False, True):
        got = nttmod.ntt_4step_many(xs, log_n, inverse=inverse)
        for k in range(3):
            want = nttmod.ntt_4step(xs[k], log_n, inverse=inverse)
            assert np.array_equal(np.asarray(got[k]), np.asarray(want))
