"""Device prover engine: the polynomial-heavy prover rounds on TPU
arrays (JAX), mirroring proof_system/prover.py bit-for-bit.

What runs on device (SURVEY.md §3.2 hot paths):
  - wire/z/PI/quotient (i)NTTs and coset transforms
  - grand-product ratios + prefix scan + batch inversion
  - the full widget/permutation constraint evaluation on the 4n coset
  - polynomial evaluations at zeta / zeta*omega
  - aggregate-opening quotients (Ruffini via power/suffix scans)

What stays on host: transcript (merlin), KZG commits (host Pippenger or
pcs/commit_device CSR MSM), proof assembly.  The host engine is the oracle; the
cross-check test asserts identical proof bytes.

All device values are Montgomery-form (..., 16) uint32 limb arrays.
Montgomery closure: mont(x)*mont(y) -> mont(x*y) under mont_mul, so the
whole pipeline stays in Montgomery form; conversions happen only at the
transcript/commit boundaries.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..params import R_MOD, FR_MONT_R, K1, K2, K3, JUBJUB_D
from ..fields import limbs
from ..fields import device as dev
from ..poly import ntt as nttmod

FR = dev.FR
RINV = pow(FR_MONT_R, -1, R_MOD)

import os as _os
#: opt-in: run the quotient pointwise body as ONE fused Pallas kernel
#: per phase (proof_system/quotient_pallas.py) on real TPUs; bit-exact
#: either way (tests/test_quotient_pallas.py).
_QUOT_PALLAS = _os.environ.get("TPU_PLONK_QUOT_PALLAS", "0") \
    not in ("", "0")


# ---------------------------------------------------------------------------
# host <-> device scalar helpers
# ---------------------------------------------------------------------------

def to_dev(values):
    """list of ints -> (len, 16) Montgomery limbs; already-device
    arrays (the preprocess_device tables) pass through unchanged.

    The push crosses the tunnel as uint16 (the limbs carry 16 bits
    each) and upcasts on device: the 2^20 witness is 67 MB as u32 but
    33 MB on the wire, and the wire is the cost (~9 MB/s push measured
    mid-r4 — half of round 1's 15.7 s was this transfer)."""
    if isinstance(values, jnp.ndarray):
        return values
    buf = b"".join((v % R_MOD * FR_MONT_R % R_MOD).to_bytes(32, "little")
                   for v in values)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(len(values), 16)
    return jnp.asarray(u16).astype(jnp.uint32)


def to_dev_scalar(v):
    return to_dev([v])[0]


def from_dev(arr):
    """(..., 16) Montgomery limbs -> list of ints."""
    vals = limbs.limbs_to_ints(np.asarray(arr).reshape(-1, 16))
    return [v * RINV % R_MOD for v in vals]


@functools.lru_cache(maxsize=None)
def _const(v: int):
    return np.asarray(limbs.int_to_limbs(v % R_MOD * FR_MONT_R % R_MOD, 16))


def const(v: int, shape=()):
    return jnp.broadcast_to(jnp.asarray(_const(v)), shape + (16,))


def mm(a, b):
    return dev.mont_mul(a, b, FR)


def ad(a, b):
    return dev.add_mod(a, b, FR)


def sb(a, b):
    return dev.sub_mod(a, b, FR)


def cmul(v: int, x):
    """constant * x (constant as Montgomery immediate)."""
    return mm(const(v, x.shape[:-1]), x)


def csub(x, v: int):
    return sb(x, const(v, x.shape[:-1]))


# ---------------------------------------------------------------------------
# vectorized widget constraints (mirrors proof_system/constraints.py)
# ---------------------------------------------------------------------------

def delta_dev(x):
    """x(x-1)(x-2)(x-3)."""
    return mm(mm(x, csub(x, 1)), mm(csub(x, 2), csub(x, 3)))


def arith_value_dev(w, q):
    a, b, c, d = w
    out = mm(q["q_m"], mm(a, b))
    out = ad(out, mm(q["q_l"], a))
    out = ad(out, mm(q["q_r"], b))
    out = ad(out, mm(q["q_4"], d))
    out = ad(out, mm(q["q_o"], c))
    return ad(out, q["q_c"])


def range_scalar_dev(w, wn, kappa):
    a, b, c, d = w
    dn = wn[3]
    k1 = kappa
    k2 = mm(kappa, kappa)
    k3 = mm(k2, kappa)
    out = delta_dev(sb(c, cmul(4, d)))
    out = ad(out, mm(k1, delta_dev(sb(b, cmul(4, c)))))
    out = ad(out, mm(k2, delta_dev(sb(a, cmul(4, b)))))
    return ad(out, mm(k3, delta_dev(sb(dn, cmul(4, a)))))


def logic_scalar_dev(w, wn, q_c, kappa):
    """Mirror of constraints.logic_scalar (2-bit quads, product wire on
    the current row's c — see that docstring for the derivation)."""
    from .constraints import _C83_6, _C27_2, _C2_3
    a, b, c, d = w
    an, bn, _cn, dn = wn
    qa = sb(an, cmul(4, a))
    qb = sb(bn, cmul(4, b))
    qd = sb(dn, cmul(4, d))
    wp = c
    l1 = delta_dev(qa)
    l2 = delta_dev(qb)
    l3 = delta_dev(qd)
    l4 = sb(wp, mm(qa, qb))
    s = ad(qa, qb)
    sq = ad(mm(qa, qa), mm(qb, qb))
    w2 = mm(wp, wp)
    andv = sb(ad(ad(cmul(_C83_6, wp), cmul(3, mm(wp, sq))),
                 ad(cmul(_C27_2, w2), cmul(_C2_3, mm(w2, wp)))),
              ad(mm(cmul(_C27_2, wp), s), cmul(3, mm(w2, s))))
    l5 = sb(qd, ad(mm(q_c, s),
                   mm(sb(const(1, q_c.shape[:-1]), cmul(3, q_c)), andv)))
    out = l1
    kp = kappa
    for term in (l2, l3, l4, l5):
        out = ad(out, mm(kp, term))
        kp = mm(kp, kappa)
    return out


def fixed_scalar_dev(w, wn, q_l, q_r, q_c, kappa):
    a, b, c, d = w
    an, bn, _cn, dn = wn
    k = sb(dn, cmul(2, d))
    x_t = mm(k, q_l)
    y_t = ad(mm(mm(k, k), csub(q_r, 1)), const(1, k.shape[:-1]))
    f1 = mm(mm(k, csub(k, 1)), ad(k, const(1, k.shape[:-1])))
    f2 = sb(c, mm(k, q_c))
    dabc = mm(cmul(JUBJUB_D, a), mm(b, c))
    f3 = sb(ad(an, mm(an, dabc)), ad(mm(a, y_t), mm(b, x_t)))
    f4 = sb(sb(bn, mm(bn, dabc)), ad(mm(b, y_t), mm(a, x_t)))
    k2 = mm(kappa, kappa)
    out = ad(f1, mm(kappa, f2))
    out = ad(out, mm(k2, f3))
    return ad(out, mm(mm(k2, kappa), f4))


def vgadd_scalar_dev(w, wn, kappa):
    x1, y1, x2, y2 = w
    x3, y3, _cn, aux = wn
    v1 = sb(aux, mm(x1, y1))
    dp = mm(cmul(JUBJUB_D, aux), mm(x2, y2))
    v2 = sb(ad(x3, mm(x3, dp)), ad(mm(x1, y2), mm(y1, x2)))
    v3 = sb(sb(y3, mm(y3, dp)), ad(mm(y1, y2), mm(x1, x2)))
    return ad(v1, ad(mm(kappa, v2), mm(mm(kappa, kappa), v3)))


def gate_value_dev(w, wn, q, pi, ch):
    g = ad(mm(q["q_arith"], arith_value_dev(w, q)), pi)
    g = ad(g, mm(mm(ch["range"], q["q_range"]),
                 range_scalar_dev(w, wn, ch["range"])))
    g = ad(g, mm(mm(ch["logic"], q["q_logic"]),
                 logic_scalar_dev(w, wn, q["q_c"], ch["logic"])))
    g = ad(g, mm(mm(ch["fixed"], q["q_fixed"]),
                 fixed_scalar_dev(w, wn, q["q_l"], q["q_r"], q["q_c"],
                                  ch["fixed"])))
    g = ad(g, mm(mm(ch["vgadd"], q["q_vgadd"]),
                 vgadd_scalar_dev(w, wn, ch["vgadd"])))
    return g


# ---------------------------------------------------------------------------
# polynomial utilities on device
# ---------------------------------------------------------------------------

def prefix_products(x):
    """Inclusive prefix products along axis 0 (Montgomery),
    compile-bounded (dev.blocked_scan docstring)."""
    return dev.prefix_mul_mont(x, FR, axis=0)


def _powers_body(scalar_mont, n: int):
    base = jnp.broadcast_to(scalar_mont, (n, 16))
    base = base.at[0].set(const(1))
    return prefix_products(base)


@functools.lru_cache(maxsize=None)
def _powers_jit(n: int):
    return jax.jit(functools.partial(_powers_body, n=n))


def powers_of(scalar_mont, n: int):
    """[1, s, s^2, ..., s^(n-1)] as (n, 16) Montgomery limbs.

    ONE jitted program per size: the tunneled backend charges
    ~0.35-0.4 s PER DISPATCH (bench_results/r4_probe.log — a bare
    mont_mul and a fully-jitted batch inversion both cost ~0.4 s while
    this function, previously an eager scan soup of dozens of
    dispatches, cost 72 s at 2^18).  Round 4/5 were rebuilt around this
    fact: every multi-op helper below is a single jit."""
    return _powers_jit(n)(scalar_mont)


def tree_sum(x):
    """Sum along axis 0 (mod r) by halving; x: (n, 16) -> (16,)."""
    n = x.shape[0]
    while n > 1:
        half = n // 2
        lo = x[:half]
        hi = x[half: 2 * half]
        s = ad(lo, hi)
        if n % 2:
            s = jnp.concatenate([s, x[2 * half:]], axis=0)
            n = half + 1
        else:
            n = half
        x = s
    return x[0]


def poly_eval_dev(coeffs, zeta_mont):
    """p(zeta) for (n,16) Montgomery coeffs -> (16,) Montgomery."""
    pw = powers_of(zeta_mont, coeffs.shape[0])
    return tree_sum(mm(coeffs, pw))


def batch_inv(x):
    return dev.batch_inv_mont(x, FR, axis=0)


@functools.lru_cache(maxsize=None)
def _ev_many_jit(k: int, n: int):
    @jax.jit
    def run(stack, pows):            # (k, n, 16), (>=n, 16)
        x = mm(stack.astype(jnp.uint32), pows[None, :n])
        m = n
        while m > 1:                 # tree_sum along axis 1
            half = m // 2
            s = ad(x[:, :half], x[:, half:2 * half])
            if m % 2:
                s = jnp.concatenate([s, x[:, 2 * half:]], axis=1)
                m = half + 1
            else:
                m = half
            x = s
        return x[:, 0]
    return run


#: max polynomials per batched-eval program.  The tunneled TPU worker
#: deterministically rejects the k=11 2^18 program with
#: RESOURCE_EXHAUSTED while the identical program runs standalone and
#: 25 GB of buffers allocate fine (prove18_r3d/e/f + probes) — a
#: worker-side per-program limit.  Chunking bounds the program size at
#: ~1 extra dispatch (~0.4 s) per chunk.
_EV_CHUNK = int(_os.environ.get("TPU_PLONK_EV_CHUNK", "4"))


def ev_many(polys, pows):
    """Evaluate k polynomials at the point whose power ladder is
    `pows`, as ceil(k/_EV_CHUNK) jitted programs (dispatch-latency
    note in powers_of)."""
    out = []
    for lo in range(0, len(polys), _EV_CHUNK):
        sub = polys[lo:lo + _EV_CHUNK]
        stack = jnp.stack(sub)
        out.extend(_ev_many_jit(len(sub), stack.shape[1])(stack, pows))
    return out


@functools.lru_cache(maxsize=None)
def _lincomb_jit(k: int):
    @jax.jit
    def run(stack, scals):           # (k, n, 16), (k, 16)
        prods = mm(stack.astype(jnp.uint32), scals[:, None, :])
        acc = prods[0]
        for i in range(1, k):
            acc = ad(acc, prods[i])
        return acc
    return run


def lincomb(consts_i, polys):
    """sum_i consts_i[i] * polys[i] (host int constants, device
    polynomials) as few jitted programs — replaces the eager mm/ad
    chains of the linearization, quotient recombination, and
    aggregate-open folds (each eager op costs a ~0.4 s dispatch on the
    tunneled backend).  Chunked by _EV_CHUNK like ev_many: one k=13
    program holds (k, n, 16) products and the tunnel worker rejects
    programs that size at scale (rule 17c; the 2^22 run).  Modular
    addition is exact, so partial-sum order doesn't change bytes."""
    acc = None
    for lo in range(0, len(polys), _EV_CHUNK):
        sub = polys[lo:lo + _EV_CHUNK]
        stack = jnp.stack(sub)
        scals = jnp.asarray(np.stack(
            [_const(v) for v in consts_i[lo:lo + _EV_CHUNK]]))
        part = _lincomb_jit(len(sub))(stack, scals)
        acc = part if acc is None else ad(acc, part)
    return acc


@functools.lru_cache(maxsize=None)
def _lincomb_many_jit(m: int, k: int):
    @jax.jit
    def run(stack, scals):           # (k, n, 16), (m, k, 16)
        prods = mm(stack.astype(jnp.uint32)[None],
                   scals[:, :, None, :])                # (m, k, n, 16)
        acc = prods[:, 0]
        for i in range(1, k):
            acc = ad(acc, prods[:, i])
        return acc
    return run


def lincomb_many(const_rows, polys):
    """m independent linear combinations of the same poly stack as few
    programs (the quotient recombination's four inverse-Vandermonde
    rows were four lincomb dispatches at ~0.4 s each).  Chunked over
    the poly axis like lincomb (exact modular partial sums)."""
    m = len(const_rows)
    acc = None
    for lo in range(0, len(polys), _EV_CHUNK):
        sub = polys[lo:lo + _EV_CHUNK]
        stack = jnp.stack(sub)
        scals = jnp.asarray(np.stack(
            [np.stack([_const(v) for v in row[lo:lo + _EV_CHUNK]])
             for row in const_rows]))
        part = _lincomb_many_jit(m, len(sub))(stack, scals)
        acc = part if acc is None else ad(acc, part)
    return list(acc)


# ---------------------------------------------------------------------------
# device prover
# ---------------------------------------------------------------------------

KS = (1, K1, K2, K3)


def _invnxn_mod(mat):
    """Inverse of an n x n integer matrix mod r (Gauss-Jordan)."""
    k = len(mat)
    a = [[mat[i][j] % R_MOD for j in range(k)] + [1 if i == j else 0
         for j in range(k)] for i in range(k)]
    for col in range(k):
        piv = next(r for r in range(col, k) if a[r][col] % R_MOD)
        a[col], a[piv] = a[piv], a[col]
        inv = pow(a[col][col], -1, R_MOD)
        a[col] = [x * inv % R_MOD for x in a[col]]
        for r in range(k):
            if r != col and a[r][col]:
                f = a[r][col]
                a[r] = [(x - f * y) % R_MOD
                        for x, y in zip(a[r], a[col])]
    return [row[k:] for row in a]


def _inv4x4_mod(mat):
    return _invnxn_mod(mat)


class DevicePK:
    """Device-resident mirrors of the ProverKey tables (built once).

    The quotient round runs PHASED (VERDICT round-1 task 3): the 4n
    extended coset splits into 4 interleaved size-n cosets
    s_i*H, s_i = g*w_{4n}^i, so no 4n-sized array ever exists — peak
    memory drops 4x and the pointwise program compiles once and runs
    4 times.  Recombination of per-phase coefficients into the real
    t(X) coefficients is a 4x4 inverse Vandermonde in u_i = s_i^n."""

    def __init__(self, pk):
        self.pk = pk
        n = pk.n
        self.log_n = n.bit_length() - 1
        # circuit-static tables live u16-resident (Montgomery limbs
        # carry 16 bits — lossless) and widen in-program at use: at
        # 2^22 the u32 residency of 20 n-sized tables alone is ~5 GB
        # of the 16 GB HBM (r5 prove22 RESOURCE_EXHAUSTED saga); the
        # in-program cast is a fused widening load, and consumers
        # (_ev_many_jit/_lincomb_jit/ntt stacks, grand_product,
        # quotient) all upcast at entry
        self.sel_coeffs = {k: to_dev(v).astype(jnp.uint16)
                           for k, v in pk.selector_coeffs.items()}
        self.sigma_coeffs = [to_dev(v).astype(jnp.uint16)
                             for v in pk.sigma_coeffs]
        self.domain_elems = to_dev(
            pk.domain.elements()).astype(jnp.uint16)
        self.wire_idx = {w: jnp.asarray(np.asarray(pk.wire_vars[w],
                                                   dtype=np.int32))
                         for w in "abcd"}
        # sigma evals over H (for the grand product ratios)
        self.sigma_H = [nttmod.ntt(c.astype(jnp.uint32),
                                   self.log_n).astype(jnp.uint16)
                        for c in self.sigma_coeffs]

        # --- phase tables for the quotient round ---
        from ..poly.domain import Domain
        g = pk.domain.coset_gen
        w4n = Domain(4 * n).omega
        self.phase_s = [g * pow(w4n, i, R_MOD) % R_MOD for i in range(4)]
        self.phase_u = [pow(s, n, R_MOD) for s in self.phase_s]
        self.vinv = _inv4x4_mod(
            [[pow(u, m, R_MOD) for m in range(4)] for u in self.phase_u])
        self.zh_inv_phase = [pow(u - 1, -1, R_MOD) for u in self.phase_u]
        # l1 phase constant: L1(x) = (u_i - 1) * n_inv / (x - 1)
        self.l1c_phase = [(u - 1) * pk.domain.n_inv % R_MOD
                          for u in self.phase_u]
        self._phase_pows = {}
        self._phase_xl1 = {}
        # selector/sigma phase NTTs are circuit-static: cache them on
        # first prove (60 of the ~100 per-prove transforms) when the
        # footprint allows.  r3 re-tune: with the fused NTT pipeline a
        # batched phase transform costs ~30 ms at 2^18, while the cache
        # holds 76 n-sized arrays (1.2 GB at 2^18, 4.8 GB at 2^20) —
        # enough to tip the shared tunnel worker into
        # RESOURCE_EXHAUSTED in round 4 (prove18_r3d sync-debug).
        # Cache only small circuits where HBM is plentiful.
        # TPU_PLONK_CACHE_PHASES overrides (tri-state): the r3 gate was
        # tuned with the host-CSR MSM resident (~100 MB of pushed list
        # buffers per commit); the r4 device-CSR path frees that, so
        # larger sizes may fit again — measured, not assumed.
        _cp = _os.environ.get("TPU_PLONK_CACHE_PHASES")
        if _cp is not None:
            self.cache_phases = _cp not in ("", "0")
        else:
            # 2^20 since r5: the cache is resident as u16 (half the
            # r4 footprint — ~2 GB at 2^20 vs the ~4 GB u32 cache
            # that RESOURCE_EXHAUSTEDed at the quotient recombination,
            # bench_results/r4_prove20_cachep.log; widened in-program
            # by quotient_phase_dev).  Verified on chip in r5
            # (bench_results/r5_prove20_cachep.log).
            self.cache_phases = n <= (1 << 20)
        # the round-1 PREFETCH (wire/PI phase tables + the batched z
        # transform) is the cheap half (~20 n-sized arrays, 1.3 GB at
        # 2^20) and is gated separately so 2^20 proves still overlap
        # those transforms with round-1/2 host work even though the
        # static cache above cannot fit
        _pf = _os.environ.get("TPU_PLONK_PREFETCH_PHASES")
        if _pf is not None:
            self.prefetch_phases = _pf not in ("", "0")
        else:
            self.prefetch_phases = n <= (1 << 20)
        self.phase_static = None

        # --- 8-phase tables (ZK variant: deg(t) = 4n+6 needs the 8n
        # coset; built lazily on first blinded prove) ---
        self.phase8_built = False
        # 8-phase static cache doubles the 4-phase footprint
        # (~7.7 KB/row pre-u16, half that resident), so it gets a
        # lower size gate than the 4-phase cache
        self.cache_phases8 = n <= (1 << 16)
        self.phase8_static = None
        # [tau^(n+k)]G1 k=0..2 for blinded commits when proving
        # without the host SRS (filled by _resolve_high_g1)
        self.high_g1 = None

    def build_phase8(self):
        """Phase tables for the blinded quotient: 8 interleaved size-n
        cosets of the 8n extended coset, s_i = g*w_{8n}^i."""
        if self.phase8_built:
            return
        from ..poly.domain import Domain
        n = 1 << self.log_n
        g = self.pk.domain.coset_gen
        w8n = Domain(8 * n).omega
        self.phase8_s = [g * pow(w8n, i, R_MOD) % R_MOD for i in range(8)]
        self.phase8_u = [pow(s, n, R_MOD) for s in self.phase8_s]
        self.v8inv = _invnxn_mod(
            [[pow(u, m, R_MOD) for m in range(8)] for u in self.phase8_u])
        self.zh_inv_phase8 = [pow(u - 1, -1, R_MOD) for u in self.phase8_u]
        self.l1c_phase8 = [(u - 1) * self.pk.domain.n_inv % R_MOD
                           for u in self.phase8_u]
        self.phase8_built = True

    def phase_pows(self, i: int, inverse: bool = False,
                   n_phases: int = 4):
        """powers_of(s_i) (or s_i^-1) as (n,16) Montgomery limbs,
        built lazily and cached on device."""
        key = (i, inverse, n_phases)
        if key not in self._phase_pows:
            s = self.phase_s[i] if n_phases == 4 else self.phase8_s[i]
            if inverse:
                s = pow(s, -1, R_MOD)
            self._phase_pows[key] = powers_of(
                to_dev_scalar(s),
                1 << self.log_n).astype(jnp.uint16)   # u16 resident
        return self._phase_pows[key].astype(jnp.uint32)

    def phase_xpts_l1(self, i: int, n_phases: int = 4):
        """(xpts, L1 evals) on phase coset i — circuit-static, cached:
        the L1 vector needs a 255-step batch inversion, which used to
        run inside every quotient phase of every prove."""
        key = (i, n_phases)
        if key not in self._phase_xl1:
            s = self.phase_s[i] if n_phases == 4 else self.phase8_s[i]
            l1_c = self.l1c_phase[i] if n_phases == 4 \
                else self.l1c_phase8[i]
            n = 1 << self.log_n
            xpts = mm(const(s, (n,)),
                      self.domain_elems.astype(jnp.uint32))
            l1 = mm(const(l1_c, (n,)), batch_inv(csub(xpts, 1)))
            if n > (1 << 20):
                # don't pin 2 n-arrays per phase at 2^22 — recompute
                # per prove (one batch-inv program, ~1 s) instead
                return xpts, l1
            # cached u16 (16-bit Montgomery limbs): 8 n-arrays at 2^22
            # would be ~1 GB of HBM even as u16
            self._phase_xl1[key] = (xpts.astype(jnp.uint16),
                                    l1.astype(jnp.uint16))
        x16, l16 = self._phase_xl1[key]
        return x16.astype(jnp.uint32), l16.astype(jnp.uint32)


def wire_values_dev(dpk: DevicePK, witness_mont):
    return {w: witness_mont[dpk.wire_idx[w]] for w in "abcd"}


@functools.partial(jax.jit, static_argnames=("log_n",))
def _gp_numden(wires, sigma_H, domain_elems, beta, gamma, log_n):
    """Grand-product numerator/denominator products over H.
    sigma_H / domain_elems arrive u16 (DevicePK resident form)."""
    sigma_H = [s.astype(jnp.uint32) for s in sigma_H]
    domain_elems = domain_elems.astype(jnp.uint32)
    n = 1 << log_n
    num = const(1, (n,))
    den = const(1, (n,))
    for j, w in enumerate("abcd"):
        wv = wires[w]
        id_term = ad(ad(wv, mm(jnp.broadcast_to(beta, (n, 16)),
                               cmul(KS[j], domain_elems))),
                     jnp.broadcast_to(gamma, (n, 16)))
        sig_term = ad(ad(wv, mm(jnp.broadcast_to(beta, (n, 16)),
                                sigma_H[j])),
                      jnp.broadcast_to(gamma, (n, 16)))
        num = mm(num, id_term)
        den = mm(den, sig_term)
    return num, den


@jax.jit
def _gp_z(num, den_inv):
    ratios = mm(num, den_inv)
    prefix = prefix_products(ratios)
    z = jnp.concatenate([const(1, (1,)), prefix[:-1]], axis=0)
    return z, prefix[-1]


def grand_product_dev(wires, sigma_H, domain_elems, beta, gamma, log_n):
    """z evaluations over H from wire evals + sigma evals (Montgomery).

    Split into three device programs (products / batch inversion /
    ratio-prefix-z): the ONE-program form's internal peak (~12+
    n-arrays with the Montgomery-trick inversion inlined) was rejected
    RESOURCE_EXHAUSTED at 2^22 while each piece runs fine (rule 17c;
    r5_prove22.log sync-debug).  Identical algebra => identical bytes;
    costs 2 extra dispatches."""
    num, den = _gp_numden(wires, sigma_H, domain_elems, beta, gamma,
                          log_n)
    den_inv = batch_inv(den)
    return _gp_z(num, den_inv)


@jax.jit
def _narrow_u16(arrs):
    """u32 Montgomery limb arrays -> u16, one program for the whole
    list.  The limbs carry 16-bit values (CLAUDE.md item 23), so the
    circuit-static phase tables can live in HBM at half size — this is
    what lifts the phase-static cache gate from 2^18 to 2^20 (the u32
    cache RESOURCE_EXHAUSTEDed at the 2^20 recombination,
    bench_results/r4_prove20_cachep.log; VERDICT r4 task 4)."""
    return [a.astype(jnp.uint16) for a in arrs]


@jax.jit
def quotient_phase_dev(wire_ph, z_ph, pi_ph, sel_ph, sigma_ph, xpts,
                       alpha, ch, zh_inv_c, l1_vec):
    """t evaluations over ONE interleaved size-n coset s_i*H.  The
    next-row shift is roll(-1) within the phase (index j+4 on the 4n
    coset has the same residue mod 4, one step further in j), so each
    phase is self-contained.  zh_inv_c is the per-phase Z_H constant
    (Z_H is constant on s_i*H); l1_vec = L1 evaluated on the phase
    coset, circuit-static and cached on DevicePK (it needs a 255-step
    batch inversion — recomputing it per prove was pure waste).  All
    inputs are traced, so ONE compiled program serves all phases."""
    # the circuit-static tables arrive u16 when cached (half-HBM
    # resident form); widen in-program — a fused cast on load, not a
    # separate dispatch, and a free bandwidth win on the reads
    sel_ph = {k: v.astype(jnp.uint32) for k, v in sel_ph.items()}
    sigma_ph = [s.astype(jnp.uint32) for s in sigma_ph]
    m = wire_ph["a"].shape[0]
    w = tuple(wire_ph[c] for c in "abcd")
    wn = tuple(jnp.roll(wire_ph[c], -1, axis=0) for c in "abcd")
    chb = {k: jnp.broadcast_to(v, (m, 16)) for k, v in ch.items()}
    gate = gate_value_dev(w, wn, sel_ph, pi_ph, chb)

    beta = chb["beta"]
    gamma = chb["gamma"]
    num = const(1, (m,))
    den = const(1, (m,))
    for j in range(4):
        num = mm(num, ad(ad(w[j], mm(beta, cmul(KS[j], xpts))), gamma))
        den = mm(den, ad(ad(w[j], mm(beta, sigma_ph[j])), gamma))
    perm = sb(mm(num, z_ph), mm(den, jnp.roll(z_ph, -1, axis=0)))
    l1_term = mm(l1_vec, sb(z_ph, const(1, (m,))))
    alpha_b = jnp.broadcast_to(alpha, (m, 16))
    total = ad(gate, ad(mm(alpha_b, perm),
                        mm(mm(alpha_b, alpha_b), l1_term)))
    return mm(total, jnp.broadcast_to(zh_inv_c, (m, 16)))


def _ruffini_body(coeffs, z_mont, z_inv_mont, value_mont):
    n = coeffs.shape[0]
    p = coeffs.at[0].set(sb(coeffs[0], value_mont))
    zp = _powers_body(z_mont, n)
    cj = mm(p, zp)
    suffix = dev.blocked_scan(cj, lambda a, b: ad(a, b),
                              np.zeros(16, np.uint32), axis=0,
                              reverse=True)
    zip_ = _powers_body(z_inv_mont, n)
    b = mm(suffix, zip_)
    # quotient has degree n-2: b_0..b_{n-2} live at positions 1..n-1
    return b[1:]


_ruffini_jit = jax.jit(_ruffini_body)


def ruffini_dev(coeffs, z_mont, z_inv_mont, value_mont):
    """(p(X) - p(z)) / (X - z) for (n,16) Montgomery coeffs.
    b_i = z^{-i} * sum_{j>=i} a_j z^j  (suffix-sum formulation).
    One jitted program (dispatch-latency note in powers_of)."""
    return _ruffini_jit(coeffs, z_mont, z_inv_mont, value_mont)


def _blind_commit(cm, highs, high_pts):
    """Commitment correction for host-tracked high blinding coeffs:
    cm + sum_k highs[k] * [tau^(n+k)]G1 (a couple of host scalar-muls —
    the device arrays stay n-sized; SURVEY §2.6 KZG linearity).
    high_pts are the affine points [tau^(n+k)]G1, k=0..2 — from the
    host SRS when present, else cached on the DevicePK / extracted
    from the committer's packed device SRS (_resolve_high_g1)."""
    from ..curves import g1
    from ..pcs import msm as hostmsm
    pairs = [(high_pts[k], h) for k, h in enumerate(highs) if h]
    if not pairs:
        return cm
    corr = hostmsm.msm_small(pairs)
    return g1.add(cm, corr) if cm is not None else corr


def _resolve_high_g1(srs, dpk, commit_fn, n: int):
    """The <=3 high SRS points [tau^(n+k)]G1 a blinded prove needs.

    Priority: host SRS -> DevicePK cache -> the committer behind
    commit_fn (DeviceCommitter.high_g1 pulls three rows of its packed
    table).  The result is cached on the DevicePK so repeat proves
    (and the scale script's first/steady pair) extract once.  Round-4
    postmortem: the scale path passes srs=None and the old code
    unconditionally dereferenced srs.powers_g1 (VERDICT r4 task 2)."""
    if getattr(dpk, "high_g1", None) is not None:
        return dpk.high_g1
    if srs is not None:
        pts = tuple(srs.powers_g1[n + k] for k in range(3))
    else:
        owner = getattr(commit_fn, "__self__", None)
        if owner is None or not hasattr(owner, "high_g1"):
            raise ValueError(
                "blinded prove needs [tau^(n+k)]G1: pass srs, set "
                "dpk.high_g1, or use a DeviceCommitter commit_fn")
        pts = tuple(owner.high_g1(n))
    dpk.high_g1 = pts
    return pts


def prove_device(composer, pk, srs, label=None, dpk: DevicePK = None,
                 commit_fn=None, metrics=None, mesh=None,
                 commit_many_fn=None, blinding_seed: bytes = None):
    """Device-engine prover; mirrors prover.prove round-for-round and
    must produce byte-identical proofs (asserted by tests).

    With `mesh` (a jax Mesh with a "shard" axis), the two scaling hot
    paths route through the multi-chip kernels: KZG commits via
    dist/msm_sharded.ShardedCommitter and all wire/z/PI/quotient
    (i)NTTs via the four-step all_to_all NTT (dist/ntt_sharded).  EC
    addition and the NTT algebra are exact, so proof bytes are
    identical across device counts (tests/test_dist_prover.py).

    `blinding_seed` enables the ZK variant (byte-identical to the host
    prover's — tests/test_blinding_device.py).  Device arrays stay
    n-sized: the <=3 high blinding coefficients of each polynomial are
    tracked as HOST scalars, entering as (a) commitment corrections
    (KZG linearity, _blind_commit), (b) rank-1 phase corrections in the
    quotient (x^n = u_i is CONSTANT on each interleaved coset), and
    (c) host eval corrections at zeta/zeta*omega.  deg(t) = 4n+6 needs
    the 8n coset, so the quotient runs EIGHT interleaved phases with an
    8x8 inverse-Vandermonde recombination into five chunks."""
    from ..transcript import Transcript
    from ..transcript import labels as L
    from ..poly.domain import Domain
    from ..pcs import kzg
    from ..utils.metrics import NullMetrics
    from .proof import Proof
    from . import prover as host

    met = metrics if metrics is not None else NullMetrics()
    if label is None:
        label = L.PROTOCOL
    if dpk is None:
        dpk = DevicePK(pk)
    if mesh is not None:
        from ..dist import msm_sharded as _msh
        from ..dist import ntt_sharded as _nsh
        from ..dist import multihost as _mh
        if commit_fn is None:
            commit_fn = _msh.ShardedCommitter(mesh, srs, pk.n).commit
        if jax.process_count() > 1:
            # multi-controller: feed the sharded kernels host numpy
            # (uncommitted inputs shard uniformly across processes) and
            # allgather the result, so every other round stays
            # replicated-local and deterministic on each process.
            _ntt = lambda x, ln: jnp.asarray(_mh.allgather(  # noqa: E731
                _nsh.ntt_sharded(mesh, np.asarray(x), ln)))
            _intt = lambda x, ln: jnp.asarray(_mh.allgather(  # noqa: E731
                _nsh.ntt_sharded(mesh, np.asarray(x), ln, inverse=True)))
        else:
            _ntt = lambda x, ln: _nsh.ntt_sharded(mesh, x, ln)  # noqa: E731
            _intt = lambda x, ln: _nsh.ntt_sharded(mesh, x, ln, inverse=True)  # noqa: E731
    else:
        _ntt = nttmod.ntt
        _intt = nttmod.intt
    if commit_fn is None:
        commit_fn = lambda coeffs_dev: kzg.commit(from_dev(coeffs_dev), srs)  # noqa: E731
    if commit_many_fn is None:
        # pipelined committers expose commit_many (host CSR build of
        # poly k+1 overlaps the device MSM of poly k — the SURVEY §2.10
        # "round pipeline" within-round overlap); auto-detect it on the
        # bound committer, else fall back to sequential commits
        owner = getattr(commit_fn, "__self__", None)
        if owner is not None and hasattr(owner, "commit_many"):
            commit_many_fn = owner.commit_many
        else:
            commit_many_fn = lambda cl: [commit_fn(cf) for cf in cl]  # noqa: E731

    n = pk.n
    log_n = dpk.log_n
    dom = pk.domain
    blinds = host._blinders(blinding_seed, 11) \
        if blinding_seed is not None else None
    high_pts = _resolve_high_g1(srs, dpk, commit_fn, n) \
        if blinds is not None else None
    # host-tracked high blinding coefficients per polynomial:
    # p' = p_low (device, n rows, rows 0..len-1 adjusted) + sum h_k X^(n+k)
    wire_high = {w: () for w in "abcd"}
    z_high = ()

    t = Transcript(label)
    t.circuit_domain_sep(n)

    # ---------------- round 1: wires ----------------
    with met.timed("r1_wires"):
        witness_mont = to_dev(composer.witness)
        wires_H = wire_values_dev(dpk, witness_mont)
        if mesh is None:
            # capped like the quotient's phase transforms: the (4, n)
            # batched program RESOURCE_EXHAUSTEDed at 2^22 (rule 17c;
            # bench_results/r5_prove22.log)
            cap = int(_os.environ.get("TPU_PLONK_NTT_BATCH", "4"))
            ws = "abcd"
            stacked = []
            for lo in range(0, 4, cap):
                stacked.extend(nttmod.ntt_many(
                    jnp.stack([wires_H[w] for w in ws[lo:lo + cap]]),
                    log_n, inverse=True))
            wire_coeffs = dict(zip(ws, stacked))
        else:
            wire_coeffs = {w: _intt(wires_H[w], log_n) for w in "abcd"}
        if blinds is not None:
            for j, w in enumerate("abcd"):
                b0, b1 = blinds[2 * j], blinds[2 * j + 1]
                wc = wire_coeffs[w]
                wc = wc.at[0].set(sb(wc[0], const(b0)))
                wc = wc.at[1].set(sb(wc[1], const(b1)))
                wire_coeffs[w] = wc
                wire_high[w] = (b0, b1)
        comm = {}

        # Cross-round pipelining (VERDICT r2 #9): the quotient round's
        # wire + PI phase NTTs depend on NO challenge — dispatch them
        # NOW so they execute in the device-idle window behind round
        # 1/2's host work (commit pulls, CSR builds, transcript).
        # Gated to the single-device unblinded path (the mesh path
        # shards transforms differently; the 8-phase blinded coset is
        # rarer) and to cache_phases sizes (prefetch holds 20 n-sized
        # arrays alive).  Bit-exact: same ntt_many, same scale
        # constants, only dispatched earlier.
        prefetched_r3 = {}

        def _prefetch_round3():
            if mesh is not None or blinds is not None \
                    or not dpk.prefetch_phases:
                return
            pi_vec = [0] * n
            for gi, val in composer.pi.items():
                pi_vec[gi] = val
            pi_c = _intt(to_dev(pi_vec), log_n)
            prefetched_r3["pi_coeffs"] = pi_c
            polys = jnp.stack(
                [wire_coeffs[w] for w in "abcd"] + [pi_c])
            for i in range(4):
                out = nttmod.ntt_many(polys, log_n, scale=dpk.phase_s[i])
                prefetched_r3[i] = (dict(zip("abcd", out[:4])), out[4])

        import inspect
        _cm_params = None
        try:
            _cm_params = inspect.signature(commit_many_fn).parameters
        except (TypeError, ValueError):
            pass
        if _cm_params is not None and "prefetch_cb" in _cm_params:
            wire_comms = commit_many_fn(
                [wire_coeffs[w] for w in "abcd"],
                prefetch_cb=_prefetch_round3)
        else:
            _prefetch_round3()
            wire_comms = commit_many_fn(
                [wire_coeffs[w] for w in "abcd"])
        _dbg("r1 wire commits")
        if blinds is not None:
            wire_comms = [_blind_commit(cm, wire_high[w], high_pts)
                          for w, cm in zip("abcd", wire_comms)]
        for (lbl, name), cm in zip(
                ((L.W_L, "w_l"), (L.W_R, "w_r"),
                 (L.W_O, "w_o"), (L.W_4, "w_4")), wire_comms):
            comm[name] = cm
            t.append_commitment(lbl, comm[name])
    beta_i = t.challenge_scalar(L.BETA)
    t.append_scalar(L.BETA, beta_i)
    gamma_i = t.challenge_scalar(L.GAMMA)
    beta = to_dev_scalar(beta_i)
    gamma = to_dev_scalar(gamma_i)

    # ---------------- round 2: grand product ----------------
    with met.timed("r2_grand_product"):
        z_H, closure = grand_product_dev(
            wires_H, dpk.sigma_H, dpk.domain_elems, beta, gamma, log_n)
        _dbg("r2 grand product", z_H)
        if n >= (1 << 21):
            # the eval-form wires and raw witness are dead after the
            # grand product; at 2^22 their ~1.3 GB is the difference
            # between round 2's intt fitting or not (rule 17a)
            _sync1(z_H)
            _free(*wires_H.values(), witness_mont)
        z_coeffs = _intt(z_H, log_n)
        if blinds is not None:
            z_high = tuple(blinds[8:11])
            for k, b in enumerate(z_high):
                z_coeffs = z_coeffs.at[k].set(sb(z_coeffs[k], const(b)))
            comm["z"] = _blind_commit(commit_fn(z_coeffs), z_high,
                                      high_pts)
        else:
            comm["z"] = commit_fn(z_coeffs)
    t.append_commitment(L.Z, comm["z"])
    alpha_i = t.challenge_scalar(L.ALPHA)
    ch_i = {
        "range": t.challenge_scalar(L.RANGE_SEP),
        "logic": t.challenge_scalar(L.LOGIC_SEP),
        "fixed": t.challenge_scalar(L.FIXED_SEP),
        "vgadd": t.challenge_scalar(L.VGADD_SEP),
    }
    alpha = to_dev_scalar(alpha_i)
    ch = {k: to_dev_scalar(v) for k, v in ch_i.items()}
    ch["beta"] = beta
    ch["gamma"] = gamma

    # ---------------- round 3: quotient (4 interleaved phases) -------
    with met.timed("r3_quotient"):
        if "pi_coeffs" in prefetched_r3:
            pi_coeffs = prefetched_r3["pi_coeffs"]
        else:
            pi_vec = [0] * n
            for gi, val in composer.pi.items():
                pi_vec[gi] = val
            pi_coeffs = _intt(to_dev(pi_vec), log_n)

        from ..cs.composer import SELECTOR_NAMES

        def phase_ntt_many(polys, i, n_phases=4, keep_raw=None):
            """All of a phase's forward transforms as batched NTTs
            (single-device; the mesh path keeps per-poly sharded
            transforms).  The phase-coset scale s_i^j is passed to
            ntt_many, which folds it into the MXU DFT/twiddle constants
            — no explicit powers multiply or extra HBM pass.  Batches
            are capped (TPU_PLONK_NTT_BATCH): the 25-poly four-step
            program at 2^20 crashed the remote compile helper
            (prove20_r3.log, HTTP 500 subprocess exit 1)."""
            if mesh is not None:
                pows = dpk.phase_pows(i, n_phases=n_phases)
                return [_ntt(mm(p.astype(jnp.uint32), pows), log_n)
                        for p in polys]
            s = dpk.phase_s[i] if n_phases == 4 else dpk.phase8_s[i]
            cap = int(_os.environ.get("TPU_PLONK_NTT_BATCH", "4"))
            out = []
            for lo in range(0, len(polys), cap):
                # u32 stack: static selector/sigma coeffs arrive u16
                # (DevicePK resident form); mixed stacks promote
                res = nttmod.ntt_many(
                    jnp.stack(polys[lo:lo + cap]).astype(jnp.uint32),
                    log_n, scale=s)
                if keep_raw is not None:
                    keep_raw.append(res)   # parent buffers, for _free
                out.extend(res)
            return out

        n_phases = 4 if blinds is None else 8
        if blinds is not None:
            dpk.build_phase8()
        # selector/sigma phase NTTs are circuit-static: cache them on
        # first prove (per-variant — the 4-phase and 8-phase cosets are
        # disjoint), subject to the footprint gates set in __init__
        static_polys = [dpk.sel_coeffs[k] for k in SELECTOR_NAMES] \
            + list(dpk.sigma_coeffs)
        n_sel = len(SELECTOR_NAMES)
        cache_attr = "phase_static" if blinds is None else "phase8_static"
        cache_ok = dpk.cache_phases if blinds is None else dpk.cache_phases8
        if cache_ok and getattr(dpk, cache_attr) is None:
            tables = []
            for i in range(n_phases):
                raw = []
                out = phase_ntt_many(static_polys, i, n_phases,
                                     keep_raw=raw)
                # resident form is u16 (half HBM; widened in-program by
                # quotient_phase_dev); reclaim the u32 transforms AND
                # their stacked ntt_many parents eagerly — the views
                # pin the parents (rule 17a) and at 2^20 the build
                # would otherwise carry ~2x the final cache
                out16 = _narrow_u16(out)
                _sync1(out16[-1])
                _free(*out, *raw)
                tables.append((dict(zip(SELECTOR_NAMES,
                                        out16[:n_sel])),
                               out16[n_sel:]))
            setattr(dpk, cache_attr, tables)
        static_tables = getattr(dpk, cache_attr)
        phase_u = None if blinds is None else dpk.phase8_u
        zh_inv_ph = dpk.zh_inv_phase if blinds is None \
            else dpk.zh_inv_phase8
        vinv = dpk.vinv if blinds is None else dpk.v8inv
        n_chunks = 4 if blinds is None else 5

        t_phase = []
        z_ph_all = None
        if n_phases == 4 and all(i in prefetched_r3 for i in range(4)):
            # wires + PI were transformed during round 1's commit
            # window; only z — a round-2 product — still needs its four
            # phase NTTs.  Batch them as ONE program: coset scaling
            # s_i^j is an explicit Montgomery pre-multiply by the
            # cached phase power ladders (bit-exact vs the folded
            # in_scale constants — both compute NTT(z[j]*s_i^j) mod r),
            # so four scale-specific dispatches become one (4, n)
            # batched MXU transform.
            zp = jnp.stack([dpk.phase_pows(i, n_phases=n_phases)
                            for i in range(4)])
            z_ph_all = nttmod.ntt_many(
                mm(jnp.broadcast_to(z_coeffs[None], zp.shape), zp),
                log_n)
        for i in range(n_phases):
            phase_raw = []
            if z_ph_all is not None:
                wire_ph, pi_ph = prefetched_r3[i]
                z_ph = z_ph_all[i]
                if static_tables is not None:
                    sel_ph, sigma_ph = static_tables[i]
                else:
                    # prefetch without the static cache (2^20: the
                    # 4 GB cache OOMs but the 1.3 GB prefetch fits) —
                    # statics still stream per phase
                    out = phase_ntt_many(static_polys, i, n_phases,
                                         keep_raw=phase_raw)
                    sel_ph = dict(zip(SELECTOR_NAMES, out[:n_sel]))
                    sigma_ph = out[n_sel:]
            else:
                dyn = [wire_coeffs[w] for w in "abcd"] \
                    + [z_coeffs, pi_coeffs]
                if static_tables is not None:
                    out = phase_ntt_many(dyn, i, n_phases,
                                         keep_raw=phase_raw)
                    sel_ph, sigma_ph = static_tables[i]
                else:
                    out = phase_ntt_many(dyn, i, n_phases,
                                         keep_raw=phase_raw)
                    # streamed statics held u16 for the phase (the
                    # quotient widens in-program); transform -> narrow
                    # -> free per small chunk so neither all 15 u32
                    # transforms (~4 GB at 2^22) nor a single 15-array
                    # narrow program (~6 GB in+out, REJECTED on chip)
                    # ever coexist
                    ncap = int(_os.environ.get("TPU_PLONK_NTT_BATCH",
                                               "4"))
                    stat16 = []
                    for slo in range(0, len(static_polys), ncap):
                        raw_s = []
                        outs = phase_ntt_many(
                            static_polys[slo:slo + ncap], i, n_phases,
                            keep_raw=raw_s)
                        s16 = _narrow_u16(outs)
                        if mesh is None:
                            _sync1(s16[-1])
                            _free(*outs, *raw_s)
                        stat16.extend(s16)
                    sel_ph = dict(zip(SELECTOR_NAMES, stat16[:n_sel]))
                    sigma_ph = stat16[n_sel:]
                wire_ph = dict(zip("abcd", out[:4]))
                z_ph, pi_ph = out[4], out[5]
            xpts, l1_vec = dpk.phase_xpts_l1(i, n_phases)
            if blinds is not None:
                # rank-1 blinding corrections: x^(n+k) = u_i * x^k is
                # a CONSTANT times x^k on the interleaved coset s_i*H
                u = phase_u[i]
                for j, w in enumerate("abcd"):
                    b0, b1 = wire_high[w]
                    corr = ad(const(u * b0 % R_MOD, (n,)),
                              mm(const(u * b1 % R_MOD, (n,)), xpts))
                    wire_ph[w] = ad(wire_ph[w], corr)
                x2 = mm(xpts, xpts)
                zc = ad(const(u * z_high[0] % R_MOD, (n,)),
                        mm(const(u * z_high[1] % R_MOD, (n,)), xpts))
                zc = ad(zc, mm(const(u * z_high[2] % R_MOD, (n,)), x2))
                z_ph = ad(z_ph, zc)
            _quot = quotient_phase_dev
            if _QUOT_PALLAS and jax.default_backend() not in ("cpu",):
                from .quotient_pallas import quotient_phase_pallas
                _quot = quotient_phase_pallas
            t_phase.append(_quot(
                wire_ph, z_ph, pi_ph, sel_ph, sigma_ph, xpts, alpha, ch,
                to_dev_scalar(zh_inv_ph[i]), l1_vec))
            _dbg(f"r3 phase {i}", t_phase[-1])
            if mesh is None and static_tables is None:
                # sync the phase result, then explicitly reclaim the
                # ~1.7 GB of per-phase transforms — including the
                # stacked ntt_many parents, whose buffers the
                # unstacked children keep alive (see _free)
                _sync1(t_phase[-1])
                if z_ph_all is not None:
                    # prefetched wires/PI die with their phase too
                    # (rule 17a: reclaim eagerly at 2^20); z_ph is a
                    # view of the (4, n) z_ph_all, freed after the loop
                    _free(pi_ph, *wire_ph.values(),
                          *sel_ph.values(), *sigma_ph, *phase_raw)
                    prefetched_r3.pop(i, None)
                else:
                    _free(z_ph, pi_ph, *wire_ph.values(),
                          *sel_ph.values(), *sigma_ph, *phase_raw)
        if mesh is None:
            cap = int(_os.environ.get("TPU_PLONK_NTT_BATCH", "4"))
            t_inv_parents = []     # stacked ntt_many outputs (rule 17a)
            t_inv = []
            for lo in range(0, len(t_phase), cap):
                res = nttmod.ntt_many(jnp.stack(t_phase[lo:lo + cap]),
                                      log_n, inverse=True)
                t_inv_parents.append(res)
                t_inv.extend(res)
        else:
            t_inv_parents = []
            t_inv = [_intt(t, log_n) for t in t_phase]
        # one batched multiply for all phases' s_i^-j unscaling, then
        # each chunk's inverse-Vandermonde row as one jitted lincomb
        # (the old eager per-phase mm/ad chain was ~30 dispatches at
        # ~0.4 s each on the tunneled backend)
        inv_pows = jnp.stack([
            dpk.phase_pows(i, inverse=True, n_phases=n_phases)
            for i in range(n_phases)])
        c_raw = mm(jnp.stack(t_inv), inv_pows)
        c_phase = list(c_raw)
        # t_{mn+k} from the phase coefficient streams: inverse
        # Vandermonde in u_i = s_i^n; with blinding only chunks 0..4
        # are nonzero (deg t = 4n+6), the rest are dropped
        chunks = lincomb_many(
            [vinv[mth][:n_phases] for mth in range(n_chunks)], c_phase)
        # the prefetched wire/PI phase tables (20 n-sized arrays) are
        # dead after the phase loop: drop them before the commits and
        # rounds 4/5 allocate (HBM hygiene on the shared tunnel worker)
        prefetched_r3.clear()
        if mesh is None and static_tables is None:
            _sync1(chunks[-1])
            _free(*t_phase, *t_inv, *c_phase, *t_inv_parents, c_raw,
                  inv_pows, z_ph_all)
        _dbg("r3 chunks", chunks[0])
        chunk_comms = commit_many_fn(chunks)
        t_labels = (L.T_1, L.T_2, L.T_3, L.T_4) if blinds is None \
            else (L.T_1, L.T_2, L.T_3, L.T_4, L.T_5)
        for k, lbl in enumerate(t_labels):
            comm[f"t_{k + 1}"] = chunk_comms[k]
            t.append_commitment(lbl, comm[f"t_{k + 1}"])
    zeta_i = t.challenge_scalar(L.ZETA)
    zw_i = zeta_i * dom.omega % R_MOD
    zeta = to_dev_scalar(zeta_i)
    zw = to_dev_scalar(zw_i)

    # ---------------- round 4: evaluations + linearization ----------
    with met.timed("r4_evals"):
        zeta_pows = powers_of(zeta, n)
        _dbg("r4 zeta_pows", zeta_pows)
        zw_pows = powers_of(zw, n)
        _dbg("r4 zw_pows", zw_pows)
        # all 13 openings as TWO jitted batched-eval programs (one per
        # point); c is opened only at zeta (dusk shape)
        zeta_names = ("a", "b", "c", "d", "sigma1", "sigma2", "sigma3",
                      "q_arith", "q_c", "q_l", "q_r")
        zeta_polys = [wire_coeffs[w] for w in "abcd"] \
            + list(dpk.sigma_coeffs[:3]) \
            + [dpk.sel_coeffs[nm] for nm in ("q_arith", "q_c",
                                             "q_l", "q_r")]
        zw_names = ("a_next", "b_next", "d_next", "z_shifted")
        zw_polys = [wire_coeffs[w] for w in "abd"] + [z_coeffs]
        ev = dict(zip(zeta_names, ev_many(zeta_polys, zeta_pows)))
        _dbg("r4 zeta evals", ev["a"])
        ev.update(zip(zw_names, ev_many(zw_polys, zw_pows)))
        # ONE device->host pull for all evaluations: each from_dev is a
        # full tunnel round-trip, and there are ~16 of them
        names = list(ev)
        vals = from_dev(jnp.stack([ev[k] for k in names]))
        ev_i = dict(zip(names, vals))

        r_high = ()
        if blinds is not None:
            # host high-coefficient eval corrections:
            # p'(x) = p_low(x) + sum_k h_k x^(n+k)
            def _hi(highs, x):
                xp = pow(x, n, R_MOD)
                acc = 0
                for h in highs:
                    acc = (acc + h * xp) % R_MOD
                    xp = xp * x % R_MOD
                return acc
            for j, w in enumerate("abcd"):
                ev_i[w] = (ev_i[w] + _hi(wire_high[w], zeta_i)) % R_MOD
                if w != "c":
                    ev_i[w + "_next"] = (ev_i[w + "_next"]
                                         + _hi(wire_high[w], zw_i)) % R_MOD
            ev_i["z_shifted"] = (ev_i["z_shifted"]
                                 + _hi(z_high, zw_i)) % R_MOD

        co = host.linearization_coefficients(
            ev_i, zeta_i, beta_i, gamma_i, alpha_i, ch_i, dom)
        _lin_names = ("q_m", "q_l", "q_r", "q_o", "q_4", "q_c",
                      "q_range", "q_logic", "q_fixed", "q_vgadd")
        r_coeffs = lincomb(
            [co[nm] for nm in _lin_names] + [co["z"], co["sigma4"]],
            [dpk.sel_coeffs[nm] for nm in _lin_names]
            + [z_coeffs, dpk.sigma_coeffs[3]])
        ev_i["r"] = from_dev(_ev(r_coeffs, zeta_pows))[0]
        if blinds is not None:
            # r inherits z's high coefficients scaled by co["z"]
            r_high = tuple(co["z"] * h % R_MOD for h in z_high)
            ev_i["r"] = (ev_i["r"] + _hi(r_high, zeta_i)) % R_MOD

        pi_at_zeta = host.eval_pi(composer.pi, dom, zeta_i)
        t_eval = host.compute_t_eval(ev_i, pi_at_zeta, zeta_i, beta_i,
                                     gamma_i, alpha_i, dom)
    host.append_evals(t, ev_i, t_eval)
    v_i = t.challenge_scalar(L.AGGREGATE_WITNESS)

    # ---------------- round 5: aggregate openings ----------------
    with met.timed("r5_openings"):
        zn = pow(zeta_i, n, R_MOD)
        t_flat = lincomb([pow(zn, k, R_MOD) for k in range(len(chunks))],
                         chunks)
        agg_zeta = [
            (t_flat, t_eval), (r_coeffs, ev_i["r"]),
            (wire_coeffs["a"], ev_i["a"]), (wire_coeffs["b"], ev_i["b"]),
            (wire_coeffs["c"], ev_i["c"]), (wire_coeffs["d"], ev_i["d"]),
            (dpk.sigma_coeffs[0], ev_i["sigma1"]),
            (dpk.sigma_coeffs[1], ev_i["sigma2"]),
            (dpk.sigma_coeffs[2], ev_i["sigma3"]),
            (dpk.sel_coeffs["q_arith"], ev_i["q_arith"]),
            (dpk.sel_coeffs["q_c"], ev_i["q_c"]),
            (dpk.sel_coeffs["q_l"], ev_i["q_l"]),
            (dpk.sel_coeffs["q_r"], ev_i["q_r"]),
        ]
        agg_zw = [
            (z_coeffs, ev_i["z_shifted"]),
            (wire_coeffs["a"], ev_i["a_next"]),
            (wire_coeffs["b"], ev_i["b_next"]),
            (wire_coeffs["d"], ev_i["d_next"]),
        ]
        if blinds is None:
            comm["w_z"], comm["w_zw"] = commit_many_fn(
                [_aggregate_open(agg_zeta, v_i, zeta_i),
                 _aggregate_open(agg_zw, v_i, zw_i)])
        else:
            hz = [(), r_high] + [wire_high[w] for w in "abcd"] + [()] * 7
            hzw = [z_high] + [wire_high[w] for w in "abd"]
            qz, qz_high = _aggregate_open_blinded(
                [(c, v, h) for (c, v), h in zip(agg_zeta, hz)],
                v_i, zeta_i, n)
            qzw, qzw_high = _aggregate_open_blinded(
                [(c, v, h) for (c, v), h in zip(agg_zw, hzw)],
                v_i, zw_i, n)
            cms = commit_many_fn([qz, qzw])
            comm["w_z"] = _blind_commit(cms[0], qz_high, high_pts)
            comm["w_zw"] = _blind_commit(cms[1], qzw_high, high_pts)
    t.append_commitment(L.W_Z, comm["w_z"])
    t.append_commitment(L.W_Z_W, comm["w_zw"])

    evals = {k: ev_i[k] for k in
             ("a", "b", "c", "d", "a_next", "b_next", "d_next",
              "sigma1", "sigma2", "sigma3",
              "q_arith", "q_c", "q_l", "q_r", "z_shifted", "r")}
    return Proof(comm, evals)


_SYNC_DEBUG = _os.environ.get("TPU_PLONK_SYNC_DEBUG", "") not in ("", "0")


def _dbg(name, arr=None):
    """TPU_PLONK_SYNC_DEBUG=1: force a host sync after each prover
    step and print progress — JAX async dispatch surfaces device
    errors at the NEXT sync point, which makes crash tracebacks point
    at innocent code (an OOM inside round 3 reports in round 4's
    ev_many).  Zero cost when off."""
    if _SYNC_DEBUG:
        import time
        if arr is not None:
            np.asarray(jax.tree_util.tree_leaves(arr)[0]).reshape(-1)[:1]
        print(f"[sync-debug {time.time() % 10000:.1f}] {name} ok",
              flush=True)


def _sync1(arr):
    """Block until `arr` is computed (pull one element)."""
    np.asarray(arr.reshape(-1)[:1])


def _free(*arrays):
    """Explicitly delete device buffers that are provably dead.  The
    tunneled worker reclaims freed buffers LAZILY: at 2^20 the quotient
    loop's ~1.7 GB/phase of garbage accumulated until phase 1's
    dispatches hit RESOURCE_EXHAUSTED even though every Python
    reference had been dropped (prove20_r3c sync-debug).  delete() is
    the explicit reclaim.  Callers must sync the consuming computation
    first."""
    for a in arrays:
        try:
            a.delete()
        except Exception:  # noqa: BLE001 — already deleted / not owned
            pass


def _ev(coeffs, pows):
    return _ev_many_jit(1, coeffs.shape[0])(coeffs[None], pows)[0]


def _aggregate_open(poly_value_pairs, v_i: int, point_i: int):
    """Fold (poly, value) pairs with powers of v, subtract the folded
    value, divide by (X - point); returns quotient coeffs (device).
    The fold is one jitted lincomb + one jitted Ruffini (dispatch-
    latency note in powers_of)."""
    k = len(poly_value_pairs)
    vps = [pow(v_i, j, R_MOD) for j in range(k)]
    agg = lincomb(vps, [c for c, _ in poly_value_pairs])
    agg_val = sum(vp * value for vp, (_, value)
                  in zip(vps, poly_value_pairs)) % R_MOD
    z_inv = pow(point_i, -1, R_MOD)
    return ruffini_dev(agg, to_dev_scalar(point_i),
                       to_dev_scalar(z_inv), to_dev_scalar(agg_val))


def _aggregate_open_blinded(triples, v_i: int, point_i: int, n: int):
    """_aggregate_open for blinded polynomials: each triple is
    (low_coeffs_dev, value, highs) with `highs` the host-tracked
    coefficients at X^(n+k).  The division splits linearly:
      (p_low - p_low(z))/(X-z)   -> the usual device Ruffini;
      (p_high - p_high(z))/(X-z) -> closed form: quotient coeffs are
        b_{n+1} = h2, b_n = h1 + z h2, b_{n-1} = h0 + z b_n, and
        b_k = z^(n-1-k) b_{n-1} for k <= n-1 (a single scaled
        inverse-power vector on device).
    Returns (device (n,16) quotient low part, (b_n, b_{n+1}) host
    highs for the commitment correction)."""
    vps = [pow(v_i, j, R_MOD) for j in range(len(triples))]
    agg = lincomb(vps, [c for c, _, _ in triples])
    agg_val = 0
    hi = [0, 0, 0]
    for vp, (_, value, highs) in zip(vps, triples):
        agg_val = (agg_val + vp * value) % R_MOD
        for k, h in enumerate(highs):
            hi[k] = (hi[k] + vp * h) % R_MOD
    z = point_i
    z_inv = pow(z, -1, R_MOD)
    zpn = pow(z, n, R_MOD)
    v_high = (hi[0] * zpn + hi[1] * zpn * z + hi[2] * zpn * z * z) % R_MOD
    v_low = (agg_val - v_high) % R_MOD
    q_low = ruffini_dev(agg, to_dev_scalar(z), to_dev_scalar(z_inv),
                        to_dev_scalar(v_low))          # (n-1, 16)
    b_np1 = hi[2]
    b_n = (hi[1] + z * hi[2]) % R_MOD
    b_nm1 = (hi[0] + z * b_n) % R_MOD
    q = jnp.concatenate([q_low, jnp.zeros((1, 16), jnp.uint32)], axis=0)
    scale = b_nm1 * pow(z, n - 1, R_MOD) % R_MOD
    if scale:
        q = ad(q, mm(const(scale, (n,)),
                     powers_of(to_dev_scalar(z_inv), n)))
    return q, (b_n, b_np1)
