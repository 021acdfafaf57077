"""Device NTT / iNTT over Fr (JAX, TPU-first; SURVEY.md §7 step 2).

Data layout: (N, L) uint32 limb arrays in Montgomery form.  Iterative
DIT radix-2: one bit-reversal gather, then log2(N) butterfly stages of
one batched Montgomery multiply + mod add/sub each.  All shapes static
under jit; stage twiddles are precomputed host-side per domain size and
closed over as constants.

The multi-chip four-step decomposition (all_to_all over the mesh) lives
in dist/ntt_sharded.py and reuses these kernels for the local tiles.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..params import R_MOD, FR_MONT_R
from ..fields import limbs
from ..fields import device as dev
from .domain import Domain


@functools.lru_cache(maxsize=None)
def _plan(log_n: int, inverse: bool):
    """Host-side precomputation: bit-reversal permutation + per-stage
    twiddles (Montgomery form), packed as numpy constants."""
    n = 1 << log_n
    dom = Domain(n)
    omega = dom.omega_inv if inverse else dom.omega

    perm = np.zeros(n, dtype=np.int32)
    for i in range(n):
        perm[i] = int(bin(i)[2:].zfill(log_n)[::-1], 2)

    stage_tw = []
    m = 1
    while m < n:
        w_m = pow(omega, n // (2 * m), R_MOD)
        tws, w = [], 1
        for _ in range(m):
            tws.append(w * FR_MONT_R % R_MOD)  # Montgomery form
            w = w * w_m % R_MOD
        stage_tw.append(limbs.ints_to_limbs(tws, 16))
        m *= 2
    n_inv_mont = np.asarray(
        limbs.ints_to_limbs([dom.n_inv * FR_MONT_R % R_MOD], 16)[0])
    return perm, stage_tw, n_inv_mont


def _ntt_kernel(x, perm, stage_tw):
    """x: (n, 16) Montgomery limbs -> NTT in natural order."""
    n = x.shape[0]
    x = x[perm]
    for tw in stage_tw:
        m = tw.shape[0]
        blocks = n // (2 * m)
        xr = x.reshape(blocks, 2, m, 16)
        even = xr[:, 0]
        odd = dev.mont_mul(xr[:, 1], jnp.broadcast_to(tw, (blocks, m, 16)),
                           dev.FR)
        x = jnp.concatenate(
            [dev.add_mod(even, odd, dev.FR)[:, None],
             dev.sub_mod(even, odd, dev.FR)[:, None]], axis=1
        ).reshape(n, 16)
    return x


@functools.lru_cache(maxsize=None)
def _jitted(log_n: int, inverse: bool):
    """One fused XLA program per (size, direction): bit-reversal gather
    + log2(n) butterfly stages (+ 1/n scale for the inverse)."""
    perm, stage_tw, n_inv = _plan(log_n, inverse)
    perm_j = jnp.asarray(perm)
    tws = [jnp.asarray(t) for t in stage_tw]
    n_inv_j = jnp.asarray(n_inv)

    @jax.jit
    def run(x):
        y = _ntt_kernel(x, perm_j, tws)
        if inverse:
            y = dev.mont_mul(y, jnp.broadcast_to(n_inv_j, y.shape), dev.FR)
        return y

    return run


#: sizes >= this go through the MXU-matmul NTT (int8 DFT levels);
#: below it the fused butterfly path wins — the MXU path has a ~38ms
#: sequential-renorm latency floor (measured: butterfly 2^16 ~27ms vs
#: MXU ~38ms; 2^18 butterfly ~107ms vs MXU ~39ms).
MXU_THRESHOLD_LOG_N = 17


#: sizes >= this run the single-chip four-step decomposition (two
#: batched half-size transforms + one twiddle + transposes): the MXU
#: int8-DFT trace stops compiling in reasonable time past ~2^19 on the
#: remote compiler, and the Pease gather is memory-bound at scale
#: (measured 11 s @ 2^22); four-step sub-transforms stay <= 2^11 where
#: both compile and run fast.
FOURSTEP_THRESHOLD_LOG_N = 20


@functools.lru_cache(maxsize=None)
def _fourstep_tw(log_n: int, log_r: int, inverse: bool,
                 in_scale: int = 1, out_scale: int = 1):
    """(c, r) twiddle table W[j2, k1] = omega^(+-j2*k1), Montgomery.
    in_scale/out_scale fold geometric scalings (coset / phase-coset
    transforms): entry[j2, k1] *= in_scale^j2 * out_scale^k1."""
    n = 1 << log_n
    r = 1 << log_r
    c = n >> log_r
    dom = Domain(n)
    w = dom.omega_inv if inverse else dom.omega
    # row j2 is a geometric sequence with ratio w^j2: build with numpy
    # object ints (vectorized enough at 2^22: c*r = n entries)
    out = np.empty((c, r), dtype=object)
    for j2 in range(c):
        acc = pow(in_scale, j2, R_MOD) * FR_MONT_R % R_MOD
        ratio = pow(w, j2, R_MOD) * out_scale % R_MOD
        rowv = out[j2]
        for k1 in range(r):
            rowv[k1] = acc
            acc = acc * ratio % R_MOD
    return np.asarray(limbs.ints_to_limbs(
        out.reshape(-1).tolist(), 16)).reshape(c, r, 16)


@functools.lru_cache(maxsize=None)
def _fourstep_jitted(log_n: int, inverse: bool):
    """One cached jit per (size, direction) — a fresh closure per call
    would retrace every invocation (measured 6 s/call at 2^18).  The
    twiddle table is a runtime ARG, not a captured constant: the remote
    TPU compiler rejects trace-embedded 50-750 MB constants (see
    ntt_mxu and the git history on W2/twiddles).

    Accepts a leading batch axis ((B, n, 16)): all B polynomials ride
    ONE program — the batch widens the MXU column dimension of every
    int8-DFT level (the prover's quotient phases transform 6+ polys at
    once; poly/ntt.ntt_many routes here)."""
    n = 1 << log_n
    log_r = log_n // 2
    r = 1 << log_r
    c = n >> log_r
    log_c = log_n - log_r

    from . import ntt_mxu

    def run(v, twj, in_scale_r=1, out_scale_c=1):
        # sub-transforms are the batched MXU int8-DFT kernels (each
        # itself 2-level, so the full transform is 3 MXU levels with
        # radixes <= 2^6 and a few-MB W2 each); the butterfly
        # formulation here measured 3.5 s at 2^18 — layout-hostile.
        # in_scale_r/out_scale_c are the a^c / s^r factors of a folded
        # geometric scaling (the a^j2 / s^k1 parts ride the twiddle
        # table twj — see ntt_4step); host ints, not traced.
        B = v.shape[0]
        m = v.reshape(B, r, c, 16)
        a = jnp.swapaxes(m, 1, 2)                    # (B, c, r, 16)
        a = ntt_mxu.ntt_mxu_batched(
            a.reshape(B * c, r, 16), log_r,
            inverse=inverse, in_scale=in_scale_r).reshape(B, c, r, 16)
        a = dev.mont_mul(a, twj[None], dev.FR)       # * w^(j2 k1)
        b = jnp.swapaxes(a, 1, 2)                    # (B, r, c, 16)
        y = ntt_mxu.ntt_mxu_batched(
            b.reshape(B * r, c, 16), log_c,
            inverse=inverse, out_scale=out_scale_c).reshape(B, r, c, 16)
        return jnp.swapaxes(y, 1, 2).reshape(B, n, 16)

    return run


@functools.lru_cache(maxsize=None)
def _fourstep_tw_dev(log_n: int, inverse: bool, in_scale: int = 1,
                     out_scale: int = 1):
    return jnp.asarray(_fourstep_tw(log_n, log_n // 2, inverse,
                                    in_scale, out_scale))


def ntt_4step(x, log_n: int, inverse: bool = False, in_scale: int = 1,
              out_scale: int = 1):
    """Single-chip four-step NTT (natural order in/out): inner size-r
    transforms batched over columns, twiddle scale, outer size-c
    transforms batched over rows.  Index math (X[k1 + r*k2] from
    x[j1*c + j2]) mirrors dist/ntt_sharded.py without the all_to_all —
    transposes stay on-chip.

    in_scale a: transform of x[j] * a^j; out_scale s: output k scaled
    by s^k — both folded into the constants (a^j = (a^c)^j1 * a^j2 and
    s^k = s^k1 * (s^r)^k2 land on the sub-transform matrices and the
    twiddle table), so coset/phase transforms cost the same as plain
    ones: no separate full-array Montgomery multiply or HBM pass."""
    return ntt_4step_many(x[None], log_n, inverse, in_scale,
                          out_scale)[0]


def ntt_4step_many(xs, log_n: int, inverse: bool = False,
                   in_scale: int = 1, out_scale: int = 1):
    """Batched four-step: (B, n, 16) polynomials through ONE program
    (see ntt_4step for the in_scale/out_scale folding semantics)."""
    in_scale %= R_MOD
    out_scale %= R_MOD
    log_r = log_n // 2
    r = 1 << log_r
    c = 1 << (log_n - log_r)
    return _fourstep_jitted(log_n, inverse)(
        xs, _fourstep_tw_dev(log_n, inverse, in_scale, out_scale),
        pow(in_scale, c, R_MOD), pow(out_scale, r, R_MOD))


def ntt(x, log_n: int):
    """Forward NTT: coefficients -> evaluations (both natural order,
    Montgomery limbs).  Size-routed: constant-geometry Pease kernel at
    small sizes (O(1) trace — the butterfly path compiled in O(log n)
    distinct stages, 643 s cold at 2^14 on the TPU tunnel), the MXU
    int8-DFT path in the mid range, the four-step decomposition at
    scale."""
    if log_n >= FOURSTEP_THRESHOLD_LOG_N:
        return ntt_4step(x, log_n)
    if log_n >= MXU_THRESHOLD_LOG_N:
        from . import ntt_mxu
        return ntt_mxu.ntt_mxu(x, log_n)
    from . import ntt_pease
    return ntt_pease.ntt_pease(x, log_n)


def ntt_batched(x, log_n: int, inverse: bool = False):
    """Batched NTT over the second-to-last axis: x is (..., n, 16).
    Used by the four-step sharded NTT for its row/column transforms.

    Deliberately does NOT reuse the jitted top-level closures: this
    path runs inside shard_map/jit traces, and a shared jit closure
    first traced under a manual-sharding context poisons its cache for
    later top-level calls (observed NotImplementedError on re-use)."""
    perm, stage_tw, n_inv = _plan(log_n, inverse)
    perm_j = jnp.asarray(perm)
    tws = [jnp.asarray(t) for t in stage_tw]

    def f(v):
        y = _ntt_kernel(v, perm_j, tws)
        if inverse:
            y = dev.mont_mul(y, jnp.broadcast_to(jnp.asarray(n_inv),
                                                 y.shape), dev.FR)
        return y

    flat = x.reshape((-1,) + x.shape[-2:])
    return jax.vmap(f)(flat).reshape(x.shape)


@functools.lru_cache(maxsize=None)
def _geom_pows(log_n: int, base: int):
    """(n, 16) Montgomery limbs of base^j — explicit-scaling fallback
    for the small-size NTT routes (the MXU routes fold the scale into
    their constants instead)."""
    n = 1 << log_n
    out, acc = [], 1
    for _ in range(n):
        out.append(acc * FR_MONT_R % R_MOD)
        acc = acc * base % R_MOD
    return jnp.asarray(limbs.ints_to_limbs(out, 16))


def ntt_many(xs, log_n: int, inverse: bool = False, scale: int = 1):
    """Batched transform of independent polynomials: (B, n, 16) ->
    (B, n, 16), size-routed like ntt/intt.  The prover's phase
    transforms use this — 21 polynomials per quotient phase as ONE
    MXU program instead of 21 dispatches.

    scale=a: forward computes the transform of x[j]*a^j (evaluation on
    the coset a*H); inverse scales output coefficient j by a^j (pass
    a = s^-1 to undo a coset).  On the MXU routes the scaling is folded
    into the precomputed DFT/twiddle constants — zero runtime cost; the
    small-size routes do one explicit Montgomery multiply."""
    scale %= R_MOD
    if log_n >= FOURSTEP_THRESHOLD_LOG_N:
        if inverse:
            return ntt_4step_many(xs, log_n, True, out_scale=scale)
        return ntt_4step_many(xs, log_n, False, in_scale=scale)
    if log_n >= MXU_THRESHOLD_LOG_N:
        from . import ntt_mxu
        if inverse:
            return ntt_mxu.ntt_mxu_batched(xs, log_n, inverse=True,
                                           out_scale=scale)
        return ntt_mxu.ntt_mxu_batched(xs, log_n, in_scale=scale)
    if scale != 1:
        pows = _geom_pows(log_n, scale)
        if inverse:
            return dev.mont_mul(ntt_batched(xs, log_n, True),
                                pows[None], dev.FR)
        return ntt_batched(dev.mont_mul(xs, pows[None], dev.FR),
                           log_n, False)
    return ntt_batched(xs, log_n, inverse)


def intt(x, log_n: int):
    """Inverse NTT: evaluations -> coefficients (Montgomery limbs)."""
    if log_n >= FOURSTEP_THRESHOLD_LOG_N:
        return ntt_4step(x, log_n, inverse=True)
    if log_n >= MXU_THRESHOLD_LOG_N:
        from . import ntt_mxu
        return ntt_mxu.ntt_mxu(x, log_n, inverse=True)
    from . import ntt_pease
    return ntt_pease.ntt_pease(x, log_n, inverse=True)


@functools.lru_cache(maxsize=None)
def _coset_powers(log_n: int, inverse: bool):
    n = 1 << log_n
    g = Domain(n).coset_gen
    if inverse:
        g = pow(g, -1, R_MOD)
    out, gi = [], 1
    for _ in range(n):
        out.append(gi * FR_MONT_R % R_MOD)
        gi = gi * g % R_MOD
    return limbs.ints_to_limbs(out, 16)


def coset_ntt(x, log_n: int):
    """Evaluations of the coefficient vector over the coset g*H.
    At MXU sizes the coset scale is folded into the transform
    constants (ntt_many scale=) — same cost as a plain NTT."""
    if log_n >= MXU_THRESHOLD_LOG_N:
        return ntt_many(x[None], log_n,
                        scale=Domain(1 << log_n).coset_gen)[0]
    powers = jnp.asarray(_coset_powers(log_n, False))
    return ntt(dev.mont_mul(x, powers, dev.FR), log_n)


def coset_intt(x, log_n: int):
    if log_n >= MXU_THRESHOLD_LOG_N:
        g_inv = pow(Domain(1 << log_n).coset_gen, -1, R_MOD)
        return ntt_many(x[None], log_n, inverse=True, scale=g_inv)[0]
    powers = jnp.asarray(_coset_powers(log_n, True))
    return dev.mont_mul(intt(x, log_n), powers, dev.FR)


# --- host-facing conveniences (ints in, ints out; used by tests) -----------


def ntt_ints(values, log_n: int, inverse=False, coset=False):
    n = 1 << log_n
    vals = list(values) + [0] * (n - len(values))
    x = jnp.asarray(limbs.fr_to_limbs([v * FR_MONT_R % R_MOD for v in vals]))
    if inverse:
        y = coset_intt(x, log_n) if coset else intt(x, log_n)
    else:
        y = coset_ntt(x, log_n) if coset else ntt(x, log_n)
    r_inv = pow(FR_MONT_R, -1, R_MOD)
    return [v * r_inv % R_MOD for v in limbs.limbs_to_ints(np.asarray(y))]
