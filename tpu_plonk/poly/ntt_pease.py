"""Constant-geometry (Pease) radix-2 NTT — the compile-time fix for the
prover's transform family (VERDICT round-1 task 4; ROADMAP #6).

The classic iterative butterfly NTT traces log2(n) stages with
DIFFERENT shapes (stride doubles each stage), so XLA compiles log2(n)
distinct Montgomery-multiply/gather kernels — measured 643 s cold for a
2^14 transform through the TPU tunnel.  The Pease formulation makes
every stage IDENTICAL geometry:

  stage: (top, bot) = x[:n/2], x[n/2:]
         u = top + bot
         v = (top - bot) * w^(p & ~(2^(s-1)-1))      [DIF twiddle]
         x = interleave(u, v)                        [perfect shuffle]

so the whole transform is one fori_loop body — ONE add, ONE sub, ONE
Montgomery multiply, ONE twiddle gather in the trace regardless of n —
followed by a single static output permutation.  The twiddle for stage
s at pair-index p is w^(p with the low s-1 bits cleared), so one
(n/2)-row table serves every stage via a masked gather.

Inverse = same program with w^-1 twiddles + 1/n scale (DIF output
permutation handled identically).
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
    """(n/2, 16) twiddle table w^p (Montgomery) + final output perm."""
    n = 1 << log_n
    dom = Domain(n)
    w = dom.omega_inv if inverse else dom.omega
    tws, acc = [], 1
    for _ in range(n // 2):
        tws.append(acc * FR_MONT_R % R_MOD)
        acc = acc * w % R_MOD
    tw = np.asarray(limbs.ints_to_limbs(tws, 16))

    perm = _final_perm(log_n)
    n_inv_mont = np.asarray(limbs.ints_to_limbs(
        [dom.n_inv * FR_MONT_R % R_MOD], 16)[0])
    return tw, perm, n_inv_mont


@functools.lru_cache(maxsize=None)
def _final_perm(log_n: int) -> np.ndarray:
    """Output slot of DFT bin k in the constant-geometry DIF pipeline:
    slot s holds bin bitreverse(s) (verified against the host Domain
    oracle in tests), so the natural-order gather is out = y[bitrev]."""
    n = 1 << log_n
    perm = np.zeros(n, dtype=np.int32)
    for k in range(n):
        perm[k] = int(bin(k)[2:].zfill(log_n)[::-1], 2)
    return perm


def _pease_impl(x, tw, perm, log_n: int):
    n = 1 << log_n
    half = n // 2
    p_idx = jnp.arange(half, dtype=jnp.int32)

    def stage(s, v):
        top = v[:half]
        bot = v[half:]
        mask = ~((jnp.int32(1) << s) - 1)
        tws = tw[p_idx & mask]
        u = dev.add_mod(top, bot, dev.FR)
        d = dev.mont_mul(dev.sub_mod(top, bot, dev.FR), tws, dev.FR)
        return jnp.stack([u, d], axis=1).reshape(n, 16)

    y = jax.lax.fori_loop(0, log_n, stage, x)
    return y[perm]


@functools.lru_cache(maxsize=None)
def _jitted(log_n: int, inverse: bool):
    tw, perm, n_inv = _plan(log_n, inverse)
    tw_j = jnp.asarray(tw)
    perm_j = jnp.asarray(perm)
    n_inv_j = jnp.asarray(n_inv)

    @jax.jit
    def run(x):
        y = _pease_impl(x, tw_j, perm_j, log_n)
        if inverse:
            y = dev.mont_mul(y, jnp.broadcast_to(n_inv_j, y.shape),
                             dev.FR)
        return y

    return run


def ntt_pease(x, log_n: int, inverse: bool = False):
    """(n, 16) Montgomery limbs -> (i)NTT, natural order in and out."""
    return _jitted(log_n, inverse)(x)
