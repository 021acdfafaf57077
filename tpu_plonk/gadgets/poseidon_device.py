"""Batched native Poseidon on device (SURVEY.md §2.9 TPU plan: "both
native (JAX, batched) and gadget forms").

Hashes B messages in parallel — witness generation for hash-heavy
circuits and Merkle-path workloads.  State: (B, WIDTH, 16) Montgomery
limb arrays; constants share gadgets/poseidon.py's Grain/Cauchy set so
device output == host `sponge_hash` bit-for-bit (tested).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..params import R_MOD, FR_MONT_R
from ..fields import limbs
from ..fields import device as dev
from . import poseidon as hp

FR = dev.FR


@functools.lru_cache(maxsize=None)
def _consts():
    """numpy only — this cache is populated inside jit traces, and a
    cached jnp array born there would leak a tracer."""
    rc = [c * FR_MONT_R % R_MOD for c in hp.round_constants()]
    mds = [[v * FR_MONT_R % R_MOD for v in row] for row in hp.mds_matrix()]
    rc_l = limbs.ints_to_limbs(rc, 16).reshape(
        hp.FULL_ROUNDS + hp.PARTIAL_ROUNDS, hp.WIDTH, 16)
    mds_l = limbs.ints_to_limbs(
        [v for row in mds for v in row], 16).reshape(
        hp.WIDTH, hp.WIDTH, 16)
    return rc_l, mds_l


def _sbox(x):
    """x^5 elementwise (works on any (..., 16) batch at once)."""
    x2 = dev.mont_mul(x, x, FR)
    return dev.mont_mul(dev.mont_mul(x2, x2, FR), x, FR)


def _mix(state, mds_l):
    """MDS: out[i] = sum_j M[i][j]*s[j] as ONE batched multiply +
    log-depth adds (state (B, W, 16))."""
    full = (state.shape[0],) + mds_l.shape
    prod = dev.mont_mul(jnp.broadcast_to(state[:, None, :, :], full),
                        jnp.broadcast_to(mds_l[None], full),
                        FR)                                  # (B, W, W, 16)
    acc = dev.add_mod(prod[:, :, 0], prod[:, :, 1], FR)
    acc = dev.add_mod(acc, dev.add_mod(prod[:, :, 2], prod[:, :, 3], FR),
                      FR)
    return dev.add_mod(acc, prod[:, :, 4], FR)


@jax.jit
def permute_device(state):
    """Hades permutation on (B, WIDTH, 16) Montgomery limb states.
    Rounds run under lax.scan (one full-round + one partial-round body
    in the trace — never unroll EC/field chains, see CLAUDE.md)."""
    rc_np, mds_np = _consts()
    rc_l = jnp.asarray(rc_np)
    mds_l = jnp.asarray(mds_np)
    half = hp.FULL_ROUNDS // 2

    def ark(s, rc_row):
        return dev.add_mod(s, jnp.broadcast_to(rc_row[None], s.shape), FR)

    def full_round(s, rc_row):
        s = ark(s, rc_row)
        return _mix(_sbox(s), mds_l), None

    def partial_round(s, rc_row):
        s = ark(s, rc_row)
        last = _sbox(s[:, hp.WIDTH - 1])
        s = jnp.concatenate([s[:, :hp.WIDTH - 1], last[:, None]], axis=1)
        return _mix(s, mds_l), None

    p0, p1 = half, half + hp.PARTIAL_ROUNDS
    state, _ = jax.lax.scan(full_round, state, rc_l[:p0])
    state, _ = jax.lax.scan(partial_round, state, rc_l[p0:p1])
    state, _ = jax.lax.scan(full_round, state, rc_l[p1:])
    return state


def sponge_hash_device(message_batches):
    """Hash B equal-length messages: list of B lists of ints -> list of
    B digests.  Absorption mirrors gadgets/poseidon.py sponge_hash."""
    b = len(message_batches)
    ln = len(message_batches[0])
    assert all(len(m) == ln for m in message_batches), \
        "batch must share a message length"
    padded = [list(m) + [1] for m in message_batches]
    while len(padded[0]) % hp.RATE:
        for m in padded:
            m.append(0)
    state = jnp.zeros((b, hp.WIDTH, 16), jnp.uint32)
    for start in range(0, len(padded[0]), hp.RATE):
        chunk = [m[start:start + hp.RATE] for m in padded]
        flat = [v * FR_MONT_R % R_MOD for m in chunk for v in m]
        add = jnp.asarray(limbs.ints_to_limbs(flat, 16)).reshape(
            b, hp.RATE, 16)
        state = state.at[:, 1:].set(
            dev.add_mod(state[:, 1:], add, FR))
        state = permute_device(state)
    rinv = pow(FR_MONT_R, -1, R_MOD)
    outs = limbs.limbs_to_ints(np.asarray(state[:, 1]))
    return [v * rinv % R_MOD for v in outs]
