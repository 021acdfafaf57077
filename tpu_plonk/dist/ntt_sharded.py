"""Four-step (Bailey) NTT sharded over the device mesh — the scaling
axis for polynomial degree (SURVEY.md §5.7: the all_to_all transpose is
the structural analog of sequence-parallel attention's head<->sequence
exchange).

N = R*C, viewed as A[n2][n1] = x[n1 + C*n2] (natural block-sharding of
x == block-row sharding of A):

  transpose (all_to_all)  ->  local NTT_R rows  ->  twiddle w_N^(n1*k2)
  -> transpose  ->  local NTT_C rows  ->  transpose  ->  natural order

Each local NTT reuses the single-chip radix-2 kernels (poly/ntt.py);
the only cross-device traffic is the three tiled all_to_alls over ICI.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..params import R_MOD, FR_MONT_R
from ..fields import limbs
from ..fields import device as dev
from ..poly.domain import Domain
from ..poly import ntt as nttmod


@functools.lru_cache(maxsize=None)
def _twiddle_table(log_n: int, log_r: int, inverse: bool) -> np.ndarray:
    """(C, R, 16) Montgomery twiddles w_N^(n1*k2) (or inverse)."""
    n = 1 << log_n
    r = 1 << log_r
    c = n // r
    dom = Domain(n)
    w = dom.omega_inv if inverse else dom.omega
    rows = []
    for n1 in range(c):
        base = pow(w, n1, R_MOD)
        vals, acc = [], 1
        for _ in range(r):
            vals.append(acc * FR_MONT_R % R_MOD)
            acc = acc * base % R_MOD
        rows.append(limbs.ints_to_limbs(vals, 16))
    return np.stack(rows)


def _transpose_dist(x_local, axis: str):
    """Distributed transpose of a (A/D, B, 16) local block ->
    (B/D, A, 16): tiled all_to_all + local swap."""
    y = jax.lax.all_to_all(x_local, axis, split_axis=1, concat_axis=0,
                           tiled=True)
    return jnp.swapaxes(y, 0, 1)


@functools.lru_cache(maxsize=None)
def _sharded_ntt_runner(mesh, log_n: int, log_r: int, inverse: bool,
                        axis: str):
    """The jitted shard_map four-step program, cached per
    (mesh, size, direction).  This MUST be cached: a fresh shard_map
    closure per call retraces AND recompiles every time (CLAUDE.md
    rule 16 — the fresh-closure trap), and a mesh prove issues ~100
    sharded transforms; the uncached form made the r3/r4 multichip
    dryrun cold-compile for tens of minutes (VERDICT r4 missing #1).
    The twiddle table is a runtime ARG so it stays out of the trace."""
    c = (1 << log_n) >> log_r
    log_c = log_n - log_r

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def run(x_local, tw_local):
        a = x_local.reshape(-1, c, 16)              # (R/D, C, 16)
        at = _transpose_dist(a, axis)               # (C/D, R, 16)
        bt = nttmod.ntt_batched(at, log_r, inverse)  # NTT_R rows
        bt = dev.mont_mul(bt, tw_local, dev.FR)     # twiddle
        b = _transpose_dist(bt, axis)               # (R/D, C, 16)
        cc = nttmod.ntt_batched(b, log_c, inverse)  # NTT_C rows
        ct = _transpose_dist(cc, axis)              # (C/D, R, 16)
        return ct.reshape(-1, 16)

    return run


def ntt_sharded(mesh, x, log_n: int, inverse: bool = False,
                axis: str = "shard"):
    """x: (N, 16) canonical-Montgomery limbs, sharded or shardable on
    axis 0.  Returns the (i)NTT in natural order, same sharding."""
    n = 1 << log_n
    d = mesh.shape[axis]
    # R chosen so both local transforms exist and R, C >= D
    log_r = log_n // 2
    while (1 << log_r) % d and log_r < log_n:
        log_r += 1
    r = 1 << log_r
    c = n // r
    assert r % d == 0 and c % d == 0, \
        "device count must divide both NTT factors"
    # NB: the twiddle table stays a host numpy array — uncommitted
    # inputs shard uniformly in MULTI-PROCESS runs, where a
    # process-local jnp array would be rejected by the global mesh.
    tw = _twiddle_table(log_n, log_r, inverse)
    run = _sharded_ntt_runner(mesh, log_n, log_r, inverse, axis)

    x = x.reshape(n, 16)
    from jax.sharding import NamedSharding
    if jax.process_count() > 1 and not (
            isinstance(x, jax.Array) and not x.is_fully_addressable):
        # multi-controller: commit replicated host data to the global
        # mesh explicitly (a process-local jax.Array would be rejected)
        from . import multihost
        x = multihost.global_put(np.asarray(x),
                                 NamedSharding(mesh, P(axis)))
    elif jax.process_count() == 1:
        # normalize the input sharding: the cached jitted program
        # specializes on it, and callers arrive with host numpy,
        # replicated, and axis-sharded arrays — without this each
        # layout cold-compiled its own copy of the same four-step
        # program (~10 s each on the dryrun box)
        x = jax.device_put(x, NamedSharding(mesh, P(axis)))
    return run(x, tw)


def coset_ntt_sharded(mesh, x, log_n: int, axis: str = "shard"):
    """Sharded analog of poly/ntt.py coset_ntt: evaluations over g*H."""
    powers = jnp.asarray(nttmod._coset_powers(log_n, False))
    return ntt_sharded(mesh, dev.mont_mul(x, powers, dev.FR), log_n,
                       axis=axis)


def coset_intt_sharded(mesh, x, log_n: int, axis: str = "shard"):
    powers = jnp.asarray(nttmod._coset_powers(log_n, True))
    y = ntt_sharded(mesh, x, log_n, inverse=True, axis=axis)
    return dev.mont_mul(y, powers, dev.FR)
