"""Worker for tests/test_multihost.py: one JAX process of a 2-process
CPU "pod" (4 virtual devices each, 8 global).  Runs the sharded
four-step NTT over the GLOBAL mesh — the all_to_all crosses the
process boundary over the distributed backend — and checks the result
against the host Domain oracle.  Usage:
    multihost_worker.py <process_id> <num_processes> <port> [mode]

mode "prove": full multi-controller proof (SURVEY §2.10 config-5
shape): every process runs the device engine with the global mesh —
NTTs and KZG commits globally sharded across both processes,
everything else replicated-local — and asserts the proof bytes equal
the single-process host oracle prover's.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax-test"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "ntt"
    from tpu_plonk.dist import multihost
    multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert multihost.is_coordinator() == (pid == 0)
    mesh = multihost.global_mesh()

    if mode == "prove":
        _prove_mode(pid, mesh)
        return

    from tpu_plonk.params import R_MOD, FR_MONT_R
    from tpu_plonk.fields import limbs
    from tpu_plonk.poly.domain import Domain
    from tpu_plonk.dist.ntt_sharded import ntt_sharded

    log_n = 6
    n = 1 << log_n
    coeffs = [(5 * i + 11) % R_MOD for i in range(n)]
    x = np.asarray(limbs.fr_to_limbs(
        [c * FR_MONT_R % R_MOD for c in coeffs]))
    xg = jax.device_put(x, NamedSharding(mesh, P("shard")))
    y = ntt_sharded(mesh, xg, log_n)
    y_full = multihost_utils.process_allgather(y, tiled=True)
    got = [v * pow(FR_MONT_R, -1, R_MOD) % R_MOD
           for v in limbs.limbs_to_ints(np.asarray(y_full))]
    want = Domain(n).ntt(coeffs)
    assert got == want, f"proc {pid}: sharded NTT != host oracle"
    print(f"MULTIHOST_OK proc={pid}", flush=True)


def _prove_mode(pid, mesh):
    from tpu_plonk.params import R_MOD
    from tpu_plonk.cs import Composer
    from tpu_plonk.dist.msm_sharded import ShardedCommitter
    from tpu_plonk.pcs import srs as srs_mod
    from tpu_plonk.proof_system.preprocess import preprocess
    from tpu_plonk.proof_system.prover import prove
    from tpu_plonk.proof_system.verifier import verify
    from tpu_plonk.proof_system.engine_device import prove_device

    cs = Composer()
    a = cs.add_input(37)
    b = cs.add_input(21)
    cvar = cs.mul(1, a, b, 5)
    cs.constrain_to_constant(cvar, 0, (-782) % R_MOD)
    prev = cvar
    while cs.n_gates < 40:          # pad to 64 = 8x8 four-step
        prev = cs.mul(1, prev, prev, 3)
    assert cs.check_satisfied()
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, vk = preprocess(cs, srs)
    want = prove(cs, pk, srs)       # replicated host oracle
    # chunk=8 + static shapes: one walk program for all 11 commits and
    # ~4x fewer padded list slots than the default chunk=32 floor (the
    # same choices that keep the driver's dryrun_multichip cold-fast)
    committer = ShardedCommitter(mesh, srs, pk.n, c=4, chunk=8,
                                 static_shapes=True)
    got = prove_device(cs, pk, srs, commit_fn=committer.commit,
                       mesh=mesh)
    assert got.to_bytes() == want.to_bytes(), \
        f"proc {pid}: multi-controller proof bytes diverge"
    assert verify(got, vk, cs.pi, srs), f"proc {pid}: proof rejected"
    print(f"MULTIHOST_OK proc={pid}", flush=True)


if __name__ == "__main__":
    main()
