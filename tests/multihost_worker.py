"""Worker for tests/test_multihost.py: one JAX process of a 2-process
CPU "pod" (4 virtual devices each, 8 global).  Runs the sharded
four-step NTT over the GLOBAL mesh — the all_to_all crosses the
process boundary over the distributed backend — and checks the result
against the host Domain oracle.  Usage:
    multihost_worker.py <process_id> <num_processes> <port>
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
    from tpu_plonk.dist import multihost
    multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert multihost.is_coordinator() == (pid == 0)
    mesh = multihost.global_mesh()

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


if __name__ == "__main__":
    main()
