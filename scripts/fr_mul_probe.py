"""Probe: elementwise Fr Montgomery multiply, jnp-scan vs fused Pallas
(fields/pallas_fr.py) on the real chip.  If the Pallas kernel wins at
prover scale, it becomes the engine's elementwise-multiply primitive
(phase pre-scales, coset scales, pointwise quotient algebra are all
chains of these).  Appends rows to bench_results/fr_mul_probe.json.

Usage: python scripts/fr_mul_probe.py [log_n ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".cache", "jax"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def _time(fn, *args, iters=5):
    t0 = time.time()
    out = fn(*args)
    np.asarray(out[..., :1])          # force through the tunnel
    first = time.time() - t0
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        np.asarray(out[..., :1])
        times.append(time.time() - t0)
    return min(times), first


def main():
    from tpu_plonk.params import R_MOD
    from tpu_plonk.fields import limbs
    from tpu_plonk.fields import device as dev
    from tpu_plonk.fields import pallas_fr

    sizes = [int(a) for a in sys.argv[1:]] or [18, 20]
    rows = []
    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "bench_results", "fr_mul_probe.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    if os.path.exists(out_path):
        with open(out_path) as f:
            rows = json.load(f)

    rng = np.random.default_rng(5)
    for log_n in sizes:
        n = 1 << log_n
        a = jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16),
                                     dtype=np.uint32) % 0x7FFF)
        b = jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16),
                                     dtype=np.uint32) % 0x7FFF)
        jnp_f = jax.jit(lambda x, y: dev.mont_mul(x, y, dev.FR))
        t_jnp, _ = _time(jnp_f, a, b)
        t_pl, _ = _time(pallas_fr.mont_mul, a, b)
        at, bt = a.T, b.T
        t_plt, _ = _time(pallas_fr.mont_mul_t, at, bt)
        # exactness on-chip
        ok = bool(np.array_equal(np.asarray(pallas_fr.mont_mul(a, b)),
                                 np.asarray(jnp_f(a, b))))
        row = {"log_n": log_n, "tile": pallas_fr.TILE,
               "mxu": pallas_fr.MXU, "mul16": pallas_fr.MUL16,
               "jnp_ms": round(t_jnp * 1e3, 2),
               "pallas_ms": round(t_pl * 1e3, 2),
               "pallas_t_ms": round(t_plt * 1e3, 2),
               "exact": ok}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(out_path, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
