"""Benchmark harness (driver-run, real TPU).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
plus supporting numbers under "extra".  The reference publishes no
benchmarks (BASELINE.md) and its pinned build is single-threaded CPU,
so vs_baseline is reported against our own first-light value (1.0).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".cache",
                                   "jax"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def _force(x):
    """Materialize on host — block_until_ready alone under-reports on
    the tunneled backend."""
    return np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])


def bench_ntt(log_n: int, iters: int = 10):
    from tpu_plonk.poly import ntt as nttmod

    n = 1 << log_n
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16),
                                 dtype=np.uint32))
    t0 = time.time()
    y = nttmod.ntt(x, log_n)
    _force(y)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        y = nttmod.ntt(y, log_n)
    _force(y)
    steady = (time.time() - t0) / iters
    return steady, compile_s


def bench_msm(log_n: int, c: int = 4):
    from tpu_plonk.curves import g1, device_g1 as dg1
    from tpu_plonk.pcs import msm_device

    n = 1 << log_n
    # distinct small multiples tiled to n (point values don't affect perf)
    base = [g1.mul(g1.GEN, k + 1) for k in range(64)]
    pts = dg1.points_to_device([base[i % 64] for i in range(n)])
    rng = np.random.default_rng(11)
    n_windows = (255 + c - 1) // c
    digits = rng.integers(0, 1 << c, size=(n_windows, n),
                          dtype=np.int32)

    t0 = time.time()
    out = msm_device.msm_device(pts, digits, c, lanes=256)
    _force(out)
    first_s = time.time() - t0

    t0 = time.time()
    out = msm_device.msm_device(pts, digits, c, lanes=256)
    _force(out)
    steady_s = time.time() - t0
    return n / steady_s, steady_s, first_s


def bench_prove():
    """End-to-end prove+verify wall-clock at 2^10 gates (host oracle
    engine — deterministic, no device compile risk)."""
    from tpu_plonk.cs import Composer
    from tpu_plonk.pcs import srs as srs_mod
    from tpu_plonk.proof_system.preprocess import preprocess
    from tpu_plonk.proof_system.prover import prove
    from tpu_plonk.proof_system.verifier import verify

    cs = Composer()
    prev = cs.add_input(3)
    while cs.n_gates < 1000:
        prev = cs.mul(1, prev, prev, 1)
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, vk = preprocess(cs, srs)
    t0 = time.time()
    proof = prove(cs, pk, srs)
    prove_s = time.time() - t0
    t0 = time.time()
    ok = verify(proof, vk, cs.pi, srs)
    verify_s = time.time() - t0
    assert ok
    return prove_s, verify_s


def main():
    dev = jax.devices()[0]
    extra = {"device": str(dev)}

    prove_s, verify_s = bench_prove()
    extra["prove_2^10_host_s"] = round(prove_s, 2)
    extra["verify_s"] = round(verify_s, 2)

    ntt_ms = {}
    for log_n in (14, 18):
        steady, comp = bench_ntt(log_n)
        ntt_ms[f"ntt_2^{log_n}_ms"] = round(steady * 1e3, 3)
        ntt_ms[f"ntt_2^{log_n}_compile_s"] = round(comp, 1)
    extra.update(ntt_ms)

    # MXU-matmul NTT (int8 DFT levels; wins at large sizes)
    from tpu_plonk.poly import ntt_mxu
    x18 = jnp.asarray(np.random.default_rng(5).integers(
        0, 3, size=(1 << 18, 16), dtype=np.uint32))
    y = ntt_mxu.ntt_mxu(x18, 18, 512)
    _force(y)
    t0 = time.time()
    for _ in range(5):
        y = ntt_mxu.ntt_mxu(x18, 18, 512)
    _force(y)
    extra["ntt_mxu_2^18_ms"] = round((time.time() - t0) / 5 * 1e3, 3)

    pps, steady_s, first_s = bench_msm(16)
    extra["msm_2^16_steady_s"] = round(steady_s, 4)
    extra["msm_2^16_compile_s"] = round(first_s, 1)

    print(json.dumps({
        "metric": "msm_points_per_sec_chip",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": 1.0,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
