"""Benchmark harness (driver-run, real TPU).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
plus supporting numbers under "extra".  The reference publishes no
benchmarks (BASELINE.md) and its pinned build is single-threaded CPU,
so vs_baseline is reported against the round-1 first-light value of the
headline metric (msm points/s/chip = 15518, BENCH_r01.json).
"""

import json
import os
import random
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".cache",
                                   "jax"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

ROUND1_MSM_PPS = 15518.0


def _force(x):
    """Materialize on host — block_until_ready alone under-reports on
    the tunneled backend."""
    return np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])


def bench_ntt(log_n: int, iters: int = 5):
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


def bench_msm(log_n: int, c: int = 13):
    """Chunked-CSR MSM, end-to-end (host CSR build + device kernel +
    host window fold) and device-only steady state."""
    from tpu_plonk.curves import g1
    from tpu_plonk.pcs import msm_csr

    n = 1 << log_n
    base = [g1.mul(g1.GEN, k + 1) for k in range(64)]
    pts = msm_csr.pack_points([base[i % 64] for i in range(n)])
    rng = np.random.default_rng(11)
    canon = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    canon[:, 15] &= 0x7FFF

    t0 = time.time()
    l1, l2 = msm_csr.csr_from_limbs(canon, c)
    host_s = time.time() - t0
    l1d, l2d = jax.device_put(l1), jax.device_put(l2)

    t0 = time.time()
    s = msm_csr.window_sums(pts, l1d, l2d, c)
    _force(s)
    first_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        s = msm_csr.window_sums(pts, l1d, l2d, c)
        _force(s)
        times.append(time.time() - t0)
    dev_s = min(times)
    msm_csr.fold_windows_host(msm_csr.sums_to_host(s), c)
    e2e = dev_s + host_s
    return n / e2e, n / dev_s, host_s, dev_s, first_s


def bench_msm_pipelined(log_n: int, k: int = 4, c: int = 13):
    """Production-shape MSM throughput (VERDICT r2 #5): a stream of k
    polynomials committed back-to-back, the way the prover does (11+
    commits per proof) — each host CSR build overlaps the device walk
    of the previous polynomial (JAX async dispatch), so steady-state
    cost/commit is max(host_csr, device) not their sum."""
    from tpu_plonk.curves import g1
    from tpu_plonk.pcs import msm_csr

    n = 1 << log_n
    base = [g1.mul(g1.GEN, j + 1) for j in range(64)]
    pts = msm_csr.pack_points([base[i % 64] for i in range(n)])
    rng = np.random.default_rng(13)
    canons = []
    for _ in range(k):
        canon = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint16)
        canon[:, 15] &= 0x7FFF
        canons.append(canon.astype(np.uint32))
    # warm the kernels (first call compiles)
    l1, l2 = msm_csr.csr_from_limbs(canons[0], c)
    _force(msm_csr.window_sums(pts, jax.device_put(l1),
                               jax.device_put(l2), c))
    t0 = time.time()
    sums = []
    for canon in canons:
        l1, l2 = msm_csr.csr_from_limbs(canon, c)
        sums.append(msm_csr.window_sums(
            pts, jax.device_put(l1), jax.device_put(l2), c))
    for s in sums:
        _force(s)
    total = time.time() - t0
    return k * n / total


def bench_msm_devcsr(log_n: int, k: int = 4, c: int = 13):
    """Transfer-free streaming commits (round 4, pcs/csr_device): the
    coefficients already live on device (the prover engine produced
    them), the CSR bucket lists are built ON device, and only 5.7 KB of
    window sums per polynomial crosses the tunnel.  This is the
    production commit shape; returns steady points/s over a k-poly
    stream."""
    from tpu_plonk.curves import g1
    from tpu_plonk.pcs import msm_csr, csr_device

    n = 1 << log_n
    base = [g1.mul(g1.GEN, j + 1) for j in range(64)]
    pts = msm_csr.pack_points([base[i % 64] for i in range(n)])
    rng = np.random.default_rng(17)
    canons = []
    for _ in range(k):
        canon = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
        canon[:, 15] &= 0x7FFF
        canons.append(jax.device_put(jnp.asarray(canon)))
    jax.block_until_ready(canons[-1])
    chunk = csr_device.default_chunk_device(n, c)
    # warm (compile)
    s, mu, mt, (m2u, m2t) = csr_device.window_sums_device(
        pts, canons[0], c, chunk)
    assert int(mu) <= m2u and int(mt) <= m2t, "devcsr m2 overflow"
    _force(s)
    t0 = time.time()
    pend = [csr_device.window_sums_device(pts, cd, c, chunk, m2u, m2t)
            for cd in canons]
    for s, _, _, _ in pend:
        _force(s)
    total = time.time() - t0
    return k * n / total


def bench_msm_devcsr_batched(log_n: int, k: int = 4, c: int = 13):
    """k-poly commit as ONE device program (csr_device._commit_sums_many
    — the shape DeviceCommitter.commit_many now dispatches): batching
    amortizes the tunnel's ~0.4 s per-dispatch charge and the walk
    kernels' startup across the group.  Steady points/s."""
    from tpu_plonk.curves import g1
    from tpu_plonk.fields import device as dev
    from tpu_plonk.pcs import msm_csr, csr_device

    from tpu_plonk.params import R_MOD

    n = 1 << log_n
    base = [g1.mul(g1.GEN, j + 1) for j in range(64)]
    pts = msm_csr.pack_points([base[i % 64] for i in range(n)])
    # the committer consumes CANONICAL Fr elements (< r): a raw
    # 255-bit sample mod-r-folds under the Montgomery roundtrip and
    # doubles the low top-window digit loads — overflowing m2t sized
    # for the canonical distribution (r4_bench2 AssertionError)
    rng = random.Random(17)
    canons = []
    for _ in range(k):
        buf = b"".join(rng.randrange(R_MOD).to_bytes(32, "little")
                       for _ in range(n))
        canons.append(np.frombuffer(buf, dtype="<u2").reshape(
            n, 16).astype(np.uint32))
    mont = jnp.stack([dev.to_mont(jnp.asarray(cn), dev.FR)
                      for cn in canons])
    jax.block_until_ready(mont)
    chunk = csr_device.default_chunk_device(n, c)
    m2u = csr_device.default_m2_uniform(n, c, chunk)
    m2t = csr_device.default_m2_top(n, c, chunk)
    tbl = msm_csr._fused_tbl(pts)
    s, mu, mt = csr_device._commit_sums_many(tbl, mont, c, chunk,
                                             m2u, m2t)
    assert (np.asarray(mu) <= m2u).all() and (np.asarray(mt) <= m2t).all()
    _force(s)                                   # warm (compile)
    t0 = time.time()
    s, mu, mt = csr_device._commit_sums_many(tbl, mont, c, chunk,
                                             m2u, m2t)
    _force(s)
    total = time.time() - t0
    return k * n / total


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
    t0 = time.time()
    bproof = prove(cs, pk, srs, blinding_seed=b"bench")
    blind_s = time.time() - t0
    assert verify(bproof, vk, cs.pi, srs)
    return prove_s, verify_s, blind_s


def bench_device_prove(log_gates: int = 14):
    """Config-2 analog: device engine + device CSR commits."""
    from tpu_plonk.cs import Composer
    from tpu_plonk.pcs import srs as srs_mod
    from tpu_plonk.pcs.commit_device import DeviceCommitter
    from tpu_plonk.proof_system.preprocess import preprocess
    from tpu_plonk.proof_system.engine_device import prove_device
    from tpu_plonk.proof_system.verifier import verify

    cs = Composer()
    prev = cs.add_input(3)
    while cs.n_gates < (1 << log_gates) - 1:
        prev = cs.mul(1, prev, prev, 1)
    srs = srs_mod.cached_setup(cs.padded_size() + 8)
    pk, vk = preprocess(cs, srs)
    com = DeviceCommitter(srs, pk.n, c=13)
    t0 = time.time()
    proof = prove_device(cs, pk, srs, commit_fn=com.commit)
    first_s = time.time() - t0
    t0 = time.time()
    proof = prove_device(cs, pk, srs, commit_fn=com.commit)
    steady_s = time.time() - t0
    assert verify(proof, vk, cs.pi, srs)
    return steady_s, first_s


def _tunnel_alive(timeout: float = 5.0) -> bool:
    """The axon site pins JAX to a tunneled TPU backend; when the
    tunnel is down (a multi-hour failure mode on this image —
    CLAUDE.md #11) jax.devices() hangs forever.  Probe the tunnel port
    directly so the bench can fail fast instead."""
    if "axon" not in os.environ.get("PYTHONPATH", "") and not os.path.isdir(
            "/root/.axon_site"):
        return True
    # A TCP connect is NOT enough: a dead tunnel still accepts the
    # local connection and then never answers (observed: curl exit 28,
    # http_code 000, while create_connection succeeded).  Require an
    # actual HTTP response within the timeout.  Retry a few times with
    # growing timeouts: one transient probe failure made the round-3
    # driver bench replay stale data while the chip was actually fine
    # (bench_r3_fresh.log).
    import urllib.request
    for attempt in range(3):
        try:
            with urllib.request.urlopen("http://127.0.0.1:8113/",
                                        timeout=timeout * (attempt + 1)):
                return True
        except urllib.error.HTTPError:
            return True  # any HTTP status = the far side is answering
        except OSError:
            time.sleep(10)
    return False


def _merge_scale_results(extra: dict) -> None:
    """Merge scripts/prove_scale.py results (minutes-long on-chip runs
    kept out of the bench budget) into the extra dict, with an explicit
    provenance marker."""
    import glob
    for path in sorted(glob.glob(os.path.join(
            os.path.dirname(__file__), "bench_results",
            "prove_scale_*.json"))):
        if path.endswith(".partial.json"):
            continue  # stage checkpoint of an unfinished run
        try:
            with open(path) as f:
                res = json.load(f)
            key = f"prove_2^{res['log_gates']}_scale"
            if res.get("tag"):
                key += f"_{res['tag']}"
            extra[key + "_steady_s"] = res.get("prove_steady_s")
            extra[key + "_gates_per_s"] = res.get("gates_per_s")
            extra[key + "_source"] = "scripts/prove_scale.py"
        except Exception:  # noqa: BLE001
            pass


def _replay_last_bench(reason: str = "tpu tunnel down at bench time;"
                       " replaying last on-chip run") -> bool:
    """Tunnel down: replay the last successful on-chip bench (saved by
    main()) with an explicit staleness marker, so the driver records
    real measured numbers instead of a hang/crash.  Scale-prove results
    may be fresher than the saved bench (the watcher runs them first),
    so re-merge them on top."""
    path = os.path.join(os.path.dirname(__file__), "bench_results",
                        "last_bench.json")
    if not os.path.exists(path):
        return False
    with open(path) as f:
        res = json.load(f)
    extra = res.setdefault("extra", {})
    extra["stale"] = reason
    _merge_scale_results(extra)
    print(json.dumps(res))
    return True


def _chip_busy() -> bool:
    """A watcher job (scripts/wait_and_measure.sh) may be mid-flight on
    the single chip — two concurrent heavy JAX clients crash the tunnel
    worker.  The watcher's lock file holds the running job's PID; treat
    the chip as busy only if that PID is alive, actually IS a python
    measurement job (PID-recycling guard, ADVICE r2), is not stale
    (lock older than the longest job timeout = orphaned), and is not an
    ancestor of this process (the watcher itself runs bench.py under
    the lock)."""
    path = os.path.join(os.path.dirname(__file__), "bench_results",
                        ".job_lock")
    try:
        age = time.time() - os.path.getmtime(path)
        with open(path) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return False
    if age > 7800:      # > the watcher's 7200 s hard job timeout
        return False
    # is `pid` alive AND a python job (not a recycled PID)?
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmdline = f.read().decode("utf-8", "replace")
    except OSError:
        return False
    if "python" not in cmdline and "bench" not in cmdline:
        return False
    # is it an ancestor of us (the watcher's own bench job)?
    cur = os.getpid()
    for _ in range(64):
        if cur == pid:
            return False
        try:
            with open(f"/proc/{cur}/stat") as f:
                cur = int(f.read().split(") ")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            break
        if cur <= 1:
            break
    return True


def main(warm_only: bool = False):
    """warm_only: run every bench shape (compiling each into the
    persistent .cache/jax) but don't overwrite last_bench.json — the
    pre-round warm pass (VERDICT r4 weak #4: one stale 2^14-NTT cache
    entry cost the driver bench 557 s of compile; warming every shape
    before round end bounds every *_compile_s at cache-hit cost)."""
    # If a watcher job holds the chip, WAIT (up to ~25 min) for it to
    # finish rather than instantly replaying a stale result — the
    # driver-recorded bench must be a fresh measurement (VERDICT r2 #2).
    deadline = time.time() + float(
        os.environ.get("TPU_PLONK_BENCH_LOCK_WAIT_S", "1500"))
    while _chip_busy() and time.time() < deadline:
        time.sleep(15)
    if _chip_busy():
        if _replay_last_bench("a watcher measurement job holds the chip;"
                              " replaying last on-chip run"):
            return
    if not _tunnel_alive():
        if _replay_last_bench():
            return
        print(json.dumps({
            "metric": "msm_points_per_sec_chip", "value": 0.0,
            "unit": "points/s", "vs_baseline": 0.0,
            "extra": {"error": "tpu tunnel down; no saved bench"}}))
        return
    dev = jax.devices()[0]
    extra = {"device": str(dev)}

    prove_s, verify_s, blind_s = bench_prove()
    extra["prove_2^10_host_s"] = round(prove_s, 2)
    extra["verify_ms"] = round(verify_s * 1e3, 1)
    extra["prove_2^10_host_blind_s"] = round(blind_s, 2)

    for log_n in (14, 18):
        steady, comp = bench_ntt(log_n)
        extra[f"ntt_2^{log_n}_ms"] = round(steady * 1e3, 3)
        extra[f"ntt_2^{log_n}_compile_s"] = round(comp, 1)

    try:
        steady, comp = bench_ntt(22, iters=3)
        extra["ntt_2^22_ms"] = round(steady * 1e3, 1)
        extra["ntt_2^22_compile_s"] = round(comp, 1)
    except Exception as e:  # noqa: BLE001 — record, don't kill the run
        extra["ntt_2^22_error"] = type(e).__name__

    pps16, dev16, host16, devs16, first16 = bench_msm(16)
    extra["msm_2^16_e2e_s"] = round(host16 + devs16, 3)
    extra["msm_2^16_compile_s"] = round(first16, 1)
    # split recorded since r4: the r3 run regressed 2^16 e2e (1.17 s vs
    # 0.54 s in r2) and the aggregate number can't localize it
    extra["msm_2^16_host_csr_s"] = round(host16, 3)
    extra["msm_2^16_device_s"] = round(devs16, 3)

    pps, dev_pps, host_s, dev_s, first_s = bench_msm(18)
    extra["msm_2^18_host_csr_s"] = round(host_s, 3)
    extra["msm_2^18_device_s"] = round(dev_s, 3)
    extra["msm_2^18_device_pts_per_s"] = round(dev_pps, 0)
    extra["msm_2^16_hostcsr_pts_per_s"] = round(pps16, 0)
    extra["msm_2^18_single_shot_pts_per_s"] = round(pps, 0)

    try:
        # the SHIPPED 2^16 path is the round-4 device-CSR stream, not
        # the host-CSR pipeline the old number measured (VERDICT r4
        # weak #7: bench said 190k while the devcsr probe measured
        # 296k at c=11 — the bench wasn't exercising the default)
        extra["msm_2^16_pts_per_s"] = round(
            bench_msm_devcsr(16, c=11), 0)
    except Exception as e:  # noqa: BLE001
        extra["msm_2^16_devcsr_error"] = type(e).__name__
        extra["msm_2^16_pts_per_s"] = round(pps16, 0)

    try:
        pps_pipe = bench_msm_pipelined(18)
        extra["msm_2^18_pipelined_pts_per_s"] = round(pps_pipe, 0)
        pps = pps_pipe
    except Exception as e:  # noqa: BLE001
        extra["msm_pipelined_error"] = type(e).__name__

    try:
        pps_dc = bench_msm_devcsr(18)
        extra["msm_2^18_devcsr_pts_per_s"] = round(pps_dc, 0)
        # the device-CSR stream is the production commit shape (round
        # 4: the prover's coefficients never leave the device) — it is
        # the headline
        pps = pps_dc
    except Exception as e:  # noqa: BLE001
        extra["msm_devcsr_error"] = type(e).__name__

    try:
        pps_db = bench_msm_devcsr_batched(18)
        extra["msm_2^18_devcsr_batched_pts_per_s"] = round(pps_db, 0)
        # one batched program per k-poly group is what the committer's
        # commit_many dispatches since round 4 — production shape
        pps = max(pps, pps_db)
    except Exception as e:  # noqa: BLE001
        extra["msm_devcsr_batched_error"] = type(e).__name__

    try:
        dprove_s, dprove_first = bench_device_prove(14)
        extra["prove_2^14_device_s"] = round(dprove_s, 2)
        extra["prove_2^14_device_first_s"] = round(dprove_first, 1)
    except Exception as e:  # noqa: BLE001
        extra["prove_2^14_device_error"] = type(e).__name__

    _merge_scale_results(extra)

    result = {
        "metric": "msm_points_per_sec_chip",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / ROUND1_MSM_PPS, 2),
        "extra": extra,
    }
    if "TPU" in str(dev).upper() and not warm_only:
        path = os.path.join(os.path.dirname(__file__), "bench_results",
                            "last_bench.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".tmp", "w") as f:
            json.dump(result, f)
        os.replace(path + ".tmp", path)
    print(json.dumps(result))


if __name__ == "__main__":
    import sys
    main(warm_only="--warm-only" in sys.argv)
