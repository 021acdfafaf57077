"""Device-CSR MSM probe on the real chip (round 4).

Measures pcs/csr_device.py — the transfer-free MSM pipeline where the
CSR bucket lists are built on device (sort + searchsorted + gathers)
instead of on the host — against the round-3 host-CSR path at the same
(c, chunk).  Reports, per grid point:

  * build+walk steady seconds with the coefficients ALREADY on device
    (the committer's real situation: the prover engine produced them)
  * pts/s for that e2e (this is the number that bounds commit time)
  * host-CSR reference seconds (host build + push + device walk) and
    the first-run compile time
  * correctness: window sums fold to the same affine point

Usage: python scripts/devcsr_probe.py [log_n] [--full]
Appends rows to bench_results/devcsr_probe.json.
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


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    full = "--full" in sys.argv

    if "--tiles" in sys.argv:
        # sweep the Pallas point-add lane tile (read at import ->
        # fresh interpreter per width) at the default (c, chunk); the
        # accumulate grid is sequential per core, so wider tiles
        # amortize per-step overhead until VMEM pressure bites
        import subprocess
        for tile in (256, 512, 1024):
            env = dict(os.environ)
            env["TPU_PLONK_G1_TILE"] = str(tile)
            args = [sys.executable, os.path.abspath(__file__),
                    str(log_n), f"--tag=tile{tile}"]
            subprocess.run(args, env=env, timeout=7200)
        return

    tag = next((a.split("=", 1)[1] for a in sys.argv
                if a.startswith("--tag=")), "")
    c_arg = next((int(a.split("=", 1)[1]) for a in sys.argv
                  if a.startswith("--c=")), None)
    n = 1 << log_n

    from tpu_plonk.curves import g1
    from tpu_plonk.pcs import msm_csr, csr_device

    base = [g1.mul(g1.GEN, k + 1) for k in range(64)]
    pts = msm_csr.pack_points([base[i % 64] for i in range(n)])
    rng = np.random.default_rng(23)
    canon = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    canon[:, 15] &= 0x7FFF
    canon_d = jax.device_put(jnp.asarray(canon))
    jax.block_until_ready(canon_d)

    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "bench_results", "devcsr_probe.json")
    rows = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            rows = json.load(f)

    # reference: host-CSR path at the tuned round-3 config.  --noref
    # skips it for pure tuning runs (it dominates probe wall time);
    # oracle_ok is then reported as null.
    ref_pt = None
    if "--noref" in sys.argv:
        c_ref = chunk_ref = None
    else:
        c_ref = 13
        chunk_ref = msm_csr.default_chunk(n, c_ref)
    if c_ref is not None:
        t0 = time.time()
        l1, l2 = msm_csr.csr_from_limbs(canon, c_ref, chunk=chunk_ref)
        host_build_s = time.time() - t0
        t0 = time.time()
        l1d, l2d = jax.device_put(l1), jax.device_put(l2)
        jax.block_until_ready(l1d)
        push_s = time.time() - t0
        s = msm_csr.window_sums(pts, l1d, l2d, c_ref)
        ref_pt = msm_csr.fold_windows_host(msm_csr.sums_to_host(s),
                                           c_ref)
        times = []
        for _ in range(3):
            t0 = time.time()
            s = msm_csr.window_sums(pts, l1d, l2d, c_ref)
            np.asarray(s[..., :1])
            times.append(time.time() - t0)
        ref_walk_s = min(times)
        print(json.dumps({"ref": True, "log_n": log_n, "c": c_ref,
                          "chunk": chunk_ref,
                          "host_build_s": round(host_build_s, 3),
                          "push_s": round(push_s, 3),
                          "walk_s": round(ref_walk_s, 4),
                          "e2e_pts_per_s": round(
                              n / (host_build_s + push_s
                                   + ref_walk_s))}),
              flush=True)

    if c_arg is not None:
        # single requested window width (e.g. the large-c points the
        # round-3 sweep couldn't reach before the top-window split)
        grid = [(c_arg, csr_device.default_chunk_device(n, c_arg))]
        if not tag:
            tag = f"c{c_arg}"
    elif tag:
        grid = [(13, csr_device.default_chunk_device(n, 13))]
    elif full:
        grid = []
        for c in (12, 13, 14):
            dflt = csr_device.default_chunk_device(n, c)
            for chunk in sorted({16, 32, 64, dflt}):
                grid.append((c, chunk))
    else:
        grid = [(13, csr_device.default_chunk_device(n, 13)), (13, 32),
                (13, 64)]

    for c, chunk in grid:
        m2u = csr_device.default_m2_uniform(n, c, chunk)
        m2t = csr_device.default_m2_top(n, c, chunk)
        t0 = time.time()
        sums, mu, mt, _ = csr_device.window_sums_device(
            pts, canon_d, c, chunk, m2u, m2t)
        jax.block_until_ready(sums)
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            sums, mu, mt, _ = csr_device.window_sums_device(
                pts, canon_d, c, chunk, m2u, m2t)
            np.asarray(sums[..., :1])
            times.append(time.time() - t0)
        dev_s = min(times)
        muv, mtv = int(mu), int(mt)
        ok = None
        if ref_pt is not None and muv <= m2u and mtv <= m2t:
            got = msm_csr.fold_windows_host(
                msm_csr._canon_sums_to_host(np.asarray(sums)), c)
            ok = bool(got == ref_pt)
        row = {"log_n": log_n, "c": c, "chunk": chunk, "tag": tag,
               "m2u": m2u, "m2t": m2t,
               "max_u": muv, "max_t": mtv,
               "compile_s": round(compile_s, 1),
               "device_s": round(dev_s, 4),
               "pts_per_s": round(n / dev_s),
               "oracle_ok": ok}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(out_path, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
