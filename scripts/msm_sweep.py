"""MSM (c, chunk) parameter sweep on the real chip.

The accumulate's sequential depth is `chunk + M2` device steps; ROADMAP
negative-results says wins must come from FEWER/WIDER steps, and both
knobs are free parameters of the CSR layout: a smaller chunk moves work
from the (deep) level-1 pass into the (wide) level-2 pass.  This sweep
measures the real-chip steady-state points/s across the (c, chunk)
grid at a given size and appends rows to bench_results/msm_sweep.json.

Usage: python scripts/msm_sweep.py [log_n] [--quick]
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

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    quick = "--quick" in sys.argv

    if "--tiles" in sys.argv:
        # sweep the Pallas point-add tile width (read at import, so
        # each variant runs in a fresh interpreter) at the default
        # (c, chunk); results append to the same msm_sweep.json
        import subprocess
        for tile in (256, 512, 1024, 2048):
            env = dict(os.environ)
            env["TPU_PLONK_G1_TILE"] = str(tile)
            args = [sys.executable, os.path.abspath(__file__),
                    str(log_n), "--quick", f"--tag=tile{tile}"]
            subprocess.run(args, env=env, timeout=7200)
        return

    tag = next((a.split("=", 1)[1] for a in sys.argv
                if a.startswith("--tag=")), "")
    n = 1 << log_n

    from tpu_plonk.curves import g1
    from tpu_plonk.pcs import msm_csr

    base = [g1.mul(g1.GEN, k + 1) for k in range(64)]
    pts = msm_csr.pack_points([base[i % 64] for i in range(n)])
    rng = np.random.default_rng(11)
    canon = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    canon[:, 15] &= 0x7FFF

    grid = []
    if tag:
        # tile-width sweep: one (c, chunk) point per interpreter
        grid = [(13, msm_csr.default_chunk(n, 13))]
    else:
        if quick:
            # window size should grow with n (bucket count amortizes
            # against list depth): probe the two best candidates per size
            cs = (12, 13) if log_n < 19 else (13, 14)
        else:
            cs = (11, 12, 13, 14)
        for c in cs:
            default = msm_csr.default_chunk(n, c)
            cands = sorted({32, 64, 128, default,
                            max(32, default // 2), max(32, default // 4)})
            for chunk in cands:
                grid.append((c, chunk))

    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "bench_results", "msm_sweep.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    rows = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            rows = json.load(f)

    for c, chunk in grid:
        t0 = time.time()
        l1, l2 = msm_csr.csr_from_limbs(canon, c, chunk=chunk)
        host_s = time.time() - t0
        l1d, l2d = jax.device_put(l1), jax.device_put(l2)
        t0 = time.time()
        s = msm_csr.window_sums(pts, l1d, l2d, c)
        np.asarray(s[..., :1])
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            s = msm_csr.window_sums(pts, l1d, l2d, c)
            np.asarray(s[..., :1])
            times.append(time.time() - t0)
        dev_s = min(times)
        flags = {k: v for k, v in os.environ.items()
                 if k.startswith("TPU_PLONK_")}
        row = {"log_n": log_n, "c": c, "chunk": chunk, "tag": tag,
               "flags": flags,
               "R": int(l1.shape[0]), "M2": int(l2.shape[2]),
               "host_csr_s": round(host_s, 3),
               "compile_s": round(compile_s, 1),
               "device_s": round(dev_s, 4),
               "pts_per_s": round(n / dev_s, 0),
               "e2e_pts_per_s": round(n / (dev_s + host_s), 0)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(out_path, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
